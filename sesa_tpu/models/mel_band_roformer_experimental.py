"""Mel-Band RoFormer experimental — value-residual learning + hyper-connections.

Behavioral spec: reference models/bs_roformer/mel_band_roformer_experimental.py
(Mel-Band RoFormer plus learned value-residual mixing and hyper-connections
multi-stream residuals; see bs_roformer_experimental for the mechanism).
"""

import dataclasses

from sesa_tpu.models.bs_roformer import apply_from_spec, convert_from_spec, init_from_spec
from sesa_tpu.models.mel_band_roformer import spec_from_config


def _spec(config):
    return dataclasses.replace(spec_from_config(config.model),
                               experimental_forward=True)


def init(rng, config):
    return init_from_spec(rng, _spec(config),
                          transformer_norm_output=True, final_norm=False)


def apply(params, config, x, precision=None, compute_dtype=None):
    return apply_from_spec(params, _spec(config), x,
                           precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return convert_from_spec(state_dict, _spec(config),
                             transformer_norm_output=True, final_norm=False)
