"""BS-RoFormer experimental — value-residual learning + hyper-connections.

Behavioral spec: reference models/bs_roformer/bs_roformer_experimental.py:
the base BS-RoFormer plus learned value-residual mixing (each later depth
layer's attention lerps its V toward the first depth layer's V with a
per-head sigmoid mix, :87-135,432-460) and hyper-connections multi-stream
residuals (:19,213,412-425,558-560,608-610; see
sesa_tpu/models/hyper_connections.py). The experimental Transformer.forward
semantics (value-residual threading, no explicit residual adds after the
first depth layer, :239-258) apply regardless of the VR flag.
"""

import dataclasses

from sesa_tpu.models.bs_roformer import (
    apply_from_spec,
    convert_from_spec,
    init_from_spec,
    spec_from_config,
)


def _spec(config):
    return dataclasses.replace(spec_from_config(config.model),
                               experimental_forward=True)


def init(rng, config):
    return init_from_spec(rng, _spec(config),
                          transformer_norm_output=False, final_norm=True)


def apply(params, config, x, precision=None, compute_dtype=None):
    return apply_from_spec(params, _spec(config), x,
                           precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return convert_from_spec(state_dict, _spec(config),
                             transformer_norm_output=False, final_norm=True)
