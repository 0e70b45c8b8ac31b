"""BS-RoFormer experimental — value-residual learning variant.

Behavioral spec: reference models/bs_roformer/bs_roformer_experimental.py:
the base BS-RoFormer plus learned value-residual mixing (each later depth
layer's attention lerps its V toward the first depth layer's V with a
per-head sigmoid mix, :87-135,432-460). Hyper-connections
(num_residual_streams > 1) are intentionally unsupported — no public
checkpoint uses them and they would require executing third-party
residual-stream code.
"""

from sesa_tpu.models.bs_roformer import (
    apply_from_spec,
    convert_from_spec,
    init_from_spec,
    spec_from_config,
)


def init(rng, config):
    return init_from_spec(rng, spec_from_config(config.model),
                          transformer_norm_output=False, final_norm=True)


def apply(params, config, x, precision=None, compute_dtype=None):
    return apply_from_spec(params, spec_from_config(config.model), x,
                           precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return convert_from_spec(state_dict, spec_from_config(config.model),
                             transformer_norm_output=False, final_norm=True)
