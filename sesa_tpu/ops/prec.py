"""Matmul precision policy for model nets.

TPU f32 ``dot_general`` runs at bf16-level by default, so f32 nets must
pass ``Precision.HIGHEST`` to hold oracle parity. Under a bf16 compute
dtype the policy flips: bf16 operand products are exact in the f32 MXU
accumulator either way, but HIGHEST on bf16 operands makes XLA upcast and
run the multi-pass f32 emulation — measured 3.3x slower on the Apollo
band-roformer stage (174 ms -> 53 ms at default precision, TPU v5e) with
no information gained. bs_roformer's apply_from_spec established this
policy; ``net_precision`` shares it with every model family.
"""

import jax


def net_precision(precision, compute_dtype):
    """Resolve the net's matmul precision: explicit wins; else HIGHEST for
    f32 nets, DEFAULT for reduced-precision (bf16) nets."""
    if precision is not None:
        return precision
    if compute_dtype is not None:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST
