"""Attention primitives for the roformer family.

Math matches the reference's Attend module (reference
models/bs_roformer/attend.py:97-126): softmax(q·kᵀ·scale)·v with
scale = dim_head**-0.5 unless overridden. Flash/SDPA/einsum backends in
the reference are numerically identical at inference (dropout 0), so one
implementation serves: a batched einsum pair that XLA fuses and tiles onto
the MXU. Softmax runs in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    precision=_HIGHEST,
) -> jax.Array:
    """Scaled dot-product attention over (..., heads, seq, dim_head)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("...id,...jd->...ij", q, k, precision=precision) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v, precision=precision)


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics (norm clamped at eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
