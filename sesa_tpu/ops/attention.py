"""Attention primitives for the roformer family.

Math matches the reference's Attend module (reference
models/bs_roformer/attend.py:97-126): softmax(q·kᵀ·scale)·v with
scale = dim_head**-0.5 unless overridden. Flash/SDPA/einsum backends in
the reference are numerically identical at inference (dropout 0), so one
implementation serves: a batched einsum pair that XLA fuses and tiles onto
the MXU. Softmax runs in float32 regardless of compute dtype.
"""

from __future__ import annotations

import functools
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
    """Scaled dot-product attention over (..., heads, seq, dim_head).

    Long-enough sequences on TPU route to the fused Pallas VMEM kernel
    (identical f32-softmax numerics); everything else uses the einsum pair.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    seq, dim_head = q.shape[-2], q.shape[-1]
    if (q.shape == k.shape == v.shape) and _use_pallas(seq, dim_head):
        lead = q.shape[:-2]
        out = _vmem_attention(
            q.reshape((-1, seq, dim_head)),
            k.reshape((-1, seq, dim_head)),
            v.reshape((-1, seq, dim_head)),
            scale,
        )
        return out.reshape(lead + (seq, dim_head))

    sim = jnp.einsum("...id,...jd->...ij", q, k, precision=precision) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v, precision=precision)


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics (norm clamped at eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# Pallas whole-sequence VMEM attention
# ---------------------------------------------------------------------------
#
# The roformer workload is many (batch·head) pairs with SHORT sequences
# (~700 frames, 64-dim heads): one head's entire Q/K/V (265 KB bf16) plus
# its f32 score matrix (1.9 MB) fit comfortably in VMEM. So instead of
# flash-attention tiling, each Pallas program computes one head's full
# attention on-chip — the score matrix never touches HBM, which is what
# makes the unfused einsum path memory-bound (it writes + reads ~2 GB of
# logits per layer at these shapes).

def _vmem_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, group):
    col = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[1], q_ref.shape[1]), 1
    )
    key_mask = col < seq_len
    for g in range(group):  # static unroll: heads within one program
        q = q_ref[g]  # (S, D)
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(key_mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)


def _vmem_attention(q, k, v, scale, group=8):
    """(BH, S, D) full-sequence attention, ``group`` heads per program
    (amortizes per-program overhead across the many short-seq heads)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, s, d = q.shape
    pad = (-s) % 128
    bh_pad = (-bh) % group
    padding = ((0, bh_pad), (0, pad), (0, 0))
    if pad or bh_pad:
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    sp = s + pad
    bhp = bh + bh_pad

    spec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_vmem_attn_kernel, scale=scale, seq_len=s, group=group),
        grid=(bhp // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bhp, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * sp * sp * d * bhp,
            bytes_accessed=4 * bhp * sp * d * q.dtype.itemsize,
            transcendentals=bhp * sp * sp,
        ),
    )(q, k, v)
    return out[:bh, :s]


# sequences at least this long route to the Pallas kernel on TPU; the
# (1.9 MB per 700-seq) f32 score tile must also still fit in VMEM
_PALLAS_MIN_SEQ = 256
_PALLAS_MAX_SEQ = 2048


def _use_pallas(seq: int, dim_head: int) -> bool:
    if not (_PALLAS_MIN_SEQ <= seq <= _PALLAS_MAX_SEQ) or dim_head > 128:
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
