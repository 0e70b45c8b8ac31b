"""Mamba-2 SSD (state-space dual) chunked scan.

Math spec: reference models/ex_bi_mamba2.py:97-148 (the pure-torch SSD the
reference falls back to when mamba_ssm's CUDA kernel is absent — and the
exact semantics the CUDA kernel implements). The sequence is partitioned
into chunks; intra-chunk outputs use a lower-triangular decay mask, chunk
states are decayed and combined through a chunk-level recurrence, and
inter-chunk contributions are added back per position.

Everything is batched einsums over (chunks, chunk_len, heads, head_dim,
state) — MXU-shaped by construction. `ssd_pallas` is a fused single-pass
TPU kernel with the inter-chunk state carried in VMEM across a sequential
grid (no HBM round trips for the recurrence); `ssd` dispatches to it on
TPU when the shapes fit. Numerics are defined by the einsum version.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST


def segsum(x: jax.Array) -> jax.Array:
    """Stable segment-sum: (..., T) -> (..., T, T) with entry [i, j] =
    sum_{k=j+1..i} x[k] on the lower triangle, -inf above the diagonal."""
    t = x.shape[-1]
    cs = jnp.cumsum(x, axis=-1)
    diff = cs[..., :, None] - cs[..., None, :]  # [i, j] = sum_{j+1..i}
    mask = np.tril(np.ones((t, t), dtype=bool), 0)
    return jnp.where(jnp.asarray(mask), diff, -jnp.inf)


def _ssd_kernel(x_ref, a_ref, b_ref, c_ref, y_ref, state_ref, *,
                heads, q):
    """One (batch, chunk) program: diagonal block + state in/out.

    Refs: x (1, H, Q, P), a (1, H, Q), b/c (1, Q, N), y (1, H, Q, P),
    state scratch (H*P, N) float32 persisting across the sequential
    chunk grid dimension (re-zeroed at chunk 0).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _zero():
        state_ref[...] = jnp.zeros_like(state_ref)

    b = b_ref[0, 0].astype(jnp.float32)  # (Q, N)
    c = c_ref[0, 0].astype(jnp.float32)  # (Q, N)
    # C B^T once: the B/C projections are group-shared across heads
    cbt = jax.lax.dot_general(c, b, (((1,), (1,)), ((), ())),
                              precision=_HIGHEST,
                              preferred_element_type=jnp.float32)  # (Q, Q)
    row = jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)
    tril = row >= col
    # Mosaic has no cumsum lowering; an inclusive prefix sum is a matmul
    # against the lower-triangular ones matrix (MXU-native anyway)
    trilf = jnp.where(tril, 1.0, 0.0)

    p = x_ref.shape[-1]
    for h in range(heads):
        av = a_ref[0, 0, h].astype(jnp.float32).reshape(q, 1)
        ah = jax.lax.dot_general(trilf, av, (((1,), (0,)), ((), ())),
                                 precision=_HIGHEST,
                                 preferred_element_type=jnp.float32)[:, 0]
        # ah[-1] would lower to (unsupported) dynamic_slice; the final
        # prefix sum is just the total
        a_last = jnp.sum(av)
        # decay[i, j] = exp(sum_{j+1..i} a); clamp the (masked) upper
        # triangle so the exp never overflows to inf
        diff = jnp.minimum(ah[:, None] - ah[None, :], 0.0)
        lmat = jnp.where(tril, jnp.exp(diff), 0.0) * cbt  # (Q, Q)
        xh = x_ref[0, 0, h].astype(jnp.float32)  # (Q, P)
        y = jax.lax.dot_general(lmat, xh, (((1,), (0,)), ((), ())),
                                precision=_HIGHEST,
                                preferred_element_type=jnp.float32)
        st = state_ref[h * p:(h + 1) * p]  # (P, N)
        # inter-chunk: y_l += exp(acum_l) * C_l . state
        cst = jax.lax.dot_general(c, st, (((1,), (1,)), ((), ())),
                                  precision=_HIGHEST,
                                  preferred_element_type=jnp.float32)
        y = y + jnp.exp(ah)[:, None] * cst
        y_ref[0, 0, h] = y.astype(y_ref.dtype)
        # state' = exp(acum_last) * state + X^T (exp(acum_last - acum) * B)
        wb = jnp.exp(a_last - ah)[:, None] * b  # (Q, N)
        f = jax.lax.dot_general(xh, wb, (((0,), (0,)), ((), ())),
                                precision=_HIGHEST,
                                preferred_element_type=jnp.float32)
        state_ref[h * p:(h + 1) * p] = jnp.exp(a_last) * st + f


def ssd_pallas(x: jax.Array, a: jax.Array, b: jax.Array, c: jax.Array,
               chunk_size: int = 64, interpret: bool = False) -> jax.Array:
    """Fused TPU SSD: same contract as `ssd` (G must be 1).

    Everything for one (batch, chunk) step lives in VMEM; the recurrent
    (H*P, N) state never touches HBM. The chunk axis is the minor grid
    dimension, which Pallas TPU iterates sequentially per core, so the
    scratch state carries across chunks (re-zeroed at chunk 0).
    """
    bsz, l, h, p = x.shape
    g, n = b.shape[-2], b.shape[-1]
    assert g == 1, "pallas ssd requires group-shared B/C"
    assert l % chunk_size == 0, (l, chunk_size)
    nc = l // chunk_size
    q = chunk_size

    # head-major layouts: per-head (Q, P) slices are contiguous VMEM tiles
    xt = jnp.transpose(x.reshape(bsz, nc, q, h, p), (0, 1, 3, 2, 4))
    at = jnp.transpose(a.reshape(bsz, nc, q, h), (0, 1, 3, 2))
    b2 = b.reshape(bsz, nc, q, n)
    c2 = c.reshape(bsz, nc, q, n)

    out = pl.pallas_call(
        functools.partial(_ssd_kernel, heads=h, q=q),
        grid=(bsz, nc),
        in_specs=[
            pl.BlockSpec((1, 1, h, q, p), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, q), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, q, p), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nc, h, q, p), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * p, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * l * h * (q * n + q * p + 2 * n * p),
            bytes_accessed=2 * bsz * l * h * p * x.dtype.itemsize,
            transcendentals=bsz * l * h * (q + 2),
        ),
        interpret=interpret,
    )(xt, at, b2, c2)
    # (B, nc, H, Q, P) -> (B, L, H, P)
    return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(bsz, l, h, p)


def use_pallas_ssd(x, b, chunk_size) -> bool:
    """Dispatch gate: the fused kernel needs TPU silicon, group-shared
    projections, and MXU-friendly minor dims.

    Shape policy from the on-chip A/B (SSD_BENCH.json): the kernel wins
    for MANY SHORT sequences (1.43x at B64xL128 — few sequential chunk
    steps, grid parallel over batch) and loses for long serial chains
    (0.49x at B4xL1408, 22 sequential chunks per program). So it
    auto-enables only in the short-sequence regime; SESA_SSD_PALLAS=1
    forces it everywhere, SESA_NO_FUSED disables all fused paths."""
    if os.environ.get("SESA_NO_FUSED"):
        return False
    if not os.environ.get("SESA_SSD_PALLAS"):
        if x.shape[1] // chunk_size > 4 or x.shape[0] < 32:
            return False
    if b.shape[-2] != 1 or x.shape[1] % chunk_size:
        return False
    if x.shape[-1] % 8 or b.shape[-1] % 128 or chunk_size % 8:
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def ssd(x: jax.Array, a: jax.Array, b: jax.Array, c: jax.Array,
        chunk_size: int = 64, precision=_HIGHEST) -> jax.Array:
    """Chunked SSD scan.

    Args:
      x: (B, L, H, P) inputs (already scaled by dt)
      a: (B, L, H) log-decay per step (A * dt, negative)
      b: (B, L, G, N) input projections (G groups, broadcast over heads)
      c: (B, L, G, N) output projections
    Returns:
      y: (B, L, H, P)
    L must be a multiple of chunk_size (pad upstream).
    """
    if use_pallas_ssd(x, b, chunk_size):
        return ssd_pallas(x, a, b, c, chunk_size=chunk_size)

    bsz, l, h, p = x.shape
    g, n = b.shape[-2], b.shape[-1]
    assert l % chunk_size == 0, (l, chunk_size)
    nc = l // chunk_size

    x = x.reshape(bsz, nc, chunk_size, h, p)
    b = b.reshape(bsz, nc, chunk_size, g, n)
    c = c.reshape(bsz, nc, chunk_size, g, n)
    a = a.reshape(bsz, nc, chunk_size, h)
    a = jnp.transpose(a, (0, 3, 1, 2))  # (B, H, nc, Q)
    a_cumsum = jnp.cumsum(a, axis=-1)

    # 1. intra-chunk (diagonal blocks)
    ldecay = jnp.exp(segsum(a))  # (B, H, nc, Q, Q)
    y_diag = jnp.einsum("bclgn,bcsgn,bhcls,bcshp->bclhp", c, b, ldecay, x,
                        precision=precision)

    # 2. per-chunk final states
    decay_states = jnp.exp(a_cumsum[..., -1:] - a_cumsum)  # (B, H, nc, Q)
    states = jnp.einsum("bclgn,bhcl,bclhp->bchpn", b, decay_states, x,
                        precision=precision)

    # 3. inter-chunk recurrence over chunk boundaries
    states = jnp.concatenate([jnp.zeros_like(states[:, :1]), states], axis=1)
    chunk_decay = jnp.exp(
        segsum(jnp.pad(a_cumsum[..., -1], ((0, 0), (0, 0), (1, 0))))
    )  # (B, H, nc+1, nc+1)
    new_states = jnp.einsum("bhzc,bchpn->bzhpn", chunk_decay, states,
                            precision=precision)
    states = new_states[:, :-1]

    # 4. state -> output per position
    state_decay_out = jnp.exp(a_cumsum)  # (B, H, nc, Q)
    y_off = jnp.einsum("bclgn,bchpn,bhcl->bclhp", c, states, state_decay_out,
                       precision=precision)

    return (y_diag + y_off).reshape(bsz, l, h, p)
