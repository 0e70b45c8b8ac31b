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
                heads, q, tile_chunks):
    """One (batch, seq-tile) program: several chunks, all heads batched.

    Refs: x (1, H, T, P), a (1, tc, H, Q), b/c (1, T, N), y (1, H, T, P) with
    T = tile_chunks * q; state scratch (H, P, N) float32 persisting across
    the sequential tile grid dimension (re-zeroed at tile 0).

    Two levels of restructuring versus a naive per-chunk kernel keep the
    TPU busy: (a) every chunk's six matmuls are batched over ALL heads as
    single dot_generals, so the MXU sees (H, Q, ·) workloads instead of H
    tiny serial ones; (b) several chunks run inside one program, so the
    sequential grid has B * ceil(NC / tile_chunks) steps instead of
    B * NC — the per-step block-DMA/sync overhead was the dominant cost
    of the long-sequence regime (SSD_BENCH.json r2: 0.49x at B4xL1408).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _zero():
        state_ref[...] = jnp.zeros_like(state_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)
    tril = row >= col
    # Mosaic has no cumsum lowering; an inclusive prefix sum is a matmul
    # against the lower-triangular ones matrix (MXU-native anyway)
    trilf = jnp.where(tril, 1.0, 0.0)

    n = b_ref.shape[-1]

    # fori_loop (not an unrolled Python loop): Mosaic stack-allocates each
    # unrolled iteration's temporaries separately, which blows the 16 MB
    # scoped-VMEM limit at ~22 chunks; the loop body's temps are reused
    def chunk_step(k, state):
        # t0 strides the SUBLANE dim of x/y/b/c blocks (multiple of 8 is
        # enough); a is laid out (1, tc, H, Q) so k indexes a non-tiled
        # leading dim (a lane-dim slice would need multiples of 128)
        t0 = pl.multiple_of(k * q, q)
        bq = b_ref[0, pl.ds(t0, q)].astype(jnp.float32)  # (Q, N)
        cq = c_ref[0, pl.ds(t0, q)].astype(jnp.float32)  # (Q, N)
        # C B^T once: the B/C projections are group-shared across heads
        cbt = jax.lax.dot_general(cq, bq, (((1,), (1,)), ((), ())),
                                  precision=_HIGHEST,
                                  preferred_element_type=jnp.float32)  # (Q, Q)
        av = a_ref[0, k].astype(jnp.float32)  # (H, Q)
        # inclusive prefix sums for all heads in one (H,Q)@(Q,Q) matmul
        ah = jax.lax.dot_general(av, trilf, (((1,), (1,)), ((), ())),
                                 precision=_HIGHEST,
                                 preferred_element_type=jnp.float32)  # (H, Q)
        a_last = jnp.sum(av, axis=1)[:, None]  # (H, 1)
        # decay[h, i, j] = exp(sum_{j+1..i} a_h); clamp the (masked) upper
        # triangle so the exp never overflows to inf
        diff = jnp.minimum(ah[:, :, None] - ah[:, None, :], 0.0)
        lmat = jnp.where(tril[None], jnp.exp(diff), 0.0) * cbt[None]  # (H,Q,Q)
        xq = x_ref[0, :, pl.ds(t0, q)].astype(jnp.float32)  # (H, Q, P)
        y = jax.lax.dot_general(lmat, xq, (((2,), (1,)), ((0,), (0,))),
                                precision=_HIGHEST,
                                preferred_element_type=jnp.float32)  # (H,Q,P)
        # inter-chunk: y_l += exp(acum_l) * C_l . state
        cqb = jnp.broadcast_to(cq[None], (heads, q, n))
        cst = jax.lax.dot_general(cqb, state, (((2,), (2,)), ((0,), (0,))),
                                  precision=_HIGHEST,
                                  preferred_element_type=jnp.float32)  # (H,Q,P)
        y = y + jnp.exp(ah)[:, :, None] * cst
        y_ref[0, :, pl.ds(t0, q)] = y.astype(y_ref.dtype)
        # state' = exp(acum_last) * state + X^T (exp(acum_last - acum) * B)
        wb = jnp.exp(a_last - ah)[:, :, None] * bq[None]  # (H, Q, N)
        f = jax.lax.dot_general(xq, wb, (((1,), (1,)), ((0,), (0,))),
                                precision=_HIGHEST,
                                preferred_element_type=jnp.float32)  # (H,P,N)
        return jnp.exp(a_last)[:, :, None] * state + f

    state = jax.lax.fori_loop(0, tile_chunks, chunk_step, state_ref[...])
    state_ref[...] = state


def _tile_chunks(nc: int, q: int, h: int, p: int, n: int) -> int:
    """Chunks per program: as many as fit a ~4 MB x-block VMEM budget
    (x/y blocks are double-buffered by the pipeline, plus (H,Q,Q) decay
    temporaries), capped at the whole sequence."""
    budget = 4 * 1024 * 1024
    per_chunk = q * h * p * 4
    return max(1, min(nc, budget // max(per_chunk, 1)))


def ssd_pallas(x: jax.Array, a: jax.Array, b: jax.Array, c: jax.Array,
               chunk_size: int = 64, interpret: bool = False) -> jax.Array:
    """Fused TPU SSD: same contract as `ssd` (G must be 1).

    Everything for one (batch, seq-tile) step lives in VMEM; the
    recurrent (H, P, N) state never touches HBM. The tile axis is the
    minor grid dimension, which Pallas TPU iterates sequentially per
    core, so the scratch state carries across tiles (re-zeroed at
    tile 0).
    """
    bsz, l, h, p = x.shape
    g, n = b.shape[-2], b.shape[-1]
    assert g == 1, "pallas ssd requires group-shared B/C"
    assert l % chunk_size == 0, (l, chunk_size)
    nc = l // chunk_size
    q = chunk_size
    tc = _tile_chunks(nc, q, h, p, n)
    nt = -(-nc // tc)
    t_tile = tc * q
    pad = nt * t_tile - l
    if pad:
        # (x=0, a=0, b=0) tail chunks are exact no-ops for the recurrence:
        # they add nothing to the state and decay it by exp(0) = 1
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # head-major layouts: per-head (T, P) slices are contiguous VMEM tiles
    xt = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, L, P)
    at = jnp.transpose(a.reshape(bsz, nt * tc, q, h), (0, 1, 3, 2))  # (B,NC,H,Q)
    b2 = b[:, :, 0]  # (B, L, N)
    c2 = c[:, :, 0]

    out = pl.pallas_call(
        functools.partial(_ssd_kernel, heads=h, q=q, tile_chunks=tc),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, h, t_tile, p), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, h, q), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, t_tile, p), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, l + pad, p), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, p, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (l + pad) * h * (q * n + q * p + 2 * n * p),
            bytes_accessed=2 * bsz * (l + pad) * h * p * x.dtype.itemsize,
            transcendentals=bsz * (l + pad) * h * (q + 2),
        ),
        interpret=interpret,
    )(xt, at, b2, c2)
    # (B, H, L, P) -> (B, L, H, P)
    return jnp.transpose(out[:, :, :l], (0, 2, 1, 3))


def use_pallas_ssd(x, b, chunk_size) -> bool:
    """Dispatch gate: the fused kernel needs TPU silicon, group-shared
    projections, and MXU-friendly minor dims.

    Enabled for every fitting shape: since the kernel batches all heads
    per matmul and runs whole sequence tiles per program, the on-chip
    A/B (SSD_BENCH.json) has it ahead in BOTH regimes — 1.28x at the
    long-sequence production shape B4xL1408 (0.49x before the tiling
    rework) and 1.1x at B64xL128. SESA_NO_FUSED disables all fused
    paths."""
    if os.environ.get("SESA_NO_FUSED"):
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
