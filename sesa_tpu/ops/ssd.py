"""Mamba-2 SSD (state-space dual) chunked scan.

Math spec: reference models/ex_bi_mamba2.py:97-148 (the pure-torch SSD the
reference falls back to when mamba_ssm's CUDA kernel is absent — and the
exact semantics the CUDA kernel implements). The sequence is partitioned
into chunks; intra-chunk outputs use a lower-triangular decay mask, chunk
states are decayed and combined through a chunk-level recurrence, and
inter-chunk contributions are added back per position.

Everything is batched einsums over (chunks, chunk_len, heads, head_dim,
state) — MXU-shaped by construction. A fused Pallas kernel slot is kept
(`use_pallas`) for the perf pass; numerics are defined by this version.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def segsum(x: jax.Array) -> jax.Array:
    """Stable segment-sum: (..., T) -> (..., T, T) with entry [i, j] =
    sum_{k=j+1..i} x[k] on the lower triangle, -inf above the diagonal."""
    t = x.shape[-1]
    cs = jnp.cumsum(x, axis=-1)
    diff = cs[..., :, None] - cs[..., None, :]  # [i, j] = sum_{j+1..i}
    mask = np.tril(np.ones((t, t), dtype=bool), 0)
    return jnp.where(jnp.asarray(mask), diff, -jnp.inf)


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
