"""Rotary position embeddings, matching rotary_embedding_torch semantics.

The reference roformers share one RotaryEmbedding across all time
transformers and one across all freq transformers (reference
models/bs_roformer/bs_roformer.py:384-385). That library uses the
*interleaved* pair convention: frequencies are repeated pairwise
(f0,f0,f1,f1,...) and rotate_half maps (x0,x1) -> (-x1,x0) per adjacent
pair. The ``freqs`` vector is a (dim//2,) parameter in checkpoints
(``*_rotary_embed.freqs``) — loaded, not recomputed, so learned-frequency
variants convert too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def default_freqs(dim_head: int, theta: float = 10000.0) -> np.ndarray:
    """Default (language-mode) inverse-frequency vector, shape (dim_head//2,)."""
    return (
        1.0 / (theta ** (np.arange(0, dim_head, 2)[: dim_head // 2] / dim_head))
    ).astype(np.float32)


def rope_tables(freqs: jax.Array, seq_len: int) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (seq_len, dim) with interleaved pair repeat."""
    t = jnp.arange(seq_len, dtype=jnp.float32)
    ang = t[:, None] * freqs[None, :]  # (n, dim/2)
    ang = jnp.repeat(ang, 2, axis=-1)  # (n, dim) interleaved
    return jnp.cos(ang), jnp.sin(ang)


def rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(..., d) with pairs (x0,x1) -> (-x1,x0)."""
    x2 = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    a = x2[..., 0]
    b = x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


@functools.lru_cache(maxsize=None)
def _rotate_half_matrix_np(dim: int) -> np.ndarray:
    j = np.zeros((dim, dim), np.float32)
    for i in range(dim // 2):
        j[2 * i + 1, 2 * i] = -1.0
        j[2 * i, 2 * i + 1] = 1.0
    return j


def _rotate_half_matrix(dim: int, dtype_name: str) -> jax.Array:
    """The rotate_half shuffle as a ±1 matrix: rotate_half(x) == x @ J.

    On TPU the stride-2 pair shuffle defeats VPU vectorization (measured
    ~25 ms per q/k application at roformer scale); as a matmul it rides the
    MXU and XLA fuses the surrounding elementwise rope math (~5x faster).
    Exact in any dtype: each output column has a single ±1 entry, so the
    MXU accumulation adds one representable term to zeros.

    Only the numpy matrix is cached — the jnp conversion must happen per
    call because a dtype cast inside an active jit trace yields a tracer,
    and caching a tracer across traces is a leak.
    """
    return jnp.asarray(_rotate_half_matrix_np(dim), dtype=jnp.dtype(dtype_name))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (..., seq, dim) by position along the second-to-last axis.

    When the tables are narrower than the head dim (partial rotary, e.g.
    scnet_tran with rotary_embedding_dim < dim_head), only the leading dims
    rotate — matching rotary_embedding_torch's behavior.
    """
    w = cos.shape[-1]
    j = _rotate_half_matrix(w, x.dtype.name)
    hi = jax.lax.Precision.HIGHEST
    if w == x.shape[-1]:
        return x * cos + jnp.matmul(x, j, precision=hi) * sin
    head, rest = x[..., :w], x[..., w:]
    head = head * cos + jnp.matmul(head, j, precision=hi) * sin
    return jnp.concatenate([head, rest], axis=-1)
