"""Fused FeedForward Pallas kernel vs the unfused reference chain
(interpret mode on the CPU test platform)."""

import numpy as np

import jax
import jax.numpy as jnp

from sesa_tpu.models.layers import rms_norm
from sesa_tpu.ops.ff import fused_ff_residual


def _reference(x, gamma, w1, b1, w2, b2):
    xn = rms_norm(x, gamma)
    h = jax.nn.gelu(xn @ w1.T + b1, approximate=True)
    return h @ w2.T + b2 + x


def test_matches_unfused():
    rng = np.random.default_rng(0)
    tokens, dim, hidden = 70, 64, 256  # non-multiple of tile: exercises pad
    x = jnp.asarray(rng.standard_normal((tokens, dim)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(dim).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((hidden, dim)) * 0.05).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((dim, hidden)) * 0.05).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(dim).astype(np.float32))
    got = fused_ff_residual(x, gamma, w1, b1, w2, b2, tile=32, interpret=True)
    ref = _reference(x, gamma, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert got.shape == (tokens, dim)


def test_bf16_close_to_f32_reference():
    rng = np.random.default_rng(1)
    tokens, dim, hidden = 64, 128, 512
    mk = lambda *s, sc=1.0: jnp.asarray((rng.standard_normal(s) * sc).astype(np.float32))
    x, gamma = mk(tokens, dim), mk(dim)
    w1, b1 = mk(hidden, dim, sc=0.05), mk(hidden, sc=0.1)
    w2, b2 = mk(dim, hidden, sc=0.05), mk(dim, sc=0.1)
    got = fused_ff_residual(x.astype(jnp.bfloat16), gamma.astype(jnp.bfloat16),
                            w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                            w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
                            tile=32, interpret=True)
    ref = _reference(x, gamma, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.1)

