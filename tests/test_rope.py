"""RoPE: interleaved rotary_embedding_torch convention, with the
rotate_half shuffle computed as a ±1 matmul (MXU-friendly, exact)."""

import numpy as np

import jax.numpy as jnp

import pytest

from sesa_tpu.ops.rope import (apply_rope, default_freqs, rope_tables,
                               rotate_half_interleaved)

pytestmark = pytest.mark.smoke


def test_matmul_rotate_half_is_exact():
    """x @ J must equal the pair shuffle bit-for-bit (single ±1 per column)."""
    rng = np.random.default_rng(0)
    for dtype in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((5, 16, 64)), dtype=dtype)
        cos, sin = rope_tables(jnp.asarray(default_freqs(64)), 16)
        cos, sin = cos.astype(dtype), sin.astype(dtype)
        got = np.asarray(apply_rope(x, cos, sin), np.float32)
        ref = np.asarray(x * cos + rotate_half_interleaved(x) * sin, np.float32)
        np.testing.assert_array_equal(got, ref)


def test_partial_rotary():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 8, 64)).astype(np.float32))
    cos, sin = rope_tables(jnp.asarray(default_freqs(32)), 8)
    out = np.asarray(apply_rope(x, cos, sin))
    # trailing (unrotated) dims pass through untouched
    np.testing.assert_array_equal(out[..., 32:], np.asarray(x)[..., 32:])
    ref_head = np.asarray(x[..., :32] * cos +
                          rotate_half_interleaved(x[..., :32]) * sin)
    np.testing.assert_array_equal(out[..., :32], ref_head)


def test_interleaved_matches_manual_rotation():
    """Pin the exact rotary_embedding_torch convention."""
    d = 8
    freqs = jnp.asarray(default_freqs(d))
    cos, sin = rope_tables(freqs, 3)
    x = jnp.arange(3 * d, dtype=jnp.float32).reshape(3, d)
    out = np.asarray(apply_rope(x, cos, sin))
    f = np.asarray(freqs)
    for t in range(3):
        for i in range(d // 2):
            a = t * f[i]
            x0, x1 = float(x[t, 2 * i]), float(x[t, 2 * i + 1])
            np.testing.assert_allclose(out[t, 2 * i],
                                       x0 * np.cos(a) - x1 * np.sin(a), rtol=1e-5)
            np.testing.assert_allclose(out[t, 2 * i + 1],
                                       x1 * np.cos(a) + x0 * np.sin(a), rtol=1e-5)
