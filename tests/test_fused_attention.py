"""Fused packed-qkv rope+attention Pallas kernel vs the unfused reference
composition (interpret mode, so this runs on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.ops.attention import fused_rope_attention, sdpa
from sesa_tpu.ops.rope import apply_rope, default_freqs, rope_tables


def _reference(qkv, heads, scale, rope=None):
    b, n, packed = qkv.shape
    dh = packed // (3 * heads)
    q, k, v = (qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 1, 4))
    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    out = sdpa(q, k, v, scale=scale)  # (b, h, n, dh)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, heads * dh)


@pytest.mark.parametrize("n,heads,dh,rot", [
    (50, 2, 16, None),    # unpadded seq, no rope
    (40, 2, 16, 16),      # full rotary
    (33, 3, 32, 8),       # partial rotary, odd seq
    (130, 1, 64, 64),     # crosses the 128 pad boundary
])
def test_matches_unfused(n, heads, dh, rot):
    rng = np.random.default_rng(n)
    qkv = jnp.asarray(rng.standard_normal((3, n, 3 * heads * dh))
                      .astype(np.float32))
    rope = None
    if rot is not None:
        rope = rope_tables(jnp.asarray(default_freqs(rot)), n)
    got = fused_rope_attention(qkv, heads, dh ** -0.5, rope=rope,
                               interpret=True)
    ref = _reference(qkv, heads, dh ** -0.5, rope=rope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    assert got.shape == (3, n, heads * dh)


def test_batch_grouping_pads_correctly():
    """Short sequences group gb per program; batch not divisible by gb."""
    rng = np.random.default_rng(7)
    n, heads, dh = 12, 2, 8
    qkv = jnp.asarray(rng.standard_normal((13, n, 3 * heads * dh))
                      .astype(np.float32))
    got = fused_rope_attention(qkv, heads, dh ** -0.5, interpret=True)
    ref = _reference(qkv, heads, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def _reference_block(x, gamma, wqkv, wg, bg, wo, heads, scale, rope=None):
    from sesa_tpu.models.layers import rms_norm

    b, n, d = x.shape
    dh = wqkv.shape[0] // (3 * heads)
    xn = rms_norm(x, gamma)
    qkv = jnp.einsum("bnd,od->bno", xn, wqkv)
    q, k, v = qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    if rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    out = sdpa(q, k, v, scale=scale)
    gates = jnp.einsum("bnd,hd->bnh", xn, wg) + bg
    out = out * jax.nn.sigmoid(jnp.transpose(gates, (0, 2, 1)))[..., None]
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, heads * dh)
    return jnp.einsum("bno,do->bnd", out, wo) + x


@pytest.mark.parametrize("b,n,heads,dh,rot", [
    (3, 40, 2, 16, 16),    # full rotary
    (2, 33, 3, 32, 8),     # partial rotary
    (13, 12, 2, 8, None),  # short seq, gb grouping, no rope
])
def test_attention_block_matches_unfused(b, n, heads, dh, rot):
    from sesa_tpu.ops.attention import fused_attention_block

    rng = np.random.default_rng(n + b)
    d = heads * dh
    mk = lambda *s, sc=1.0: jnp.asarray((rng.standard_normal(s) * sc)
                                        .astype(np.float32))
    x = mk(b, n, d)
    gamma = mk(d)
    wqkv, wg, bg, wo = mk(3 * d, d, sc=0.1), mk(heads, d, sc=0.1), mk(heads), \
        mk(d, d, sc=0.1)
    rope = None
    if rot is not None:
        rope = rope_tables(jnp.asarray(default_freqs(rot)), n)
    got = fused_attention_block(x, gamma, wqkv, wg, bg, wo, heads,
                                dh ** -0.5, rope=rope, interpret=True)
    ref = _reference_block(x, gamma, wqkv, wg, bg, wo, heads, dh ** -0.5,
                           rope=rope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=2e-5)
