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


def test_attention_block_value_residual_modes():
    """vr modes: emit pre-mix V (first layer) and lerp toward a given V
    (later layers), matching the unfused value-residual path."""
    from sesa_tpu.models import roformer_core as core
    from sesa_tpu.ops.attention import fused_attention_block

    rng = np.random.default_rng(11)
    b, n, heads, dh = 2, 20, 2, 16
    d = heads * dh
    p = core.attention_init(jax.random.PRNGKey(4), d, heads, dh,
                            value_residual=True)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32) * 0.3)
    rope = rope_tables(jnp.asarray(default_freqs(dh)), n)

    # first layer (no mix projection in real models): residual applied,
    # V emitted
    p_first = {k: v for k, v in p.items() if not k.startswith("vr_")}
    out1, v1 = fused_attention_block(
        x, p["norm_gamma"], p["qkv_w"], p["gates_w"], p["gates_b"], p["out_w"],
        heads, dh ** -0.5, rope=rope, interpret=True,
        vr=(None, None, None), add_residual=True)
    ref1, refv1 = core.attention_apply(p_first, x, heads, rope=rope,
                                       return_values=True)
    ref1 = ref1 + x
    # legacy V layout (b, h, n, dh) -> (b, n, h·dh)
    refv1 = jnp.transpose(refv1, (0, 2, 1, 3)).reshape(b, n, d)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(refv1),
                               atol=2e-5, rtol=1e-4)

    # later layer: lerp V toward v1, no residual (new-style forward)
    out2, v2 = fused_attention_block(
        x, p["norm_gamma"], p["qkv_w"], p["gates_w"], p["gates_b"], p["out_w"],
        heads, dh ** -0.5, rope=rope, interpret=True,
        vr=(p["vr_mix_w"], p["vr_mix_b"], v1), add_residual=False)
    vres_legacy = jnp.transpose(
        jnp.asarray(v1).reshape(b, n, heads, dh), (0, 2, 1, 3))
    ref2, refv2 = core.attention_apply(p, x, heads, rope=rope,
                                       value_residual=vres_legacy,
                                       return_values=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=3e-5, rtol=1e-4)


def test_transformer_apply_vr_unchanged_on_cpu():
    """CPU (fused gate off) still runs the legacy vr path end to end,
    mirroring the real structure: the first stack has no mix projection,
    later stacks mix with the first stack's V."""
    from sesa_tpu.models import roformer_core as core

    p_first = core.transformer_init(jax.random.PRNGKey(5), 32, 2, 2, 16,
                                    value_residual=False)
    p_later = core.transformer_init(jax.random.PRNGKey(6), 32, 2, 2, 16,
                                    value_residual=True)
    x = jnp.asarray(np.random.default_rng(12)
                    .standard_normal((2, 10, 32)).astype(np.float32) * 0.3)
    rope = rope_tables(jnp.asarray(default_freqs(16)), 10)
    out, first_v = core.transformer_apply_vr(p_first, x, 2, rope=rope)
    assert out.shape == x.shape and first_v is not None
    out2, _ = core.transformer_apply_vr(p_later, out, 2, rope=rope,
                                        value_residual=first_v)
    assert np.isfinite(np.asarray(out2)).all()


def test_pallas_sdpa_gate_rejects_f32():
    """f32 sdpa must stay on the einsum path: the VMEM kernel's f32
    footprint exceeds the 16 MB scoped limit at production shapes
    (remote compile failure caught by tools/int8_eval.py)."""
    import jax.numpy as jnp

    from sesa_tpu.ops.attention import _use_pallas

    assert not _use_pallas(690, 64, jnp.float32)
    assert not _use_pallas(690, 64, jnp.float16)
