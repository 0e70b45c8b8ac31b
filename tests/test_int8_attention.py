"""INT8-quantized attention (the SageAttention analog) vs f32 SDPA.

Reference: bs_roformer/attend_sage.py — opt-in int8 QK^T with K smoothing.
Per-token scales mean quantization error is bounded by the 127-level grid;
against f32 attention the output error should stay ~1e-2 relative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.ops.attention import sdpa, sdpa_int8


def _qkv(b=2, h=4, n=50, d=32, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d))
                             .astype(np.float32) * scale)
    return mk(), mk(), mk()


@pytest.mark.smoke
@pytest.mark.parametrize("n,d", [(50, 32), (130, 64)])
def test_close_to_f32(n, d):
    q, k, v = _qkv(n=n, d=d)
    ref = np.asarray(sdpa(q, k, v))
    got = np.asarray(sdpa_int8(q, k, v))
    scale = np.abs(ref).max()
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 0.03 * scale, np.abs(got - ref).max()


def test_k_mean_smoothing_is_softmax_invariant():
    """Adding a large common component to K must not change the output:
    the smoothing subtracts it, and its logit contribution is constant
    per query row (softmax cancels it)."""
    q, k, v = _qkv(seed=1)
    shift = jnp.ones_like(k) * 7.5  # huge common-mode K offset
    a = np.asarray(sdpa_int8(q, k, v))
    b = np.asarray(sdpa_int8(q, k + shift, v))
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)


def test_env_gate_dispatches(monkeypatch):
    """roformer_core routes through the int8 path when SESA_INT8_ATTN is
    set; outputs must track the default path within quantization error."""
    from sesa_tpu.models import roformer_core as core

    params = core.transformer_init(jax.random.PRNGKey(0), 64, 1, 4, 16)
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 40, 64)).astype(np.float32) * 0.3)
    ref = np.asarray(core.transformer_apply(params, x, 4))
    monkeypatch.setenv("SESA_INT8_ATTN", "1")
    got = np.asarray(core.transformer_apply(params, x, 4))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale
