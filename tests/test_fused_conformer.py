"""Fused conformer attention/FF Pallas kernels vs the unfused composition
(interpret mode, so this runs on the CPU test platform).

The fused attention realizes the Shaw relative-position bias via a
per-sublane strided lane rotation instead of a gather; these tests pin
that skew to the plain take-based reference at several sequence lengths,
including ones that exercise the max_pos_emb clipping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.models import conformer_core as cc
from sesa_tpu.ops.attention import fused_conformer_attention
from sesa_tpu.ops.ff import fused_ff_residual


def _block_params(rng_seed, dim, heads, dh, max_pos=512):
    rng = np.random.default_rng(rng_seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    return {
        "norm": {"weight": 1.0 + 0.1 * r(dim), "bias": r(dim)},
        "to_q": {"weight": r(heads * dh, dim)},
        "to_kv": {"weight": r(2 * heads * dh, dim)},
        "to_out": {"weight": r(dim, heads * dh), "bias": r(dim)},
        "rel_pos_emb": r(2 * max_pos + 1, dh),
    }


@pytest.mark.parametrize("n,dim,heads,dh,max_pos", [
    (50, 64, 2, 16, 512),   # short seq, no clipping
    (130, 64, 2, 16, 64),   # clipping engaged (n-1 > max_pos)
    (70, 128, 4, 32, 512),  # unaligned seq crossing the 64 pad
])
def test_attention_matches_unfused(n, dim, heads, dh, max_pos):
    p = _block_params(n, dim, heads, dh, max_pos)
    rng = np.random.default_rng(n + 1)
    x = jnp.asarray(rng.standard_normal((3, n, dim)).astype(np.float32))

    # unfused reference path (plain take-based Shaw bias)
    cc_max = cc._MAX_POS_EMB
    cc._MAX_POS_EMB = max_pos
    try:
        ref = cc._attn_apply({k: p[k] for k in
                              ("norm", "to_q", "to_kv", "to_out",
                               "rel_pos_emb")},
                             x, heads, jax.lax.Precision.HIGHEST) + x
    finally:
        cc._MAX_POS_EMB = cc_max

    wqkv = jnp.concatenate([p["to_q"]["weight"], p["to_kv"]["weight"]], axis=0)
    got = fused_conformer_attention(
        x, p["norm"]["weight"], p["norm"]["bias"], wqkv, p["rel_pos_emb"],
        p["to_out"]["weight"], p["to_out"]["bias"], heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_ff_swish_ln_matches_unfused():
    dim, mult, tokens = 128, 4, 300
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    p = {
        "norm": {"weight": 1.0 + 0.1 * r(dim), "bias": r(dim)},
        "lin1": {"weight": r(dim * mult, dim), "bias": r(dim * mult)},
        "lin2": {"weight": r(dim, dim * mult), "bias": r(dim)},
    }
    x = r(tokens, dim) * 5
    ref = cc._ff_apply(p, x, jax.lax.Precision.HIGHEST) + x
    got = fused_ff_residual(
        x, p["norm"]["weight"], p["lin1"]["weight"], p["lin1"]["bias"],
        p["lin2"]["weight"], p["lin2"]["bias"], beta=p["norm"]["bias"],
        norm="ln", act="swish", out_scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_ff_rms_gelu_unchanged():
    """The roformer FF mode (rms/gelu/scale 1) must be unaffected by the
    new knobs."""
    from sesa_tpu.models.layers import rms_norm

    dim, tokens = 128, 200
    rng = np.random.default_rng(1)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    gamma, w1, b1 = 1.0 + 0.1 * r(dim), r(4 * dim, dim), r(4 * dim)
    w2, b2 = r(dim, 4 * dim), r(dim)
    x = r(tokens, dim) * 3
    xn = rms_norm(x, gamma)
    h = jax.nn.gelu(xn @ w1.T + b1, approximate=True)
    ref = h @ w2.T + b2 + x
    got = fused_ff_residual(x, gamma, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
