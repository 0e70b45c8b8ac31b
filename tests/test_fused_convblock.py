"""Fused depthwise-conv block kernels (ops/convblock.py) vs the unfused
einsum/conv compositions, in interpret mode on the CPU test platform.

Sequence lengths are chosen to exercise both mask regimes of
``_dw_conv_seq``: short pads (sp - n < half_kernel, per-tap wrap masks
active) and long pads (masks skipped because wraps land in zeroed or
cropped rows only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.models import apollo as ap
from sesa_tpu.models import conformer_core as cc
from sesa_tpu.ops.convblock import fused_apollo_conv, fused_conformer_conv

pytestmark = pytest.mark.smoke


def _conformer_conv_params(seed, dim, expansion=2, kernel=31):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    e = dim * expansion
    return {
        "norm": {"weight": 1.0 + 0.1 * r(dim), "bias": r(dim)},
        "pw1": {"weight": r(2 * e, dim, 1), "bias": r(2 * e)},
        "dw": {"weight": r(e, 1, kernel), "bias": r(e)},
        "bn": {"weight": 1.0 + 0.1 * r(e), "bias": r(e),
               "running_mean": 0.1 * r(e),
               "running_var": jnp.abs(1.0 + 0.2 * r(e))},
        "pw2": {"weight": r(dim, e, 1), "bias": r(dim)},
    }


@pytest.mark.parametrize("b,n,dim,kernel", [
    (3, 60, 64, 31),    # short pad (64-60 < 15): masks active; gb > 1
    (2, 90, 64, 31),    # long pad (128-90 > 15): masks skipped
    (1, 130, 128, 7),   # small kernel, masks skipped (pad 62 >= 3)
    (2, 64, 64, 31),    # zero pad: every wrap masked
])
def test_conformer_conv_matches_unfused(b, n, dim, kernel):
    p = _conformer_conv_params(n + dim, dim, kernel=kernel)
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.standard_normal((b, n, dim)).astype(np.float32))

    ref = cc._conv_apply(p, x, jax.lax.Precision.HIGHEST) + x
    got = fused_conformer_conv(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def _apollo_conv_params(seed, dim, kernel=7):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    return {
        "dw_w": r(dim, 1, kernel),
        "dw_b": r(dim),
        "norm": 1.0 + 0.1 * r(dim),
        "pw1_w": r(4 * dim, dim),
        "pw1_b": r(4 * dim),
        "pw2_w": r(dim, 4 * dim),
        "pw2_b": r(dim),
    }


@pytest.mark.parametrize("b,n,dim", [
    (3, 62, 32),    # short pad (64-62 < 3): masks active
    (2, 100, 32),   # long pad: masks skipped
    (1, 257, 64),   # crosses a 64 boundary, gb > 1
])
def test_apollo_conv_matches_unfused(b, n, dim):
    p = _apollo_conv_params(n + dim, dim)
    rng = np.random.default_rng(n + 1)
    x = jnp.asarray(rng.standard_normal((b, n, dim)).astype(np.float32))

    ref = ap._conv_act_norm_apply(p, x, kernel=7,
                                  precision=jax.lax.Precision.HIGHEST)
    got = fused_apollo_conv(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
