"""Wiener EM filter vs an independent numpy-complex oracle of the
published openunmix algorithm (the reference consumes it via
openunmix.filtering.wiener in demucs4ht.py:487-517)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sesa_tpu.ops.wiener import wiener_ri


def _oracle(targets, mix, niters, softmask=False, residual=False,
            scale_factor=10.0, eps=1e-10):
    """numpy complex128 implementation of the same published algorithm."""
    t, f, c, s = targets.shape
    mixc = mix[..., 0] + 1j * mix[..., 1]  # (T,F,C)
    if softmask:
        y = mixc[..., None] * (targets / (eps + targets.sum(-1, keepdims=True)))
    else:
        ang = np.angle(mixc)
        y = targets * np.exp(1j * ang)[..., None]
    if residual:
        y = np.concatenate([y, (mixc - y.sum(-1))[..., None]], axis=-1)
        s += 1
    if niters == 0:
        return y
    max_abs = max(1.0, np.abs(mixc).max() / scale_factor)
    mixc = mixc / max_abs
    y = y / max_abs
    reg = np.sqrt(eps) * np.eye(c)
    for _ in range(niters):
        v = (np.abs(y) ** 2).mean(axis=2)  # (T,F,S)
        r = np.zeros((f, c, c, s), complex)
        for j in range(s):
            num = np.einsum("tfa,tfb->fab", y[..., j], y[..., j].conj())
            r[..., j] = num / (eps + v[..., j].sum(0))[:, None, None]
        cxx = np.einsum("tfs,fabs->tfab", v, r) + reg
        inv = np.linalg.inv(cxx)
        ynew = np.zeros_like(y)
        for j in range(s):
            gain = v[..., j, None, None] * np.einsum(
                "fab,tfbd->tfad", r[..., j], inv)
            ynew[..., j] = np.einsum("tfab,tfb->tfa", gain, mixc)
        y = ynew
    return y * max_abs


@pytest.mark.parametrize("niters,softmask,residual", [
    (0, False, False), (0, True, False), (1, False, False),
    (2, False, True), (2, True, False),
])
def test_matches_oracle(niters, softmask, residual):
    rng = np.random.default_rng(0)
    t, f, c, s = 8, 5, 2, 3
    targets = np.abs(rng.standard_normal((t, f, c, s))).astype(np.float32)
    mix = rng.standard_normal((t, f, c, 2)).astype(np.float32)
    out = np.asarray(wiener_ri(jnp.asarray(targets), jnp.asarray(mix), niters,
                               softmask=softmask, residual=residual))
    ref = _oracle(targets.astype(np.float64), mix.astype(np.float64), niters,
                  softmask=softmask, residual=residual)
    got = out[..., 0, :] + 1j * out[..., 1, :]
    np.testing.assert_allclose(got, ref, atol=2e-4)
    assert out.shape == (t, f, c, 2, s + (1 if residual else 0))


def test_mono_and_general_channels():
    rng = np.random.default_rng(1)
    for c in (1, 3):  # 1 hits the scalar inverse, 3 the block-real fallback
        targets = np.abs(rng.standard_normal((6, 4, c, 2))).astype(np.float32)
        mix = rng.standard_normal((6, 4, c, 2)).astype(np.float32)
        out = np.asarray(wiener_ri(jnp.asarray(targets), jnp.asarray(mix), 2))
        ref = _oracle(targets.astype(np.float64), mix.astype(np.float64), 2)
        got = out[..., 0, :] + 1j * out[..., 1, :]
        np.testing.assert_allclose(got, ref, atol=3e-4)


def test_separates_disjoint_sources():
    """Sources disjoint in frequency are recovered nearly exactly."""
    rng = np.random.default_rng(2)
    t, f, c = 16, 8, 2
    s1 = np.zeros((t, f, c), complex)
    s2 = np.zeros((t, f, c), complex)
    s1[:, :4] = rng.standard_normal((t, 4, c)) + 1j * rng.standard_normal((t, 4, c))
    s2[:, 4:] = rng.standard_normal((t, 4, c)) + 1j * rng.standard_normal((t, 4, c))
    mix = s1 + s2
    targets = np.stack([np.abs(s1), np.abs(s2)], -1).astype(np.float32)
    mix_ri = np.stack([mix.real, mix.imag], -1).astype(np.float32)
    out = np.asarray(wiener_ri(jnp.asarray(targets), jnp.asarray(mix_ri), 3))
    got1 = out[..., 0, 0] + 1j * out[..., 1, 0]
    got2 = out[..., 0, 1] + 1j * out[..., 1, 1]
    assert np.abs(got1 - s1).max() < 1e-3
    assert np.abs(got2 - s2).max() < 1e-3
