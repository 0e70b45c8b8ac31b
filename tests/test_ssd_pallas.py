"""Fused Pallas SSD kernel vs the einsum reference (interpret mode on CPU).

The kernel carries the recurrent state in VMEM across the sequential chunk
grid; these tests exercise multi-chunk state carry, bf16 IO, and the
dispatch gate. Math spec: reference models/ex_bi_mamba2.py:97-148.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.ops.ssd import ssd, ssd_pallas, use_pallas_ssd


def _inputs(bsz=2, l=256, h=8, p=64, n=128, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((bsz, l, h, p)).astype(np.float32) * 0.5
    # a = A*dt < 0 (log decay); realistic magnitude from softplus(dt) ~ 0.7
    a = -np.abs(rng.standard_normal((bsz, l, h)).astype(np.float32)) * scale
    b = rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3
    c = rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3
    return map(jnp.asarray, (x, a, b, c))


@pytest.mark.parametrize("l,scale", [(64, 1.0), (256, 0.7), (192, 3.0)])
def test_matches_einsum(l, scale):
    x, a, b, c = _inputs(l=l, scale=scale)
    ref = ssd(x, a, b, c, chunk_size=64)
    got = ssd_pallas(x, a, b, c, chunk_size=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_bf16_io_accumulates_f32():
    x, a, b, c = _inputs(l=128)
    ref = ssd(x, a, b, c, chunk_size=64)
    got = ssd_pallas(x.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                     b.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                     chunk_size=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = float(np.abs(np.asarray(ref)).max())
    diff = float(np.abs(np.asarray(got, dtype=np.float32)
                        - np.asarray(ref)).max())
    assert diff < 0.05 * max(scale, 1.0), (diff, scale)


def test_state_carries_across_chunks():
    """A long-memory sequence (tiny decay) must propagate chunk 0's input
    to the last chunk's output — catches a state reset between chunks."""
    bsz, l, h, p, n = 1, 192, 1, 8, 128
    x = np.zeros((bsz, l, h, p), dtype=np.float32)
    x[0, 3, 0, :] = 1.0  # single impulse in chunk 0
    a = np.full((bsz, l, h), -1e-3, dtype=np.float32)
    b = np.ones((bsz, l, 1, n), dtype=np.float32) * 0.1
    c = np.ones((bsz, l, 1, n), dtype=np.float32) * 0.1
    got = np.asarray(ssd_pallas(*map(jnp.asarray, (x, a, b, c)),
                                chunk_size=64, interpret=True))
    ref = np.asarray(ssd(*map(jnp.asarray, (x, a, b, c)), chunk_size=64))
    assert np.abs(got[0, -1]).max() > 0.1  # the impulse reached the tail
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_dispatch_gate():
    x, a, b, c = _inputs(l=128)
    assert not use_pallas_ssd(x, b, 64)  # CPU platform in tests
    bb = jnp.concatenate([b, b], axis=-2)  # G=2: unsupported
    assert not use_pallas_ssd(x, bb, 64)
