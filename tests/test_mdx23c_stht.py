"""Hartley-transform MDX23C: transform parity vs the reference's math
(torch.fft oracle) and full forward shape/finiteness."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import mdx23c_stht


def _torch_hartley(x):
    fft = torch.fft.fft(x)
    return fft.real - fft.imag


def test_hartley_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 256)).astype(np.float32)
    ref = _torch_hartley(torch.from_numpy(x)).numpy()
    got = np.asarray(mdx23c_stht.hartley(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_stht_matches_torch_reference_math():
    """Frame/window/transform pipeline vs a direct torch loop (the
    reference's STHT.transform, mdx23c_tfc_tdf_v3_with_STHT.py:27-58)."""
    rng = np.random.default_rng(1)
    n_fft, hop = 256, 64
    x = rng.standard_normal((1, 2, 2048)).astype(np.float32)

    xt = torch.from_numpy(x)
    w = torch.hamming_window(n_fft)
    pad = n_fft // 2
    xp = torch.nn.functional.pad(xt, (pad, pad), mode="reflect")
    n_frames = (xp.shape[-1] - n_fft) // hop + 1
    ref = torch.stack(
        [_torch_hartley(xp[:, :, i * hop : i * hop + n_fft] * w) for i in range(n_frames)],
        dim=-1,
    ).numpy()

    got = np.asarray(mdx23c_stht.stht(jnp.asarray(x), n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_stht_round_trip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2, 4096)).astype(np.float32)
    coeffs = mdx23c_stht.stht(jnp.asarray(x), 256, 64)
    back = mdx23c_stht.istht(coeffs.reshape(-1, 256, coeffs.shape[-1]), 256, 64, 4096)
    np.testing.assert_allclose(np.asarray(back).reshape(2, 2, 4096), x, atol=1e-4)


def test_full_model_forward():
    config = ConfigDict(
        {
            "audio": {"n_fft": 256, "hop_length": 64, "dim_f": 128,
                      "num_channels": 2, "chunk_size": 8128, "sample_rate": 44100},
            "model": {"num_subbands": 4, "num_scales": 2, "scale": [2, 2],
                      "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                      "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
            "training": {"instruments": ["vocals", "other"], "target_instrument": None},
            "inference": {"num_overlap": 2, "batch_size": 2},
        }
    )
    params = mdx23c_stht.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(3).standard_normal((1, 2, 8128)).astype(np.float32) * 0.1
    out = mdx23c_stht.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 2, 2, 8128)
    assert np.isfinite(np.asarray(out)).all()
