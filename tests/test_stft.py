"""STFT/iSTFT parity vs torch.stft/torch.istft — the hardest parity surface
(SURVEY.md §7 hard part (a)). Checked across shapes, hops, normalization,
win_length < n_fft, and round-trips."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sesa_tpu.ops import stft, istft, hann_window

pytestmark = pytest.mark.smoke


def _torch_stft(x, n_fft, hop, window, normalized=False, win_length=None):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        window=torch.from_numpy(window),
        center=True,
        normalized=normalized,
        return_complex=True,
    ).numpy()


@pytest.mark.parametrize(
    "n_fft,hop,t",
    [(2048, 512, 44100), (4096, 1024, 32768), (512, 128, 5000), (2048, 441, 20000)],
)
def test_stft_matches_torch(n_fft, hop, t):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, t)).astype(np.float32)
    w = np.asarray(hann_window(n_fft), dtype=np.float32)

    ref = _torch_stft(x, n_fft, hop, w)
    got = np.asarray(stft(jnp.asarray(x), n_fft, hop, jnp.asarray(w)))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_stft_normalized_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16384)).astype(np.float32)
    w = np.asarray(hann_window(4096), dtype=np.float32)
    ref = _torch_stft(x, 4096, 1024, w, normalized=True)
    got = np.asarray(stft(jnp.asarray(x), 4096, 1024, jnp.asarray(w), normalized=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_stft_short_window_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    w = np.asarray(hann_window(1024), dtype=np.float32)
    ref = _torch_stft(x, 2048, 512, w, win_length=1024)
    got = np.asarray(stft(jnp.asarray(x), 2048, 512, jnp.asarray(w), win_length=1024))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("normalized", [False, True])
def test_istft_matches_torch(normalized):
    rng = np.random.default_rng(3)
    n_fft, hop, t = 2048, 512, 22050
    x = rng.standard_normal((2, t)).astype(np.float32)
    w = np.asarray(hann_window(n_fft), dtype=np.float32)

    spec = _torch_stft(x, n_fft, hop, w, normalized=normalized)
    ref = torch.istft(
        torch.from_numpy(spec),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(w),
        center=True,
        normalized=normalized,
        length=t,
    ).numpy()
    got = np.asarray(
        istft(jnp.asarray(spec), n_fft, hop, jnp.asarray(w), normalized=normalized, length=t)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_round_trip_identity():
    rng = np.random.default_rng(4)
    n_fft, hop, t = 2048, 512, 44100
    x = rng.standard_normal((2, 2, t)).astype(np.float32)
    w = hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    back = istft(spec, n_fft, hop, w, length=t)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-5, rtol=1e-4)


def test_istft_no_length_matches_torch():
    rng = np.random.default_rng(5)
    n_fft, hop = 1024, 256
    x = rng.standard_normal((1, 10240)).astype(np.float32)
    w = np.asarray(hann_window(n_fft), dtype=np.float32)
    spec = _torch_stft(x, n_fft, hop, w)
    ref = torch.istft(
        torch.from_numpy(spec), n_fft=n_fft, hop_length=hop,
        window=torch.from_numpy(w), center=True,
    ).numpy()
    got = np.asarray(istft(jnp.asarray(spec), n_fft, hop, jnp.asarray(w)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
