"""SNR / SI-SNR / BSS-eval SDR metric properties."""

import numpy as np

from sesa_tpu.metrics import (chunk_median_sdr, chunk_median_si_snr,
                              chunk_median_snr,
                              scale_invariant_signal_noise_ratio,
                              signal_distortion_ratio, signal_noise_ratio)


def test_snr_known_value():
    rng = np.random.default_rng(0)
    t = rng.standard_normal(20000)
    noise = rng.standard_normal(20000)
    noise *= np.linalg.norm(t) / np.linalg.norm(noise) / 10  # -20 dB noise
    snr = signal_noise_ratio(t + noise, t)
    np.testing.assert_allclose(snr, 20.0, atol=0.1)


def test_si_snr_scale_invariant():
    rng = np.random.default_rng(1)
    t = rng.standard_normal(8000)
    p = t + 0.05 * rng.standard_normal(8000)
    a = scale_invariant_signal_noise_ratio(p, t)
    b = scale_invariant_signal_noise_ratio(3.7 * p, t)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a > 20


def test_sdr_forgives_short_filters():
    """A 32-tap filtered target scores high SDR but low plain SNR."""
    rng = np.random.default_rng(2)
    t = rng.standard_normal(16384)
    fir = rng.standard_normal(32) * 0.3
    fir[0] = 1.0
    p = np.convolve(t, fir)[: t.shape[-1]]
    sdr = signal_distortion_ratio(p, t)
    snr = signal_noise_ratio(p, t)
    # the correlation-domain Toeplitz solve (same formulation as
    # fast-bss-eval/torchmetrics) leaves small edge effects, so "high"
    # here is ~30 dB, vs a negative plain SNR
    assert sdr > 25, sdr
    assert sdr > snr + 25, (sdr, snr)
    # a perfectly reconstructed signal scores essentially infinite SDR
    assert signal_distortion_ratio(t, t) > 100


def test_sdr_tracks_noise_level():
    rng = np.random.default_rng(3)
    t = rng.standard_normal(16384)
    noise = rng.standard_normal(16384)
    noise *= np.linalg.norm(t) / np.linalg.norm(noise) / 100  # -40 dB
    sdr = signal_distortion_ratio(t + noise, t)
    assert 38 < sdr < 46, sdr


def test_chunk_median_aggregation():
    rng = np.random.default_rng(4)
    t = rng.standard_normal((2, 44100))
    p = t + 0.01 * rng.standard_normal((2, 44100))
    for fn in (chunk_median_snr, chunk_median_si_snr, chunk_median_sdr):
        v = fn(p, t, window_size=8192, hop_size=4096)
        assert np.isfinite(v) and v > 20, (fn.__name__, v)
