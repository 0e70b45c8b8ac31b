"""Ensemble + phase-fixer parity: wave methods vs numpy, spectral methods
vs the reference's scipy formulation, phase fixer vs a torch oracle."""

import numpy as np
import pytest
import torch

from sesa_tpu.postprocess import ensemble_waveforms, phase_fix_arrays
from sesa_tpu.postprocess.ensemble import ENSEMBLE_METHODS


def _waves(n=3, t=44100):
    rng = np.random.default_rng(0)
    return [rng.standard_normal((2, t - i * 7)).astype(np.float32) * 0.3 for i in range(n)]


def test_avg_wave_weighted():
    waves = _waves()
    out = ensemble_waveforms(waves, "avg_wave", weights=[3, 1, 1])
    tmin = min(w.shape[-1] for w in waves)
    stack = np.stack([w[..., :tmin] for w in waves])
    ref = np.average(stack, axis=0, weights=np.array([3, 1, 1.0]) / 5)
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("method,npfn", [("median_wave", np.median),
                                         ("max_wave", np.max), ("min_wave", np.min)])
def test_wave_methods(method, npfn):
    waves = _waves()
    out = ensemble_waveforms(waves, method)
    tmin = min(w.shape[-1] for w in waves)
    ref = npfn(np.stack([w[..., :tmin] for w in waves]), axis=0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("method", ["max_fft", "min_fft", "median_fft"])
def test_spectral_methods_reference_formulation(method):
    """Re-derive the reference's scipy pipeline inline and compare exactly."""
    from scipy.signal import istft, stft

    waves = _waves(3, 8192)
    out = ensemble_waveforms(waves, method)

    tmin = min(w.shape[-1] for w in waves)
    stack = np.stack([w[..., :tmin] for w in waves])
    nperseg, noverlap = min(1024, tmin), min(1024, tmin) // 2
    specs = np.stack([
        np.stack([stft(stack[i, c], nperseg=nperseg, noverlap=noverlap, window="hann")[2]
                  for c in range(2)]) for i in range(3)])
    mag = np.abs(specs)
    sel = {"max_fft": np.max, "min_fft": np.min, "median_fft": np.median}[method]
    combined = sel(mag, axis=0) * np.exp(1j * np.angle(specs[0]))
    ref = np.zeros((2, tmin), dtype=np.float32)
    for c in range(2):
        _, xrec = istft(combined[c], nperseg=nperseg, noverlap=noverlap, window="hann")
        ref[c] = xrec[:tmin]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spectral_too_short_falls_back_to_avg():
    waves = [np.ones((2, 100), np.float32), np.zeros((2, 100), np.float32)]
    out = ensemble_waveforms(waves, "max_fft")
    np.testing.assert_allclose(out, 0.5 * np.ones((2, 100)), atol=1e-6)


def test_streaming_ensemble_files_matches_in_memory(tmp_path):
    """ensemble_files streams bounded 32768-frame buffers (reference
    ensemble.py:319); pointwise waveform methods must equal the in-memory
    result regardless of chunking."""
    import wave

    from sesa_tpu.audio_io import read_audio, write_audio
    from sesa_tpu.postprocess.ensemble import ensemble_files

    rng = np.random.default_rng(3)
    waves = [rng.standard_normal((2, 44100 + i * 13)).astype(np.float32) * 0.3
             for i in range(3)]
    files = []
    for i, w in enumerate(waves):
        f = str(tmp_path / f"in{i}.wav")
        write_audio(f, w, 44100, subtype="FLOAT")
        files.append(f)

    progress = []
    out_path = str(tmp_path / "out.wav")
    # buffer far smaller than the file so multiple chunks stream
    ensemble_files(files, "avg_wave", out_path, weights=[3, 1, 1],
                   progress_cb=progress.append, buffer_frames=4096)
    got, got_sr = read_audio(out_path)
    assert got_sr == 44100
    with wave.open(out_path, "rb") as wf:
        assert wf.getsampwidth() == 3  # PCM_24 output, like the reference

    ref = ensemble_waveforms(waves, "avg_wave", weights=[3, 1, 1])
    # PCM_24 quantization: 2^-23 steps
    np.testing.assert_allclose(got, ref, atol=2.5e-7)
    assert progress == sorted(progress) and progress[-1] == 1.0
    assert len(progress) > 5


def test_streaming_ensemble_spectral_and_validation(tmp_path):
    from sesa_tpu.audio_io import read_audio, write_audio
    from sesa_tpu.postprocess.ensemble import ensemble_files

    rng = np.random.default_rng(4)
    files = []
    for i in range(2):
        f = str(tmp_path / f"s{i}.wav")
        write_audio(f, rng.standard_normal((2, 30000)).astype(np.float32) * 0.3,
                    44100, subtype="FLOAT")
        files.append(f)
    out = ensemble_files(files, "median_fft", str(tmp_path / "o.wav"),
                         buffer_frames=8192)
    data, _ = read_audio(out)
    assert data.shape[1] == 30000
    assert np.isfinite(data).all()

    bad = str(tmp_path / "bad.wav")
    write_audio(bad, rng.standard_normal((2, 1000)).astype(np.float32), 22050)
    with pytest.raises(ValueError, match="sample-rate mismatch"):
        ensemble_files([files[0], bad], "avg_wave", str(tmp_path / "x.wav"))


def test_invalid_method():
    with pytest.raises(ValueError, match="Invalid method"):
        ensemble_waveforms(_waves(), "nope")


def test_phase_fixer_matches_torch_oracle():
    """The phase blend operates on wrapped angles, so bins at ±π flip under
    STFT rounding differences (inherent to the reference algorithm). Parity
    of the blend+wrap+resynthesis math is therefore checked on IDENTICAL
    torch-computed spectra; STFT parity is covered by test_stft.py."""
    import jax.numpy as jnp

    from sesa_tpu.ops.stft import hann_window, istft_ri
    from sesa_tpu.postprocess.phase_fixer import blend_spectra

    rng = np.random.default_rng(1)
    sr, t = 44100, 22050
    src = rng.standard_normal((2, t)).astype(np.float32) * 0.3
    tgt = rng.standard_normal((2, t)).astype(np.float32) * 0.3

    n_fft, hop = 2048, 512
    w = torch.hann_window(n_fft)
    s = torch.stft(torch.from_numpy(src), n_fft, hop, window=w, return_complex=True,
                   pad_mode="reflect")
    tt = torch.stft(torch.from_numpy(tgt), n_fft, hop, window=w, return_complex=True,
                    pad_mode="reflect")

    s_ri = jnp.asarray(np.stack([s.real.numpy(), s.imag.numpy()], axis=-1))
    t_ri = jnp.asarray(np.stack([tt.real.numpy(), tt.imag.numpy()], axis=-1))
    fixed = blend_spectra(s_ri, t_ri, sr, 500, 9000, 0.25, 1.4)
    got = np.asarray(istft_ri(fixed, n_fft, hop, hann_window(n_fft), length=t))

    freqs = torch.linspace(0, sr // 2, steps=n_fft // 2 + 1)
    bf = torch.zeros_like(freqs)
    bf[freqs < 500] = 0.25
    bf[freqs > 9000] = 0.25 + 1.4
    m = (freqs >= 500) & (freqs <= 9000)
    bf[m] = 0.25 + 1.4 * (freqs[m] - 500) / (9000 - 500)
    outs = []
    for c in range(2):
        blended = (1 - bf)[:, None] * torch.angle(tt[c]) + bf[:, None] * torch.angle(s[c])
        blended = torch.remainder(blended + torch.pi, 2 * torch.pi) - torch.pi
        outs.append(torch.abs(tt[c]) * torch.exp(1j * blended))
    ref = torch.istft(torch.stack(outs), n_fft, hop, window=w, length=t).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_device_combiner_matches_host():
    """ensemble_waveforms_device reproduces every waveform method of the
    host combiner (incl. weighted avg and shortest-input truncation) and
    rejects spectral methods loudly."""
    import jax.numpy as jnp

    from sesa_tpu.postprocess import ensemble_waveforms_device

    rng = np.random.default_rng(31)
    waves = [rng.standard_normal((2, 4000 - i)).astype(np.float32)
             for i in range(3)]
    dev = [jnp.asarray(w) for w in waves]
    for method in ("avg_wave", "median_wave", "max_wave", "min_wave"):
        host = ensemble_waveforms(waves, method)
        got = np.asarray(ensemble_waveforms_device(dev, method))
        np.testing.assert_allclose(got, host, atol=1e-6, err_msg=method)
    host = ensemble_waveforms(waves, "avg_wave", weights=[1.0, 2.0, 3.0])
    got = np.asarray(
        ensemble_waveforms_device(dev, "avg_wave", weights=[1.0, 2.0, 3.0]))
    np.testing.assert_allclose(got, host, atol=1e-6)
    with pytest.raises(ValueError, match="waveform methods only"):
        ensemble_waveforms_device(dev, "max_fft")
    with pytest.raises(ValueError, match="Invalid method"):
        ensemble_waveforms_device(dev, "nope")
    with pytest.raises(ValueError, match="weights"):
        ensemble_waveforms_device(dev, "avg_wave", weights=[1.0])


def test_fused_ensemble_phase_fix_matches_eager_chain():
    """ensemble_phase_fix_device (one fused XLA program with
    device-generated DFT tables) must reproduce the eager chain
    ensemble_waveforms_device -> phase_fix_arrays it replaces in the
    device-resident auto-ensemble flow."""
    import jax.numpy as jnp

    from sesa_tpu.postprocess import ensemble_waveforms_device, phase_fix_arrays
    from sesa_tpu.postprocess.phase_fixer import ensemble_phase_fix_device

    sr = 44100
    rng = np.random.default_rng(7)
    mix = rng.standard_normal((2, sr)).astype(np.float32) * 0.3
    waves = [jnp.asarray(rng.standard_normal((2, sr)).astype(np.float32) * 0.3)
             for _ in range(2)]

    ens = ensemble_waveforms_device(waves, "avg_wave")
    ref = phase_fix_arrays(mix, ens, sr)
    got = np.asarray(ensemble_phase_fix_device(jnp.asarray(mix), waves, sr))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)

    # weighted + a different method keep parity too
    ens_w = ensemble_waveforms_device(waves, "max_wave")
    ref_w = phase_fix_arrays(mix, ens_w, sr)
    got_w = np.asarray(ensemble_phase_fix_device(
        jnp.asarray(mix), waves, sr, method="max_wave"))
    np.testing.assert_allclose(got_w, ref_w, atol=5e-4, rtol=1e-3)

    with pytest.raises(ValueError, match="waveform methods only"):
        ensemble_phase_fix_device(jnp.asarray(mix), waves, sr, method="max_fft")
