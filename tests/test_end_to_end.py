"""Full-pipeline integration with real (tiny, random-weight) models:
two sessions separate the same song, stems are ensembled, phase-fixed,
and scored — exercising the component interop a real user flow touches."""

import numpy as np
import pytest
import yaml

import jax.numpy as jnp


@pytest.fixture(scope="module")
def song():
    sr = 44100
    t = np.arange(2 * sr) / sr
    mix = np.stack([np.sin(2 * np.pi * 330 * t), np.sin(2 * np.pi * 220 * t)])
    mix = mix.astype(np.float32) * 0.4
    # PCM16-quantize like a decoded file (exercises the int16 upload path)
    return np.round(mix * 32768).astype(np.int16).astype(np.float32) / 32768


def _mdx23c_session(tmp_path, seed):
    from sesa_tpu.runtime.session import InferenceSession

    cfg = {
        "audio": {"n_fft": 512, "hop_length": 128, "dim_f": 256,
                  "num_channels": 2, "chunk_size": 8064, "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": "vocals"},
        "inference": {"num_overlap": 2, "batch_size": 2},
    }
    path = str(tmp_path / f"m{seed}.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return InferenceSession.create("mdx23c", path, "", seed=seed,
                                   compute_dtype=None)


def test_two_model_ensemble_phasefix_metrics(tmp_path, song):
    from sesa_tpu.metrics import chunk_median_si_snr
    from sesa_tpu.postprocess.ensemble import ensemble_waveforms

    s1 = _mdx23c_session(tmp_path, 0)
    s2 = _mdx23c_session(tmp_path, 1)

    v1 = s1.separate(song)["vocals"]
    v2 = s2.separate(song)["vocals"]
    assert v1.shape == v2.shape == song.shape

    ens = ensemble_waveforms([v1, v2], method="avg_wave", weights=[2.0, 1.0])
    assert ens.shape == song.shape and np.isfinite(ens).all()

    med = ensemble_waveforms([v1, v2], method="median_wave")
    assert np.isfinite(med).all()

    # phase fix: blend the ensemble's phase toward the mix's
    from sesa_tpu.postprocess.phase_fixer import phase_fix_arrays

    fixed = phase_fix_arrays(song, ens, 44100)
    assert fixed.shape == song.shape and np.isfinite(fixed).all()

    # metric report over the produced stems
    score = chunk_median_si_snr(ens, song, window_size=22050)
    assert np.isfinite(score)


def test_instrumental_plus_tta_flow(tmp_path, song):
    s = _mdx23c_session(tmp_path, 2)
    out = s.separate_with_extras(song, extract_instrumental=True, use_tta=True)
    np.testing.assert_allclose(out["vocals"] + out["instrumental"], song,
                               atol=2e-4)
