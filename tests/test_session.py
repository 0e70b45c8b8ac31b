"""InferenceSession behavior: normalization round trip, derived outputs,
instrument naming, config robustness."""

import numpy as np
import pytest
import yaml

import jax.numpy as jnp


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    from sesa_tpu.runtime.session import InferenceSession

    cfg = {
        "audio": {"n_fft": 512, "hop_length": 128, "dim_f": 256,
                  "num_channels": 2, "chunk_size": 8064, "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"], "target_instrument": "vocals"},
        "inference": {"num_overlap": 2, "batch_size": 2, "normalize": True},
    }
    path = str(tmp_path_factory.mktemp("cfg") / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return InferenceSession.create("mdx23c", path, "", compute_dtype=None)


def test_separate_normalized(session):
    mix = (np.random.default_rng(0).standard_normal((2, 20000)) * 0.2 + 0.5
           ).astype(np.float32)
    stems = session.separate(mix)
    assert list(stems) == ["vocals"]
    assert stems["vocals"].shape == (2, 20000)
    assert np.isfinite(stems["vocals"]).all()


def test_extract_instrumental_identity(session):
    mix = np.random.default_rng(1).standard_normal((2, 16000)).astype(np.float32) * 0.2
    out = session.separate_with_extras(mix, extract_instrumental=True)
    np.testing.assert_allclose(out["vocals"] + out["instrumental"], mix, atol=2e-4)


def test_phaseremix_shapes(session):
    mix = np.random.default_rng(2).standard_normal((2, 16000)).astype(np.float32) * 0.2
    out = session.separate_with_extras(mix, demud_phaseremix_inst=True)
    assert "instrumental_phaseremix" in out
    assert out["instrumental_phaseremix"].shape == (2, 16000)


def test_mono_input_upmixed(session):
    mix = np.random.default_rng(3).standard_normal((1, 16000)).astype(np.float32) * 0.2
    stems = session.separate(mix)
    assert stems["vocals"].shape == (2, 16000)


def test_apollo_style_config(tmp_path):
    """Configs with no audio/training sections (restoration models)."""
    from sesa_tpu.runtime.session import InferenceSession

    cfg = {"model": {"sr": 16000, "win": 20, "feature_dim": 16, "layer": 1}}
    path = str(tmp_path / "apollo.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    s = InferenceSession.create("apollo", path, "", chunk_size=8000,
                                num_channels=1, compute_dtype=None)
    assert s.instruments == ["restored"]
    assert s.sample_rate == 16000
    mix = np.random.default_rng(4).standard_normal((1, 12000)).astype(np.float32) * 0.2
    out = s.separate(mix)
    assert out["restored"].shape == (1, 12000)


def test_bf16_rescue_retries_in_f32(monkeypatch):
    """A model that emits non-finite output under a reduced compute dtype
    must trigger the session's f32 retry (runtime fallback, analog of the
    reference's compiled->eager rescue, pytorch_backend.py:315-332) and
    return finite audio; the finalize math must not scrub the NaN before
    the session can see it."""
    import types

    import jax.numpy as jnp
    from ml_collections import ConfigDict

    from sesa_tpu.runtime import session as sess_mod
    from sesa_tpu.runtime.session import DemixSpec, InferenceSession

    calls = {"bf16": 0, "f32": 0}

    def apply(params, config, chunks, compute_dtype=None):
        out = jnp.tile(chunks[:, None], (1, 1, 1, 1)).astype(jnp.float32)
        if compute_dtype is not None:
            calls["bf16"] += 1
            return out.at[:, :, :, 0].set(jnp.nan)
        calls["f32"] += 1
        return out

    fake = types.SimpleNamespace(apply=apply)
    monkeypatch.setattr(sess_mod, "get_model", lambda mt: fake)

    config = ConfigDict({"training": {"target_instrument": "vocals",
                                      "instruments": ["vocals", "other"]},
                         "audio": {"sample_rate": 44100, "num_channels": 2},
                         "inference": {}})
    spec = DemixSpec(chunk_size=4096, num_overlap=2, batch_size=2, num_stems=1)
    s = InferenceSession("fake", config, params={}, spec=spec,
                         compute_dtype=jnp.bfloat16)
    mix = np.random.default_rng(0).standard_normal((2, 10000)).astype(np.float32) * 0.2
    stems = s.separate(mix)
    assert calls["bf16"] >= 1 and calls["f32"] >= 1, calls
    assert np.isfinite(stems["vocals"]).all()
    assert s.compute_dtype is None  # session stays rescued
