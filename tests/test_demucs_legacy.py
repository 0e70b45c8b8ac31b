"""Legacy time-domain Demucs: parity vs the hand-written torch oracle.

Reference dispatch: models/demucs4ht.py:696-713 routes ``model: demucs``
to demucs.demucs.Demucs (external package, unavailable offline; oracle in
tests/oracles/torch_demucs_legacy.py documents the reconstruction).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import demucs_legacy, htdemucs
from tests.oracles.torch_demucs_legacy import Demucs, resample_frac


def tiny_config(lstm_layers=2, depth=5, resample=True):
    # depth 5 with norm_starts/dconv_attn/dconv_lstm at 4 exercises plain
    # layers AND the GroupNorm/LocalState/BLSTM-augmented deep layers
    return ConfigDict({
        "model": "demucs",
        "demucs": {"channels": 8, "depth": depth, "lstm_layers": lstm_layers,
                   "resample": resample, "dconv_comp": 2},
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": 44100, "segment": 2},
    })


def torch_model(config, seed=0):
    torch.manual_seed(seed)
    kw = demucs_legacy.kwargs_from_config(config)
    m = Demucs(
        sources=kw["sources"], audio_channels=kw["audio_channels"],
        channels=kw["channels"], depth=kw["depth"],
        lstm_layers=kw["lstm_layers"], resample=kw["resample"],
        dconv_comp=kw["dconv_comp"])
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.2, 0.2)
    m.eval()
    return m


@pytest.mark.parametrize("lstm_layers", [0, 2])
def test_forward_parity(lstm_layers):
    config = tiny_config(lstm_layers=lstm_layers)
    m = torch_model(config)
    params = demucs_legacy.convert_torch(m.state_dict(), config)
    rng = np.random.default_rng(0)
    # T long enough that the deepest DConv BLSTM (max_steps=200) frames:
    # T*2 / 4^4 > 200 -> T > 25600
    x = rng.standard_normal((1, 2, 30000)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = np.asarray(demucs_legacy.apply(params, config, jnp.asarray(x)))
    assert out.shape == ref.shape == (1, 4, 2, 30000)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_framed_blstm_parity():
    """Direct parity of the framed (max_steps=200) skip-BLSTM path — at
    real song lengths the deep DConv BLSTMs always frame (T*2/4^5 > 200
    for segments over ~2.3 s), but the tiny forward-parity inputs above
    stay below the threshold, so the stitch geometry needs its own test."""
    from tests.oracles.torch_demucs_legacy import BLSTM

    torch.manual_seed(5)
    dim, t = 6, 517  # t > max_steps and NOT a multiple of the stride
    m = BLSTM(dim, layers=2, max_steps=200, skip=True)
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.3, 0.3)
    m.eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in m.state_dict().items()}

    def side(li, suffix):
        return {"weight_ih": sd[f"lstm.weight_ih_l{li}{suffix}"],
                "weight_hh": sd[f"lstm.weight_hh_l{li}{suffix}"],
                "bias_ih": sd[f"lstm.bias_ih_l{li}{suffix}"],
                "bias_hh": sd[f"lstm.bias_hh_l{li}{suffix}"]}

    p = {"layers": [{"fwd": side(li, ""), "bwd": side(li, "_reverse")}
                    for li in range(2)],
         "linear": {"weight": sd["linear.weight"], "bias": sd["linear.bias"]}}
    x = np.random.default_rng(6).standard_normal((2, dim, t)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = np.asarray(demucs_legacy._blstm(p, jnp.asarray(x), max_steps=200,
                                          skip=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_resample_parity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 1000)).astype(np.float32)
    up_ref = resample_frac(torch.from_numpy(x), 1, 2).numpy()
    up = np.asarray(demucs_legacy._resample(jnp.asarray(x), 1, 2))
    np.testing.assert_allclose(up, up_ref, atol=1e-5)
    down_ref = resample_frac(torch.from_numpy(up_ref), 2, 1).numpy()
    down = np.asarray(demucs_legacy._resample(jnp.asarray(up), 2, 1))
    np.testing.assert_allclose(down, down_ref, atol=1e-5)
    # x2 round trip is near-lossless for band-limited content (the sinc
    # rolloff at 0.945 Nyquist only touches the top of the band)
    t = np.arange(4096, dtype=np.float32)
    sine = np.sin(2 * np.pi * 0.1 * t)[None, None, :].astype(np.float32)
    rt = np.asarray(demucs_legacy._resample(
        demucs_legacy._resample(jnp.asarray(sine), 1, 2), 2, 1))
    assert np.abs(rt - sine)[..., 64:-64].max() < 1e-3


def test_htdemucs_module_dispatch():
    """model_type 'htdemucs' + config model: demucs routes to the port."""
    config = tiny_config(lstm_layers=0, depth=4)
    m = torch_model(config, seed=1)
    params = htdemucs.convert_torch(m.state_dict(), config)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 4096)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = np.asarray(htdemucs.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_unknown_variant_still_typed():
    config = tiny_config()
    config.model = "tasnet"
    with pytest.raises(NotImplementedError, match="tasnet"):
        htdemucs.convert_torch({}, config)


def test_converter_is_strict():
    config = tiny_config()
    m = torch_model(config)
    sd = dict(m.state_dict())
    sd["encoder.0.0.stray"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        demucs_legacy.convert_torch(sd, config)


def test_session_demucs_mode_flow(tmp_path):
    """model_type 'htdemucs' + YAML model: demucs must flow through the
    session's demucs-mode chunked demix (chunk = samplerate * segment,
    plain averaging; reference utils.py:330-477 demucs branch)."""
    import yaml
    from sesa_tpu.runtime.session import InferenceSession

    cfg = {
        "model": "demucs",
        "demucs": {"channels": 8, "depth": 4, "lstm_layers": 0,
                   "resample": True, "dconv_comp": 2},
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": 44100, "segment": 0.5},
        "inference": {"num_overlap": 2, "batch_size": 2},
    }
    path = str(tmp_path / "demucs.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    sess = InferenceSession.create("htdemucs", path, "", seed=0,
                                   compute_dtype=None)
    assert sess.spec.demucs_mode and sess.spec.chunk_size == 22050
    song = (np.random.default_rng(7).standard_normal((2, 44100))
            .astype(np.float32) * 0.2)
    stems = sess.separate(song)
    assert sorted(stems) == ["bass", "drums", "other", "vocals"]
    for wav in stems.values():
        assert wav.shape == song.shape and np.isfinite(wav).all()


def test_fresh_init_forward():
    config = tiny_config(lstm_layers=2, depth=5)
    params = demucs_legacy.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(3).standard_normal((1, 2, 8192)).astype(np.float32)
    out = np.asarray(demucs_legacy.apply(params, config, jnp.asarray(x)))
    assert out.shape == (1, 4, 2, 8192)
    assert np.isfinite(out).all()
