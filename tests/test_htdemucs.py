"""HTDemucs: forward shape/finiteness with a scaled-down config, plan
consistency, and converter structure. (The demucs package is unavailable
offline, so validation is structural; the top-level pipeline follows the
in-repo reference exactly — models/demucs4ht.py.)"""

import numpy as np

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import htdemucs


def tiny_config():
    return ConfigDict({
        "model": "htdemucs",
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": 44100, "segment": 2},
        "htdemucs": dict(channels=8, growth=2, nfft=2048, depth=4,
                         kernel_size=8, stride=4, norm_starts=2,
                         norm_groups=4, dconv_depth=2, dconv_comp=4,
                         t_layers=3, t_heads=4, t_hidden_scale=2.0,
                         freq_emb=0.2, emb_scale=10),
    })


def test_layer_plan_shapes():
    kw = htdemucs._kwargs(tiny_config())
    plan = htdemucs._layer_plan(kw)
    assert len(plan) == 4
    assert plan[0]["chin_z"] == 4 and plan[0]["chout_z"] == 8
    assert plan[0]["freqs"] == 1024
    assert plan[1]["freqs"] == 256
    # decoder of layer 0 maps back to sources*channels*2 CaC channels
    assert plan[0]["dec_chin_z"] == 4 * 2 * 2


def test_forward_shapes():
    config = tiny_config()
    params = htdemucs.init(jax.random.PRNGKey(0), config)
    # hop = nfft/4 = 128; time branch needs length divisible by stride**depth
    t = 512 * 64  # hop=512; branches stay separate (no merge at depth 4)
    x = np.random.default_rng(0).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_num_subbands():
    """num_subbands > 1 folds frequency rows into channels (reference
    demucs4ht.py:534-546,568-569,663-666)."""
    config = tiny_config()
    config.htdemucs.num_subbands = 2
    kw = htdemucs._kwargs(config)
    plan = htdemucs._layer_plan(kw)
    assert plan[0]["chin_z"] == 2 * 2 * 2          # ch * cac * subbands
    assert plan[0]["dec_chin_z"] == 4 * 2 * 2 * 2  # sources * ch * cac * subs

    params = htdemucs.init(jax.random.PRNGKey(1), config)
    t = 512 * 64
    x = np.random.default_rng(1).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()


def test_subband_fold_matches_reference_formula():
    """cac2cws/cws2cac fold exactly as the reference reshapes."""
    import torch

    rng = np.random.default_rng(2)
    b, c, f, t, k = 2, 4, 12, 5, 3
    x = rng.standard_normal((b, c, f, t)).astype(np.float32)

    tx = torch.from_numpy(x)
    ref_fold = tx.reshape(b, c, k, f // k, t).reshape(b, c * k, f // k, t)
    got_fold = jnp.asarray(x).reshape(b, c, k, f // k, t).reshape(b, c * k, f // k, t)
    np.testing.assert_array_equal(np.asarray(got_fold), ref_fold.numpy())

    ref_unfold = ref_fold.reshape(b, c, k, f // k, t).reshape(b, c, f, t)
    got_unfold = got_fold.reshape(b, c, k, f // k, t).reshape(b, c, f, t)
    np.testing.assert_array_equal(np.asarray(got_unfold), x)
    np.testing.assert_array_equal(ref_unfold.numpy(), x)


def test_typed_rejections():
    import pytest

    # demucs/hdemucs are now implemented; anything else stays typed
    config = tiny_config()
    config.model = "tasnet"
    with pytest.raises(NotImplementedError, match="tasnet"):
        htdemucs._kwargs(config)


def multi_config():
    config = tiny_config()
    # norm layers cannot be wrapped (MultiWrap asserts not layer.norm;
    # real htdemucs runs norm_starts=4 > multi_freqs_depth=3)
    config.htdemucs.multi_freqs = [0.25, 0.5]
    config.htdemucs.multi_freqs_depth = 2
    return config


def test_multi_freqs_equivalence():
    """MultiWrap's documented invariant (demucs v4 hdemucs.py MultiWrap
    docstring): if all band replicas share one set of weights, the wrapped
    layer is EXACTLY the unwrapped layer. This pins the band-edge/overlap/
    crop geometry without needing the (offline-unavailable) demucs pkg."""
    config = multi_config()
    kw = htdemucs._kwargs(config)
    params = htdemucs.init(jax.random.PRNGKey(3), config)
    rng = np.random.default_rng(7)

    # encoder layer 0: tie all three bands to band 0's weights
    sub = params["encoder"][0]["layers"][0]
    tied = {"layers": [sub] * 3}
    x = jnp.asarray(rng.standard_normal((1, 4, 1024, 8)).astype(np.float32) * 0.3)
    got = htdemucs._henc_multi(tied, x, kw, 8, 4, False)
    want = htdemucs._henc_apply(sub, x, kw, True, 8, 4, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    # decoder (outermost = params["decoder"][-1]): same weight-tying
    dsub = params["decoder"][-1]["layers"][0]
    dtied = {"layers": [dsub] * 3}
    chin = dsub["conv_tr"]["weight"].shape[0]
    xd = jnp.asarray(rng.standard_normal((1, chin, 256, 8)).astype(np.float32) * 0.3)
    sk = jnp.asarray(rng.standard_normal((1, chin, 256, 8)).astype(np.float32) * 0.3)
    got, _ = htdemucs._hdec_multi(dtied, xd, sk, kw, 8, 4, chin=chin, last=False)
    want, _ = htdemucs._hdec_apply(dsub, xd, sk, None, kw, True, 8, 4, True,
                                   chin=chin, last=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_multi_freqs_forward():
    config = multi_config()
    params = htdemucs.init(jax.random.PRNGKey(0), config)
    assert "layers" in params["encoder"][0] and "layers" in params["decoder"][-1]
    assert "layers" not in params["encoder"][2]
    # wrapped decoders lose the freq-axis rewrite context (context_freq=False)
    assert params["decoder"][-1]["layers"][0]["rewrite"]["weight"].shape[2] == 1
    t = 512 * 16
    x = np.random.default_rng(0).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()


def test_session_demucs_mode():
    """htdemucs sessions use demucs-mode chunking (plain averaging)."""
    from sesa_tpu.runtime.demix import DemixSpec

    spec = DemixSpec(chunk_size=44100, num_overlap=2, batch_size=2,
                     num_stems=4, demucs_mode=True)
    assert spec.border == 0 and spec.step == 22050


def test_forward_wiener_mode():
    """cac=False: magnitude input, Wiener EM output (reference :470-517)."""
    config = tiny_config()
    config.htdemucs.update(cac=False, wiener_iters=1, wiener_residual=True)
    params = htdemucs.init(jax.random.PRNGKey(1), config)
    t = 512 * 64
    x = np.random.default_rng(1).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_softmask_mode():
    """cac=False, wiener_iters<0: mix-phase soft mask."""
    config = tiny_config()
    config.htdemucs.update(cac=False, wiener_iters=-1)
    params = htdemucs.init(jax.random.PRNGKey(2), config)
    t = 512 * 64
    x = np.random.default_rng(2).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_bottom_channels():
    """bottom_channels: 1x1 channel up/downsamplers around the transformer
    (all released htdemucs checkpoints use 512; reference :376-387,620-634)."""
    config = tiny_config()
    config.htdemucs.update(bottom_channels=96)
    params = htdemucs.init(jax.random.PRNGKey(3), config)
    assert "channel_upsampler" in params
    assert params["crosstransformer"]["layers"][0]["gamma_1"].shape == (96,)
    t = 512 * 64
    x = np.random.default_rng(3).standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = htdemucs.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, t)
    assert np.isfinite(np.asarray(out)).all()
