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

    config = tiny_config()
    config.model = "hdemucs"
    with pytest.raises(NotImplementedError, match="hdemucs"):
        htdemucs._kwargs(config)

    config = tiny_config()
    config.htdemucs.multi_freqs = [2, 4]
    with pytest.raises(NotImplementedError, match="multi_freqs"):
        htdemucs._kwargs(config)


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
