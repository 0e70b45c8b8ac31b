"""bf16 compute_dtype paths for the conv/band model families.

bs_roformer has had a compute_dtype path from the start; these cover the
families that previously TypeError'd out of bf16 (the session silently
fell back to f32). Each forward must stay finite and track the f32
output within bf16 tolerance on tiny shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict


def _mix(t, seed=0, ch=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, ch, t)).astype(np.float32) * 0.1)


def _check(apply_fn, params, x, atol=0.08):
    ref = np.asarray(apply_fn(params, x, None), dtype=np.float32)
    got = np.asarray(apply_fn(params, x, jnp.bfloat16), dtype=np.float32)
    assert np.isfinite(got).all()
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() < atol * scale, (
        np.abs(got - ref).max(), scale)


def test_mdx23c_bf16():
    from sesa_tpu.models import mdx23c
    config = ConfigDict({
        "audio": dict(n_fft=512, hop_length=128, dim_f=256, num_channels=2,
                      chunk_size=8064, sample_rate=44100),
        "model": dict(num_subbands=2, num_scales=2, scale=[2, 2],
                      num_blocks_per_scale=1, num_channels=8, growth=4,
                      bottleneck_factor=2, norm="InstanceNorm", act="gelu"),
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })
    params = mdx23c.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: mdx23c.apply(p, config, x, compute_dtype=d),
           params, _mix(8064))


def test_htdemucs_bf16():
    from sesa_tpu.models import htdemucs
    config = ConfigDict({
        "model": "htdemucs",
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": 44100, "segment": 2},
        "htdemucs": dict(channels=8, growth=2, nfft=2048, depth=4,
                         kernel_size=8, stride=4, norm_starts=2,
                         norm_groups=4, dconv_depth=2, dconv_comp=4,
                         t_layers=3, t_heads=4, t_hidden_scale=2.0,
                         freq_emb=0.2, emb_scale=10),
    })
    params = htdemucs.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: htdemucs.apply(p, config, x, compute_dtype=d),
           params, _mix(512 * 64))


def test_scnet_bf16():
    from sesa_tpu.models import scnet
    config = ConfigDict({"model": dict(
        dims=[4, 8, 16, 32], nfft=512, hop_size=128, win_size=512,
        normalized=True, num_dplayer=2, expand=1,
        band_SR=[0.175, 0.392, 0.433], band_stride=[1, 4, 16],
        band_kernel=[3, 4, 16], conv_depths=[3, 2, 1],
    )})
    params = scnet.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: scnet.apply(p, config, x, compute_dtype=d),
           params, _mix(8192), atol=0.12)  # BiLSTM compounds bf16 rounding


def test_mel_band_conformer_bf16():
    from sesa_tpu.models import mel_band_conformer
    config = ConfigDict({"model": dict(
        dim=64, depth=1, stereo=True, num_stems=1, num_bands=20,
        time_conformer_depth=1, freq_conformer_depth=1,
        stft_n_fft=512, stft_hop_length=128, stft_win_length=512,
    )})
    params = mel_band_conformer.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: mel_band_conformer.apply(p, config, x,
                                                    compute_dtype=d),
           params, _mix(8064))


def test_apollo_bf16():
    from sesa_tpu.models import apollo
    config = ConfigDict({"model": dict(sr=16000, win=20, feature_dim=16,
                                       layer=1)})
    params = apollo.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: apollo.apply(p, config, x, compute_dtype=d),
           params, _mix(16000))


def test_bs_mamba2_bf16():
    from sesa_tpu.models import bs_mamba2
    config = ConfigDict({"model": dict(sr=44100, win=1024, stride=512,
                                       feature_dim=32, num_repeat_mask=1,
                                       num_repeat_map=1, num_output=2)})
    params = bs_mamba2.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: bs_mamba2.apply(p, config, x, compute_dtype=d),
           params, _mix(22050), atol=0.12)  # SSD decay chain compounds bf16


def test_scnet_tran_and_masked_bf16():
    """The tran/masked shims forward compute_dtype (regression: their
    apply signatures omitted it, so bf16 sessions silently ran f32; the
    masked variant then ALSO crashed on mixed conv dtypes when called
    with bf16 directly)."""
    from tests.test_scnet import tiny_kwargs
    from sesa_tpu.models import scnet_masked, scnet_tran

    kw = tiny_kwargs()
    kw.update(tran_rotary_embedding_dim=8, tran_depth=1, tran_heads=2,
              tran_dim_head=8)
    config = ConfigDict({"model": kw})
    params = scnet_tran.init(jax.random.PRNGKey(0), config)
    _check(lambda p, x, d: scnet_tran.apply(p, config, x, compute_dtype=d),
           params, _mix(6000), atol=0.15)

    config_m = ConfigDict({"model": tiny_kwargs()})
    params_m = scnet_masked.init(jax.random.PRNGKey(1), config_m)
    _check(lambda p, x, d: scnet_masked.apply(p, config_m, x, compute_dtype=d),
           params_m, _mix(6000), atol=0.15)
