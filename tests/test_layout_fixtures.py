"""Pinned converter-layout fixtures for the reconstructed-layout families.

The htdemucs/demucs family, the conformer pair, and MaxViT-Unet have no
downloadable real checkpoints in this environment, so their torch key
layouts are reconstructions (reference demucs4ht.py:28-693, demucs
package, lucidrains conformer, smp Unet). These tests freeze what the
converters currently assume: each family's generated state dict's key
manifest (names + shapes) is committed under tests/fixtures/layouts/ and
compared exactly — a layout drift in a converter, an init, or a keygen
fails here with a readable diff instead of a silent field load failure.

Regenerate intentionally with
``SESA_REGEN_LAYOUT_FIXTURES=1 python -m pytest tests/test_layout_fixtures.py``
and review the git diff of the fixtures.

Each family also asserts convert_torch(state_dict) produces a pytree
with EXACTLY init()'s structure and leaf shapes, so converted params
are always interchangeable with fresh-init params.
"""

import json
import os

import numpy as np
import pytest

import jax

from ml_collections import ConfigDict

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "layouts")


def _manifest(sd):
    return {k: list(np.asarray(v).shape) for k, v in sd.items()}


def _assert_matches_fixture(name, sd):
    man = _manifest(sd)
    path = os.path.join(FIXDIR, f"{name}.json")
    if os.environ.get("SESA_REGEN_LAYOUT_FIXTURES"):
        os.makedirs(FIXDIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(man, f, indent=0, sort_keys=True)
    with open(path) as f:
        fixture = json.load(f)
    if man != fixture:
        added = sorted(set(man) - set(fixture))
        removed = sorted(set(fixture) - set(man))
        changed = [(k, fixture[k], man[k])
                   for k in sorted(set(man) & set(fixture))
                   if man[k] != fixture[k]]
        raise AssertionError(
            f"converter layout drift in {name}:\n"
            f"  keys added ({len(added)}): {added[:8]}\n"
            f"  keys removed ({len(removed)}): {removed[:8]}\n"
            f"  shapes changed ({len(changed)}): {changed[:8]}\n"
            "If intentional, regenerate with SESA_REGEN_LAYOUT_FIXTURES=1 "
            "and review the fixture diff.")


def _shape_map(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}


def _assert_init_compatible(converted, init_params, name):
    got, want = _shape_map(converted), _shape_map(init_params)
    if got != want:
        only_c = sorted(set(got) - set(want))
        only_i = sorted(set(want) - set(got))
        diff = [(k, want[k], got[k])
                for k in sorted(set(got) & set(want)) if got[k] != want[k]]
        raise AssertionError(
            f"{name}: convert_torch output differs from init():\n"
            f"  only in converted: {only_c[:8]}\n"
            f"  only in init: {only_i[:8]}\n  shape diffs: {diff[:8]}")


# --------------------------------------------------------------------------


def test_htdemucs_v4_layout():
    from sesa_tpu.models import htdemucs
    from tests.oracles.layout_keygen import htdemucs_state_dict
    from tests.test_htdemucs import tiny_config

    config = tiny_config()
    sd = htdemucs_state_dict(config)
    _assert_matches_fixture("htdemucs_v4", sd)
    converted = htdemucs.convert_torch(sd, config)
    _assert_init_compatible(
        converted, htdemucs.init(jax.random.PRNGKey(1), config), "htdemucs_v4")


def test_htdemucs_v4_multifreq_bottom_layout():
    """multi_freqs MultiWrap replicas + bottom_channels samplers."""
    from sesa_tpu.models import htdemucs
    from tests.oracles.layout_keygen import htdemucs_state_dict
    from tests.test_htdemucs import multi_config

    config = multi_config()
    config.htdemucs.bottom_channels = 16
    sd = htdemucs_state_dict(config)
    assert "channel_upsampler.weight" in sd
    assert "encoder.0.layers.2.conv.weight" in sd  # 3 bands
    _assert_matches_fixture("htdemucs_v4_multifreq_bottom", sd)
    converted = htdemucs.convert_torch(sd, config)
    _assert_init_compatible(
        converted, htdemucs.init(jax.random.PRNGKey(1), config),
        "htdemucs_v4_multifreq_bottom")


def test_hdemucs_v3_layout():
    from sesa_tpu.models import htdemucs
    from tests.test_hdemucs import hd_config, torch_model

    config = hd_config()
    sd = {k: v.numpy() for k, v in torch_model(config).state_dict().items()}
    _assert_matches_fixture("hdemucs_v3", sd)
    converted = htdemucs.convert_torch(sd, config)
    _assert_init_compatible(
        converted, htdemucs.init(jax.random.PRNGKey(1), config), "hdemucs_v3")


def test_demucs_legacy_layout():
    from sesa_tpu.models import demucs_legacy
    from tests.test_demucs_legacy import tiny_config, torch_model

    config = tiny_config(lstm_layers=2)
    sd = {k: v.numpy() for k, v in torch_model(config).state_dict().items()}
    _assert_matches_fixture("demucs_legacy", sd)
    converted = demucs_legacy.convert_torch(sd, config)
    _assert_init_compatible(
        converted, demucs_legacy.init(jax.random.PRNGKey(1), config),
        "demucs_legacy")


def test_conformer_layout():
    from sesa_tpu.models import conformer
    from tests.oracles.layout_keygen import conformer_state_dict

    config = ConfigDict({
        "model": dict(in_channels=2, sources=2, freq_bins=129, embed_dim=32,
                      depth=2, dim_head=8, heads=4, ff_mult=2,
                      conv_expansion_factor=2, conv_kernel_size=7),
        "stft": dict(n_fft=256, hop_length=64, win_length=256, center=True),
    })
    sd = conformer_state_dict(config)
    _assert_matches_fixture("conformer", sd)
    converted = conformer.convert_torch(sd, config)
    _assert_init_compatible(
        converted, conformer.init(jax.random.PRNGKey(1), config), "conformer")


def test_mel_band_conformer_layout():
    from sesa_tpu.models import mel_band_conformer
    from tests.oracles.layout_keygen import mel_band_conformer_state_dict

    config = ConfigDict({"model": dict(
        dim=16, depth=2, stereo=True, num_stems=2, time_conformer_depth=1,
        freq_conformer_depth=1, num_bands=8, dim_head=8, heads=2, ff_mult=2,
        conv_expansion_factor=2, conv_kernel_size=7, sample_rate=44100,
        stft_n_fft=128, stft_hop_length=32, stft_win_length=128,
        mask_estimator_depth=2,
    )})
    sd = mel_band_conformer_state_dict(config)
    _assert_matches_fixture("mel_band_conformer", sd)
    converted = mel_band_conformer.convert_torch(sd, config)
    _assert_init_compatible(
        converted, mel_band_conformer.init(jax.random.PRNGKey(1), config),
        "mel_band_conformer")


def test_maxvit_unet_layout():
    """Manifest-only: segm_models conversion parity is covered numerically
    in test_maxvit_unet.py; this pins the assumed smp/timm key layout."""
    from sesa_tpu.models import segm_models
    from tests.test_maxvit_unet import tiny_config, torch_model

    config = tiny_config()
    sd = {k: v.numpy() for k, v in torch_model().state_dict().items()}
    _assert_matches_fixture("maxvit_unet", sd)
    segm_models.convert_torch(sd, config)  # full consumption, no leftovers


def test_fixture_files_exist():
    for name in ("htdemucs_v4", "htdemucs_v4_multifreq_bottom", "hdemucs_v3",
                 "demucs_legacy", "conformer", "mel_band_conformer",
                 "maxvit_unet"):
        assert os.path.exists(os.path.join(FIXDIR, f"{name}.json")), name
