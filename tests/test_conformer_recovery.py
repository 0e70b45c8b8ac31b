"""Conformer field-recovery path (README 'Conformer checkpoint layout
recovery'): the SESA_CONFORMER_KEY_MAP escape hatch renames a
differently-wrapped checkpoint back onto the assumed lucidrains layout,
and the failure modes a user hits without it are loud and actionable."""

import json

import numpy as np
import pytest

import jax

from ml_collections import ConfigDict

from sesa_tpu.models import conformer
from sesa_tpu.models.conformer_core import apply_key_map

pytestmark = pytest.mark.smoke


def _config():
    return ConfigDict({
        "model": dict(in_channels=2, sources=2, freq_bins=129, embed_dim=32,
                      depth=2, dim_head=8, heads=4, ff_mult=2,
                      conv_expansion_factor=2, conv_kernel_size=7),
        "stft": dict(n_fft=256, hop_length=64, win_length=256, center=True),
    })


def test_apply_key_map_noop_without_env(monkeypatch):
    monkeypatch.delenv("SESA_CONFORMER_KEY_MAP", raising=False)
    sd = {"a.b": 1}
    assert apply_key_map(sd) == sd


def test_apply_key_map_rules(tmp_path, monkeypatch):
    path = tmp_path / "map.json"
    path.write_text(json.dumps({
        "wrapper.": "",            # prefix strip
        "exact.key": "new.key",    # exact rename (also a prefix candidate)
        "pin.x$": "pinned.x",      # $: exact-only, never a prefix
    }))
    monkeypatch.setenv("SESA_CONFORMER_KEY_MAP", str(path))
    sd = {
        "wrapper.core.w": 1,
        "exact.key": 2,
        "exact.key.sub": 3,        # longest-prefix: "exact.key" applies
        "pin.x": 4,
        "pin.x.sub": 5,            # $-pinned: prefix must NOT fire
        "untouched": 6,
    }
    out = apply_key_map(sd)
    assert out == {
        "core.w": 1,
        "new.key": 2,
        "new.key.sub": 3,
        "pinned.x": 4,
        "pin.x.sub": 5,
        "untouched": 6,
    }


def test_wrapped_checkpoint_recovers_via_key_map(tmp_path, monkeypatch):
    """A checkpoint saved under an extra wrapper prefix fails loudly,
    then converts cleanly once the documented key map is supplied."""
    from tests.oracles.layout_keygen import conformer_state_dict

    config = _config()
    sd = conformer_state_dict(config)
    wrapped = {"module." + k: v for k, v in sd.items()}

    monkeypatch.delenv("SESA_CONFORMER_KEY_MAP", raising=False)
    with pytest.raises(KeyError, match="layout recovery"):
        conformer.convert_torch(wrapped, config)

    path = tmp_path / "map.json"
    path.write_text(json.dumps({"module.": ""}))
    monkeypatch.setenv("SESA_CONFORMER_KEY_MAP", str(path))
    converted = conformer.convert_torch(wrapped, config)
    want = jax.tree_util.tree_structure(
        conformer.init(jax.random.PRNGKey(0), config))
    assert jax.tree_util.tree_structure(converted) == want


def test_missing_key_error_names_closest_and_readme():
    config = _config()
    from tests.oracles.layout_keygen import conformer_state_dict

    sd = conformer_state_dict(config)
    # typo one key the converter needs: nearest-match hint must surface it
    sd["core.input_proj_stft.weights"] = sd.pop("core.input_proj_stft.weight")
    with pytest.raises(KeyError) as ei:
        conformer.convert_torch(sd, config)
    msg = str(ei.value)
    assert "closest present keys" in msg
    assert "core.input_proj_stft.weights" in msg


def test_unconsumed_key_error_points_at_readme():
    config = _config()
    from tests.oracles.layout_keygen import conformer_state_dict

    sd = conformer_state_dict(config)
    sd["core.extra_head.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="layout recovery"):
        conformer.convert_torch(sd, config)
