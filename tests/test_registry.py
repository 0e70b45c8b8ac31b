"""Registry layer: data integrity, URL fixing, YAML repair, conf_edit,
custom-model CRUD (network-free)."""

import os

import numpy as np

import pytest
import yaml

from sesa_tpu import registry as R


def test_registry_data_loaded():
    total = sum(len(cat) for cat in R.MODEL_CONFIGS.values())
    assert total >= 120, total
    assert "Vocal Models" in R.MODEL_CONFIGS
    entry = R.MODEL_CONFIGS["Vocal Models"]["VOCALS-BS-Roformer_1297 (by viperx)"]
    assert entry["model_type"] == "bs_roformer"
    assert any("http" in u for u in entry["download_urls"] if isinstance(u, str))


def test_every_entry_is_wellformed():
    for cat, models in R.MODEL_CONFIGS.items():
        for name, e in models.items():
            assert e["model_type"], (cat, name)
            assert e["config_path"], (cat, name)
            assert e["start_check_point"], (cat, name)
            assert e["download_urls"], (cat, name)


def test_fix_huggingface_url():
    u = "https://huggingface.co/u/r/blob/main/m.ckpt"
    assert R.fix_huggingface_url(u) == "https://huggingface.co/u/r/resolve/main/m.ckpt"
    assert R.fix_huggingface_url("https://github.com/x") == "https://github.com/x"
    assert R.fix_huggingface_url(None) is None


def test_validate_yaml_content_rejects_html():
    ok, err = R.validate_yaml_content("<!DOCTYPE html><html>...")
    assert not ok and "/resolve/" in err
    ok, _ = R.validate_yaml_content("audio:\n  chunk_size: 352800\n")
    assert ok


def test_preprocess_yaml_quotes_urls_and_tabs():
    raw = "model:\n\turl: https://x.com/a:b\n\tpath: C:\\models\\x\n\tdim: 512\n"
    fixed = R.preprocess_yaml_content(raw)
    data = yaml.safe_load(fixed)
    assert data["model"]["url"] == "https://x.com/a:b"
    assert data["model"]["dim"] == 512


def test_conf_edit_preserves_native_chunk(tmp_path, monkeypatch):
    monkeypatch.setattr(R.models if hasattr(R, "models") else R, "CHECKPOINT_DIR", str(tmp_path), raising=False)
    import sesa_tpu.registry.models as M

    monkeypatch.setattr(M, "CHECKPOINT_DIR", str(tmp_path))
    cfg = {"audio": {"chunk_size": 485100}, "inference": {"batch_size": 1}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    M.conf_edit("c.yaml", chunk_size=123, overlap=4)
    out = yaml.safe_load(p.read_text())
    assert out["audio"]["chunk_size"] == 485100  # native preserved
    assert out["inference"]["num_overlap"] == 4
    assert out["inference"]["batch_size"] == 2  # bumped from 1
    assert out["training"]["use_amp"] is True
    assert not os.path.exists(str(p) + ".backup")


def test_conf_edit_restores_backup_on_html(tmp_path, monkeypatch):
    import sesa_tpu.registry.models as M

    monkeypatch.setattr(M, "CHECKPOINT_DIR", str(tmp_path))
    p = tmp_path / "bad.yaml"
    p.write_text("<html>nope</html>")
    with pytest.raises(ValueError):
        M.conf_edit("bad.yaml", 1, 2)
    assert p.read_text() == "<html>nope</html>"  # restored


def test_custom_model_crud(tmp_path, monkeypatch):
    import sesa_tpu.registry.models as M

    monkeypatch.setattr(M, "CUSTOM_MODELS_FILE", str(tmp_path / "custom.json"))
    monkeypatch.setattr(M, "CHECKPOINT_DIR", str(tmp_path))

    ok, msg = M.add_custom_model(
        "My Model", "auto",
        "https://huggingface.co/u/r/blob/main/my_bs_roformer.ckpt",
        "https://huggingface.co/u/r/blob/main/cfg.yaml",
    )
    assert ok, msg
    models = M.load_custom_models()
    assert models["My Model"]["model_type"] == "bs_roformer"
    assert "/resolve/" in models["My Model"]["checkpoint_url"]

    ok, msg = M.add_custom_model("My Model", "auto",
                                 "https://x/other_bs_roformer.ckpt", "https://x/c.yaml")
    assert not ok and "exists" in msg

    assert ("My Model", "bs_roformer") in M.get_custom_models_list()
    assert "Custom Models" in M.get_all_model_configs_with_custom()

    ok, _ = M.delete_custom_model("My Model")
    assert ok and M.load_custom_models() == {}


def test_detect_model_type():
    assert R.detect_model_type_from_url("https://x/MelBandRoformer_big.ckpt") == "mel_band_roformer"
    assert R.detect_model_type_from_url("https://x/model_mdx23c.ckpt") == "mdx23c"
    assert R.detect_model_type_from_url("https://x/unknown.bin") is None


def test_get_model_config_lists_names():
    names = R.get_model_config()
    assert len(names) >= 120
    assert "VOCALS-MelBand-Roformer (by KimberleyJSN)" in names


def test_registry_model_types_are_dispatchable():
    from sesa_tpu.models.registry import MODEL_TYPES

    types = {e["model_type"] for cat in R.MODEL_CONFIGS.values() for e in cat.values()}
    unknown = types - set(MODEL_TYPES) - {"bs_roformer_custom"}
    assert not unknown, unknown


def test_registry_declared_files_come_from_urls():
    """Every entry's config_path / start_check_point must be produced by
    one of its download_urls (basename, or [url, target] tuple), and no
    filename may be downloaded from materially different URLs by
    different entries (shared-cache first-download-wins corruption).

    The reference registry carries several such bugs verbatim (e.g.
    model.py:720-724 downloads config_vocals_becruily.yaml while declaring
    config_instrumental_becruily.yaml; three repos' generic config.yaml
    collide in the cache dir); this registry fixes them with [url, target]
    renames and this test keeps them fixed."""
    import os

    from sesa_tpu.registry.models import MODEL_CONFIGS

    # same-content mirrors of one upstream file (raw/resolve of the same
    # repo, or the identical config republished) — sharing a cache slot
    # is intended for these
    mirror_ok = {
        "config_melbandroformer_inst.yaml",
        "model_mel_band_roformer_denoise.yaml",
        "config_dnr_bandit_v2_mus64.yaml",
    }

    owners = {}
    for cat, models in MODEL_CONFIGS.items():
        for name, e in models.items():
            produced = {}
            for u in e["download_urls"]:
                if isinstance(u, (list, tuple)):
                    produced[u[1]] = u[0]
                else:
                    produced[os.path.basename(u)] = u
            for key in ("config_path", "start_check_point"):
                declared = e.get(key)
                assert declared in produced, (
                    f"{name}: {key}={declared!r} is not produced by any "
                    f"download_urls entry {sorted(produced)}")
            for fname, url in produced.items():
                if fname in mirror_ok:
                    continue
                prev = owners.setdefault(fname, url)
                assert prev == url, (
                    f"{fname} downloaded from two different URLs:\n"
                    f"  {prev}\n  {url}\n-> rename one side with a "
                    f"[url, target_filename] tuple")


def test_preprocess_yaml_preserves_valid_flow_collections():
    """Blanket colon-quoting corrupted valid YAML ('model: {dim: 512}'
    became a string); quoting must only fire when the value fails to
    parse as-is."""
    from sesa_tpu.registry.models import preprocess_yaml_content
    import yaml

    src = "model: {dim: 512, depth: 6}\nurl: https://x.co/y\npath: C:\\d\n"
    out = yaml.safe_load(preprocess_yaml_content(src))
    assert out["model"] == {"dim": 512, "depth": 6}
    assert out["url"] == "https://x.co/y"
    assert out["path"] == "C:\\d"
    # genuinely broken values still get rescued by quoting
    broken = "bad: a: b\n"
    out2 = yaml.safe_load(preprocess_yaml_content(broken))
    assert out2["bad"] == "a: b"


def test_download_rejects_truncation_and_html(tmp_path, monkeypatch):
    """Interrupted downloads must not be cached as complete files, and
    HTML pages served as checkpoints must fail at download time."""
    import sesa_tpu.registry.models as M

    class FakeResponse:
        def __init__(self, payload, total=None):
            self.status_code = 200
            self.headers = {"content-length": str(total if total is not None
                                                  else len(payload))}
            self._payload = payload

        def iter_content(self, chunk_size):
            yield self._payload

    def fake_get(url, stream, timeout):
        return fake_get.response

    monkeypatch.setattr(M, "CHECKPOINT_DIR", str(tmp_path))
    import requests
    monkeypatch.setattr(requests, "get", fake_get)

    # truncated: 10 bytes delivered of a declared 100
    fake_get.response = FakeResponse(b"x" * 10, total=100)
    with pytest.raises(RuntimeError, match="truncated"):
        M.download_file("https://host/model.ckpt")
    assert not (tmp_path / "model.ckpt").exists()
    assert not (tmp_path / "model.ckpt.part").exists()

    # HTML masquerading as a checkpoint
    fake_get.response = FakeResponse(b"<!DOCTYPE html><html>login</html>")
    with pytest.raises(ValueError, match="HTML page"):
        M.download_file("https://host/model.ckpt")
    assert not (tmp_path / "model.ckpt").exists()

    # good payload lands under the final name
    fake_get.response = FakeResponse(b"PK\x03\x04" + b"w" * 64)
    path = M.download_file("https://host/model.ckpt")
    assert path.endswith("model.ckpt") and (tmp_path / "model.ckpt").exists()


def test_phase_fixer_validations():
    from sesa_tpu.postprocess.phase_fixer import phase_fix_arrays

    a = np.zeros((2, 8192), dtype=np.float32)
    b = np.zeros((2, 4096), dtype=np.float32)
    with pytest.raises(ValueError, match="lengths differ"):
        phase_fix_arrays(a, b, 44100)
    with pytest.raises(ValueError, match="low_cutoff"):
        phase_fix_arrays(a, a, 44100, low_cutoff=9000, high_cutoff=500)


def test_ensemble_weight_count_validation(tmp_path):
    from sesa_tpu.postprocess.ensemble import ensemble_waveforms

    waves = [np.zeros((2, 100), dtype=np.float32)] * 3
    with pytest.raises(ValueError, match="weights"):
        ensemble_waveforms(waves, "avg_wave", weights=[0.5, 0.5])
