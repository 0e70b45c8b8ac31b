"""App-layer surface: i18n, config manager, helpers, clean names, gui import
gating, orchestrator generators (no-model paths)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def test_i18n_loads_and_translates():
    from sesa_tpu.i18n import I18nAuto

    i = I18nAuto(language="en_US")
    assert i("total_files_found")  # known key resolves
    assert i("__missing_key__") == "__missing_key__"
    assert len(I18nAuto.available_languages()) >= 11


def test_config_manager_round_trip(tmp_path, monkeypatch):
    import sesa_tpu.config_manager as cm

    monkeypatch.setattr(cm, "CONFIG_DIR", str(tmp_path))
    monkeypatch.setattr(cm, "CONFIG_FILE", str(tmp_path / "config.json"))
    cfg = cm.load_config()
    assert cfg["settings"]["chunk_size"] == 352800
    favs = cm.update_favorites(cfg["favorites"], "M1")
    cm.save_config(favs, cfg["settings"], cfg["presets"])
    assert cm.load_config()["favorites"] == ["M1"]
    presets = cm.save_preset({}, "p", ["A ⭐"], "avg_wave")
    assert presets["p"]["models"] == ["A"]
    assert cm.delete_preset(presets, "p") == {}


def test_clean_model_name():
    from sesa_tpu.clean_model import clean_model_name

    assert clean_model_name("VOCALS-InstVocHQ") == "InstVocHQ"
    assert clean_model_name("Some New Model (by someone)") == "SomeNewModel"  # spaces stripped like the reference


def test_helpers_sanitize_and_dirs(tmp_path, monkeypatch):
    from sesa_tpu import helpers

    monkeypatch.setattr(helpers, "INPUT_DIR", str(tmp_path / "in"))
    monkeypatch.setattr(helpers, "OUTPUT_DIR", str(tmp_path / "out"))
    monkeypatch.setattr(helpers, "OLD_OUTPUT_DIR", str(tmp_path / "old"))
    monkeypatch.setattr(helpers, "ENSEMBLE_DIR", str(tmp_path / "ens"))
    monkeypatch.setattr(helpers, "AUTO_ENSEMBLE_TEMP", str(tmp_path / "aet"))
    monkeypatch.setattr(helpers, "AUTO_ENSEMBLE_OUTPUT", str(tmp_path / "aeo"))
    helpers.setup_directories()
    assert os.path.isdir(str(tmp_path / "in"))
    assert helpers.sanitize_filename("a b/c*d.wav") == "a_b_c_d.wav"
    (tmp_path / "in" / "x.txt").write_text("hi")
    helpers.clear_directory(str(tmp_path / "in"))
    assert os.listdir(str(tmp_path / "in")) == []


def test_find_clear_segment(tmp_path):
    from sesa_tpu import helpers
    from sesa_tpu.audio_io import write_audio

    sr = 44100
    t = np.arange(sr * 30) / sr
    quiet = 0.01 * np.random.default_rng(0).standard_normal(sr * 10)
    loud = 0.5 * np.sin(2 * np.pi * 440 * t[: sr * 10])
    track = np.concatenate([quiet, loud, quiet]).astype(np.float32)
    path = str(tmp_path / "track.wav")
    write_audio(path, track[None], sr)
    start, end, seg = helpers.find_clear_segment(path)
    assert 5 <= start <= 15  # the loud region starts at 10 s
    assert len(seg) > 0


def test_gui_import_without_gradio():
    from sesa_tpu import gui

    if not gui.GRADIO_AVAILABLE:
        with pytest.raises(RuntimeError, match="gradio"):
            gui.create_interface()
    assert "progress-fill" in gui.progress_html(50)


def test_gui_wires_all_16_stem_slots():
    """The UI must expose every slot processing.py fills (reference
    gui.py:523-552 renders all 16; round-3 UI silently dropped 10)."""
    from sesa_tpu import gui, processing

    slot_names = [name for name, _ in gui.STEM_LABELS]
    assert sorted(slot_names) == sorted(processing.STEM_SLOTS)
    assert len(slot_names) == 16

    upd = {"slots": {"male": "m.wav", "karaoke": "k.wav", "bleed": "b.wav"}}
    outs = gui.slot_outputs(upd)
    assert len(outs) == 16
    assert outs[slot_names.index("male")] == "m.wav"
    assert outs[slot_names.index("karaoke")] == "k.wav"
    assert outs[slot_names.index("bleed")] == "b.wav"
    assert outs[slot_names.index("vocals")] is None
    # updates without slots (mid-progress) map to all-empty, not a crash
    assert gui.slot_outputs({"progress": 10}) == [None] * 16


def test_batch_process_folder_empty_generator(tmp_path):
    """A file whose processing yields NO updates must be reported as failed
    — not crash with NameError on the loop variable (round-3 gui.py:153-158
    bug), and must not discard outputs of files already processed."""
    from sesa_tpu.gui import batch_process_folder

    (tmp_path / "ok.wav").write_bytes(b"")
    (tmp_path / "zz_bad.wav").write_bytes(b"")

    def fake_process(path, model, chunk, overlap, fmt):
        if "zz_bad" in path:
            return  # generator that yields nothing
        yield {"progress": 100, "status": "Done", "outputs": [path + ".out"]}

    status, outs = batch_process_folder(
        str(tmp_path), "model", 352800, 2, "wav FLOAT",
        process_fn=fake_process)
    assert status.startswith("Processed 1/2")
    assert "zz_bad.wav (no progress updates yielded)" in status
    assert outs == [str(tmp_path / "ok.wav") + ".out"]


def test_batch_process_folder_missing():
    from sesa_tpu.gui import batch_process_folder

    status, outs = batch_process_folder("/nonexistent_dir", "m", 1, 2, "wav FLOAT")
    assert status == "Folder not found" and outs == []


def test_process_audio_no_input():
    from sesa_tpu.processing import process_audio

    updates = list(process_audio("/nonexistent.wav", "whatever"))
    assert updates[-1]["status"] == "No input file selected"


def test_ensemble_audio_fn_requires_two():
    from sesa_tpu.processing import ensemble_audio_fn

    updates = list(ensemble_audio_fn(["one.wav"], "avg_wave"))
    assert "at least two" in updates[-1]["status"]


def test_audio_io_pcm_roundtrips(tmp_path):
    from sesa_tpu.audio_io import read_audio, write_audio

    # keep |x| < 1: integer PCM clips at full scale
    x = np.clip(np.random.default_rng(0).standard_normal((2, 5000)) * 0.3,
                -0.99, 0.99).astype(np.float32)
    for subtype, tol in (("FLOAT", 1e-6), ("PCM_16", 1e-4), ("PCM_24", 1e-6)):
        p = str(tmp_path / f"t_{subtype}.wav")
        write_audio(p, x, 44100, subtype=subtype)
        back, sr = read_audio(p)
        assert sr == 44100
        np.testing.assert_allclose(back, x, atol=tol)
