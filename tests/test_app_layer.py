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
    assert "1/2" in status
    assert "zz_bad.wav (no progress updates yielded)" in status
    assert outs == [str(tmp_path / "ok.wav") + ".out"]


def test_batch_process_folder_missing():
    from sesa_tpu.gui import batch_process_folder

    status, outs = batch_process_folder("/nonexistent_dir", "m", 1, 2, "wav FLOAT")
    assert "/nonexistent_dir" in status and outs == []


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


# ---------------------------------------------------------------------------
# i18n wiring (VERDICT r4 #3): the GUI routes every label/info/status
# string through I18nAuto, and every key it uses exists in en_us.json
# ---------------------------------------------------------------------------


def _gui_source():
    import sesa_tpu.gui as gui

    with open(gui.__file__, encoding="utf-8") as f:
        return f.read()


def _en_us():
    import json

    from sesa_tpu import i18n as i18n_mod

    path = os.path.join(i18n_mod.LANGUAGE_PATH, "en_us.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def test_gui_i18n_keys_all_exist():
    """Every i18n("key") literal in gui.py resolves in the en_us table
    (no dead keys), and the GUI actually internationalizes at scale — the
    reference makes ~254 i18n calls (reference gui.py:87-1548); round-4
    made exactly one."""
    import re

    src = _gui_source()
    keys = set(re.findall(r'i18n\("([^"]+)"\)', src))
    table = _en_us()
    missing = sorted(k for k in keys if k not in table)
    assert not missing, f"gui.py uses keys absent from en_us.json: {missing}"
    assert len(keys) >= 90, f"only {len(keys)} distinct i18n keys wired"
    assert len(re.findall(r'i18n\(', src)) >= 120


def test_gui_no_hardcoded_english_labels():
    """No gr widget carries a hardcoded English label= / info= /
    placeholder= string — everything routes through i18n (the two stem
    slots without table keys, Mid/Side, go through STEM_LABELS)."""
    import re

    src = _gui_source()
    hardcoded = re.findall(r'(?:label|info|placeholder)="[A-Za-z][^"]*"', src)
    assert not hardcoded, f"hardcoded UI strings: {hardcoded}"


def test_gui_stem_labels_have_locale_keys():
    from sesa_tpu import gui

    table = _en_us()
    missing = [k for _, k in gui.STEM_LABELS
               if k not in table and k not in ("Mid", "Side")]
    assert not missing


def test_gui_language_switch_changes_strings():
    """The locale data is live: the same key renders differently under
    another language table (tr_tr ships a full 377-key table)."""
    from sesa_tpu.i18n import I18nAuto

    en = I18nAuto(language="en_US")
    tr = I18nAuto(language="tr_TR")
    changed = sum(en(k) != tr(k) for k in
                  ("audio_separation_tab", "process", "chunk_size",
                   "overlap", "output_format"))
    assert changed >= 3


# ---------------------------------------------------------------------------
# settings persistence (VERDICT r4 #5): widget values round-trip through
# config_manager when Process is clicked
# ---------------------------------------------------------------------------


def test_persist_settings_round_trip(tmp_path, monkeypatch):
    import sesa_tpu.config_manager as cm
    from sesa_tpu.gui import persist_settings

    monkeypatch.setattr(cm, "CONFIG_DIR", str(tmp_path))
    monkeypatch.setattr(cm, "CONFIG_FILE", str(tmp_path / "config.json"))
    cfg = cm.load_config()
    persist_settings(cfg["settings"], cfg["favorites"], cfg["presets"],
                     chunk_size=100000, overlap=4,
                     export_format="flac PCM_24", use_tta=True,
                     auto_use_apollo=True, auto_apollo_chunk_size=11,
                     auto_matchering_passes=3)
    reloaded = cm.load_config()["settings"]
    assert reloaded["chunk_size"] == 100000
    assert reloaded["overlap"] == 4
    assert reloaded["export_format"] == "flac PCM_24"
    assert reloaded["use_tta"] is True
    assert reloaded["auto_use_apollo"] is True
    assert reloaded["auto_apollo_chunk_size"] == 11
    assert reloaded["auto_matchering_passes"] == 3
    # untouched settings keep their defaults
    assert reloaded["apollo_method"] == "normal_method"


def test_persist_settings_rejects_unknown_key(tmp_path, monkeypatch):
    import sesa_tpu.config_manager as cm
    from sesa_tpu.gui import persist_settings

    monkeypatch.setattr(cm, "CONFIG_DIR", str(tmp_path))
    monkeypatch.setattr(cm, "CONFIG_FILE", str(tmp_path / "config.json"))
    cfg = cm.load_config()
    with pytest.raises(KeyError):
        persist_settings(cfg["settings"], cfg["favorites"], cfg["presets"],
                         chunk_sizee=1)


def test_gui_auto_ensemble_wires_apollo_and_matchering():
    """The Auto Ensemble tab exposes the Apollo/Matchering controls its
    orchestrator accepts (reference gui.py:611,671-677,1523-1529) and the
    click handler passes them through; the manual-ensemble handler is a
    generator so progress streams (reference processing.py:706-795)."""
    import ast
    import textwrap

    src = _gui_source()
    tree = ast.parse(src)
    fns = {}

    class V(ast.NodeVisitor):
        def visit_FunctionDef(self, node):
            fns[node.name] = node
            self.generic_visit(node)

    V().visit(tree)
    auto = fns["run_auto_ensemble"]
    args = [a.arg for a in auto.args.args]
    for needed in ("use_apollo", "apollo_method", "use_match", "match_passes"):
        assert needed in args, f"run_auto_ensemble missing {needed}"
    manual = fns["run_manual_ensemble"]
    assert any(isinstance(n, (ast.Yield, ast.YieldFrom))
               for n in ast.walk(manual)), "run_manual_ensemble must stream"
    # the auto-ensemble settings persist under their auto_* keys
    assert "auto_use_apollo" in ast.unparse(auto)
    assert "auto_matchering_passes" in ast.unparse(auto)
    del textwrap
