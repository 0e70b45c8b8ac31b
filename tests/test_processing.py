"""Orchestrator flows with a stubbed session (no network/model downloads)."""

import os

import numpy as np
import pytest

from sesa_tpu import processing

pytestmark = pytest.mark.smoke


class FakeSession:
    sample_rate = 44100

    def separate_with_extras(self, mix, use_tta=False, extract_instrumental=False,
                             demud_phaseremix_inst=False, progress_cb=None,
                             mix_device=None):
        if progress_cb:
            for frac in (0.25, 0.5, 0.75, 1.0):
                progress_cb(frac)
        out = {"vocals": mix * 0.5}
        if extract_instrumental:
            out["instrumental"] = mix * 0.5
        return out


@pytest.fixture
def fake_session(monkeypatch, tmp_path):
    monkeypatch.setattr(processing, "_make_session", lambda *a, **k: FakeSession())
    monkeypatch.setattr(processing.helpers, "OUTPUT_DIR", str(tmp_path / "out"))
    monkeypatch.setattr(processing.helpers, "AUTO_ENSEMBLE_OUTPUT",
                        str(tmp_path / "aeo"))
    monkeypatch.setattr(processing.helpers, "setup_directories", lambda: None)
    return tmp_path


def _write_song(tmp_path):
    from sesa_tpu.audio_io import write_audio

    sr = 44100
    x = (np.random.default_rng(0).standard_normal((2, sr)) * 0.2).astype(np.float32)
    path = str(tmp_path / "song.wav")
    write_audio(path, x, sr)
    return path


def test_process_audio_flow(fake_session):
    song = _write_song(fake_session)
    updates = list(processing.process_audio(song, "Some Model",
                                            extract_instrumental=True,
                                            output_dir=str(fake_session / "out")))
    final = updates[-1]
    assert final["progress"] == 100
    assert len(final["outputs"]) == 2
    assert final["slots"]["vocals"] and final["slots"]["instrumental"]
    for f in final["outputs"]:
        assert os.path.exists(f)


def test_process_audio_streams_live_progress(fake_session):
    """Intermediate percent updates surface DURING separation (VERDICT r1
    item 6: the generator previously jumped 5% -> 80% with no movement)."""
    song = _write_song(fake_session)
    updates = list(processing.process_audio(song, "Some Model",
                                            output_dir=str(fake_session / "out")))
    mid = [u["progress"] for u in updates if 5 < u["progress"] < 80]
    assert len(mid) >= 3, [u["progress"] for u in updates]
    assert mid == sorted(mid)


def test_process_audio_propagates_worker_errors(fake_session, monkeypatch):
    class BoomSession(FakeSession):
        def separate_with_extras(self, *a, **k):
            raise RuntimeError("boom")

    monkeypatch.setattr(processing, "_make_session", lambda *a, **k: BoomSession())
    song = _write_song(fake_session)
    with pytest.raises(RuntimeError, match="boom"):
        list(processing.process_audio(song, "Some Model",
                                      output_dir=str(fake_session / "out")))


def test_auto_ensemble_flow(fake_session):
    song = _write_song(fake_session)
    updates = list(processing.auto_ensemble_process(
        song, ["Model A", "Model B"], ensemble_type="avg_wave",
        output_dir=str(fake_session / "aeo")))
    final = updates[-1]
    assert final["progress"] == 100
    assert len(final["outputs"]) == 1  # one ensembled vocals stem
    assert os.path.exists(final["outputs"][0])


def test_stem_slot_mapping():
    files = ["/x/20260101_song_vocals_model.wav", "/x/20260101_song_other_model.wav"]
    assert processing.find_file_for_stem(files, "vocals") == files[0]
    assert processing.find_file_for_stem(files, "drum") is None
