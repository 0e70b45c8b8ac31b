"""Data pipeline tests: datasets, augmentation, batching.

Reference semantics: models/bandit/core/data/base.py:14-80 (track-dir
loading + mixture recompute), musdb/dataset.py:14-259 (splits, SAD,
on-the-fly aug), dnr/dataset.py:15-368 (name maps, chunking, reverb),
augmentation.py:17-109 (StemAugmentor).
"""

import os

import numpy as np
import pytest

from sesa_tpu.audio_io import write_audio
from sesa_tpu.data import (DnRDataset, DnRDeterministicChunkDataset,
                           DnRRandomChunkDataset,
                           DnRRandomChunkDatasetWithSpeechReverb,
                           MUSDB18FullTrackDataset, MUSDB18SadDataset,
                           MUSDB18SadOnTheFlyAugmentedDataset, StemAugmentor,
                           batch_iterator, build_augmentation)

SR = 8000


def _write_track(root, name, stems, t=SR, seed=0):
    rng = np.random.default_rng(abs(hash((name, seed))) % 2**32)
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    audio = {s: (0.1 * rng.standard_normal((2, t))).astype(np.float32)
             for s in stems if s not in ("mixture", "mix")}
    mix = sum(audio.values())
    mix_name = "mix" if "mix" in stems else "mixture"
    write_audio(os.path.join(path, f"{mix_name}.wav"), mix, SR)
    for s, x in audio.items():
        write_audio(os.path.join(path, f"{s}.wav"), x, SR)
    return audio, mix


@pytest.fixture()
def musdb_root(tmp_path):
    root = str(tmp_path / "musdb")
    train_tracks = ["Actions - One Minute Smile", "Leaf - Summerghost",
                    "TrackA", "TrackB"]
    for tr in train_tracks:
        _write_track(os.path.join(root, "train"), tr,
                     ["mixture", "vocals", "bass", "drums", "other"])
    for tr in ["TestTrack"]:
        _write_track(os.path.join(root, "test"), tr,
                     ["mixture", "vocals", "bass", "drums", "other"])
    return root


@pytest.fixture()
def dnr_root(tmp_path):
    root = str(tmp_path / "dnr")
    for split in ["tr", "cv", "tt"]:
        for tr in ["001", "002"]:
            _write_track(os.path.join(root, split), tr,
                         ["mix", "speech", "music", "sfx"], t=2 * SR)
    return root


@pytest.mark.smoke
def test_musdb_full_track_splits(musdb_root):
    train = MUSDB18FullTrackDataset(musdb_root, "train", fs=SR, strict=False)
    val = MUSDB18FullTrackDataset(musdb_root, "val", fs=SR, strict=False)
    test = MUSDB18FullTrackDataset(musdb_root, "test", fs=SR, strict=False)
    # the two canonical validation names land in val, the rest in train
    assert len(val) == 2 and len(train) == 2 and len(test) == 1
    item = train[0]
    assert set(item["audio"]) == {"mixture", "vocals", "bass", "drums", "other"}
    assert item["audio"]["vocals"].shape == (2, SR)
    assert item["track"].startswith("train/")
    # mixture is consistent with the sum of stems (written that way)
    s = sum(item["audio"][k] for k in item["audio"] if k != "mixture")
    np.testing.assert_allclose(item["audio"]["mixture"], s, atol=1e-3)


def test_musdb_strict_counts(musdb_root):
    with pytest.raises(ValueError):
        MUSDB18FullTrackDataset(musdb_root, "train", fs=SR, strict=True)


def test_musdb_sad_virtual_length(tmp_path):
    root = str(tmp_path / "sad")
    for seg in ["seg1", "seg2"]:
        _write_track(os.path.join(root, "vocals", "train"), seg,
                     ["mixture", "vocals", "bass", "drums", "other"])
    ds = MUSDB18SadDataset(root, "train", "vocals", target_length=5, fs=SR)
    assert len(ds) == 5
    assert ds[4]["track"] == ds[0]["track"]  # 4 % 2 == 0


def test_musdb_sad_on_the_fly_aug(tmp_path):
    root = str(tmp_path / "sad")
    for seg in ["seg1", "seg2", "seg3"]:
        _write_track(os.path.join(root, "vocals", "train"), seg,
                     ["mixture", "vocals", "bass", "drums", "other"])
    ds = MUSDB18SadOnTheFlyAugmentedDataset(
        root, "train", "vocals", target_length=6, chunk_size_second=0.25,
        fs=SR, seed=0)
    item = ds[0]
    audio = item["audio"]
    # mixture recomputed from (augmented) stems
    s = sum(audio[k] for k in audio if k != "mixture")
    np.testing.assert_allclose(audio["mixture"], s, atol=1e-6)
    assert max(float(np.abs(v).max()) for v in audio.values()) <= 1.0 + 1e-6


@pytest.mark.smoke
def test_dnr_stem_name_map_and_mne(dnr_root):
    ds = DnRDataset(dnr_root, "train", fs=SR, npy_memmap=False, strict=False)
    item = ds[0]
    assert set(item["audio"]) == {"mixture", "speech", "music", "effects", "mne"}
    np.testing.assert_allclose(
        item["audio"]["mne"],
        item["audio"]["music"] + item["audio"]["effects"], atol=1e-6)


def test_dnr_random_chunks(dnr_root):
    ds = DnRRandomChunkDataset(dnr_root, "val", target_length=7,
                               chunk_size_second=0.5, fs=SR,
                               npy_memmap=False, strict=False, seed=1)
    # tiny fixture tracks are shorter than DnR's nominal 60 s — chunk
    # starts must stay in range for the fixture length
    ds.FULL_TRACK_LENGTH_SECOND = 2
    assert len(ds) == 7
    item = ds[3]
    assert item["audio"]["speech"].shape == (2, SR // 2)


def test_dnr_deterministic_chunks(dnr_root):
    ds = DnRDeterministicChunkDataset(dnr_root, "test", chunk_size_second=0.5,
                                      hop_size_second=0.25, fs=SR,
                                      npy_memmap=False, strict=False)
    # n_chunks_per_track uses the class nominal length; recompute for the
    # 2 s fixtures
    ds.n_chunks_per_track = int((2 - 0.5) / 0.25)
    assert len(ds) == 2 * 6
    a = ds[0]["audio"]["music"]
    b = ds[2]["audio"]["music"]  # same track (index 2 -> chunk 1, track 0)
    assert a.shape == b.shape == (2, SR // 2)
    assert not np.allclose(a, b)


def test_dnr_speech_reverb(dnr_root):
    ds = DnRRandomChunkDatasetWithSpeechReverb(
        dnr_root, "train", target_length=3, chunk_size_second=0.5, fs=SR,
        npy_memmap=False, strict=False, seed=2)
    ds.FULL_TRACK_LENGTH_SECOND = 2
    item = ds[0]
    audio = item["audio"]
    # mixture recomputed with the wet speech
    s = audio["speech"] + audio["music"] + audio["effects"] + audio["mne"]
    np.testing.assert_allclose(audio["mixture"], s, atol=1e-5)
    assert np.isfinite(audio["speech"]).all()


def test_npy_memmap_loading(tmp_path):
    root = str(tmp_path / "npy")
    path = os.path.join(root, "tr", "001")
    os.makedirs(path)
    rng = np.random.default_rng(0)
    for stem in ["mix", "speech", "music", "sfx"]:
        np.save(os.path.join(path, f"{stem}.npy"),
                rng.standard_normal((2, SR)).astype(np.float32))
    ds = DnRDataset(root, "train", fs=SR, npy_memmap=True, strict=False)
    item = ds[0]
    assert item["audio"]["speech"].shape == (2, SR)


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------

def _batch(seed=0, b=3, c=2, t=256):
    rng = np.random.default_rng(seed)
    stems = {s: (0.2 * rng.standard_normal((b, c, t))).astype(np.float32)
             for s in ["vocals", "other"]}
    stems["mixture"] = stems["vocals"] + stems["other"]
    return {"audio": stems, "track": ["x"] * b}


@pytest.mark.smoke
def test_stem_augmentor_mixture_recompute():
    aug = StemAugmentor({
        "[common]": {"name": "Gain",
                     "kwargs": {"min_gain_in_db": -6, "max_gain_in_db": 6,
                                "p": 1.0}},
        "vocals": {"name": "PolarityInversion", "kwargs": {"p": 1.0}},
    }, seed=0)
    item = _batch()
    out = aug(item)
    s = out["audio"]["vocals"] + out["audio"]["other"]
    np.testing.assert_allclose(out["audio"]["mixture"], s, atol=1e-6)
    # vocals polarity-inverted after gain: sign pattern flipped vs scaled orig
    corr = np.sum(out["audio"]["vocals"] * item["audio"]["vocals"])
    assert corr < 0


def test_stem_augmentor_clipping_fix():
    aug = StemAugmentor({"[default]": {
        "name": "Gain", "kwargs": {"min_gain_in_db": 40, "max_gain_in_db": 40,
                                   "p": 1.0}}}, seed=1)
    out = aug(_batch())
    assert max(float(np.abs(v).max()) for v in out["audio"].values()) <= 1.0


def test_stem_augmentor_default_vs_common_precedence():
    # with [common] present and apply_both False, [default] must NOT run
    aug = StemAugmentor({
        "[common]": {"name": "Identity", "kwargs": {}},
        "[default]": {"name": "Gain",
                      "kwargs": {"min_gain_in_db": 40, "max_gain_in_db": 40,
                                 "p": 1.0}},
    }, fix_clipping=False, seed=0)
    item = _batch()
    out = aug(item)
    np.testing.assert_allclose(out["audio"]["vocals"], item["audio"]["vocals"])


def test_compose_and_shift():
    tf = build_augmentation({"name": "Compose", "kwargs": {
        "transforms": [
            {"name": "Shift", "kwargs": {"min_shift": 0.25, "max_shift": 0.25,
                                         "p": 1.0}},
            {"name": "PeakNormalization", "kwargs": {"p": 1.0}},
        ], "kwargs": {}}})
    rng = np.random.default_rng(0)
    x = np.zeros((1, 2, 8), np.float32)
    x[0, :, 0] = 4.0
    y = tf(x, rng)
    assert y[0, 0, 2] == 1.0 and y[0, 0, 0] == 0.0  # rolled by 2, normalized


def test_unknown_augmentation_raises():
    with pytest.raises(NameError):
        build_augmentation({"name": "NotAThing", "kwargs": {}})


# ---------------------------------------------------------------------------
# Batching
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_batch_iterator_shapes(musdb_root):
    ds = MUSDB18FullTrackDataset(musdb_root, "train", fs=SR, strict=False)
    batches = list(batch_iterator(ds, 2, seed=0, epochs=1))
    assert len(batches) == 1
    audio = batches[0]["audio"]
    assert audio["mixture"].shape == (2, 2, SR)
    assert len(batches[0]["track"]) == 2


def test_batch_iterator_epochs_and_drop_last(musdb_root):
    ds = MUSDB18FullTrackDataset(musdb_root, "val", fs=SR, strict=False)
    full = list(batch_iterator(ds, 2, epochs=2, seed=0))
    assert len(full) == 2  # 2 tracks / batch 2 per epoch
    undropped = list(batch_iterator(ds, 3, epochs=1, drop_last=False, seed=0))
    assert undropped[0]["audio"]["mixture"].shape[0] == 2
