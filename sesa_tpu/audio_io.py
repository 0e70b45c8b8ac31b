"""Host-side audio I/O without hard external dependencies.

The reference reads with librosa/soundfile and writes FLAC/PCM_24 via
libsndfile (reference inference.py:86,134-144, utils.py:164-196). Neither
is guaranteed here, so WAV read/write is implemented on scipy + the stdlib
``wave`` module (including 24-bit PCM), with soundfile used transparently
when available (adds FLAC support).
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np

try:
    import soundfile as _sf
except ImportError:
    _sf = None


def read_audio(path: str, target_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read an audio file → ((channels, T) float32, sample_rate).

    Mono files come back as (1, T), matching the reference's
    read_audio_transposed (utils.py:164-196). When ``target_sr`` differs
    from the file rate, the audio is resampled with polyphase filtering.
    """
    native = None
    if path.lower().endswith(".wav"):
        from sesa_tpu import native as _native

        native = _native.wav_read(path)
    if native is not None:
        data, sr = native
    elif _sf is not None:
        data, sr = _sf.read(path, always_2d=True)
        data = data.T.astype(np.float32)
    else:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.ndim == 1:
            data = data[:, None]
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        data = data.T

    if target_sr is not None and target_sr != sr:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(target_sr, sr)
        data = resample_poly(data, target_sr // g, sr // g, axis=-1).astype(np.float32)
        sr = target_sr
    return np.ascontiguousarray(data), sr


def write_audio(path: str, audio: np.ndarray, sr: int, subtype: str = "FLOAT") -> str:
    """Write (channels, T) float32 audio. subtype: FLOAT | PCM_16 | PCM_24.

    Returns the path actually written: ``.flac`` requires soundfile;
    without it a ``.wav`` of the requested PCM depth is written instead
    (path extension is adjusted — callers must use the returned path).
    FLAC cannot carry FLOAT samples, so that combination is coerced to
    PCM_24 (lossless at 24-bit, the reference's flac default).
    """
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    data = audio.T  # (T, channels)

    ext = os.path.splitext(path)[1].lower()
    if ext == ".flac" and subtype == "FLOAT":
        subtype = "PCM_24"
    if ext == ".wav":
        from sesa_tpu import native as _native

        if _native.wav_write(path, audio, sr, subtype=subtype):
            return path
    if _sf is not None:
        _sf.write(path, data, sr, subtype=subtype)
        return path
    if ext == ".flac":
        path = os.path.splitext(path)[0] + ".wav"

    if subtype == "FLOAT":
        from scipy.io import wavfile

        wavfile.write(path, sr, data)
        return path

    clipped = np.clip(data, -1.0, 1.0)
    with wave.open(path, "wb") as w:
        w.setnchannels(data.shape[1])
        w.setframerate(sr)
        if subtype == "PCM_16":
            w.setsampwidth(2)
            w.writeframes((clipped * 32767.0).astype("<i2").tobytes())
        elif subtype == "PCM_24":
            w.setsampwidth(3)
            as_int = (clipped * 8388607.0).astype("<i4")
            b = np.frombuffer(as_int.tobytes(), dtype=np.uint8).reshape(-1, 4)
            w.writeframes(b[:, :3].tobytes())
        else:
            raise ValueError(f"unknown subtype {subtype}")
    return path


class AudioReader:
    """Streaming frame reader: ``read(n) -> (channels, m) float32``.

    Backends in preference order: soundfile (any format), the native WAV
    codec (sesa_tpu/native/wavio.cpp windowed reads), then a whole-file
    fallback served in slices (correct but not bounded-memory). Drives the
    long-file paths (streaming ensemble; reference ensemble.py:319).
    """

    def __init__(self, path: str):
        self._path = path
        self._pos = 0
        self._sf = None
        self._native = False
        if _sf is not None:
            self._sf = _sf.SoundFile(path)
            self.samplerate = self._sf.samplerate
            self.channels = self._sf.channels
            self.frames = len(self._sf)
            return
        if path.lower().endswith(".wav"):
            from sesa_tpu import native as _native_mod

            lib = _native_mod.load()
            if lib is not None:
                import ctypes

                ch = ctypes.c_int32()
                sr = ctypes.c_int32()
                fr = ctypes.c_int64()
                if lib.sesa_wav_info(path.encode(), ctypes.byref(ch),
                                     ctypes.byref(sr), ctypes.byref(fr)) == 0:
                    # the header can parse for formats the decoder does not
                    # support (8-bit, ALAW/ADPCM): probe one frame before
                    # claiming the native backend
                    if fr.value > 0 and _native_mod.wav_read_at(
                            path, 0, 1, ch.value) is not None:
                        self._native = True
                        self.channels = ch.value
                        self.samplerate = sr.value
                        self.frames = fr.value
                        return
        data, sr = read_audio(path)
        self._data = data
        self.samplerate = sr
        self.channels = data.shape[0]
        self.frames = data.shape[1]

    def read(self, n: int) -> np.ndarray:
        n = min(n, self.frames - self._pos)
        if n <= 0:
            return np.zeros((self.channels, 0), dtype=np.float32)
        if self._sf is not None:
            out = self._sf.read(n, dtype="float32", always_2d=True).T
        elif self._native:
            from sesa_tpu import native as _native_mod

            out = _native_mod.wav_read_at(self._path, self._pos, n, self.channels)
            if out is None:
                # mid-stream native failure (e.g. truncated file): degrade
                # to the whole-file fallback rather than crash the stream
                self._native = False
                self._data, _ = read_audio(self._path)
                self.frames = min(self.frames, self._data.shape[1])
                n = max(0, min(n, self.frames - self._pos))
                out = self._data[:, self._pos : self._pos + n]
        else:
            out = self._data[:, self._pos : self._pos + n]
        self._pos += out.shape[1]
        return np.ascontiguousarray(out)

    def close(self) -> None:
        if self._sf is not None:
            self._sf.close()
            self._sf = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AudioWriter:
    """Streaming frame writer: ``write((channels, n) float32)`` appends.

    soundfile when available (FLAC etc.); otherwise the native incremental
    WAV writer (.flac paths are rewritten to .wav, as in write_audio).
    """

    def __init__(self, path: str, sr: int, channels: int, subtype: str = "PCM_24"):
        self.path = path
        self._sf = None
        self._native = None
        if _sf is not None:
            self._sf = _sf.SoundFile(path, "w", samplerate=sr,
                                     channels=channels, subtype=subtype)
            return
        if path.lower().endswith(".flac"):
            self.path = path = os.path.splitext(path)[0] + ".wav"
        from sesa_tpu import native as _native_mod

        try:
            self._native = _native_mod.WavWriter(path, sr, channels,
                                                 subtype=subtype)
        except OSError:
            # no soundfile AND no toolchain: stdlib streaming PCM writer
            # (FLOAT coerces to PCM_24 — the wave module is PCM-only)
            self._native = _StdlibWavWriter(
                path, sr, channels,
                "PCM_24" if subtype == "FLOAT" else subtype)

    def write(self, audio: np.ndarray) -> None:
        if self._sf is not None:
            self._sf.write(np.ascontiguousarray(np.asarray(audio, np.float32).T))
        else:
            self._native.write(audio)

    def close(self) -> None:
        if self._sf is not None:
            self._sf.close()
            self._sf = None
        elif self._native is not None:
            self._native.close()
            self._native = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _StdlibWavWriter:
    """Streaming PCM WAV writer on the stdlib wave module (last-resort
    backend for AudioWriter when both soundfile and the native codec are
    unavailable; same encodings as write_audio's fallback)."""

    def __init__(self, path: str, sr: int, channels: int, subtype: str):
        if subtype not in ("PCM_16", "PCM_24"):
            raise ValueError(f"unsupported stdlib wav subtype {subtype}")
        self._subtype = subtype
        self._channels = channels
        self._w = wave.open(path, "wb")
        self._w.setnchannels(channels)
        self._w.setframerate(sr)
        self._w.setsampwidth(2 if subtype == "PCM_16" else 3)

    def write(self, audio: np.ndarray) -> None:
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim != 2 or audio.shape[0] != self._channels:
            raise ValueError(
                f"expected ({self._channels}, frames) audio, got {audio.shape}")
        data = np.clip(audio.T, -1.0, 1.0)
        if self._subtype == "PCM_16":
            self._w.writeframes((data * 32767.0).astype("<i2").tobytes())
        else:
            as_int = (data * 8388607.0).astype("<i4")
            b = np.frombuffer(as_int.tobytes(), dtype=np.uint8).reshape(-1, 4)
            self._w.writeframes(b[:, :3].tobytes())

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
