"""ctypes bindings for the native host-I/O library (built on first use).

``load()`` compiles sesa_tpu/native/wavio.cpp with g++ into a cached
shared object and returns the handle, or None when no toolchain is
available (audio_io falls back to scipy/wave then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wavio.cpp")
_LIB = os.path.join(_HERE, "libsesawav.so")

_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # a prebuilt .so without the source must remain usable: only
        # consult the source mtime when the source actually exists
        need_build = not os.path.exists(_LIB)
        if not need_build and os.path.exists(_SRC):
            need_build = os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        if need_build:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.sesa_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.sesa_wav_info.restype = ctypes.c_int
        lib.sesa_wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.sesa_wav_read.restype = ctypes.c_int
        lib.sesa_wav_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.sesa_wav_write.restype = ctypes.c_int
        lib.sesa_wav_read_at.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64]
        lib.sesa_wav_read_at.restype = ctypes.c_int64
        lib.sesa_wav_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.sesa_wav_writer_open.restype = ctypes.c_void_p
        lib.sesa_wav_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.sesa_wav_writer_write.restype = ctypes.c_int
        lib.sesa_wav_writer_close.argtypes = [ctypes.c_void_p]
        lib.sesa_wav_writer_close.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def wav_read(path: str):
    """Read a wav into ((channels, frames) float32, sample_rate) or None."""
    lib = load()
    if lib is None:
        return None
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    if lib.sesa_wav_info(path.encode(), ctypes.byref(ch), ctypes.byref(sr),
                         ctypes.byref(frames)) != 0:
        return None
    out = np.empty((ch.value, frames.value), dtype=np.float32)
    rc = lib.sesa_wav_read(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           frames.value)
    if rc <= 0:
        return None
    return out, sr.value


_SUBTYPES = {"FLOAT": 0, "PCM_16": 1, "PCM_24": 2}


def wav_write(path: str, audio: np.ndarray, sr: int, subtype: str = "FLOAT") -> bool:
    lib = load()
    if lib is None or subtype not in _SUBTYPES:
        return False
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    rc = lib.sesa_wav_write(path.encode(),
                            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            audio.shape[0], audio.shape[1], sr,
                            _SUBTYPES[subtype])
    return rc == 0


def wav_read_at(path: str, start: int, nframes: int, channels: int):
    """Windowed streaming read -> (channels, m) float32 or None."""
    lib = load()
    if lib is None:
        return None
    out = np.empty((channels, nframes), dtype=np.float32)
    got = lib.sesa_wav_read_at(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        start, nframes)
    if got < 0:
        return None
    if got == nframes:
        return out
    # short read at EOF: the C side packed channel-major with stride `got`
    flat = out.reshape(-1)[: channels * got]
    return flat.reshape(channels, got).copy()


class WavWriter:
    """Incremental native WAV writer (bounded-memory streaming output)."""

    def __init__(self, path: str, sr: int, channels: int, subtype: str = "PCM_24"):
        lib = load()
        if lib is None or subtype not in _SUBTYPES:
            raise OSError("native wav writer unavailable")
        self._lib = lib
        self._channels = channels
        self._h = lib.sesa_wav_writer_open(path.encode(), channels, sr,
                                           _SUBTYPES[subtype])
        if not self._h:
            raise OSError(f"cannot open {path} for writing")

    def write(self, audio: np.ndarray) -> None:
        """audio: (channels, frames) float32."""
        audio = np.ascontiguousarray(audio, dtype=np.float32)
        # the C interleave loop reads channels*frames floats: a shape
        # mismatch would be an out-of-bounds read, so validate here
        if audio.ndim != 2 or audio.shape[0] != self._channels:
            raise ValueError(
                f"expected ({self._channels}, frames) audio, got "
                f"{audio.shape}")
        rc = self._lib.sesa_wav_writer_write(
            self._h, audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            audio.shape[1])
        if rc != 0:
            raise OSError(f"wav write failed (rc={rc})")

    def close(self) -> None:
        if self._h:
            self._lib.sesa_wav_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
