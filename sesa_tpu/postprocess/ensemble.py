"""Multi-model ensembling: waveform and spectral combination methods.

Functional parity with the reference's AudioEnsembleEngine
(reference ensemble.py:172-256,258-407): waveform methods avg (weighted) /
median / max / min, and spectral methods max_fft / min_fft / median_fft
(magnitude reduction with the first file's phase, scipy STFT nperseg
min(1024, samples), 50% overlap, falling back to avg_wave on failure).

Where the reference streams 32768-frame chunks through libsndfile readers
(a host-memory workaround), songs here are combined in one shot: waveform
reductions run as single jnp ops over the stacked (N, ch, T) stems and fit
easily in memory; the spectral path keeps the reference's exact
scipy.signal semantics so outputs match bit-for-bit.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

ENSEMBLE_METHODS = (
    "avg_wave", "median_wave", "max_wave", "min_wave",
    "max_fft", "min_fft", "median_fft",
)


def _stack_truncate(waves: Sequence[np.ndarray]) -> np.ndarray:
    """Stack (ch, T_i) waveforms, truncating to the shortest (reference
    behavior: shortest-file truncation, ensemble.py:319)."""
    tmin = min(w.shape[-1] for w in waves)
    return np.stack([np.asarray(w, dtype=np.float32)[..., :tmin] for w in waves])


def _waveform_combine(stack: np.ndarray, method: str,
                      weights: Optional[np.ndarray]) -> np.ndarray:
    x = jnp.asarray(stack)
    if method == "avg_wave":
        if weights is not None:
            w = jnp.asarray(weights, dtype=jnp.float32)
            w = w / w.sum()
            return np.asarray(jnp.tensordot(w, x, axes=1))
        return np.asarray(jnp.mean(x, axis=0))
    if method == "median_wave":
        return np.asarray(jnp.median(x, axis=0))
    if method == "max_wave":
        return np.asarray(jnp.max(x, axis=0))
    if method == "min_wave":
        return np.asarray(jnp.min(x, axis=0))
    raise ValueError(method)


def _spectral_combine(stack: np.ndarray, method: str) -> Optional[np.ndarray]:
    """scipy-STFT magnitude reduction, phase of the first file
    (reference ensemble.py:185-256)."""
    from scipy.signal import istft, stft

    n, ch, t = stack.shape
    if t < 256:
        return None
    nperseg = min(1024, t)
    noverlap = nperseg // 2

    specs = np.stack(
        [np.stack([stft(stack[i, c], nperseg=nperseg, noverlap=noverlap,
                        window="hann")[2] for c in range(ch)])
         for i in range(n)]
    )  # (N, ch, F, Tf)

    mag = np.abs(specs)
    if method == "max_fft":
        combined = np.max(mag, axis=0)
    elif method == "min_fft":
        combined = np.min(mag, axis=0)
    elif method == "median_fft":
        combined = np.median(mag, axis=0)
    else:
        raise ValueError(method)

    combined_spec = combined * np.exp(1j * np.angle(specs[0]))
    out = np.zeros((ch, t), dtype=np.float32)
    for c in range(ch):
        _, xrec = istft(combined_spec[c], nperseg=nperseg, noverlap=noverlap,
                        window="hann")
        if xrec.shape[0] < t:
            xrec = np.pad(xrec, (0, t - xrec.shape[0]))
        out[c] = xrec[:t]
    return out


def ensemble_waveforms(waves: Sequence[np.ndarray], method: str = "avg_wave",
                       weights: Optional[Sequence[float]] = None) -> np.ndarray:
    """Combine N (ch, T) waveforms into one (ch, T_min)."""
    if method not in ENSEMBLE_METHODS:
        raise ValueError(f"Invalid method '{method}'. Available: {list(ENSEMBLE_METHODS)}")
    if not waves:
        raise ValueError("no input waveforms")
    stack = _stack_truncate(waves)
    w = np.asarray(weights, dtype=np.float32) if weights is not None else None

    if method.endswith("_fft"):
        out = _spectral_combine(stack, method)
        if out is not None:
            return out
        # reference falls back to avg_wave when the spectral path fails
        method = "avg_wave"
    return _waveform_combine(stack, method, w)


def ensemble_files(files: List[str], method: str, output_path: str,
                   weights: Optional[Sequence[float]] = None,
                   progress_cb=None) -> str:
    """File-level ensemble (the reference's ensemble.py CLI surface)."""
    from sesa_tpu.audio_io import read_audio, write_audio

    waves = []
    sr = None
    for i, f in enumerate(files):
        data, this_sr = read_audio(f)
        if sr is not None and this_sr != sr:
            raise ValueError(f"sample-rate mismatch: {f} has {this_sr}, expected {sr}")
        sr = this_sr
        waves.append(data)
        if progress_cb:
            progress_cb((i + 1) / (len(files) + 1))

    out = ensemble_waveforms(waves, method, weights)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_audio(output_path, out, sr, subtype="PCM_24")
    if progress_cb:
        progress_cb(1.0)
    return output_path


def main(argv=None):
    """CLI mirroring reference ensemble.py:409-438."""
    import argparse

    p = argparse.ArgumentParser(description="Audio ensemble")
    p.add_argument("--files", nargs="+", required=True)
    p.add_argument("--type", dest="method", default="avg_wave",
                   choices=list(ENSEMBLE_METHODS))
    p.add_argument("--weights", nargs="+", type=float, default=None)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    def progress(frac):
        print(f"[SESA_PROGRESS]{int(frac * 100)}", flush=True)

    out = ensemble_files(args.files, args.method, args.output,
                         weights=args.weights, progress_cb=progress)
    print(f"Ensemble written: {out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
