"""Multi-model ensembling: waveform and spectral combination methods.

Functional parity with the reference's AudioEnsembleEngine
(reference ensemble.py:172-256,258-407): waveform methods avg (weighted) /
median / max / min, and spectral methods max_fft / min_fft / median_fft
(magnitude reduction with the first file's phase, scipy STFT nperseg
min(1024, samples), 50% overlap, falling back to avg_wave on failure).

Two surfaces: ``ensemble_waveforms`` combines in-memory stems in one shot
(vectorized numpy over the stacked (N, ch, T) array — host reductions;
shipping stems to the device costs more in relay transfers than the
reduction saves), and ``ensemble_files`` streams 32768-frame chunks
through aligned libsndfile readers with bounded memory for arbitrarily
long files, matching the reference's streaming engine (ensemble.py:319).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

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
    # host numpy, NOT device ops: these reductions are memory-bound with
    # trivial compute, and on the TPU relay link the (N, ch, T) upload +
    # result download (~60 MB for two 60 s stems) costs seconds while the
    # host mean costs milliseconds
    return _waveform_combine_np(stack, method, weights)


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


def _check_weights(weights, n_inputs: int) -> None:
    """reference ensemble.py:288-293: weight count must match input count
    (a mismatch would otherwise surface as a cryptic mid-stream tensordot
    shape error after the output file was already created)."""
    if weights is not None and len(weights) != n_inputs:
        raise ValueError(
            f"got {len(weights)} weights for {n_inputs} inputs; counts "
            "must match")


def ensemble_waveforms(waves: Sequence[np.ndarray], method: str = "avg_wave",
                       weights: Optional[Sequence[float]] = None) -> np.ndarray:
    """Combine N (ch, T) waveforms into one (ch, T_min)."""
    if method not in ENSEMBLE_METHODS:
        raise ValueError(f"Invalid method '{method}'. Available: {list(ENSEMBLE_METHODS)}")
    if not waves:
        raise ValueError("no input waveforms")
    _check_weights(weights, len(waves))
    stack = _stack_truncate(waves)
    w = np.asarray(weights, dtype=np.float32) if weights is not None else None

    if method.endswith("_fft"):
        out = _spectral_combine(stack, method)
        if out is not None:
            return out
        # reference falls back to avg_wave when the spectral path fails
        method = "avg_wave"
    return _waveform_combine(stack, method, w)


def ensemble_waveforms_device(waves, method: str = "avg_wave",
                              weights: Optional[Sequence[float]] = None):
    """Device-resident combiner for stems already in accelerator HBM.

    Same waveform-method semantics as :func:`ensemble_waveforms`
    (reference ensemble.py:172-256), but over jax device arrays and
    returning a device array — the chain surface for flows whose stems
    never touched the host (``DemixJob.collect_device``): two separations
    -> ensemble -> phase fix -> Apollo stays on device end to end, saving
    the (N, ch, T) download + result re-upload (~0.7 s per 60 s pair on
    the ~50 MB/s relay link). Spectral (``*_fft``) methods stay host-only:
    they are scipy-STFT reductions whose reference semantics (boundary
    padding, odd-length istft) are pinned to scipy — callers needing them
    fetch with :meth:`DemixJob.collect` and use :func:`ensemble_waveforms`.
    """
    import jax.numpy as jnp

    if method.endswith("_fft"):
        raise ValueError(
            f"device ensemble supports waveform methods only, got {method!r}; "
            "fetch the stems and use ensemble_waveforms for spectral methods")
    if method not in ENSEMBLE_METHODS:
        raise ValueError(f"Invalid method '{method}'. Available: {list(ENSEMBLE_METHODS)}")
    if not waves:
        raise ValueError("no input waveforms")
    _check_weights(weights, len(waves))
    tmin = min(w.shape[-1] for w in waves)
    stack = jnp.stack([w[..., :tmin].astype(jnp.float32) for w in waves])
    return combine_stack_device(stack, method, weights)


def combine_stack_device(stack, method: str, weights=None):
    """Traceable waveform combine over a stacked (N, ...) device array —
    the jnp core of :func:`ensemble_waveforms_device`, reusable inside
    larger fused programs (postprocess.phase_fixer.
    ensemble_phase_fix_device)."""
    import jax.numpy as jnp

    if method == "avg_wave":
        if weights is not None:
            w = jnp.asarray(weights, dtype=jnp.float32)
            w = w / w.sum()
            return jnp.tensordot(w, stack, axes=1)
        return stack.mean(axis=0)
    if method == "median_wave":
        return jnp.median(stack, axis=0)
    if method == "max_wave":
        return stack.max(axis=0)
    return stack.min(axis=0)


def _waveform_combine_np(stack: np.ndarray, method: str,
                         weights: Optional[np.ndarray]) -> np.ndarray:
    """Pure-numpy combiner for the streaming path (per-chunk host work —
    shipping 32768-frame buffers to the device would cost more in
    transfers than the reduction saves)."""
    if method == "avg_wave":
        if weights is not None:
            w = weights / weights.sum()
            return np.tensordot(w, stack, axes=1).astype(np.float32)
        return stack.mean(axis=0)
    if method == "median_wave":
        return np.median(stack, axis=0).astype(np.float32)
    if method == "max_wave":
        return stack.max(axis=0)
    if method == "min_wave":
        return stack.min(axis=0)
    raise ValueError(method)


def ensemble_files(files: List[str], method: str, output_path: str,
                   weights: Optional[Sequence[float]] = None,
                   progress_cb=None, buffer_frames: int = 32768) -> str:
    """File-level ensemble, streaming (the reference's ensemble.py surface).

    Bounded memory for arbitrarily long inputs: N aligned streaming
    readers feed ``buffer_frames``-sized chunks (reference ensemble.py:319
    streams 32768-frame buffers), truncated to the shortest file, written
    incrementally as PCM_24. Waveform methods are pointwise across files so
    chunking is exact; spectral methods reduce per chunk exactly like the
    reference's streaming engine.
    """
    from sesa_tpu.audio_io import AudioReader, AudioWriter

    if method not in ENSEMBLE_METHODS:
        raise ValueError(f"Invalid method '{method}'. Available: {list(ENSEMBLE_METHODS)}")
    if not files:
        raise ValueError("no input files")
    _check_weights(weights, len(files))
    w = np.asarray(weights, dtype=np.float32) if weights is not None else None

    readers = [AudioReader(f) for f in files]
    try:
        sr = readers[0].samplerate
        ch = readers[0].channels
        for f, r in zip(files[1:], readers[1:]):
            if r.samplerate != sr:
                raise ValueError(
                    f"sample-rate mismatch: {f} has {r.samplerate}, expected {sr}")
            if r.channels != ch:
                raise ValueError(
                    f"channel-count mismatch: {f} has {r.channels}, expected {ch}")
        total = min(r.frames for r in readers)  # shortest-file truncation

        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with AudioWriter(output_path, sr, ch, subtype="PCM_24") as writer:
            done = 0
            while done < total:
                n = min(buffer_frames, total - done)
                stack = np.stack([r.read(n) for r in readers])  # (N, ch, n)
                if method.endswith("_fft"):
                    out = _spectral_combine(stack, method)
                    if out is None:  # too-short tail: reference avg fallback
                        out = _waveform_combine_np(stack, "avg_wave", w)
                else:
                    out = _waveform_combine_np(stack, method, w)
                writer.write(out)
                done += n
                if progress_cb:
                    progress_cb(done / total)
            output_path = writer.path  # .flac may fall back to .wav
    finally:
        for r in readers:
            r.close()
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
