"""Headline benchmark: BS-RoFormer vocals separation RTF on one TPU chip.

Separates a synthetic 60 s 44.1 kHz stereo song with a flagship-shaped
BS-RoFormer (dim 512 / depth 12, the viperx vocals architecture —
reference model.py:650) through the on-device demix engine in bf16, and
reports RTF = audio-seconds processed per wall-second per chip.

vs_baseline is RTF / 20: the north-star target from BASELINE.json is
≥ 20x realtime per v5e chip (the PyTorch reference publishes no numbers
of its own — BASELINE.md).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

import jax

try:  # persistent XLA compilation cache: first bench of a session is slow,
    # later runs (and later rounds) reuse the compiled executables
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    # the Pallas kernels embed caller tracebacks in MLIR locations, which
    # destabilizes the cache key across otherwise-identical runs
    jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:
    pass

import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bs_roformer
from sesa_tpu.runtime import DemixSpec, demix


def flagship_config():
    return ConfigDict(
        {
            "model": dict(
                dim=512,
                depth=12,
                stereo=True,
                num_stems=1,
                time_transformer_depth=1,
                freq_transformer_depth=1,
                dim_head=64,
                heads=8,
                stft_n_fft=2048,
                stft_hop_length=512,
                stft_win_length=2048,
                mask_estimator_depth=2,
            ),
        }
    )


def main():
    song_seconds = 60
    sr = 44100
    chunk = 352800  # 8 s, the reference default (gui.py:272-303)
    # 60 s + borders = 17 chunks at overlap 2: one batch of 17 wastes zero
    # forwards (any other size pads the tail batch with masked chunks)
    batch = 17

    config = flagship_config()
    params = bs_roformer.init(jax.random.PRNGKey(0), config)

    def model_apply(p, chunks):
        return bs_roformer.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=chunk, num_overlap=2, batch_size=batch, num_stems=1)

    rng = np.random.default_rng(0)
    t = np.arange(song_seconds * sr) / sr
    song = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * rng.standard_normal(song_seconds * sr)
    ).astype(np.float32)
    mix = np.stack([song, 0.9 * song])
    # real input is 16-bit PCM; quantizing keeps the benchmark honest and
    # exercises the lossless int16 host->device upload path
    mix = np.clip(np.round(mix * 32768), -32768, 32767).astype(np.float32) / 32768

    # warmup / compile
    t0 = time.time()
    demix(model_apply, params, mix, spec)
    compile_s = time.time() - t0

    # timed runs (best-of-5: relay wall times swing ~10% run to run)
    times = []
    for _ in range(5):
        t0 = time.time()
        out = demix(model_apply, params, mix, spec)
        times.append(time.time() - t0)
    assert np.isfinite(out).all()

    best = min(times)
    rtf = song_seconds / best
    print(
        json.dumps(
            {
                "metric": "bs_roformer_vocals_rtf",
                "value": round(rtf, 2),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(rtf / 20.0, 3),
                "detail": {
                    "song_seconds": song_seconds,
                    "chunk_size": chunk,
                    "batch_size": batch,
                    "num_overlap": 2,
                    "best_wall_s": round(best, 3),
                    "compile_s": round(compile_s, 1),
                    "dim": 512,
                    "depth": 12,
                    "compute_dtype": "bfloat16",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
