"""Pre-compile demix executables into the persistent XLA cache.

First-run separation latency is dominated by XLA compilation (minutes for
a flagship model). This tool compiles the exact executables a real
separation would use — one per (model, chunk/batch/overlap, song-length
bucket) — so later CLI/GUI runs start hot.

    python -m sesa_tpu.warmup --model_type bs_roformer --config_path cfg.yaml \
        [--song_seconds 60 300] [--chunk_size N] [--batch_size N] [--overlap N]

No checkpoint is needed: compilation depends only on shapes, so the
session is built with random-init weights. Repeat per model you plan to
serve. The demix engine buckets buffer lengths (runtime/demix.py), so one
song length warms every song in its bucket.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from sesa_tpu.cache import cache_dir, enable_persistent_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pre-populate the XLA compile cache")
    p.add_argument("--model_type", type=str, required=True)
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--song_seconds", nargs="+", type=int, default=[60, 300],
                   help="representative song lengths to compile buckets for")
    p.add_argument("--chunk_size", type=int, default=0)
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--use_tta", action="store_true",
                   help="also compile the TTA (channel-swap/polarity) pass")
    p.add_argument("--compute_dtype", type=str, choices=["bf16", "f32"],
                   default="bf16")
    p.add_argument("--phase_fix_models", type=int, default=0, metavar="N",
                   help="also compile the fused ensemble+phase-fix chain "
                        "program for an N-model stack at each song length "
                        "(the auto-ensemble device chain: combine -> STFT "
                        "-> blend -> iSTFT as one executable)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not enable_persistent_cache():
        print("[warmup] WARNING: persistent compilation cache could not be "
              "enabled — executables will only be cached in-process",
              file=sys.stderr, flush=True)

    import jax.numpy as jnp

    from sesa_tpu.runtime.session import InferenceSession

    session = InferenceSession.create(
        args.model_type, args.config_path,
        chunk_size=args.chunk_size or None,
        num_overlap=args.overlap or None,
        batch_size=args.batch_size or None,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bf16" else None,
    )
    sr = session.sample_rate  # bucket lengths must match real-run lengths
    rng = np.random.default_rng(0)
    for seconds in args.song_seconds:
        # low-amplitude noise, NOT zeros: a zero mix has std 0, so
        # normalize-enabled configs would divide by zero on device, the
        # NaN output would falsely trigger the bf16->f32 rescue, and the
        # rest of the warmup would compile the WRONG (f32) executables
        mix = (0.01 * rng.standard_normal(
            (session.spec.num_channels, seconds * sr))).astype(np.float32)
        t0 = time.time()
        session.separate(mix, use_tta=args.use_tta)
        print(f"[warmup] {args.model_type} {seconds}s: "
              f"{time.time() - t0:.1f}s -> {cache_dir()}", flush=True)
        if args.phase_fix_models > 0:
            from sesa_tpu.postprocess.phase_fixer import (
                ensemble_phase_fix_device,
            )

            src = jnp.asarray(mix)
            waves = [src] * args.phase_fix_models
            t0 = time.time()
            ensemble_phase_fix_device(src, waves, sr).block_until_ready()
            print(f"[warmup] ensemble+phase-fix x{args.phase_fix_models} "
                  f"{seconds}s: {time.time() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
