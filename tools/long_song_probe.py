"""Long-song scaling check: flagship separation of a 5-minute song.

Validates the production path at scale — the power-of-two buffer bucket
above the 60 s bench bucket, 9 pipelined segments with int16 slab
transport, and the final-slab crop on a song length that does not divide
the slab size. Records RTF alongside the 60 s bench numbers (BASELINE.md
round-1 measured 23.6x ad hoc; this reruns it on the current engine).

Run: python tools/long_song_probe.py  (real chip; one extra remote
compile for the bigger bucket on first use).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
from ml_collections import ConfigDict

SR = 44100
SECONDS = 300


def main():
    if jax.devices()[0].platform == "cpu":
        print("needs the real TPU chip", file=sys.stderr)
        return 2

    from sesa_tpu.runtime import demix

    import bench

    # the bench's exact flagship model/shape (single source of truth)
    apply_fn, params, spec = bench._flagship_setup()
    mix = bench.make_song(seconds=SECONDS)

    t0 = time.time()
    out = demix(apply_fn, params, mix, spec, seg_batches=1, transport="int16")
    compile_s = time.time() - t0
    walls = []
    for _ in range(3):
        t0 = time.time()
        out = demix(apply_fn, params, mix, spec, seg_batches=1,
                    transport="int16")
        walls.append(time.time() - t0)
    assert np.isfinite(out).all() and out.shape == (1, 2, SECONDS * SR)
    best = min(walls)
    print(json.dumps({
        "metric": "bs_roformer_vocals_300s_rtf",
        "value": round(SECONDS / best, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "detail": {"song_seconds": SECONDS, "best_wall_s": round(best, 3),
                   "compile_s": round(compile_s, 1),
                   "walls": [round(w, 2) for w in walls]},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
