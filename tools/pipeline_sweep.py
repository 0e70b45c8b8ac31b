"""On-chip sweep of demix slab-pipeline granularity for the flagship.

Smaller batches split the song into more segments, so more of the slab
fetches overlap compute — but pad the tail batch with masked chunks
(wasted forwards) and dispatch more executions. This sweeps the tradeoff
on the real TPU and records walls; run as

    python tools/pipeline_sweep.py "17:1,9:1,6:1"
"""

import json
import os
import sys
import time

os.environ.setdefault("SESA_ROFORMER_SCAN_UNROLL", "2")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
from ml_collections import ConfigDict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sesa_tpu.runtime import DemixSpec, demix  # noqa: E402
from sesa_tpu.models import bs_roformer  # noqa: E402


def main():
    combos = [tuple(map(int, c.split(":")))
              for c in (sys.argv[1] if len(sys.argv) > 1 else "17:1,9:1,6:1").split(",")]
    config = ConfigDict({"model": dict(
        dim=512, depth=12, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=2,
    )})
    params = bs_roformer.init(jax.random.PRNGKey(0), config)

    def model_apply(p, chunks):
        return bs_roformer.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    t = np.arange(60 * 44100) / 44100
    song = (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.standard_normal(60 * 44100)).astype(np.float32)
    mix = np.stack([song, 0.9 * song])
    mix = np.clip(np.round(mix * 32768), -32768, 32767).astype(np.float32) / 32768

    results = []
    for (bs, segb) in combos:
        spec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=bs,
                         num_stems=1)
        t0 = time.time()
        out = demix(model_apply, params, mix, spec, seg_batches=segb)
        compile_s = time.time() - t0
        walls = []
        for _ in range(5):
            t0 = time.time()
            out = demix(model_apply, params, mix, spec, seg_batches=segb)
            walls.append(time.time() - t0)
        assert np.isfinite(out).all()
        r = {"batch": bs, "seg_batches": segb, "rtf": round(60 / min(walls), 2),
             "best_wall_s": round(min(walls), 3),
             "walls": [round(w, 3) for w in walls],
             "compile_s": round(compile_s, 1)}
        print(json.dumps(r), flush=True)
        results.append(r)

    with open(os.path.join(os.path.dirname(__file__), "pipeline_sweep.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
