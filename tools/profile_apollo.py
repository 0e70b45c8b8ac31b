"""Decompose the ensemble chain's Apollo stage: which sub-module dominates.

The ensemble_pipeline bench (bench.py bench_ensemble_pipeline) runs the
Apollo universal shape (sr 44.1k, 20 ms win, feature_dim 256, 6 layers)
over 19 s chunks; the chain RTF (~9.8x) sits well below the two
separations alone (~14.6x), implying the Apollo stage runs at roughly
30x realtime. This times the full Apollo demix plus each sub-block
(band-axis roformer, time-axis ICB conv, band feature/out heads) so the
optimization target is measured, not guessed.

Run on the chip (one TPU job at a time):
    python tools/profile_apollo.py
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

from sesa_tpu.models import apollo
from sesa_tpu.runtime import DemixSpec, demix

SR = 44100


def clock(fn, x, chain=4):
    y = fn(x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(y * 0.999)
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    out = {}
    config = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                       layer=6)})
    params = apollo.init(jax.random.PRNGKey(0), config)

    # ---- end-to-end: 60 s song through the real demix path ----
    song = (0.2 * np.random.default_rng(0).standard_normal((2, 60 * SR))
            ).astype(np.float32)
    spec = DemixSpec(chunk_size=19 * SR, num_overlap=2, batch_size=2,
                     num_stems=1)

    def ap_apply(p, chunks):
        return apollo.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    t0 = time.time()
    res = demix(ap_apply, params, song, spec, seg_batches=1,
                transport="int16")
    _ = float(np.abs(res).sum())
    compile_s = time.time() - t0
    walls = []
    for _ in range(3):
        t0 = time.time()
        res = demix(ap_apply, params, song, spec, seg_batches=1,
                    transport="int16")
        _ = float(np.abs(res).sum())
        walls.append(time.time() - t0)
    best = min(walls)
    out["apollo_demix_60s_best_s"] = round(best, 3)
    out["apollo_rtf"] = round(60.0 / best, 1)
    out["apollo_compile_s"] = round(compile_s, 1)

    # ---- sub-blocks at the forward's working shape ----
    # 19 s chunk, 20 ms win -> hop 441, T ~= 1900 frames, 80 bands,
    # batch B'=batch*channels=4 (apollo.apply's feat layout)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, params)
    bands, t_frames, dim = 80, 1901, 256
    xb = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, bands, t_frames, dim)).astype(np.float32) * 0.3, jnp.bfloat16)

    def roformer_stage(v):
        # band communication: seq axis = bands, batched over (B', T)
        b, m, t, c = v.shape
        z = jnp.transpose(v, (0, 2, 1, 3)).reshape(-1, m, c)
        z = apollo._roformer_apply(p16["layers"][0]["band_net"], z)
        return jnp.transpose(z.reshape(b, t, m, c), (0, 2, 1, 3))

    def icb_stage(v):
        # one of the 3 per-layer seq convs over frames per band
        b, m, t, c = v.shape
        z = v.reshape(b * m, t, c)
        z = apollo._conv_act_norm_apply(p16["layers"][0]["seq_net"][0], z)
        return z.reshape(b, m, t, c)

    try:
        out["roformer_band_ms"] = round(clock(jax.jit(roformer_stage), xb) * 1e3, 1)
    except Exception as e:
        out["roformer_band_err"] = repr(e)[:120]
    try:
        out["icb_time_ms"] = round(clock(jax.jit(icb_stage), xb) * 1e3, 1)
    except Exception as e:
        out["icb_time_err"] = repr(e)[:120]

    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
