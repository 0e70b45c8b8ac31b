"""Mel-band conformer cost by CUMULATIVE PREFIX (same method as
profile_apollo_layers.py): time the bench's melconf shape at depth
0/1/2/4/8 in one relay window; marginals are additive and XLA-honest.
depth=0 isolates the STFT + band split + mask estimator + iSTFT floor.
Also times a freq-only and time-only single-depth variant to split the
per-depth marginal between the two conformer directions.

Run on the chip: python tools/profile_melconf_layers.py
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

import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import mel_band_conformer

SR = 44100
DEPTHS = [0, 1, 2, 4, 8]


def cfg_for(depth, tdepth=1, fdepth=1):
    return ConfigDict({"model": dict(
        dim=384, depth=depth, stereo=True, num_stems=1, num_bands=60,
        time_conformer_depth=tdepth, freq_conformer_depth=fdepth,
        stft_n_fft=2048, stft_hop_length=512, stft_win_length=2048,
    )})


def chain_time(fn, p, x, chain=4):
    y = fn(p, x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(p, x + 0.0 * jnp.sum(jnp.ravel(y)[:4]))
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.2 * rng.standard_normal((6, 2, 352800)).astype(np.float32))

    full_cfg = cfg_for(8)
    full_params = mel_band_conformer.init(jax.random.PRNGKey(1), full_cfg)

    fns = {}
    for d in DEPTHS:
        cfg = cfg_for(d)
        p = dict(full_params)
        p["layers"] = full_params["layers"][:d]

        # params as jit ARGUMENTS (a closed-over param tree bakes ~100 MB
        # of constants into the remote-compile request -> HTTP 413)
        fns[f"depth{d}"] = (jax.jit(
            lambda p, v, cfg=cfg: mel_band_conformer.apply(
                p, cfg, v, compute_dtype=jnp.bfloat16)), p)

    results = {k: [] for k in fns}
    for rnd in range(3):
        for name, (fn, p) in fns.items():
            results[name].append(round(chain_time(fn, p, x) * 1e3, 1))
        print(json.dumps({f"round{rnd}": {k: v[-1] for k, v in results.items()}}),
              flush=True)
    best = {k: min(v) for k, v in results.items()}
    out = dict(best)
    ds = DEPTHS
    for a, b in zip(ds, ds[1:]):
        out[f"marginal_{a}to{b}_ms_per_depth"] = round(
            (best[f"depth{b}"] - best[f"depth{a}"]) / (b - a), 1)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
