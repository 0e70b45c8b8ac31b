"""Apollo cost by CUMULATIVE PREFIX: time the real model at layer=0..6 in
one process (same relay window). Marginal differences are additive and
XLA-honest, unlike identity-stub ablations (profile_apollo_split*.py) whose
stubs let XLA cancel adjacent transposes and mis-attribute.

layer=0 = STFT + band features + bottleneck + output heads + iSTFT floor.

Run on the chip: python tools/profile_apollo_layers.py
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

from sesa_tpu.models import apollo

SR = 44100
LAYERS = [0, 1, 2, 4, 6]


def chain_time(fn, x, chain=4):
    y = fn(x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(x + 0.0 * jnp.sum(jnp.ravel(y)[:4]))
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.2 * rng.standard_normal((3, 2, 19 * SR)).astype(np.float32))

    full_cfg = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                         layer=6)})
    full_params = apollo.init(jax.random.PRNGKey(0), full_cfg)

    fns = {}
    for nl in LAYERS:
        cfg = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                        layer=nl)})
        p = dict(full_params)
        p["layers"] = full_params["layers"][:nl]

        def make(cfg=cfg, p=p):
            return jax.jit(lambda v: apollo.apply(p, cfg, v,
                                                  compute_dtype=jnp.bfloat16))
        fns[nl] = make()

    results = {nl: [] for nl in LAYERS}
    for rnd in range(3):
        for nl in LAYERS:
            results[nl].append(round(chain_time(fns[nl], x) * 1e3, 1))
        print(json.dumps({f"round{rnd}": {str(k): v[-1] for k, v in results.items()}}),
              flush=True)
    best = {nl: min(v) for nl, v in results.items()}
    out = {f"layer{nl}_ms": best[nl] for nl in LAYERS}
    for a, b in zip(LAYERS, LAYERS[1:]):
        out[f"marginal_{a}to{b}_ms_per_layer"] = round(
            (best[b] - best[a]) / (b - a), 1)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
