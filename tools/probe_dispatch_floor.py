"""Measure the per-dispatch floor through the axon relay, interleaved with
apollo so wall drift hits both equally. If a trivial elementwise program on
apollo's input shape costs hundreds of ms per chained call, the apollo
'residual' in profile_apollo_split2 is dispatch overhead, not compute — and
the chain optimization target changes from kernels to dispatch count.

Run on the chip: python tools/probe_dispatch_floor.py
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


def chain_time(fn, x, chain):
    y = fn(x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(x + 0.0 * jnp.sum(jnp.ravel(y)[:4]))
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    config = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                       layer=6)})
    params = apollo.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(0.2 * rng.standard_normal((3, 2, 19 * SR)).astype(np.float32))
    x6 = jnp.asarray(0.2 * rng.standard_normal((6, 2, 19 * SR)).astype(np.float32))

    def full(v):
        return apollo.apply(params, config, v, compute_dtype=jnp.bfloat16)

    trivial = jax.jit(lambda v: v * 1.0002 + 0.1)
    full_j = jax.jit(full)

    # warm all three
    variants = {
        "trivial_b3": (trivial, x3),
        "apollo_b3": (full_j, x3),
        "apollo_b6": (full_j, x6),
    }
    results = {k: [] for k in variants}
    for rnd in range(3):
        for name, (fn, x) in variants.items():
            results[name].append(round(chain_time(fn, x, chain=4) * 1e3, 1))
        print(json.dumps({("round%d" % rnd): {k: v[-1] for k, v in results.items()}}),
              flush=True)
    out = {k: min(v) for k, v in results.items()}
    out["apollo_b3_minus_floor"] = round(out["apollo_b3"] - out["trivial_b3"], 1)
    out["b6_over_b3"] = round(out["apollo_b6"] / out["apollo_b3"], 2)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
