"""Apollo stage split by ABLATION: time the real jitted apollo.apply with
(a) full model, (b) band-axis roformers stubbed to identity, (c) seq ICB
convs stubbed to identity. Differences attribute wall to each sub-module
under the real fusion/layout (tools/profile_apollo.py's isolated-stage
numbers disagreed with the end-to-end wall by 3x because the isolated
transposes/layouts don't match the in-model ones).

Run on the chip: python tools/profile_apollo_split.py
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


def clock(fn, x, chain=6):
    y = fn(x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(x + 0.0 * jnp.sum(y))  # data-dependent chain
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    config = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                       layer=6)})
    params = apollo.init(jax.random.PRNGKey(0), config)
    # apollo_b3 batch shape: 3 chunks x 19 s
    x = jnp.asarray(0.2 * np.random.default_rng(0).standard_normal(
        (3, 2, 19 * SR)).astype(np.float32))

    def full(v):
        return apollo.apply(params, config, v, compute_dtype=jnp.bfloat16)

    out = {}
    out["full_ms"] = round(clock(jax.jit(full), x) * 1e3, 1)

    orig_ro = apollo._roformer_apply
    orig_conv = apollo._conv_act_norm_apply
    try:
        apollo._roformer_apply = lambda p, v, num_head=8, precision=None: v
        out["no_band_roformer_ms"] = round(clock(jax.jit(full), x) * 1e3, 1)
        apollo._roformer_apply = orig_ro
        apollo._conv_act_norm_apply = (
            lambda p, v, kernel=7, precision=None: v)
        out["no_seq_conv_ms"] = round(clock(jax.jit(full), x) * 1e3, 1)
    finally:
        apollo._roformer_apply = orig_ro
        apollo._conv_act_norm_apply = orig_conv

    out["band_roformer_ms"] = round(out["full_ms"] - out["no_band_roformer_ms"], 1)
    out["seq_conv_ms"] = round(out["full_ms"] - out["no_seq_conv_ms"], 1)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
