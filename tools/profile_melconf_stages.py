"""Melconf conformer-block stage microbench at the bench shapes: time each
sub-module (fused FF, fused attention, conv module) as its own jitted
program at BOTH directions' shapes (time: (360,690,384), freq:
(4140,60,384)). Isolated timings are valid here (fetch-terminated real
programs); the depth-prefix probe bounds the total.

Run on the chip: python tools/profile_melconf_stages.py
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

from sesa_tpu.models import conformer_core as cc

SHAPES = {"time": (360, 690, 384), "freq": (4140, 60, 384)}


def chain_time(fn, p, x, chain=6):
    y = fn(p, x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(chain):
        y = fn(p, x + 0.0 * jnp.sum(jnp.ravel(y)[:4]))
    float(jnp.asarray(y, jnp.float32).sum())
    return (time.time() - t0) / chain


def main():
    block = cc.conformer_block_init(jax.random.PRNGKey(0), 384)
    block = jax.tree.map(lambda a: a.astype(jnp.bfloat16), block)
    rng = np.random.default_rng(0)

    cases = {}
    for tag, shape in SHAPES.items():
        x = jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

        def ff(p, v):
            return cc._ff_fused(p["ff1"], v)

        def attn(p, v):
            from sesa_tpu.ops.attention import fused_conformer_attention
            a = p["attn"]
            wqkv = jnp.concatenate([a["to_q"]["weight"],
                                    a["to_kv"]["weight"]], axis=0)
            b, n, dim = v.shape
            return fused_conformer_attention(
                v, a["norm"]["weight"], a["norm"]["bias"], wqkv,
                a["rel_pos_emb"], a["to_out"]["weight"],
                a["to_out"]["bias"], 8)

        def conv(p, v):
            return cc._conv_apply(p["conv"], v, None) + v

        def whole(p, v):
            return cc.conformer_block_apply(p, v, 8)

        cases[f"ff_{tag}"] = (jax.jit(ff), x)
        cases[f"attn_{tag}"] = (jax.jit(attn), x)
        cases[f"conv_{tag}"] = (jax.jit(conv), x)
        cases[f"block_{tag}"] = (jax.jit(whole), x)

    results = {k: [] for k in cases}
    for rnd in range(3):
        for name, (fn, x) in cases.items():
            results[name].append(round(chain_time(fn, block, x) * 1e3, 2))
        print(json.dumps({f"round{rnd}": {k: v[-1] for k, v in results.items()}}),
              flush=True)
    out = {k: min(v) for k, v in results.items()}
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
