"""Interleaved A/B of the fused kernels' per-program sequence batching
(gb cap) at the SHORT-sequence shapes the registry families actually serve:

  melconf freq attention   (4140, 60, 384)  heads 8 dh 64   sp 64
  roformer freq attention  (2760, 62, 512)  heads 8 dh 64   sp 64
  mel-band freq attention  (4140, 60, 384)  roformer block  sp 64

At sp 64 the current cap 4 leaves each program a 256-row GEMM slab and
thousands of programs; cap 16 reaches the 1024-row target. Interleaved
rounds cancel relay drift.

Run on the chip: python tools/sweep_gb_cap.py
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

from sesa_tpu.ops.attention import (fused_attention_block,
                                    fused_conformer_attention)

CAPS = [4, 8, 16]


def chain_time(fn, x, chain=8):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(chain):
        y = fn(x + 0.0 * jnp.sum(jnp.ravel(y)[:4]))
    jax.block_until_ready(y)
    return (time.time() - t0) / chain


def main():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.bfloat16)

    cases = {}

    # melconf freq: dim 384, inner 512 (8 heads x 64)
    d, hd, heads = 384, 512, 8
    lnw, lnb = jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16)
    wqkv = arr(3 * hd, d)
    rel = arr(2 * 512 + 1, hd // heads)
    wo, bo = arr(d, hd), arr(d)
    x_mc = arr(4140, 60, d)
    for cap in CAPS:
        cases[f"melconf_freq_cap{cap}"] = (
            jax.jit(lambda v, cap=cap: fused_conformer_attention(
                v, lnw, lnb, wqkv, rel, wo, bo, heads, gb_cap=cap)), x_mc)

    # roformer freq: dim 512, inner 512, gated block with rope
    d2 = 512
    gamma = jnp.ones((d2,), jnp.bfloat16)
    wqkv2 = arr(3 * hd, d2)
    wg, bg = arr(heads, d2), arr(heads)
    wo2 = arr(d2, hd)
    n = 62
    t = np.arange(n)[:, None] / (10000 ** (np.arange(0, 32, 2) / 32))
    rope = (jnp.asarray(np.repeat(np.cos(t), 2, 1), jnp.bfloat16),
            jnp.asarray(np.repeat(np.sin(t), 2, 1), jnp.bfloat16))
    x_ro = arr(2760, n, d2)
    for cap in CAPS:
        cases[f"roformer_freq_cap{cap}"] = (
            jax.jit(lambda v, cap=cap: fused_attention_block(
                v, gamma, wqkv2, wg, bg, wo2, heads, 64 ** -0.5, rope=rope,
                gb_cap=cap)), x_ro)

    results = {k: [] for k in cases}
    for rnd in range(3):
        for name, (fn, x) in cases.items():
            results[name].append(round(chain_time(fn, x) * 1e3, 2))
        print(json.dumps({f"round{rnd}": {k: v[-1] for k, v in results.items()}}),
              flush=True)
    out = {k: min(v) for k, v in results.items()}
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
