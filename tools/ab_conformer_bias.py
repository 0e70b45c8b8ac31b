"""A/B the Shaw-bias cost inside the fused conformer attention kernel.

Times the fused kernel at the melconf bench shapes (time direction
(360, 690, 384) and freq direction (4140, 60, 384)) in three compile-time
variants — full (qe GEMM + strided roll), no_roll (qe GEMM, skew skipped)
and no_bias (neither) — plus the unfused XLA path, interleaved across
rounds so relay drift cannot bias a leg. The deltas attribute the
kernel's time to the bias GEMM vs the roll vs the core attention.

Run on the chip, one TPU process at a time:

    python tools/ab_conformer_bias.py
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

from sesa_tpu.models import conformer_core as cc
from sesa_tpu.ops.attention import fused_conformer_attention

DIM, HEADS, DH = 384, 8, 64


def clock(fn, *args, chain=8):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(chain):
        y = fn(*args)
    jax.block_until_ready(y)
    np.asarray(y.ravel()[:1])
    return (time.time() - t0) / chain * 1e3


def main():
    rng = np.random.default_rng(0)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    p = {"norm": {"weight": 1.0 + 0.1 * r(DIM), "bias": r(DIM)},
         "to_q": {"weight": r(HEADS * DH, DIM)},
         "to_kv": {"weight": r(2 * HEADS * DH, DIM)},
         "to_out": {"weight": r(DIM, HEADS * DH), "bias": r(DIM)},
         "rel_pos_emb": r(2 * 512 + 1, DH)}
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    wqkv = jnp.concatenate([p16["to_q"]["weight"], p16["to_kv"]["weight"]],
                           axis=0)

    def fused(variant):
        return jax.jit(lambda v: fused_conformer_attention(
            v, p16["norm"]["weight"], p16["norm"]["bias"], wqkv,
            p16["rel_pos_emb"], p16["to_out"]["weight"],
            p16["to_out"]["bias"], HEADS, variant=variant))

    unfused = jax.jit(lambda v: cc._attn_apply(p16, v, HEADS, None) + v)

    legs = {"full": fused("full"), "no_roll": fused("no_roll"),
            "no_bias": fused("no_bias"), "unfused": unfused}

    for direction, (b, n) in {"time": (360, 690), "freq": (4140, 60)}.items():
        x = jnp.asarray(rng.standard_normal((b, n, DIM)).astype(np.float32)
                        * 0.3).astype(jnp.bfloat16)
        rounds = []
        for rd in range(3):
            out = {}
            for name, fn in legs.items():
                out[name] = round(clock(fn, x), 1)
            rounds.append(out)
        steady = {k: min(rd[k] for rd in rounds) for k in legs}
        print(json.dumps({"direction": direction, **steady}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
