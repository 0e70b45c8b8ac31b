"""Interleaved per-module profile of the mel-band conformer at bench shapes.

Times each sub-module at the REAL intermediate shapes of the bench config
(batch 6 chunks of 352800 -> tf=690 frames, 60 bands, dim 384) round-robin
across repeated rounds so a relay-health drift mid-run cannot bias one
part against another (the relay swings ~3x between windows; see
BASELINE.md). Run on the chip, one TPU process at a time:

    python tools/profile_melconf_parts.py
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

from sesa_tpu.models import conformer_core as cc
from sesa_tpu.models import mel_band_conformer as mc

B, TF, NB, DIM, HEADS = 6, 690, 60, 384, 8


def clock(fn, *args, chain=4):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(chain):
        y = fn(*args)
    jax.block_until_ready(y)
    np.asarray(jax.tree.leaves(y)[0].ravel()[:1])
    return (time.time() - t0) / chain * 1e3


def main():
    config = ConfigDict({"model": dict(
        dim=DIM, depth=8, stereo=True, num_stems=1, num_bands=NB,
        time_conformer_depth=1, freq_conformer_depth=1,
        stft_n_fft=2048, stft_hop_length=512, stft_win_length=2048,
    )})
    params = mc.init(jax.random.PRNGKey(1), config)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    blk = p16["layers"][0]["time"]["layers"][0]

    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.standard_normal((B, 2, 352800)).astype(np.float32) * 0.1)
    zt = jnp.asarray(rng.standard_normal((B * NB, TF, DIM)).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    zf = jnp.asarray(rng.standard_normal((B * TF, NB, DIM)).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    tok_t = zt.reshape(-1, DIM)

    HI = jax.lax.Precision.HIGHEST

    a = blk["attn"]
    wqkv = jnp.concatenate([a["to_q"]["weight"], a["to_kv"]["weight"]], axis=0)

    def attn_fused(z):
        from sesa_tpu.ops.attention import fused_conformer_attention
        return fused_conformer_attention(
            z, a["norm"]["weight"], a["norm"]["bias"], wqkv,
            a["rel_pos_emb"], a["to_out"]["weight"], a["to_out"]["bias"], HEADS)

    parts = {
        "full_model_b6": (jax.jit(lambda p, v: mc.apply(
            p, config, v, compute_dtype=jnp.bfloat16)), (params, x_full)),
        "block_time_fused": (jax.jit(lambda p, z: cc.conformer_block_apply(
            p, z, HEADS, precision=HI)), (blk, zt)),
        "block_freq_fused": (jax.jit(lambda p, z: cc.conformer_block_apply(
            p, z, HEADS, precision=HI)), (blk, zf)),
        "ff_fused_time_tokens": (jax.jit(lambda p, t: cc._ff_fused(p, t)),
                                 (blk["ff1"], tok_t)),
        "attn_fused_time": (jax.jit(attn_fused), (zt,)),
        "attn_fused_freq": (jax.jit(attn_fused), (zf,)),
        "conv_time": (jax.jit(lambda p, z: cc._conv_apply(p, z, HI)),
                      (blk["conv"], zt)),
        "conv_freq": (jax.jit(lambda p, z: cc._conv_apply(p, z, HI)),
                      (blk["conv"], zf)),
        "trivial_dispatch": (jax.jit(lambda z: z * 2.0 + 1.0), (zf,)),
    }

    rounds = []
    for r in range(3):
        out = {}
        for name, (fn, args) in parts.items():
            out[name] = round(clock(fn, *args), 1)
        rounds.append(out)
        print(json.dumps({"round": r, **out}))

    # steady-state = per-part min across post-warmup rounds
    steady = {k: min(r[k] for r in rounds[1:]) for k in parts}
    blocks = 8 * (steady["block_time_fused"] + steady["block_freq_fused"])
    steady["sum_16_blocks_ms"] = round(blocks, 1)
    steady["glue_ms_est"] = round(steady["full_model_b6"] - blocks, 1)
    print(json.dumps({"steady": steady}))


if __name__ == "__main__":
    sys.exit(main())
