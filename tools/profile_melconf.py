"""Decompose the mel-band conformer wall: which sub-module dominates.

Times the full forward and each conformer sub-module at the bench's
time-direction shapes (batch*bands sequences of ~690 frames, dim 384).
Run on the chip (one TPU job at a time):
    python tools/profile_melconf.py
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
from sesa_tpu.models import mel_band_conformer

DIM, HEADS = 384, 8
B, N = 240, 690  # half the bench's batch*bands to keep walls ~1 s


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
    params = cc.conformer_block_init(jax.random.PRNGKey(0), DIM,
                                     heads=HEADS)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, N, DIM)).astype(np.float32) * 0.3).astype(jnp.bfloat16)

    out["block_ms"] = round(clock(jax.jit(
        lambda t: cc.conformer_block_apply(p16, t, HEADS)), x) * 1e3, 1)
    out["ff_ms"] = round(clock(jax.jit(
        lambda t: cc._ff_apply(p16["ff1"], t, None) + t), x) * 1e3, 1)
    out["attn_ms"] = round(clock(jax.jit(
        lambda t: cc._attn_apply(p16["attn"], t, HEADS, None) + t), x) * 1e3, 1)
    out["conv_ms"] = round(clock(jax.jit(
        lambda t: cc._conv_apply(p16["conv"], t, None) + t), x) * 1e3, 1)
    print(json.dumps(out), flush=True)

    # full model, one chunk, bench shape
    config = ConfigDict({"model": dict(
        dim=DIM, depth=8, stereo=True, num_stems=1, num_bands=60,
        time_conformer_depth=1, freq_conformer_depth=1,
        stft_n_fft=2048, stft_hop_length=512, stft_win_length=2048,
    )})
    mp = mel_band_conformer.init(jax.random.PRNGKey(1), config)
    xm = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 2, 352800)).astype(np.float32) * 0.1)

    # params must be ARGUMENTS: closing them over bakes 300 MB of weight
    # constants into the compile request (HTTP 413 on the remote backend)
    @jax.jit
    def fwd(p, t):
        return mel_band_conformer.apply(p, config, t,
                                        compute_dtype=jnp.bfloat16)

    y = fwd(mp, xm)
    np.asarray(y)
    t0 = time.time()
    for _ in range(2):
        y = fwd(mp, xm + y[:, 0] * 1e-6)
    np.asarray(y)
    out["model_b4_ms"] = round((time.time() - t0) / 2 * 1e3, 1)
    out["model_b4_rtf"] = round(4 * 8 / ((time.time() - t0) / 2), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
