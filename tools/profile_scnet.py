"""Decompose the SCNet wall: encoder vs dual-path vs decoder, per sub-op.

Times the full forward at the bench shape (batch 6 chunks of 352800) and
each stage at the real intermediate shapes so the scnet_melconf chain work
attacks the true bottleneck. Run on the chip (one TPU job at a time):
    python tools/profile_scnet.py
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

from sesa_tpu.models import scnet


def clock(fn, *args, chain=4):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(chain):
        y = fn(*args)
    jax.block_until_ready(y)
    np.asarray(jax.tree.leaves(y)[0][..., :1])
    return (time.time() - t0) / chain


def main():
    out = {}
    config = ConfigDict({"model": dict(
        dims=[4, 32, 64, 128], nfft=4096, hop_size=1024, win_size=4096,
        normalized=True, num_dplayer=6, expand=1,
    )})
    params = scnet.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 2, 352800)).astype(np.float32) * 0.1)

    @jax.jit
    def fwd(p, t):
        return scnet.apply(p, config, t, compute_dtype=jnp.bfloat16)

    out["full_b6_ms"] = round(clock(fwd, params, x) * 1e3, 1)
    out["full_b6_rtf_fwdonly"] = round(6 * 8 / (out["full_b6_ms"] / 1e3), 1)

    # dual-path stack alone at the real separation shape.
    # shape after 3 SD blocks at nfft4096/hop1024, 352800-sample chunks:
    kw = scnet._model_kwargs(config)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    t_frames = (352800 + (1024 - 352800 % 1024) + 1024) // 1024 + 1
    fr = 4096 // 2 + 1
    import math
    for _ in range(3):
        splits = scnet._band_splits(fr, kw["band_SR"])
        tot = 0
        for bi, (s, e) in enumerate(splits):
            stride = kw["band_stride"][bi]
            kern = kw["band_kernel"][bi]
            cur = e - s
            pad = (kern - stride) if stride == 1 else (stride - cur % stride) % stride
            tot += (cur + pad - kern) // stride + 1
        fr = tot
    out["sep_shape"] = [6, kw["dims"][-1], fr, t_frames]

    z = jnp.asarray(rng.standard_normal(
        (6, kw["dims"][-1], fr, t_frames)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)

    def dp_stack(p, t):
        for i, layer in enumerate(p["separation"]):
            t = scnet._apply_dual_path(layer, t)
            t = scnet._feature_conversion(t, inverse=(i % 2 == 1))
            t = t.astype(jnp.bfloat16)
        return t

    out["dualpath_stack_ms"] = round(clock(jax.jit(dp_stack), p16, z) * 1e3, 1)

    one = p16["separation"][0]
    out["dualpath_layer_ms"] = round(
        clock(jax.jit(lambda p, t: scnet._apply_dual_path(p, t)), one, z) * 1e3, 1)

    # inside one layer: freq path vs time path
    from sesa_tpu.models import layers as L

    b, c, frq, t = z.shape

    def freq_path(p, v):
        y = L.group_norm(v, p["freq"]["norm"], 1)
        y = jnp.transpose(y, (0, 3, 2, 1)).reshape(b * t, frq, c)
        y = L.bilstm(y, p["freq"]["lstm"])
        y = L.linear(y, p["freq"]["linear"])
        return jnp.transpose(y.reshape(b, t, frq, c), (0, 3, 2, 1)) + v

    def time_path(p, v):
        y = L.group_norm(v, p["time"]["norm"], 1)
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b * frq, t, c)
        y = L.bilstm(y, p["time"]["lstm"])
        y = L.linear(y, p["time"]["linear"])
        return jnp.transpose(y.reshape(b, frq, t, c), (0, 3, 1, 2)) + v

    out["freq_path_ms"] = round(clock(jax.jit(freq_path), one, z) * 1e3, 1)
    out["time_path_ms"] = round(clock(jax.jit(time_path), one, z) * 1e3, 1)
    out["featconv_ms"] = round(clock(jax.jit(
        lambda v: scnet._feature_conversion(v, False)), z) * 1e3, 1)

    # encoder + decoder = full - dualpath (approx); also time encoder alone
    def encoder(p, v):
        skips = []
        for blk in p["encoder"]:
            v, skip, _, _ = scnet._apply_sd_block(blk, v, kw)
            skips.append(skip)
        return v, skips

    zin = jnp.asarray(rng.standard_normal(
        (6, 4, 2049, t_frames)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    out["encoder_ms"] = round(clock(jax.jit(encoder), p16, zin) * 1e3, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
