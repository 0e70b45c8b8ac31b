"""On-device kernel/pipeline profiler for the roformer hot path.

Usage (run on the TPU host; ONE job at a time — the relay serializes
device access and concurrent jobs inflate each other's walls):

    JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profile_kernels.py

Valid timings on this backend must end with a data fetch
(`float(x.sum())`) — `block_until_ready` does not await remote execution
and repeated identical dispatches can be served from a relay cache, so
every loop below chains data-dependent calls and fetches at the end.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bs_roformer
from sesa_tpu.models import roformer_core as core
from sesa_tpu.ops.rope import default_freqs, rope_tables

HEADS, DH, DIM = 8, 64, 512
B, NB, TF = 17, 62, 690  # 17 chunks of 8 s: 62 bands x 690 frames


def timeit(name, f, x, n=8):
    y = f(x)
    float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    for _ in range(n):
        y = f(y)
    float(jnp.asarray(y, jnp.float32).sum())
    print(f"{name}: {(time.time() - t0) / n * 1000:.1f} ms", flush=True)


def model_cfg(depth):
    return ConfigDict({"model": dict(
        dim=DIM, depth=depth, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1, dim_head=DH,
        heads=HEADS, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=2)})


def depth_bisect():
    """Separate per-transformer-depth cost from the STFT/band/mask base."""
    times = {}
    for depth in (2, 12):
        cfg = model_cfg(depth)
        params = bs_roformer.init(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def step(p, x):
            out = bs_roformer.apply(p, cfg, x, compute_dtype=jnp.bfloat16)
            return out[:, 0] * 0.5 + x * 0.5

        x = jnp.asarray(np.random.randn(B, 2, 352800).astype(np.float32) * 0.1)
        x = step(params, x)
        float(x.sum())
        t0 = time.time()
        for _ in range(4):
            x = step(params, x)
        float(x.sum())
        times[depth] = (time.time() - t0) / 4
        print(f"forward depth {depth}: {times[depth] * 1000:.0f} ms", flush=True)
    per = (times[12] - times[2]) / 10
    print(f"per-depth: {per * 1000:.0f} ms, "
          f"base (stft+bands+mask+istft): {(times[2] - 2 * per) * 1000:.0f} ms")


def layer_parts():
    """Fused attention blocks and FF at production shapes."""
    rng = jax.random.PRNGKey(0)
    attn_p = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                          core.attention_init(rng, DIM, HEADS, DH))
    ff_p = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                        core.ff_init(rng, DIM, 4))
    rope_t = tuple(r.astype(jnp.bfloat16) for r in
                   rope_tables(jnp.asarray(default_freqs(DH)), TF))
    rope_f = tuple(r.astype(jnp.bfloat16) for r in
                   rope_tables(jnp.asarray(default_freqs(DH)), NB))
    xt = jnp.asarray(np.random.randn(B, NB, TF, DIM) * 0.1, jnp.bfloat16)
    xf = jnp.asarray(np.random.randn(B, TF, NB, DIM) * 0.1, jnp.bfloat16)
    P = jax.lax.Precision.DEFAULT
    timeit("time attn block", jax.jit(
        lambda x: core.attention_apply_residual(attn_p, x, HEADS, rope=rope_t,
                                                precision=P)), xt)
    timeit("freq attn block", jax.jit(
        lambda x: core.attention_apply_residual(attn_p, x, HEADS, rope=rope_f,
                                                precision=P)), xf)
    timeit("fused ff", jax.jit(
        lambda x: core.ff_apply_residual(ff_p, x, precision=P)), xt)


if __name__ == "__main__":
    layer_parts()
    depth_bisect()
