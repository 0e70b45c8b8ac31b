"""Decompose the MDX23C bench wall: forward vs demix overhead vs transfer.

Run on the chip (one TPU job at a time):
    JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profile_mdx23c.py

Timings end with a data fetch and use data-dependent chains (the relay
caches repeated identical dispatches — see the verify recipe).
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

from sesa_tpu.models import mdx23c

SR = 44100


def main():
    config = ConfigDict({
        "audio": dict(n_fft=8192, hop_length=1024, dim_f=4096,
                      num_channels=2, chunk_size=261120, sample_rate=SR),
        "model": dict(num_subbands=4, num_scales=5, scale=[2, 2],
                      num_blocks_per_scale=2, num_channels=128, growth=128,
                      bottleneck_factor=4, norm="InstanceNorm", act="gelu"),
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })
    params = mdx23c.init(jax.random.PRNGKey(0), config)
    out = {}

    @jax.jit
    def fwd(p, x):
        return mdx23c.apply(p, config, x, compute_dtype=jnp.bfloat16)

    for batch in (4, 8):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 2, 261120)).astype(np.float32) * 0.1)
        t0 = time.time()
        y = fwd(params, x)
        np.asarray(y)
        compile_s = time.time() - t0
        # data-dependent chain of 4 forwards, fetch at the end
        t0 = time.time()
        n = 4
        for _ in range(n):
            x = fwd(params, x)[:, 0] * 0.99
            x = jnp.concatenate([x[:, :1], x[:, 1:]], axis=1)
        np.asarray(x)
        per = (time.time() - t0) / n
        out[f"forward_b{batch}_ms"] = round(per * 1e3, 1)
        out[f"forward_b{batch}_compile_s"] = round(compile_s, 1)
        # audio seconds per chunk = 261120/44100 = 5.92; RTF of forward alone
        out[f"forward_b{batch}_rtf"] = round(batch * (261120 / SR) / per, 1)

    # host->device upload (21 MB f32 60 s stereo)
    mix = np.random.default_rng(1).standard_normal(
        (2, 60 * SR)).astype(np.float32)
    t0 = time.time()
    d = jax.device_put(mix)
    float(jnp.asarray(d, jnp.float32).sum())
    out["upload_f32_60s_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    _ = np.asarray(d)
    out["download_f32_60s_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
