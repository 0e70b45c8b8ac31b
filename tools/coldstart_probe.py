"""Decompose flagship first-call latency: trace vs compile vs execute.

Run twice back to back (same persistent cache) to separate genuine XLA
compile time from trace time and executable load/first-dispatch overhead
on the remote TPU backend:

    python tools/coldstart_probe.py

Prints one JSON line with stage walls. The demix engine is exercised via
its internal jitted segment program (the same executable bench.py uses).
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

from sesa_tpu.models import bs_roformer


def main():
    config = ConfigDict({"model": dict(
        dim=512, depth=12, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=2,
    )})
    t0 = time.time()
    params = bs_roformer.init(jax.random.PRNGKey(0), config)
    t_init = time.time() - t0

    def fwd(p, chunks):
        return bs_roformer.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    x = jnp.zeros((17, 2, 352800), jnp.float32)

    t0 = time.time()
    lowered = jax.jit(fwd).lower(params, x)
    t_trace = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    t0 = time.time()
    out = compiled(params, x)
    np.asarray(out)
    t_first = time.time() - t0

    t0 = time.time()
    out = compiled(params, x)
    np.asarray(out)
    t_second = time.time() - t0

    print(json.dumps({
        "init_s": round(t_init, 2),
        "trace_s": round(t_trace, 2),
        "compile_s": round(t_compile, 2),
        "first_exec_s": round(t_first, 2),
        "second_exec_s": round(t_second, 2),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
