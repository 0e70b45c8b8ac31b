"""Interleaved A/B of SESA_LSTM_UNROLL on the SCNet dual-path stack.

The dual-path BiLSTM stack is ~200 of SCNet's 244 ms at the bench shape
(tools/profile_scnet.py) and its lax.scan steps are latency-bound (the
per-step hidden GEMM is far below MXU peak). Unrolling trades program
size for fewer per-step loop overheads. The unroll is baked at TRACE
time, so each setting traces its own jit; trials interleave round-robin
against the same input to cancel relay drift.

    python tools/ab_lstm_unroll.py
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

UNROLLS = [1, 4, 8, 16]


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
        dims=[4, 32, 64, 128], nfft=4096, hop_size=1024, win_size=4096,
        normalized=True, num_dplayer=6, expand=1,
    )})
    params = scnet.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 2, 352800)).astype(np.float32) * 0.1)

    fns = {}
    for u in UNROLLS:
        os.environ["SESA_LSTM_UNROLL"] = str(u)  # read at trace time

        @jax.jit
        def fwd(p, t):
            return scnet.apply(p, config, t, compute_dtype=jnp.bfloat16)

        # trace + compile now, under the right env; keep the compiled
        # executable so later timed calls cannot re-trace under the wrong one
        fns[u] = fwd.lower(params, x).compile()

    for r in range(3):
        out = {}
        for u, fn in fns.items():
            out[f"unroll_{u}_ms"] = round(clock(fn, params, x), 1)
        print(json.dumps({"round": r, **out}))


if __name__ == "__main__":
    sys.exit(main())
