"""Characterize the relay's device->host fetch path.

The chain-overhead probe (tools/profile_chain_overhead.py) showed the
scnet_melconf bench wall is compute + FULL transfer time — the
copy_to_host_async calls in demix_start hide nothing. This probe answers
the follow-ups that decide the fix:

  fetch_42mb_s        raw single-stream fetch of a 42 MB int16 array
  fetch_42mb_4way_s   same bytes as 4 concurrent 10.5 MB thread fetches
  fetch_during_compute_s  one 42 MB fetch issued while a ~1.7 s melconf
                      segment computes: ~max(fetch, compute) if the relay
                      overlaps them, ~sum if it serializes
  compute_alone_s     the melconf segment alone (same dispatch), baseline

Run on the chip, one TPU process at a time:

    python tools/profile_fetch.py
"""

import concurrent.futures as cf
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

import bench
from sesa_tpu.runtime import demix_start, upload_mix


def main():
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    mix = bench.make_song()
    mix_dev = upload_mix(mix)

    n = 42 * 1024 * 1024 // 2  # 42 MB of int16
    base = jax.block_until_ready(jnp.arange(n, dtype=jnp.int32))
    salt = [0]

    def fresh():
        """A NEVER-FETCHED 42 MB int16 device array. jax.Array caches its
        host copy after the first np.asarray, so re-fetching one array is
        free — each timed fetch must target a new buffer."""
        salt[0] += 1
        return jax.block_until_ready((base + salt[0]).astype(jnp.int16))

    def fetch_big():
        return int(np.asarray(fresh())[0])

    def fetch_4way():
        big = fresh()
        quarters = [big[i * (n // 4):(i + 1) * (n // 4)] for i in range(4)]
        jax.block_until_ready(quarters)
        with cf.ThreadPoolExecutor(4) as ex:
            parts = list(ex.map(np.asarray, quarters))
        return int(parts[0][0])

    def compute():
        j = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                        seg_batches=1, transport="device")
        return float(jnp.sum(j.collect_device()[..., :16]))

    def fetch_during_compute():
        big = fresh()
        j = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                        seg_batches=1, transport="device")
        got = int(np.asarray(big)[0])  # issued while segments compute
        return got + float(jnp.sum(j.collect_device()[..., :16]))

    legs = {
        "fetch_42mb_s": fetch_big,
        "fetch_42mb_4way_s": fetch_4way,
        "compute_alone_s": compute,
        "fetch_during_compute_s": fetch_during_compute,
    }
    for fn in legs.values():  # warmup / compile
        fn()

    rounds = []
    for r in range(3):
        out = {}
        for name, fn in legs.items():
            t0 = time.time()
            fn()
            out[name] = round(time.time() - t0, 3)
        rounds.append(out)
        print(json.dumps({"round": r, **out}), flush=True)

    steady = {k: min(r[k] for r in rounds) for k in legs}
    steady["overlap_gain_s"] = round(
        steady["compute_alone_s"] + steady["fetch_42mb_s"]
        - steady["fetch_during_compute_s"], 3)
    print(json.dumps({"steady": steady}))


if __name__ == "__main__":
    sys.exit(main())
