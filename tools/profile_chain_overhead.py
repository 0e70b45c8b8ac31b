"""Decompose the scnet_melconf bench wall into compute vs relay transfer.

The bench (bench.py bench_scnet_melconf) measures: upload once, dispatch
both jobs, collect both (int16 transport). Steady compute is ~0.73 s
(scnet, 3 segments) + ~1.7 s (melconf) but the recorded wall is ~3.4 s —
this probe measures where the other second goes:

  upload_s          host->device int16 upload of the 60 s song
  scnet_dev_s       scnet demix, transport="device" (compute-only wall,
                    fetch-terminated by a 1-element reduction)
  melconf_dev_s     same for melconf
  both_dev_s        both jobs overlapped, device transport (pure compute)
  bench_s           the actual bench run (int16 collect both)

bench_s - both_dev_s - upload_s = unhidden transfer cost. Rounds are
interleaved so relay drift cannot bias one leg. One TPU process at a
time; run on the chip:

    python tools/profile_chain_overhead.py
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

import bench
from sesa_tpu.runtime import demix_start, upload_mix


def fetch_scalar(x):
    return float(jnp.sum(x[..., :16]))


def main():
    sc_apply, sc_params, sc_spec = bench._scnet_setup()
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    mix = bench.make_song()

    def upload():
        d = upload_mix(mix)
        fetch_scalar(d)
        return d

    mix_dev = upload()

    def run_dev(apply_fn, params, spec):
        j = demix_start(apply_fn, params, mix_dev, spec, seg_batches=1,
                        transport="device")
        return fetch_scalar(j.collect_device())

    def run_both_dev():
        j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                         seg_batches=1, transport="device")
        j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                         seg_batches=1, transport="device")
        return fetch_scalar(j1.collect_device()) + fetch_scalar(
            j2.collect_device())

    def run_bench():
        d = upload_mix(mix)
        j1 = demix_start(sc_apply, sc_params, d, sc_spec,
                         seg_batches=1, transport="int16")
        j2 = demix_start(mc_apply, mc_params, d, mc_spec,
                         seg_batches=1, transport="int16")
        a, b = j1.collect(), j2.collect()
        return float(a.ravel()[0]) + float(b.ravel()[0])

    def run_collect_order_swapped():
        """Same as the bench but collect melconf FIRST: tells whether the
        scnet fetch hides behind melconf compute at all."""
        d = upload_mix(mix)
        j1 = demix_start(sc_apply, sc_params, d, sc_spec,
                         seg_batches=1, transport="int16")
        j2 = demix_start(mc_apply, mc_params, d, mc_spec,
                         seg_batches=1, transport="int16")
        b, a = j2.collect(), j1.collect()
        return float(a.ravel()[0]) + float(b.ravel()[0])

    legs = {
        "upload_s": upload,
        "scnet_dev_s": lambda: run_dev(sc_apply, sc_params, sc_spec),
        "melconf_dev_s": lambda: run_dev(mc_apply, mc_params, mc_spec),
        "both_dev_s": run_both_dev,
        "bench_s": run_bench,
        "bench_swapped_s": run_collect_order_swapped,
    }

    # warmup (compiles)
    for fn in legs.values():
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
    steady["unhidden_transfer_s"] = round(
        steady["bench_s"] - steady["both_dev_s"] - steady["upload_s"], 3)
    print(json.dumps({"steady": steady}))


if __name__ == "__main__":
    sys.exit(main())
