"""Identify which executable in the ensemble chain misses the persistent
compile cache on a warm run (BENCH_r04 showed cache_new_entries: 1 with a
408 s first-run compile; back-to-back runs still write one new entry, so
some program's cache key is process-nondeterministic).

Runs ONE ensemble-chain pass with jax's compilation-cache logger at DEBUG
and prints every 'Writing ... to persistent compilation cache' line with
the module name. Run twice; the module that writes both times is the
culprit.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)

    class _F(logging.Filter):
        def filter(self, rec):
            m = rec.getMessage()
            return ("persistent compilation cache" in m
                    or "cache miss" in m.lower())

    h = logging.StreamHandler(sys.stdout)
    h.addFilter(_F())
    lg.addHandler(h)
    lg.propagate = False

import numpy as np  # noqa: E402

import bench  # noqa: E402  (repo-root bench: reuses the exact setups)


def main():
    from sesa_tpu.postprocess.ensemble import ensemble_waveforms_device
    from sesa_tpu.postprocess.phase_fixer import phase_fix_arrays
    from sesa_tpu.runtime import demix, demix_start, upload_mix

    sc_apply, sc_params, sc_spec = bench._scnet_setup()
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    ap_apply, ap_params, ap_spec = bench._apollo_setup()
    mix = bench.make_song()

    print("== chain pass ==", flush=True)
    mix_dev = upload_mix(mix)
    j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                     seg_batches=1, transport="device")
    j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                     seg_batches=1, transport="device")
    print("== collect ==", flush=True)
    ens = ensemble_waveforms_device(
        [j1.collect_device(stems=[3])[0], j2.collect_device()[0]],
        "avg_wave")
    print("== phase_fix ==", flush=True)
    fixed = phase_fix_arrays(mix_dev, ens, bench.SR, return_device=True)
    print("== apollo ==", flush=True)
    restored = demix(ap_apply, ap_params, fixed, ap_spec,
                     seg_batches=1, transport="int16")
    print("done", float(np.abs(restored).mean()), flush=True)


if __name__ == "__main__":
    main()
