"""Same-window interleaved A/B of ensemble-chain configurations.

The relay wall drifts ~3x between windows, so sweep legs run minutes apart
can't be compared. This interleaves full-chain runs of candidate configs
round-robin and reports per-config best — drift hits every leg equally.

Each config may carry env knobs (read at TRACE time by the kernels), so
every config builds FRESH apply closures via the unwrapped bench setups —
sharing the lru-cached closure would reuse the first config's trace.

Usage (TPU): python tools/chain_ab.py [rounds] [cfg1 cfg2 ...]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from sesa_tpu.postprocess.phase_fixer import ensemble_phase_fix_device  # noqa: E402
from sesa_tpu.runtime import demix, demix_start, upload_mix  # noqa: E402

CONFIGS = {
    # name: (scnet_b, melconf_b, apollo_b, mc_first, env)
    "ship_sc6_mc6_ap2": (6, 6, 2, False, {}),
    "mc9_ap4": (6, 9, 4, False, {}),
    "shortattn": (6, 6, 2, False, {"SESA_CONF_SHORTSEQ_ATTN": "128"}),
    "shortattn_mc9_ap4": (6, 9, 4, False,
                          {"SESA_CONF_SHORTSEQ_ATTN": "128"}),
}


def build(sc_b, mc_b, ap_b, mc_first, env):
    # fresh closures per config: env knobs are read when the demix engine
    # first traces the apply fn, and the jit cache is keyed on closure
    # identity + shapes
    os.environ.update(env)
    sc_apply, sc_params, sc_spec = bench._scnet_setup.__wrapped__()
    mc_apply, mc_params, mc_spec = bench._melconf_setup.__wrapped__()
    ap_apply, ap_params, ap_spec = bench._apollo_setup.__wrapped__()
    sc_spec = dataclasses.replace(sc_spec, batch_size=sc_b)
    mc_spec = dataclasses.replace(mc_spec, batch_size=mc_b)
    ap_spec = dataclasses.replace(ap_spec, batch_size=ap_b)
    mix = bench.make_song()

    def run():
        os.environ.update(env)  # re-traces (new song-length bucket) see it
        mix_dev = upload_mix(mix)
        jobs = [
            lambda: demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                                seg_batches=1, transport="device"),
            lambda: demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                                seg_batches=1, transport="device"),
        ]
        if mc_first:
            j2 = jobs[1]()
            j1 = jobs[0]()
        else:
            j1 = jobs[0]()
            j2 = jobs[1]()
        fixed = ensemble_phase_fix_device(
            mix_dev, [j1.collect_device(stems=[3])[0],
                      j2.collect_device()[0]], bench.SR, method="avg_wave")
        restored = demix(ap_apply, ap_params, fixed, ap_spec,
                         seg_batches=1, transport="int16")
        return np.asarray(restored)

    def cleanup():
        for k in env:
            os.environ.pop(k, None)

    return run, cleanup


def main():
    args = sys.argv[1:]
    rounds = int(args[0]) if args and args[0].isdigit() else 3
    names = [a for a in args if not a.isdigit()] or list(CONFIGS)
    runs = {}
    for name in names:
        run, cleanup = build(*CONFIGS[name])
        runs[name] = (run, cleanup)
        t0 = time.time()
        out = run()  # compile/warm leg
        cleanup()
        assert np.isfinite(out).all()
        print(json.dumps({"warm": name, "s": round(time.time() - t0, 1)}),
              flush=True)
    walls = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            run, cleanup = runs[name]
            t0 = time.time()
            run()
            walls[name].append(round(time.time() - t0, 3))
            cleanup()
        print(json.dumps({"round": r,
                          **{n: walls[n][-1] for n in names}}), flush=True)
    best = {n: min(w) for n, w in walls.items()}
    result = {"best": best,
              "rtf": {n: round(60.0 / b, 2) for n, b in best.items()}}
    print(json.dumps(result), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "chain_ab.json"), "w") as f:
        json.dump({"configs": names, **result, "walls": walls}, f, indent=1)


if __name__ == "__main__":
    main()
