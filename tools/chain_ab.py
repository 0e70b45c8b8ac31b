"""Same-window interleaved A/B of ensemble-chain configurations.

The relay wall drifts ~3x between windows, so sweep legs run minutes apart
can't be compared. This interleaves full-chain runs of candidate configs
round-robin and reports per-config best — drift hits every leg equally.

Usage (TPU): python tools/chain_ab.py [rounds]
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
    # name: (scnet_b, melconf_b, apollo_b, mc_first)
    "ship_sc6_mc6_ap2": (6, 6, 2, False),
    "mc17_ap3": (6, 17, 3, False),
    "mc17_ap3_mcfirst": (6, 17, 3, True),
    "mc6_ap3_mcfirst": (6, 6, 3, True),
}


def build(sc_b, mc_b, ap_b, mc_first):
    sc_apply, sc_params, sc_spec = bench._scnet_setup()
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    ap_apply, ap_params, ap_spec = bench._apollo_setup()
    sc_spec = dataclasses.replace(sc_spec, batch_size=sc_b)
    mc_spec = dataclasses.replace(mc_spec, batch_size=mc_b)
    ap_spec = dataclasses.replace(ap_spec, batch_size=ap_b)
    mix = bench.make_song()

    def run():
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

    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = {}
    for name, cfg in CONFIGS.items():
        runs[name] = build(*cfg)
        t0 = time.time()
        out = runs[name]()  # compile/warm leg
        assert np.isfinite(out).all()
        print(json.dumps({"warm": name, "s": round(time.time() - t0, 1)}),
              flush=True)
    walls = {n: [] for n in CONFIGS}
    for r in range(rounds):
        for name in CONFIGS:
            t0 = time.time()
            runs[name]()
            walls[name].append(round(time.time() - t0, 3))
        print(json.dumps({"round": r,
                          **{n: walls[n][-1] for n in CONFIGS}}), flush=True)
    best = {n: min(w) for n, w in walls.items()}
    print(json.dumps({"best": best,
                      "rtf": {n: round(60.0 / b, 2)
                              for n, b in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
