"""A/B the cheap chain-perf knobs in one relay session, one subprocess per
variant (env/spec knobs are read at trace time, so each variant needs a
fresh process to avoid jit-cache cross-contamination):

  base       current defaults (fused conv, scan): melconf b6, apollo b2
  mc_b9      melconf batch 9 -> 2 segment dispatches instead of 3
  ap_b4      apollo batch 4 -> 2 dispatches instead of 4
  ff2048     SESA_FUSED_FF_TILE=2048 (fused FF slab doubled)
  slab2048   SESA_FUSED_SLAB=2048 (attention kernels pack 2 seqs/program
             at the 704-frame time leg)
  base2      base re-run LAST to bracket relay-window drift

Each leg times fetch-light (first-8-samples) device-transport demix walls
for melconf and apollo — the quantities the chain bench pays.

Run on the chip: python tools/ab_perf_knobs.py              (default legs)
                 python tools/ab_perf_knobs.py leg1 leg2    (chosen legs,
                     each still in its own subprocess; extra legs: ap_b6,
                     mc9_ap4, shortattn)
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LEGS = {
    "base": {},
    "mc_b9": {"SESA_AB_MC_BATCH": "9"},
    "ap_b4": {"SESA_AB_AP_BATCH": "4"},
    "ff2048": {"SESA_FUSED_FF_TILE": "2048"},
    "slab2048": {"SESA_FUSED_SLAB": "2048"},
    "base2": {},
    # extra legs, run by name only (not part of the default list):
    # apollo batch 6 = the 60 s song's 6 chunks in ONE dispatch
    "ap_b6": {"SESA_AB_AP_BATCH": "6"},
    # the combined candidate chain config
    "mc9_ap4": {"SESA_AB_MC_BATCH": "9", "SESA_AB_AP_BATCH": "4"},
    # short-seq attention hybrid: freq-leg (60 bands) attention runs
    # unfused (whole-tensor qkv GEMM + einsum) inside the fused block
    "shortattn": {"SESA_CONF_SHORTSEQ_ATTN": "128"},
    # same hybrid for the roformer freq leg (62 bands) — flagship config;
    # rofo_base is the matching control (threshold 1 never matches but
    # still routes the leg harness to the flagship model)
    "rofo_shortattn": {"SESA_ROFO_SHORTSEQ_ATTN": "128"},
    "rofo_base": {"SESA_ROFO_SHORTSEQ_ATTN": "-1"},
}

DEFAULT_LEGS = ["base", "mc_b9", "ap_b4", "ff2048", "slab2048", "base2"]


def leg(name):
    import bench
    from sesa_tpu.runtime import demix_start, upload_mix

    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    ap_apply, ap_params, ap_spec = bench._apollo_setup()
    if os.environ.get("SESA_AB_MC_BATCH"):
        mc_spec = dataclasses.replace(
            mc_spec, batch_size=int(os.environ["SESA_AB_MC_BATCH"]))
    if os.environ.get("SESA_AB_AP_BATCH"):
        ap_spec = dataclasses.replace(
            ap_spec, batch_size=int(os.environ["SESA_AB_AP_BATCH"]))
    mix = bench.make_song()
    models = {
        "melconf": (mc_apply, mc_params, mc_spec),
        "apollo": (ap_apply, ap_params, ap_spec),
    }
    if os.environ.get("SESA_ROFO_SHORTSEQ_ATTN"):
        # the roformer knob needs a flagship timing, not melconf/apollo
        fs_apply, fs_params, fs_spec = bench._flagship_setup()
        models = {"flagship": (fs_apply, fs_params, fs_spec)}
    out = {}
    for tag, (fn, p, spec) in models.items():
        def run():
            j = demix_start(fn, p, upload_mix(mix), spec, seg_batches=1,
                            transport="device")
            return np.asarray(j.collect_device()[0][..., :8])

        t0 = time.time()
        r = run()
        compile_s = time.time() - t0
        assert np.isfinite(r).all()
        walls = []
        for _ in range(3):
            t0 = time.time()
            run()
            walls.append(time.time() - t0)
        out[tag] = {"best_wall_s": round(min(walls), 3),
                    "walls": [round(w, 3) for w in walls],
                    "compile_s": round(compile_s, 1)}
        print(f"[ab_knobs:{name}] {tag}: {out[tag]}", flush=True)
    print(json.dumps({name: out}))
    return out


def main():
    # child mode: --leg <name> runs one variant in THIS process
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        os.environ.update(LEGS[sys.argv[2]])
        leg(sys.argv[2])
        return 0

    legs = sys.argv[1:] or DEFAULT_LEGS
    results = {}
    for name in legs:
        env = dict(os.environ)
        env.update(LEGS[name])
        try:
            proc = subprocess.run([sys.executable, __file__, "--leg", name],
                                  env=env, capture_output=True, text=True,
                                  timeout=2400)
        except subprocess.TimeoutExpired:
            # relay outage window: record the miss, keep sweeping
            print(json.dumps({name: "timeout"}), flush=True)
            results[name] = "timeout"
            continue
        sys.stderr.write(proc.stderr[-1500:])
        for line in proc.stdout.splitlines():
            print(line, flush=True)
            try:
                results.update(json.loads(line))
            except (json.JSONDecodeError, ValueError):
                pass
        with open(os.path.join(ROOT, "tools", "ab_perf_knobs.json"), "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
