"""A/B the fused depthwise-conv block kernels (ops/convblock.py) inside
the real melconf + apollo demix programs.

Runs itself twice as subprocesses in ONE relay window — leg "unfused"
sets SESA_NO_FUSED_CONV=1 — so the jitted programs can't cross-contaminate
(the env gate is read at trace time). Each leg times best-of-N
fetch-terminated demix walls for melconf (60 s song) and apollo (the
chain's restoration spec on the same song length).

Run on the chip: python tools/ab_fused_conv.py            (both legs)
                 python tools/ab_fused_conv.py fused      (one leg)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def leg(name):
    import bench  # noqa: E402  (persistent cache config)
    from sesa_tpu.runtime import demix

    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    ap_apply, ap_params, ap_spec = bench._apollo_setup()
    mix = bench.make_song()
    out = {}
    for tag, (fn, p, spec) in {
        "melconf": (mc_apply, mc_params, mc_spec),
        "apollo": (ap_apply, ap_params, ap_spec),
    }.items():
        t0 = time.time()
        r = demix(fn, p, mix, spec, seg_batches=1, transport="int16")
        compile_s = time.time() - t0
        assert np.isfinite(r).all()
        walls = []
        for _ in range(3):
            t0 = time.time()
            r = demix(fn, p, mix, spec, seg_batches=1, transport="int16")
            walls.append(time.time() - t0)
        out[tag] = {"best_wall_s": round(min(walls), 3),
                    "walls": [round(w, 3) for w in walls],
                    "compile_s": round(compile_s, 1)}
        print(f"[ab_fused_conv:{name}] {tag}: {out[tag]}", flush=True)
    print(json.dumps({name: out}))
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] in ("fused", "unfused"):
        if sys.argv[1] == "unfused":
            os.environ["SESA_NO_FUSED_CONV"] = "1"
        leg(sys.argv[1])
        return 0

    results = {}
    for name in ("fused", "unfused"):
        env = dict(os.environ)
        if name == "unfused":
            env["SESA_NO_FUSED_CONV"] = "1"
        proc = subprocess.run([sys.executable, __file__, name], env=env,
                              capture_output=True, text=True, timeout=3600)
        sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            print(line, flush=True)
            try:
                results.update(json.loads(line))
            except (json.JSONDecodeError, ValueError):
                pass
    if len(results) == 2:
        summary = {
            t: round(results["unfused"][t]["best_wall_s"]
                     / results["fused"][t]["best_wall_s"], 3)
            for t in ("melconf", "apollo")
        }
        out = {"results": results, "speedup_fused_over_unfused": summary}
        print(json.dumps(out))
        with open(os.path.join(ROOT, "tools", "ab_fused_conv.json"), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
