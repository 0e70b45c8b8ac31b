"""Sweep SESA_ROFORMER_SCAN_UNROLL on the real chip (VERDICT r2 item 1).

For each setting, runs the flagship bench config in a fresh subprocess
(compile is per-process state) and records best wall + compile seconds.
Setting 0 = fully unrolled python loop over depth (round 1's program);
N >= 1 = lax.scan over stacked per-depth params with N-way body unroll.

Writes tools/unroll_sweep.json.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(unroll, runs=5):
    env = dict(os.environ)
    env["SESA_ROFORMER_SCAN_UNROLL"] = str(unroll)
    env["SESA_BENCH_ONLY"] = "flagship"
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env, timeout=1800)
    line = None
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = json.loads(ln)
    if line is None:
        return {"unroll": unroll, "error": (p.stderr or p.stdout)[-400:]}
    d = line.get("detail", {})
    return {"unroll": unroll, "rtf": line.get("value"),
            "best_wall_s": d.get("best_wall_s"), "compile_s": d.get("compile_s")}


def main():
    settings = [int(s) for s in
                os.environ.get("SESA_SWEEP", "0,1,2,3,4,6,12").split(",")]
    results = []
    for u in settings:
        r = run_one(u)
        results.append(r)
        print(json.dumps(r), flush=True)
        with open(os.path.join(HERE, "unroll_sweep.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
