"""On-chip A/B for the fused Pallas SSD kernel vs the einsum scan.

Shapes mirror bs_mamba2 inference: d_model 128 -> d_inner 512, 8 heads of
64, d_state 128, chunk 64, over the band-time sequence lengths the
separator actually sees. Parity is checked against the f32 einsum path;
timings end with a device->host data fetch (verify-skill protocol).

Writes SSD_BENCH.json at the repo root and prints one JSON line.
Run on the real chip: python tools/ssd_bench.py
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from sesa_tpu.ops.ssd import ssd, ssd_pallas


def bench(bsz, l, h=8, p=64, n=128, runs=5):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bsz, l, h, p)).astype(np.float32) * 0.5)
    a = jnp.asarray(-np.abs(rng.standard_normal((bsz, l, h))).astype(np.float32) * 0.7)
    b = jnp.asarray(rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3)
    c = jnp.asarray(rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3)

    os.environ["SESA_NO_FUSED"] = "1"  # force the einsum path inside ssd()

    def einsum_fn(x_, a_, b_, c_):
        return ssd(x_, a_, b_, c_)

    ref_j = jax.jit(einsum_fn)
    ref = np.asarray(ref_j(x, a, b, c))
    os.environ.pop("SESA_NO_FUSED", None)

    pal_j = jax.jit(lambda *t: ssd_pallas(*t))
    got = np.asarray(pal_j(x, a, b, c))

    scale = float(np.abs(ref).max())
    diff = float(np.abs(got - ref).max())

    def clock(fn):
        times = []
        for _ in range(runs):
            t0 = time.time()
            out = fn(x, a, b, c)
            np.asarray(out)  # timings must end with a data fetch
            times.append(time.time() - t0)
        return min(times)

    t_ein = clock(ref_j)
    t_pal = clock(pal_j)
    return {
        "shape": f"B{bsz}xL{l}xH{h}xP{p}xN{n}",
        "maxabs_diff": round(diff, 6),
        "output_scale": round(scale, 3),
        "einsum_ms": round(t_ein * 1e3, 2),
        "pallas_ms": round(t_pal * 1e3, 2),
        "speedup": round(t_ein / t_pal, 2),
        "ok": bool(diff < 1e-3 * max(scale, 1.0)),
    }


def main():
    if jax.devices()[0].platform == "cpu":
        print(json.dumps({"error": "no TPU visible; run on the chip"}))
        return 2
    results = [
        # bs_mamba2 band-net over time frames: B = batch*channels, L = frames
        bench(bsz=4, l=1408),
        # band-mixing direction: many short sequences
        bench(bsz=64, l=128),
    ]
    out = {"device": str(jax.devices()[0]), "runs": results,
           "ok": all(r["ok"] for r in results)}
    with open(os.path.join(ROOT, "SSD_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
