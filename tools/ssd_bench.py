"""On-chip A/B for the fused Pallas SSD kernel vs the einsum scan.

Shapes mirror bs_mamba2 inference: d_model 128 -> d_inner 512, 8 heads of
64, d_state 128, chunk 64. Parity: BOTH on-chip paths are compared to the
einsum scan evaluated on this host's CPU in f32 (the numerics spec); the
kernel passes if its error does not exceed ~2x the on-chip einsum's own
error (MXU f32 rounding differs from host f32; the decay exponentials
amplify it). Timing: each measurement chains N data-dependent calls
(output feeds the next input, renormalized on device) and ends with a
data fetch, amortizing the ~hundreds-of-ms relay dispatch overhead that
would otherwise swamp the kernel.

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

CHAIN = 16


def bench(bsz, l, h=8, p=64, n=128):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bsz, l, h, p)).astype(np.float32) * 0.5)
    a = jnp.asarray(-np.abs(rng.standard_normal((bsz, l, h))).astype(np.float32) * 0.7)
    b = jnp.asarray(rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3)
    c = jnp.asarray(rng.standard_normal((bsz, l, 1, n)).astype(np.float32) * 0.3)

    # CPU f32 ground truth (einsum path is the numerics spec); the pallas
    # gate keys off the GLOBAL platform, so pin the einsum path via env
    cpu = jax.devices("cpu")[0]
    os.environ["SESA_NO_FUSED"] = "1"
    with jax.default_device(cpu):
        truth = np.asarray(jax.jit(lambda *t: ssd(*t))(
            *(jax.device_put(t, cpu) for t in (x, a, b, c))))
    os.environ.pop("SESA_NO_FUSED", None)

    os.environ["SESA_NO_FUSED"] = "1"  # force the einsum path inside ssd()
    ein_j = jax.jit(lambda x_, a_, b_, c_: ssd(x_, a_, b_, c_))
    ein = np.asarray(ein_j(x, a, b, c))
    os.environ.pop("SESA_NO_FUSED", None)

    pal_j = jax.jit(lambda *t: ssd_pallas(*t))
    pal = np.asarray(pal_j(x, a, b, c))

    scale = float(np.abs(truth).max())
    e_ein = float(np.abs(ein - truth).max())
    e_pal = float(np.abs(pal - truth).max())

    def chain(core):
        # output feeds the next input (renormalized on device so the
        # chain neither explodes nor hits the relay's dispatch cache)
        @jax.jit
        def step(x_):
            y = core(x_, a, b, c)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6) * 0.5

        y = step(x)
        np.asarray(y)  # compile + settle
        t0 = time.time()
        for _ in range(CHAIN):
            y = step(y)
        np.asarray(y)
        return (time.time() - t0) / CHAIN

    os.environ["SESA_NO_FUSED"] = "1"
    t_ein = chain(lambda *t: ssd(*t))
    os.environ.pop("SESA_NO_FUSED", None)
    t_pal = chain(lambda *t: ssd_pallas(*t))

    return {
        "shape": f"B{bsz}xL{l}xH{h}xP{p}xN{n}",
        "einsum_err_vs_cpu": round(e_ein, 5),
        "pallas_err_vs_cpu": round(e_pal, 5),
        "output_scale": round(scale, 3),
        "einsum_ms": round(t_ein * 1e3, 2),
        "pallas_ms": round(t_pal * 1e3, 2),
        "speedup": round(t_ein / t_pal, 2),
        "ok": bool(e_pal <= 2.0 * e_ein + 1e-3 * max(scale, 1.0)),
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
