"""Sweep demix batch sizes for the ensemble-chain models on the real chip.

The SCNet dual-path BiLSTM is latency-bound: its cost is (sequential scan
steps) x (batch invocations), so packing the whole 17-chunk song into ONE
batch (batch_size 17) runs a third of the sequential chains of the shipped
batch 6 while only widening the per-step GEMM lanes (which the MXU absorbs).
This sweep measures scnet / mel-band conformer / Apollo demix walls across
batch sizes, checks output parity vs the batch-6 reference (batch size only
moves the documented first/last-window endpoints), and times the full
device-resident chain at the best combo.

Usage (TPU, backgrounded):  python tools/chain_sweep.py [out.json]
Subset:                     SESA_SWEEP_ONLY=scnet,apollo python tools/chain_sweep.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (shares the exact benched model setups)
import jax.numpy as jnp  # noqa: E402

from sesa_tpu.postprocess.ensemble import ensemble_waveforms_device  # noqa: E402
from sesa_tpu.postprocess.phase_fixer import phase_fix_arrays  # noqa: E402
from sesa_tpu.runtime import demix, demix_start, upload_mix  # noqa: E402

RESULTS = {}
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "chain_sweep.json")


def _flush():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS), flush=True)


def _snr_db(ref, got):
    num = float(np.sum(ref ** 2))
    den = float(np.sum((ref - got) ** 2)) + 1e-20
    return round(10 * np.log1p(num / den) / np.log(10), 1)


def time_device_demix(apply_fn, params, mix_dev, spec, runs=3):
    """Wall of a device-collected demix, fetch-terminated via a scalar sum
    (the relay requires timings to end in a data fetch)."""
    def once():
        j = demix_start(apply_fn, params, mix_dev, spec, seg_batches=1,
                        transport="device")
        out = j.collect_device()
        return float(jnp.sum(out)), out

    t0 = time.time()
    _, out = once()
    compile_s = time.time() - t0
    walls = []
    for _ in range(runs):
        t0 = time.time()
        once()
        walls.append(time.time() - t0)
    return min(walls), compile_s, np.asarray(out)


def sweep_model(name, setup, batches, runs=3):
    apply_fn, params, spec0 = setup()
    mix_dev = upload_mix(bench.make_song())
    ref = None
    for b in batches:
        spec = dataclasses.replace(spec0, batch_size=b)
        try:
            best, compile_s, out = time_device_demix(
                apply_fn, params, mix_dev, spec, runs)
        except Exception as e:
            RESULTS[f"{name}_b{b}"] = {"error": repr(e)[:200]}
            _flush()
            continue
        row = {"best_s": round(best, 3), "rtf": round(60.0 / best, 2),
               "compile_s": round(compile_s, 1)}
        if ref is None:
            ref = out
        else:
            row["snr_vs_b%d_db" % batches[0]] = _snr_db(ref, out)
        RESULTS[f"{name}_b{b}"] = row
        _flush()


def sweep_chain(sc_b, mc_b, ap_b, runs=3, mc_first=False):
    from sesa_tpu.postprocess.phase_fixer import ensemble_phase_fix_device

    sc_apply, sc_params, sc_spec = bench._scnet_setup()
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    ap_apply, ap_params, ap_spec = bench._apollo_setup()
    sc_spec = dataclasses.replace(sc_spec, batch_size=sc_b)
    mc_spec = dataclasses.replace(mc_spec, batch_size=mc_b)
    ap_spec = dataclasses.replace(ap_spec, batch_size=ap_b)
    mix = bench.make_song()

    def run():
        mix_dev = upload_mix(mix)
        if mc_first:
            j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                             seg_batches=1, transport="device")
            j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                             seg_batches=1, transport="device")
        else:
            j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                             seg_batches=1, transport="device")
            j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                             seg_batches=1, transport="device")
        fixed = ensemble_phase_fix_device(
            mix_dev, [j1.collect_device(stems=[3])[0],
                      j2.collect_device()[0]], bench.SR, method="avg_wave")
        restored = demix(ap_apply, ap_params, fixed, ap_spec,
                         seg_batches=1, transport="int16")
        return np.asarray(restored)

    t0 = time.time()
    out = run()
    compile_s = time.time() - t0
    assert np.isfinite(out).all()
    walls = []
    for _ in range(runs):
        t0 = time.time()
        run()
        walls.append(time.time() - t0)
    best = min(walls)
    key = f"chain_sc{sc_b}_mc{mc_b}_ap{ap_b}" + ("_mcfirst" if mc_first else "")
    RESULTS[key] = {
        "best_s": round(best, 3), "rtf": round(60.0 / best, 2),
        "compile_s": round(compile_s, 1), "walls": [round(w, 3) for w in walls]}
    _flush()


def main():
    only = [s for s in os.environ.get("SESA_SWEEP_ONLY", "").split(",") if s]

    def want(n):
        return not only or n in only

    if want("scnet"):
        # 17 chunks/song: b6 = 3 invocations, b9 = 2, b17 = 1
        sweep_model("scnet", bench._scnet_setup, [6, 9, 17])
    if want("melconf"):
        sweep_model("melconf", bench._melconf_setup, [6, 17])
    if want("apollo"):
        # 9 chunks/song: b2 = 5 invocations (1 padded), b3 = 3, b9 = 1
        sweep_model("apollo", bench._apollo_setup, [2, 3, 9])
    if want("chain"):
        best = {}
        for fam, batches in (("scnet", [6, 9, 17]), ("melconf", [6, 17]),
                             ("apollo", [2, 3, 9])):
            rows = {b: RESULTS.get(f"{fam}_b{b}", {}).get("best_s")
                    for b in batches}
            rows = {b: w for b, w in rows.items() if w}
            best[fam] = min(rows, key=rows.get) if rows else batches[0]
        sweep_chain(best.get("scnet", 6), best.get("melconf", 6),
                    best.get("apollo", 2))
        # dispatch-order A/B: the long melconf job first overlaps scnet's
        # host-side prep + fetch under melconf compute
        sweep_chain(best.get("scnet", 6), best.get("melconf", 6),
                    best.get("apollo", 2), mc_first=True)
    _flush()


if __name__ == "__main__":
    main()
