"""Same-window interleaved apportioning of the scnet_melconf pair wall.

The scnet_melconf and ensemble benches bottleneck on the scnet+melconf
pair (BENCH_r05 probe: chain wall == pair wall after the device-resident
fusion). This interleaves scnet-only, melconf-only, and pair runs
round-robin in ONE window so relay drift hits all legs equally, and
reports each leg's best wall. Fetches are tiny (first 8 samples) so the
timings measure COMPUTE, not the 42 MB stem transfer the production chain
doesn't pay either.

Run on the chip: python tools/profile_pair.py [rounds]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets up the persistent cache)
from sesa_tpu.runtime import demix_start, upload_mix  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sc_apply, sc_params, sc_spec = bench._scnet_setup()
    mc_apply, mc_params, mc_spec = bench._melconf_setup()
    mix = bench.make_song()

    def sc_only():
        j = demix_start(sc_apply, sc_params, upload_mix(mix), sc_spec,
                        seg_batches=1, transport="device")
        return np.asarray(j.collect_device(stems=[3])[0][..., :8])

    def mc_only():
        j = demix_start(mc_apply, mc_params, upload_mix(mix), mc_spec,
                        seg_batches=1, transport="device")
        return np.asarray(j.collect_device()[0][..., :8])

    def pair():
        mix_dev = upload_mix(mix)
        j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                         seg_batches=1, transport="device")
        j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                         seg_batches=1, transport="device")
        a = j1.collect_device(stems=[3])[0]
        b = j2.collect_device()[0]
        return np.asarray(a[..., :8]) + np.asarray(b[..., :8])

    legs = {"scnet": sc_only, "melconf": mc_only, "pair": pair}
    walls = {k: [] for k in legs}
    for k, fn in legs.items():  # compile pass (outside timing)
        t0 = time.time()
        fn()
        print(f"[pair] compile {k}: {time.time() - t0:.1f}s", flush=True)
    for r in range(rounds):
        for k, fn in legs.items():
            t0 = time.time()
            fn()
            walls[k].append(time.time() - t0)
        print(f"[pair] round {r}: " + " ".join(
            f"{k}={walls[k][-1]:.3f}s" for k in legs), flush=True)
    out = {k: {"best_wall_s": round(min(v), 3), "walls": [round(x, 3) for x in v]}
           for k, v in walls.items()}
    out["sum_minus_pair_s"] = round(
        min(walls["scnet"]) + min(walls["melconf"]) - min(walls["pair"]), 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profile_pair.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
