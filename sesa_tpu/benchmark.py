"""Benchmark CLI: time and cross-check compute modes on a model.

Functional parity with reference benchmark_pytorch.py:44-252: the
``benchmark`` subcommand times each mode over N iterations with warmup and
device sync and prints speedups + a recommendation; the ``test`` subcommand
runs the same dummy input through all modes and checks max-abs agreement
(the reference's only numerical regression harness, tolerance 1e-3).

Modes here are the TPU-relevant axes: float32 (HIGHEST precision) vs
bfloat16 compute, i.e. the analog of the reference's default/AMP modes
(channels_last/torch.compile have no TPU equivalent — everything is
always jit-compiled).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _build(model_type, config_path, ckpt, chunk_size, batch_size, compute_dtype):
    import jax
    import jax.numpy as jnp

    from sesa_tpu.runtime.session import InferenceSession

    session = InferenceSession.create(
        model_type, config_path, ckpt or "",
        chunk_size=chunk_size or None, batch_size=batch_size or None,
        compute_dtype={"bf16": jnp.bfloat16, "f32": None}[compute_dtype],
    )
    apply_fn = session._model_apply()
    fn = jax.jit(lambda p, c: apply_fn(p, c))
    return session, fn


def run_mode(model_type, config_path, ckpt, mode, iters=10, chunk_size=None,
             batch_size=2):
    import jax.numpy as jnp

    session, fn = _build(model_type, config_path, ckpt, chunk_size, batch_size, mode)
    chunk = session.spec.chunk_size
    ch = session.spec.num_channels
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch_size, ch, chunk)),
        jnp.float32) * 0.1

    # Timing protocol: on this backend block_until_ready does not reliably
    # await remote execution and identical dispatches can be served from a
    # relay cache — every timed region ends with a data FETCH and the
    # iteration loop is data-dependent (see .claude/skills/verify).
    t0 = time.time()
    out = fn(session.params, x)
    float(jnp.abs(out).sum())
    compile_s = time.time() - t0

    # warmup
    for _ in range(2):
        out = fn(session.params, x)
    float(jnp.abs(out).sum())
    # perturb x BEFORE the timed loop: its first dispatch must differ from
    # the warmup dispatches or the relay can replay it for free
    x = x + out[:, 0] * 1e-6

    t0 = time.time()
    for _ in range(iters):
        out = fn(session.params, x)
        x = x + out[:, 0] * 1e-6  # chain iterations so none can be replayed
    float(jnp.abs(out).sum())
    ms = (time.time() - t0) / iters * 1000
    audio_s = batch_size * chunk / float(session.sample_rate)
    return {"mode": mode, "ms_per_iter": ms, "compile_s": compile_s,
            "rtf": audio_s / (ms / 1000), "output": np.asarray(out)}


def benchmark(args) -> int:
    results = []
    for mode in args.modes:
        print(f"Benchmarking mode: {mode} ...", flush=True)
        r = run_mode(args.model_type, args.config_path, args.start_check_point,
                     mode, args.iterations, args.chunk_size, args.batch_size)
        print(f"  {mode}: {r['ms_per_iter']:.1f} ms/iter "
              f"(RTF {r['rtf']:.1f}x, compile {r['compile_s']:.1f}s)")
        results.append(r)

    base = results[0]
    print("\nResults:")
    for r in results:
        speedup = base["ms_per_iter"] / r["ms_per_iter"]
        print(f"  {r['mode']:>6}: {r['ms_per_iter']:8.1f} ms/iter  "
              f"speedup x{speedup:.2f}  RTF {r['rtf']:.1f}x")
    best = min(results, key=lambda r: r["ms_per_iter"])
    print(f"\nRecommendation: use --compute_dtype {best['mode']} "
          f"({best['rtf']:.1f}x realtime on this chip)")
    return 0


def test_modes(args) -> int:
    """Cross-mode output equivalence (reference benchmark_pytorch.py:156-242)."""
    outputs = {}
    for mode in args.modes:
        r = run_mode(args.model_type, args.config_path, args.start_check_point,
                     mode, iters=1, chunk_size=args.chunk_size,
                     batch_size=args.batch_size)
        outputs[mode] = r["output"]
        print(f"  {mode}: output shape {r['output'].shape}")

    ref_mode = args.modes[0]
    ok = True
    for mode, out in outputs.items():
        if mode == ref_mode:
            continue
        diff = float(np.abs(out - outputs[ref_mode]).max())
        status = "OK" if diff < args.tolerance else "MISMATCH"
        if diff >= args.tolerance:
            ok = False
        print(f"  {ref_mode} vs {mode}: max abs diff {diff:.2e} [{status}]")
    print("All modes within tolerance" if ok else "Modes differ beyond tolerance!")
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Benchmark separation compute modes")
    p.add_argument("command", choices=["benchmark", "test"])
    p.add_argument("--model_type", default="bs_roformer")
    p.add_argument("--config_path", required=True)
    p.add_argument("--start_check_point", default="")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--chunk_size", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--modes", nargs="+", default=["f32", "bf16"],
                   choices=["f32", "bf16"])
    p.add_argument("--tolerance", type=float, default=1e-1,
                   help="bf16 vs f32 cross-check tolerance")
    args = p.parse_args(argv)
    return benchmark(args) if args.command == "benchmark" else test_modes(args)


if __name__ == "__main__":
    sys.exit(main())
