"""On-chip fused-kernel parity check: fused Pallas vs unfused XLA paths.

The fused attention/FF kernels are parity-tested in interpret mode on CPU
(tests/test_fused_attention.py); this tool closes the loop on REAL TPU
silicon, where Mosaic lowering, bf16 MXU rounding, and VMEM tiling differ
from the interpreter. It runs the production transformer composition
(roformer_core.transformer_apply) twice per shape — fused (default TPU
dispatch) and unfused (SESA_NO_FUSED=1 kill switch) — in bf16, compares
both against the f32 unfused ground truth, and asserts

  * fused-vs-unfused bf16 max-abs diff is small (same math, two schedules)
  * fused bf16 error vs f32 truth is no worse than ~2x the unfused error

Also times both paths (timings end with a device->host fetch, per the
repo verify recipe). Writes TPU_PARITY.json at the repo root and prints
one JSON line. Run: python tools/tpu_parity.py   (needs the real chip;
exits 2 if only CPU is available).
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


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def check_transformer(results, seq, dim=512, heads=8, dim_head=64, batch=8):
    """Flagship-shaped single transformer layer, fused vs unfused."""
    from sesa_tpu.models import roformer_core as core
    from sesa_tpu.ops.rope import default_freqs, rope_tables

    name = f"transformer_seq{seq}" if dim == 512 else \
        f"transformer_seq{seq}_d{dim}"
    params = core.transformer_init(jax.random.PRNGKey(seq), dim, 1, heads,
                                   dim_head)
    rope = rope_tables(jnp.asarray(default_freqs(dim_head)), seq)
    x = (0.5 * jax.random.normal(jax.random.PRNGKey(1), (batch, seq, dim),
                                 dtype=jnp.float32))

    def run(dtype, no_fused):
        os.environ.pop("SESA_NO_FUSED", None)
        if no_fused:
            os.environ["SESA_NO_FUSED"] = "1"
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        r = tuple(t.astype(dtype) for t in rope)

        # a fresh closure per variant: the env var is read at TRACE time,
        # so cached jit executables must not be shared across toggles
        def fwd(p_, x_):
            return core.transformer_apply(p_, x_, heads, rope=r)

        fn = jax.jit(fwd)
        out = _fetch(fn(p, x.astype(dtype)))  # compile + correctness run
        times = []
        for _ in range(5):
            t0 = time.time()
            o = fn(p, x.astype(dtype))
            np.asarray(o)  # timing must end with a data fetch
            times.append(time.time() - t0)
        os.environ.pop("SESA_NO_FUSED", None)
        return out.astype(np.float32), min(times)

    truth, _ = run(jnp.float32, no_fused=True)
    fused, t_fused = run(jnp.bfloat16, no_fused=False)
    unfused, t_unfused = run(jnp.bfloat16, no_fused=True)

    scale = float(np.abs(truth).max())
    d_cross = float(np.abs(fused - unfused).max())
    e_fused = float(np.abs(fused - truth).max())
    e_unfused = float(np.abs(unfused - truth).max())
    results[name] = {
        "fused_vs_unfused_maxabs": round(d_cross, 5),
        "fused_vs_f32_maxabs": round(e_fused, 5),
        "unfused_vs_f32_maxabs": round(e_unfused, 5),
        "output_scale": round(scale, 3),
        "fused_ms": round(t_fused * 1e3, 3),
        "unfused_ms": round(t_unfused * 1e3, 3),
        "ok": bool(d_cross < 0.1 * max(scale, 1.0)
                   and e_fused < 2.0 * e_unfused + 0.02 * scale),
    }


def check_ff(results, tokens=4096, dim=512, mult=4):
    from sesa_tpu.models.layers import rms_norm
    from sesa_tpu.ops.ff import fused_ff_residual

    name = f"ff_tokens{tokens}" if dim == 512 else f"ff_tokens{tokens}_d{dim}"
    rng = np.random.default_rng(0)
    x = rng.standard_normal((tokens, dim)).astype(np.float32) * 0.5
    gamma = rng.standard_normal(dim).astype(np.float32) * 0.1 + 1
    w1 = rng.standard_normal((dim * mult, dim)).astype(np.float32) * 0.05
    b1 = rng.standard_normal(dim * mult).astype(np.float32) * 0.05
    w2 = rng.standard_normal((dim, dim * mult)).astype(np.float32) * 0.05
    b2 = rng.standard_normal(dim).astype(np.float32) * 0.05

    def unfused(x_, gamma_, w1_, b1_, w2_, b2_):
        h = rms_norm(x_, gamma_) @ w1_.T + b1_
        h = jax.nn.gelu(h, approximate=True)
        return h @ w2_.T + b2_ + x_

    args32 = (x, gamma, w1, b1, w2, b2)
    truth = _fetch(jax.jit(unfused)(*map(jnp.asarray, args32)))
    args16 = [jnp.asarray(a, dtype=jnp.bfloat16) for a in args32]
    fused = _fetch(jax.jit(fused_ff_residual)(*args16)).astype(np.float32)
    unf16 = _fetch(jax.jit(unfused)(*args16)).astype(np.float32)

    scale = float(np.abs(truth).max())
    d_cross = float(np.abs(fused - unf16).max())
    e_fused = float(np.abs(fused - truth).max())
    e_unf = float(np.abs(unf16 - truth).max())
    results[name] = {
        "fused_vs_unfused_maxabs": round(d_cross, 5),
        "fused_vs_f32_maxabs": round(e_fused, 5),
        "unfused_vs_f32_maxabs": round(e_unf, 5),
        "output_scale": round(scale, 3),
        "ok": bool(d_cross < 0.1 * max(scale, 1.0)
                   and e_fused < 2.0 * e_unf + 0.02 * scale),
    }


def check_conformer_attention(results, batch, seq, dim=384, heads=8,
                              dim_head=64):
    """Fused Pallas conformer attention (the melconf serving path) vs the
    unfused XLA composition, bf16, against f32 unfused truth."""
    from sesa_tpu.models import conformer_core as cc
    from sesa_tpu.ops.attention import fused_conformer_attention

    name = f"conformer_attn_b{batch}_s{seq}_d{dim}"
    rng = np.random.default_rng(seq)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    p = {"norm": {"weight": 1.0 + 0.1 * r(dim), "bias": r(dim)},
         "to_q": {"weight": r(heads * dim_head, dim)},
         "to_kv": {"weight": r(2 * heads * dim_head, dim)},
         "to_out": {"weight": r(dim, heads * dim_head), "bias": r(dim)},
         "rel_pos_emb": r(2 * 512 + 1, dim_head)}
    x = jnp.asarray(rng.standard_normal((batch, seq, dim)).astype(np.float32)
                    * 0.3)

    def unfused(dtype):
        pd = jax.tree.map(lambda a: a.astype(dtype), p)
        fn = jax.jit(lambda v: cc._attn_apply(pd, v, heads, None) + v)
        return _fetch(fn(x.astype(dtype))).astype(np.float32)

    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    wqkv = jnp.concatenate([p16["to_q"]["weight"], p16["to_kv"]["weight"]],
                           axis=0)
    fn = jax.jit(lambda v: fused_conformer_attention(
        v, p16["norm"]["weight"], p16["norm"]["bias"], wqkv,
        p16["rel_pos_emb"], p16["to_out"]["weight"], p16["to_out"]["bias"],
        heads))
    fused = _fetch(fn(x.astype(jnp.bfloat16))).astype(np.float32)
    truth = unfused(jnp.float32)
    unf16 = unfused(jnp.bfloat16)

    scale = float(np.abs(truth).max())
    d_cross = float(np.abs(fused - unf16).max())
    e_fused = float(np.abs(fused - truth).max())
    e_unf = float(np.abs(unf16 - truth).max())
    results[name] = {
        "fused_vs_unfused_maxabs": round(d_cross, 5),
        "fused_vs_f32_maxabs": round(e_fused, 5),
        "unfused_vs_f32_maxabs": round(e_unf, 5),
        "output_scale": round(scale, 3),
        "ok": bool(d_cross < 0.1 * max(scale, 1.0)
                   and e_fused < 2.0 * e_unf + 0.02 * scale),
    }


def check_conv_block(results, kind, batch, seq, dim, kernel):
    """Fused depthwise-conv block kernels (ops/convblock.py) vs the
    unfused conv/einsum compositions, bf16, against f32 unfused truth."""
    from sesa_tpu.models import apollo as ap
    from sesa_tpu.models import conformer_core as cc
    from sesa_tpu.ops.convblock import fused_apollo_conv, fused_conformer_conv

    name = f"{kind}_conv_b{batch}_s{seq}_d{dim}"
    rng = np.random.default_rng(seq + dim)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    if kind == "conformer":
        e = dim * 2
        p = {"norm": {"weight": 1.0 + 0.1 * r(dim), "bias": r(dim)},
             "pw1": {"weight": r(2 * e, dim, 1), "bias": r(2 * e)},
             "dw": {"weight": r(e, 1, kernel), "bias": r(e)},
             "bn": {"weight": 1.0 + 0.1 * r(e), "bias": r(e),
                    "running_mean": 0.1 * r(e),
                    "running_var": jnp.abs(1.0 + 0.2 * r(e))},
             "pw2": {"weight": r(dim, e, 1), "bias": r(dim)}}
        unfused_fn = lambda pd, v: cc._conv_apply(pd, v, None) + v
        fused_fn = fused_conformer_conv
    else:
        p = {"dw_w": r(dim, 1, kernel), "dw_b": r(dim),
             "norm": 1.0 + 0.1 * r(dim),
             "pw1_w": r(4 * dim, dim), "pw1_b": r(4 * dim),
             "pw2_w": r(dim, 4 * dim), "pw2_b": r(dim)}
        unfused_fn = lambda pd, v: ap._conv_act_norm_apply(
            pd, v, kernel=kernel, precision=None)
        fused_fn = fused_apollo_conv

    x = jnp.asarray(rng.standard_normal((batch, seq, dim)).astype(np.float32)
                    * 0.3)

    def unfused(dtype):
        pd = jax.tree.map(lambda a: a.astype(dtype), p)
        fn = jax.jit(lambda v: unfused_fn(pd, v))
        return _fetch(fn(x.astype(dtype))).astype(np.float32)

    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    fn = jax.jit(lambda v: fused_fn(v, p16))
    fused = _fetch(fn(x.astype(jnp.bfloat16))).astype(np.float32)
    truth = unfused(jnp.float32)
    unf16 = unfused(jnp.bfloat16)

    scale = float(np.abs(truth).max())
    d_cross = float(np.abs(fused - unf16).max())
    e_fused = float(np.abs(fused - truth).max())
    e_unf = float(np.abs(unf16 - truth).max())
    results[name] = {
        "fused_vs_unfused_maxabs": round(d_cross, 5),
        "fused_vs_f32_maxabs": round(e_fused, 5),
        "unfused_vs_f32_maxabs": round(e_unf, 5),
        "output_scale": round(scale, 3),
        "ok": bool(d_cross < 0.1 * max(scale, 1.0)
                   and e_fused < 2.0 * e_unf + 0.02 * scale),
    }


def main():
    if jax.devices()[0].platform == "cpu":
        print(json.dumps({"error": "no TPU visible; run on the chip"}))
        return 2
    results = {}
    # flagship shapes: time transformer seq = 352800/512 hop ~ 690 frames,
    # freq transformer seq = 62 bands
    check_transformer(results, seq=690)
    check_transformer(results, seq=62, batch=64)
    # mel family (83/121 registry entries): dim 384, 60 mel bands
    check_transformer(results, seq=690, dim=384)
    check_transformer(results, seq=60, dim=384, batch=64)
    # apollo band-axis shape: 80 bands at dim 256
    check_transformer(results, seq=80, dim=256, batch=32)
    check_ff(results)
    check_ff(results, dim=384)
    # melconf fused conformer attention at its serving shapes (time/freq)
    check_conformer_attention(results, batch=48, seq=690)
    check_conformer_attention(results, batch=512, seq=60)
    # fused depthwise-conv blocks at their serving shapes (batches scaled
    # down ~8x to keep the f32-truth legs inside the probe budget)
    check_conv_block(results, "conformer", batch=48, seq=690, dim=384,
                     kernel=31)
    check_conv_block(results, "conformer", batch=512, seq=60, dim=384,
                     kernel=31)
    check_conv_block(results, "apollo", batch=40, seq=1901, dim=256,
                     kernel=7)
    path = os.path.join(ROOT, "TPU_PARITY.json")
    out = {}
    if os.path.exists(path):  # preserve sections other tools merged in
        with open(path) as f:
            out = json.load(f)
    out.update(
        device=str(jax.devices()[0]),
        checks=results,
        ok=all(r["ok"] for r in results.values()),
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
