"""Quantify the opt-in int8 attention (SESA_INT8_ATTN) end to end.

The SageAttention-analog ``sdpa_int8`` path has per-tensor parity tests
(tests/test_int8_attention.py) but until now no whole-separation quality
or speed number. This tool runs the FULL flagship bs_roformer separation
(bench.py shapes: viperx vocals arch, 60 s song, chunked overlap-add
demix) three ways on the real chip —

  f32    unfused, HIGHEST precision  (ground truth)
  bf16   production default (fused Pallas attention)
  int8   bf16 + SESA_INT8_ATTN=1 (int8 QK^T, f32 softmax/PV)

— and records output SNR of bf16 and int8 against the f32 truth, the
SNR delta between them (the quality cost of int8), and the RTF of each
(the speed benefit, if any). Results extend TPU_PARITY.json under an
``int8_attention`` key, mirroring the reference's SageAttention toggle
(reference inference.py:77-78 use_sage_attention) which shipped with
community listening tests but no recorded numbers either.

Run: python tools/int8_eval.py   (needs the real chip; exits 2 on CPU).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
from ml_collections import ConfigDict

SR = 44100
SONG_SECONDS = 60


def make_song(seconds=SONG_SECONDS, seed=0, gain=0.3):
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * SR) / SR
    song = (gain * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.standard_normal(seconds * SR)).astype(np.float32)
    mix = np.stack([song, 0.9 * song])
    return np.clip(np.round(mix * 32768), -32768, 32767).astype(np.float32) / 32768


def snr_db(ref, est):
    num = float(np.sum(ref.astype(np.float64) ** 2))
    den = float(np.sum((ref.astype(np.float64) - est.astype(np.float64)) ** 2))
    return 10.0 * np.log10(num / max(den, 1e-30))


def main():
    if jax.devices()[0].platform == "cpu":
        print("needs the real TPU chip", file=sys.stderr)
        return 2

    from sesa_tpu.models import bs_roformer
    from sesa_tpu.runtime import demix

    import bench

    # the bench's exact flagship shape (single source of truth); only the
    # compute dtype / int8 flag vary per run below
    _, params, spec = bench._flagship_setup()
    config = ConfigDict({"model": dict(
        dim=512, depth=12, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=2,
    )})
    mix = make_song()

    def run_variant(name, dtype, int8):
        # env vars are read at TRACE time; a fresh closure per variant
        # keeps the demix jit cache (keyed on the apply object) honest
        os.environ.pop("SESA_INT8_ATTN", None)
        if int8:
            os.environ["SESA_INT8_ATTN"] = "1"

        def apply_fn(p, chunks):
            return bs_roformer.apply(p, config, chunks, compute_dtype=dtype)

        t0 = time.time()
        out = demix(apply_fn, params, mix, spec, seg_batches=1)
        compile_s = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = demix(apply_fn, params, mix, spec, seg_batches=1)
            walls.append(time.time() - t0)
        os.environ.pop("SESA_INT8_ATTN", None)
        assert np.isfinite(out).all(), name
        return out, min(walls), compile_s

    out_f32, wall_f32, c_f32 = run_variant("f32", jnp.float32, False)
    out_bf16, wall_bf16, c_bf16 = run_variant("bf16", jnp.bfloat16, False)
    out_int8, wall_int8, c_int8 = run_variant("int8", jnp.bfloat16, True)

    snr_bf16 = snr_db(out_f32, out_bf16)
    snr_int8 = snr_db(out_f32, out_int8)
    entry = {
        "song_seconds": SONG_SECONDS,
        "snr_bf16_vs_f32_db": round(snr_bf16, 2),
        "snr_int8_vs_f32_db": round(snr_int8, 2),
        "snr_delta_db": round(snr_bf16 - snr_int8, 2),
        "snr_int8_vs_bf16_db": round(snr_db(out_bf16, out_int8), 2),
        "rtf_f32": round(SONG_SECONDS / wall_f32, 2),
        "rtf_bf16": round(SONG_SECONDS / wall_bf16, 2),
        "rtf_int8": round(SONG_SECONDS / wall_int8, 2),
        "rtf_gain_int8_vs_bf16": round(wall_bf16 / wall_int8, 3),
        "compile_s": {"f32": round(c_f32, 1), "bf16": round(c_bf16, 1),
                      "int8": round(c_int8, 1)},
        # the int8 path trades the fused Pallas kernel for unfused XLA +
        # quantized QK^T; "worth it" means rtf_gain > 1 at tolerable SNR
        "verdict": ("win" if wall_int8 < wall_bf16 and snr_int8 > 30.0
                    else "not_worth_default"),
    }

    path = os.path.join(ROOT, "TPU_PARITY.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {"device": str(jax.devices()[0]), "checks": {}, "ok": True}
    doc["int8_attention"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"int8_attention": entry}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
