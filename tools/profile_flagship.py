"""Flagship (bs_roformer vocals) per-component breakdown on the real chip.

Times each piece at production shapes (batch 17 chunks of 8 s) and prints
ms + achieved TFLOP/s so the underperforming stage is obvious:

  demix          full engine pass (the bench number)
  forward        one 17-chunk model forward (demix overhead = demix - fwd)
  stack          the 12-layer transformer depth loop alone
  time_layer     one time transformer layer   (1054 seqs x 690 x 512)
  freq_layer     one freq transformer layer   (11730 seqs x 62 x 512)
  attn_time      fused attention block, time shape
  attn_freq      fused attention block, freq shape
  ff             fused FF at (1054*690, 512)
  stft_mask      stft + band split + mask estimator + istft (no layers)
"""

import os
import sys
import time

import numpy as np

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import bs_roformer
from sesa_tpu.models import roformer_core as core
from sesa_tpu.ops.rope import rope_tables

CFG = ConfigDict({"model": dict(
    dim=512, depth=12, stereo=True, num_stems=1,
    time_transformer_depth=1, freq_transformer_depth=1,
    dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
    stft_win_length=2048, mask_estimator_depth=2,
)})
B, CH, T = 17, 2, 352800
DIM, DEPTH, HEADS = 512, 12, 8
TF = T // 512 + 1   # 690 frames
NB = 62


def _fetch(out):
    # the relay's block_until_ready is a no-op; only a host data fetch
    # actually drains the device queue
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _fetch(out)  # device executes the n calls in order; fetching the last
    #              bounds them all
    return (time.time() - t0) / n


def report(name, sec, flops=None):
    tfs = f"  {flops / sec / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:12s} {sec * 1e3:9.2f} ms{tfs}", flush=True)


def main():
    rng = np.random.default_rng(0)
    params = bs_roformer.init(jax.random.PRNGKey(0), CFG)
    spec = bs_roformer.spec_from_config(CFG.model)
    bf16 = lambda t: jax.tree.map(lambda p: p.astype(jnp.bfloat16), t)
    pb = bf16(params)

    mix = jnp.asarray(rng.standard_normal((B, CH, T)).astype(np.float32) * 0.1)

    # full forward
    fwd = jax.jit(lambda p, x: bs_roformer.apply(p, CFG, x,
                                                 compute_dtype=jnp.bfloat16))
    s = timeit(fwd, params, mix, n=5)
    # FLOPs: per layer time+freq (attn qkvo + sdpa + ff)
    def tr_flops(seqs, n):
        gemms = 2 * seqs * n * DIM * (3 * DIM + DIM + 8 * DIM)  # qkv+out+ff(4x,2 mats)
        attn = 2 * 2 * seqs * n * n * DIM
        return gemms + attn
    n_pad_t, n_pad_f = 704, 64
    stack_flops = DEPTH * (tr_flops(B * NB, n_pad_t) + tr_flops(B * TF, n_pad_f))
    report("forward", s, stack_flops)

    # transformer stack alone
    xb = jnp.asarray(rng.standard_normal((B, TF, NB, DIM)), jnp.bfloat16)
    rope_t = tuple(r.astype(jnp.bfloat16) for r in
                   rope_tables(params["rope_time_freqs"].astype(jnp.float32), TF))
    rope_f = tuple(r.astype(jnp.bfloat16) for r in
                   rope_tables(params["rope_freq_freqs"].astype(jnp.float32), NB))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pb["layers"])

    @jax.jit
    def stack_fn(layers, z):
        def body(z, layer):
            z = jnp.transpose(z, (0, 2, 1, 3))
            z = core.transformer_apply(layer["time"], z, HEADS, rope=rope_t)
            z = jnp.transpose(z, (0, 2, 1, 3))
            z = core.transformer_apply(layer["freq"], z, HEADS, rope=rope_f)
            return z, None
        z, _ = jax.lax.scan(body, z, layers, unroll=1)
        return z

    s = timeit(stack_fn, stacked, xb, n=5)
    report("stack", s, stack_flops)

    # single layers
    lay = pb["layers"][0]
    xt = jnp.asarray(rng.standard_normal((B * NB, TF, DIM)), jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((B * TF, NB, DIM)), jnp.bfloat16)

    t_fn = jax.jit(lambda p, z: core.transformer_apply(p, z, HEADS, rope=rope_t))
    f_fn = jax.jit(lambda p, z: core.transformer_apply(p, z, HEADS, rope=rope_f))
    s = timeit(t_fn, lay["time"], xt)
    report("time_layer", s, tr_flops(B * NB, n_pad_t))
    s = timeit(f_fn, lay["freq"], xf)
    report("freq_layer", s, tr_flops(B * TF, n_pad_f))

    # fused attention blocks alone
    ap = lay["time"]["layers"][0]["attn"]
    from sesa_tpu.ops.attention import fused_attention_block
    at_fn = jax.jit(lambda z: fused_attention_block(
        z, ap["norm_gamma"], ap["qkv_w"], ap["gates_w"], ap["gates_b"],
        ap["out_w"], HEADS, 64 ** -0.5, rope=rope_t))
    af_fn = jax.jit(lambda z: fused_attention_block(
        z, ap["norm_gamma"], ap["qkv_w"], ap["gates_w"], ap["gates_b"],
        ap["out_w"], HEADS, 64 ** -0.5, rope=rope_f))
    s = timeit(at_fn, xt)
    attn_flops = lambda seqs, n: (2 * seqs * n * DIM * 4 * DIM
                                  + 2 * 2 * seqs * n * n * DIM)
    report("attn_time", s, attn_flops(B * NB, n_pad_t))
    s = timeit(af_fn, xf)
    report("attn_freq", s, attn_flops(B * TF, n_pad_f))

    # fused FF alone
    fp = lay["time"]["layers"][0]["ff"]
    from sesa_tpu.ops.ff import fused_ff_residual
    tokens = B * NB * TF
    x2 = jnp.asarray(rng.standard_normal((tokens, DIM)), jnp.bfloat16)
    ff_fn = jax.jit(lambda z: fused_ff_residual(
        z, fp["norm_gamma"], fp["lin1_w"], fp["lin1_b"],
        fp["lin2_w"], fp["lin2_b"]))
    s = timeit(ff_fn, x2)
    report("ff", s, 2 * 2 * tokens * DIM * 4 * DIM)

    # stft + bands + mask + istft, no transformer
    @jax.jit
    def shell(p, x):
        import dataclasses
        sp0 = dataclasses.replace(spec)
        return bs_roformer.apply_from_spec(
            {**p, "layers": []}, dataclasses.replace(sp0, depth=0), x,
            compute_dtype=jnp.bfloat16)
    try:
        s = timeit(shell, {**params, "layers": []}, mix, n=5)
        report("stft_mask", s)
    except Exception as e:
        print("stft_mask failed:", repr(e)[:200])

    # demix engine end to end
    from sesa_tpu.runtime import DemixSpec, demix
    dspec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=17,
                      num_stems=1)
    mix_np = np.asarray(
        rng.standard_normal((2, 60 * 44100)).astype(np.float32) * 0.1)
    model_apply = lambda p, chunks: bs_roformer.apply(
        p, CFG, chunks, compute_dtype=jnp.bfloat16)
    s = timeit(lambda: demix(model_apply, params, mix_np, dspec), n=5)
    report("demix", s)
    print("rtf:", 60.0 / s)


if __name__ == "__main__":
    main()
