"""Fused depthwise-conv block Pallas kernels (conformer + apollo).

Two residual conv blocks dominate the non-attention wall of the
scnet_melconf and ensemble chain configs:

- the lucidrains ConformerBlock conv module (reference
  models/mel_band_conformer.py via the `conformer` package):
  LayerNorm -> 1x1 (2e) -> GLU -> depthwise k=31 -> BatchNorm -> Swish
  -> 1x1 -> +x; and
- the Apollo ICB/ConvActNorm block (reference
  models/look2hear/models/apollo.py:187-198): depthwise k=7 -> RMSNorm
  -> 1x1 (4d) -> SiLU -> 1x1 -> +x.

Unfused, each streams the (tokens, e) conv activation and the (tokens,
4d) MLP hidden through HBM several times (the measured 12 ms/call of the
conformer conv module at the (360, 690, 384) bench shape sits ~4x over
its GEMM floor). Here one program loads a slab of sequences, runs the
whole chain in VMEM — the depthwise conv as ``kernel`` static
sublane-rolled multiply-adds (pltpu.roll over the sequence axis, wrap
rows masked), eval BatchNorm folded to a per-channel scale/shift — and
writes only the residual-added output: one read + one write of the
(tokens, d) stream total.

bf16-only by design (like ops/ff.py): the f32 parity path keeps the
unfused einsum chain, and CPU tests run this kernel in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _dw_conv_seq(h, taps_ref, seq_len, kernel, masked):
    """Depthwise 'same' conv along axis 0 of one sequence block.

    h (sp, C) — rows >= seq_len MUST already be zero; taps_ref (kernel, C).
    Returns f32 (sp, C): out[i] = sum_t taps[t] * h[i + t - (kernel-1)//2],
    zero-padded at both sequence ends (torch Conv1d 'same' for odd k; the
    conformer's even-k padding drops the trailing tap the same way).

    ``masked=False`` is valid when sp - seq_len >= (kernel-1)//2: negative
    shifts then wrap in only zeroed tail rows, and positive shifts
    contaminate only tail rows the caller crops — so the per-tap
    wrap masks (a third of the conv's VPU work at k=31) can be skipped.
    """
    from jax.experimental.pallas import tpu as pltpu

    sp = h.shape[0]
    half_l = (kernel - 1) // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)
    hf = h.astype(jnp.float32)  # Mosaic's rotate only handles 32-bit data
    acc = jnp.zeros(h.shape, jnp.float32)
    for t in range(kernel):
        off = t - half_l  # out[i] += taps[t] * h[i + off]
        shifted = hf if off == 0 else pltpu.roll(hf, (-off) % sp, 0)
        term = shifted * taps_ref[t].astype(jnp.float32)
        if masked and off:
            src = row + off
            term = jnp.where((src >= 0) & (src < seq_len), term, 0.0)
        acc = acc + term
    return acc


def _conformer_conv_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
                           taps_ref, scale_ref, shift_ref, w2_ref, b2_ref,
                           o_ref, h_scr, y_scr, *, kernel, seq_len, gb,
                           masked):
    from jax.experimental import pallas as pl

    sp, d = x_ref.shape[1], x_ref.shape[2]
    x_all = x_ref[...].reshape(gb * sp, d)

    xf = x_all.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + 1e-5)).astype(x_all.dtype)
    xn = xn * lnw_ref[...] + lnb_ref[...]

    h = jax.lax.dot_general(xn, w1_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    e = h.shape[-1] // 2
    glu = h[:, :e] * jax.nn.sigmoid(h[:, e:])
    # zero padding rows: the depthwise conv mixes rows, so pad tokens must
    # not bleed into real ones (pointwise kernels can skip this)
    rows = jax.lax.broadcasted_iota(jnp.int32, (gb * sp, 1), 0)
    in_seq = jax.lax.rem(rows, sp) < seq_len
    h_scr[...] = jnp.where(in_seq, glu, 0.0).astype(h_scr.dtype)

    for bi in range(gb):  # static unroll, one sequence per step
        hseq = h_scr[pl.dslice(bi * sp, sp), :]
        acc = _dw_conv_seq(hseq, taps_ref, seq_len, kernel, masked)
        y = acc * scale_ref[...].astype(jnp.float32) \
            + shift_ref[...].astype(jnp.float32)
        y = y * jax.nn.sigmoid(y)  # swish
        y_scr[pl.dslice(bi * sp, sp), :] = y.astype(y_scr.dtype)

    out = jax.lax.dot_general(y_scr[...], w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (out.astype(o_ref.dtype) + x_all).reshape(gb, sp, d)


def fused_conformer_conv(x, p, interpret=False):
    """x (b, n, d) -> x + conv_module(x) for the conformer conv params
    ``p`` (the ``conv`` subtree of a conformer block: norm/pw1/dw/bn/pw2,
    torch layouts — see models/conformer_core.py). Numerics match
    ``_conv_apply`` with eval-mode BatchNorm folded to scale/shift."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = x.shape
    w1 = p["pw1"]["weight"][:, :, 0]      # (2e, d)
    w2 = p["pw2"]["weight"][:, :, 0]      # (d, e)
    taps = jnp.transpose(p["dw"]["weight"][:, 0, :])  # (e, 1, k) -> (k, e)
    kernel = taps.shape[0]
    e = w2.shape[1]

    bn = p["bn"]
    scale = (bn["weight"].astype(jnp.float32)
             * jax.lax.rsqrt(bn["running_var"].astype(jnp.float32) + 1e-5))
    # fold the depthwise bias through BN: (acc + dw_b)*s + t = acc*s + shift
    shift = (bn["bias"].astype(jnp.float32)
             - bn["running_mean"].astype(jnp.float32) * scale
             + p["dw"]["bias"].astype(jnp.float32) * scale)
    scale = scale.astype(x.dtype)
    shift = shift.astype(x.dtype)

    sp = n + (-n) % 64
    # enough natural tail headroom lets the kernel skip its wrap masks;
    # padding further to force that would cost more GEMM rows than the
    # masks cost VPU, so short-pad shapes just keep the masks
    masked = sp - n < (kernel - 1) // 2
    gb = max(1, 1024 // sp)
    bp = b + (-b) % gb
    if sp != n or bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, sp - n), (0, 0)))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    stream = pl.BlockSpec((gb, sp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conformer_conv_kernel, kernel=kernel,
                          seq_len=n, gb=gb, masked=masked),
        grid=(bp // gb,),
        in_specs=[stream, const((d,)), const((d,)), const(w1.shape),
                  const((2 * e,)), const(taps.shape), const((e,)),
                  const((e,)), const(w2.shape), const((d,))],
        out_specs=stream,
        out_shape=jax.ShapeDtypeStruct((bp, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((gb * sp, e), x.dtype),
                        pltpu.VMEM((gb * sp, e), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * sp * (d * 3 * e + kernel * e),
            bytes_accessed=2 * bp * sp * d * x.dtype.itemsize,
            transcendentals=bp * sp * 2 * e,
        ),
        interpret=interpret,
    )(x, p["norm"]["weight"], p["norm"]["bias"], w1, p["pw1"]["bias"],
      taps, scale, shift, w2, p["pw2"]["bias"])
    return out[:b, :n]


def _apollo_conv_kernel(x_ref, taps_ref, dwb_ref, nw_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, o_ref, c_scr, *,
                        kernel, seq_len, gb, masked):
    from jax.experimental import pallas as pl

    sp, d = x_ref.shape[1], x_ref.shape[2]
    for bi in range(gb):  # depthwise conv first (input pad rows are zero)
        xseq = x_ref[bi]
        acc = _dw_conv_seq(xseq, taps_ref, seq_len, kernel, masked)
        c_scr[pl.dslice(bi * sp, sp), :] = (
            acc + dwb_ref[...].astype(jnp.float32)).astype(c_scr.dtype)

    y = c_scr[...]
    yf = y.astype(jnp.float32)
    nrm = yf * jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + 1e-5)
    yn = nrm.astype(y.dtype) * nw_ref[...]
    h = jax.lax.dot_general(yn, w1_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(h)).astype(y.dtype)  # SiLU
    out = jax.lax.dot_general(h, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    x_all = x_ref[...].reshape(gb * sp, d)
    o_ref[...] = (out.astype(o_ref.dtype) + x_all).reshape(gb, sp, d)


def fused_apollo_conv(x, p, interpret=False):
    """x (b, t, d) -> x + ConvActNorm(x) for an apollo seq_net block ``p``
    (dw_w/dw_b/norm/pw1/pw2, torch layouts — see models/apollo.py).
    Numerics match ``_conv_act_norm_apply``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = x.shape
    taps = jnp.transpose(p["dw_w"][:, 0, :])  # (d, 1, k) -> (k, d)
    kernel = taps.shape[0]
    w1 = p["pw1_w"]  # (4d, d)
    w2 = p["pw2_w"]  # (d, 4d)
    hidden = w1.shape[0]

    sp = n + (-n) % 64
    # enough natural tail headroom lets the kernel skip its wrap masks;
    # padding further to force that would cost more GEMM rows than the
    # masks cost VPU, so short-pad shapes just keep the masks
    masked = sp - n < (kernel - 1) // 2
    gb = max(1, 1024 // sp)
    bp = b + (-b) % gb
    if sp != n or bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, sp - n), (0, 0)))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    stream = pl.BlockSpec((gb, sp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_apollo_conv_kernel, kernel=kernel,
                          seq_len=n, gb=gb, masked=masked),
        grid=(bp // gb,),
        in_specs=[stream, const(taps.shape), const((d,)), const((d,)),
                  const(w1.shape), const((hidden,)), const(w2.shape),
                  const((d,))],
        out_specs=stream,
        out_shape=jax.ShapeDtypeStruct((bp, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((gb * sp, d), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * sp * (d * hidden * 2 + kernel * d),
            bytes_accessed=2 * bp * sp * d * x.dtype.itemsize,
            transcendentals=bp * sp * hidden,
        ),
        interpret=interpret,
    )(x, taps, p["dw_b"], p["norm"], w1, p["pw1_b"], w2, p["pw2_b"])
    return out[:b, :n]


def use_fused_conv(x, e) -> bool:
    """bf16 on-TPU gate for the fused conv blocks. ``e`` is the widest
    channel count flowing through the kernel (conv inner / MLP hidden)."""
    if x.dtype != jnp.bfloat16:
        return False
    n, d = x.shape[-2], x.shape[-1]
    if d % 128 or e % 128 or e > 4096:
        return False
    sp = n + (-n) % 64
    if sp > 2048:  # whole-sequence slab must stay VMEM-resident
        return False
    if os.environ.get("SESA_NO_FUSED") or os.environ.get("SESA_NO_FUSED_CONV"):
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
