"""Fused transformer FeedForward Pallas kernel.

Math matches the reference FeedForward (reference
models/bs_roformer/bs_roformer.py:77-93): RMSNorm -> Linear -> GELU ->
Linear, plus the caller's residual add. Unfused, the chain streams the
(tokens, 4*dim) hidden activation through HBM twice and the input three
times (~7 GB per layer at production shapes, measured 34 ms against an
18 ms GEMM floor). Here each program loads one token tile, keeps both
weight matrices VMEM-resident across grid steps (constant index maps),
and writes only the residual-added output — one read + one write of the
(tokens, dim) stream total.

The same kernel also serves the lucidrains-conformer FeedForward
(reference models/mel_band_conformer.py via the `conformer` package:
LayerNorm -> Linear -> SiLU -> Linear, scaled by 0.5 before the residual)
through the ``norm`` / ``act`` / ``out_scale`` knobs.

bf16-only by design: the f32 parity path keeps the unfused einsum chain
(exact-precision GEMMs), and CPU tests exercise this kernel in interpret
mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ff_chain(x, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              *, norm, act, out_scale):
    """norm -> linear -> act -> linear (×out_scale) on a (tile, d) block;
    returns the pre-residual f32 output. Rows past the token count are
    padding; they still flow through the math (harmless) and are cropped
    by the caller."""
    xf = x.astype(jnp.float32)
    if norm == "rms":
        # lucidrains RMSNorm: l2-normalize * sqrt(dim) * gamma
        nrm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        scale = (x.shape[-1] ** 0.5) / jnp.maximum(nrm, 1e-12)
        xn = (xf * scale).astype(x.dtype) * gamma_ref[...]
    else:  # LayerNorm with weight+bias
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        xn = xn * gamma_ref[...] + beta_ref[...]

    # x @ w1^T: w1 keeps its torch (out, in) layout; MXU contracts natively
    h = jax.lax.dot_general(xn, w1_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    else:  # swish / SiLU
        h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
    y = jax.lax.dot_general(h, w2_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    if out_scale != 1.0:
        y = y * out_scale
    return y


def _ff_kernel(x_ref, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               o_ref, *, norm, act, out_scale):
    x = x_ref[...]  # (tile, d) bf16
    y = _ff_chain(x, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  norm=norm, act=act, out_scale=out_scale)
    o_ref[...] = y.astype(o_ref.dtype) + x  # residual folded in


def fused_ff_residual(x, gamma, w1, b1, w2, b2, *, beta=None, norm="rms",
                      act="gelu", out_scale=1.0, tile=None, interpret=False):
    """norm -> linear -> act -> linear (×out_scale) -> +x over (tokens, dim).

    Weights stay in torch (out_features, in_features) layout. The tanh
    GELU matches the unfused bf16 path (ff_apply uses approximate=True
    under bf16).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tile is None:  # A/B knob (tools/ab_perf_knobs.py)
        import os

        tile = int(os.environ.get("SESA_FUSED_FF_TILE", "1024"))
    tokens, dim = x.shape
    hidden = w1.shape[0]
    tp = tokens + (-tokens) % tile
    if tp != tokens:
        x = jnp.pad(x, ((0, tp - tokens), (0, 0)))
    if beta is None:
        beta = jnp.zeros((dim,), x.dtype)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_ff_kernel, norm=norm, act=act,
                          out_scale=float(out_scale)),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((dim,)), const((dim,)), const((hidden, dim)),
            const((hidden,)), const((dim, hidden)), const((dim,)),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tp * dim * hidden,
            bytes_accessed=2 * tp * dim * x.dtype.itemsize,
            transcendentals=tp * hidden,
        ),
        interpret=interpret,
    )(x, gamma, beta, w1, b1, w2, b2)
    return out[:tokens]


def use_fused_ff(x, w1) -> bool:
    """bf16 inputs with MXU-friendly dims, off the CPU test platform."""
    if x.dtype != jnp.bfloat16:
        return False
    dim, hidden = x.shape[-1], w1.shape[0]
    if dim % 128 or hidden % 128 or hidden > 4096:
        return False
    import os

    if os.environ.get("SESA_NO_FUSED"):  # debugging / A-B kill switch
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
