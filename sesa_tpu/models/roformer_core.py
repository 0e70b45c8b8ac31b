"""Shared transformer stack for the roformer family (BS / Mel-Band / experimental).

Behavioral spec: reference models/bs_roformer/bs_roformer.py:77-217
(Attention with sigmoid per-head output gates, RMSNorm pre-norm, GELU
FeedForward, optional XCiT-style LinearAttention stage, optional output
RMSNorm). One implementation is shared by every variant; axial time/freq
application happens in the model files by reshaping leading dims.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from sesa_tpu.models import hyper_connections as HC
from sesa_tpu.models.layers import kaiming_uniform, rms_norm
from sesa_tpu.ops.attention import (_use_fused, fused_attention_block,
                                    l2norm, sdpa, sdpa_int8)
from sesa_tpu.ops.ff import fused_ff_residual, use_fused_ff
from sesa_tpu.ops.rope import apply_rope

_HIGHEST = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def attention_init(rng, dim, heads, dim_head, value_residual=False):
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    dim_inner = heads * dim_head
    p = {
        "norm_gamma": jnp.ones((dim,)),
        "qkv_w": kaiming_uniform(k1, (dim_inner * 3, dim), dim),
        "gates_w": kaiming_uniform(k2, (heads, dim), dim),
        "gates_b": kaiming_uniform(k3, (heads,), dim),
        "out_w": kaiming_uniform(k4, (dim, dim_inner), dim_inner),
    }
    if value_residual:
        p["vr_mix_w"] = kaiming_uniform(k5, (heads, dim), dim)
        p["vr_mix_b"] = kaiming_uniform(k6, (heads,), dim)
    return p


def linear_attention_init(rng, dim, heads, dim_head):
    k1, k2 = jax.random.split(rng, 2)
    dim_inner = heads * dim_head
    return {
        "norm_gamma": jnp.ones((dim,)),
        "qkv_w": kaiming_uniform(k1, (dim_inner * 3, dim), dim),
        "temperature": jnp.ones((heads, 1, 1)),
        "out_w": kaiming_uniform(k2, (dim, dim_inner), dim_inner),
    }


def ff_init(rng, dim, mult):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    inner = int(dim * mult)
    return {
        "norm_gamma": jnp.ones((dim,)),
        "lin1_w": kaiming_uniform(k1, (inner, dim), dim),
        "lin1_b": kaiming_uniform(k2, (inner,), dim),
        "lin2_w": kaiming_uniform(k3, (dim, inner), inner),
        "lin2_b": kaiming_uniform(k4, (dim,), inner),
    }


def transformer_init(rng, dim, depth, heads, dim_head, ff_mult=4,
                     norm_output=False, linear_attn=False, value_residual=False,
                     num_residual_streams=1):
    keys = jax.random.split(rng, depth * 2 + 1)
    layers = []
    for i in range(depth):
        attn = (
            linear_attention_init(keys[2 * i], dim, heads, dim_head)
            if linear_attn
            else attention_init(keys[2 * i], dim, heads, dim_head,
                                value_residual=value_residual)
        )
        ff = ff_init(keys[2 * i + 1], dim, ff_mult)
        if num_residual_streams > 1 and not linear_attn:
            # hyper-connections wrap attn and ff (reference
            # bs_roformer_experimental.py:219-228); LinearAttention stays bare
            attn = {"hc": HC.hc_init(None, dim, num_residual_streams, 2 * i),
                    "branch": attn}
            ff = {"hc": HC.hc_init(None, dim, num_residual_streams, 2 * i + 1),
                  "branch": ff}
        layers.append({"attn": attn, "ff": ff})
    params = {"layers": layers}
    if norm_output:
        params["norm_gamma"] = jnp.ones((dim,))
    return params


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def attention_apply(p, x, heads, rope=None, precision=_HIGHEST,
                    value_residual=None, return_values=False):
    """x (..., n, dim) -> (..., n, dim); rope = (cos, sin) tables for n.

    ``value_residual`` implements value-residual learning (reference
    bs_roformer_experimental.py:111-135): V is lerped toward the first
    layer's V with a learned per-head sigmoid mix. ``return_values`` also
    returns the pre-mix V for downstream layers.
    """
    lead = x.shape[:-2]
    n, dim = x.shape[-2:]
    xn = rms_norm(x, p["norm_gamma"]).reshape(-1, n, dim)
    b = xn.shape[0]

    # 2D tokens for the projection GEMMs (measured 1.5x over batched forms)
    qkv = jnp.einsum("td,od->to", xn.reshape(b * n, dim), p["qkv_w"],
                     precision=precision)
    dim_head = qkv.shape[-1] // (3 * heads)

    qkv = qkv.reshape(b, n, 3, heads, dim_head)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, b, h, n, dh)
    q, k, v = qkv[0], qkv[1], qkv[2]

    orig_v = v
    if "vr_mix_w" in p:
        assert value_residual is not None
        mix = jnp.einsum("bnd,hd->bnh", xn, p["vr_mix_w"], precision=precision)
        mix = mix + p["vr_mix_b"]
        mix = jax.nn.sigmoid(jnp.transpose(mix, (0, 2, 1)))[..., None]  # (b,h,n,1)
        v = v + (value_residual.reshape(v.shape) - v) * mix  # lerp

    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if os.environ.get("SESA_INT8_ATTN"):
        # SageAttention analog (reference attend_sage.py): opt-in int8 QK^T
        out = sdpa_int8(q, k, v)
    else:
        out = sdpa(q, k, v, precision=precision)  # (b, h, n, dh)

    gates = jnp.einsum("bnd,hd->bnh", xn, p["gates_w"], precision=precision)
    gates = gates + p["gates_b"]
    out = out * jax.nn.sigmoid(jnp.transpose(gates, (0, 2, 1)))[..., None]

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b * n, heads * dim_head)
    out = jnp.einsum("to,do->td", out, p["out_w"], precision=precision)
    out = out.reshape(lead + (n, dim))
    if return_values:
        return out, orig_v
    return out


def attention_apply_residual(p, x, heads, rope=None, precision=_HIGHEST):
    """attention_apply(x) + x; on the bf16 TPU path the whole block (norm,
    qkv, rope, attention, gates, out projection, residual) runs as one
    Pallas kernel — the qkv tensor and normed activations never touch HBM."""
    n, dim = x.shape[-2:]
    dim_head = p["qkv_w"].shape[0] // (3 * heads)
    if n < int(os.environ.get("SESA_ROFO_SHORTSEQ_ATTN", "0")):
        # A/B knob (see conformer_core): below this seq length the fused
        # block's fragmented per-program qkv GEMMs can cost more than the
        # whole-tensor projection + small einsum attention; sdpa at short
        # seq already takes the einsum path (_use_pallas min seq 256)
        return attention_apply(p, x, heads, rope=rope,
                               precision=precision) + x
    if "vr_mix_w" not in p and _use_fused(n, dim_head, heads, dim,
                                          dtype=x.dtype):
        out = fused_attention_block(
            x.reshape(-1, n, dim), p["norm_gamma"], p["qkv_w"], p["gates_w"],
            p["gates_b"], p["out_w"], heads, dim_head ** -0.5, rope=rope)
        return out.reshape(x.shape)
    return attention_apply(p, x, heads, rope=rope, precision=precision) + x


def linear_attention_apply(p, x, heads, scale=8.0, precision=_HIGHEST):
    """XCiT-style linear attention (reference bs_roformer.py:124-175)."""
    lead = x.shape[:-2]
    n, dim = x.shape[-2:]
    xn = rms_norm(x, p["norm_gamma"]).reshape(-1, n, dim)
    b = xn.shape[0]

    qkv = jnp.einsum("bnd,od->bno", xn, p["qkv_w"], precision=precision)
    dim_head = qkv.shape[-1] // (3 * heads)
    # reference packs 'b n (qkv h d) -> qkv b h d n'
    qkv = qkv.reshape(b, n, 3, heads, dim_head)
    qkv = jnp.transpose(qkv, (2, 0, 3, 4, 1))  # (3, b, h, dh, n)
    q, k, v = qkv[0], qkv[1], qkv[2]

    q = l2norm(q, axis=-1)
    k = l2norm(k, axis=-1)
    q = q * jnp.exp(p["temperature"])

    out = sdpa(q, k, v, scale=scale, precision=precision)  # (b, h, dh, n)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, heads * dim_head)
    out = jnp.einsum("bno,do->bnd", out, p["out_w"], precision=precision)
    return out.reshape(lead + (n, dim))


def ff_apply(p, x, precision=_HIGHEST):
    shape = x.shape
    xn = rms_norm(x, p["norm_gamma"]).reshape(-1, shape[-1])  # 2D: 1.5x faster GEMMs
    h = jnp.einsum("td,od->to", xn, p["lin1_w"], precision=precision) + p["lin1_b"]
    # tanh-GELU under bf16 (its ~1e-4 error is far below bf16 rounding and
    # measured 1.6x faster than erf on the VPU); exact erf in f32 parity mode
    h = jax.nn.gelu(h, approximate=x.dtype == jnp.bfloat16)
    h = jnp.einsum("td,od->to", h, p["lin2_w"], precision=precision) + p["lin2_b"]
    return h.reshape(shape)


def ff_apply_residual(p, x, precision=_HIGHEST):
    """ff_apply(x) + x, via the fused Pallas kernel on the bf16 TPU path."""
    x2d = x.reshape(-1, x.shape[-1])
    if use_fused_ff(x2d, p["lin1_w"]):
        out = fused_ff_residual(x2d, p["norm_gamma"], p["lin1_w"], p["lin1_b"],
                                p["lin2_w"], p["lin2_b"])
        return out.reshape(x.shape)
    return ff_apply(p, x, precision=precision) + x


def transformer_apply(params, x, heads, rope=None, linear_attn=False,
                      precision=_HIGHEST):
    for layer in params["layers"]:
        if linear_attn:
            x = linear_attention_apply(layer["attn"], x, heads, precision=precision) + x
        else:
            x = attention_apply_residual(layer["attn"], x, heads, rope=rope,
                                         precision=precision)
        x = ff_apply_residual(layer["ff"], x, precision=precision)
    if "norm_gamma" in params:
        x = rms_norm(x, params["norm_gamma"])
    return x


def transformer_apply_hc(params, x, heads, rope=None, value_residual=None,
                         precision=_HIGHEST, streams=2):
    """Experimental transformer with hyper-connections (streams > 1).

    x arrives with streams folded into the leading batch dims (the model
    expands once before the depth loop, reference
    bs_roformer_experimental.py:558-560). Replicates the reference
    Transformer.forward exactly: first call per value-residual thread
    (value_residual None) runs the "old weights" path with EXTRA explicit
    residual adds on top of the hyper-connection writes; later calls let
    the hyper-connections own the residual stream. Returns
    (x, first_layer_values).
    """
    lead = x.shape[:-2]
    n, dim = x.shape[-2:]
    xb = x.reshape(-1, n, dim)
    old_style = value_residual is None
    first_values = None
    for layer in params["layers"]:
        pa, pf = layer["attn"], layer["ff"]

        def attn_branch(bi, _pa=pa["branch"]):
            return attention_apply(_pa, bi, heads, rope=rope,
                                   precision=precision,
                                   value_residual=value_residual,
                                   return_values=True)

        def ff_branch(bi, _pf=pf["branch"]):
            return ff_apply(_pf, bi, precision=precision)

        out, next_values = HC.hc_apply(pa["hc"], xb, streams, attn_branch,
                                       precision=precision)
        if first_values is None:
            first_values = next_values
        if old_style:
            xb = out + xb
            xb = HC.hc_apply(pf["hc"], xb, streams, ff_branch,
                             precision=precision) + xb
        else:
            xb = HC.hc_apply(pf["hc"], out, streams, ff_branch,
                             precision=precision)
    xb = xb.reshape(lead + (n, dim))
    if "norm_gamma" in params:
        xb = rms_norm(xb, params["norm_gamma"])
    return xb, first_values


def transformer_apply_vr(params, x, heads, rope=None, value_residual=None,
                         precision=_HIGHEST, streams=1):
    """Transformer with value-residual threading (reference
    bs_roformer_experimental.py:239-258). Returns (x, first_layer_values).

    With ``value_residual`` given, the reference's new-style forward applies
    NO explicit residual adds around attn/ff (hyper connections own the
    residual stream); with None it falls back to the standard residual form.
    """
    if streams > 1:
        return transformer_apply_hc(params, x, heads, rope=rope,
                                    value_residual=value_residual,
                                    precision=precision, streams=streams)
    n, dim = x.shape[-2:]
    p0 = params["layers"][0]["attn"]
    dim_head = p0["qkv_w"].shape[0] // (3 * heads)
    # the fused kernel threads V in (b, n, h·dh) layout while the legacy
    # path uses (b, h, n, dh). Eligibility depends only on shapes/dtype,
    # which are identical for every stack of one model run — so the
    # caller's cross-layer value_residual threading never mixes layouts.
    # (The first stack has no vr_mix_w — lucidrains creates the mix
    # projection only for non-first layers.)
    fused = _use_fused(n, dim_head, heads, dim, dtype=x.dtype)

    first_values = None
    if fused:
        shape = x.shape
        xb = x.reshape(-1, n, dim)
        vres = (None if value_residual is None
                else value_residual.reshape(-1, n, heads * dim_head))
        for layer in params["layers"]:
            p = layer["attn"]
            has_mix = "vr_mix_w" in p
            if has_mix:
                assert vres is not None
            out, next_values = fused_attention_block(
                xb, p["norm_gamma"], p["qkv_w"], p["gates_w"], p["gates_b"],
                p["out_w"], heads, dim_head ** -0.5, rope=rope,
                vr=(p.get("vr_mix_w"), p.get("vr_mix_b"),
                    vres if has_mix else None),
                add_residual=vres is None)
            if first_values is None:
                first_values = next_values
            xb = out
            if vres is None:
                # old-style forward: explicit residuals around attn/ff
                x = ff_apply_residual(layer["ff"], xb.reshape(shape),
                                      precision=precision)
            else:
                x = ff_apply(layer["ff"], xb.reshape(shape),
                             precision=precision)
            xb = x.reshape(-1, n, dim)
        x = xb.reshape(shape)
        first_values = first_values.reshape(shape[:-1] + (heads * dim_head,))
    elif value_residual is not None:
        for layer in params["layers"]:
            x, next_values = attention_apply(layer["attn"], x, heads, rope=rope,
                                             precision=precision,
                                             value_residual=value_residual,
                                             return_values=True)
            if first_values is None:
                first_values = next_values
            x = ff_apply(layer["ff"], x, precision=precision)
    else:
        for layer in params["layers"]:
            attn_out, next_values = attention_apply(layer["attn"], x, heads,
                                                    rope=rope, precision=precision,
                                                    return_values=True)
            if first_values is None:
                first_values = next_values
            x = attn_out + x
            x = ff_apply_residual(layer["ff"], x, precision=precision)
    if "norm_gamma" in params:
        x = rms_norm(x, params["norm_gamma"])
    return x, first_values


# --------------------------------------------------------------------------
# torch state-dict conversion
# --------------------------------------------------------------------------

def convert_transformer(take, prefix, depth, norm_output=False, linear_attn=False,
                        value_residual=False, num_residual_streams=1):
    """Convert one reference Transformer given a ``take(key)`` accessor."""
    layers = []
    for i in range(depth):
        a = f"{prefix}.layers.{i}.0"
        f = f"{prefix}.layers.{i}.1"
        hc = num_residual_streams > 1 and not linear_attn
        if hc:
            # hyper-connection wrappers hold the branch under '.branch'
            a_hc, f_hc = HC.hc_convert(take, a), HC.hc_convert(take, f)
            a, f = f"{a}.branch", f"{f}.branch"
        if linear_attn:
            attn = {
                "norm_gamma": take(f"{a}.norm.gamma"),
                "qkv_w": take(f"{a}.to_qkv.0.weight"),
                "temperature": take(f"{a}.temperature"),
                "out_w": take(f"{a}.to_out.1.weight"),
            }
        else:
            attn = {
                "norm_gamma": take(f"{a}.norm.gamma"),
                "qkv_w": take(f"{a}.to_qkv.weight"),
                "gates_w": take(f"{a}.to_gates.weight"),
                "gates_b": take(f"{a}.to_gates.bias"),
                "out_w": take(f"{a}.to_out.0.weight"),
            }
            if value_residual:
                attn["vr_mix_w"] = take(f"{a}.to_value_residual_mix.weight")
                attn["vr_mix_b"] = take(f"{a}.to_value_residual_mix.bias")
        ff = {
            "norm_gamma": take(f"{f}.net.0.gamma"),
            "lin1_w": take(f"{f}.net.1.weight"),
            "lin1_b": take(f"{f}.net.1.bias"),
            "lin2_w": take(f"{f}.net.4.weight"),
            "lin2_b": take(f"{f}.net.4.bias"),
        }
        if hc:
            attn = {"hc": a_hc, "branch": attn}
            ff = {"hc": f_hc, "branch": ff}
        layers.append({"attn": attn, "ff": ff})
    params = {"layers": layers}
    if norm_output:
        params["norm_gamma"] = take(f"{prefix}.norm.gamma")
    return params
