"""Shared neural-net building blocks with exact torch inference semantics.

Pure functions over parameter dicts. Weight layouts deliberately match the
PyTorch conventions (Conv2d OIHW, ConvTranspose2d IOHW, Linear (out, in)) so
checkpoint conversion is a pure name-mapping with no transposes.

Matmul-bearing ops take a ``precision`` argument; converted-checkpoint parity
runs at HIGHEST (this backend's default matmul precision is bf16-level).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# initializers (torch-style fan-in uniform, for init parity of scale)
# --------------------------------------------------------------------------

def kaiming_uniform(rng, shape, fan_in, dtype=jnp.float32):
    bound = float(np.sqrt(1.0 / fan_in)) if fan_in > 0 else 0.0
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def linear(x, params, precision=DEFAULT_PRECISION):
    """torch nn.Linear: weight (out, in), optional bias (out,)."""
    y = jnp.einsum("...i,oi->...o", x, params["weight"], precision=precision)
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv2d(x, weight, bias=None, stride=(1, 1), padding=(0, 0), groups=1,
           precision=DEFAULT_PRECISION):
    """torch nn.Conv2d on NCHW input with OIHW weight."""
    y = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def conv_transpose2d_block(x, weight, precision=DEFAULT_PRECISION):
    """torch nn.ConvTranspose2d with kernel_size == stride (no overlap).

    In that regime each input pixel expands to an independent k×k output
    block, so the op is a single einsum + reshape — a pure GEMM on the MXU
    instead of a transposed convolution. Weight layout IOHW (torch's).
    """
    b, c, h, w = x.shape
    ci, co, kh, kw = weight.shape
    assert c == ci
    y = jnp.einsum("bchw,cost->bohswt", x, weight, precision=precision)
    return y.reshape(b, co, h * kh, w * kw)


def gelu(x):
    """torch nn.GELU default (exact erf form)."""
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jax.nn.relu(x)


def elu(x, alpha=1.0):
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def glu(x, axis=-1):
    """torch nn.GLU: split in half, first * sigmoid(second)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def tanh(x):
    return jnp.tanh(x)


def conv1d(x, weight, bias=None, stride=1, padding=0, groups=1,
           precision=DEFAULT_PRECISION):
    """torch nn.Conv1d on (B, C, T) with (O, I/g, K) weight."""
    y = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def conv_transpose2d(x, weight, bias=None, stride=(1, 1), padding=(0, 0),
                     precision=DEFAULT_PRECISION):
    """torch nn.ConvTranspose2d on NCHW with IOHW weight (general strides).

    Implemented as a fractionally-strided convolution: dilate the input by
    ``stride``, convolve with the spatially-flipped kernel (I/O swapped),
    and trim ``padding`` — the standard transposed-conv equivalence.
    """
    kh, kw = weight.shape[2], weight.shape[3]
    w = jnp.flip(weight, axis=(2, 3)).transpose(1, 0, 2, 3)  # IOHW -> OIHW flipped
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                 (kw - 1 - padding[1], kw - 1 - padding[1])],
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def swish(x):
    return x * jax.nn.sigmoid(x)


def prelu(x, alpha):
    """torch nn.PReLU with the default single shared parameter (weight
    shape (1,)): max(0,x) + alpha·min(0,x). Per-channel PReLU is layout-
    dependent (torch broadcasts over dim 1) — callers needing it should
    reshape alpha themselves."""
    a = alpha[0] if alpha.ndim == 1 and alpha.shape[0] == 1 else alpha
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def lstm(x, params, reverse=False, precision=DEFAULT_PRECISION):
    """Single-layer unidirectional LSTM over (B, T, D), torch weight layout.

    params: weight_ih (4H, D), weight_hh (4H, H), bias_ih (4H,), bias_hh (4H,)
    with torch's gate order (input, forget, cell, output). Returns (B, T, H).
    Implemented as a ``lax.scan`` over time; the input projection for all
    steps is hoisted out of the scan as one big GEMM.
    """
    w_ih = params["weight_ih"]
    w_hh = params["weight_hh"]
    b = params.get("bias_ih", 0) + params.get("bias_hh", 0)
    h_dim = w_hh.shape[1]

    # (B, T, 4H): all-timestep input projection in one GEMM
    xproj = jnp.einsum("btd,gd->btg", x, w_ih, precision=precision) + b
    if reverse:
        xproj = jnp.flip(xproj, axis=1)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum("bh,gh->bg", h, w_hh, precision=precision)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    bsz = x.shape[0]
    init = (jnp.zeros((bsz, h_dim), x.dtype), jnp.zeros((bsz, h_dim), x.dtype))
    # unrolling the scan trades program size for less per-step dispatch
    # overhead on TPU (tunable; 1 = no unroll)
    unroll = int(os.environ.get("SESA_LSTM_UNROLL", "1"))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(xproj, 0, 1),
                         unroll=max(1, unroll))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs


def bilstm(x, params, precision=DEFAULT_PRECISION):
    """Bidirectional LSTM: params has 'fwd' and 'bwd' sub-dicts; concat on H.

    Deliberately two independent scans: a direction-batched single scan
    (both recurrences stacked on a leading axis, batched hidden GEMM) was
    A/B'd on v5e and measured equal-to-slightly-slower (2.44 vs 2.39 s on
    the SCNet 60 s demix) — the dual-path cost is the recurrence's
    sequential dependency chain, which batching directions cannot shorten."""
    fwd = lstm(x, params["fwd"], precision=precision)
    bwd = lstm(x, params["bwd"], reverse=True, precision=precision)
    return jnp.concatenate([fwd, bwd], axis=-1)


# --------------------------------------------------------------------------
# norms (inference semantics, torch eps defaults)
# --------------------------------------------------------------------------

def instance_norm2d(x, params, eps=1e-5):
    """torch nn.InstanceNorm2d(affine=True) on NCHW: per-sample per-channel.

    Statistics accumulate in float32 even under a bf16 compute dtype
    (mean/var of large spatial planes lose too much in bf16); only the
    normalized result drops back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(2, 3), keepdims=True)
    var = xf.var(axis=(2, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * params["weight"][None, :, None, None] + params["bias"][None, :, None, None]


def group_norm(x, params, num_groups, eps=1e-5):
    """torch nn.GroupNorm on (B, C, *spatial) for any spatial rank.
    Statistics accumulate in float32 (see instance_norm2d)."""
    b, c = x.shape[:2]
    spatial = x.shape[2:]
    xg = x.reshape(b, num_groups, -1).astype(jnp.float32)
    mean = xg.mean(axis=-1, keepdims=True)
    var = xg.var(axis=-1, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype).reshape(x.shape)
    shape = (1, c) + (1,) * len(spatial)
    return y * params["weight"].reshape(shape) + params["bias"].reshape(shape)


def batch_norm2d(x, params, eps=1e-5):
    """torch nn.BatchNorm2d in eval mode (running stats). The folded
    scale/shift are computed in float32 (rsqrt of bf16 running_var would
    double the rounding error) then applied in x.dtype."""
    w = params["weight"].astype(jnp.float32)
    scale = w * jax.lax.rsqrt(params["running_var"].astype(jnp.float32) + eps)
    shift = (params["bias"].astype(jnp.float32)
             - params["running_mean"].astype(jnp.float32) * scale)
    scale = scale.astype(x.dtype)
    shift = shift.astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def rms_norm(x, gamma, eps=None):
    """lucidrains RMSNorm: F.normalize(x, dim=-1) * sqrt(dim) * gamma.

    Note: this is l2-normalization (not mean-square), matching the reference
    roformer models (reference models/bs_roformer/bs_roformer.py:43-50).
    torch F.normalize clamps the norm at eps=1e-12.
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = x.shape[-1] ** 0.5
    return x / jnp.maximum(norm, 1e-12) * scale * gamma


def layer_norm(x, params, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if params is not None and "weight" in params:
        y = y * params["weight"]
        if "bias" in params:
            y = y + params["bias"]
    return y


# --------------------------------------------------------------------------
# norm/act dispatch mirroring the reference's config strings
# (reference models/mdx23c_tfc_tdf_v3.py:47-71)
# --------------------------------------------------------------------------

def make_norm2d(norm_type: str):
    """Return (apply_fn(x, params), has_params) for a norm_type string."""
    if norm_type == "BatchNorm":
        return batch_norm2d, True
    if norm_type == "InstanceNorm":
        return instance_norm2d, True
    if norm_type and "GroupNorm" in norm_type:
        g = int(norm_type.replace("GroupNorm", ""))
        return lambda x, p: group_norm(x, p, g), True
    return (lambda x, p: x), False


def make_act(act_type: str):
    if act_type == "gelu":
        return gelu
    if act_type == "relu":
        return relu
    if act_type[:3] == "elu":
        alpha = float(act_type.replace("elu", "")) if act_type != "elu" else 1.0
        return lambda x: elu(x, alpha)
    raise ValueError(f"unknown activation: {act_type}")
