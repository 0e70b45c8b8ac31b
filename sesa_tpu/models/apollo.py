"""Apollo — band-split roformer/ICB audio restoration model.

Behavioral spec: reference models/look2hear/models/apollo.py:225-324.
STFT → 80 uniform subbands → per-band power normalization with log-power
feature → per-band bottleneck conv → ``layer`` × BSNet (band-axis roformer
with its own interleaved RoPE + inception conv block over time) → per-band
GLU output heads → RI spectrum → iSTFT.

The 79 equal-width band heads run as one batched einsum; the odd final
band runs separately (bands here are uniform by construction, unlike the
roformer band plans).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models.layers import kaiming_uniform
from sesa_tpu.ops.attention import sdpa
from sesa_tpu.ops.prec import net_precision
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST
_EPS_F32 = float(np.finfo(np.float32).eps)


def _dims(config):
    m = dict(config.model)
    sr = int(m["sr"])
    win = int(sr * m["win"] // 1000)
    stride = win // 2
    enc_dim = win // 2 + 1
    feature_dim = int(m["feature_dim"])
    layer = int(m["layer"])
    bandwidth = int(win / 160)
    band_width = [bandwidth] * 79 + [enc_dim - 79 * bandwidth]
    return sr, win, stride, enc_dim, feature_dim, layer, band_width


def _rms_norm_last(x, weight, eps=1e-5):
    """Apollo RMSNorm on (..., N): rms over the trailing channel axis.
    Statistics accumulate in float32 under a bf16 compute dtype. (The net
    runs channels-LAST here — the torch reference's (B, N, T) layout keeps
    the contraction axis in the middle, which costs layout churn on TPU;
    values are identical.)"""
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return norm.astype(x.dtype) * weight


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config):
    sr, win, stride, enc_dim, n, layer, band_width = _dims(config)
    bw = band_width[0]
    keys = iter(jax.random.split(rng, 64 + 16 * layer))

    def conv1x1(ci, co, m=1):
        shape = (m, co, ci) if m > 1 else (co, ci)
        return kaiming_uniform(next(keys), shape, ci)

    def bias(co, ci, m=1):
        shape = (m, co) if m > 1 else (co,)
        return kaiming_uniform(next(keys), shape, ci)

    def roformer(nd):
        return {
            "input_norm": jnp.ones((nd,)),
            "qkv_w": conv1x1(nd, nd * 3),
            "out_w": conv1x1(nd, nd),
            "mlp_norm": jnp.ones((nd,)),
            "mlp_in": conv1x1(nd, nd * 8),
            "mlp_out": conv1x1(nd * 4, nd),
        }

    def conv_act_norm(nd, kernel=7):
        return {
            "dw_w": kaiming_uniform(next(keys), (nd, 1, kernel), kernel),
            "dw_b": bias(nd, kernel),
            "norm": jnp.ones((nd,)),
            "pw1_w": conv1x1(nd, nd * 4),
            "pw1_b": bias(nd * 4, nd),
            "pw2_w": conv1x1(nd * 4, nd),
            "pw2_b": bias(nd, nd * 4),
        }

    params = {
        # 79 uniform bands batched + the final odd band
        "bn_norm": jnp.ones((79, bw * 2 + 1)),
        "bn_w": conv1x1(bw * 2 + 1, n, m=79),
        "bn_b": bias(n, bw * 2 + 1, m=79),
        "bn_norm_last": jnp.ones((band_width[-1] * 2 + 1,)),
        "bn_w_last": conv1x1(band_width[-1] * 2 + 1, n),
        "bn_b_last": bias(n, band_width[-1] * 2 + 1),
        "layers": [
            {
                "band_net": roformer(n),
                "seq_net": [conv_act_norm(n) for _ in range(3)],
            }
            for _ in range(layer)
        ],
        "out_norm": jnp.ones((79, n)),
        "out_w": conv1x1(n, bw * 4, m=79),
        "out_b": bias(bw * 4, n, m=79),
        "out_norm_last": jnp.ones((n,)),
        "out_w_last": conv1x1(n, band_width[-1] * 4),
        "out_b_last": bias(band_width[-1] * 4, n),
    }
    return params


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _apollo_rope(n_dim, seq_len, theta=10000.0):
    freq = 1.0 / (theta ** (np.arange(0, n_dim, 2)[: n_dim // 2] / n_dim))
    pos = np.arange(seq_len)[:, None] * freq[None, :]
    cos = np.repeat(np.cos(pos), 2, axis=-1)
    sin = np.repeat(np.sin(pos), 2, axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def _rotate_pairs(x):
    x2 = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)


def _roformer_apply(p, x, num_head=8, precision=_HIGHEST):
    """x (B, S, N) band-axis transformer (seq axis = bands)."""
    b, s, n = x.shape
    hidden = n // num_head
    xn = _rms_norm_last(x, p["input_norm"])
    qkv = jnp.einsum("bsn,on->bso", xn, p["qkv_w"], precision=precision)
    # the packed qkv axis is head-major: head h owns rows [3h*hd, 3(h+1)*hd)
    # as (q_h, k_h, v_h) — same packing as the torch checkpoint
    qkv = qkv.reshape(b, s, num_head, hidden * 3)
    qkv = jnp.transpose(qkv, (0, 2, 1, 3))  # (B, H, S, 3h)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    cos, sin = _apollo_rope(hidden, s)
    # tables are built in f32; drop to the network dtype so bf16 stays bf16
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    q = q * cos + _rotate_pairs(q) * sin
    k = k * cos + _rotate_pairs(k) * sin

    out = sdpa(q, k, v, precision=precision)  # (B, H, S, h)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, n)
    out = jnp.einsum("bsn,on->bso", out, p["out_w"], precision=precision) + x
    return _roformer_mlp(p, out, precision)


def _roformer_mlp(p, out, precision):
    h = _rms_norm_last(out, p["mlp_norm"])
    h = jnp.einsum("...n,on->...o", h, p["mlp_in"], precision=precision)
    h = jax.nn.silu(h)
    gate, z = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate) * z
    h = jnp.einsum("...n,on->...o", h, p["mlp_out"], precision=precision)
    return out + h


def _qkv_head_block_perm(n, num_head):
    """Row permutation taking the checkpoint's head-major qkv packing
    [(q0,k0,v0),(q1,k1,v1),…] to the fused kernel's component-major
    [q0..qH | k0..kH | v0..vH] layout."""
    dh = n // num_head
    rows = np.arange(3 * n).reshape(num_head, 3, dh)
    return jnp.asarray(np.transpose(rows, (1, 0, 2)).reshape(-1))


def _use_fused_band_attn(dtype) -> bool:
    import os

    if dtype != jnp.bfloat16 or os.environ.get("SESA_NO_FUSED"):
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def _roformer_apply_folded(p, feat, num_head=8, precision=_HIGHEST,
                           interpret=False):
    """Band transformer on feat (B', S, T, N) WITHOUT layout round trips.

    Numerics match :func:`_roformer_apply`; the data movement does not:
    the band/time transposes fold into the qkv / out projection GEMMs
    (einsum output layouts), and rope + attention run inside the fused
    Pallas kernel (packed qkv in, attended heads out — the (·, S, S)
    logits and the per-head splits never touch HBM). On the profile this
    removes the standalone 467 MB-tensor transposes and ~2.3 GB of f32
    logits traffic per layer that made each BSNet layer cost ~95 ms
    (tools/profile_apollo_layers.py).
    """
    from sesa_tpu.ops.attention import fused_rope_attention

    b, s, t, n = feat.shape
    dh = n // num_head
    xn = _rms_norm_last(feat, p["input_norm"])
    wq = p["qkv_w"][_qkv_head_block_perm(n, num_head)]
    # transpose folded into the GEMM's output layout: (B', T, S, 3N)
    qkv = jnp.einsum("bstn,on->btso", xn, wq, precision=precision)
    cos, sin = _apollo_rope(dh, s)
    out = fused_rope_attention(
        qkv.reshape(b * t, s, 3 * n), num_head, dh ** -0.5,
        rope=(cos, sin), gb_cap=8, interpret=interpret)
    out = out.reshape(b, t, s, n)
    # fold the way back into the out projection
    out = jnp.einsum("btsh,oh->bsto", out, p["out_w"],
                     precision=precision) + feat
    return _roformer_mlp(p, out, precision)


def _use_fused_seq_conv(z, blk) -> bool:
    """Gate for the fused ICB conv kernel (ops/convblock.py). Unlike the
    round-4 norm->MLP-only fusion (measured 1.10x SLOWER than XLA at these
    dim-256 shapes and removed), this kernel also folds the depthwise conv
    and the residual, saving two more full activation streams;
    ``SESA_NO_FUSED_CONV`` restores the einsum path."""
    from sesa_tpu.ops.convblock import use_fused_conv

    return use_fused_conv(z, blk["pw1_w"].shape[0])


def _conv_act_norm_apply(p, x, kernel=7, precision=_HIGHEST):
    """(B, T, N) depthwise conv over T + RMSNorm + pointwise MLP, residual.

    Stays on plain einsums on purpose: a Pallas fusion of the norm -> pw1
    -> SiLU -> pw2 -> +residual chain was measured SLOWER than XLA's own
    fusion at these shapes (36.2 vs 32.8 ms at (608320, 256)x1024 tokens,
    v5e) — the hidden stream XLA spills is cheaper than the kernel's
    per-program overhead at dim 256."""
    b, t, n = x.shape
    w = jnp.transpose(p["dw_w"], (2, 1, 0))  # torch (N,1,k) -> HIO (k,1,N)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[((kernel - 1) // 2,) * 2],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=n,
        precision=precision,
    ) + p["dw_b"]
    y = _rms_norm_last(y, p["norm"])
    y = jnp.einsum("btn,on->bto", y, p["pw1_w"], precision=precision) + p["pw1_b"]
    y = jax.nn.silu(y)
    y = jnp.einsum("btn,on->bto", y, p["pw2_w"], precision=precision) + p["pw2_b"]
    return x + y


def apply(params, config, x, precision=None, compute_dtype=None):
    """(B, ch, T) -> (B, 1, ch, T) restored audio (single 'stem').

    ``compute_dtype``: run the band/roformer/seq-conv net in this dtype
    (bf16 on TPU); STFT/iSTFT and band feature extraction stay float32."""
    precision = net_precision(precision, compute_dtype)
    sr, win, stride, enc_dim, n, layer, band_width = _dims(config)
    bw = band_width[0]
    b, ch, nsample = x.shape

    window = hann_window(win, dtype=x.dtype)
    spec = stft_ri(x.reshape(b * ch, nsample), win, stride, window)  # (B', F, T, 2)
    t = spec.shape[-2]

    # uniform bands, channels-LAST: (B', 79, T, bw, 2); last band separate
    uni = jnp.transpose(
        spec[:, : 79 * bw].reshape(b * ch, 79, bw, t, 2), (0, 1, 3, 2, 4))
    last = jnp.transpose(spec[:, 79 * bw :], (0, 2, 1, 3))  # (B', T, bw_l, 2)

    def band_features(s):  # (..., T, BW, 2) -> norm spec + log power
        power = jnp.sqrt(
            jnp.sum(s[..., 0] ** 2 + s[..., 1] ** 2, axis=-1, keepdims=True)
            + _EPS_F32)
        re = s[..., 0] / power
        im = s[..., 1] / power
        return jnp.concatenate([re, im, jnp.log(power)], axis=-1)  # (..., T, 2BW+1)

    feat_uni = band_features(uni)  # (B', 79, T, 2bw+1)
    feat_last = band_features(last)  # (B', T, 2bw_l+1)
    if compute_dtype is not None:
        feat_uni = feat_uni.astype(compute_dtype)
        feat_last = feat_last.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    feat_uni = _rms_norm_last(feat_uni, params["bn_norm"][:, None, :])
    feat_uni = jnp.einsum("bmtc,mnc->bmtn", feat_uni, params["bn_w"],
                          precision=precision) + params["bn_b"][None, :, None, :]

    feat_last = _rms_norm_last(feat_last, params["bn_norm_last"])
    feat_last = jnp.einsum("btc,nc->btn", feat_last, params["bn_w_last"],
                           precision=precision) + params["bn_b_last"]

    feat = jnp.concatenate([feat_uni, feat_last[:, None]], axis=1)  # (B', 80, T, N)
    nband = feat.shape[1]

    fused_band = _use_fused_band_attn(feat.dtype)

    def one_layer(feat, lp):
        # band communication: sequence axis = bands, batched over (B', T)
        if fused_band:
            feat = _roformer_apply_folded(lp["band_net"], feat,
                                          precision=precision)
        else:
            z = jnp.transpose(feat, (0, 2, 1, 3)).reshape(-1, nband, n)
            z = _roformer_apply(lp["band_net"], z, precision=precision)
            feat = jnp.transpose(z.reshape(b * ch, t, nband, n), (0, 2, 1, 3))
        # sequence modeling over frames per band
        z = feat.reshape(b * ch * nband, t, n)
        for blk in lp["seq_net"]:
            if _use_fused_seq_conv(z, blk):
                from sesa_tpu.ops.convblock import fused_apollo_conv

                z = fused_apollo_conv(z, blk)
            else:
                z = _conv_act_norm_apply(blk, z, precision=precision)
        return z.reshape(b * ch, nband, t, n)

    # BSNet stack compile strategy (same as bs_roformer.apply): the layers
    # are homogeneous, so scan over stacked params compiles the
    # band-roformer + ICB body ONCE instead of `layer` times — the chain
    # bench's first-run compile was dominated by these unrolled programs.
    unroll = int(os.environ.get("SESA_APOLLO_SCAN_UNROLL", "2"))
    if unroll > 0 and len(params["layers"]) > 1:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

        def scan_body(f, lp):
            return one_layer(f, lp), None

        feat, _ = jax.lax.scan(scan_body, feat, stacked,
                               unroll=min(unroll, len(params["layers"])))
    else:
        for lp in params["layers"]:
            feat = one_layer(feat, lp)

    # output heads: RMSNorm + 1x1 + GLU -> RI per band
    hu = _rms_norm_last(feat[:, :79], params["out_norm"][:, None, :])
    hu = jnp.einsum("bmtn,mon->bmto", hu, params["out_w"],
                    precision=precision) + params["out_b"][None, :, None, :]
    a, g = jnp.split(hu, 2, axis=-1)
    hu = a * jax.nn.sigmoid(g)  # (B', 79, T, 2bw)
    hu = hu.reshape(b * ch, 79, t, 2, bw)

    hl = _rms_norm_last(feat[:, 79], params["out_norm_last"])
    hl = jnp.einsum("btn,on->bto", hl, params["out_w_last"],
                    precision=precision) + params["out_b_last"]
    a, g = jnp.split(hl, 2, axis=-1)
    hl = jnp.transpose(
        (a * jax.nn.sigmoid(g)).reshape(b * ch, t, 2, band_width[-1]),
        (0, 2, 3, 1))  # (B', 2, bw_l, T)

    spec_out = jnp.concatenate(
        [jnp.transpose(hu, (0, 3, 1, 4, 2)).reshape(b * ch, 2, 79 * bw, t),
         hl],
        axis=2,
    )  # (B', 2, F, T)
    spec_ri = jnp.stack([spec_out[:, 0], spec_out[:, 1]],
                        axis=-1).astype(jnp.float32)  # (B', F, T, 2)

    wav = istft_ri(spec_ri, win, stride, window, length=nsample)
    return wav.reshape(b, 1, ch, nsample)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    """Key scheme (reference apollo.py): BN.{i}.{0,1}, net.{l}.band_net.*,
    net.{l}.seq_net.blocks.{j}.conv.{0,1,2,4}, output.{i}.{0,1}."""
    sr, win, stride, enc_dim, n, layer, band_width = _dims(config)
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def conv_squeeze(key):  # torch conv1d 1x1 weight (O, I, 1) -> (O, I)
        return take(key)[..., 0]

    params = {
        "bn_norm": jnp.stack([take(f"BN.{i}.0.weight") for i in range(79)]),
        "bn_w": jnp.stack([conv_squeeze(f"BN.{i}.1.weight") for i in range(79)]),
        "bn_b": jnp.stack([take(f"BN.{i}.1.bias") for i in range(79)]),
        "bn_norm_last": take("BN.79.0.weight"),
        "bn_w_last": conv_squeeze("BN.79.1.weight"),
        "bn_b_last": take("BN.79.1.bias"),
        "out_norm": jnp.stack([take(f"output.{i}.0.weight") for i in range(79)]),
        "out_w": jnp.stack([conv_squeeze(f"output.{i}.1.weight") for i in range(79)]),
        "out_b": jnp.stack([take(f"output.{i}.1.bias") for i in range(79)]),
        "out_norm_last": take("output.79.0.weight"),
        "out_w_last": conv_squeeze("output.79.1.weight"),
        "out_b_last": take("output.79.1.bias"),
    }
    layers = []
    for l in range(layer):
        bn = f"net.{l}.band_net"
        layers.append(
            {
                "band_net": {
                    "input_norm": take(f"{bn}.input_norm.weight"),
                    "qkv_w": conv_squeeze(f"{bn}.weight.weight"),
                    "out_w": conv_squeeze(f"{bn}.output.weight"),
                    "mlp_norm": take(f"{bn}.MLP.0.weight"),
                    "mlp_in": conv_squeeze(f"{bn}.MLP.1.weight"),
                    "mlp_out": conv_squeeze(f"{bn}.MLP_output.weight"),
                },
                "seq_net": [
                    {
                        "dw_w": take(f"net.{l}.seq_net.blocks.{j}.conv.0.weight"),
                        "dw_b": take(f"net.{l}.seq_net.blocks.{j}.conv.0.bias"),
                        "norm": take(f"net.{l}.seq_net.blocks.{j}.conv.1.weight"),
                        "pw1_w": conv_squeeze(f"net.{l}.seq_net.blocks.{j}.conv.2.weight"),
                        "pw1_b": take(f"net.{l}.seq_net.blocks.{j}.conv.2.bias"),
                        "pw2_w": conv_squeeze(f"net.{l}.seq_net.blocks.{j}.conv.4.weight"),
                        "pw2_b": take(f"net.{l}.seq_net.blocks.{j}.conv.4.bias"),
                    }
                    for j in range(3)
                ],
            }
        )
        # RoPE caches are registered buffers in checkpoints; recomputed here
        for extra in (f"{bn}.cos_freq", f"{bn}.sin_freq"):
            if extra in sd:
                used.add(extra)
    params["layers"] = layers

    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
