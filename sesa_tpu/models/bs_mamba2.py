"""TS-BS-Mamba2 — band-split separator with bidirectional Mamba-2 blocks.

Behavioral spec: reference models/ts_bs_mamba2.py:17-312 (Separator) with
the SSD math from models/ex_bi_mamba2.py (see sesa_tpu.ops.ssd).
Architecture: STFT → 7-group psychoacoustic band split (62 bands) →
per-band GroupNorm+1×1 bottlenecks into parallel mask and map feature
stacks → mask branch: ``num_repeat_mask`` × BSNet (band-sequence ResMamba
over frames, band-communication ResMamba over bands, TAC channel mixing)
→ fused with map features → map branch → per-band grouped heads produce a
sum-to-one complex mask (applied to the mixture) plus an additive complex
map → iSTFT.

Mamba blocks run bidirectionally (forward + flipped backward, concatenated)
with the chunked SSD scan; the causal depthwise conv is a left-padded
grouped conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.ssd import ssd
from sesa_tpu.ops.prec import net_precision
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST
_EPS_F32 = float(np.finfo(np.float32).eps)

# Mamba2 block hyperparameters fixed by the reference (ts_bs_mamba2.py:20-34)
_D_STATE = 128
_D_CONV = 4
_EXPAND = 4
_HEADDIM = 64
_CHUNK = 64


def _model_kwargs(config):
    kw = dict(sr=44100, win=2048, stride=512, feature_dim=128,
              num_repeat_mask=8, num_repeat_map=4, num_output=4)
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    return kw


def band_widths(sr: int, win: int):
    """Psychoacoustic band layout (reference ts_bs_mamba2.py:153-167)."""
    enc_dim = win // 2 + 1
    bw = lambda hz: int(np.floor(hz / (sr / 2.0) * enc_dim))
    widths = [bw(50)] * 20 + [bw(100)] * 10 + [bw(250)] * 8 + [bw(500)] * 8
    widths += [bw(1000)] * 8 + [bw(2000)] * 2
    widths.append(enc_dim - int(np.sum(widths)))
    return widths


# --------------------------------------------------------------------------
# Mamba2 core
# --------------------------------------------------------------------------

def mamba2_init(rng, d_model):
    d_inner = _EXPAND * d_model
    nheads = d_inner // _HEADDIM
    d_in_proj = 2 * d_inner + 2 * _D_STATE + nheads
    conv_dim = d_inner + 2 * _D_STATE
    k = iter(jax.random.split(rng, 8))
    return {
        "in_proj": L.kaiming_uniform(next(k), (d_in_proj, d_model), d_model),
        "conv_w": L.kaiming_uniform(next(k), (conv_dim, 1, _D_CONV), _D_CONV),
        "conv_b": L.kaiming_uniform(next(k), (conv_dim,), _D_CONV),
        "dt_bias": jax.random.uniform(next(k), (nheads,)),
        "A_log": jax.random.uniform(next(k), (nheads,)),
        "D": jax.random.uniform(next(k), (nheads,)),
        "norm_w": jnp.ones((d_inner,)),
        "out_proj": L.kaiming_uniform(next(k), (d_model, d_inner), d_inner),
    }


def mamba2_apply(p, u, precision=_HIGHEST):
    """u (B, L, D) -> (B, L, D) (reference ex_bi_mamba2.py:55-95)."""
    bsz, l, d_model = u.shape
    d_inner = _EXPAND * d_model
    nheads = d_inner // _HEADDIM

    a = -jnp.exp(p["A_log"])  # (H,)
    zxbcdt = jnp.einsum("bld,od->blo", u, p["in_proj"], precision=precision)
    z = zxbcdt[..., :d_inner]
    xbc = zxbcdt[..., d_inner : 2 * d_inner + 2 * _D_STATE]
    dt = jax.nn.softplus(zxbcdt[..., -nheads:] + p["dt_bias"])  # (B, L, H)

    # causal depthwise conv over L (pad left d_conv-1, torch truncates right)
    xbc = jnp.swapaxes(xbc, 1, 2)  # (B, C, L)
    xbc = jax.lax.conv_general_dilated(
        xbc, p["conv_w"], window_strides=(1,), padding=[(_D_CONV - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=xbc.shape[1], precision=precision,
    ) + p["conv_b"][None, :, None]
    xbc = jnp.swapaxes(xbc, 1, 2)
    xbc = xbc * jax.nn.sigmoid(xbc)  # silu

    x = xbc[..., :d_inner].reshape(bsz, l, nheads, _HEADDIM)
    b = xbc[..., d_inner : d_inner + _D_STATE][:, :, None, :]  # (B, L, 1, N)
    c = xbc[..., d_inner + _D_STATE :][:, :, None, :]

    # pad L to a chunk multiple (zero x contributes nothing; tail discarded)
    lpad = -l % _CHUNK
    if lpad:
        x = jnp.pad(x, ((0, 0), (0, lpad), (0, 0), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, lpad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, 0), (0, lpad), (0, 0), (0, 0)))
        dt_p = jnp.pad(dt, ((0, 0), (0, lpad), (0, 0)))
    else:
        dt_p = dt

    y = ssd(x * dt_p[..., None], a * dt_p, b, c, chunk_size=_CHUNK,
            precision=precision)
    y = y[:, :l]
    y = y + x[:, :l] * p["D"][None, None, :, None]
    y = y.reshape(bsz, l, d_inner)

    # gated RMSNorm (reference ex_bi_mamba2.py:13-21)
    y = y * (z * jax.nn.sigmoid(z))
    y = y * jax.lax.rsqrt(jnp.mean(y * y, axis=-1, keepdims=True) + 1e-5)
    y = y * p["norm_w"]
    return jnp.einsum("bld,od->blo", y, p["out_proj"], precision=precision)


def mamba_block_apply(p, x, precision=_HIGHEST):
    """Bidirectional: concat(fwd(x)+x, flip(bwd(flip(x)))+x) (ts_bs_mamba2.py:35-42)."""
    fwd = mamba2_apply(p["forward"], x, precision=precision)
    bwd = mamba2_apply(p["backward"], jnp.flip(x, axis=1), precision=precision)
    return jnp.concatenate([fwd + x, jnp.flip(bwd, axis=1) + x], axis=-1)


# --------------------------------------------------------------------------
# ResMamba / TAC / BSNet
# --------------------------------------------------------------------------

def _res_mamba_init(rng, n):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "norm": {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,))},
        "mamba": {"forward": mamba2_init(k1, n), "backward": mamba2_init(k2, n)},
        "proj": {"weight": L.kaiming_uniform(k3, (n, 2 * n), 2 * n),
                 "bias": L.kaiming_uniform(k4, (n,), 2 * n)},
    }


def _res_mamba_apply(p, x, precision=_HIGHEST):
    """(B, N, T) -> (B, N, T) (reference ts_bs_mamba2.py:104-111)."""
    y = L.group_norm(x, p["norm"], 1, eps=_EPS_F32)
    y = jnp.swapaxes(y, 1, 2)  # (B, T, N)
    y = mamba_block_apply(p["mamba"], y, precision=precision)
    y = L.linear(y, p["proj"], precision=precision)
    return x + jnp.swapaxes(y, 1, 2)


def _tac_init(rng, n, h):
    k = iter(jax.random.split(rng, 6))
    lin = lambda ci, co: {"weight": L.kaiming_uniform(next(k), (co, ci), ci),
                          "bias": L.kaiming_uniform(next(k), (co,), ci)}
    return {
        "norm": {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,))},
        "input": lin(n, h),
        "mean": lin(h, h),
        "output": lin(2 * h, n),
    }


def _tac_apply(p, x, precision=_HIGHEST):
    """Transform-average-concatenate over groups: (B, G, N, T)
    (reference ts_bs_mamba2.py:65-88)."""
    bsz, g, n, t = x.shape
    y = L.group_norm(x.reshape(bsz * g, n, t), p["norm"], 1, eps=_EPS_F32)
    y = y.reshape(bsz, g, n, t)
    y = jnp.transpose(y, (0, 3, 1, 2))  # (B, T, G, N)
    gi = jnp.tanh(L.linear(y, p["input"], precision=precision))  # (B, T, G, H)
    gm = jnp.tanh(L.linear(gi.mean(axis=2), p["mean"], precision=precision))
    gm = jnp.broadcast_to(gm[:, :, None, :], gi.shape)
    go = jnp.tanh(L.linear(jnp.concatenate([gi, gm], axis=-1), p["output"],
                           precision=precision))  # (B, T, G, N)
    return x + jnp.transpose(go, (0, 2, 3, 1))


def _bsnet_init(rng, n):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "band_rnn": _res_mamba_init(k1, n),
        "band_comm": _res_mamba_init(k2, n),
        "channel_comm": _tac_init(k3, n, 3 * n),
    }


def _bsnet_apply(p, x, nband, precision=_HIGHEST):
    """(B, nch, nband*N, T) (reference ts_bs_mamba2.py:124-138)."""
    bsz, nch, nn, t = x.shape
    n = nn // nband
    y = _res_mamba_apply(p["band_rnn"], x.reshape(bsz * nch * nband, n, t),
                         precision=precision)
    y = y.reshape(bsz * nch, nband, n, t)

    y = jnp.transpose(y, (0, 3, 2, 1)).reshape(bsz * nch * t, n, nband)
    y = _res_mamba_apply(p["band_comm"], y, precision=precision)
    y = jnp.transpose(y.reshape(bsz * nch, t, n, nband), (0, 3, 2, 1))

    y = y.reshape(bsz, nch, nband, n, t)
    y = jnp.swapaxes(y, 1, 2).reshape(bsz * nband, nch, n, t)
    y = _tac_apply(p["channel_comm"], y, precision=precision)
    y = jnp.swapaxes(y.reshape(bsz, nband, nch, n, t), 1, 2)
    return y.reshape(bsz, nch, nn, t)


# --------------------------------------------------------------------------
# Separator
# --------------------------------------------------------------------------

def init(rng, config):
    kw = _model_kwargs(config)
    widths = band_widths(kw["sr"], kw["win"])
    nband = len(widths)
    n = kw["feature_dim"]
    k_out = kw["num_output"]
    keys = iter(jax.random.split(rng, 16 + 4 * nband
                                 + kw["num_repeat_mask"] + kw["num_repeat_map"]))

    def bn(bw):
        kk = next(keys)
        k1, k2 = jax.random.split(kk)
        return {
            "norm": {"weight": jnp.ones((bw * 2,)), "bias": jnp.zeros((bw * 2,))},
            "conv": {"weight": L.kaiming_uniform(k1, (n, bw * 2), bw * 2),
                     "bias": L.kaiming_uniform(k2, (n,), bw * 2)},
        }

    def head(bw):
        kk = iter(jax.random.split(next(keys), 6))
        return {
            "norm": {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,))},
            "conv1": {"weight": L.kaiming_uniform(next(kk), (n * k_out, n), n),
                      "bias": L.kaiming_uniform(next(kk), (n * k_out,), n)},
            "conv2": {"weight": L.kaiming_uniform(next(kk), (n * k_out, n, 1), n),
                      "bias": L.kaiming_uniform(next(kk), (n * k_out,), n)},
            "conv3": {"weight": L.kaiming_uniform(next(kk), (bw * 4 * k_out, n, 1), n),
                      "bias": L.kaiming_uniform(next(kk), (bw * 4 * k_out,), n)},
        }

    return {
        "bn_mask": [bn(w) for w in widths],
        "bn_map": [bn(w) for w in widths],
        "separator_mask": [_bsnet_init(next(keys), n) for _ in range(kw["num_repeat_mask"])],
        "separator_map": [_bsnet_init(next(keys), n) for _ in range(kw["num_repeat_map"])],
        "in_conv": {"weight": L.kaiming_uniform(next(keys), (n, 2 * n), 2 * n),
                    "bias": L.kaiming_uniform(next(keys), (n,), 2 * n)},
        "mask": [head(w) for w in widths],
        "map": [head(w) for w in widths],
    }


def _head_apply(p, x, k_out, precision=_HIGHEST):
    """Per-band output head: (B', N, T) -> (B', bw*4*K, T).

    Sequential [GroupNorm, 1x1, Tanh, grouped 1x1, Tanh, grouped 1x1]
    (reference ts_bs_mamba2.py:199-205)."""
    y = L.group_norm(x, p["norm"], 1, eps=_EPS_F32)
    y = jnp.einsum("bnt,on->bot", y, p["conv1"]["weight"],
                   precision=precision) + p["conv1"]["bias"][None, :, None]
    y = jnp.tanh(y)
    y = L.conv1d(y, p["conv2"]["weight"], p["conv2"]["bias"], groups=k_out,
                 precision=precision)
    y = jnp.tanh(y)
    return L.conv1d(y, p["conv3"]["weight"], p["conv3"]["bias"], groups=k_out,
                    precision=precision)


def apply(params, config, x, precision=None, compute_dtype=None):
    """(B, ch, T) -> (B, num_output, ch, T).

    ``compute_dtype``: run the band bottlenecks / bi-Mamba separators /
    GLU heads in this dtype (bf16 on TPU); STFT/iSTFT and the complex
    mask application stay float32 (the SSD scan accumulates f32 in its
    fused kernel regardless)."""
    precision = net_precision(precision, compute_dtype)
    kw = _model_kwargs(config)
    widths = band_widths(kw["sr"], kw["win"])
    nband = len(widths)
    n = kw["feature_dim"]
    k_out = kw["num_output"]
    bsz, nch, nsample = x.shape

    window = hann_window(kw["win"], dtype=x.dtype)
    spec = stft_ri(x.reshape(bsz * nch, nsample), kw["win"], kw["stride"], window)
    t = spec.shape[-2]
    enc_dim = kw["win"] // 2 + 1

    # (B', 2, F, T) real/imag as channels
    spec_ri = jnp.stack([spec[..., 0], spec[..., 1]], axis=1)
    if compute_dtype is not None:
        spec_ri = spec_ri.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def bottleneck(bn_params, start, bw):
        sub = spec_ri[:, :, start : start + bw]  # (B', 2, bw, T)
        sub = sub.reshape(bsz * nch, bw * 2, t)
        y = L.group_norm(sub, bn_params["norm"], 1, eps=_EPS_F32)
        return jnp.einsum("bct,oc->bot", y, bn_params["conv"]["weight"],
                          precision=precision) + bn_params["conv"]["bias"][None, :, None]

    offsets = np.concatenate([[0], np.cumsum(widths)[:-1]])
    feat_mask = jnp.stack(
        [bottleneck(params["bn_mask"][i], int(offsets[i]), widths[i])
         for i in range(nband)], axis=1)  # (B', nband, N, T)
    feat_map = jnp.stack(
        [bottleneck(params["bn_map"][i], int(offsets[i]), widths[i])
         for i in range(nband)], axis=1)

    z = feat_mask.reshape(bsz, nch, nband * n, t)
    for bs_p in params["separator_mask"]:
        z = _bsnet_apply(bs_p, z, nband, precision=precision)
    sep_mask = z.reshape(bsz * nch, nband, n, t)

    combined = jnp.concatenate([feat_map, sep_mask], axis=2)  # (B', nband, 2N, T)
    combined = combined.reshape(bsz * nch * nband, 2 * n, t)
    combined = jnp.tanh(
        jnp.einsum("bct,oc->bot", combined, params["in_conv"]["weight"],
                   precision=precision) + params["in_conv"]["bias"][None, :, None])
    z = combined.reshape(bsz * nch, nband, n, t).reshape(bsz, nch, nband * n, t)
    for bs_p in params["separator_map"]:
        z = _bsnet_apply(bs_p, z, nband, precision=precision)
    sep_map = z.reshape(bsz * nch, nband, n, t)

    est_parts = []
    for i in range(nband):
        bw = widths[i]
        start = int(offsets[i])
        sub_re = spec[..., 0][:, start : start + bw]  # (B', bw, T)
        sub_im = spec[..., 1][:, start : start + bw]

        out = _head_apply(params["mask"][i], sep_mask[:, i], k_out, precision)
        out = out.astype(jnp.float32)  # masks apply to the f32 spectrum
        out = out.reshape(bsz * nch, 2, 2, k_out, bw, t)
        m = out[:, 0] * jax.nn.sigmoid(out[:, 1])  # (B', 2, K, bw, T)
        m_re, m_im = m[:, 0], m[:, 1]
        # force masks to sum to one across outputs (ts_bs_mamba2.py:280-284)
        m_re = m_re - (m_re.sum(axis=1, keepdims=True) - 1.0) / k_out
        m_im = m_im - m_im.sum(axis=1, keepdims=True) / k_out
        est_re = sub_re[:, None] * m_re - sub_im[:, None] * m_im
        est_im = sub_re[:, None] * m_im + sub_im[:, None] * m_re

        out2 = _head_apply(params["map"][i], sep_map[:, i], k_out, precision)
        out2 = out2.astype(jnp.float32)
        out2 = out2.reshape(bsz * nch, 2, 2, k_out, bw, t)
        mp = out2[:, 0] * jax.nn.sigmoid(out2[:, 1])
        est_parts.append(jnp.stack([est_re + mp[:, 0], est_im + mp[:, 1]], axis=-1))

    est = jnp.concatenate(est_parts, axis=2)  # (B', K, F, T, 2)
    est = est.reshape(bsz * nch * k_out, enc_dim, t, 2)
    wav = istft_ri(est, kw["win"], kw["stride"], window, length=nsample)
    wav = wav.reshape(bsz, nch, k_out, nsample)
    return jnp.swapaxes(wav, 1, 2)  # (B, K, ch, T)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    kw = _model_kwargs(config)
    widths = band_widths(kw["sr"], kw["win"])
    nband = len(widths)
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def wb(prefix, squeeze=False):
        w = take(f"{prefix}.weight")
        if squeeze:
            w = w[..., 0]
        return {"weight": w, "bias": take(f"{prefix}.bias")}

    def mamba(prefix):
        return {
            "in_proj": take(f"{prefix}.in_proj.weight"),
            "conv_w": take(f"{prefix}.conv1d.weight"),
            "conv_b": take(f"{prefix}.conv1d.bias"),
            "dt_bias": take(f"{prefix}.dt_bias"),
            "A_log": take(f"{prefix}.A_log"),
            "D": take(f"{prefix}.D"),
            "norm_w": take(f"{prefix}.norm.weight"),
            "out_proj": take(f"{prefix}.out_proj.weight"),
        }

    def res_mamba(prefix):
        return {
            "norm": wb(f"{prefix}.norm"),
            "mamba": {
                "forward": mamba(f"{prefix}.rnn.forward_mamba2"),
                "backward": mamba(f"{prefix}.rnn.backward_mamba2"),
            },
            "proj": wb(f"{prefix}.proj"),
        }

    def tac(prefix):
        return {
            "norm": wb(f"{prefix}.input_norm"),
            "input": wb(f"{prefix}.TAC_input.0"),
            "mean": wb(f"{prefix}.TAC_mean.0"),
            "output": wb(f"{prefix}.TAC_output.0"),
        }

    def bsnet(prefix):
        return {
            "band_rnn": res_mamba(f"{prefix}.band_rnn"),
            "band_comm": res_mamba(f"{prefix}.band_comm"),
            "channel_comm": tac(f"{prefix}.channel_comm"),
        }

    def bn(prefix):
        return {"norm": wb(f"{prefix}.0"), "conv": wb(f"{prefix}.1", squeeze=True)}

    def head(prefix):
        return {
            "norm": wb(f"{prefix}.0"),
            "conv1": wb(f"{prefix}.1", squeeze=True),
            "conv2": wb(f"{prefix}.3"),
            "conv3": wb(f"{prefix}.5"),
        }

    params = {
        "bn_mask": [bn(f"BN_mask.{i}") for i in range(nband)],
        "bn_map": [bn(f"BN_map.{i}") for i in range(nband)],
        "separator_mask": [bsnet(f"separator_mask.{i}")
                           for i in range(kw["num_repeat_mask"])],
        "separator_map": [bsnet(f"separator_map.{i}")
                          for i in range(kw["num_repeat_map"])],
        "in_conv": wb("in_conv", squeeze=True),
        "mask": [head(f"mask.{i}") for i in range(nband)],
        "map": [head(f"map.{i}") for i in range(nband)],
    }
    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
