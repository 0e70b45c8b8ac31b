"""SCNet (unofficial reimplementation variant, amanteur/SCNet-PyTorch).

Behavioral spec: reference models/scnet_unofficial/ (scnet.py:79-249,
modules/sd_encoder.py, modules/su_decoder.py, modules/dualpath_rnn.py,
utils.py). Differences from the official scnet: channels-last (B, F, T, C)
layout, kernel-1 strided down/upsampling with exact output-padding
arithmetic, conformer-style conv modules with SiLU, fusion by repeat+GLU
over channels-last, dual-path BiLSTM layers WITHOUT residual around the
RNN, and rFFT interleaving along the time axis (doubling the channel dim
on odd layers). The hann-windowed STFT uses win_length (unlike official
scnet's boxcar). The optional Mamba-v1 path is not supported (no public
checkpoint uses it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.fft import irdft_ortho, rdft_ortho, irdft, rdft
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST


def _kwargs(config):
    kw = dict(n_fft=4096, dims=[4, 32, 64, 128], bandsplit_ratios=[0.175, 0.392, 0.433],
              downsample_strides=[1, 4, 16], n_conv_modules=[3, 2, 1],
              n_rnn_layers=6, rnn_hidden_dim=128, n_sources=4, hop_length=1024,
              win_length=4096, stft_normalized=False, use_mamba=False)
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    if kw["use_mamba"]:
        # the reference's own use_mamba path cannot run: it passes
        # `d_expand=` to mamba_ssm's Mamba, whose kwarg is `expand`
        # (reference scnet_unofficial/modules/dualpath_rnn.py:183-184),
        # so it raises TypeError even with the CUDA package installed —
        # and no public checkpoint uses it
        raise NotImplementedError(
            "scnet_unofficial use_mamba is not supported: the reference's "
            "Mamba-v1 path is itself broken (dualpath_rnn.py:183-184 passes "
            "d_expand= to mamba_ssm.Mamba, which takes expand=) and no "
            "public checkpoint was trained with it")
    kw["dims"] = list(kw["dims"])
    return kw


def _intervals(splits):
    out, start = [], 0
    for s in splits:
        out.append((start, start + s))
        start += s
    return out


def _sd_shapes(kw):
    """compute_sd_layer_shapes (reference utils.py:86-119)."""
    input_shape = kw["n_fft"] // 2 + 1
    n_blocks = len(kw["dims"]) - 1
    subband_shapes, sd_intervals = [], []
    for _ in range(n_blocks):
        ratios = _intervals(kw["bandsplit_ratios"])
        band_shapes = [int(r * input_shape) - int(l * input_shape) for l, r in ratios]
        conv_shapes = [
            (bs + 2 * 0 - 1 * (1 - 1) - 1) // ds + 1
            for bs, ds in zip(band_shapes, kw["downsample_strides"])
        ]
        input_shape = sum(conv_shapes)
        subband_shapes.append(band_shapes)
        sd_intervals.append(_intervals(conv_shapes))
    return subband_shapes, sd_intervals


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config):
    kw = _kwargs(config)
    dims = kw["dims"]
    n_blocks = len(dims) - 1
    subband_shapes, sd_intervals = _sd_shapes(kw)
    keys = iter(jax.random.split(rng, 4096))

    def conv2d_w(ci, co, kh=1, kws=1, bias=True):
        p = {"weight": L.kaiming_uniform(next(keys), (co, ci, kh, kws), ci * kh * kws)}
        if bias:
            p["bias"] = L.kaiming_uniform(next(keys), (co,), ci * kh * kws)
        return p

    def conv1d_w(ci, co, k, groups=1, bias=False):
        p = {"weight": L.kaiming_uniform(next(keys), (co, ci // groups, k),
                                         (ci // groups) * k)}
        if bias:
            p["bias"] = L.kaiming_uniform(next(keys), (co,), (ci // groups) * k)
        return p

    def norm_w(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def conv_module(dim):
        hidden = dim // 4
        return {
            "norm": norm_w(dim),
            "conv_in": conv1d_w(dim, 2 * hidden, 3),
            "conv_dw": conv1d_w(hidden, hidden, 3, groups=hidden),
            "norm2": norm_w(hidden),
            "conv_out": conv1d_w(hidden, dim, 1),
        }

    sd_blocks = []
    for i in range(n_blocks):
        layers = []
        for bi in range(3):
            layers.append({
                "down": conv2d_w(dims[i], dims[i + 1]),
                "convs": [conv_module(dims[i + 1])
                          for _ in range(kw["n_conv_modules"][bi])],
            })
        sd_blocks.append({"layers": layers,
                          "global_conv": conv2d_w(dims[i + 1], dims[i + 1])})

    def lstm_dir(d, h):
        k = iter(jax.random.split(next(keys), 4))
        return {"weight_ih": L.kaiming_uniform(next(k), (4 * h, d), h),
                "weight_hh": L.kaiming_uniform(next(k), (4 * h, h), h),
                "bias_ih": L.kaiming_uniform(next(k), (4 * h,), h),
                "bias_hh": L.kaiming_uniform(next(k), (4 * h,), h)}

    def rnn_module(d, h):
        kk = jax.random.split(next(keys), 2)
        return {
            "norm": norm_w(d),
            "lstm": {"fwd": lstm_dir(d, h), "bwd": lstm_dir(d, h)},
            "fc": {"weight": L.kaiming_uniform(kk[0], (d, 2 * h), 2 * h),
                   "bias": L.kaiming_uniform(kk[1], (d,), 2 * h)},
        }

    dp_layers = []
    d, h = dims[-1], kw["rnn_hidden_dim"]
    for i in range(1, kw["n_rnn_layers"] + 1):
        dd, hh = (d, h) if i % 2 == 1 else (2 * d, 2 * h)
        dp_layers.append({"time": rnn_module(dd, hh), "freq": rnn_module(dd, hh)})

    su_blocks = []
    for i in reversed(range(n_blocks)):
        out_dim = dims[i] if i != 0 else dims[i] * kw["n_sources"]
        su_blocks.append({
            "fusion": conv2d_w(dims[i + 1] * 2, dims[i + 1] * 2, 3, 1),
            # ConvTranspose2d weights IOHW
            "ups": [{"weight": L.kaiming_uniform(next(keys), (dims[i + 1], out_dim, 1, 1),
                                                 dims[i + 1]),
                     "bias": L.kaiming_uniform(next(keys), (out_dim,), dims[i + 1])}
                    for _ in range(3)],
        })

    return {"sd_blocks": sd_blocks, "dualpath": dp_layers, "su_blocks": su_blocks}


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _conv_module_apply(p, x, precision):
    """(B', T, D) residual conformer-ish conv stack (sd_encoder.py:56-135)."""
    y = jnp.swapaxes(x, 1, 2)  # (B', D, T)
    z = L.group_norm(y, p["norm"], 1)
    z = L.conv1d(z, p["conv_in"]["weight"], p["conv_in"].get("bias"), padding=1,
                 precision=precision)
    a, g = jnp.split(z, 2, axis=1)
    z = a * jax.nn.sigmoid(g)
    hidden = z.shape[1]
    z = L.conv1d(z, p["conv_dw"]["weight"], p["conv_dw"].get("bias"), padding=1,
                 groups=hidden, precision=precision)
    z = L.group_norm(z, p["norm2"], 1)
    z = jax.nn.silu(z)
    z = L.conv1d(z, p["conv_out"]["weight"], p["conv_out"].get("bias"),
                 precision=precision)
    return jnp.swapaxes(y + z, 1, 2)


def _sd_block_apply(p, x, kw, precision):
    """(B, F, T, C) -> (out, skip) (sd_encoder.py:216-285)."""
    intervals = _intervals(kw["bandsplit_ratios"])
    f = x.shape[1]
    outs = []
    for bi, (lo, hi) in enumerate(intervals):
        lp = p["layers"][bi]
        xb = x[:, int(lo * f) : int(hi * f)]
        xb = jnp.transpose(xb, (0, 3, 1, 2))  # (B, C, F', T)
        xb = L.conv2d(xb, lp["down"]["weight"], lp["down"]["bias"],
                      stride=(kw["downsample_strides"][bi], 1), precision=precision)
        xb = jax.nn.gelu(xb, approximate=False)
        xb = jnp.transpose(xb, (0, 2, 3, 1))  # (B, F'', T, C')
        b, ff, t, c = xb.shape
        flat = xb.reshape(b * ff, t, c)
        for cm in lp["convs"]:
            flat = _conv_module_apply(cm, flat, precision)
        outs.append(flat.reshape(b, ff, t, c))
    skip = jnp.concatenate(outs, axis=1)
    y = jnp.transpose(skip, (0, 3, 1, 2))
    y = L.conv2d(y, p["global_conv"]["weight"], p["global_conv"]["bias"],
                 precision=precision)
    return jnp.transpose(y, (0, 2, 3, 1)), skip


def _rnn_module_apply(p, x, precision):
    """(B', T, D): groupnorm -> BiLSTM -> fc (NO residual, dualpath_rnn.py:62-80)."""
    y = jnp.swapaxes(x, 1, 2)
    y = L.group_norm(y, p["norm"], 1)
    y = jnp.swapaxes(y, 1, 2)
    y = L.bilstm(y, p["lstm"], precision=precision)
    return L.linear(y, p["fc"], precision=precision)


def _dualpath_apply(layers, x, precision):
    """(B, F, T, D) with alternating rfft/irfft along time (dualpath_rnn.py:203-228)."""
    time_dim = x.shape[2]
    for i, p in enumerate(layers, start=1):
        b, f, t, d = x.shape
        y = _rnn_module_apply(p["time"], x.reshape(b * f, t, d), precision)
        x = jnp.transpose(y.reshape(b, f, t, d), (0, 2, 1, 3))
        y = _rnn_module_apply(p["freq"], x.reshape(b * t, f, d), precision)
        x = jnp.transpose(y.reshape(b, t, f, d), (0, 2, 1, 3))
        if i % 2 == 1:
            # forward rfft along time (torch default 'backward' norm):
            # (B,F,T,D) -> complex (B,F,K,D) -> view_as_real -> (B,F,K,D*2)
            z = jnp.swapaxes(x, 2, 3)  # (B, F, D, T)
            spec = rdft(z)  # (B, F, D, K, 2)
            spec = jnp.transpose(spec, (0, 1, 3, 2, 4))  # (B, F, K, D, 2)
            x = spec.reshape(b, f, -1, 2 * d)
        else:  # inverse rfft along time
            bb, f2, t2, d2 = x.shape
            ri = x.reshape(bb, f2, t2, d2 // 2, 2)
            ri = jnp.transpose(ri, (0, 1, 3, 2, 4))  # (B, F, D, K, 2)
            z = irdft(ri, time_dim)
            x = jnp.swapaxes(z, 2, 3)  # (B, F, T, D)
    return x


def apply(params, config, x, precision=None):
    """(B, C, T) -> (B, n_sources, C, T)."""
    precision = precision or _HIGHEST
    kw = _kwargs(config)
    b, ch, length = x.shape
    hop = kw["hop_length"]

    stft_pad = hop - length % hop
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, stft_pad)))
    window = hann_window(kw["win_length"], dtype=x.dtype)
    spec = stft_ri(xp.reshape(b * ch, -1), kw["n_fft"], hop, window,
                   win_length=kw["win_length"], normalized=kw["stft_normalized"])
    f, t = spec.shape[1], spec.shape[2]
    # 'b c f t r -> b f t (c r)' with c major
    z = spec.reshape(b, ch, f, t, 2)
    z = jnp.transpose(z, (0, 2, 3, 1, 4)).reshape(b, f, t, ch * 2)

    skips = []
    for blk in params["sd_blocks"]:
        z, skip = _sd_block_apply(blk, z, kw, precision)
        skips.append(skip)

    z = _dualpath_apply(params["dualpath"], z, precision)

    subband_shapes, sd_intervals = _sd_shapes(kw)
    n_blocks = len(kw["dims"]) - 1
    for i, blk in enumerate(params["su_blocks"]):
        level = n_blocks - 1 - i
        skip = skips[level]
        # fusion: (x + skip) repeated on channels, conv (k=(3,1)), GLU
        y = z + skip
        y = jnp.concatenate([y, y], axis=-1)
        y = jnp.transpose(y, (0, 3, 1, 2))
        y = L.conv2d(y, blk["fusion"]["weight"], blk["fusion"]["bias"],
                     padding=(1, 0), precision=precision)
        y = jnp.transpose(y, (0, 2, 3, 1))
        a, g = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(g)
        # subband upsampling
        outs = []
        for bi in range(3):
            lo, hi = sd_intervals[level][bi]
            target = subband_shapes[level][bi]
            stride = kw["downsample_strides"][bi]
            xb = y[:, lo:hi]
            xb = jnp.transpose(xb, (0, 3, 1, 2))
            # ConvTranspose2d output_padding extends the output BEFORE the
            # bias add, so the extra freq rows carry the bias, not zeros
            # (caught by the true-reference oracle): pad unbiased, then bias
            up = L.conv_transpose2d(xb, blk["ups"][bi]["weight"],
                                    None, stride=(stride, 1),
                                    precision=precision)
            cur = up.shape[2]
            if cur < target:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, target - cur), (0, 0)))
            up = up + blk["ups"][bi]["bias"][None, :, None, None]
            outs.append(jnp.transpose(up[:, :, :target], (0, 2, 3, 1)))
        z = jnp.concatenate(outs, axis=1)

    # 'b f t (c r n)' -> (b n c f t r): channel packing is (c, r, n) minor-major
    n_src = kw["n_sources"]
    z = z.reshape(b, f, t, ch, 2, n_src)
    z = jnp.transpose(z, (0, 5, 3, 1, 2, 4))  # (B, N, C, F, T, 2)
    wav = istft_ri(z.reshape(b * n_src * ch, f, t, 2), kw["n_fft"], hop, window,
                   win_length=kw["win_length"], normalized=kw["stft_normalized"])
    wav = wav.reshape(b, n_src, ch, -1)
    return wav[..., :length]


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    kw = _kwargs(config)
    n_blocks = len(kw["dims"]) - 1
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def maybe_wb(prefix):
        p = {"weight": take(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            p["bias"] = take(f"{prefix}.bias")
        return p

    def conv_module(prefix):
        return {
            "norm": maybe_wb(f"{prefix}.sequential.0"),
            "conv_in": maybe_wb(f"{prefix}.sequential.1"),
            "conv_dw": maybe_wb(f"{prefix}.sequential.3"),
            "norm2": maybe_wb(f"{prefix}.sequential.4"),
            "conv_out": maybe_wb(f"{prefix}.sequential.6"),
        }

    sd_blocks = []
    for i in range(n_blocks):
        layers = []
        for bi in range(3):
            p = f"sd_blocks.{i}.sd_layers.{bi}"
            layers.append({
                "down": maybe_wb(f"{p}.downsample.conv"),
                "convs": [conv_module(f"{p}.conv_modules.{ci}")
                          for ci in range(kw["n_conv_modules"][bi])],
            })
        sd_blocks.append({"layers": layers,
                          "global_conv": maybe_wb(f"sd_blocks.{i}.global_conv2d")})

    def rnn_module(prefix):
        return {
            "norm": maybe_wb(f"{prefix}.groupnorm"),
            "lstm": {
                d: {wn: take(f"{prefix}.rnn.{wn}_l0{suf}")
                    for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
                for d, suf in (("fwd", ""), ("bwd", "_reverse"))
            },
            "fc": maybe_wb(f"{prefix}.fc"),
        }

    dualpath = []
    for i in range(kw["n_rnn_layers"]):
        dualpath.append({
            "time": rnn_module(f"dualpath_blocks.layers.{i}.0"),
            "freq": rnn_module(f"dualpath_blocks.layers.{i}.1"),
        })

    su_blocks = []
    for i in range(n_blocks):
        su_blocks.append({
            "fusion": maybe_wb(f"su_blocks.{i}.fusion_layer.conv"),
            "ups": [maybe_wb(f"su_blocks.{i}.su_layers.{bi}.upsample.conv")
                    for bi in range(3)],
        })

    params = {"sd_blocks": sd_blocks, "dualpath": dualpath, "su_blocks": su_blocks}
    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
