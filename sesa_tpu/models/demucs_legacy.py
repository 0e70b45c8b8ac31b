"""Legacy time-domain Demucs (v2 architecture, demucs-package layout).

The reference's htdemucs loader dispatches on the YAML ``model`` key to one
of demucs / hdemucs / htdemucs (reference models/demucs4ht.py:696-713);
``demucs`` resolves to ``demucs.demucs.Demucs`` from the external demucs v4
package. This is the native JAX port of that class: a 1-D conv U-Net over
the raw waveform with julius-style x2 sinc resampling around it, DConv
residual branches (with skip-BLSTM and LocalState decay-attention inserts
at the deep layers), an optional model-level BLSTM bottleneck, GLU rewrite
convolutions and mono-std normalization.

Parity: tests/test_demucs_legacy.py checks conversion + forward against the
hand-written oracle tests/oracles/torch_demucs_legacy.py (the demucs
package is unavailable offline; the oracle documents the reconstruction
and the converter consumes every checkpoint key, failing loudly on drift).

TPU notes: the hot ops are plain strided 1-D convolutions — XLA maps them
onto the MXU directly. The LSTM inserts run as ``lax.scan`` cells with the
input projections hoisted into single GEMMs (layers.lstm); LocalState's
T x T decay attention stays an einsum (T <= ~700 at the depths where it
appears). Resampling is a polyphase conv with a precomputed sinc bank.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from sesa_tpu.models import layers as L
from sesa_tpu.ops.prec import net_precision

_HIGHEST = jax.lax.Precision.HIGHEST


def kwargs_from_config(config):
    """Demucs(**extra, **config.demucs) (reference demucs4ht.py:696-713)."""
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    kw = dict(
        channels=64, growth=2.0, depth=6, rewrite=True, lstm_layers=0,
        kernel_size=8, stride=4, context=1, gelu=True, glu=True,
        norm_starts=4, norm_groups=4, dconv_mode=1, dconv_depth=2,
        dconv_comp=4, dconv_attn=4, dconv_lstm=4, dconv_init=1e-4,
        normalize=True, resample=True,
    )
    kw.update({k: v for k, v in (cfg.get("demucs", {}) or {}).items() if k in kw})
    training = cfg.get("training", {}) or {}
    kw["sources"] = list(training.get("instruments",
                                      ["drums", "bass", "other", "vocals"]))
    kw["audio_channels"] = int(training.get("channels", 2))
    if not kw["gelu"] or not kw["glu"]:
        raise NotImplementedError(
            "demucs with gelu=False/glu=False has no known checkpoints; "
            "only the default GELU+GLU configuration is implemented")
    return kw


def valid_length(length, kw):
    if kw["resample"]:
        length *= 2
    for _ in range(kw["depth"]):
        length = math.ceil((length - kw["kernel_size"]) / kw["stride"]) + 1
        length = max(1, length)
    for _ in range(kw["depth"]):
        length = (length - 1) * kw["stride"] + kw["kernel_size"]
    if kw["resample"]:
        length = math.ceil(length / 2)
    return int(length)


# --------------------------------------------------------------------------
# julius-style x2 resampling (sinc bank, per-phase sum-normalized)
# --------------------------------------------------------------------------

def _resample_kernel(old_sr, new_sr, zeros=24, rolloff=0.945):
    sr = min(new_sr, old_sr) * rolloff
    width = int(math.ceil(zeros * old_sr / sr))
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros) * math.pi
        window = np.cos(t / zeros / 2) ** 2
        kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
        kernel = kernel * window
        kernels.append(kernel / kernel.sum())
    return np.stack(kernels).astype(np.float32)[:, None, :], width


def _resample(x, old_sr, new_sr, precision=_HIGHEST):
    """(B, C, T) -> (B, C, T*new/old); julius.resample_frac semantics."""
    if old_sr == new_sr:
        return x
    kernel, width = _resample_kernel(old_sr, new_sr)
    b, c, length = x.shape
    y = x.reshape(-1, 1, length)
    y = jnp.pad(y, ((0, 0), (0, 0), (width, width + old_sr)), mode="edge")
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(kernel), (old_sr,), [(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision)
    y = jnp.swapaxes(y, 1, 2).reshape(b, c, -1)
    return y[..., : int(new_sr * length / old_sr)]


def center_trim(x, length):
    delta = x.shape[-1] - length
    return x[..., delta // 2: x.shape[-1] - (delta - delta // 2)]


# --------------------------------------------------------------------------
# BLSTM (torch 2-layer bidirectional + linear; optional 200-step framing)
# --------------------------------------------------------------------------

def _blstm(p, x, max_steps=None, skip=False, precision=_HIGHEST):
    """(B, C, T) -> (B, C, T). p: {"layers": [{"fwd","bwd"}...], "linear"}."""
    b, c, t = x.shape
    framed = max_steps is not None and t > max_steps
    y_in = x
    if framed:
        width = max_steps
        stride = width // 2
        nframes = -(-t // stride)
        tgt = (nframes - 1) * stride + width
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, tgt - t)))
        starts = np.arange(nframes) * stride
        frames = jnp.stack([xp[:, :, s: s + width] for s in starts], axis=1)
        x = frames.reshape(b * nframes, c, width)
    h = jnp.swapaxes(x, 1, 2)  # (B', T', C)
    for lp in p["layers"]:
        h = L.bilstm(h, lp, precision=precision)
    h = L.linear(h, p["linear"], precision=precision)
    out = jnp.swapaxes(h, 1, 2)
    if framed:
        frames = out.reshape(b, nframes, c, width)
        limit = stride // 2
        parts = []
        for k in range(nframes):
            if k == 0:
                parts.append(frames[:, k, :, :-limit])
            elif k == nframes - 1:
                parts.append(frames[:, k, :, limit:])
            else:
                parts.append(frames[:, k, :, limit:-limit])
        out = jnp.concatenate(parts, axis=-1)[..., :t]
    if skip:
        out = out + y_in
    return out


# --------------------------------------------------------------------------
# LocalState decay attention (demucs/demucs.py LocalState)
# --------------------------------------------------------------------------

def _local_state(p, x, heads=4, ndecay=4, precision=_HIGHEST):
    b, c, t = x.shape

    def c1(name):
        return L.conv1d(x, p[name]["weight"], p[name]["bias"],
                        precision=precision)

    idx = jnp.arange(t, dtype=x.dtype)
    delta = idx[:, None] - idx[None, :]
    queries = c1("query").reshape(b, heads, -1, t)
    keys = c1("key").reshape(b, heads, -1, t)
    dots = jnp.einsum("bhct,bhcs->bhts", keys, queries, precision=precision)
    dots = dots / (keys.shape[2] ** 0.5)
    decays = jnp.arange(1, ndecay + 1, dtype=x.dtype)
    decay_q = jax.nn.sigmoid(c1("query_decay").reshape(b, heads, -1, t)) / 2
    decay_kernel = -decays[:, None, None] * jnp.abs(delta) / (ndecay ** 0.5)
    dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel, decay_q,
                             precision=precision)
    dots = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, dots)
    weights = jax.nn.softmax(dots, axis=2)
    content = c1("content").reshape(b, heads, -1, t)
    result = jnp.einsum("bhts,bhct->bhcs", weights, content,
                        precision=precision)
    result = result.reshape(b, -1, t)
    return x + L.conv1d(result, p["proj"]["weight"], p["proj"]["bias"],
                        precision=precision)


# --------------------------------------------------------------------------
# DConv with lstm/attn inserts
# --------------------------------------------------------------------------

def _dconv(p, x, precision=_HIGHEST):
    for d, blk in enumerate(p):
        dilation = 2 ** d
        k = blk["conv1"]["weight"].shape[-1]
        pad = dilation * (k // 2)
        y = jax.lax.conv_general_dilated(
            x, blk["conv1"]["weight"], (1,), [(pad, pad)],
            rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
            precision=precision) + blk["conv1"]["bias"][None, :, None]
        y = L.group_norm(y, blk["gn1"], 1)
        y = jax.nn.gelu(y, approximate=False)
        if "lstm" in blk:
            y = _blstm(blk["lstm"], y, max_steps=200, skip=True,
                       precision=precision)
        if "attn" in blk:
            y = _local_state(blk["attn"], y, precision=precision)
        y = L.conv1d(y, blk["conv2"]["weight"], blk["conv2"]["bias"],
                     precision=precision)
        y = L.group_norm(y, blk["gn2"], 1)
        a, g = jnp.split(y, 2, axis=1)
        y = a * jax.nn.sigmoid(g)
        x = x + y * blk["scale"][None, :, None]
    return x


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _channel_plan(kw):
    plan = []
    cin = kw["audio_channels"]
    ch = kw["channels"]
    for index in range(kw["depth"]):
        plan.append((cin, ch))
        cin = ch
        ch = int(kw["growth"] * ch)
    return plan


def init(rng, config):
    kw = kwargs_from_config(config)
    keys = iter(jax.random.split(rng, 4096))

    def conv(ci, co, k):
        return {"weight": L.kaiming_uniform(next(keys), (co, ci, k), ci * k),
                "bias": jnp.zeros((co,))}

    def gn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def lstm_layer(ci, h):
        def side():
            return {"weight_ih": L.kaiming_uniform(next(keys), (4 * h, ci), ci),
                    "weight_hh": L.kaiming_uniform(next(keys), (4 * h, h), h),
                    "bias_ih": jnp.zeros((4 * h,)),
                    "bias_hh": jnp.zeros((4 * h,))}
        return {"fwd": side(), "bwd": side()}

    def blstm(c, layers):
        return {"layers": [lstm_layer(c if i == 0 else 2 * c, c)
                           for i in range(layers)],
                "linear": {"weight": L.kaiming_uniform(next(keys), (c, 2 * c), 2 * c),
                           "bias": jnp.zeros((c,))}}

    def dconv(c, attn, lstm):
        hidden = int(c / kw["dconv_comp"])
        blocks = []
        for _ in range(kw["dconv_depth"]):
            blk = {"conv1": conv(c, hidden, 3), "gn1": gn(hidden),
                   "conv2": conv(hidden, 2 * c, 1), "gn2": gn(2 * c),
                   "scale": jnp.full((c,), kw["dconv_init"])}
            if lstm:
                blk["lstm"] = blstm(hidden, 2)
            if attn:
                blk["attn"] = {"content": conv(hidden, hidden, 1),
                               "query": conv(hidden, hidden, 1),
                               "key": conv(hidden, hidden, 1),
                               "query_decay": conv(hidden, 4 * 4, 1),
                               "proj": conv(hidden, hidden, 1)}
            blocks.append(blk)
        return blocks

    plan = _channel_plan(kw)
    n_src = len(kw["sources"])
    encoder, decoder = [], []
    for index, (cin, ch) in enumerate(plan):
        normed = index >= kw["norm_starts"]
        attn = index >= kw["dconv_attn"]
        lstm = index >= kw["dconv_lstm"]
        e = {"conv": conv(cin, ch, kw["kernel_size"])}
        if normed:
            e["norm"] = gn(ch)
        if kw["dconv_mode"] & 1:
            e["dconv"] = dconv(ch, attn, lstm)
        if kw["rewrite"]:
            e["rewrite"] = conv(ch, 2 * ch, 1)
            if normed:
                e["rewrite_norm"] = gn(2 * ch)
        encoder.append(e)

        cout = cin if index > 0 else n_src * kw["audio_channels"]
        d = {}
        if kw["rewrite"]:
            d["rewrite"] = conv(ch, 2 * ch, 2 * kw["context"] + 1)
            if normed:
                d["rewrite_norm"] = gn(2 * ch)
        if kw["dconv_mode"] & 2:
            d["dconv"] = dconv(ch, attn, lstm)
        d["tconv"] = {"weight": L.kaiming_uniform(
            next(keys), (ch, cout, kw["kernel_size"]), ch * kw["kernel_size"]),
            "bias": jnp.zeros((cout,))}
        if index > 0 and normed:
            d["norm"] = gn(cout)
        decoder.insert(0, d)

    params = {"encoder": encoder, "decoder": decoder}
    if kw["lstm_layers"]:
        params["lstm"] = blstm(plan[-1][1], kw["lstm_layers"])
    return params


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def apply(params, config, mix, precision=None, compute_dtype=None):
    """(B, C, T) -> (B, S, C, T); reference demucs.demucs.Demucs.forward."""
    kw = kwargs_from_config(config)
    prec = net_precision(precision, compute_dtype)
    x = mix
    length = x.shape[-1]

    if kw["normalize"]:
        mono = mix.mean(axis=1, keepdims=True)
        mean = mono.mean(axis=-1, keepdims=True)
        std = mono.std(axis=-1, keepdims=True, ddof=1)
        x = (x - mean) / (1e-5 + std)
    else:
        mean = std = None

    delta = valid_length(length, kw) - length
    x = jnp.pad(x, ((0, 0), (0, 0), (delta // 2, delta - delta // 2)))
    if kw["resample"]:
        x = _resample(x, 1, 2, precision=prec)

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda a: a.astype(compute_dtype)
                              if a.dtype == jnp.float32 else a, params)

    saved = []
    for index, e in enumerate(params["encoder"]):
        x = L.conv1d(x, e["conv"]["weight"], e["conv"]["bias"],
                     stride=kw["stride"], precision=prec)
        if "norm" in e:
            x = L.group_norm(x, e["norm"], kw["norm_groups"])
        x = jax.nn.gelu(x, approximate=False)
        if "dconv" in e:
            x = _dconv(e["dconv"], x, precision=prec)
        if "rewrite" in e:
            x = L.conv1d(x, e["rewrite"]["weight"], e["rewrite"]["bias"],
                         precision=prec)
            if "rewrite_norm" in e:
                x = L.group_norm(x, e["rewrite_norm"], kw["norm_groups"])
            a, g = jnp.split(x, 2, axis=1)
            x = a * jax.nn.sigmoid(g)
        saved.append(x)

    if "lstm" in params:
        x = _blstm(params["lstm"], x, precision=prec)

    for i, d in enumerate(params["decoder"]):
        skip = center_trim(saved.pop(-1), x.shape[-1])
        x = x + skip
        if "rewrite" in d:
            k = d["rewrite"]["weight"].shape[-1]
            x = L.conv1d(x, d["rewrite"]["weight"], d["rewrite"]["bias"],
                         padding=k // 2, precision=prec)
            if "rewrite_norm" in d:
                x = L.group_norm(x, d["rewrite_norm"], kw["norm_groups"])
            a, g = jnp.split(x, 2, axis=1)
            x = a * jax.nn.sigmoid(g)
        if "dconv" in d:
            x = _dconv(d["dconv"], x, precision=prec)
        w = jnp.flip(d["tconv"]["weight"], axis=-1).transpose(1, 0, 2)
        kk = w.shape[-1]
        x = jax.lax.conv_general_dilated(
            x, w, (1,), [(kk - 1, kk - 1)], lhs_dilation=(kw["stride"],),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec,
        ) + d["tconv"]["bias"][None, :, None]
        if "norm" in d:
            x = L.group_norm(x, d["norm"], kw["norm_groups"])
        if i < len(params["decoder"]) - 1:
            x = jax.nn.gelu(x, approximate=False)

    if kw["resample"]:
        x = _resample(x, 2, 1, precision=prec)

    x = x.astype(jnp.float32)
    if kw["normalize"]:
        x = x * std + mean
    x = center_trim(x, length)
    b = x.shape[0]
    return x.reshape(b, len(kw["sources"]), kw["audio_channels"], length)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    """Map a demucs-package Demucs state dict onto this pytree.

    Sequential index scheme (demucs/demucs.py): encoder.{i} = [conv, norm,
    act, DConv?, rewrite, norm, GLU]; decoder.{i} = [rewrite, norm, GLU,
    DConv?, ConvTranspose1d, norm, act]; DConv layers = [conv, GN, act,
    BLSTM?, LocalState?, conv1x1, GN, GLU, LayerScale] (Identity norms
    below norm_starts hold their index but carry no keys)."""
    kw = kwargs_from_config(config)
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def conv(pfx):
        return {"weight": take(pfx + ".weight"), "bias": take(pfx + ".bias")}

    def gn(pfx):
        return {"weight": take(pfx + ".weight"), "bias": take(pfx + ".bias")}

    def lstm_params(pfx, layers):
        out = {"layers": []}
        for li in range(layers):
            def side(suffix):
                return {"weight_ih": take(f"{pfx}.lstm.weight_ih_l{li}{suffix}"),
                        "weight_hh": take(f"{pfx}.lstm.weight_hh_l{li}{suffix}"),
                        "bias_ih": take(f"{pfx}.lstm.bias_ih_l{li}{suffix}"),
                        "bias_hh": take(f"{pfx}.lstm.bias_hh_l{li}{suffix}")}
            out["layers"].append({"fwd": side(""), "bwd": side("_reverse")})
        out["linear"] = {"weight": take(pfx + ".linear.weight"),
                         "bias": take(pfx + ".linear.bias")}
        return out

    def dconv(pfx, attn, lstm):
        blocks = []
        for d in range(kw["dconv_depth"]):
            p = f"{pfx}.layers.{d}"
            j = 3
            blk = {"conv1": conv(p + ".0"), "gn1": gn(p + ".1")}
            if lstm:
                blk["lstm"] = lstm_params(f"{p}.{j}", 2)
                j += 1
            if attn:
                blk["attn"] = {name: conv(f"{p}.{j}.{name}") for name in
                               ("content", "query", "key", "query_decay", "proj")}
                j += 1
            blk["conv2"] = conv(f"{p}.{j}")
            blk["gn2"] = gn(f"{p}.{j + 1}")
            blk["scale"] = take(f"{p}.{j + 3}.scale")
            blocks.append(blk)
        return blocks

    plan = _channel_plan(kw)
    encoder, decoder = [], []
    for index in range(kw["depth"]):
        normed = index >= kw["norm_starts"]
        attn = index >= kw["dconv_attn"]
        lstm = index >= kw["dconv_lstm"]

        e = {"conv": conv(f"encoder.{index}.0")}
        if normed:
            e["norm"] = gn(f"encoder.{index}.1")
        j = 3
        if kw["dconv_mode"] & 1:
            e["dconv"] = dconv(f"encoder.{index}.{j}", attn, lstm)
            j += 1
        if kw["rewrite"]:
            e["rewrite"] = conv(f"encoder.{index}.{j}")
            if normed:
                e["rewrite_norm"] = gn(f"encoder.{index}.{j + 1}")
        encoder.append(e)

        # decoder.{di} where di = depth-1-index (built with insert(0))
        di = kw["depth"] - 1 - index
        d = {}
        j = 0
        if kw["rewrite"]:
            d["rewrite"] = conv(f"decoder.{di}.0")
            if normed:
                d["rewrite_norm"] = gn(f"decoder.{di}.1")
            j = 3
        if kw["dconv_mode"] & 2:
            d["dconv"] = dconv(f"decoder.{di}.{j}", attn, lstm)
            j += 1
        d["tconv"] = conv(f"decoder.{di}.{j}")
        if index > 0 and normed:
            d["norm"] = gn(f"decoder.{di}.{j + 1}")
        decoder.insert(0, d)

    params = {"encoder": encoder, "decoder": decoder}
    if kw["lstm_layers"]:
        params["lstm"] = lstm_params("lstm", kw["lstm_layers"])

    unused = set(sd) - used
    if unused:
        raise ValueError(
            f"unconsumed demucs checkpoint keys: {sorted(unused)[:10]} "
            f"(+{max(0, len(unused) - 10)} more) — layout differs from the "
            "demucs-package Demucs; refusing to load partially.")
    return params
