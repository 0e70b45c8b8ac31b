"""HTDemucs — hybrid transformer Demucs (time + spectrogram dual branch).

Behavioral spec: reference models/demucs4ht.py:28-713 (top-level forward,
STFT conventions, normalization, CaC masking, branch merge logic are all
in-repo); the layer modules (HEncLayer/HDecLayer/DConv/LayerScale/
ScaledEmbedding/CrossTransformerEncoder) follow the demucs-v4 architecture
those checkpoints were trained with. Output modes: ``cac=True``
(complex-as-channels, what every published checkpoint uses) and
``cac=False`` magnitude models via Wiener EM filtering or the mix-phase
soft mask (``wiener_iters < 0``).

Pipeline: reflect-padded STFT (hop = nfft/4, trimmed so frames align with
the time branch strides) → CaC channels, per-sample normalization → four
strided freq-encoder layers (with DConv residual branches and a scaled
frequency embedding after layer 0) in parallel with four time-encoder
layers → 5-layer cross-domain transformer (sinusoidal 2D/1D embeddings,
pre-norm layers with LayerScale, alternating self/cross attention) →
mirrored decoders with skip connections → spectral output re-scaled and
iSTFT'd, summed with the time-branch output.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri
from sesa_tpu.ops.wiener import wiener_ri
from sesa_tpu.ops.prec import net_precision

_HIGHEST = jax.lax.Precision.HIGHEST


def _kwargs(config):
    """HTDemucs(**extra, **config.htdemucs) (reference demucs4ht.py:696-713)."""
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    variant = cfg.get("model", "htdemucs")
    if variant not in ("htdemucs", "hdemucs"):
        # reference get_model dispatches demucs/hdemucs/htdemucs
        # (demucs4ht.py:696-713); 'demucs' routes to the native legacy port
        # (models/demucs_legacy.py) before reaching here
        raise NotImplementedError(
            f"model variant {variant!r} is not implemented: 'htdemucs', "
            "'hdemucs' and the legacy time-domain 'demucs' are supported")
    if variant == "hdemucs":
        # demucs-package HDemucs signature defaults (the v3 hybrid: depth-6
        # U-Net, no transformer, DConv attn/lstm inserts at layers >= 4)
        kw = dict(
            channels=48, growth=2, nfft=4096, wiener_iters=0,
            wiener_residual=False, cac=True, depth=6,
            rewrite=True, multi_freqs=None, multi_freqs_depth=2, freq_emb=0.2,
            emb_scale=10, emb_smooth=True, kernel_size=8, time_stride=2,
            stride=4, context=1, context_enc=0, norm_starts=4, norm_groups=4,
            dconv_mode=1, dconv_depth=2, dconv_comp=4, dconv_attn=4,
            dconv_lstm=4, dconv_init=1e-4,
            # fixed for this variant (no transformer / subbands)
            bottom_channels=0, t_layers=0, t_hidden_scale=4.0, t_heads=8,
            t_max_period=10000.0, t_weight_pos_embed=1.0, t_cross_first=False,
            num_subbands=1,
        )
        sec = cfg.get("hdemucs", {}) or {}
    else:
        kw = dict(
            channels=48, growth=2, nfft=4096, wiener_iters=0, wiener_residual=False,
            cac=True, depth=4,
            rewrite=True, multi_freqs=None, multi_freqs_depth=3, freq_emb=0.2,
            emb_scale=10, emb_smooth=True, kernel_size=8, time_stride=2, stride=4,
            context=1, context_enc=0, norm_starts=4, norm_groups=4, dconv_mode=1,
            dconv_depth=2, dconv_comp=8, dconv_init=1e-3, bottom_channels=0,
            t_layers=5, t_hidden_scale=4.0, t_heads=8, t_max_period=10000.0,
            t_weight_pos_embed=1.0, t_cross_first=False, num_subbands=1,
            # the reference HTDemucs class exposes no DConv attn/lstm knobs
            # (demucs4ht.py:118-122) — keep them unreachable for this variant
            dconv_attn=10 ** 9, dconv_lstm=10 ** 9,
        )
        sec = cfg.get("htdemucs", {}) or {}
    kw["variant"] = variant
    # dconv_attn/dconv_lstm are hdemucs-only knobs: the reference HTDemucs
    # class has no such kwargs, so an htdemucs config cannot set them
    frozen = {"variant"} if variant == "hdemucs" else {
        "variant", "dconv_attn", "dconv_lstm"}
    kw.update({k: v for k, v in sec.items() if k in kw and k not in frozen})
    training = cfg.get("training", {}) or {}
    kw["sources"] = list(training.get("instruments", ["drums", "bass", "other", "vocals"]))
    kw["audio_channels"] = int(training.get("channels", 2))
    kw["samplerate"] = int(training.get("samplerate", 44100))
    kw["segment"] = training.get("segment", 10)
    return kw


def _layer_plan(kw):
    """Per-depth (freq) channel/kernel plan mirroring reference :263-370."""
    plan = []
    cac_f = 2 if kw["cac"] else 1
    subs = kw["num_subbands"]
    chin = kw["audio_channels"]
    chin_z = chin * cac_f * subs  # subband fold widens channels (ref :257-258)
    chout = kw["channels"]
    chout_z = kw["channels"]
    freqs = kw["nfft"] // 2
    for index in range(kw["depth"]):
        norm = index >= kw["norm_starts"]
        freq = freqs > 1
        ker, stri, pad = kw["kernel_size"], kw["stride"], True
        if not freq:
            # post-collapse time layers (hdemucs depth 6; ref hdemucs.py)
            ker, stri = kw["time_stride"] * 2, kw["time_stride"]
        last_freq = False
        if freq and freqs <= kw["kernel_size"]:
            ker, pad, last_freq = freqs, False, True
        if last_freq:
            chout_z = max(chout, chout_z)
            chout = chout_z
        # MultiWrap per-band frequency splitting wraps the outermost freq
        # layers; their decoders lose the freq-axis rewrite context
        # (reference demucs4ht.py:300-303 kw_dec["context_freq"]=False)
        multi = bool(kw["multi_freqs"]) and index < kw["multi_freqs_depth"] and freq
        plan.append(dict(index=index, norm=norm, freq=freq, ker=ker, stride=stri,
                         pad=pad, last_freq=last_freq, chin=chin, chin_z=chin_z,
                         chout=chout, chout_z=chout_z, freqs=freqs,
                         multi=multi, context_freq=not multi,
                         attn=index >= kw["dconv_attn"],
                         lstm=index >= kw["dconv_lstm"]))
        if index == 0:
            chin = kw["audio_channels"] * len(kw["sources"])
            chin_z = chin * cac_f * subs  # ref :330-333
        # next layer dims recorded via dec entry below
        plan[-1]["dec_chin"] = chin
        plan[-1]["dec_chin_z"] = chin_z
        chin, chin_z = chout, chout_z
        chout = int(kw["growth"] * chout)
        chout_z = int(kw["growth"] * chout_z)
        if freq:
            freqs = 1 if freqs <= kw["kernel_size"] else freqs // kw["stride"]
    return plan


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _norm_p(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _variant(config):
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    return cfg.get("model", "htdemucs")


def init(rng, config):
    if _variant(config) == "demucs":
        from sesa_tpu.models import demucs_legacy
        return demucs_legacy.init(rng, config)
    kw = _kwargs(config)
    plan = _layer_plan(kw)
    keys = iter(jax.random.split(rng, 4096))

    def conv(ci, co, khw, bias=True):
        p = {"weight": L.kaiming_uniform(next(keys), (co, ci) + tuple(khw),
                                         ci * int(np.prod(khw)))}
        if bias:
            p["bias"] = jnp.zeros((co,))
        return p

    def convtr(ci, co, khw):
        return {"weight": L.kaiming_uniform(next(keys), (ci, co) + tuple(khw),
                                            ci * int(np.prod(khw))),
                "bias": jnp.zeros((co,))}

    def lstm_p(ci, h):
        def side():
            return {"weight_ih": L.kaiming_uniform(next(keys), (4 * h, ci), ci),
                    "weight_hh": L.kaiming_uniform(next(keys), (4 * h, h), h),
                    "bias_ih": jnp.zeros((4 * h,)),
                    "bias_hh": jnp.zeros((4 * h,))}
        return {"fwd": side(), "bwd": side()}

    def dconv(ch, attn=False, lstm=False):
        hidden = max(1, ch // kw["dconv_comp"])
        blocks = []
        for d in range(kw["dconv_depth"]):
            blk = {
                "conv1": conv(ch, hidden, (3,)),
                "norm1": _norm_p(hidden),
                "conv2": conv(hidden, 2 * ch, (1,)),
                "norm2": _norm_p(2 * ch),
                "scale": jnp.full((ch,), kw["dconv_init"]),
            }
            if lstm:
                blk["lstm"] = {
                    "layers": [lstm_p(hidden if i == 0 else 2 * hidden, hidden)
                               for i in range(2)],
                    "linear": {"weight": L.kaiming_uniform(
                        next(keys), (hidden, 2 * hidden), 2 * hidden),
                        "bias": jnp.zeros((hidden,))}}
            if attn:
                blk["attn"] = {name: conv(hidden, co_a, (1,)) for name, co_a in
                               (("content", hidden), ("query", hidden),
                                ("key", hidden), ("query_decay", 16),
                                ("proj", hidden))}
            blocks.append(blk)
        return blocks

    def enc_layer(ci, co, ker, freq, norm, empty=False, attn=False, lstm=False):
        kshape = (ker, 1) if freq else (ker,)
        p = {"conv": conv(ci, co, kshape)}
        if empty:
            return p
        if norm:
            p["norm1"] = _norm_p(co)
        if kw["rewrite"]:
            ctx = kw["context_enc"]
            # demucs HEncLayer passes an int kernel to Conv2d, so freq-layer
            # rewrites are SQUARE (1+2c, 1+2c); context_enc=0 keeps it 1x1
            rk = (1 + 2 * ctx, 1 + 2 * ctx) if freq else (1 + 2 * ctx,)
            p["rewrite"] = conv(co, 2 * co, rk)
            if norm:
                p["norm2"] = _norm_p(2 * co)
        if kw["dconv_mode"] & 1:
            p["dconv"] = dconv(co, attn, lstm)
        return p

    def dec_layer(ci, co, ker, freq, norm, empty=False, context_freq=True,
                  attn=False, lstm=False):
        kshape = (ker, 1) if freq else (ker,)
        p = {"conv_tr": convtr(ci, co, kshape)}
        if norm:
            p["norm2"] = _norm_p(co)
        if empty:
            return p
        if kw["rewrite"]:
            ctx = kw["context"]
            # HDecLayer: context_freq=True -> square int-kernel Conv2d;
            # False (MultiWrap) -> time-axis-only context (1, 1+2c)
            if freq:
                rk = (1 + 2 * ctx, 1 + 2 * ctx) if context_freq else (1, 1 + 2 * ctx)
            else:
                rk = (1 + 2 * ctx,)
            p["rewrite"] = conv(ci, 2 * ci, rk)
            if norm:
                p["norm1"] = _norm_p(2 * ci)
        if kw["dconv_mode"] & 2:
            p["dconv"] = dconv(ci, attn, lstm)
        return p

    n_bands = len(kw["multi_freqs"] or []) + 1
    params = {"encoder": [], "tencoder": [], "decoder": [], "tdecoder": []}
    for lp in plan:
        al = dict(attn=lp["attn"], lstm=lp["lstm"])
        e = enc_layer(lp["chin_z"], lp["chout_z"], lp["ker"], lp["freq"],
                      lp["norm"], **al)
        if lp["multi"]:
            # MultiWrap: n_bands independent replicas of the layer
            e = {"layers": [
                enc_layer(lp["chin_z"], lp["chout_z"], lp["ker"], True,
                          lp["norm"], **al) for _ in range(n_bands)]}
        params["encoder"].append(e)
        if lp["freq"]:
            params["tencoder"].append(enc_layer(lp["chin"], lp["chout"],
                                                kw["kernel_size"], False,
                                                lp["norm"], empty=lp["last_freq"],
                                                **al))
        d = dec_layer(lp["chout_z"], lp["dec_chin_z"], lp["ker"], lp["freq"],
                      lp["norm"], context_freq=lp["context_freq"], **al)
        if lp["multi"]:
            d = {"layers": [
                dec_layer(lp["chout_z"], lp["dec_chin_z"], lp["ker"], True,
                          lp["norm"], context_freq=False, **al)
                for _ in range(n_bands)]}
        params["decoder"].insert(0, d)
        if lp["freq"]:
            params["tdecoder"].insert(0, dec_layer(lp["chout"], lp["dec_chin"],
                                                   kw["kernel_size"], False,
                                                   lp["norm"], empty=lp["last_freq"],
                                                   **al))

    # frequency embedding after encoder layer 0
    freqs_after0 = plan[0]["freqs"] // kw["stride"]
    emb = jax.random.normal(next(keys), (freqs_after0, plan[1]["chin_z"]))
    params["freq_emb"] = emb / kw["emb_scale"]

    # cross transformer (absent for the hdemucs variant: t_layers == 0)
    if not kw["t_layers"]:
        return params
    dim = kw["channels"] * kw["growth"] ** (kw["depth"] - 1)
    tr_ch = dim
    if kw["bottom_channels"]:
        # 1x1 channel up/downsamplers around the transformer
        # (reference demucs4ht.py:376-387, 620-634)
        dim = kw["bottom_channels"]
    heads = kw["t_heads"]
    hidden = int(kw["t_hidden_scale"] * dim)

    def attn_p(d):
        return {"in_proj_weight": L.kaiming_uniform(next(keys), (3 * d, d), d),
                "in_proj_bias": jnp.zeros((3 * d,)),
                "out_proj": {"weight": L.kaiming_uniform(next(keys), (d, d), d),
                             "bias": jnp.zeros((d,))}}

    def lin(ci, co):
        return {"weight": L.kaiming_uniform(next(keys), (co, ci), ci),
                "bias": jnp.zeros((co,))}

    def t_layer(cross):
        p = {
            "attn": attn_p(dim),
            "linear1": lin(dim, hidden),
            "linear2": lin(hidden, dim),
            "norm1": _norm_p(dim),
            "norm2": _norm_p(dim),
            "gamma_1": jnp.full((dim,), 1e-4),
            "gamma_2": jnp.full((dim,), 1e-4),
            "norm_out": _norm_p(dim),
        }
        if cross:
            p["norm3"] = _norm_p(dim)
        return p

    ct = {"norm_in": _norm_p(dim), "norm_in_t": _norm_p(dim),
          "layers": [], "layers_t": []}
    parity = 1 if kw["t_cross_first"] else 0
    for i in range(kw["t_layers"]):
        cross = i % 2 != parity
        ct["layers"].append(t_layer(cross))
        ct["layers_t"].append(t_layer(cross))
    params["crosstransformer"] = ct
    if kw["bottom_channels"]:
        def conv1(ci, co):
            return {"weight": L.kaiming_uniform(next(keys), (co, ci, 1), ci),
                    "bias": jnp.zeros((co,))}

        params["channel_upsampler"] = conv1(tr_ch, dim)
        params["channel_downsampler"] = conv1(dim, tr_ch)
        params["channel_upsampler_t"] = conv1(tr_ch, dim)
        params["channel_downsampler_t"] = conv1(dim, tr_ch)
    return params


# --------------------------------------------------------------------------
# apply helpers
# --------------------------------------------------------------------------

def _gn(x, p, groups):
    return L.group_norm(x, p, groups)


def _maybe_norm(x, p, key, groups):
    return _gn(x, p[key], groups) if key in p else x


def _dconv_apply(blocks, x, precision):
    """(B, C, T) residual DConv branch (demucs-v4 DConv), incl. the
    skip-BLSTM and LocalState inserts of the deep hdemucs layers."""
    for d, b in enumerate(blocks):
        dilation = 2 ** d
        k = b["conv1"]["weight"].shape[-1]
        padding = dilation * (k // 2)
        y = jax.lax.conv_general_dilated(
            x, b["conv1"]["weight"], (1,), [(padding, padding)],
            rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
            precision=precision) + b["conv1"]["bias"][None, :, None]
        y = _gn(y, b["norm1"], 1)
        y = jax.nn.gelu(y, approximate=False)
        if "lstm" in b or "attn" in b:
            from sesa_tpu.models import demucs_legacy
            if "lstm" in b:
                y = demucs_legacy._blstm(b["lstm"], y, max_steps=200,
                                         skip=True, precision=precision)
            if "attn" in b:
                y = demucs_legacy._local_state(b["attn"], y, precision=precision)
        y = L.conv1d(y, b["conv2"]["weight"], b["conv2"]["bias"], precision=precision)
        y = _gn(y, b["norm2"], 1)
        a, g = jnp.split(y, 2, axis=1)
        y = a * jax.nn.sigmoid(g)
        x = x + y * b["scale"][None, :, None]
    return x


def _henc_apply(p, x, kw, freq, ker, stride, pad, norm, inject=None,
                empty=False, precision=_HIGHEST):
    groups = kw["norm_groups"]
    if not freq and x.ndim == 4:
        b, c, fr, t = x.shape
        x = x.reshape(b, -1, t)
    if not freq:
        le = x.shape[-1]
        if le % stride != 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, stride - le % stride)))
    padding = ker // 4 if pad else 0
    if freq:
        y = L.conv2d(x, p["conv"]["weight"], p["conv"]["bias"],
                     stride=(stride, 1), padding=(padding, 0), precision=precision)
    else:
        y = L.conv1d(x, p["conv"]["weight"], p["conv"]["bias"], stride=stride,
                     padding=padding, precision=precision)
    if empty:
        return y
    if inject is not None:
        if inject.ndim == 3 and y.ndim == 4:
            inject = inject[:, :, None]
        y = y + inject
    y = jax.nn.gelu(_maybe_norm(y, p, "norm1", groups), approximate=False)
    if "dconv" in p:
        if freq:
            b, c, fr, t = y.shape
            z = jnp.transpose(y, (0, 2, 1, 3)).reshape(-1, c, t)
            z = _dconv_apply(p["dconv"], z, precision)
            y = jnp.transpose(z.reshape(b, fr, c, t), (0, 2, 1, 3))
        else:
            y = _dconv_apply(p["dconv"], y, precision)
    if "rewrite" in p:
        w = p["rewrite"]["weight"]
        if freq:
            # padding follows the kernel (demucs passes int kernel+padding
            # to Conv2d, so freq rewrites are square with "same" padding)
            z = L.conv2d(y, w, p["rewrite"]["bias"],
                         padding=((w.shape[2] - 1) // 2, (w.shape[3] - 1) // 2),
                         precision=precision)
        else:
            z = L.conv1d(y, w, p["rewrite"]["bias"],
                         padding=(w.shape[2] - 1) // 2, precision=precision)
        z = _maybe_norm(z, p, "norm2", groups)
        a, g = jnp.split(z, 2, axis=1)
        return a * jax.nn.sigmoid(g)
    return y


def _hdec_apply(p, x, skip, length, kw, freq, ker, stride, pad, chin,
                last=False, empty=False, precision=_HIGHEST):
    groups = kw["norm_groups"]
    if freq and x.ndim == 3:
        b, c, t = x.shape
        x = x.reshape(b, chin, -1, t)
    if not empty:
        x = x + skip
        if "rewrite" in p:
            w = p["rewrite"]["weight"]
            if freq:
                z = L.conv2d(x, w, p["rewrite"]["bias"],
                             padding=((w.shape[2] - 1) // 2,
                                      (w.shape[3] - 1) // 2),
                             precision=precision)
            else:
                z = L.conv1d(x, w, p["rewrite"]["bias"],
                             padding=(w.shape[2] - 1) // 2, precision=precision)
            z = _maybe_norm(z, p, "norm1", groups)
            a, g = jnp.split(z, 2, axis=1)
            y = a * jax.nn.sigmoid(g)
        else:
            y = x
        if "dconv" in p:
            if freq:
                b, c, fr, t = y.shape
                z = jnp.transpose(y, (0, 2, 1, 3)).reshape(-1, c, t)
                z = _dconv_apply(p["dconv"], z, precision)
                y = jnp.transpose(z.reshape(b, fr, c, t), (0, 2, 1, 3))
            else:
                y = _dconv_apply(p["dconv"], y, precision)
    else:
        y = x
        assert skip is None

    # HDecLayer crops kernel_size//4 (same as HEncLayer's pad), NOT
    # (ker-stride)//2 — they only coincide when ker == 2*stride
    padding = ker // 4 if pad else 0
    if freq:
        z = L.conv_transpose2d(y, p["conv_tr"]["weight"], p["conv_tr"]["bias"],
                               stride=(stride, 1), precision=precision)
        z = _maybe_norm(z, p, "norm2", groups)
        if padding:
            z = z[..., padding:-padding, :]
    else:
        kk = p["conv_tr"]["weight"].shape[-1]
        w = jnp.flip(p["conv_tr"]["weight"], axis=-1).transpose(1, 0, 2)
        z = jax.lax.conv_general_dilated(
            y, w, (1,), [(kk - 1, kk - 1)], lhs_dilation=(stride,),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=precision,
        ) + p["conv_tr"]["bias"][None, :, None]
        z = _maybe_norm(z, p, "norm2", groups)
        z = z[..., padding : padding + length]
    if not last:
        z = jax.nn.gelu(z, approximate=False)
    return z, y


def _henc_multi(p, x, kw, ker, stride, norm, precision=_HIGHEST):
    """MultiWrap frequency-band split around HEncLayer replicas.

    Semantics follow the public demucs v4 ``MultiWrap`` (imported by
    reference demucs4ht.py:25 and applied at :302,325): band b covers
    input rows [start, limit) with ``limit`` re-rounded so each band
    holds an integer number of conv frames; the first band left-pads
    K//4 rows and the last right-pads K//4, and consecutive bands
    overlap by K - stride input rows so the concatenated frames exactly
    equal one unwrapped padded conv (MultiWrap's documented invariant —
    identical replica weights reproduce the unwrapped layer; the
    equivalence test in tests/test_htdemucs.py checks exactly that).
    """
    ratios = list(kw["multi_freqs"]) + [1]
    frq = x.shape[2]
    pad = ker // 4
    outs = []
    start = 0
    for ratio, sub in zip(ratios, p["layers"]):
        if ratio == 1:
            limit = frq
        else:
            limit = int(round(frq * ratio))
            le = limit - start
            if start == 0:
                le += pad
            frames = int(round((le - ker) / stride + 1))
            limit = start + (frames - 1) * stride + ker
            if start == 0:
                limit -= pad
        assert 0 < limit - start <= frq, (start, limit, frq)
        y = x[:, :, start:limit, :]
        if start == 0:
            y = jnp.pad(y, ((0, 0), (0, 0), (pad, 0), (0, 0)))
        if ratio == 1:
            y = jnp.pad(y, ((0, 0), (0, 0), (0, pad), (0, 0)))
        outs.append(_henc_apply(sub, y, kw, True, ker, stride, False, norm,
                                precision=precision))
        start = limit - ker + stride
    return jnp.concatenate(outs, axis=2)


def _hdec_multi(p, x, skip, kw, ker, stride, chin, last, precision=_HIGHEST):
    """MultiWrap around HDecLayer replicas (rewrites have no freq context).

    Each band's transposed conv output spans K - stride rows past the
    next band's start; the overlap is summed with one duplicate bias
    removed, then K//4 rows are cropped from the two global ends — the
    exact inverse of `_henc_multi`'s geometry, preserving the
    identical-weights == unwrapped-layer invariant.
    """
    ratios = list(kw["multi_freqs"]) + [1]
    frq = x.shape[2]
    pad = ker // 4
    outs = []
    start = 0
    for ratio, sub in zip(ratios, p["layers"]):
        limit = frq if ratio == 1 else int(round(frq * ratio))
        y = x[:, :, start:limit]
        sk = skip[:, :, start:limit]
        # last=True suppresses the per-band gelu (applied once, below);
        # pad=False suppresses the per-band crop (applied at global ends)
        z, _ = _hdec_apply(sub, y, sk, None, kw, True, ker, stride, False,
                           chin=chin, last=True, precision=precision)
        if outs:
            ov = ker - stride
            bias = sub["conv_tr"]["bias"].astype(z.dtype)
            merged = (outs[-1][:, :, -ov:] + z[:, :, :ov]
                      - bias[None, :, None, None])
            outs[-1] = jnp.concatenate([outs[-1][:, :, :-ov], merged], axis=2)
            z = z[:, :, ov:]
        outs.append(z)
        start = limit
    out = jnp.concatenate(outs, axis=2)
    if pad:
        out = out[:, :, pad:-pad]
    if not last:
        out = jax.nn.gelu(out, approximate=False)
    return out, None


def _sin_embedding_1d(length, dim, max_period):
    pos = np.arange(length)[:, None]
    half = dim // 2
    adim = np.arange(half)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return jnp.asarray(
        np.concatenate([np.cos(phase), np.sin(phase)], axis=-1)[None], jnp.float32)


def _sin_embedding_2d(d_model, height, width, max_period):
    pe = np.zeros((d_model, height, width))
    dm = d_model // 2
    div = np.exp(np.arange(0.0, dm, 2) * -(math.log(max_period) / dm))
    pos_w = np.arange(width)[:, None]
    pos_h = np.arange(height)[:, None]
    pe[0:dm:2] = np.tile(np.sin(pos_w * div).T[:, None, :], (1, height, 1))
    pe[1:dm:2] = np.tile(np.cos(pos_w * div).T[:, None, :], (1, height, 1))
    pe[dm::2] = np.tile(np.sin(pos_h * div).T[:, :, None], (1, 1, width))
    pe[dm + 1::2] = np.tile(np.cos(pos_h * div).T[:, :, None], (1, 1, width))
    return jnp.asarray(pe[None], jnp.float32)


def _mha(p, q, k, v, heads, precision):
    """torch nn.MultiheadAttention (batch_first) with packed in-proj."""
    d = q.shape[-1]
    wq, wk, wv = jnp.split(p["in_proj_weight"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3, axis=0)
    qq = jnp.einsum("btd,od->bto", q, wq, precision=precision) + bq
    kk = jnp.einsum("btd,od->bto", k, wk, precision=precision) + bk
    vv = jnp.einsum("btd,od->bto", v, wv, precision=precision) + bv
    b, tq, _ = qq.shape
    tk = kk.shape[1]
    dh = d // heads
    qq = jnp.transpose(qq.reshape(b, tq, heads, dh), (0, 2, 1, 3))
    kk = jnp.transpose(kk.reshape(b, tk, heads, dh), (0, 2, 1, 3))
    vv = jnp.transpose(vv.reshape(b, tk, heads, dh), (0, 2, 1, 3))
    sim = jnp.einsum("bhid,bhjd->bhij", qq, kk, precision=precision) * (dh ** -0.5)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(qq.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vv, precision=precision)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, tq, d)
    return jnp.einsum("btd,od->bto", out, p["out_proj"]["weight"],
                      precision=precision) + p["out_proj"]["bias"]


def _t_norm_out(x, p):
    # MyGroupNorm(1, d) on (B, T, C): normalize over (T, C) per sample
    y = jnp.swapaxes(x, 1, 2)
    y = L.group_norm(y, p, 1)
    return jnp.swapaxes(y, 1, 2)


def _t_self_layer(p, x, heads, precision):
    y = L.layer_norm(x, p["norm1"])
    x = x + p["gamma_1"] * _mha(p["attn"], y, y, y, heads, precision)
    y = L.layer_norm(x, p["norm2"])
    h = jnp.einsum("btd,od->bto", y, p["linear1"]["weight"],
                   precision=precision) + p["linear1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("btd,od->bto", h, p["linear2"]["weight"],
                   precision=precision) + p["linear2"]["bias"]
    x = x + p["gamma_2"] * h
    return _t_norm_out(x, p["norm_out"])


def _t_cross_layer(p, q, kv, heads, precision):
    qn = L.layer_norm(q, p["norm1"])
    kn = L.layer_norm(kv, p["norm2"])
    x = q + p["gamma_1"] * _mha(p["attn"], qn, kn, kn, heads, precision)
    y = L.layer_norm(x, p["norm3"])
    h = jnp.einsum("btd,od->bto", y, p["linear1"]["weight"],
                   precision=precision) + p["linear1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("btd,od->bto", h, p["linear2"]["weight"],
                   precision=precision) + p["linear2"]["bias"]
    x = x + p["gamma_2"] * h
    return _t_norm_out(x, p["norm_out"])


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def apply(params, config, mix, precision=None, compute_dtype=None):
    """(B, ch, T) -> (B, sources, ch, T).

    ``model: demucs`` configs route to the legacy time-domain port
    (models/demucs_legacy.py; reference demucs4ht.py:696-713 dispatch).

    ``compute_dtype``: run the encoder/transformer/decoder net in this
    dtype (bf16 on TPU); STFT/iSTFT, mix statistics, and the Wiener/CaC
    output assembly stay float32."""
    if _variant(config) == "demucs":
        from sesa_tpu.models import demucs_legacy
        return demucs_legacy.apply(params, config, mix, precision=precision,
                                   compute_dtype=compute_dtype)
    precision = net_precision(precision, compute_dtype)
    kw = _kwargs(config)
    plan = _layer_plan(kw)
    nfft, hl = kw["nfft"], kw["nfft"] // 4
    b, ch, length = mix.shape

    # ---- STFT with demucs alignment (reference :427-447) ----
    le = int(math.ceil(length / hl))
    pad = hl // 2 * 3
    xpad = jnp.pad(mix, ((0, 0), (0, 0), (pad, pad + le * hl - length)),
                   mode="reflect")
    window = hann_window(nfft, dtype=mix.dtype)
    spec = stft_ri(xpad.reshape(b * ch, -1), nfft, hl, window,
                   normalized=True)  # (B', F, T, 2)
    spec = spec[:, :-1]  # drop nyquist row
    spec = spec[:, :, 2 : 2 + le]
    z_mix = spec.reshape(b, ch, nfft // 2, le, 2)

    if kw["cac"]:
        # CaC channels: (B, C*2, F, T) with (ch, reim) major-minor
        mag = jnp.transpose(z_mix, (0, 1, 4, 2, 3)).reshape(b, ch * 2, nfft // 2, le)
    else:
        # magnitude input (reference :460-467 z.abs() branch)
        mag = jnp.sqrt(z_mix[..., 0] ** 2 + z_mix[..., 1] ** 2)

    subs = kw["num_subbands"]
    if subs > 1:
        # cac2cws subband fold: frequency rows (k, f/k) into channels
        # (reference demucs4ht.py:534-539,568-569)
        c_in = mag.shape[1]
        mag = mag.reshape(b, c_in, subs, (nfft // 2) // subs, le)
        mag = mag.reshape(b, c_in * subs, (nfft // 2) // subs, le)

    mean = mag.mean(axis=(1, 2, 3), keepdims=True)
    std = mag.std(axis=(1, 2, 3), keepdims=True)
    x = (mag - mean) / (1e-5 + std)

    xt = mix
    meant = xt.mean(axis=(1, 2), keepdims=True)
    stdt = xt.std(axis=(1, 2), keepdims=True)
    xt = (xt - meant) / (1e-5 + stdt)

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        xt = xt.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx, lp in enumerate(plan):
        lengths.append(x.shape[-1])
        inject = None
        if idx < len(params["tencoder"]):
            lengths_t.append(xt.shape[-1])
            tout = _henc_apply(params["tencoder"][idx], xt, kw, False,
                               kw["kernel_size"], kw["stride"], True,
                               lp["norm"], empty=lp["last_freq"],
                               precision=precision)
            if not lp["last_freq"]:
                xt = tout
                saved_t.append(xt)
            else:
                inject = tout
        ep = params["encoder"][idx]
        if "layers" in ep:
            assert inject is None and not lp["norm"]
            x = _henc_multi(ep, x, kw, lp["ker"], lp["stride"], lp["norm"],
                            precision=precision)
        else:
            x = _henc_apply(ep, x, kw, lp["freq"], lp["ker"],
                            lp["stride"], lp["pad"], lp["norm"], inject=inject,
                            precision=precision)
        if idx == 0:
            emb = params["freq_emb"] * kw["emb_scale"]  # ScaledEmbedding forward
            # the embedding table is sized from the NOMINAL frequency count
            # (ctor freqs, reference :366-369); at runtime only the actual
            # rows are indexed (arange(x.shape[2]), :606-609) — with
            # num_subbands > 1 that's 1/k of the table
            emb = emb[: x.shape[2]]
            x = x + kw["freq_emb"] * jnp.transpose(emb, (1, 0))[None, :, :, None]
        saved.append(x)

    # ---- bottleneck: cross transformer (htdemucs) or zeros (hdemucs) ----
    if kw["variant"] == "hdemucs":
        # hdemucs has no bottleneck net: the decoder starts from zero and
        # the signal flows through the U-Net skips (demucs/hdemucs.py
        # forward, "initialize everything to zero"); xt is rebuilt from
        # `pre` at the branch-split layer before it is ever read
        x = jnp.zeros_like(x)
        return _decode_and_assemble(
            params, kw, plan, x, xt, saved, saved_t, lengths, lengths_t,
            z_mix, mean, std, meant, stdt, length, le, subs, precision)
    ct = params["crosstransformer"]
    if kw["bottom_channels"]:
        # 1x1 channel upsamplers ahead of the transformer
        # (reference demucs4ht.py:620-625)
        bb, c0, fr0, t0 = x.shape
        x = L.conv1d(x.reshape(bb, c0, fr0 * t0),
                     params["channel_upsampler"]["weight"],
                     params["channel_upsampler"]["bias"], precision=precision)
        x = x.reshape(bb, -1, fr0, t0)
        xt = L.conv1d(xt, params["channel_upsampler_t"]["weight"],
                      params["channel_upsampler_t"]["bias"],
                      precision=precision)
    bb, cc, fr, t1 = x.shape
    pos2d = _sin_embedding_2d(cc, fr, t1, kw["t_max_period"])
    # token order must be (t1, fr): rearrange 'b c fr t1 -> b (t1 fr) c'
    tok = jnp.transpose(x, (0, 3, 2, 1)).reshape(bb, t1 * fr, cc)
    pos_tok = jnp.transpose(pos2d, (0, 3, 2, 1)).reshape(1, t1 * fr, cc)
    tok = L.layer_norm(tok, ct["norm_in"])
    # position tables are built in f32; cast so bf16 tokens stay bf16
    tok = tok + (kw["t_weight_pos_embed"] * pos_tok).astype(tok.dtype)

    t2 = xt.shape[-1]
    tokt = jnp.swapaxes(xt, 1, 2)
    tokt = L.layer_norm(tokt, ct["norm_in_t"])
    tokt = tokt + (kw["t_weight_pos_embed"] * _sin_embedding_1d(
        t2, cc, kw["t_max_period"])).astype(tokt.dtype)

    parity = 1 if kw["t_cross_first"] else 0
    for i in range(kw["t_layers"]):
        if i % 2 == parity:
            tok = _t_self_layer(ct["layers"][i], tok, kw["t_heads"], precision)
            tokt = _t_self_layer(ct["layers_t"][i], tokt, kw["t_heads"], precision)
        else:
            old = tok
            tok = _t_cross_layer(ct["layers"][i], tok, tokt, kw["t_heads"], precision)
            tokt = _t_cross_layer(ct["layers_t"][i], tokt, old, kw["t_heads"], precision)

    x = jnp.transpose(tok.reshape(bb, t1, fr, cc), (0, 3, 2, 1))
    xt = jnp.swapaxes(tokt, 1, 2)
    if kw["bottom_channels"]:
        # back down to the encoder channel count (reference :630-634)
        x = L.conv1d(x.reshape(bb, cc, fr * t1),
                     params["channel_downsampler"]["weight"],
                     params["channel_downsampler"]["bias"],
                     precision=precision).reshape(bb, -1, fr, t1)
        xt = L.conv1d(xt, params["channel_downsampler_t"]["weight"],
                      params["channel_downsampler_t"]["bias"],
                      precision=precision)

    return _decode_and_assemble(
        params, kw, plan, x, xt, saved, saved_t, lengths, lengths_t,
        z_mix, mean, std, meant, stdt, length, le, subs, precision)


def _decode_and_assemble(params, kw, plan, x, xt, saved, saved_t, lengths,
                         lengths_t, z_mix, mean, std, meant, stdt, length, le,
                         subs, precision):
    """Shared decoder sweep + spectral output assembly (both variants)."""
    b, ch = z_mix.shape[:2]
    nfft = 2 * z_mix.shape[2]
    hl = nfft // 4
    pad = hl // 2 * 3
    window = hann_window(nfft, dtype=jnp.float32)

    s_src = len(kw["sources"])
    for idx, lp in enumerate(reversed(plan)):
        skip = saved.pop(-1)
        dp = params["decoder"][idx]
        if "layers" in dp:
            lengths.pop(-1)
            x, pre = _hdec_multi(dp, x, skip, kw, lp["ker"], lp["stride"],
                                 chin=lp["chout_z"], last=lp["index"] == 0,
                                 precision=precision)
        else:
            x, pre = _hdec_apply(dp, x, skip, lengths.pop(-1),
                                 kw, lp["freq"], lp["ker"], lp["stride"],
                                 lp["pad"],
                                 chin=lp["chout_z"], last=lp["index"] == 0,
                                 precision=precision)
        offset = kw["depth"] - len(params["tdecoder"])
        if idx >= offset:
            tdec = params["tdecoder"][idx - offset]
            length_t = lengths_t.pop(-1)
            if lp["last_freq"]:
                pre2 = pre[:, :, 0]
                xt, _ = _hdec_apply(tdec, pre2, None, length_t, kw, False,
                                    kw["kernel_size"], kw["stride"], True,
                                    chin=lp["chout"], last=lp["index"] == 0,
                                    empty=True, precision=precision)
            else:
                skip_t = saved_t.pop(-1)
                xt, _ = _hdec_apply(tdec, xt, skip_t, length_t, kw, False,
                                    kw["kernel_size"], kw["stride"], True,
                                    chin=lp["chout"], last=lp["index"] == 0,
                                    precision=precision)

    # ---- output assembly (float32) ----
    x = x.astype(jnp.float32)
    xt = xt.astype(jnp.float32)
    if subs > 1:
        # cws2cac: subband channels back onto the frequency axis
        # (reference demucs4ht.py:541-546,663-666)
        c_all, fsub = x.shape[1], x.shape[2]
        x = x.reshape(b, c_all // subs, subs, fsub, le)
        x = x.reshape(b, c_all // subs, subs * fsub, le)

    if kw["cac"]:
        x = x.reshape(b, s_src, ch * 2, nfft // 2, le)
        x = x * std[:, None] + mean[:, None]
        # cac mask -> RI spectrum (reference :470-478)
        zout = x.reshape(b, s_src, ch, 2, nfft // 2, le)
        zout = jnp.transpose(zout, (0, 1, 2, 4, 5, 3))  # (B, S, ch, F, T, 2)
    else:
        # magnitude estimates -> Wiener / softmask (reference :470-517)
        m = x.reshape(b, s_src, ch, nfft // 2, le)
        m = m * std[:, None] + mean[:, None]
        niters = kw["wiener_iters"]
        if niters < 0:
            # mix-phase soft mask: z / |z| * m
            zn = z_mix / jnp.maximum(
                jnp.sqrt(z_mix[..., 0] ** 2 + z_mix[..., 1] ** 2), 1e-8
            )[..., None]
            zout = zn[:, None] * m[..., None]  # (B, S, ch, F, T, 2)
        else:
            # (B,S,ch,F,T) -> per-sample wiener over (T,F,C,S)
            tgt = jnp.transpose(m, (0, 4, 3, 2, 1))  # (B, T, F, ch, S)
            mx = jnp.transpose(z_mix, (0, 3, 2, 1, 4))  # (B, T, F, ch, 2)
            out = jax.vmap(
                lambda tg, mi: wiener_ri(tg, mi, niters,
                                         residual=kw["wiener_residual"])
            )(tgt, mx)  # (B, T, F, ch, 2, S)
            if kw["wiener_residual"]:
                out = out[..., :-1]
            zout = jnp.transpose(out, (0, 5, 3, 2, 1, 4))  # (B,S,ch,F,T,2)

    # ---- iSTFT with demucs alignment (reference :449-457) ----
    zz = jnp.pad(zout, ((0, 0),) * 3 + ((0, 1), (2, 2), (0, 0)))
    le2 = hl * int(math.ceil(length / hl)) + 2 * pad
    wav = istft_ri(zz.reshape(-1, nfft // 2 + 1, zz.shape[-2], 2), nfft, hl,
                   window, normalized=True, length=le2)
    wav = wav[..., pad : pad + length].reshape(b, s_src, ch, length)

    xt = xt.reshape(b, s_src, ch, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return xt + wav


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    if _variant(config) == "demucs":
        from sesa_tpu.models import demucs_legacy
        return demucs_legacy.convert_torch(state_dict, config)
    kw = _kwargs(config)
    plan = _layer_plan(kw)
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def wb(prefix):
        p = {"weight": take(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            p["bias"] = take(f"{prefix}.bias")
        return p

    def lstm_params(pfx, layers=2):
        out = {"layers": []}
        for li in range(layers):
            def side(suffix):
                return {"weight_ih": take(f"{pfx}.lstm.weight_ih_l{li}{suffix}"),
                        "weight_hh": take(f"{pfx}.lstm.weight_hh_l{li}{suffix}"),
                        "bias_ih": take(f"{pfx}.lstm.bias_ih_l{li}{suffix}"),
                        "bias_hh": take(f"{pfx}.lstm.bias_hh_l{li}{suffix}")}
            out["layers"].append({"fwd": side(""), "bwd": side("_reverse")})
        out["linear"] = wb(pfx + ".linear")
        return out

    def dconv(prefix):
        blocks = []
        d = 0
        while f"{prefix}.layers.{d}.0.weight" in sd:
            p = f"{prefix}.layers.{d}"
            blk = {"conv1": wb(f"{p}.0"), "norm1": wb(f"{p}.1")}
            # deep hdemucs layers insert BLSTM then LocalState at index 3
            # (demucs/demucs.py DConv; lstm insert lands before attn)
            j = 3
            if f"{p}.{j}.lstm.weight_ih_l0" in sd:
                blk["lstm"] = lstm_params(f"{p}.{j}")
                j += 1
            if f"{p}.{j}.content.weight" in sd:
                blk["attn"] = {name: wb(f"{p}.{j}.{name}") for name in
                               ("content", "query", "key", "query_decay",
                                "proj")}
                j += 1
            blk["conv2"] = wb(f"{p}.{j}")
            blk["norm2"] = wb(f"{p}.{j + 1}")
            blk["scale"] = take(f"{p}.{j + 3}.scale")
            blocks.append(blk)
            d += 1
        return blocks

    def enc(prefix, norm, empty=False):
        p = {"conv": wb(f"{prefix}.conv")}
        if empty:
            return p
        if norm:
            p["norm1"] = wb(f"{prefix}.norm1")
        if f"{prefix}.rewrite.weight" in sd:
            p["rewrite"] = wb(f"{prefix}.rewrite")
            if norm:
                p["norm2"] = wb(f"{prefix}.norm2")
        if f"{prefix}.dconv.layers.0.0.weight" in sd:
            p["dconv"] = dconv(f"{prefix}.dconv")
        return p

    def dec(prefix, norm, empty=False):
        p = {"conv_tr": wb(f"{prefix}.conv_tr")}
        if norm:
            p["norm2"] = wb(f"{prefix}.norm2")
        if empty:
            return p
        if f"{prefix}.rewrite.weight" in sd:
            p["rewrite"] = wb(f"{prefix}.rewrite")
            if norm:
                p["norm1"] = wb(f"{prefix}.norm1")
        if f"{prefix}.dconv.layers.0.0.weight" in sd:
            p["dconv"] = dconv(f"{prefix}.dconv")
        return p

    n_bands = len(kw["multi_freqs"] or []) + 1
    params = {"encoder": [], "tencoder": [], "decoder": [], "tdecoder": []}
    n_t = sum(1 for lp in plan if lp["freq"])
    for i, lp in enumerate(plan):
        if lp["multi"]:
            params["encoder"].append({"layers": [
                enc(f"encoder.{i}.layers.{k}", lp["norm"])
                for k in range(n_bands)]})
        else:
            params["encoder"].append(enc(f"encoder.{i}", lp["norm"]))
    for i in range(n_t):
        params["tencoder"].append(enc(f"tencoder.{i}",
                                      plan[i]["norm"], empty=plan[i]["last_freq"]))
    for i in range(kw["depth"]):
        lp = plan[kw["depth"] - 1 - i]
        if lp["multi"]:
            params["decoder"].append({"layers": [
                dec(f"decoder.{i}.layers.{k}", lp["norm"])
                for k in range(n_bands)]})
        else:
            params["decoder"].append(dec(f"decoder.{i}", lp["norm"]))
    for i in range(n_t):
        lp = plan[n_t - 1 - i]
        params["tdecoder"].append(dec(f"tdecoder.{i}", lp["norm"],
                                      empty=lp["last_freq"]))

    params["freq_emb"] = take("freq_emb.embedding.weight")

    if not kw["t_layers"]:  # hdemucs: no transformer keys
        unused = set(sd) - used
        if unused:
            raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:10]} ...")
        return params

    ct = {"norm_in": wb("crosstransformer.norm_in"),
          "norm_in_t": wb("crosstransformer.norm_in_t"),
          "layers": [], "layers_t": []}
    parity = 1 if kw["t_cross_first"] else 0
    for branch, store in (("layers", "layers"), ("layers_t", "layers_t")):
        for i in range(kw["t_layers"]):
            cross = i % 2 != parity
            pfx = f"crosstransformer.{branch}.{i}"
            attn_name = "cross_attn" if cross else "self_attn"
            lp = {
                "attn": {
                    "in_proj_weight": take(f"{pfx}.{attn_name}.in_proj_weight"),
                    "in_proj_bias": take(f"{pfx}.{attn_name}.in_proj_bias"),
                    "out_proj": wb(f"{pfx}.{attn_name}.out_proj"),
                },
                "linear1": wb(f"{pfx}.linear1"),
                "linear2": wb(f"{pfx}.linear2"),
                "norm1": wb(f"{pfx}.norm1"),
                "norm2": wb(f"{pfx}.norm2"),
                "gamma_1": take(f"{pfx}.gamma_1.scale"),
                "gamma_2": take(f"{pfx}.gamma_2.scale"),
                "norm_out": wb(f"{pfx}.norm_out"),
            }
            if cross:
                lp["norm3"] = wb(f"{pfx}.norm3")
            ct[store].append(lp)
    params["crosstransformer"] = ct
    if kw["bottom_channels"]:
        for name in ("channel_upsampler", "channel_downsampler",
                     "channel_upsampler_t", "channel_downsampler_t"):
            params[name] = wb(name)

    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:10]} ...")
    return params
