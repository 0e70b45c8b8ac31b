"""SCNet — sparse-compression network for music source separation.

Behavioral spec: reference models/scnet/scnet.py:230-373 and
models/scnet/separation.py. Architecture: normalized STFT → three stacked
sparse-downsample (SD) blocks that split the spectrum into low/mid/high
bands with different down-sampling strides and per-band conformer-style
GLU convolution modules → a dual-path separation network alternating
frequency/time BiLSTMs with rFFT feature interleaving along frames →
sparse-upsample decoder blocks with GLU fusion of encoder skips →
complex-as-channels iSTFT.

The BiLSTMs run as ``lax.scan`` cells with the per-step input projection
hoisted into one GEMM (SURVEY.md §7 hard part (c)); the frame-axis
rFFT/irFFT of FeatureConversion uses the GEMM-native ortho DFT (no FFT on
this backend).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.fft import irdft_ortho, rdft_ortho
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri


def _model_kwargs(config, variant="lstm"):
    kw = dict(
        sources=["drums", "bass", "other", "vocals"],
        audio_channels=2,
        dims=[4, 32, 64, 128],
        nfft=4096,
        hop_size=1024,
        win_size=4096,
        normalized=True,
        band_SR=[0.175, 0.392, 0.433],
        band_stride=[1, 4, 16],
        band_kernel=[3, 4, 16],
        conv_depths=[3, 2, 1],
        compress=4,
        conv_kernel=3,
        num_dplayer=6,
        expand=1,
    )
    if variant == "tran":
        kw.update(tran_rotary_embedding_dim=64, tran_depth=1, tran_heads=8,
                  tran_dim_head=64, tran_attn_dropout=0.0, tran_ff_dropout=0.0,
                  tran_flash_attn=False)
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    kw["sources"] = list(kw["sources"])
    kw["dims"] = list(kw["dims"])
    return kw


def _window(kw, variant):
    """scnet/scnet_tran pass NO window to torch.stft (boxcar); scnet_masked
    uses a periodic hann of length nfft (reference scnet.py:338,
    scnet_masked.py:293)."""
    if variant == "masked":
        return hann_window(kw["nfft"])
    return jnp.ones((kw["win_size"],), dtype=jnp.float32)


def _band_splits(fr: int, band_sr) -> list:
    lo = math.ceil(fr * band_sr[0])
    mid = math.ceil(fr * (band_sr[0] + band_sr[1]))
    return [(0, lo), (lo, mid), (mid, fr)]


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config, variant="lstm"):
    kw = _model_kwargs(config, variant)
    dims = kw["dims"]
    keys = iter(jax.random.split(rng, 4096))

    def conv_w(ci, co, kh, kw_):
        fan = ci * kh * kw_
        return {
            "weight": L.kaiming_uniform(next(keys), (co, ci, kh, kw_), fan),
            "bias": L.kaiming_uniform(next(keys), (co,), fan),
        }

    def conv1d_w(ci, co, k, groups=1):
        fan = (ci // groups) * k
        return {
            "weight": L.kaiming_uniform(next(keys), (co, ci // groups, k), fan),
            "bias": L.kaiming_uniform(next(keys), (co,), fan),
        }

    def norm_w(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def lin_w(ci, co):
        return {
            "weight": L.kaiming_uniform(next(keys), (co, ci), ci),
            "bias": L.kaiming_uniform(next(keys), (co,), ci),
        }

    def lstm_dir(d, h):
        return {
            "weight_ih": L.kaiming_uniform(next(keys), (4 * h, d), h),
            "weight_hh": L.kaiming_uniform(next(keys), (4 * h, h), h),
            "bias_ih": L.kaiming_uniform(next(keys), (4 * h,), h),
            "bias_hh": L.kaiming_uniform(next(keys), (4 * h,), h),
        }

    def conv_module(c, depth):
        hidden = int(c / kw["compress"])
        k = kw["conv_kernel"]
        return [
            {
                "norm1": norm_w(c),
                "conv_in": conv1d_w(c, hidden * 2, k),
                "conv_dw": conv1d_w(hidden, hidden, k, groups=hidden),
                "norm2": norm_w(hidden),
                "conv_pw": conv1d_w(hidden, c, 1),
            }
            for _ in range(depth)
        ]

    encoder = []
    for i in range(len(dims) - 1):
        ci, co = dims[i], dims[i + 1]
        encoder.append(
            {
                "sd_convs": [conv_w(ci, co, k, 1) for k in kw["band_kernel"]],
                "conv_modules": [conv_module(co, d) for d in kw["conv_depths"]],
                "global_conv": conv_w(co, co, kw["conv_kernel"], kw["conv_kernel"]),
            }
        )

    decoder = []
    for i in reversed(range(len(dims) - 1)):
        co = dims[i] if i != 0 else dims[0] * len(kw["sources"])
        decoder.append(
            {
                "fusion_conv": conv_w(dims[i + 1] * 2, dims[i + 1] * 2, 3, 3),
                # ConvTranspose2d weights: IOHW
                "su_convs": [
                    {
                        "weight": L.kaiming_uniform(
                            next(keys), (dims[i + 1], co, k, 1), dims[i + 1] * k
                        ),
                        "bias": L.kaiming_uniform(next(keys), (co,), dims[i + 1] * k),
                    }
                    for k in kw["band_kernel"]
                ],
            }
        )

    separation = []
    c = dims[-1]
    for i in range(kw["num_dplayer"]):
        d = c * (2 if i % 2 == 1 else 1)
        h = d * kw["expand"]
        if variant == "tran":
            from sesa_tpu.models import roformer_core as core

            separation.append(
                {
                    "freq_norm": norm_w(d),
                    "time_norm": norm_w(d),
                    "freq_tran": core.transformer_init(
                        next(keys), d, kw["tran_depth"], kw["tran_heads"],
                        kw["tran_dim_head"], norm_output=True),
                    "time_tran": core.transformer_init(
                        next(keys), d, kw["tran_depth"], kw["tran_heads"],
                        kw["tran_dim_head"], norm_output=True),
                }
            )
        else:
            separation.append(
                {
                    "freq": {
                        "norm": norm_w(d),
                        "lstm": {"fwd": lstm_dir(d, h), "bwd": lstm_dir(d, h)},
                        "linear": lin_w(2 * h, d),
                    },
                    "time": {
                        "norm": norm_w(d),
                        "lstm": {"fwd": lstm_dir(d, h), "bwd": lstm_dir(d, h)},
                        "linear": lin_w(2 * h, d),
                    },
                }
            )

    params = {"encoder": encoder, "separation": separation, "decoder": decoder}
    if variant == "tran":
        from sesa_tpu.ops.rope import default_freqs

        params["rope_time_freqs"] = jnp.asarray(default_freqs(kw["tran_rotary_embedding_dim"]))
        params["rope_freq_freqs"] = jnp.asarray(default_freqs(kw["tran_rotary_embedding_dim"]))
        # declared but unused in the reference forward (scnet_tran.py:586)
        params["first_conv"] = conv_w(dims[0], dims[0], 1, 1)["weight"]
    if variant == "masked":
        params["pos_embed_f"] = 0.02 * jax.random.truncated_normal(
            next(keys), -2.0, 2.0, (1, dims[0], kw["nfft"] // 2 + 1, 1))
        params["mask_conv1"] = conv_w(dims[0] * len(kw["sources"]), 64, 3, 3)
        params["mask_conv2"] = conv_w(64, dims[0] * len(kw["sources"]), 1, 1)
    return params


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _apply_conv_module(blocks, x):
    """(B', C, T) conformer-style GLU residual stack."""
    for blk in blocks:
        y = L.group_norm(x, blk["norm1"], 1)
        y = L.conv1d(y, blk["conv_in"]["weight"], blk["conv_in"]["bias"],
                     padding=blk["conv_in"]["weight"].shape[-1] // 2)
        a, b = jnp.split(y, 2, axis=1)
        y = a * jax.nn.sigmoid(b)  # GLU over channels
        hidden = y.shape[1]
        y = L.conv1d(y, blk["conv_dw"]["weight"], blk["conv_dw"]["bias"],
                     padding=blk["conv_dw"]["weight"].shape[-1] // 2, groups=hidden)
        y = L.group_norm(y, blk["norm2"], 1)
        y = L.swish(y)
        y = L.conv1d(y, blk["conv_pw"]["weight"], blk["conv_pw"]["bias"])
        x = x + y
    return x


def _apply_sd_block(params, x, kw):
    """Sparse downsample: split bands, strided conv, conv modules, global conv."""
    b, c, fr, t = x.shape
    splits = _band_splits(fr, kw["band_SR"])
    bands = []
    original_lengths = []
    for bi, (start, end) in enumerate(splits):
        conv = params["sd_convs"][bi]
        stride = kw["band_stride"][bi]
        kernel = kw["band_kernel"][bi]
        ext = x[:, :, start:end, :]
        original_lengths.append(end - start)
        cur = ext.shape[2]
        if stride == 1:
            total_pad = kernel - stride
        else:
            total_pad = (stride - cur % stride) % stride
        pl, pr = total_pad // 2, total_pad - total_pad // 2
        ext = jnp.pad(ext, ((0, 0), (0, 0), (pl, pr), (0, 0)))
        out = L.conv2d(ext, conv["weight"], conv["bias"], stride=(stride, 1))
        # per-band conv modules operate on (B*f, C, T)
        bb, cc, ff, tt = out.shape
        flat = jnp.transpose(out, (0, 2, 1, 3)).reshape(bb * ff, cc, tt)
        flat = _apply_conv_module(params["conv_modules"][bi], flat)
        out = jnp.transpose(flat.reshape(bb, ff, cc, tt), (0, 2, 1, 3))
        bands.append(jax.nn.gelu(out, approximate=False))

    lengths = [band.shape[2] for band in bands]
    full = jnp.concatenate(bands, axis=2)
    skip = full
    k = params["global_conv"]["weight"].shape[-1]
    out = L.conv2d(full, params["global_conv"]["weight"], params["global_conv"]["bias"],
                   padding=((k - 1) // 2, (k - 1) // 2))
    return out, skip, lengths, original_lengths


def _apply_dual_path(p, x):
    """One DualPathRNN layer on (B, C, F, T) (reference separation.py:37-83)."""
    b, c, fr, t = x.shape
    # frequency path
    orig = x
    y = L.group_norm(x, p["freq"]["norm"], 1)
    y = jnp.transpose(y, (0, 3, 2, 1)).reshape(b * t, fr, c)
    y = L.bilstm(y, p["freq"]["lstm"])
    y = L.linear(y, p["freq"]["linear"])
    y = jnp.transpose(y.reshape(b, t, fr, c), (0, 3, 2, 1))
    x = y + orig
    # time path
    orig = x
    y = L.group_norm(x, p["time"]["norm"], 1)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b * fr, t, c)
    y = L.bilstm(y, p["time"]["lstm"])
    y = L.linear(y, p["time"]["linear"])
    y = jnp.transpose(y.reshape(b, fr, t, c), (0, 3, 1, 2))
    return y + orig


def _apply_dual_path_tran(p, x, rope_time, rope_freq, kw):
    """scnet_tran's DualPathTran (reference scnet_tran.py:196-247)."""
    from sesa_tpu.models import roformer_core as core

    b, c, fr, t = x.shape
    heads = kw["tran_heads"]
    orig = x
    y = L.group_norm(x, p["freq_norm"], 1)
    y = jnp.transpose(y, (0, 3, 2, 1)).reshape(b * t, fr, c)
    y = core.transformer_apply(p["freq_tran"], y, heads, rope=rope_freq)
    y = jnp.transpose(y.reshape(b, t, fr, c), (0, 3, 2, 1))
    x = y + orig
    orig = x
    y = L.group_norm(x, p["time_norm"], 1)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b * fr, t, c)
    y = core.transformer_apply(p["time_tran"], y, heads, rope=rope_time)
    y = jnp.transpose(y.reshape(b, fr, t, c), (0, 3, 1, 2))
    return y + orig


def _feature_conversion(x, inverse):
    """rFFT interleave along frames, channels <-> complex (separation.py:6-34)."""
    if inverse:
        c = x.shape[1]
        ri = jnp.stack([x[:, : c // 2], x[:, c // 2 :]], axis=-1)  # (B,C/2,F,K,2)
        return irdft_ortho(ri, 2 * (x.shape[-1] - 1))
    spec = rdft_ortho(x)  # (B,C,F,K,2)
    return jnp.concatenate([spec[..., 0], spec[..., 1]], axis=1)


def apply(params, config, x, variant="lstm", compute_dtype=None):
    """(B, ch, T) -> (B, sources, ch, T).

    ``compute_dtype``: run the encoder/dual-path/decoder net in this dtype
    (bf16 on TPU); STFT/iSTFT and the mask application stay float32."""
    kw = _model_kwargs(config, variant)
    b, ch, length = x.shape
    hop = kw["hop_size"]

    padding = hop - length % hop
    if (length + padding) // hop % 2 == 0:
        padding += hop
    x = jnp.pad(x, ((0, 0), (0, 0), (0, padding)))
    lpad = x.shape[-1]

    window = _window(kw, variant).astype(x.dtype)
    spec = stft_ri(x.reshape(-1, lpad), kw["nfft"], hop, window,
                   win_length=window.shape[0], normalized=kw["normalized"])
    # (B*ch, F, T, 2) -> (B, ch*2, F, T) with (ch, c) channel order... the
    # reference packs (B*ch, 2, F, T) then reshapes to (B, 2*ch, F, T): the
    # resulting channel order is (ch major, complex minor)
    bc, fr, t, _ = spec.shape
    spec = jnp.transpose(spec, (0, 3, 1, 2))  # (B*ch, 2, F, T)
    z = spec.reshape(b, ch * 2, fr, t)
    mixture = z

    if compute_dtype is not None:
        z = z.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    if variant == "masked":
        z = z + params["pos_embed_f"][:, :, :fr, :]


    skips, lens, olens = [], [], []
    for blk in params["encoder"]:
        z, skip, lengths, original_lengths = _apply_sd_block(blk, z, kw)
        skips.append(skip)
        lens.append(lengths)
        olens.append(original_lengths)

    # dual-path separation with alternating rfft/irfft feature interleave:
    # even layers rfft frames (channels double), odd layers irfft back
    for i, layer in enumerate(params["separation"]):
        if variant == "tran":
            from sesa_tpu.ops.rope import rope_tables

            cur_t = z.shape[-1]
            # build angles in f32 (bf16 angles lose phase accuracy), then
            # drop the tables to the network dtype
            rt = rope_tables(params["rope_time_freqs"].astype(jnp.float32), cur_t)
            rf = rope_tables(params["rope_freq_freqs"].astype(jnp.float32), z.shape[-2])
            if compute_dtype is not None:
                rt = tuple(r.astype(compute_dtype) for r in rt)
                rf = tuple(r.astype(compute_dtype) for r in rf)
            z = _apply_dual_path_tran(layer, z, rt, rf, kw)
        else:
            z = _apply_dual_path(layer, z)
        z = _feature_conversion(z, inverse=(i % 2 == 1))
        if compute_dtype is not None:
            # the GEMM-native rDFT runs against f32 tables and promotes
            z = z.astype(compute_dtype)

    for blk in params["decoder"]:
        skip = skips.pop()
        z = z + skip
        z = jnp.concatenate([z, z], axis=1)  # repeat(1, 2, 1, 1)
        z = L.conv2d(z, blk["fusion_conv"]["weight"], blk["fusion_conv"]["bias"],
                     padding=(1, 1))
        a, g = jnp.split(z, 2, axis=1)
        z = a * jax.nn.sigmoid(g)  # GLU over channels
        # sparse upsample
        lengths = lens.pop()
        original_lengths = olens.pop()
        splits = [
            (0, lengths[0]),
            (lengths[0], lengths[0] + lengths[1]),
            (lengths[0] + lengths[1], z.shape[2]),
        ]
        outs = []
        for bi, (start, end) in enumerate(splits):
            conv = blk["su_convs"][bi]
            stride = kw["band_stride"][bi]
            out = L.conv_transpose2d(z[:, :, start:end, :], conv["weight"],
                                     conv["bias"], stride=(stride, 1))
            cur = out.shape[2]
            dist = abs(original_lengths[bi] - cur) // 2
            outs.append(out[:, :, dist : dist + original_lengths[bi], :])
        z = jnp.concatenate(outs, axis=2)

    n = kw["dims"][0]
    n_sources = len(kw["sources"])
    z = z.astype(jnp.float32)  # mask application + iSTFT run float32

    if variant == "masked":
        # predict a complex mask and apply it to the tiled mixture
        # (reference scnet_masked.py:333-415); z was cast back to f32
        # above, so the mask-head weights must follow (conv rejects
        # mixed dtypes under a bf16 compute policy)
        params = {**params,
                  "mask_conv1": jax.tree.map(
                      lambda a: a.astype(jnp.float32), params["mask_conv1"]),
                  "mask_conv2": jax.tree.map(
                      lambda a: a.astype(jnp.float32), params["mask_conv2"])}
        mask = L.conv2d(z, params["mask_conv1"]["weight"],
                        params["mask_conv1"]["bias"], padding=(1, 1))
        mask = jax.nn.gelu(mask, approximate=False)
        mask = L.conv2d(mask, params["mask_conv2"]["weight"],
                        params["mask_conv2"]["bias"])
        mask = jnp.tanh(mask)
        mix_tiled = jnp.tile(mixture, (1, n_sources, 1, 1))
        mr = mix_tiled.reshape(b, n, -1, fr, t).reshape(-1, 2, fr, t)
        mk = mask.reshape(b, n, -1, fr, t).reshape(-1, 2, fr, t)
        re = mr[:, 0] * mk[:, 0] - mr[:, 1] * mk[:, 1]
        im = mr[:, 0] * mk[:, 1] + mr[:, 1] * mk[:, 0]
        z = jnp.stack([re, im], axis=-1)  # (.., F, T, 2)
    else:
        z = z.reshape(b, n, -1, fr, t)  # reference scnet.py:365
        z = z.reshape(-1, 2, fr, t)
        z = jnp.transpose(z, (0, 2, 3, 1))  # (.., F, T, 2)

    wav = istft_ri(z, kw["nfft"], hop, window, win_length=window.shape[0],
                   normalized=kw["normalized"])
    wav = wav.reshape(b, n_sources, ch, -1)
    return wav[..., : wav.shape[-1] - padding]


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config, variant="lstm"):
    """Map a reference SCNet state_dict onto this param pytree.

    Key scheme (reference models/scnet/scnet.py + separation.py):
    encoder.{i}.SDlayer.convs.{b}, conv_modules.{b}.layers.{d}.{0,1,3,4,6},
    globalconv; separation_net.dp_modules.{i}.{norm,lstm,linear}_layers.{0,1}
    (LSTM with _reverse direction suffixes); decoder.{i}.0.conv (fusion) and
    decoder.{i}.1.convtrs.{b} (sparse upsample). Variants add:
    tran — dp_modules.{i}.{norm_layers,{time,freq}_layer} transformers and an
    unused first_conv; masked — pos_embed_f and mask_layer convs.
    """
    kw = _model_kwargs(config, variant)
    dims = kw["dims"]
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def wb(prefix):
        return {"weight": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def conv_module(prefix, depth):
        blocks = []
        for d in range(depth):
            p = f"{prefix}.layers.{d}"
            blocks.append(
                {
                    "norm1": wb(f"{p}.0"),
                    "conv_in": wb(f"{p}.1"),
                    "conv_dw": wb(f"{p}.3"),
                    "norm2": wb(f"{p}.4"),
                    "conv_pw": wb(f"{p}.6"),
                }
            )
        return blocks

    encoder = []
    for i in range(len(dims) - 1):
        encoder.append(
            {
                "sd_convs": [wb(f"encoder.{i}.SDlayer.convs.{bi}") for bi in range(3)],
                "conv_modules": [
                    conv_module(f"encoder.{i}.conv_modules.{bi}", kw["conv_depths"][bi])
                    for bi in range(3)
                ],
                "global_conv": wb(f"encoder.{i}.globalconv"),
            }
        )

    def lstm_params(prefix, reverse):
        suffix = "_reverse" if reverse else ""
        return {
            "weight_ih": take(f"{prefix}.weight_ih_l0{suffix}"),
            "weight_hh": take(f"{prefix}.weight_hh_l0{suffix}"),
            "bias_ih": take(f"{prefix}.bias_ih_l0{suffix}"),
            "bias_hh": take(f"{prefix}.bias_hh_l0{suffix}"),
        }

    separation = []
    for i in range(kw["num_dplayer"]):
        p = f"separation_net.dp_modules.{i}"
        if variant == "tran":
            from sesa_tpu.models import roformer_core as core

            separation.append({
                "freq_norm": wb(f"{p}.norm_layers.0"),
                "time_norm": wb(f"{p}.norm_layers.1"),
                "freq_tran": core.convert_transformer(
                    take, f"{p}.freq_layer", kw["tran_depth"], norm_output=True),
                "time_tran": core.convert_transformer(
                    take, f"{p}.time_layer", kw["tran_depth"], norm_output=True),
            })
        else:
            layer = {}
            for j, name in enumerate(("freq", "time")):
                layer[name] = {
                    "norm": wb(f"{p}.norm_layers.{j}"),
                    "lstm": {
                        "fwd": lstm_params(f"{p}.lstm_layers.{j}", False),
                        "bwd": lstm_params(f"{p}.lstm_layers.{j}", True),
                    },
                    "linear": wb(f"{p}.linear_layers.{j}"),
                }
            separation.append(layer)

    decoder = []
    for i in range(len(dims) - 1):
        decoder.append(
            {
                "fusion_conv": wb(f"decoder.{i}.0.conv"),
                "su_convs": [wb(f"decoder.{i}.1.convtrs.{bi}") for bi in range(3)],
            }
        )

    params = {"encoder": encoder, "separation": separation, "decoder": decoder}
    if variant == "tran":
        from sesa_tpu.ops.rope import default_freqs

        params["first_conv"] = take("first_conv.weight")
        d_rope = kw["tran_rotary_embedding_dim"]
        # one RotaryEmbedding instance per axis is shared across every
        # attention layer, so its freqs parameter shows up in the state dict
        # once per layer under ...{time,freq}_layer.layers.{j}.0.rotary_embed
        # (reference scnet_tran.py:263-268). Read one, consume all.
        for axis, pname in (("time", "rope_time_freqs"),
                            ("freq", "rope_freq_freqs")):
            keys = sorted(k for k in sd
                          if f"{axis}_layer." in k and k.endswith("rotary_embed.freqs"))
            if keys:
                params[pname] = take(keys[0])
                used.update(keys)
            else:
                params[pname] = jnp.asarray(default_freqs(d_rope))
    if variant == "masked":
        params["pos_embed_f"] = take("pos_embed_f")
        params["mask_conv1"] = wb("mask_layer.0")
        params["mask_conv2"] = wb("mask_layer.2")

    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
