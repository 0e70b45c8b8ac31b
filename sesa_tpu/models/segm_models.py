"""segm_models / torchseg — STFT image segmentation U-Nets.

Behavioral spec: reference models/segm_models.py:190-255 and
models/torchseg_models.py:190-255 — the mdx23c-style shell (STFT with
complex-as-channels, subband fold, 1×1 first conv, decoder output gated by
the first conv output, final 1×1 convs, iSTFT) around an image
segmentation network from `segmentation_models_pytorch` / `torchseg` with
an imagenet-pretrained encoder (e.g. the VitLarge23 vocal checkpoint uses
a timm MaxViT encoder).

Three encoder zoos are implemented natively with full checkpoint
conversion: MaxViT (the one the curated registry actually needs —
VOCALS-VitLarge23 uses ``tu-maxvit_large_tf_512``; sesa_tpu/models/
maxvit_unet.py), the torchvision ResNet family (resnet18/34/50/101/152,
the most common community choice; sesa_tpu/models/resnet_unet.py), and
the EfficientNet family (efficientnet-b0..b7, lukemelas/smp layout;
sesa_tpu/models/efficientnet_unet.py). Configs naming other encoder zoos
(resnext/mobilenet/...) fall back to the shell with a self-contained
symmetric conv U-Net: new models can be initialized/trained/ran, but
converting those community checkpoints raises a typed error naming the
unsupported encoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sesa_tpu.models import layers as L
from sesa_tpu.models import efficientnet_unet, maxvit_unet, resnet_unet
from sesa_tpu.models.mdx23c import (
    _cac2cws,
    _cws2cac,
    inverse_spectrogram,
    num_target_instruments,
    spectrogram,
)

_DEPTH = 4


def _dims(config):
    k = config.model.num_subbands
    dim_c = k * config.audio.num_channels * 2
    c = config.model.num_channels
    return k, dim_c, c


def init(rng, config):
    k, dim_c, c = _dims(config)
    s = num_target_instruments(config)
    keys = iter(jax.random.split(rng, 64))

    native = None
    if maxvit_unet.is_maxvit(config):
        native = (maxvit_unet, maxvit_unet.spec_from_config(config))
    elif resnet_unet.is_resnet(config):
        native = (resnet_unet, resnet_unet.spec_from_config(config))
    elif efficientnet_unet.is_efficientnet(config):
        native = (efficientnet_unet, efficientnet_unet.spec_from_config(config))
    if native is not None:
        mod, spec = native
        _require_unet_decoder(config)
        r1, r2 = jax.random.split(rng)
        kk = iter(jax.random.split(r2, 8))

        def cw(ci, co):
            return L.kaiming_uniform(next(kk), (co, ci, 1, 1), ci)

        return {"first_conv": cw(dim_c, c),
                "unet": mod.init(r1, c, spec),
                "final_conv1": cw(c + dim_c, c),
                "final_conv2": cw(c, s * dim_c)}

    def conv_w(ci, co, kh, kw):
        return L.kaiming_uniform(next(keys), (co, ci, kh, kw), ci * kh * kw)

    def block(ci, co):
        return {
            "conv1": conv_w(ci, co, 3, 3),
            "norm1": {"weight": jnp.ones((co,)), "bias": jnp.zeros((co,))},
            "conv2": conv_w(co, co, 3, 3),
            "norm2": {"weight": jnp.ones((co,)), "bias": jnp.zeros((co,))},
        }

    params = {"first_conv": conv_w(dim_c, c, 1, 1)}
    enc, cc = [], c
    for _ in range(_DEPTH):
        enc.append({"block": block(cc, cc * 2), "down": conv_w(cc * 2, cc * 2, 2, 2)})
        cc *= 2
    params["encoder"] = enc
    params["bottleneck"] = block(cc, cc)
    dec = []
    for _ in range(_DEPTH):
        # after upsampling (cc -> cc//2), the skip from the matching encoder
        # level contributes cc channels
        dec.append({"up": L.kaiming_uniform(next(keys), (cc, cc // 2, 2, 2), cc * 4),
                    "block": block(cc // 2 + cc, cc // 2)})
        cc //= 2
    params["decoder"] = dec
    params["final_conv1"] = conv_w(c + dim_c, c, 1, 1)
    params["final_conv2"] = conv_w(c, s * dim_c, 1, 1)
    return params


def _require_unet_decoder(config):
    dec = config.model.get("decoder_type", "unet")
    if dec != "unet":
        raise NotImplementedError(
            f"native encoders (maxvit/resnet/efficientnet) are implemented "
            f"for decoder_type 'unet' (smp.Unet, the layout VitLarge23 "
            f"uses); got {dec!r}")


def _block_apply(p, x, act):
    x = L.conv2d(x, p["conv1"], padding=(1, 1))
    x = act(L.instance_norm2d(x, p["norm1"]))
    x = L.conv2d(x, p["conv2"], padding=(1, 1))
    return act(L.instance_norm2d(x, p["norm2"]))


def _unet_apply(params, x, act):
    skips = []
    for e in params["encoder"]:
        x = _block_apply(e["block"], x, act)
        skips.append(x)
        x = L.conv2d(x, e["down"], stride=(2, 2))
    x = _block_apply(params["bottleneck"], x, act)
    for d in params["decoder"]:
        x = L.conv_transpose2d_block(x, d["up"])
        x = jnp.concatenate([x, skips.pop()], axis=1)
        x = _block_apply(d["block"], x, act)
    return x


def image_path(params, config, mix):
    """The spectral-image path (everything between STFT and iSTFT):
    (B, dim_c, f//k, t) -> (B, S*dim_c, f//k, t). Mirrors reference
    Segm_Models_Net.forward minus the STFT pair."""
    act = L.make_act(config.model.act)
    first_out = xx = L.conv2d(mix, params["first_conv"])
    xx = jnp.swapaxes(xx, -1, -2)
    if "unet" in params:
        if maxvit_unet.is_maxvit(config):
            xx = maxvit_unet.apply(params["unet"], xx,
                                   maxvit_unet.spec_from_config(config))
        elif resnet_unet.is_resnet(config):
            xx = resnet_unet.apply(params["unet"], xx,
                                   resnet_unet.spec_from_config(config))
        else:
            xx = efficientnet_unet.apply(
                params["unet"], xx, efficientnet_unet.spec_from_config(config))
    else:
        xx = _unet_apply(params, xx, act)
    xx = jnp.swapaxes(xx, -1, -2)
    xx = xx * first_out
    xx = L.conv2d(jnp.concatenate([mix, xx], axis=1), params["final_conv1"])
    return L.conv2d(act(xx), params["final_conv2"])


def apply(params, config, x):
    """(B, ch, T) -> (B, S, ch, T) (shell identical to mdx23c's)."""
    k, dim_c, c = _dims(config)
    s_stems = num_target_instruments(config)
    length = x.shape[-1]

    spec = spectrogram(x, config)
    mix = _cac2cws(spec, k)
    xx = image_path(params, config, mix)
    xx = _cws2cac(xx, k)
    b = xx.shape[0]
    xx = xx.reshape(b, s_stems, dim_c // k, xx.shape[-2], xx.shape[-1])
    wav = inverse_spectrogram(xx, config, length)
    if wav.shape[-1] < length:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, length - wav.shape[-1])])
    return wav[..., :length]


def convert_torch(state_dict, config):
    """Convert a reference Segm_Models_Net / Torchseg_Net state dict.

    Shell keys (reference segm_models.py:190-255): ``first_conv.weight``,
    ``unet_model.*`` (the smp/torchseg model), ``final_conv.0.weight``,
    ``final_conv.2.weight``. MaxViT-Unet (VitLarge23) and ResNet-Unet
    checkpoints convert fully; other encoder zoos raise typed."""
    if maxvit_unet.is_maxvit(config):
        sub_mod, spec = maxvit_unet, maxvit_unet.spec_from_config(config)
    elif resnet_unet.is_resnet(config):
        sub_mod, spec = resnet_unet, resnet_unet.spec_from_config(config)
    elif efficientnet_unet.is_efficientnet(config):
        sub_mod = efficientnet_unet
        spec = efficientnet_unet.spec_from_config(config)
    else:
        raise NotImplementedError(
            "segm_models/torchseg checkpoint conversion is implemented for "
            "MaxViT-Unet (the layout the curated registry needs, e.g. "
            "VOCALS-VitLarge23), ResNet-Unet, and EfficientNet-Unet (b0-b7) "
            f"encoders; this config names encoder "
            f"{str(config.model.get('encoder_name', '?'))!r}, whose imagenet "
            "zoo (segmentation_models_pytorch / torchseg / timm) is not "
            "reproduced in this TPU build. Use the roformer/mdx23c/scnet "
            "families, or initialize this architecture fresh with init()."
        )
    _require_unet_decoder(config)
    import numpy as np

    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    # torchseg wraps the timm model directly as `encoder`; smp's
    # TimmUniversalEncoder nests it as `encoder.model`.
    prefix = "unet_model."
    if f"{prefix}encoder.model.stem.conv1.weight" not in sd and \
            f"{prefix}encoder.stem.conv1.weight" in sd:
        sd = {k.replace("unet_model.encoder.", "unet_model.encoder.model."): v
              for k, v in sd.items()}

    params = {"first_conv": take("first_conv.weight"),
              "unet": sub_mod.convert(sd, take, prefix, spec),
              "final_conv1": take("final_conv.0.weight"),
              "final_conv2": take("final_conv.2.weight")}
    unused = set(sd) - used
    if unused:
        raise ValueError(
            f"unconsumed segm_models checkpoint keys: {sorted(unused)[:10]} "
            f"(+{max(0, len(unused) - 10)} more) — the checkpoint layout "
            "differs from the reconstructed timm/smp layout; refusing to "
            "load it partially.")
    return params
