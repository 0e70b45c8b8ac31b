"""segm_models / torchseg — STFT image segmentation U-Nets.

Behavioral spec: reference models/segm_models.py:190-255 and
models/torchseg_models.py:190-255 — the mdx23c-style shell (STFT with
complex-as-channels, subband fold, 1×1 first conv, decoder output gated by
the first conv output, final 1×1 convs, iSTFT) around an image
segmentation network from `segmentation_models_pytorch` / `torchseg` with
an imagenet-pretrained encoder (e.g. the VitLarge23 vocal checkpoint uses
a timm MaxViT encoder).

Those encoder zoos cannot be reproduced offline, so this module provides
the shell with a self-contained symmetric conv U-Net: new models can be
initialized/trained/ran, but converting community checkpoints that embed
smp/torchseg/timm encoders is explicitly unsupported (convert_torch raises
with that explanation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sesa_tpu.models import layers as L
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


def apply(params, config, x):
    """(B, ch, T) -> (B, S, ch, T) (shell identical to mdx23c's)."""
    k, dim_c, c = _dims(config)
    act = L.make_act(config.model.act)
    s_stems = num_target_instruments(config)
    length = x.shape[-1]

    spec = spectrogram(x, config)
    mix = xx = _cac2cws(spec, k)
    first_out = xx = L.conv2d(xx, params["first_conv"])
    xx = jnp.swapaxes(xx, -1, -2)
    xx = _unet_apply(params, xx, act)
    xx = jnp.swapaxes(xx, -1, -2)
    xx = xx * first_out
    xx = L.conv2d(jnp.concatenate([mix, xx], axis=1), params["final_conv1"])
    xx = L.conv2d(act(xx), params["final_conv2"])
    xx = _cws2cac(xx, k)
    b = xx.shape[0]
    xx = xx.reshape(b, s_stems, dim_c // k, xx.shape[-2], xx.shape[-1])
    wav = inverse_spectrogram(xx, config, length)
    if wav.shape[-1] < length:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, length - wav.shape[-1])])
    return wav[..., :length]


def convert_torch(state_dict, config):
    raise NotImplementedError(
        "segm_models/torchseg checkpoints embed imagenet-pretrained encoders "
        "from segmentation_models_pytorch / torchseg / timm (e.g. MaxViT for "
        "VOCALS-VitLarge23), which cannot be reproduced in this TPU build. "
        "Use the roformer/mdx23c/scnet families, or initialize this "
        "architecture fresh with init()."
    )
