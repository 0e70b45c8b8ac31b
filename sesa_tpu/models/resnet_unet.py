"""ResNet-encoder smp.Unet for segm_models / torchseg checkpoints.

The reference builds its segmentation U-Nets with arbitrary
`segmentation_models_pytorch` encoders (reference models/segm_models.py:
64-110, ``smp.Unet(encoder_name=...)``); the curated registry only needs
MaxViT (models/maxvit_unet.py), but community checkpoints commonly use
the ResNet zoo. This implements that zoo natively: a torchvision-layout
ResNet encoder (7x7/2 stem conv + BN + ReLU, 3x3/2 max-pool, four stages
of BasicBlock or Bottleneck) feeding the same smp UnetDecoder geometry
maxvit_unet uses (2x upsample + skip concat + two conv3x3-BN-ReLU, then
a 3x3 segmentation head).

Feature pyramid matches smp's ResNetEncoder: [relu1 (1/2), layer1 (1/4),
layer2 (1/8), layer3 (1/16), layer4 (1/32)]; the decoder consumes them
deepest-first with the final block skip-less, so the output returns to
the input resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sesa_tpu.models import layers as L

# torchvision layouts; expansion is the Bottleneck output multiplier
RESNET_SPECS = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2), expansion=1),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3), expansion=1),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3), expansion=4),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3), expansion=4),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3), expansion=4),
}

_DEFAULT_DECODER = (256, 128, 64, 32, 16)


def is_resnet(config) -> bool:
    return str(config.model.get("encoder_name", "")) in RESNET_SPECS


def spec_from_config(config):
    name = str(config.model.encoder_name)
    s = dict(RESNET_SPECS[name])
    # tiny-test override: config.model.resnet = {base: 8, layers: [1,1,1,1]}
    over = dict(config.model.get("resnet", {}) or {})
    s["base"] = int(over.get("base", 64))
    if "layers" in over:
        s["layers"] = tuple(int(v) for v in over["layers"])
    dec = dict(config.get("decoder_unet", {}) or {})
    s["decoder_channels"] = tuple(
        int(v) for v in dec.get("decoder_channels", _DEFAULT_DECODER))
    return s


def _stage_channels(spec):
    b = spec["base"]
    return [b, 2 * b, 4 * b, 8 * b]


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, in_channels, spec):
    keys = iter(jax.random.split(rng, 4096))
    exp = spec["expansion"]

    def conv(ci, co, k):
        return {"weight": L.kaiming_uniform(next(keys), (co, ci, k, k),
                                            ci * k * k)}

    def bn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

    def basic(ci, co, stride):
        p = {"conv1": conv(ci, co, 3), "bn1": bn(co),
             "conv2": conv(co, co, 3), "bn2": bn(co)}
        if stride != 1 or ci != co:
            p["downsample"] = {"conv": conv(ci, co, 1), "bn": bn(co)}
        return p

    def bottleneck(ci, cm, stride):
        co = cm * exp
        p = {"conv1": conv(ci, cm, 1), "bn1": bn(cm),
             "conv2": conv(cm, cm, 3), "bn2": bn(cm),
             "conv3": conv(cm, co, 1), "bn3": bn(co)}
        if stride != 1 or ci != co:
            p["downsample"] = {"conv": conv(ci, co, 1), "bn": bn(co)}
        return p

    base = spec["base"]
    params = {"conv1": conv(in_channels, base, 7), "bn1": bn(base)}
    ci = base
    stages = []
    for si, (cm, depth) in enumerate(zip(_stage_channels(spec),
                                         spec["layers"])):
        blocks = []
        for bi in range(depth):
            stride = 2 if (si > 0 and bi == 0) else 1
            if spec["block"] == "basic":
                blocks.append(basic(ci, cm, stride))
                ci = cm
            else:
                blocks.append(bottleneck(ci, cm, stride))
                ci = cm * exp
        stages.append(blocks)
    params["layers"] = stages

    # smp UnetDecoder: in = prev_out + skip, out = decoder_channels[i]
    feat = [base] + [c * exp for c in _stage_channels(spec)]
    head = feat[-1]
    skips = feat[-2::-1] + [0]  # deepest-first, last block skip-less
    decoder = []
    cc = head
    for dc, sk in zip(spec["decoder_channels"], skips):
        decoder.append({
            "conv1": {"conv": conv(cc + sk, dc, 3), "bn": bn(dc)},
            "conv2": {"conv": conv(dc, dc, 3), "bn": bn(dc)},
        })
        cc = dc
    params["decoder"] = decoder
    params["seg_head"] = {
        "weight": L.kaiming_uniform(
            next(keys), (in_channels, cc, 3, 3), cc * 9),
        "bias": jnp.zeros((in_channels,)),
    }
    return params


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _maxpool_3x3s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) on NCHW."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))


def _bn(x, p):
    return L.batch_norm2d(x, p)


def _block_apply(p, x, stride, kind):
    idn = x
    if kind == "basic":
        y = jax.nn.relu(_bn(L.conv2d(x, p["conv1"]["weight"],
                                     stride=(stride, stride),
                                     padding=(1, 1)), p["bn1"]))
        y = _bn(L.conv2d(y, p["conv2"]["weight"], padding=(1, 1)), p["bn2"])
    else:
        y = jax.nn.relu(_bn(L.conv2d(x, p["conv1"]["weight"]), p["bn1"]))
        y = jax.nn.relu(_bn(L.conv2d(y, p["conv2"]["weight"],
                                     stride=(stride, stride),
                                     padding=(1, 1)), p["bn2"]))
        y = _bn(L.conv2d(y, p["conv3"]["weight"]), p["bn3"])
    if "downsample" in p:
        idn = _bn(L.conv2d(x, p["downsample"]["conv"]["weight"],
                           stride=(stride, stride)), p["downsample"]["bn"])
    return jax.nn.relu(y + idn)


def _encoder(params, x, spec):
    x = L.conv2d(x, params["conv1"]["weight"], stride=(2, 2), padding=(3, 3))
    f1 = jax.nn.relu(_bn(x, params["bn1"]))
    feats = [f1]
    x = _maxpool_3x3s2(f1)
    for si, blocks in enumerate(params["layers"]):
        for bi, bp in enumerate(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _block_apply(bp, x, stride, spec["block"])
        feats.append(x)
    return feats


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def _decoder_block(p, x, skip):
    x = _upsample2(x)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=1)
    x = L.conv2d(x, p["conv1"]["conv"]["weight"], padding=(1, 1))
    x = jax.nn.relu(_bn(x, p["conv1"]["bn"]))
    x = L.conv2d(x, p["conv2"]["conv"]["weight"], padding=(1, 1))
    return jax.nn.relu(_bn(x, p["conv2"]["bn"]))


def apply(params, x, spec):
    """smp.Unet forward: NCHW (B, c, H, W) -> (B, c, H, W). H and W must be
    divisible by 32 (the encoder's total stride), as in smp."""
    feats = _encoder(params, x, spec)
    feats = feats[::-1]
    y = feats[0]
    skips = feats[1:] + [None]
    for p, skip in zip(params["decoder"], skips):
        y = _decoder_block(p, y, skip)
    return L.conv2d(y, params["seg_head"]["weight"],
                    params["seg_head"].get("bias"), padding=(1, 1))


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert(sd, take, prefix, spec):
    """Convert the ``unet_model.`` subtree (smp.Unet with a ResNetEncoder:
    torchvision keys under ``encoder.``, smp decoder under
    ``decoder.blocks.``, 3x3 head under ``segmentation_head.0``)."""
    enc = prefix + "encoder."

    def conv(pfx, bias=False):
        p = {"weight": take(pfx + ".weight")}
        if bias and (pfx + ".bias") in sd:
            p["bias"] = take(pfx + ".bias")
        return p

    def bn(pfx):
        p = {"weight": take(pfx + ".weight"), "bias": take(pfx + ".bias"),
             "running_mean": take(pfx + ".running_mean"),
             "running_var": take(pfx + ".running_var")}
        if (pfx + ".num_batches_tracked") in sd:
            take(pfx + ".num_batches_tracked")
        return p

    params = {"conv1": conv(enc + "conv1"), "bn1": bn(enc + "bn1")}
    stages = []
    for si, depth in enumerate(spec["layers"]):
        blocks = []
        for bi in range(depth):
            b = f"{enc}layer{si + 1}.{bi}"
            p = {"conv1": conv(b + ".conv1"), "bn1": bn(b + ".bn1"),
                 "conv2": conv(b + ".conv2"), "bn2": bn(b + ".bn2")}
            if spec["block"] == "bottleneck":
                p["conv3"] = conv(b + ".conv3")
                p["bn3"] = bn(b + ".bn3")
            if f"{b}.downsample.0.weight" in sd:
                p["downsample"] = {"conv": conv(b + ".downsample.0"),
                                   "bn": bn(b + ".downsample.1")}
            blocks.append(p)
        stages.append(blocks)
    params["layers"] = stages

    decoder = []
    for i in range(len(spec["decoder_channels"])):
        d = f"{prefix}decoder.blocks.{i}"
        decoder.append({"conv1": {"conv": conv(d + ".conv1.0"),
                                  "bn": bn(d + ".conv1.1")},
                        "conv2": {"conv": conv(d + ".conv2.0"),
                                  "bn": bn(d + ".conv2.1")}})
    params["decoder"] = decoder
    params["seg_head"] = conv(prefix + "segmentation_head.0", bias=True)
    return params
