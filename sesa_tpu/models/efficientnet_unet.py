"""EfficientNet-encoder smp.Unet for segm_models / torchseg checkpoints.

The reference builds its segmentation U-Nets with arbitrary
`segmentation_models_pytorch` encoders (reference models/segm_models.py:
64-110, ``smp.Unet(encoder_name=...)``); after ResNet, the
efficientnet-b0..b7 zoo is the most common community choice. smp's
EfficientNetEncoder derives from the lukemelas ``efficientnet-pytorch``
package, which is unavailable offline — so, as with the conformer family,
this reconstructs its architecture and exact state-dict key layout
(frozen as a committed fixture, tests/fixtures/layouts/
efficientnet_unet.json; drift fails loudly) while the MBConv NUMERICS are
parity-tested against the REAL torch implementation in ``transformers``
(models/efficientnet), which shares the conventions: TF-SAME padding
(asymmetric (0,1)/(1,2) pads on stride-2 convs), swish, SE squeeze ratio
0.25 of the block's PRE-expansion channels, BatchNorm eps 1e-3.

Layout basis (lukemelas EfficientNet as wrapped by smp's
EfficientNetEncoder, which deletes only ``_fc``):

    encoder._conv_stem.weight                encoder._bn0.{...}
    encoder._blocks.{i}._expand_conv.weight  ._bn0   (expand_ratio != 1)
    encoder._blocks.{i}._depthwise_conv.weight  ._bn1
    encoder._blocks.{i}._se_reduce / ._se_expand   (1x1 convs WITH bias)
    encoder._blocks.{i}._project_conv.weight    ._bn2
    encoder._conv_head.weight  encoder._bn1.{...}   (unused by smp.Unet's
        forward; consumed when present so conversion stays loud-failure)

Feature pyramid matches smp: [input, stem (1/2), blocks split at the
last block before each stride-2 transition (1/4, 1/8, 1/16), final block
output (1/32)] — lukemelas ``extract_endpoints`` semantics, reproducing
smp's hardcoded stage_idxs (e.g. efficientnet-b1: (5, 8, 16, 23)). The
decoder/segmentation head are the same smp UnetDecoder geometry the
ResNet/MaxViT encoders use (models/resnet_unet.py).

TPU notes: everything is 1x1/depthwise convs + BN folds — XLA fuses the
BN scale/shift and swish into the convolutions; spatial dims must be
divisible by 32 (smp's own requirement), which also makes the static
TF-SAME pads exact at every stride-2 site.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sesa_tpu.models import layers as L
from sesa_tpu.models.resnet_unet import _decoder_block

_BN_EPS = 1e-3  # lukemelas/keras EfficientNet convention (decoder BNs: 1e-5)

# (width_coefficient, depth_coefficient) per model — EfficientNet paper
# table; smp exposes exactly these eight.
EFFICIENTNET_COEFFS = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}

# base (B0) stage table: repeats, kernel, stride, expand_ratio, cin, cout
_BASE_STAGES = (
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
)

_DEFAULT_DECODER = (256, 128, 64, 32, 16)


def _round_filters(f, width):
    """lukemelas round_filters: divisor-8 rounding, never below 90%."""
    f *= width
    new = max(8, (int(f) + 4) // 8 * 8)
    if new < 0.9 * f:
        new += 8
    return int(new)


def _round_repeats(r, depth):
    return int(math.ceil(depth * r))


def is_efficientnet(config) -> bool:
    return str(config.model.get("encoder_name", "")) in EFFICIENTNET_COEFFS


def spec_from_config(config):
    name = str(config.model.encoder_name)
    w, d = EFFICIENTNET_COEFFS[name]
    # tiny-test override: config.model.efficientnet = {width: .., depth: ..}
    over = dict(config.model.get("efficientnet", {}) or {})
    w = float(over.get("width", w))
    d = float(over.get("depth", d))

    blocks = []
    cin = _round_filters(32, w)
    stem = cin
    for (r, k, s, e, _, bo) in _BASE_STAGES:
        cout = _round_filters(bo, w)
        for j in range(_round_repeats(r, d)):
            ci = cin if j == 0 else cout
            blocks.append(dict(k=k, s=s if j == 0 else 1, e=e, cin=ci,
                               cout=cout, se=max(1, int(ci * 0.25))))
        cin = cout
    # features split at the last block before each stride-2 transition
    # beyond the first (which begins the 1/4 level); final split = end
    s2 = [i for i, b in enumerate(blocks) if b["s"] == 2]
    splits = s2[1:] + [len(blocks)]
    assert len(splits) == 4, f"unexpected stride layout: {s2}"

    dec = dict(config.get("decoder_unet", {}) or {})
    return dict(
        stem=stem, blocks=blocks, splits=tuple(splits),
        head=_round_filters(1280, w),
        decoder_channels=tuple(
            int(v) for v in dec.get("decoder_channels", _DEFAULT_DECODER)),
    )


def _feat_channels(spec):
    """[stem (1/2), 1/4, 1/8, 1/16, 1/32] channel counts."""
    return [spec["stem"]] + [spec["blocks"][i - 1]["cout"]
                             for i in spec["splits"]]


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, in_channels, spec):
    keys = iter(jax.random.split(rng, 4096))

    def conv(ci, co, k):
        return {"weight": L.kaiming_uniform(next(keys), (co, ci, k, k),
                                            ci * k * k)}

    def bn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

    params = {"stem": {"conv": conv(in_channels, spec["stem"], 3),
                       "bn": bn(spec["stem"])}}
    blocks = []
    for b in spec["blocks"]:
        exp = b["cin"] * b["e"]
        p = {}
        if b["e"] != 1:
            p["expand"] = conv(b["cin"], exp, 1)
            p["expand_bn"] = bn(exp)
        p["dw"] = {"weight": L.kaiming_uniform(
            next(keys), (exp, 1, b["k"], b["k"]), b["k"] * b["k"])}
        p["dw_bn"] = bn(exp)
        p["se_reduce"] = conv(exp, b["se"], 1)
        p["se_reduce"]["bias"] = jnp.zeros((b["se"],))
        p["se_expand"] = conv(b["se"], exp, 1)
        p["se_expand"]["bias"] = jnp.zeros((exp,))
        p["project"] = conv(exp, b["cout"], 1)
        p["project_bn"] = bn(b["cout"])
        blocks.append(p)
    params["blocks"] = blocks
    last = spec["blocks"][-1]["cout"]
    params["head"] = {"conv": conv(last, spec["head"], 1),
                      "bn": bn(spec["head"])}

    feat = _feat_channels(spec)
    skips = feat[-2::-1] + [0]  # deepest-first, last decoder block skip-less
    decoder = []
    cc = feat[-1]
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

def _same_conv(x, weight, k, stride, groups=1):
    """TF-SAME conv for even spatial dims: stride 1 pads k//2 both sides;
    stride 2 pads (total k-2) split low-first — (0,1) for k=3, (1,2) for
    k=5 — matching lukemelas Conv2dStaticSamePadding and the keras/
    transformers ZeroPad2d((0,1,0,1)) stem convention."""
    if stride == 1:
        return L.conv2d(x, weight, padding=(k // 2, k // 2), groups=groups)
    lo, hi = (k - 2) // 2, (k - 2) - (k - 2) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (lo, hi), (lo, hi)))
    return L.conv2d(x, weight, stride=(stride, stride), groups=groups)


def _bn(x, p):
    return L.batch_norm2d(x, p, eps=_BN_EPS)


def _mbconv(p, x, b):
    inp = x
    if b["e"] != 1:
        x = jax.nn.silu(_bn(L.conv2d(x, p["expand"]["weight"]),
                            p["expand_bn"]))
    exp = b["cin"] * b["e"]
    x = _same_conv(x, p["dw"]["weight"], b["k"], b["s"], groups=exp)
    x = jax.nn.silu(_bn(x, p["dw_bn"]))
    se = jnp.mean(x, axis=(2, 3), keepdims=True)
    se = jax.nn.silu(L.conv2d(se, p["se_reduce"]["weight"],
                              p["se_reduce"]["bias"]))
    se = jax.nn.sigmoid(L.conv2d(se, p["se_expand"]["weight"],
                                 p["se_expand"]["bias"]))
    x = x * se
    x = _bn(L.conv2d(x, p["project"]["weight"]), p["project_bn"])
    if b["s"] == 1 and b["cin"] == b["cout"]:
        x = x + inp
    return x


def _encoder(params, x, spec):
    x = _same_conv(x, params["stem"]["conv"]["weight"], 3, 2)
    x = jax.nn.silu(_bn(x, params["stem"]["bn"]))
    feats = [x]
    start = 0
    for end in spec["splits"]:
        for i in range(start, end):
            x = _mbconv(params["blocks"][i], x, spec["blocks"][i])
        feats.append(x)
        start = end
    return feats


def apply(params, x, spec):
    """smp.Unet forward: NCHW (B, c, H, W) -> (B, c, H, W); H, W divisible
    by 32 (the encoder's total stride), as in smp."""
    feats = _encoder(params, x, spec)[::-1]
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
    """Convert the ``unet_model.`` subtree (smp.Unet with an
    EfficientNetEncoder in the lukemelas key layout documented above)."""
    enc = prefix + "encoder."

    def conv(pfx, bias=False):
        p = {"weight": take(pfx + ".weight")}
        if bias:
            p["bias"] = take(pfx + ".bias")
        return p

    def bn(pfx):
        p = {"weight": take(pfx + ".weight"), "bias": take(pfx + ".bias"),
             "running_mean": take(pfx + ".running_mean"),
             "running_var": take(pfx + ".running_var")}
        if (pfx + ".num_batches_tracked") in sd:
            take(pfx + ".num_batches_tracked")
        return p

    params = {"stem": {"conv": conv(enc + "_conv_stem"),
                       "bn": bn(enc + "_bn0")}}
    blocks = []
    for i, blk in enumerate(spec["blocks"]):
        b = f"{enc}_blocks.{i}"
        p = {}
        if blk["e"] != 1:
            p["expand"] = conv(b + "._expand_conv")
            p["expand_bn"] = bn(b + "._bn0")
        p["dw"] = conv(b + "._depthwise_conv")
        p["dw_bn"] = bn(b + "._bn1")
        p["se_reduce"] = conv(b + "._se_reduce", bias=True)
        p["se_expand"] = conv(b + "._se_expand", bias=True)
        p["project"] = conv(b + "._project_conv")
        p["project_bn"] = bn(b + "._bn2")
        blocks.append(p)
    params["blocks"] = blocks
    # smp's EfficientNetEncoder deletes only _fc; the unused imagenet head
    # stays in checkpoints — consume it (loud-failure contract) when there
    if enc + "_conv_head.weight" in sd:
        params["head"] = {"conv": conv(enc + "_conv_head"),
                          "bn": bn(enc + "_bn1")}

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
