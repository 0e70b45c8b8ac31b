"""Hand-written torch oracle for the EfficientNet-encoder smp.Unet.

`efficientnet-pytorch` (lukemelas) and `segmentation_models_pytorch` are
unavailable offline; this reconstructs the lukemelas EfficientNet in its
exact state-dict layout (_conv_stem/_bn0, _blocks.{i}._expand_conv/_bn0/
_depthwise_conv/_bn1/_se_reduce/_se_expand/_project_conv/_bn2,
_conv_head/_bn1) wrapped the way smp's EfficientNetEncoder + smp.Unet lay
out keys. TF-SAME padding is implemented statically for even spatial dims
(the only case smp.Unet admits — dims must divide by 32), matching both
lukemelas Conv2dStaticSamePadding and the transformers EfficientNet port
(whose REAL implementation independently cross-checks the MBConv
numerics in tests/test_efficientnet_unet.py).

The smp decoder / segmentation head / reference shell are shared with
the MaxViT oracle (tests/oracles/torch_maxvit_unet.py).
"""

import torch
import torch.nn as nn

from tests.oracles.torch_maxvit_unet import UnetDecoder

BN_EPS = 1e-3


def same_conv(x, weight, stride, groups=1):
    """TF-SAME conv for even spatial dims (see module docstring)."""
    k = weight.shape[-1]
    if stride == 1:
        return nn.functional.conv2d(x, weight, padding=k // 2, groups=groups)
    lo, hi = (k - 2) // 2, (k - 2) - (k - 2) // 2
    x = nn.functional.pad(x, (lo, hi, lo, hi))
    return nn.functional.conv2d(x, weight, stride=stride, groups=groups)


class MBConvBlock(nn.Module):
    """lukemelas MBConvBlock (eval mode: drop-connect is identity)."""

    def __init__(self, cin, cout, kernel, stride, expand, se_ch):
        super().__init__()
        self.stride, self.cin, self.cout, self.expand = stride, cin, cout, expand
        exp = cin * expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(cin, exp, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(exp, eps=BN_EPS)
        self._depthwise_conv = nn.Conv2d(exp, exp, kernel, stride,
                                         groups=exp, bias=False)
        self._bn1 = nn.BatchNorm2d(exp, eps=BN_EPS)
        self._se_reduce = nn.Conv2d(exp, se_ch, 1)
        self._se_expand = nn.Conv2d(se_ch, exp, 1)
        self._bn2 = nn.BatchNorm2d(cout, eps=BN_EPS)
        self._project_conv = nn.Conv2d(exp, cout, 1, bias=False)
        self.swish = nn.SiLU()

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = self.swish(self._bn0(self._expand_conv(x)))
        x = same_conv(x, self._depthwise_conv.weight, self.stride,
                      groups=self._depthwise_conv.groups)
        x = self.swish(self._bn1(x))
        se = x.mean(dim=(2, 3), keepdim=True)
        se = self._se_expand(self.swish(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.cin == self.cout:
            x = x + inp
        return x


class EfficientNetFeatures(nn.Module):
    """lukemelas EfficientNet trunk in smp's EfficientNetEncoder layout
    (only _fc deleted; _conv_head/_bn1 kept but unused), emitting the
    smp feature pyramid [stem, 1/4, 1/8, 1/16, 1/32]."""

    def __init__(self, in_chans, spec):
        super().__init__()
        self.splits = spec["splits"]
        self._conv_stem = nn.Conv2d(in_chans, spec["stem"], 3, 2, bias=False)
        self._bn0 = nn.BatchNorm2d(spec["stem"], eps=BN_EPS)
        self._blocks = nn.ModuleList([
            MBConvBlock(b["cin"], b["cout"], b["k"], b["s"], b["e"], b["se"])
            for b in spec["blocks"]])
        last = spec["blocks"][-1]["cout"]
        self._conv_head = nn.Conv2d(last, spec["head"], 1, bias=False)
        self._bn1 = nn.BatchNorm2d(spec["head"], eps=BN_EPS)
        self.swish = nn.SiLU()

    def forward(self, x):
        x = self.swish(self._bn0(same_conv(x, self._conv_stem.weight, 2)))
        feats = [x]
        start = 0
        for end in self.splits:
            for i in range(start, end):
                x = self._blocks[i](x)
            feats.append(x)
            start = end
        return feats


class SmpEfficientNetUnet(nn.Module):
    """smp.Unet('efficientnet-bN', in_channels=c, classes=c) key layout."""

    def __init__(self, in_channels, classes, spec):
        super().__init__()
        self.encoder = EfficientNetFeatures(in_channels, spec)
        feat = [spec["stem"]] + [spec["blocks"][i - 1]["cout"]
                                 for i in spec["splits"]]
        enc_channels = [in_channels] + feat
        self.decoder = UnetDecoder(enc_channels, spec["decoder_channels"])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(spec["decoder_channels"][-1], classes, 3, padding=1))

    def forward(self, x):
        feats = [x] + self.encoder(x)
        return self.segmentation_head(self.decoder(feats))


class SegmModelsEfficientNet(nn.Module):
    """Reference Segm_Models_Net shell (segm_models.py:190-255) minus
    STFT, with an EfficientNet-Unet core (same shell as the other
    oracles)."""

    def __init__(self, dim_c, c, num_stems, spec, act="gelu"):
        super().__init__()
        self.first_conv = nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)
        self.unet_model = SmpEfficientNetUnet(c, c, spec)
        act_m = nn.GELU() if act == "gelu" else nn.ReLU()
        self.final_conv = nn.Sequential(
            nn.Conv2d(c + dim_c, c, 1, 1, 0, bias=False), act_m,
            nn.Conv2d(c, num_stems * dim_c, 1, 1, 0, bias=False))

    def forward(self, x):
        mix = x
        first = x = self.first_conv(x)
        x = x.transpose(-1, -2)
        x = self.unet_model(x)
        x = x.transpose(-1, -2)
        x = x * first
        return self.final_conv(torch.cat([mix, x], 1))
