"""Hand-written torch oracle for the ResNet-encoder smp.Unet.

torchvision is unavailable offline; this reconstructs torchvision's
ResNet (conv1 7x7/2 + BN + ReLU + MaxPool 3x3/2, BasicBlock/Bottleneck
stages) in its exact state-dict layout, wrapped the way
segmentation_models_pytorch's ResNetEncoder + smp.Unet lay out keys
(``encoder.conv1...`` directly — no ``.model`` nesting, unlike timm
universal encoders). The smp decoder / segmentation head / shell are
shared with the MaxViT oracle (tests/oracles/torch_maxvit_unet.py).
"""

import torch
import torch.nn as nn

from tests.oracles.torch_maxvit_unet import UnetDecoder


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, cmid, stride):
        super().__init__()
        cout = cmid * self.expansion
        self.conv1 = nn.Conv2d(cin, cmid, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cmid, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, cmid, stride):
        super().__init__()
        cout = cmid * self.expansion
        self.conv1 = nn.Conv2d(cin, cmid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class ResNetFeatures(nn.Module):
    """torchvision ResNet trunk in its native key layout, emitting the smp
    feature pyramid [relu1, layer1, layer2, layer3, layer4]."""

    def __init__(self, in_chans, base, layers, block):
        super().__init__()
        blk = BasicBlock if block == "basic" else Bottleneck
        self.conv1 = nn.Conv2d(in_chans, base, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(base)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = base
        for si, (cmid, depth) in enumerate(
                zip([base, 2 * base, 4 * base, 8 * base], layers)):
            blocks = []
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(blk(cin, cmid, stride))
                cin = cmid * blk.expansion
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        f1 = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(f1)
        feats = [f1]
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats


class SmpResNetUnet(nn.Module):
    """smp.Unet('resnetNN', in_channels=c, classes=c) key layout."""

    def __init__(self, in_channels, classes, base, layers, block,
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        self.encoder = ResNetFeatures(in_channels, base, layers, block)
        exp = 1 if block == "basic" else 4
        enc_channels = [in_channels, base] + [c * exp for c in
                                              (base, 2 * base, 4 * base,
                                               8 * base)]
        self.decoder = UnetDecoder(enc_channels, decoder_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(decoder_channels[-1], classes, 3, padding=1))

    def forward(self, x):
        feats = [x] + self.encoder(x)
        return self.segmentation_head(self.decoder(feats))


class SegmModelsResNet(nn.Module):
    """Reference Segm_Models_Net shell (segm_models.py:190-255) minus STFT,
    with a ResNet-Unet core (same shell as the MaxViT oracle)."""

    def __init__(self, dim_c, c, num_stems, base, layers, block, act="gelu",
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        self.first_conv = nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)
        self.unet_model = SmpResNetUnet(c, c, base, layers, block,
                                        decoder_channels)
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
