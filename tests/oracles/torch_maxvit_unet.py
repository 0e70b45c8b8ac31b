"""Hand-written torch oracle for smp.Unet('tu-maxvit_*_tf_*') segm_models.

The reference builds its segmentation U-Nets with
``segmentation_models_pytorch`` (reference models/segm_models.py:64-110);
the VOCALS-VitLarge23 checkpoint uses ``encoder_name:
tu-maxvit_large_tf_512`` — timm's TF-ported MaxViT-Large wrapped by smp's
``TimmUniversalEncoder``. Neither timm nor smp is installable offline, so
this module reconstructs the exact module/parameter layout from knowledge
of their sources:

  * timm ``maxxvit.py`` MaxxVit with the ``_tf_cfg`` preset: BatchNorm
    eps 1e-3, gelu(tanh) activations, TF asymmetric 'same' padding,
    ``head_first=False`` qkv packing, ``RelPosBiasTf`` relative position
    bias tables of shape (heads, 2H-1, 2W-1), stem bias=True, avg-pool
    downsample shortcuts with 1x1 expand;
  * ``features_only=True`` pruning (stem + stages survive) with
    ``flatten_sequential`` naming (``stages_0``, ``stages_1``, ...);
  * smp ``TimmUniversalEncoder`` ('encoder.model.' prefix, features =
    [identity, stem/2, s4, s8, s16, s32]);
  * smp ``UnetDecoder`` (nearest x2 upsample, Conv2dReLU = conv/BN/ReLU
    at Sequential indices 0/1) + ``SegmentationHead`` (3x3 conv);
  * the reference ``Segm_Models_Net`` shell around it
    (first_conv / unet_model / final_conv, segm_models.py:190-255).

Where the upstream detail is uncertain the choice is documented inline and
the JAX converter (sesa_tpu/models/maxvit_unet.py) is tolerant (optional
conv biases) or fails loudly (any unconsumed/missing key), so a real
checkpoint can never load silently wrong.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _pad_same(x, k, s):
    """TF 'same' padding (asymmetric: extra on the right/bottom)."""
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    if ph or pw:
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return x


class Conv2dSame(nn.Conv2d):
    def __init__(self, cin, cout, k, stride=1, groups=1, bias=True):
        super().__init__(cin, cout, k, stride=stride, padding=0,
                         groups=groups, bias=bias)
        self._k, self._s = k, stride

    def forward(self, x):
        return super().forward(_pad_same(x, self._k, self._s))


def _gelu_tanh(x):
    return F.gelu(x, approximate="tanh")


class BatchNormAct2d(nn.BatchNorm2d):
    """timm BatchNormAct2d: BN then activation, same param keys as BN."""

    def __init__(self, ch, eps, apply_act=True):
        super().__init__(ch, eps=eps)
        self.apply_act = apply_act

    def forward(self, x):
        x = super().forward(x)
        if self.apply_act:
            x = _gelu_tanh(x)
        return x


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite with silu gate act (cfg.attn_act_layer='silu')."""

    def __init__(self, channels, rd_channels):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class Downsample2d(nn.Module):
    """avg-pool 2x2 + optional 1x1 channel expand (timm Downsample2d)."""

    def __init__(self, dim, dim_out):
        super().__init__()
        self.expand = (nn.Conv2d(dim, dim_out, 1, bias=True)
                       if dim != dim_out else nn.Identity())

    def forward(self, x):
        return self.expand(F.avg_pool2d(x, 2, 2))


class MbConvBlock(nn.Module):
    """timm MbConvBlock, stride_mode='dw', expand_ratio 4.

    SE reduction channels = in_chs // 4 (the official TF MaxViT rule,
    se_filters = in_filters * se_ratio, which timm mirrors to load the
    ported weights). conv1/conv2 carry no bias (BN follows).
    """

    def __init__(self, cin, cout, stride, bn_eps=1e-3):
        super().__init__()
        mid = cout * 4
        self.shortcut = Downsample2d(cin, cout) if stride == 2 else nn.Identity()
        self.pre_norm = BatchNormAct2d(cin, bn_eps, apply_act=False)
        self.conv1_1x1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.norm1 = BatchNormAct2d(mid, bn_eps)
        self.conv2_kxk = Conv2dSame(mid, mid, 3, stride=stride, groups=mid, bias=False)
        self.norm2 = BatchNormAct2d(mid, bn_eps)
        self.se = SqueezeExcite(mid, max(1, cin // 4))
        self.conv3_1x1 = nn.Conv2d(mid, cout, 1, bias=True)

    def forward(self, x):
        shortcut = self.shortcut(x)
        x = self.pre_norm(x)
        x = self.conv1_1x1(x)
        x = self.norm1(x)
        x = self.conv2_kxk(x)
        x = self.norm2(x)
        x = self.se(x)
        x = self.conv3_1x1(x)
        return x + shortcut


class RelPosBiasTf(nn.Module):
    """TF-style relative position bias: table (heads, 2H-1, 2W-1)."""

    def __init__(self, window, num_heads):
        super().__init__()
        self.window = window
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_heads, 2 * window - 1, 2 * window - 1))

    def get_bias(self):
        w = self.window
        coords = torch.arange(w)
        rel = coords[:, None] - coords[None, :] + w - 1  # (w, w)
        # bias[h, (i,j), (x,y)] = table[h, i-x+w-1, j-y+w-1]
        t = self.relative_position_bias_table[:, rel][:, :, :, rel]
        # t: (heads, i, x, j, y) -> (heads, i, j, x, y)
        t = t.permute(0, 1, 3, 2, 4).reshape(-1, w * w, w * w)
        return t.unsqueeze(0)


class AttentionCl(nn.Module):
    """timm AttentionCl with head_first=False (TF qkv packing)."""

    def __init__(self, dim, dim_head, window):
        super().__init__()
        self.num_heads = dim // dim_head
        self.dim_head = dim_head
        self.scale = dim_head ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.rel_pos = RelPosBiasTf(window, self.num_heads)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        restore = x.shape[:-1]
        b = x.shape[0]
        qkv = self.qkv(x).reshape(b, -1, 3, self.num_heads, self.dim_head)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)  # (b, h, n, d)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn + self.rel_pos.get_bias()
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(*restore, -1)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(_gelu_tanh(self.fc1(x)))


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(x, ws, h, w):
    c = x.shape[-1]
    x = x.view(-1, h // ws, w // ws, ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def grid_partition(x, gs):
    b, h, w, c = x.shape
    x = x.view(b, gs, h // gs, gs, w // gs, c)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(-1, gs, gs, c)


def grid_reverse(x, gs, h, w):
    c = x.shape[-1]
    x = x.view(-1, h // gs, w // gs, gs, gs, c)
    return x.permute(0, 3, 1, 4, 2, 5).reshape(-1, h, w, c)


class PartitionAttentionCl(nn.Module):
    """LN -> partitioned attention -> +res; LN -> MLP -> +res (NHWC)."""

    def __init__(self, dim, dim_head, partition, block_type, ln_eps=1e-5):
        super().__init__()
        self.partition = partition
        self.block = block_type == "block"
        self.norm1 = nn.LayerNorm(dim, eps=ln_eps)
        self.attn = AttentionCl(dim, dim_head, partition)
        self.norm2 = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = Mlp(dim, dim * 4)

    def _part_attn(self, x):
        h, w = x.shape[1:3]
        p = self.partition
        parts = window_partition(x, p) if self.block else grid_partition(x, p)
        parts = self.attn(parts.reshape(parts.shape[0], -1, parts.shape[-1]))
        parts = parts.reshape(-1, p, p, parts.shape[-1])
        return (window_reverse(parts, p, h, w) if self.block
                else grid_reverse(parts, p, h, w))

    def forward(self, x):
        x = x + self._part_attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class MaxxVitBlock(nn.Module):
    def __init__(self, cin, cout, stride, dim_head, partition):
        super().__init__()
        self.conv = MbConvBlock(cin, cout, stride)
        self.attn_block = PartitionAttentionCl(cout, dim_head, partition, "block")
        self.attn_grid = PartitionAttentionCl(cout, dim_head, partition, "grid")

    def forward(self, x):
        x = self.conv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.attn_block(x)
        x = self.attn_grid(x)
        return x.permute(0, 3, 1, 2)


class MaxxVitStage(nn.Module):
    def __init__(self, cin, cout, depth, dim_head, partition):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(MaxxVitBlock(cin if i == 0 else cout, cout,
                                       2 if i == 0 else 1, dim_head, partition))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class Stem(nn.Module):
    def __init__(self, cin, width, bn_eps=1e-3):
        super().__init__()
        self.conv1 = Conv2dSame(cin, width, 3, stride=2, bias=True)
        self.norm1 = BatchNormAct2d(width, bn_eps)
        self.conv2 = Conv2dSame(width, width, 3, stride=1, bias=True)

    def forward(self, x):
        return self.conv2(self.norm1(self.conv1(x)))


class MaxVitFeatures(nn.Module):
    """timm MaxxVit under features_only: stem + stages, flattened naming."""

    def __init__(self, in_chans, dims, depths, stem_width, dim_head, partition):
        super().__init__()
        self.stem = Stem(in_chans, stem_width)
        cin = stem_width
        for i, (d, dep) in enumerate(zip(dims, depths)):
            self.add_module(f"stages_{i}", MaxxVitStage(cin, d, dep, dim_head, partition))
            cin = d
        self.n_stages = len(dims)

    def forward(self, x):
        feats = []
        x = self.stem(x)
        feats.append(x)
        for i in range(self.n_stages):
            x = getattr(self, f"stages_{i}")(x)
            feats.append(x)
        return feats


class Conv2dReLU(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class DecoderBlock(nn.Module):
    def __init__(self, cin, skip, cout):
        super().__init__()
        self.conv1 = Conv2dReLU(cin + skip, cout)
        self.conv2 = Conv2dReLU(cout, cout)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class UnetDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]  # drop identity, reverse
        cin = [enc[0]] + list(decoder_channels[:-1])
        skips = enc[1:] + [0]
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, s, o) for i, s, o in zip(cin, skips, decoder_channels)])

    def forward(self, features):
        feats = features[1:][::-1]
        x = feats[0]
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class SmpUnet(nn.Module):
    """smp.Unet('tu-maxvit_*', in_channels=c, classes=c) layout."""

    def __init__(self, in_channels, classes, dims, depths, stem_width,
                 dim_head, partition, decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()

        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.model = MaxVitFeatures(in_channels, dims, depths,
                                            stem_width, dim_head, partition)

            def forward(self, x):
                return [x] + self.model(x)

        self.encoder = _Enc()
        enc_channels = [in_channels, stem_width] + list(dims)
        self.decoder = UnetDecoder(enc_channels, decoder_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(decoder_channels[-1], classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(self.encoder(x)))


class SegmModelsNet(nn.Module):
    """Reference Segm_Models_Net shell (segm_models.py:190-255) minus STFT:
    operates on the CaC-subband image (B, dim_c, f//k, t); the sesa_tpu
    shell handles the spectral transform, so parity is tested on the image
    path (the STFT is covered by mdx23c's oracle, which shares it)."""

    def __init__(self, dim_c, c, num_stems, dims, depths, stem_width,
                 dim_head, partition, act="gelu",
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        self.first_conv = nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)
        self.unet_model = SmpUnet(c, c, dims, depths, stem_width, dim_head,
                                  partition, decoder_channels)
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
