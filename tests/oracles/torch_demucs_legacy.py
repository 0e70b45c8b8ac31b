"""Hand-written torch oracle for the legacy time-domain Demucs (v2 arch).

The reference dispatches ``model: demucs`` configs to ``demucs.demucs.Demucs``
from the external demucs v4 package (reference models/demucs4ht.py:696-713),
which is not installable offline. This module reconstructs that class —
module tree, parameter names and forward semantics — from knowledge of the
package source (demucs/demucs.py @ v4):

  * conv encoder: Conv1d(k=8, s=4) + GELU [+ DConv] [+ 1x1 rewrite + GLU],
    GroupNorm(4) from layer ``norm_starts`` on (Identity below, keeping
    Sequential indices stable);
  * DConv residual branch with dilated convs, GroupNorm(1), GLU and
    LayerScale; layers >= dconv_attn get a LocalState attention insert and
    layers >= dconv_lstm a skip-BLSTM(max_steps=200) insert (both at index
    3, lstm ending up before attn);
  * optional model-level 2-layer BLSTM + linear;
  * decoder: [3-wide context rewrite + GLU] [+] ConvTranspose1d(k=8, s=4),
    GELU except the last layer, built with ``insert(0, ...)`` so
    ``decoder.0`` is the deepest;
  * julius-style sinc resample_frac x2 up / x2 down around the U-Net,
    mono-std input normalization (unbiased std), valid_length padding and
    center trimming.

``rescale_module`` (init-time weight rescaling) affects initialization
only, not checkpoint loading, and is omitted. The JAX port
(sesa_tpu/models/demucs_legacy.py) converts strictly and fails loudly on
any key drift.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def unfold(a, kernel_size, stride):
    """demucs.utils.unfold: frame with end-padding to cover the signal."""
    *shape, length = a.shape
    n_frames = math.ceil(length / stride)
    tgt_length = (n_frames - 1) * stride + kernel_size
    a = F.pad(a, (0, tgt_length - length))
    strides = list(a.stride())
    out = a.as_strided([*shape, n_frames, kernel_size],
                       strides[:-1] + [stride, 1])
    return out


def center_trim(tensor, reference):
    ref_size = reference.shape[-1] if torch.is_tensor(reference) else reference
    delta = tensor.shape[-1] - ref_size
    return tensor[..., delta // 2: tensor.shape[-1] - (delta - delta // 2)]


def resample_kernel(old_sr, new_sr, zeros=24, rolloff=0.945):
    """julius ResampleFrac kernel bank: (new_sr, 1, taps) + width."""
    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = torch.arange(-width, width + old_sr, dtype=torch.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = t.clamp_(-zeros, zeros) * math.pi
        window = torch.cos(t / zeros / 2) ** 2
        kernel = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                             torch.sin(t) / t) * window
        kernel = kernel / kernel.sum()  # julius: preserve constant signals
        kernels.append(kernel)
    kernel = torch.stack(kernels).view(new_sr, 1, -1).float()
    return kernel, width


def resample_frac(x, old_sr, new_sr):
    """julius.resample_frac for integer ratios (1<->2 used by Demucs)."""
    if old_sr == new_sr:
        return x
    *shape, length = x.shape
    kernel, width = resample_kernel(old_sr, new_sr)
    x = x.reshape(-1, 1, length)
    y = F.conv1d(F.pad(x, (width, width + old_sr), mode="replicate"),
                 kernel, stride=old_sr)
    y = y.transpose(1, 2).reshape(list(shape) + [-1])
    return y[..., : int(new_sr * length / old_sr)]


class BLSTM(nn.Module):
    def __init__(self, dim, layers=1, max_steps=None, skip=False):
        super().__init__()
        assert max_steps is None or max_steps % 4 == 0
        self.max_steps = max_steps
        self.lstm = nn.LSTM(bidirectional=True, num_layers=layers,
                            hidden_size=dim, input_size=dim)
        self.linear = nn.Linear(2 * dim, dim)
        self.skip = skip

    def forward(self, x):
        B, C, T = x.shape
        y = x
        framed = False
        width = stride = nframes = 0
        if self.max_steps is not None and T > self.max_steps:
            width = self.max_steps
            stride = width // 2
            frames = unfold(x, width, stride)
            nframes = frames.shape[2]
            framed = True
            x = frames.permute(0, 2, 1, 3).reshape(-1, C, width)
        x = x.permute(2, 0, 1)
        x = self.lstm(x)[0]
        x = self.linear(x)
        x = x.permute(1, 2, 0)
        if framed:
            out = []
            frames = x.reshape(B, -1, C, width)
            limit = stride // 2
            for k in range(nframes):
                if k == 0:
                    out.append(frames[:, k, :, :-limit])
                elif k == nframes - 1:
                    out.append(frames[:, k, :, limit:])
                else:
                    out.append(frames[:, k, :, limit:-limit])
            out = torch.cat(out, -1)
            x = out[..., :T]
        if self.skip:
            x = x + y
        return x


class LayerScale(nn.Module):
    def __init__(self, channels, init=0):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), init, dtype=torch.float32))

    def forward(self, x):
        return self.scale[:, None] * x


class LocalState(nn.Module):
    """Local attention with learnt decays (demucs/demucs.py LocalState)."""

    def __init__(self, channels, heads=4, nfreqs=0, ndecay=4):
        super().__init__()
        assert channels % heads == 0
        self.heads = heads
        self.nfreqs = nfreqs
        self.ndecay = ndecay
        self.content = nn.Conv1d(channels, channels, 1)
        self.query = nn.Conv1d(channels, channels, 1)
        self.key = nn.Conv1d(channels, channels, 1)
        if ndecay:
            self.query_decay = nn.Conv1d(channels, heads * ndecay, 1)
            self.query_decay.weight.data *= 0.01
            self.query_decay.bias.data[:] = -2
        self.proj = nn.Conv1d(channels + heads * nfreqs, channels, 1)

    def forward(self, x):
        B, C, T = x.shape
        heads = self.heads
        indexes = torch.arange(T, device=x.device, dtype=x.dtype)
        delta = indexes[:, None] - indexes[None, :]
        queries = self.query(x).view(B, heads, -1, T)
        keys = self.key(x).view(B, heads, -1, T)
        dots = torch.einsum("bhct,bhcs->bhts", keys, queries)
        dots /= keys.shape[2] ** 0.5
        if self.ndecay:
            decays = torch.arange(1, self.ndecay + 1, device=x.device,
                                  dtype=x.dtype)
            decay_q = self.query_decay(x).view(B, heads, -1, T)
            decay_q = torch.sigmoid(decay_q) / 2
            decay_kernel = -decays.view(-1, 1, 1) * delta.abs() / self.ndecay ** 0.5
            dots += torch.einsum("fts,bhfs->bhts", decay_kernel, decay_q)
        dots.masked_fill_(torch.eye(T, device=dots.device, dtype=torch.bool), -100)
        weights = torch.softmax(dots, dim=2)
        content = self.content(x).view(B, heads, -1, T)
        result = torch.einsum("bhts,bhct->bhcs", weights, content)
        result = result.reshape(B, -1, T)
        return x + self.proj(result)


class DConv(nn.Module):
    def __init__(self, channels, compress=4, depth=2, init=1e-4, norm=True,
                 attn=False, heads=4, ndecay=4, lstm=False, kernel=3):
        super().__init__()
        norm_fn = (lambda d: nn.GroupNorm(1, d)) if norm else (lambda d: nn.Identity())
        hidden = int(channels / compress)
        self.layers = nn.ModuleList([])
        for d in range(depth):
            dilation = 2 ** d
            padding = dilation * (kernel // 2)
            mods = [
                nn.Conv1d(channels, hidden, kernel, dilation=dilation,
                          padding=padding),
                norm_fn(hidden), nn.GELU(),
                nn.Conv1d(hidden, 2 * channels, 1),
                norm_fn(2 * channels), nn.GLU(1),
                LayerScale(channels, init),
            ]
            if attn:
                mods.insert(3, LocalState(hidden, heads=heads, ndecay=ndecay))
            if lstm:
                mods.insert(3, BLSTM(hidden, layers=2, max_steps=200, skip=True))
            self.layers.append(nn.Sequential(*mods))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class Demucs(nn.Module):
    def __init__(self, sources, audio_channels=2, channels=64, growth=2.0,
                 depth=6, rewrite=True, lstm_layers=0, kernel_size=8, stride=4,
                 context=1, gelu=True, glu=True, norm_starts=4, norm_groups=4,
                 dconv_mode=1, dconv_depth=2, dconv_comp=4, dconv_attn=4,
                 dconv_lstm=4, dconv_init=1e-4, normalize=True, resample=True,
                 samplerate=44100, segment=40):
        super().__init__()
        self.sources = sources
        self.audio_channels = audio_channels
        self.depth = depth
        self.kernel_size = kernel_size
        self.stride = stride
        self.resample = resample
        self.normalize = normalize
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()

        if glu:
            activation = nn.GLU(dim=1)
            ch_scale = 2
        else:
            activation = nn.ReLU()
            ch_scale = 1
        act2 = nn.GELU if gelu else nn.ReLU

        in_channels = audio_channels
        for index in range(depth):
            norm_fn = (lambda d: nn.Identity())
            if index >= norm_starts:
                norm_fn = (lambda d: nn.GroupNorm(norm_groups, d))
            encode = [nn.Conv1d(in_channels, channels, kernel_size, stride),
                      norm_fn(channels), act2()]
            attn = index >= dconv_attn
            lstm = index >= dconv_lstm
            if dconv_mode & 1:
                encode += [DConv(channels, depth=dconv_depth, init=dconv_init,
                                 compress=dconv_comp, attn=attn, lstm=lstm)]
            if rewrite:
                encode += [nn.Conv1d(channels, ch_scale * channels, 1),
                           norm_fn(ch_scale * channels), activation]
            self.encoder.append(nn.Sequential(*encode))

            out_channels = in_channels if index > 0 else len(sources) * audio_channels
            decode = []
            if rewrite:
                decode += [nn.Conv1d(channels, ch_scale * channels,
                                     2 * context + 1, padding=context),
                           norm_fn(ch_scale * channels), activation]
            if dconv_mode & 2:
                decode += [DConv(channels, depth=dconv_depth, init=dconv_init,
                                 compress=dconv_comp, attn=attn, lstm=lstm)]
            decode += [nn.ConvTranspose1d(channels, out_channels,
                                          kernel_size, stride)]
            if index > 0:
                decode += [norm_fn(out_channels), act2()]
            self.decoder.insert(0, nn.Sequential(*decode))
            in_channels = channels
            channels = int(growth * channels)

        channels = in_channels
        self.lstm = BLSTM(channels, lstm_layers) if lstm_layers else None

    def valid_length(self, length):
        if self.resample:
            length *= 2
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel_size) / self.stride) + 1
            length = max(1, length)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        if self.resample:
            length = math.ceil(length / 2)
        return int(length)

    def forward(self, mix):
        x = mix
        length = x.shape[-1]
        if self.normalize:
            mono = mix.mean(dim=1, keepdim=True)
            mean = mono.mean(dim=-1, keepdim=True)
            std = mono.std(dim=-1, keepdim=True)
            x = (x - mean) / (1e-5 + std)
        else:
            mean, std = 0, 1
        delta = self.valid_length(length) - length
        x = F.pad(x, (delta // 2, delta - delta // 2))
        if self.resample:
            x = resample_frac(x, 1, 2)
        saved = []
        for encode in self.encoder:
            x = encode(x)
            saved.append(x)
        if self.lstm:
            x = self.lstm(x)
        for decode in self.decoder:
            skip = center_trim(saved.pop(-1), x)
            x = decode(x + skip)
        if self.resample:
            x = resample_frac(x, 2, 1)
        x = x * std + mean
        x = center_trim(x, length)
        return x.view(x.size(0), len(self.sources), self.audio_channels,
                      x.size(-1))
