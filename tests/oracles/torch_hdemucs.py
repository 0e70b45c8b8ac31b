"""Hand-written torch oracle for HDemucs (the v3 hybrid, demucs-package).

The reference dispatches ``model: hdemucs`` to ``demucs.hdemucs.HDemucs``
(reference models/demucs4ht.py:696-713); the package is unavailable
offline. This reconstructs the class from knowledge of demucs/hdemucs.py:
HEncLayer/HDecLayer (freq-axis convs with GroupNorm/GLU rewrites and DConv
branches — the deep layers' DConv gains skip-BLSTM and LocalState inserts,
reused from tests/oracles/torch_demucs_legacy.py), ScaledEmbedding
frequency embedding, hybrid time branch merged by injection at the
frequency-collapse layer, zero-initialized decoder bottleneck ("signal
goes through the U-Net skips"), and CaC spectral output. MultiWrap
(multi_freqs) is omitted here — its geometry is pinned separately by the
identical-weights invariance test in tests/test_htdemucs.py.

``rescale_module`` is init-time only and omitted (checkpoint loading is
what parity covers).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles.torch_demucs_legacy import DConv


def spectro(x, n_fft, hop_length):
    *other, length = x.shape
    x = x.reshape(-1, length)
    z = torch.stft(x, n_fft, hop_length, window=torch.hann_window(n_fft).to(x),
                   win_length=n_fft, normalized=True, center=True,
                   return_complex=True, pad_mode="reflect")
    _, freqs, frame = z.shape
    return z.view(*other, freqs, frame)


def ispectro(z, hop_length, length=None):
    *other, freqs, frames = z.shape
    n_fft = 2 * freqs - 2
    z = z.view(-1, freqs, frames)
    x = torch.istft(z, n_fft, hop_length,
                    window=torch.hann_window(n_fft).to(z.real),
                    win_length=n_fft, normalized=True, length=length,
                    center=True)
    _, length = x.shape
    return x.view(*other, length)


class ScaledEmbedding(nn.Module):
    def __init__(self, num_embeddings, embedding_dim, scale=10.0, smooth=False):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, embedding_dim)
        if smooth:
            weight = torch.cumsum(self.embedding.weight.data, dim=0)
            weight = weight / torch.arange(
                1, num_embeddings + 1).to(weight).sqrt()[:, None]
            self.embedding.weight.data[:] = weight
        self.embedding.weight.data /= scale
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class HEncLayer(nn.Module):
    def __init__(self, chin, chout, kernel_size=8, stride=4, norm_groups=1,
                 empty=False, freq=True, dconv=True, norm=True, context=0,
                 dconv_kw=None, pad=True, rewrite=True):
        super().__init__()
        norm_fn = (lambda d: nn.GroupNorm(norm_groups, d)) if norm \
            else (lambda d: nn.Identity())
        pad = kernel_size // 4 if pad else 0
        klass = nn.Conv1d
        self.freq = freq
        self.kernel_size = kernel_size
        self.stride = stride
        self.empty = empty
        self.pad = pad
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            pad = [pad, 0]
            klass = nn.Conv2d
        self.conv = klass(chin, chout, kernel_size, stride, pad)
        if self.empty:
            return
        self.norm1 = norm_fn(chout)
        self.rewrite = None
        if rewrite:
            self.rewrite = klass(chout, 2 * chout, 1 + 2 * context, 1, context)
            self.norm2 = norm_fn(2 * chout)
        self.dconv = None
        if dconv:
            self.dconv = DConv(chout, **(dconv_kw or {}))

    def forward(self, x, inject=None):
        if not self.freq and x.dim() == 4:
            B, C, Fr, T = x.shape
            x = x.view(B, -1, T)
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride != 0:
                x = F.pad(x, (0, self.stride - (le % self.stride)))
        y = self.conv(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.dim() == 3 and y.dim() == 4:
                inject = inject[:, :, None]
            y = y + inject
        y = F.gelu(self.norm1(y))
        if self.dconv:
            if self.freq:
                B, C, Fr, T = y.shape
                y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            y = self.dconv(y)
            if self.freq:
                y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        if self.rewrite:
            z = self.norm2(self.rewrite(y))
            return F.glu(z, dim=1)
        return y


class HDecLayer(nn.Module):
    def __init__(self, chin, chout, last=False, kernel_size=8, stride=4,
                 norm_groups=1, empty=False, freq=True, dconv=True, norm=True,
                 context=1, dconv_kw=None, pad=True, context_freq=True,
                 rewrite=True):
        super().__init__()
        norm_fn = (lambda d: nn.GroupNorm(norm_groups, d)) if norm \
            else (lambda d: nn.Identity())
        pad = kernel_size // 4 if pad else 0
        self.pad = pad
        self.last = last
        self.freq = freq
        self.chin = chin
        self.empty = empty
        self.stride = stride
        self.kernel_size = kernel_size
        klass = nn.Conv1d
        klass_tr = nn.ConvTranspose1d
        if freq:
            kernel_size = [kernel_size, 1]
            stride = [stride, 1]
            klass = nn.Conv2d
            klass_tr = nn.ConvTranspose2d
        self.conv_tr = klass_tr(chin, chout, kernel_size, stride)
        self.norm2 = norm_fn(chout)
        if self.empty:
            return
        self.rewrite = None
        if rewrite:
            if context_freq:
                self.rewrite = klass(chin, 2 * chin, 1 + 2 * context, 1, context)
            else:
                self.rewrite = klass(chin, 2 * chin, [1, 1 + 2 * context], 1,
                                     [0, context])
            self.norm1 = norm_fn(2 * chin)
        self.dconv = None
        if dconv:
            self.dconv = DConv(chin, **(dconv_kw or {}))

    def forward(self, x, skip, length):
        if self.freq and x.dim() == 3:
            B, C, T = x.shape
            x = x.view(B, self.chin, -1, T)
        if not self.empty:
            x = x + skip
            if self.rewrite:
                y = F.glu(self.norm1(self.rewrite(x)), dim=1)
            else:
                y = x
            if self.dconv:
                if self.freq:
                    B, C, Fr, T = y.shape
                    y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
                y = self.dconv(y)
                if self.freq:
                    y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            y = x
            assert skip is None
        z = self.norm2(self.conv_tr(y))
        if self.freq:
            if self.pad:
                z = z[..., self.pad:-self.pad, :]
        else:
            z = z[..., self.pad:self.pad + length]
        if not self.last:
            z = F.gelu(z)
        return z, y


class HDemucs(nn.Module):
    def __init__(self, sources, audio_channels=2, channels=48, growth=2,
                 nfft=4096, wiener_iters=0, cac=True, depth=6, rewrite=True,
                 freq_emb=0.2, emb_scale=10, emb_smooth=True, kernel_size=8,
                 time_stride=2, stride=4, context=1, context_enc=0,
                 norm_starts=4, norm_groups=4, dconv_mode=1, dconv_depth=2,
                 dconv_comp=4, dconv_attn=4, dconv_lstm=4, dconv_init=1e-4):
        super().__init__()
        self.sources = sources
        self.audio_channels = audio_channels
        self.depth = depth
        self.cac = cac
        self.nfft = nfft
        self.hop_length = nfft // 4
        self.wiener_iters = wiener_iters
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()

        chin = audio_channels
        chin_z = chin * (2 if cac else 1)
        chout = channels
        chout_z = channels
        freqs = nfft // 2
        self.freq_emb = None
        for index in range(depth):
            lstm = index >= dconv_lstm
            attn = index >= dconv_attn
            norm = index >= norm_starts
            freq = freqs > 1
            stri, ker = stride, kernel_size
            if not freq:
                ker, stri = time_stride * 2, time_stride
            pad = True
            last_freq = False
            if freq and freqs <= kernel_size:
                ker, pad, last_freq = freqs, False, True
            kw = {"kernel_size": ker, "stride": stri, "freq": freq, "pad": pad,
                  "norm": norm, "rewrite": rewrite, "norm_groups": norm_groups,
                  "dconv_kw": {"lstm": lstm, "attn": attn,
                               "depth": dconv_depth, "compress": dconv_comp,
                               "init": dconv_init}}
            kwt = dict(kw)
            kwt["freq"] = 0
            kwt["kernel_size"] = kernel_size
            kwt["stride"] = stride
            kwt["pad"] = True
            kw_dec = dict(kw)

            if last_freq:
                chout_z = max(chout, chout_z)
                chout = chout_z
            enc = HEncLayer(chin_z, chout_z, dconv=dconv_mode & 1,
                            context=context_enc, **kw)
            if freq:
                self.tencoder.append(
                    HEncLayer(chin, chout, dconv=dconv_mode & 1,
                              context=context_enc, empty=last_freq, **kwt))
            self.encoder.append(enc)
            if index == 0:
                chin = self.audio_channels * len(self.sources)
                chin_z = chin * (2 if cac else 1)
            dec = HDecLayer(chout_z, chin_z, dconv=dconv_mode & 2,
                            last=index == 0, context=context, **kw_dec)
            if freq:
                self.tdecoder.insert(0, HDecLayer(
                    chout, chin, dconv=dconv_mode & 2, empty=last_freq,
                    last=index == 0, context=context, **kwt))
            self.decoder.insert(0, dec)
            chin, chin_z = chout, chout_z
            chout = int(growth * chout)
            chout_z = int(growth * chout_z)
            if freq:
                freqs = 1 if freqs <= kernel_size else freqs // stride
            if index == 0 and freq_emb:
                self.freq_emb = ScaledEmbedding(freqs, chin_z,
                                                smooth=emb_smooth,
                                                scale=emb_scale)
                self.freq_emb_scale = freq_emb

    def _spec(self, x):
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = F.pad(x, (pad, pad + le * hl - x.shape[-1]), mode="reflect")
        z = spectro(x, self.nfft, hl)[..., :-1, :]
        return z[..., 2:2 + le]

    def _ispec(self, z, length):
        hl = self.hop_length
        z = F.pad(z, (0, 0, 0, 1))
        z = F.pad(z, (2, 2))
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = ispectro(z, hl, length=le)
        return x[..., pad:pad + length]

    def forward(self, mix):
        length = mix.shape[-1]
        z = self._spec(mix)
        B, C, Fq, T = z.shape
        m = torch.view_as_real(z).permute(0, 1, 4, 2, 3)
        x = m.reshape(B, C * 2, Fq, T)

        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)

        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.tencoder):
                lengths_t.append(xt.shape[-1])
                tenc = self.tencoder[idx]
                xt = tenc(xt)
                if not tenc.empty:
                    saved_t.append(xt)
                else:
                    inject = xt
                    xt = None
            x = encode(x, inject)
            if idx == 0 and self.freq_emb is not None:
                frs = torch.arange(x.shape[-2], device=x.device)
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + self.freq_emb_scale * emb
            saved.append(x)

        x = torch.zeros_like(x)
        # decoder starts from zero; signal flows through the U-Net skips
        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            offset = self.depth - len(self.tdecoder)
            if idx >= offset:
                tdec = self.tdecoder[idx - offset]
                length_t = lengths_t.pop(-1)
                if tdec.empty:
                    assert pre.shape[2] == 1, pre.shape
                    xt, _ = tdec(pre[:, :, 0], None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        S = len(self.sources)
        x = x.view(B, S, -1, Fq, T)
        x = x * std[:, None] + mean[:, None]
        out = x.view(B, S, -1, 2, Fq, T).permute(0, 1, 2, 4, 5, 3)
        zout = torch.view_as_complex(out.contiguous())
        x = self._ispec(zout, length)
        xt = xt.view(B, S, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + x
