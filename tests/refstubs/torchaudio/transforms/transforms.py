"""Faithful minimal Spectrogram/InverseSpectrogram (complex, power=None),
matching torchaudio's documented semantics: torch.stft/istft plus the
window-energy sqrt normalization when ``normalized`` is truthy."""

import torch
from torch import nn


class Spectrogram(nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None, pad=0,
                 window_fn=torch.hann_window, power=2.0, normalized=False,
                 wkwargs=None, center=True, pad_mode="reflect", onesided=True):
        super().__init__()
        assert pad == 0 and power is None and onesided, "stub scope"
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.center, self.pad_mode = center, pad_mode
        self.normalized = normalized
        self.register_buffer(
            "window", window_fn(self.win_length, **(wkwargs or {})))

    def forward(self, x):
        shape = x.shape
        spec = torch.stft(
            x.reshape(-1, shape[-1]), self.n_fft, self.hop_length,
            self.win_length, self.window, center=self.center,
            pad_mode=self.pad_mode, normalized=False, onesided=True,
            return_complex=True)
        if self.normalized:
            spec = spec / self.window.pow(2.0).sum().sqrt()
        return spec.reshape(shape[:-1] + spec.shape[-2:])


class InverseSpectrogram(nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None, pad=0,
                 window_fn=torch.hann_window, normalized=False, wkwargs=None,
                 center=True, pad_mode="reflect", onesided=True):
        super().__init__()
        assert pad == 0 and onesided, "stub scope"
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.center = center
        self.normalized = normalized
        self.register_buffer(
            "window", window_fn(self.win_length, **(wkwargs or {})))

    def forward(self, spec, length=None):
        shape = spec.shape
        if self.normalized:
            spec = spec * self.window.pow(2.0).sum().sqrt()
        wav = torch.istft(
            spec.reshape((-1,) + shape[-2:]), self.n_fft, self.hop_length,
            self.win_length, self.window, center=self.center,
            normalized=False, onesided=True, length=length)
        return wav.reshape(shape[:-2] + wav.shape[-1:])
