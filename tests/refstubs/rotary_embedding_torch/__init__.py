"""Faithful minimal RotaryEmbedding (see README.md)."""

import torch
from torch import nn


class RotaryEmbedding(nn.Module):
    def __init__(self, dim, theta=10000, learned_freq=False, **kwargs):
        super().__init__()
        freqs = 1.0 / (
            theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
        self.freqs = nn.Parameter(freqs, requires_grad=learned_freq)

    def rotate_queries_or_keys(self, t, seq_dim=-2, offset=0):
        n = t.shape[seq_dim]
        assert seq_dim in (-2, t.ndim - 2), "stub supports seq on dim -2"
        pos = torch.arange(n, device=t.device, dtype=self.freqs.dtype) + offset
        f = pos[:, None] * self.freqs[None, :]     # (n, d/2)
        f = f.repeat_interleave(2, dim=-1)         # (n, d) adjacent pairs
        cos, sin = f.cos(), f.sin()
        x2 = t.reshape(*t.shape[:-1], -1, 2)
        rot = torch.stack((-x2[..., 1], x2[..., 0]), dim=-1).reshape(t.shape)
        return t * cos + rot * sin
