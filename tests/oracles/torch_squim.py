"""Test-only torch reconstruction of the SQUIM objective model.

Reconstruction basis: reference models/bandit/core/metrics/_squim.py
(the vendored torchaudio SquimObjective) — Encoder :47-72, SingleRNN
:75-100, DPRNN :102-195, AutoPool :198-208, SquimObjective :211-253,
_create_branch :256-285, squim_objective_base :322-334. Built with plain
torch modules (nn.LSTM, nn.TransformerEncoderLayer) exactly as the
reference does, so exported state_dicts carry the reference's key
layout for the converter."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

PESQ_RANGE = (1.0, 0.999 + (4.999 - 0.999) / (1 + math.exp(-1.3669 * 4.5 + 3.8224)))


class RangeSigmoid(nn.Module):
    def __init__(self, val_range=(0.0, 1.0)):
        super().__init__()
        self.val_range = val_range

    def forward(self, x):
        lo, hi = self.val_range
        return torch.sigmoid(x) * (hi - lo) + lo


class Encoder(nn.Module):
    def __init__(self, feat_dim=512, win_len=32):
        super().__init__()
        self.conv1d = nn.Conv1d(1, feat_dim, win_len, stride=win_len // 2,
                                bias=False)

    def forward(self, x):
        return F.relu(self.conv1d(x.unsqueeze(1)))


class SingleRNN(nn.Module):
    def __init__(self, input_size, hidden_size):
        super().__init__()
        self.rnn = nn.LSTM(input_size, hidden_size, 1, batch_first=True,
                           bidirectional=True)
        self.proj = nn.Linear(hidden_size * 2, input_size)

    def forward(self, x):
        out, _ = self.rnn(x)
        return self.proj(out)


class DPRNN(nn.Module):
    def __init__(self, feat_dim=64, hidden_dim=128, num_blocks=6,
                 d_model=256, chunk_size=100, chunk_stride=50):
        super().__init__()
        self.row_rnn = nn.ModuleList(
            [SingleRNN(feat_dim, hidden_dim) for _ in range(num_blocks)])
        self.col_rnn = nn.ModuleList(
            [SingleRNN(feat_dim, hidden_dim) for _ in range(num_blocks)])
        self.row_norm = nn.ModuleList(
            [nn.GroupNorm(1, feat_dim, eps=1e-8) for _ in range(num_blocks)])
        self.col_norm = nn.ModuleList(
            [nn.GroupNorm(1, feat_dim, eps=1e-8) for _ in range(num_blocks)])
        self.conv = nn.Sequential(nn.Conv2d(feat_dim, d_model, 1), nn.PReLU())
        self.chunk_size = chunk_size
        self.chunk_stride = chunk_stride

    def pad_chunk(self, x):
        seq_len = x.shape[-1]
        rest = self.chunk_size - (self.chunk_stride + seq_len % self.chunk_size) % self.chunk_size
        out = F.pad(x, [self.chunk_stride, rest + self.chunk_stride])
        return out, rest

    def chunking(self, x):
        out, rest = self.pad_chunk(x)
        b, n, _ = out.shape
        seg1 = out[:, :, : -self.chunk_stride].contiguous().view(b, n, -1, self.chunk_size)
        seg2 = out[:, :, self.chunk_stride:].contiguous().view(b, n, -1, self.chunk_size)
        out = torch.cat([seg1, seg2], dim=3)
        out = out.view(b, n, -1, self.chunk_size).transpose(2, 3).contiguous()
        return out, rest

    def merging(self, x, rest):
        b, d, _, _ = x.shape
        out = x.transpose(2, 3).contiguous().view(b, d, -1, self.chunk_size * 2)
        out1 = out[:, :, :, : self.chunk_size].contiguous().view(b, d, -1)[:, :, self.chunk_stride:]
        out2 = out[:, :, :, self.chunk_size:].contiguous().view(b, d, -1)[:, :, : -self.chunk_stride]
        out = out1 + out2
        if rest > 0:
            out = out[:, :, :-rest]
        return out.contiguous()

    def forward(self, x):
        x, rest = self.chunking(x)
        b, _, dim1, dim2 = x.shape
        out = x
        for row_rnn, row_norm, col_rnn, col_norm in zip(
                self.row_rnn, self.row_norm, self.col_rnn, self.col_norm):
            row_in = out.permute(0, 3, 2, 1).contiguous().view(b * dim2, dim1, -1)
            row_out = row_rnn(row_in)
            row_out = row_out.view(b, dim2, dim1, -1).permute(0, 3, 2, 1).contiguous()
            out = out + row_norm(row_out)

            col_in = out.permute(0, 2, 3, 1).contiguous().view(b * dim1, dim2, -1)
            col_out = col_rnn(col_in)
            col_out = col_out.view(b, dim1, dim2, -1).permute(0, 3, 1, 2).contiguous()
            out = out + col_norm(col_out)
        out = self.conv(out)
        out = self.merging(out, rest)
        return out.transpose(1, 2).contiguous()


class AutoPool(nn.Module):
    def __init__(self, pool_dim=1):
        super().__init__()
        self.pool_dim = pool_dim
        self.register_parameter("alpha", nn.Parameter(torch.ones(1)))

    def forward(self, x):
        weight = torch.softmax(x * self.alpha, dim=self.pool_dim)
        return torch.sum(x * weight, dim=self.pool_dim)


class SquimObjective(nn.Module):
    def __init__(self, encoder, dprnn, branches):
        super().__init__()
        self.encoder = encoder
        self.dprnn = dprnn
        self.branches = branches

    def forward(self, x):
        x = x / (torch.mean(x ** 2, dim=1, keepdim=True) ** 0.5 * 20)
        out = self.dprnn(self.encoder(x))
        return [branch(out).squeeze(dim=1) for branch in self.branches]


def _create_branch(d_model, nhead, metric):
    layer1 = nn.TransformerEncoderLayer(d_model, nhead, d_model * 4,
                                        dropout=0.0, batch_first=True)
    layer2 = AutoPool()
    if metric == "stoi":
        layer3 = nn.Sequential(nn.Linear(d_model, d_model), nn.PReLU(),
                               nn.Linear(d_model, 1), RangeSigmoid())
    elif metric == "pesq":
        layer3 = nn.Sequential(nn.Linear(d_model, d_model), nn.PReLU(),
                               nn.Linear(d_model, 1),
                               RangeSigmoid(val_range=PESQ_RANGE))
    else:
        layer3 = nn.Sequential(nn.Linear(d_model, d_model), nn.PReLU(),
                               nn.Linear(d_model, 1))
    return nn.Sequential(layer1, layer2, layer3)


def squim_objective_model(feat_dim, win_len, d_model, nhead, hidden_dim,
                          num_blocks, chunk_size, chunk_stride=None):
    if chunk_stride is None:
        chunk_stride = chunk_size // 2
    encoder = Encoder(feat_dim, win_len)
    dprnn = DPRNN(feat_dim, hidden_dim, num_blocks, d_model, chunk_size,
                  chunk_stride)
    branches = nn.ModuleList([
        _create_branch(d_model, nhead, "stoi"),
        _create_branch(d_model, nhead, "pesq"),
        _create_branch(d_model, nhead, "sisdr"),
    ])
    return SquimObjective(encoder, dprnn, branches)
