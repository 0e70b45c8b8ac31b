"""Test-only functional torch oracle for Apollo (spec: SURVEY.md §2.2,
behavior of reference models/look2hear/models/apollo.py)."""

import numpy as np
import torch
import torch.nn.functional as F

EPS = float(np.finfo(np.float32).eps)


def _rms_norm(x, w, eps=1e-5):
    # (B, N, T), rms over N
    xf = x.float()
    norm = xf * torch.rsqrt(xf.pow(2).mean(-2, keepdim=True) + eps)
    return norm.type_as(x) * w.reshape(1, -1, 1)


def _rope_tables(n, t, theta=10000.0):
    freq = 1.0 / (theta ** (torch.arange(0, n, 2)[: n // 2].float() / n))
    pos = torch.arange(t).reshape(-1, 1).float()
    cos = torch.stack([torch.cos(pos * freq)] * 2, -1).reshape(t, n)
    sin = torch.stack([torch.sin(pos * freq)] * 2, -1).reshape(t, n)
    return cos, sin


def _rope(x, cos, sin):
    n = x.shape[-1]
    flat = x.reshape(-1, x.shape[-2], n)
    neg = (torch.flip(flat.reshape(-1, n // 2, 2), [-1])
           * torch.tensor([-1.0, 1.0]).reshape(1, 1, 2)).reshape(flat.shape)
    return (flat * cos.unsqueeze(0) + neg * sin.unsqueeze(0)).reshape(x.shape)


def _roformer(sd, p, x, num_head=8):
    b, n, t = x.shape
    hidden = n // num_head
    xn = _rms_norm(x, sd[f"{p}.input_norm.weight"])
    w = F.conv1d(xn, sd[f"{p}.weight.weight"]).reshape(b, num_head, hidden * 3, t).mT
    q, k, v = torch.split(w, hidden, dim=-1)
    cos, sin = _rope_tables(hidden, t)
    q, k = _rope(q, cos, sin), _rope(k, cos, sin)
    out = F.scaled_dot_product_attention(q.contiguous(), k.contiguous(),
                                         v.contiguous(), is_causal=False)
    out = out.mT.reshape(b, -1, t)
    out = F.conv1d(out, sd[f"{p}.output.weight"]) + x
    h = _rms_norm(out, sd[f"{p}.MLP.0.weight"])
    h = F.silu(F.conv1d(h, sd[f"{p}.MLP.1.weight"]))
    gate, z = h.chunk(2, dim=1)
    return out + F.conv1d(F.silu(gate) * z, sd[f"{p}.MLP_output.weight"])


def _conv_act_norm(sd, p, x, kernel=7):
    n = x.shape[1]
    y = F.conv1d(x, sd[f"{p}.conv.0.weight"], sd[f"{p}.conv.0.bias"],
                 padding=(kernel - 1) // 2, groups=n)
    y = _rms_norm(y, sd[f"{p}.conv.1.weight"])
    y = F.silu(F.conv1d(y, sd[f"{p}.conv.2.weight"], sd[f"{p}.conv.2.bias"]))
    y = F.conv1d(y, sd[f"{p}.conv.4.weight"], sd[f"{p}.conv.4.bias"])
    return x + y


@torch.no_grad()
def forward(sd, cfg, x):
    sr = cfg["sr"]
    win = int(sr * cfg["win"] // 1000)
    stride = win // 2
    enc_dim = win // 2 + 1
    n = cfg["feature_dim"]
    layer = cfg["layer"]
    bw = int(win / 160)
    band_width = [bw] * 79 + [enc_dim - 79 * bw]

    b, ch, nsample = x.shape
    w = torch.hann_window(win)
    spec = torch.stft(x.reshape(b * ch, nsample), n_fft=win, hop_length=stride,
                      window=w, return_complex=True)

    feats = []
    idx = 0
    for i, width in enumerate(band_width):
        s = spec[:, idx : idx + width]
        idx += width
        power = (s.abs().pow(2).sum(1) + EPS).sqrt().unsqueeze(1)
        sn = torch.complex(s.real / power, s.imag / power)
        concat = torch.cat([sn.real, sn.imag, torch.log(power)], 1)
        f = _rms_norm(concat, sd[f"BN.{i}.0.weight"])
        f = F.conv1d(f, sd[f"BN.{i}.1.weight"], sd[f"BN.{i}.1.bias"])
        feats.append(f)
    feat = torch.stack(feats, 1)  # (B', nband, N, T)
    bb, nband, _, t = feat.shape

    for l in range(layer):
        z = feat.permute(0, 3, 2, 1).reshape(bb * t, -1, nband)
        z = _roformer(sd, f"net.{l}.band_net", z)
        feat = z.reshape(bb, t, -1, nband).permute(0, 3, 2, 1)
        z = feat.reshape(bb * nband, -1, t)
        for j in range(3):
            z = _conv_act_norm(sd, f"net.{l}.seq_net.blocks.{j}", z)
        feat = z.reshape(bb, nband, -1, t)

    est = []
    for i, width in enumerate(band_width):
        h = _rms_norm(feat[:, i], sd[f"output.{i}.0.weight"])
        h = F.conv1d(h, sd[f"output.{i}.1.weight"], sd[f"output.{i}.1.bias"])
        h = F.glu(h, dim=1).view(bb, 2, width, -1)
        est.append(torch.complex(h[:, 0], h[:, 1]))
    est = torch.cat(est, 1).to(torch.complex64)
    out = torch.istft(est, n_fft=win, hop_length=stride, window=w, length=nsample)
    return out.view(b, ch, -1)
