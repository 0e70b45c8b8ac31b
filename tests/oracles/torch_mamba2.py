"""Test-only functional torch oracle for the Mamba-2 SSD block and the
TS-BS-Mamba2 separator components (spec: SURVEY.md §2.2, behavior of
reference models/ex_bi_mamba2.py and models/ts_bs_mamba2.py)."""

import numpy as np
import torch
import torch.nn.functional as F

EPS = float(np.finfo(np.float32).eps)
D_STATE, D_CONV, EXPAND, HEADDIM, CHUNK = 128, 4, 4, 64, 64


def segsum(x):
    t = x.size(-1)
    x = x[..., None].repeat(*([1] * (x.dim())), t)
    mask = torch.tril(torch.ones(t, t, dtype=torch.bool), diagonal=-1)
    x = x.masked_fill(~mask, 0)
    x_segsum = torch.cumsum(x, dim=-2)
    mask = torch.tril(torch.ones(t, t, dtype=torch.bool), diagonal=0)
    return x_segsum.masked_fill(~mask, -torch.inf)


def ssd(x, a, b, c, chunk=CHUNK):
    bs, l, h, p = x.shape
    x = x.reshape(bs, l // chunk, chunk, h, p)
    b = b.reshape(bs, l // chunk, chunk, b.shape[2], b.shape[3])
    c = c.reshape(bs, l // chunk, chunk, c.shape[2], c.shape[3])
    a = a.reshape(bs, l // chunk, chunk, h).permute(0, 3, 1, 2)
    a_cumsum = torch.cumsum(a, dim=-1)

    ldecay = torch.exp(segsum(a))
    y_diag = torch.einsum("bclhn,bcshn,bhcls,bcshp->bclhp", c, b, ldecay, x)

    decay_states = torch.exp(a_cumsum[:, :, :, -1:] - a_cumsum)
    states = torch.einsum("bclhn,bhcl,bclhp->bchpn", b, decay_states, x)
    states = torch.cat([torch.zeros_like(states[:, :1]), states], dim=1)
    # (the reference indexes [0] here because its segsum implicitly prepends
    # a broadcast dim via repeat; this generic segsum does not)
    decay_chunk = torch.exp(segsum(F.pad(a_cumsum[:, :, :, -1], (1, 0))))
    states = torch.einsum("bhzc,bchpn->bzhpn", decay_chunk, states)[:, :-1]

    state_decay_out = torch.exp(a_cumsum)
    y_off = torch.einsum("bclhn,bchpn,bhcl->bclhp", c, states, state_decay_out)
    y = y_diag + y_off
    return y.reshape(bs, l, h, p)


def mamba2(sd, prefix, u):
    """u (B, L, D)."""
    d_model = u.shape[-1]
    d_inner = EXPAND * d_model
    nheads = d_inner // HEADDIM

    a = -torch.exp(sd[f"{prefix}.A_log"])
    zxbcdt = F.linear(u, sd[f"{prefix}.in_proj.weight"])
    z, xbc, dt = torch.split(zxbcdt, [d_inner, d_inner + 2 * D_STATE, nheads], dim=-1)
    dt = F.softplus(dt + sd[f"{prefix}.dt_bias"])
    xbc = F.conv1d(xbc.transpose(1, 2), sd[f"{prefix}.conv1d.weight"],
                   sd[f"{prefix}.conv1d.bias"], padding=D_CONV - 1,
                   groups=d_inner + 2 * D_STATE).transpose(1, 2)[:, : u.shape[1]]
    xbc = xbc * torch.sigmoid(xbc)
    x, b, c = torch.split(xbc, [d_inner, D_STATE, D_STATE], dim=-1)
    bs, l, _ = x.shape
    x = x.reshape(bs, l, nheads, HEADDIM)

    lpad = (-l) % CHUNK
    if lpad:
        xp = F.pad(x, (0, 0, 0, 0, 0, lpad))
        bp = F.pad(b.unsqueeze(2), (0, 0, 0, 0, 0, lpad))
        cp = F.pad(c.unsqueeze(2), (0, 0, 0, 0, 0, lpad))
        dtp = F.pad(dt, (0, 0, 0, lpad))
    else:
        xp, bp, cp, dtp = x, b.unsqueeze(2), c.unsqueeze(2), dt

    y = ssd(xp * dtp.unsqueeze(-1), a * dtp, bp, cp)[:, :l]
    y = y + x * sd[f"{prefix}.D"].unsqueeze(-1)
    y = y.reshape(bs, l, d_inner)
    y = y * (z * torch.sigmoid(z))
    y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + 1e-5) * sd[f"{prefix}.norm.weight"]
    return F.linear(y, sd[f"{prefix}.out_proj.weight"])


def mamba_block(sd, prefix, x):
    fwd = mamba2(sd, f"{prefix}.forward_mamba2", x)
    bwd = mamba2(sd, f"{prefix}.backward_mamba2", torch.flip(x, [1]))
    return torch.cat([fwd + x, torch.flip(bwd, [1]) + x], -1)


def res_mamba(sd, prefix, x):
    """(B, N, T)."""
    y = F.group_norm(x, 1, sd[f"{prefix}.norm.weight"], sd[f"{prefix}.norm.bias"], eps=EPS)
    y = mamba_block(sd, f"{prefix}.rnn", y.transpose(1, 2))
    y = F.linear(y, sd[f"{prefix}.proj.weight"], sd[f"{prefix}.proj.bias"])
    return x + y.transpose(1, 2)


def tac(sd, prefix, x):
    """(B, G, N, T) (reference ts_bs_mamba2.py:65-88)."""
    bs, g, n, t = x.shape
    y = F.group_norm(x.reshape(bs * g, n, t), 1, sd[f"{prefix}.input_norm.weight"],
                     sd[f"{prefix}.input_norm.bias"], eps=EPS).reshape(bs, g, n, t)
    gi = y.permute(0, 3, 1, 2).reshape(-1, n)
    gi = torch.tanh(F.linear(gi, sd[f"{prefix}.TAC_input.0.weight"],
                             sd[f"{prefix}.TAC_input.0.bias"])).reshape(bs, t, g, -1)
    gm = gi.mean(2).reshape(bs * t, -1)
    gm = torch.tanh(F.linear(gm, sd[f"{prefix}.TAC_mean.0.weight"],
                             sd[f"{prefix}.TAC_mean.0.bias"]))
    gm = gm.unsqueeze(1).expand(bs * t, g, gm.shape[-1])
    go = torch.cat([gi.reshape(bs * t, g, -1), gm], 2)
    go = torch.tanh(F.linear(go.reshape(-1, go.shape[-1]),
                             sd[f"{prefix}.TAC_output.0.weight"],
                             sd[f"{prefix}.TAC_output.0.bias"]))
    go = go.reshape(bs, t, g, -1).permute(0, 2, 3, 1)
    return x + go.reshape(x.shape)
