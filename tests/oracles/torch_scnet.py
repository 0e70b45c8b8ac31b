"""Test-only functional torch oracle for SCNet (spec: SURVEY.md §2.2,
behavior of reference models/scnet/). Runs the sparse-compression forward
directly from a state_dict; nn.LSTM is instantiated per call as the RNN
primitive."""

import math

import torch
import torch.nn.functional as F


def _gn(x, sd, p):
    return F.group_norm(x, 1, sd[f"{p}.weight"], sd[f"{p}.bias"])


def _conv_module(x, sd, prefix, depth):
    for d in range(depth):
        p = f"{prefix}.layers.{d}"
        y = _gn(x, sd, f"{p}.0")
        k = sd[f"{p}.1.weight"].shape[-1]
        y = F.conv1d(y, sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], padding=k // 2)
        y = F.glu(y, dim=1)
        hidden = y.shape[1]
        k = sd[f"{p}.3.weight"].shape[-1]
        y = F.conv1d(y, sd[f"{p}.3.weight"], sd[f"{p}.3.bias"], padding=k // 2,
                     groups=hidden)
        y = _gn(y, sd, f"{p}.4")
        y = y * y.sigmoid()
        y = F.conv1d(y, sd[f"{p}.6.weight"], sd[f"{p}.6.bias"])
        x = x + y
    return x


def _lstm(x, sd, prefix):
    d_in = sd[f"{prefix}.weight_ih_l0"].shape[1]
    hidden = sd[f"{prefix}.weight_hh_l0"].shape[1]
    mod = torch.nn.LSTM(d_in, hidden, num_layers=1, bidirectional=True,
                        batch_first=True)
    with torch.no_grad():
        mod.weight_ih_l0.copy_(sd[f"{prefix}.weight_ih_l0"])
        mod.weight_hh_l0.copy_(sd[f"{prefix}.weight_hh_l0"])
        mod.bias_ih_l0.copy_(sd[f"{prefix}.bias_ih_l0"])
        mod.bias_hh_l0.copy_(sd[f"{prefix}.bias_hh_l0"])
        mod.weight_ih_l0_reverse.copy_(sd[f"{prefix}.weight_ih_l0_reverse"])
        mod.weight_hh_l0_reverse.copy_(sd[f"{prefix}.weight_hh_l0_reverse"])
        mod.bias_ih_l0_reverse.copy_(sd[f"{prefix}.bias_ih_l0_reverse"])
        mod.bias_hh_l0_reverse.copy_(sd[f"{prefix}.bias_hh_l0_reverse"])
    out, _ = mod(x)
    return out


def _dual_path(x, sd, prefix):
    b, c, fr, t = x.shape
    orig = x
    y = _gn(x, sd, f"{prefix}.norm_layers.0")
    y = y.transpose(1, 3).contiguous().view(b * t, fr, c)
    y = _lstm(y, sd, f"{prefix}.lstm_layers.0")
    y = F.linear(y, sd[f"{prefix}.linear_layers.0.weight"],
                 sd[f"{prefix}.linear_layers.0.bias"])
    x = y.view(b, t, fr, c).transpose(1, 3) + orig

    orig = x
    y = _gn(x, sd, f"{prefix}.norm_layers.1")
    y = y.transpose(1, 2).contiguous().view(b * fr, c, t).transpose(1, 2)
    y = _lstm(y, sd, f"{prefix}.lstm_layers.1")
    y = F.linear(y, sd[f"{prefix}.linear_layers.1.weight"],
                 sd[f"{prefix}.linear_layers.1.bias"])
    return y.transpose(1, 2).contiguous().view(b, fr, c, t).transpose(1, 2) + orig


@torch.no_grad()
def forward(sd, kw, x, variant="lstm"):
    """x (B, ch, T) -> (B, sources, ch, T)."""
    b, ch, length = x.shape
    hop = kw["hop_size"]
    band_sr = kw["band_SR"]
    band_stride = kw["band_stride"]
    band_kernel = kw["band_kernel"]
    dims = kw["dims"]

    padding = hop - length % hop
    if (length + padding) // hop % 2 == 0:
        padding += hop
    x = F.pad(x, (0, padding))
    lpad = x.shape[-1]

    # lstm/tran pass NO window (boxcar) — scnet.py:338; masked uses hann
    # (scnet_masked.py:293)
    window = (torch.hann_window(kw["nfft"], periodic=True)
              if variant == "masked" else None)
    z = torch.stft(x.reshape(-1, lpad), kw["nfft"], hop, win_length=kw["win_size"],
                   window=window, center=True, normalized=kw["normalized"],
                   return_complex=True)
    z = torch.view_as_real(z)
    z = z.permute(0, 3, 1, 2).reshape(z.shape[0] // ch, z.shape[3] * ch,
                                      z.shape[1], z.shape[2])
    bb, cc, fr, t = z.shape

    mixture = None
    if variant == "masked":
        mixture = z.repeat(1, len(kw["sources"]), 1, 1)
        z = z + sd["pos_embed_f"][:, :, :fr, :]

    skips, lens, olens = [], [], []
    for i in range(len(dims) - 1):
        lo = math.ceil(fr_cur * band_sr[0]) if (fr_cur := z.shape[2]) else 0
        mid = math.ceil(fr_cur * (band_sr[0] + band_sr[1]))
        splits = [(0, lo), (lo, mid), (mid, fr_cur)]
        bands, orig_lengths = [], []
        for bi, (start, end) in enumerate(splits):
            ext = z[:, :, start:end, :]
            orig_lengths.append(end - start)
            cur = ext.shape[2]
            stride, kernel = band_stride[bi], band_kernel[bi]
            total = kernel - stride if stride == 1 else (stride - cur % stride) % stride
            pl = total // 2
            ext = F.pad(ext, (0, 0, pl, total - pl))
            out = F.conv2d(ext, sd[f"encoder.{i}.SDlayer.convs.{bi}.weight"],
                           sd[f"encoder.{i}.SDlayer.convs.{bi}.bias"],
                           stride=(stride, 1))
            b2, c2, f2, t2 = out.shape
            flat = out.permute(0, 2, 1, 3).reshape(-1, c2, t2)
            flat = _conv_module(flat, sd, f"encoder.{i}.conv_modules.{bi}",
                                kw["conv_depths"][bi])
            out = flat.view(b2, f2, c2, t2).permute(0, 2, 1, 3)
            bands.append(F.gelu(out))
        lengths = [band.shape[2] for band in bands]
        full = torch.cat(bands, dim=2)
        skips.append(full)
        lens.append(lengths)
        olens.append(orig_lengths)
        k = sd[f"encoder.{i}.globalconv.weight"].shape[-1]
        z = F.conv2d(full, sd[f"encoder.{i}.globalconv.weight"],
                     sd[f"encoder.{i}.globalconv.bias"], padding=(k - 1) // 2)

    for i in range(kw["num_dplayer"]):
        if variant == "tran":
            z = _dual_path_tran(z, sd, f"separation_net.dp_modules.{i}",
                                kw["tran_heads"], kw["tran_depth"])
        else:
            z = _dual_path(z, sd, f"separation_net.dp_modules.{i}")
        if i % 2 == 0:
            zc = torch.fft.rfft(z.float(), dim=3, norm="ortho")
            z = torch.cat([zc.real, zc.imag], dim=1)
        else:
            c = z.shape[1]
            zc = torch.complex(z[:, : c // 2].float(), z[:, c // 2 :].float())
            z = torch.fft.irfft(zc, dim=3, norm="ortho")

    for di in range(len(dims) - 1):
        z = z + skips.pop()
        z = z.repeat(1, 2, 1, 1)
        z = F.conv2d(z, sd[f"decoder.{di}.0.conv.weight"],
                     sd[f"decoder.{di}.0.conv.bias"], padding=1)
        z = F.glu(z, dim=1)
        lengths = lens.pop()
        orig_lengths = olens.pop()
        splits = [(0, lengths[0]), (lengths[0], lengths[0] + lengths[1]),
                  (lengths[0] + lengths[1], None)]
        outs = []
        for bi, (start, end) in enumerate(splits):
            out = F.conv_transpose2d(z[:, :, start:end, :],
                                     sd[f"decoder.{di}.1.convtrs.{bi}.weight"],
                                     sd[f"decoder.{di}.1.convtrs.{bi}.bias"],
                                     stride=(band_stride[bi], 1))
            dist = abs(orig_lengths[bi] - out.shape[2]) // 2
            outs.append(out[:, :, dist : dist + orig_lengths[bi], :])
        z = torch.cat(outs, dim=2)

    n = dims[0]
    if variant == "masked":
        m = F.conv2d(z, sd["mask_layer.0.weight"], sd["mask_layer.0.bias"],
                     padding=1)
        m = F.gelu(m)
        m = F.conv2d(m, sd["mask_layer.2.weight"], sd["mask_layer.2.bias"])
        m = torch.tanh(m)
        mc = m.view(bb, n, -1, fr, t).reshape(-1, 2, fr, t).permute(0, 2, 3, 1)
        mc = torch.view_as_complex(mc.contiguous())
        xc = mixture.view(bb, n, -1, fr, t).reshape(-1, 2, fr, t).permute(0, 2, 3, 1)
        xc = torch.view_as_complex(xc.contiguous())
        z = xc * mc
    else:
        z = z.view(bb, n, -1, fr, t).reshape(-1, 2, fr, t).permute(0, 2, 3, 1)
        z = torch.view_as_complex(z.contiguous())
    wav = torch.istft(z, kw["nfft"], hop, win_length=kw["win_size"],
                      window=window, center=True, normalized=kw["normalized"])
    wav = wav.reshape(bb, len(kw["sources"]), ch, -1)
    return wav[:, :, :, :-padding]


# ---- tran variant (reference models/scnet/scnet_tran.py) -------------------

def _rms(x, sd, p):
    return F.normalize(x, dim=-1) * x.shape[-1] ** 0.5 * sd[f"{p}.gamma"]


def _rope(x, freqs):
    """rotary_embedding_torch rotate_queries_or_keys: interleaved pairs,
    partial rotary over the leading 2*len(freqs) dims."""
    rot = freqs.shape[0] * 2
    n = x.shape[-2]
    t = torch.arange(n, dtype=torch.float32)
    ang = (t[:, None] * freqs[None, :]).repeat_interleave(2, dim=-1)
    cos, sin = ang.cos(), ang.sin()
    head, rest = x[..., :rot], x[..., rot:]
    x2 = head.reshape(*head.shape[:-1], rot // 2, 2)
    rh = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(head.shape)
    return torch.cat([head * cos + rh * sin, rest], dim=-1)


def _attention(x, sd, p, heads, freqs):
    xn = _rms(x, sd, f"{p}.norm")
    qkv = F.linear(xn, sd[f"{p}.to_qkv.weight"])
    b, n, _ = qkv.shape
    q, k, v = qkv.reshape(b, n, 3, heads, -1).permute(2, 0, 3, 1, 4)
    q = _rope(q, freqs)
    k = _rope(k, freqs)
    out = F.scaled_dot_product_attention(q, k, v)
    gates = F.linear(xn, sd[f"{p}.to_gates.weight"], sd[f"{p}.to_gates.bias"])
    out = out * gates.transpose(1, 2).unsqueeze(-1).sigmoid()
    out = out.transpose(1, 2).reshape(b, n, -1)
    return F.linear(out, sd[f"{p}.to_out.0.weight"])


def _ff(x, sd, p):
    y = _rms(x, sd, f"{p}.net.0")
    y = F.linear(y, sd[f"{p}.net.1.weight"], sd[f"{p}.net.1.bias"])
    y = F.gelu(y)
    return F.linear(y, sd[f"{p}.net.4.weight"], sd[f"{p}.net.4.bias"])


def _transformer(x, sd, p, depth, heads, freqs):
    for i in range(depth):
        x = _attention(x, sd, f"{p}.layers.{i}.0", heads, freqs) + x
        x = _ff(x, sd, f"{p}.layers.{i}.1") + x
    return _rms(x, sd, f"{p}.norm")


def _dual_path_tran(x, sd, prefix, heads, depth):
    ffreqs = sd[f"{prefix}.freq_layer.layers.0.0.rotary_embed.freqs"]
    tfreqs = sd[f"{prefix}.time_layer.layers.0.0.rotary_embed.freqs"]
    b, c, fr, t = x.shape
    orig = x
    y = _gn(x, sd, f"{prefix}.norm_layers.0")
    y = y.transpose(1, 3).contiguous().view(b * t, fr, c)
    y = _transformer(y, sd, f"{prefix}.freq_layer", depth, heads, ffreqs)
    x = y.view(b, t, fr, c).transpose(1, 3) + orig
    orig = x
    y = _gn(x, sd, f"{prefix}.norm_layers.1")
    y = y.transpose(1, 2).contiguous().view(b * fr, c, t).transpose(1, 2)
    y = _transformer(y, sd, f"{prefix}.time_layer", depth, heads, tfreqs)
    return y.transpose(1, 2).contiguous().view(b, fr, c, t).transpose(1, 2) + orig
