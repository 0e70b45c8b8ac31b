"""Test-only functional torch oracle for BS-RoFormer / Mel-Band RoFormer.

Runs the band-split RoPE-transformer forward directly from a torch
state_dict with torch.nn.functional calls, following the architecture
specification in SURVEY.md §2.2/§3.5. Validates the JAX implementation and
checkpoint converter end to end on synthetic weights.
"""

import numpy as np
import torch
import torch.nn.functional as F


def rms_norm(x, gamma):
    return F.normalize(x, dim=-1) * (x.shape[-1] ** 0.5) * gamma


def rope_rotate(x, freqs):
    """Interleaved rotary embedding on (..., n, d), positions 0..n-1."""
    n = x.shape[-2]
    ang = torch.outer(torch.arange(n, dtype=torch.float32), freqs)
    ang = ang.repeat_interleave(2, dim=-1)  # (n, d)
    cos, sin = ang.cos(), ang.sin()
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = torch.stack([-x2[..., 1], x2[..., 0]], -1).reshape(x.shape)
    return x * cos + rot * sin


def _attention(sd, p, x, heads, freqs=None, value_residual=None,
               return_values=False):
    xn = rms_norm(x, sd[f"{p}.norm.gamma"])
    qkv = F.linear(xn, sd[f"{p}.to_qkv.weight"])
    b, n, _ = qkv.shape
    q, k, v = qkv.reshape(b, n, 3, heads, -1).permute(2, 0, 3, 1, 4)
    orig_v = v
    if f"{p}.to_value_residual_mix.weight" in sd:
        mix = F.linear(xn, sd[f"{p}.to_value_residual_mix.weight"],
                       sd[f"{p}.to_value_residual_mix.bias"])
        mix = mix.transpose(1, 2).unsqueeze(-1).sigmoid()
        v = v.lerp(value_residual, mix)
    if freqs is not None:
        q, k = rope_rotate(q, freqs), rope_rotate(k, freqs)
    out = F.scaled_dot_product_attention(q, k, v)
    gates = F.linear(xn, sd[f"{p}.to_gates.weight"], sd[f"{p}.to_gates.bias"])
    out = out * gates.transpose(1, 2).unsqueeze(-1).sigmoid()
    out = out.transpose(1, 2).reshape(b, n, -1)
    out = F.linear(out, sd[f"{p}.to_out.0.weight"])
    if return_values:
        return out, orig_v
    return out


def _hyper_conn(sd, p, x, streams, branch):
    """Hyper-connections wrapper (hyper_connections package semantics;
    see sesa_tpu/models/hyper_connections.py for the layout spec)."""
    bs, n, d = x.shape
    r = x.reshape(bs // streams, streams, n, d).permute(0, 2, 1, 3)  # b n s d
    gamma = sd[f"{p}.norm.gamma"]
    normed = F.normalize(r, dim=-1) * (d ** 0.5) * (gamma + 1.0)
    alpha = (torch.tanh(normed @ sd[f"{p}.dynamic_alpha_fn"])
             * sd[f"{p}.dynamic_alpha_scale"] + sd[f"{p}.static_alpha"])
    beta = (torch.tanh(normed @ sd[f"{p}.dynamic_beta_fn"])
            * sd[f"{p}.dynamic_beta_scale"] + sd[f"{p}.static_beta"])
    mix = torch.einsum("bnst,bnsd->bntd", alpha, r)
    branch_in, resid = mix[..., 0, :], mix[..., 1:, :]
    out = branch(branch_in)
    extras = ()
    if isinstance(out, tuple):
        out, *extras = out
    r2 = resid + out.unsqueeze(-2) * beta.unsqueeze(-1)
    x2 = r2.permute(0, 2, 1, 3).reshape(bs, n, d)
    return (x2, *extras) if extras else x2


def _transformer_vr(sd, prefix, x, depth, heads, freqs, value_residual,
                    streams=1):
    """Experimental-variant transformer (bs_roformer_experimental.py:239-258)."""
    first_values = None
    if streams > 1:
        for i in range(depth):
            ap, fp = f"{prefix}.layers.{i}.0", f"{prefix}.layers.{i}.1"
            out, nv = _hyper_conn(
                sd, ap, x, streams,
                lambda bi: _attention(sd, f"{ap}.branch", bi, heads, freqs,
                                      value_residual=value_residual,
                                      return_values=True))
            first_values = first_values if first_values is not None else nv
            if value_residual is None:
                x = out + x
                x = _hyper_conn(sd, fp, x, streams,
                                lambda bi: _ff(sd, f"{fp}.branch", bi)) + x
            else:
                x = _hyper_conn(sd, fp, out, streams,
                                lambda bi: _ff(sd, f"{fp}.branch", bi))
    elif value_residual is not None:
        for i in range(depth):
            x, nv = _attention(sd, f"{prefix}.layers.{i}.0", x, heads, freqs,
                               value_residual=value_residual, return_values=True)
            first_values = first_values if first_values is not None else nv
            x = _ff(sd, f"{prefix}.layers.{i}.1", x)
    else:
        for i in range(depth):
            attn_out, nv = _attention(sd, f"{prefix}.layers.{i}.0", x, heads,
                                      freqs, return_values=True)
            first_values = first_values if first_values is not None else nv
            x = attn_out + x
            x = _ff(sd, f"{prefix}.layers.{i}.1", x) + x
    return x, first_values


def _linear_attention(sd, p, x, heads):
    xn = rms_norm(x, sd[f"{p}.norm.gamma"])
    qkv = F.linear(xn, sd[f"{p}.to_qkv.0.weight"])
    b, n, _ = qkv.shape
    # 'b n (qkv h d) -> qkv b h d n'
    q, k, v = qkv.reshape(b, n, 3, heads, -1).permute(2, 0, 3, 4, 1)
    q = F.normalize(q, dim=-1)
    k = F.normalize(k, dim=-1)
    q = q * sd[f"{p}.temperature"].exp()
    sim = torch.einsum("bhdn,bhen->bhde", q, k) * 8.0
    out = torch.einsum("bhde,bhen->bhdn", sim.softmax(dim=-1), v)
    out = out.permute(0, 3, 1, 2).reshape(b, n, -1)
    return F.linear(out, sd[f"{p}.to_out.1.weight"])


def _ff(sd, p, x):
    xn = rms_norm(x, sd[f"{p}.net.0.gamma"])
    h = F.gelu(F.linear(xn, sd[f"{p}.net.1.weight"], sd[f"{p}.net.1.bias"]))
    return F.linear(h, sd[f"{p}.net.4.weight"], sd[f"{p}.net.4.bias"])


def _fno(sd, p, z):
    """FNO1d stage over the time axis (the bs_roformer_fno declarative
    formulation: standard spectral conv + pointwise bypass, GELU, residual).

    z (B, T, NB, D) -> same shape."""
    w = torch.complex(sd[f"{p}.weight_real"], sd[f"{p}.weight_imag"])
    modes = w.shape[0]
    spec = torch.fft.rfft(z, dim=1)  # (B, F, NB, D) complex
    full = torch.zeros_like(spec)
    full[:, :modes] = torch.einsum("bknd,kde->bkne", spec[:, :modes], w)
    spectral = torch.fft.irfft(full, n=z.shape[1], dim=1)
    bypass = F.linear(z, sd[f"{p}.bypass.weight"], sd[f"{p}.bypass.bias"])
    return z + F.gelu(spectral + bypass)


def _transformer(sd, prefix, x, depth, heads, freqs=None, norm_output=False,
                 linear_attn=False):
    for i in range(depth):
        if linear_attn:
            x = _linear_attention(sd, f"{prefix}.layers.{i}.0", x, heads) + x
        else:
            x = _attention(sd, f"{prefix}.layers.{i}.0", x, heads, freqs) + x
        x = _ff(sd, f"{prefix}.layers.{i}.1", x) + x
    if norm_output:
        x = rms_norm(x, sd[f"{prefix}.norm.gamma"])
    return x


@torch.no_grad()
def forward(sd, cfg, x, band_widths=None, freq_indices=None,
            num_bands_per_freq=None, variant="bs", experimental=False):
    """x (B, ch, T) -> (B, S, ch, T) (S kept even when 1).

    For ``variant='bs'`` pass band_widths (complex-folded, contiguous).
    For ``variant='mel'`` pass freq_indices (rows into the merged (f s)
    axis, band-ordered) plus per-band row counts in band_widths (rows*2
    features each... widths are in packed features) and num_bands_per_freq.
    """
    n_fft = cfg.get("stft_n_fft", 2048)
    hop = cfg.get("stft_hop_length", 512)
    win_length = cfg.get("stft_win_length", n_fft)
    normalized = cfg.get("stft_normalized", False)
    heads = cfg.get("heads", 8)
    depth = cfg["depth"]
    t_depth = cfg.get("time_transformer_depth", 2)
    f_depth = cfg.get("freq_transformer_depth", 2)
    l_depth = cfg.get("linear_transformer_depth", 0)
    num_stems = cfg.get("num_stems", 1)
    mask_depth = cfg.get("mask_estimator_depth", 2 if variant == "bs" else 1)
    skip_connection = cfg.get("skip_connection", False)
    norm_output = variant == "mel"  # mel transformers norm their output

    b, ch, length = x.shape
    w = torch.hann_window(win_length)
    spec = torch.stft(x.reshape(-1, length), n_fft, hop, win_length=win_length,
                      window=w, center=True, normalized=normalized,
                      return_complex=True)
    spec = torch.view_as_real(spec)  # (B*ch, F, T, 2)
    fdim, tf = spec.shape[1], spec.shape[2]
    spec = spec.reshape(b, ch, fdim, tf, 2)
    # 'b s f t c -> b (f s) t c'
    stft_repr = spec.permute(0, 2, 1, 3, 4).reshape(b, fdim * ch, tf, 2)

    if variant == "mel":
        sel = stft_repr[:, freq_indices]  # (B, Fsel, T, 2)
        feats = sel.permute(0, 2, 1, 3).reshape(b, tf, -1)
    else:
        feats = stft_repr.permute(0, 2, 1, 3).reshape(b, tf, -1)  # 'b t (f c)'

    # band split
    outs = []
    off = 0
    for i, width in enumerate(band_widths):
        xi = feats[..., off : off + width]
        off += width
        xi = rms_norm(xi, sd[f"band_split.to_features.{i}.0.gamma"])
        outs.append(F.linear(xi, sd[f"band_split.to_features.{i}.1.weight"],
                             sd[f"band_split.to_features.{i}.1.bias"]))
    z = torch.stack(outs, dim=-2)  # (B, T, NB, D)
    nb, dim = z.shape[-2], z.shape[-1]

    tfr = sd["time_rotary_embed.freqs"]
    ffr = sd["freq_rotary_embed.freqs"]
    streams = cfg.get("num_residual_streams", 1)
    value_residual = cfg.get("use_value_residual_learning", False)
    vr_forward = value_residual or experimental or streams > 1

    if streams > 1:
        # expand_stream: repeat 'b ... -> (b s) ...'
        z = z.repeat_interleave(streams, dim=0)
    be = z.shape[0]  # batch after stream expansion

    store = []
    time_v = freq_v = None
    for d in range(depth):
        j = 0
        # reference order (bs_roformer.py:510-524): linear transformer
        # FIRST, then the skip sums
        if l_depth > 0:
            zz = z.reshape(be, tf * nb, dim)
            zz = _transformer(sd, f"layers.{d}.{j}", zz, l_depth, heads,
                              norm_output=norm_output, linear_attn=True)
            z = zz.reshape(be, tf, nb, dim)
            j += 1
        if skip_connection and store:
            z = z + sum(store)
        zz = z.permute(0, 2, 1, 3).reshape(be * nb, tf, dim)
        if vr_forward:
            zz, ntv = _transformer_vr(sd, f"layers.{d}.{j}", zz, t_depth, heads,
                                      tfr, time_v, streams=streams)
            time_v = time_v if time_v is not None else ntv
        else:
            zz = _transformer(sd, f"layers.{d}.{j}", zz, t_depth, heads, tfr,
                              norm_output=norm_output)
        z = zz.reshape(be, nb, tf, dim).permute(0, 2, 1, 3)
        zz = z.reshape(be * tf, nb, dim)
        if vr_forward:
            zz, nfv = _transformer_vr(sd, f"layers.{d}.{j + 1}", zz, f_depth,
                                      heads, ffr, freq_v, streams=streams)
            freq_v = freq_v if freq_v is not None else nfv
        else:
            zz = _transformer(sd, f"layers.{d}.{j + 1}", zz, f_depth, heads, ffr,
                              norm_output=norm_output)
        z = zz.reshape(be, tf, nb, dim)
        if cfg.get("use_fno", False):
            z = _fno(sd, f"layers.{d}.{j + 2}", z)
        if skip_connection:
            store.append(z)

    if streams > 1:
        # reduce_stream: '(b s) ... -> b ...' sum
        z = z.reshape(b, streams, tf, nb, dim).sum(1)

    if variant == "bs":
        z = rms_norm(z, sd["final_norm.gamma"])

    # mask estimators
    masks = []
    for s in range(num_stems):
        outs = []
        for i in range(nb):
            h = z[:, :, i, :]
            # mel MLP convention has one more hidden layer per depth than
            # bs (reference mel_band_roformer.py:271 vs bs_roformer.py:262)
            n_hidden = mask_depth - 1 + (1 if variant == "mel" else 0)
            for li in range(n_hidden):
                h = torch.tanh(F.linear(h, sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.weight"],
                                        sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.bias"]))
            last = 2 * n_hidden
            h = F.linear(h, sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.weight"],
                         sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.bias"])
            h = F.glu(h, dim=-1)
            outs.append(h)
        masks.append(torch.cat(outs, dim=-1))
    masks = torch.stack(masks, dim=1)  # (B, S, T, feat)

    stft_c = torch.complex(stft_repr[..., 0], stft_repr[..., 1])  # (B, (f s), T)
    m = masks.reshape(b, num_stems, tf, -1, 2)
    m = torch.complex(m[..., 0], m[..., 1]).permute(0, 1, 3, 2)  # (B, S, rows|sel, T)

    if variant == "mel":
        scatter_idx = freq_indices.view(1, 1, -1, 1).expand(b, num_stems, -1, tf)
        summed = torch.zeros(b, num_stems, fdim * ch, tf, dtype=stft_c.dtype)
        summed.scatter_add_(2, scatter_idx, m)
        denom = num_bands_per_freq.repeat_interleave(ch).clamp(min=1e-8)
        m = summed / denom.view(1, 1, -1, 1)

    out = stft_c.unsqueeze(1) * m  # (B, S, (f s), T)
    # 'b n (f s) t -> (b n s) f t'
    out = out.reshape(b, num_stems, fdim, ch, tf).permute(0, 1, 3, 2, 4)
    out = out.reshape(-1, fdim, tf)
    wav = torch.istft(out, n_fft, hop, win_length=win_length, window=w,
                      center=True, normalized=normalized, length=length)
    return wav.reshape(b, num_stems, ch, length)
