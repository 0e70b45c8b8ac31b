"""Test-only functional torch oracle for Bandit v2 (spec: SURVEY.md §2.2,
behavior of reference models/bandit_v2/)."""

import numpy as np
import torch
import torch.nn.functional as F


def _lstm(x, sd, prefix):
    d_in = sd[f"{prefix}.weight_ih_l0"].shape[1]
    hidden = sd[f"{prefix}.weight_hh_l0"].shape[1]
    mod = torch.nn.LSTM(d_in, hidden, num_layers=1, bidirectional=True,
                        batch_first=True)
    with torch.no_grad():
        for suf in ("", "_reverse"):
            for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                getattr(mod, f"{wn}_l0{suf}").copy_(sd[f"{prefix}.{wn}_l0{suf}"])
    return mod(x)[0]


@torch.no_grad()
def forward(sd, kw, specs, freq_weights, x):
    """x (B, ch, T) -> (B, stems, ch, T)."""
    n_fft, hop, win_length = kw["n_fft"], kw["hop_length"], kw["win_length"]
    emb = kw["emb_dim"]
    stems = list(kw["stems"])
    n_freq = n_fft // 2 + 1
    b, ch, t_samples = x.shape

    mono = x.reshape(b * ch, t_samples)
    w = torch.hann_window(win_length)
    scale = 1.0 / w.pow(2).sum().sqrt()
    spec = torch.stft(mono, n_fft, hop, win_length=win_length, window=w,
                      center=True, pad_mode="constant", return_complex=True) * scale
    tf = spec.shape[-1]
    spec = spec.unsqueeze(1)  # (B', 1, F, T)

    # band split
    xp = spec.permute(0, 3, 1, 2)  # (B', T, 1, F)
    zs = []
    for i, (s, e) in enumerate(specs):
        xb = torch.view_as_real(xp[:, :, :, s:e]).reshape(b * ch, tf, -1)
        xb = F.layer_norm(xb, xb.shape[-1:],
                          sd[f"band_split.norm_fc_modules.{i}.combined.0.weight"],
                          sd[f"band_split.norm_fc_modules.{i}.combined.0.bias"])
        zs.append(F.linear(xb, sd[f"band_split.norm_fc_modules.{i}.combined.1.weight"],
                           sd[f"band_split.norm_fc_modules.{i}.combined.1.bias"]))
    z = torch.stack(zs, 1)  # (B', n_bands, T, emb)

    for j in range(0, 4 * kw["n_sqm_modules"], 2):
        p = f"tf_model.seqband.{j}"
        z0 = z.clone()
        zn = F.layer_norm(z, (emb,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
        bb, d1, d2, _ = zn.shape
        out = _lstm(zn.reshape(bb * d1, d2, emb), sd, f"{p}.rnn")
        out = F.linear(out, sd[f"{p}.fc.weight"], sd[f"{p}.fc.bias"])
        z = z0 + out.reshape(bb, d1, d2, emb)
        z = z.transpose(1, 2)

    q = z
    outputs = []
    for stem in stems:
        masks = torch.zeros((b * ch, 1, n_freq, tf), dtype=torch.complex64)
        for i, (s, e) in enumerate(specs):
            bw = e - s
            p = f"mask_estim.{stem}.norm_mlp.{i}.combined"
            qb = q[:, i]
            h = F.layer_norm(qb, (emb,), sd[f"{p}.0.weight"], sd[f"{p}.0.bias"])
            h = torch.tanh(F.linear(h, sd[f"{p}.1.0.weight"], sd[f"{p}.1.0.bias"]))
            o = F.glu(F.linear(h, sd[f"{p}.2.0.weight"], sd[f"{p}.2.0.bias"]), dim=-1)
            mb = torch.view_as_complex(
                o.reshape(b * ch, tf, 1, bw, 2).contiguous())
            mb = mb.permute(0, 2, 3, 1)  # (B', 1, bw, T)
            if kw["use_freq_weights"]:
                mb = mb * torch.from_numpy(freq_weights[i]).unsqueeze(-1)
            masks[:, :, s:e, :] += mb
        est = spec * masks
        wav = torch.istft(est[:, 0] / scale, n_fft, hop, win_length=win_length,
                          window=w, center=True, length=t_samples)
        outputs.append(wav.reshape(b, ch, t_samples))
    return torch.stack(outputs, 1)
