"""Test-only functional torch oracle for the MDX23C architecture.

Executes the TFC-TDF v3 forward pass directly from a torch state_dict with
torch.nn.functional calls, following the architecture specification in
SURVEY.md §2.2 (behavior of reference models/mdx23c_tfc_tdf_v3.py). Used to
validate the JAX implementation and the checkpoint converter end to end on
synthetic weights. Written functionally on purpose — there are no module
classes here, just the math.
"""

import torch
import torch.nn.functional as F


def _norm(x, sd, prefix, norm_type):
    if norm_type == "InstanceNorm":
        return F.instance_norm(
            x, weight=sd[f"{prefix}.weight"], bias=sd[f"{prefix}.bias"]
        )
    if norm_type == "BatchNorm":
        return F.batch_norm(
            x,
            sd[f"{prefix}.running_mean"],
            sd[f"{prefix}.running_var"],
            sd[f"{prefix}.weight"],
            sd[f"{prefix}.bias"],
            training=False,
        )
    if "GroupNorm" in norm_type:
        g = int(norm_type.replace("GroupNorm", ""))
        return F.group_norm(x, g, sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])
    return x


def _act(x, act_type):
    if act_type == "gelu":
        return F.gelu(x)
    if act_type == "relu":
        return F.relu(x)
    return F.elu(x, float(act_type.replace("elu", "") or 1.0))


def _tfc_tdf(x, sd, prefix, n_blocks, norm_type, act_type):
    for i in range(n_blocks):
        p = f"{prefix}.blocks.{i}"
        s = F.conv2d(x, sd[f"{p}.shortcut.weight"])
        x = F.conv2d(_act(_norm(x, sd, f"{p}.tfc1.0", norm_type), act_type),
                     sd[f"{p}.tfc1.2.weight"], padding=1)
        t = F.linear(_act(_norm(x, sd, f"{p}.tdf.0", norm_type), act_type),
                     sd[f"{p}.tdf.2.weight"])
        t = F.linear(_act(_norm(t, sd, f"{p}.tdf.3", norm_type), act_type),
                     sd[f"{p}.tdf.5.weight"])
        x = x + t
        x = F.conv2d(_act(_norm(x, sd, f"{p}.tfc2.0", norm_type), act_type),
                     sd[f"{p}.tfc2.2.weight"], padding=1)
        x = x + s
    return x


@torch.no_grad()
def forward(sd, cfg, x):
    """x: (B, ch, T) torch float32 -> (B, S, ch, T) (or (B, ch, T) if S == 1)."""
    n_fft, hop, dim_f = cfg.audio.n_fft, cfg.audio.hop_length, cfg.audio.dim_f
    k = cfg.model.num_subbands
    n_scales = cfg.model.num_scales
    scale = tuple(cfg.model.scale)
    l = cfg.model.num_blocks_per_scale
    norm_type, act_type = cfg.model.norm, cfg.model.act
    tgt = cfg.training.get("target_instrument", None)
    n_stems = 1 if tgt else len(cfg.training.instruments)

    b, ch, length = x.shape
    w = torch.hann_window(n_fft)

    z = torch.stft(x.reshape(-1, length), n_fft, hop, window=w, center=True,
                   return_complex=True)
    z = torch.view_as_real(z).permute(0, 3, 1, 2)  # (B*ch, 2, F, T)
    z = z.reshape(b, ch * 2, z.shape[-2], z.shape[-1])[:, :, :dim_f, :]

    # subband fold
    _, c, f, t = z.shape
    z = z.reshape(b, c, k, f // k, t).reshape(b, c * k, f // k, t)

    mix = z
    first = z = F.conv2d(z, sd["first_conv.weight"])
    z = z.transpose(-1, -2)

    skips = []
    for i in range(n_scales):
        z = _tfc_tdf(z, sd, f"encoder_blocks.{i}.tfc_tdf", l, norm_type, act_type)
        skips.append(z)
        z = F.conv2d(
            _act(_norm(z, sd, f"encoder_blocks.{i}.downscale.conv.0", norm_type), act_type),
            sd[f"encoder_blocks.{i}.downscale.conv.2.weight"], stride=scale)

    z = _tfc_tdf(z, sd, "bottleneck_block", l, norm_type, act_type)

    for i in range(n_scales):
        z = F.conv_transpose2d(
            _act(_norm(z, sd, f"decoder_blocks.{i}.upscale.conv.0", norm_type), act_type),
            sd[f"decoder_blocks.{i}.upscale.conv.2.weight"], stride=scale)
        z = torch.cat([z, skips.pop()], 1)
        z = _tfc_tdf(z, sd, f"decoder_blocks.{i}.tfc_tdf", l, norm_type, act_type)

    z = z.transpose(-1, -2)
    z = z * first
    z = F.conv2d(torch.cat([mix, z], 1), sd["final_conv.0.weight"])
    z = F.conv2d(_act(z, act_type), sd["final_conv.2.weight"])

    # subband unfold
    _, c, f, t = z.shape
    z = z.reshape(b, c // k, k, f, t).reshape(b, c // k, f * k, t)

    if n_stems > 1:
        z = z.reshape(b, n_stems, -1, z.shape[-2], z.shape[-1])

    # inverse: zero-pad to full spectrum, istft
    batch_dims = z.shape[:-3]
    c, f, t = z.shape[-3:]
    nfreq = n_fft // 2 + 1
    z = torch.cat([z, torch.zeros(*batch_dims, c, nfreq - f, t)], -2)
    z = z.reshape(*batch_dims, c // 2, 2, nfreq, t).reshape(-1, 2, nfreq, t)
    z = z.permute(0, 2, 3, 1)
    z = torch.complex(z[..., 0], z[..., 1])
    wav = torch.istft(z, n_fft, hop, window=w, center=True)
    wav = wav.reshape(*batch_dims, 2, -1)
    return wav
