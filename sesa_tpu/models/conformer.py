"""ConformerMSS — magnitude-STFT conformer with complex masks.

Behavioral spec: reference models/conformer_model.py:7-187 and the
dispatcher wiring (reference utils.py:146-154: stft params come from
``config.stft``). Magnitude STFT → Linear projection of (channels·freq)
frames → lucidrains Conformer stack over time → tanh → Linear to per
source·channel real/imag masks → complex multiply → iSTFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import conformer_core as cc
from sesa_tpu.models.layers import kaiming_uniform
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST


def _kwargs(config):
    model = dict(config.model)
    stft = dict(config.stft)
    kw = dict(in_channels=2, sources=2, freq_bins=2049, embed_dim=512, depth=8,
              dim_head=64, heads=8, ff_mult=4, conv_expansion_factor=2,
              conv_kernel_size=31)
    kw.update({k: v for k, v in model.items() if k in kw})
    kw["n_fft"] = int(stft.get("n_fft", 4096))
    kw["hop_length"] = int(stft.get("hop_length", 1024))
    kw["win_length"] = int(stft.get("win_length", kw["n_fft"]))
    kw["center"] = bool(stft.get("center", True))
    assert kw["freq_bins"] == kw["n_fft"] // 2 + 1
    return kw


def init(rng, config):
    kw = _kwargs(config)
    k1, k2, k3 = jax.random.split(rng, 3)
    fb, ch, emb = kw["freq_bins"], kw["in_channels"], kw["embed_dim"]
    out = kw["sources"] * ch * 2
    return {
        "input_proj": {"weight": kaiming_uniform(k1, (emb, fb * ch), fb * ch),
                       "bias": jnp.zeros((emb,))},
        "conformer": cc.conformer_init(
            k2, emb, kw["depth"], dim_head=kw["dim_head"], heads=kw["heads"],
            ff_mult=kw["ff_mult"], conv_expansion_factor=kw["conv_expansion_factor"],
            conv_kernel_size=kw["conv_kernel_size"]),
        "output_proj": {"weight": kaiming_uniform(k3, (fb * out, emb), emb),
                        "bias": jnp.zeros((fb * out,))},
    }


def apply(params, config, x, precision=None):
    """(B, C, T) -> (B, S, C, T)."""
    precision = precision or _HIGHEST
    kw = _kwargs(config)
    b, ch, t_samples = x.shape
    fb = kw["freq_bins"]
    s_src = kw["sources"]

    window = hann_window(kw["win_length"], dtype=x.dtype)
    spec = stft_ri(x.reshape(b * ch, t_samples), kw["n_fft"], kw["hop_length"],
                   window, win_length=kw["win_length"], center=kw["center"])
    tf = spec.shape[-2]
    spec = spec.reshape(b, ch, fb, tf, 2)
    mag = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)  # (B, C, F, T)

    z = jnp.transpose(mag, (0, 3, 1, 2)).reshape(b, tf, ch * fb)
    z = jnp.einsum("btd,od->bto", z, params["input_proj"]["weight"],
                   precision=precision) + params["input_proj"]["bias"]
    z = cc.conformer_apply(params["conformer"], z, kw["heads"], precision=precision)
    z = jnp.tanh(z)
    z = jnp.einsum("btd,od->bto", z, params["output_proj"]["weight"],
                   precision=precision) + params["output_proj"]["bias"]

    # (B, T, out_masks*2, F) -> (B, 2, S, C, F, T) (reference :68-177)
    out_masks = s_src * ch
    z = z.reshape(b, tf, out_masks * 2, fb)
    z = jnp.transpose(z, (0, 2, 3, 1))  # (B, 2*S*C, F, T)
    z = z.reshape(b, 2, s_src, ch, fb, tf)
    m_re, m_im = z[:, 0], z[:, 1]  # (B, S, C, F, T)

    sr_ = spec[:, None, :, :, :, 0]  # (B, 1, C, F, T)
    si_ = spec[:, None, :, :, :, 1]
    est_re = m_re * sr_ - m_im * si_
    est_im = m_re * si_ + m_im * sr_
    est = jnp.stack([est_re, est_im], axis=-1)  # (B, S, C, F, T, 2)

    wav = istft_ri(est.reshape(b * s_src * ch, fb, tf, 2), kw["n_fft"],
                   kw["hop_length"], window, win_length=kw["win_length"],
                   center=kw["center"], length=t_samples)
    return wav.reshape(b, s_src, ch, t_samples)


def convert_torch(state_dict, config):
    kw = _kwargs(config)
    from sesa_tpu.models.bs_roformer import _make_take

    sd, used, take = _make_take(cc.apply_key_map(state_dict))

    params = {
        "input_proj": {"weight": take("core.input_proj_stft.weight"),
                       "bias": take("core.input_proj_stft.bias")},
        "conformer": cc.convert_conformer(take, "core.model", kw["depth"]),
        "output_proj": {"weight": take("core.output_proj.weight"),
                        "bias": take("core.output_proj.bias")},
    }
    unused = {k for k in set(sd) - used if not k.startswith("window")}
    if unused:
        raise ValueError(
            f"unconsumed checkpoint keys: {sorted(unused)[:8]} ... — this "
            "conformer checkpoint's module layout differs from the assumed "
            "lucidrains reconstruction (frozen in tests/fixtures/layouts/). "
            "See README 'Conformer checkpoint layout recovery' for what to "
            "report and how to supply a key mapping.")
    return params
