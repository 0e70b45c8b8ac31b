"""Bandit v1 — multi-mask multi-source band-split RNN (BSRNN, DnR).

Behavioral spec: reference models/bandit/core/model/bsrnn/ (wrapper.py
MultiMaskMultiSourceBandSplitRNNSimple :552-641 and base forward :309-319,
core.py :24-57, bandsplit.py, tfmodel.py, maskestim.py). Like bandit_v2
but with v1's details: channels fold into the batch *inside* the core,
band-split features pack as (reim, bandwidth) — real bins then imag bins —
while masks unpack (bandwidth, reim). Same GLU mask heads and
window-energy-normalized STFT as v2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.models.bandit_v2 import musical_band_specs
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST


def _kwargs(config):
    kw = dict(in_channel=1, stems=["speech", "music", "effects"],
              band_specs="musical", n_bands=64, n_sqm_modules=12, emb_dim=128,
              rnn_dim=256, mlp_dim=512, n_fft=2048, win_length=2048,
              hop_length=512, fs=44100, use_freq_weights=True,
              complex_mask=True)
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    return kw


def _specs(kw):
    assert "musical" in str(kw["band_specs"]), (
        "only the musical band layout is implemented (the registry's bandit "
        "checkpoint uses mus64)")
    return musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config):
    kw = _kwargs(config)
    specs, _ = _specs(kw)
    emb, rnn_dim, mlp = kw["emb_dim"], kw["rnn_dim"], kw["mlp_dim"]
    in_ch = kw["in_channel"]
    keys = iter(jax.random.split(rng, 8 + 2 * len(specs) * (1 + len(kw["stems"]))
                                 + 4 * kw["n_sqm_modules"]))

    def lin(ci, co):
        k1, k2 = jax.random.split(next(keys))
        return {"weight": L.kaiming_uniform(k1, (co, ci), ci),
                "bias": L.kaiming_uniform(k2, (co,), ci)}

    def lstm_dir(d, h):
        k = iter(jax.random.split(next(keys), 4))
        return {"weight_ih": L.kaiming_uniform(next(k), (4 * h, d), h),
                "weight_hh": L.kaiming_uniform(next(k), (4 * h, h), h),
                "bias_ih": L.kaiming_uniform(next(k), (4 * h,), h),
                "bias_hh": L.kaiming_uniform(next(k), (4 * h,), h)}

    band_split = []
    for (s, e) in specs:
        bw = e - s
        band_split.append({
            "norm": {"weight": jnp.ones((in_ch * bw * 2,)),
                     "bias": jnp.zeros((in_ch * bw * 2,))},
            "fc": lin(in_ch * bw * 2, emb),
        })

    seqband = []
    for _ in range(2 * kw["n_sqm_modules"]):
        seqband.append({
            "norm": {"weight": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
            "lstm": {"fwd": lstm_dir(emb, rnn_dim), "bwd": lstm_dir(emb, rnn_dim)},
            "fc": lin(2 * rnn_dim, emb),
        })

    mask_estim = {}
    for stem in kw["stems"]:
        bands = []
        for (s, e) in specs:
            bw = e - s
            bands.append({
                "norm": {"weight": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
                "hidden": lin(emb, mlp),
                "output": lin(mlp, bw * in_ch * 2 * 2),  # Linear + GLU
            })
        mask_estim[stem] = bands

    return {"band_split": band_split, "seqband": seqband, "mask_estim": mask_estim}


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def apply(params, config, x, precision=None):
    """(B, ch, T) -> (B, stems, ch, T)."""
    precision = precision or _HIGHEST
    kw = _kwargs(config)
    specs, freq_weights = _specs(kw)
    n_freq = kw["n_fft"] // 2 + 1
    emb = kw["emb_dim"]
    stems = list(kw["stems"])
    b, ch, t_samples = x.shape

    # stft over channels, then channels fold into the batch (core.py:28)
    window = hann_window(kw["win_length"], dtype=x.dtype)
    scale = 1.0 / jnp.sqrt(jnp.sum(window * window))
    spec = stft_ri(x.reshape(b * ch, t_samples), kw["n_fft"], kw["hop_length"],
                   window, win_length=kw["win_length"], pad_mode="constant") * scale
    tf = spec.shape[-2]

    # band split features: (B', T, reim, n_freq) slices -> (reim*bw) packed
    xr = jnp.transpose(spec, (0, 2, 3, 1))  # (B', T, 2, F)
    zs = []
    for i, (s, e) in enumerate(specs):
        xb = xr[..., s:e].reshape(b * ch, tf, -1)  # (B', T, 2*bw), reim-major
        p = params["band_split"][i]
        xb = L.layer_norm(xb, p["norm"])
        zs.append(L.linear(xb, p["fc"], precision=precision))
    z = jnp.stack(zs, axis=1)  # (B', n_bands, T, emb)

    for p in params["seqband"]:
        z0 = z
        zn = L.layer_norm(z, p["norm"])
        bb, d1, d2, _ = zn.shape
        out = L.bilstm(zn.reshape(bb * d1, d2, emb), p["lstm"], precision=precision)
        out = L.linear(out, p["fc"], precision=precision)
        z = z0 + out.reshape(bb, d1, d2, emb)
        z = jnp.swapaxes(z, 1, 2)

    q = z
    outputs = []
    for stem in stems:
        mask_re = jnp.zeros((b * ch, n_freq, tf), dtype=jnp.float32)
        mask_im = jnp.zeros((b * ch, n_freq, tf), dtype=jnp.float32)
        for i, (s, e) in enumerate(specs):
            bw = e - s
            p = params["mask_estim"][stem][i]
            h = L.layer_norm(q[:, i], p["norm"])
            h = jnp.tanh(L.linear(h, p["hidden"], precision=precision))
            o = L.linear(h, p["output"], precision=precision)  # (B', T, bw*2*2)
            a, g = jnp.split(o, 2, axis=-1)
            o = a * jax.nn.sigmoid(g)  # GLU
            o = o.reshape(b * ch, tf, 1, bw, 2)[:, :, 0]  # (B', T, bw, 2)
            o = jnp.transpose(o, (0, 2, 1, 3))  # (B', bw, T, 2)
            if kw["use_freq_weights"] and freq_weights is not None:
                fw = jnp.asarray(freq_weights[i])[:, None]
                o = o * fw[..., None]
            mask_re = mask_re.at[:, s:e].add(o[..., 0])
            mask_im = mask_im.at[:, s:e].add(o[..., 1])

        est_re = spec[..., 0] * mask_re - spec[..., 1] * mask_im
        est_im = spec[..., 0] * mask_im + spec[..., 1] * mask_re
        est = jnp.stack([est_re, est_im], axis=-1) / scale
        wav = istft_ri(est, kw["n_fft"], kw["hop_length"], window,
                       win_length=kw["win_length"], length=t_samples)
        outputs.append(wav.reshape(b, ch, t_samples))

    return jnp.stack(outputs, axis=1)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    """Key scheme: bsrnn.band_split.norm_fc_modules.{i}.{norm,fc},
    bsrnn.tf_model.seqband.{even}.{norm,rnn,fc},
    bsrnn.mask_estim.{stem}.norm_mlp.{i}.{norm,hidden.0,output.0}."""
    kw = _kwargs(config)
    specs, _ = _specs(kw)
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("._orig_mod", "")
        sd[k] = jnp.asarray(np.asarray(v))
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def wb(prefix):
        return {"weight": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    band_split = [
        {"norm": wb(f"bsrnn.band_split.norm_fc_modules.{i}.norm"),
         "fc": wb(f"bsrnn.band_split.norm_fc_modules.{i}.fc")}
        for i in range(len(specs))
    ]

    seqband = []
    # v1's SeqBandModellingModule is a ModuleList with CONSECUTIVE entries
    # (reference bandit/core/model/bsrnn/tfmodel.py:111-137), unlike v2's
    # Sequential with Transpose placeholders at odd indices — caught by the
    # true-reference oracle (tests/test_reference_bandit_oracles.py)
    for j in range(2 * kw["n_sqm_modules"]):
        p = f"bsrnn.tf_model.seqband.{j}"
        seqband.append({
            "norm": wb(f"{p}.norm"),
            "lstm": {
                d: {wn: take(f"{p}.rnn.{wn}_l0{suf}")
                    for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
                for d, suf in (("fwd", ""), ("bwd", "_reverse"))
            },
            "fc": wb(f"{p}.fc"),
        })

    mask_estim = {}
    for stem in kw["stems"]:
        bands = []
        for i in range(len(specs)):
            p = f"bsrnn.mask_estim.{stem}.norm_mlp.{i}"
            bands.append({
                "norm": wb(f"{p}.norm"),
                "hidden": wb(f"{p}.hidden.0"),
                "output": wb(f"{p}.output.0"),
            })
        mask_estim[stem] = bands

    params = {"band_split": band_split, "seqband": seqband, "mask_estim": mask_estim}
    unused = {k for k in set(sd) - used
              if not k.startswith(("stft.", "istft.", "bsrnn.stft", "bsrnn.istft"))
              and "freq_weights" not in k}
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
