"""Bandit v1 parity vs a functional torch oracle (reusing the v2 oracle's
LSTM helper) + converter round trip."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bandit as bandit_v1
from sesa_tpu.models.bandit_v2 import musical_band_specs
from tests.oracles.torch_bandit_v2 import _lstm


def tiny_config():
    return ConfigDict({"model": dict(
        in_channel=1, stems=["speech", "music"], band_specs="musical",
        n_bands=6, n_sqm_modules=1, emb_dim=16, rnn_dim=16, mlp_dim=24,
        n_fft=256, win_length=256, hop_length=64, fs=8000,
        use_freq_weights=True,
    )})


def export_state_dict(params, kw, specs):
    sd = {}

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    def put(prefix, p):
        sd[f"{prefix}.weight"] = t(p["weight"])
        sd[f"{prefix}.bias"] = t(p["bias"])

    for i, bp in enumerate(params["band_split"]):
        put(f"bsrnn.band_split.norm_fc_modules.{i}.norm", bp["norm"])
        put(f"bsrnn.band_split.norm_fc_modules.{i}.fc", bp["fc"])
    for idx, p in enumerate(params["seqband"]):
        # v1's ModuleList has CONSECUTIVE entries (no Transpose placeholders
        # like v2) — real-checkpoint layout, tests/test_reference_bandit_oracles
        j = idx
        put(f"bsrnn.tf_model.seqband.{j}.norm", p["norm"])
        put(f"bsrnn.tf_model.seqband.{j}.fc", p["fc"])
        for d, suf in (("fwd", ""), ("bwd", "_reverse")):
            for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                sd[f"bsrnn.tf_model.seqband.{j}.rnn.{wn}_l0{suf}"] = t(p["lstm"][d][wn])
    for stem, bands in params["mask_estim"].items():
        for i, bp in enumerate(bands):
            p = f"bsrnn.mask_estim.{stem}.norm_mlp.{i}"
            put(f"{p}.norm", bp["norm"])
            put(f"{p}.hidden.0", bp["hidden"])
            put(f"{p}.output.0", bp["output"])
    return sd


@torch.no_grad()
def oracle_forward(sd, kw, specs, freq_weights, x):
    """v1 forward per reference core.py:24-57 and base forward :309-319."""
    n_fft, hop, win_length = kw["n_fft"], kw["hop_length"], kw["win_length"]
    emb = kw["emb_dim"]
    b, ch, t_samples = x.shape
    n_freq = n_fft // 2 + 1

    w = torch.hann_window(win_length)
    scale = 1.0 / w.pow(2).sum().sqrt()
    spec = torch.stft(x.reshape(b * ch, t_samples), n_fft, hop,
                      win_length=win_length, window=w, center=True,
                      pad_mode="constant", return_complex=True) * scale
    tf = spec.shape[-1]

    # band split with (reim, bandwidth) packing (bandsplit.py:120-134)
    xr = torch.view_as_real(spec.unsqueeze(1))  # (B', 1, F, T, 2)
    xr = xr.permute(0, 3, 1, 4, 2)  # (B', T, 1, 2, F)
    zs = []
    for i, (s, e) in enumerate(specs):
        xb = xr[..., s:e].reshape(b * ch, tf, 1, -1).reshape(b * ch, tf, -1)
        xb = F.layer_norm(xb, xb.shape[-1:],
                          sd[f"bsrnn.band_split.norm_fc_modules.{i}.norm.weight"],
                          sd[f"bsrnn.band_split.norm_fc_modules.{i}.norm.bias"])
        zs.append(F.linear(xb, sd[f"bsrnn.band_split.norm_fc_modules.{i}.fc.weight"],
                           sd[f"bsrnn.band_split.norm_fc_modules.{i}.fc.bias"]))
    z = torch.stack(zs, 1)

    for j in range(2 * kw["n_sqm_modules"]):
        p = f"bsrnn.tf_model.seqband.{j}"
        z0 = z.clone()
        zn = F.layer_norm(z, (emb,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
        bb, d1, d2, _ = zn.shape
        out = _lstm(zn.reshape(bb * d1, d2, emb), sd, f"{p}.rnn")
        out = F.linear(out, sd[f"{p}.fc.weight"], sd[f"{p}.fc.bias"])
        z = (z0 + out.reshape(bb, d1, d2, emb)).transpose(1, 2)

    q = z
    outs = []
    for stem in kw["stems"]:
        masks = torch.zeros((b * ch, n_freq, tf), dtype=torch.complex64)
        for i, (s, e) in enumerate(specs):
            bw = e - s
            p = f"bsrnn.mask_estim.{stem}.norm_mlp.{i}"
            h = F.layer_norm(q[:, i], (emb,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
            h = torch.tanh(F.linear(h, sd[f"{p}.hidden.0.weight"], sd[f"{p}.hidden.0.bias"]))
            o = F.glu(F.linear(h, sd[f"{p}.output.0.weight"], sd[f"{p}.output.0.bias"]), -1)
            mb = torch.view_as_complex(o.reshape(b * ch, tf, 1, bw, 2).contiguous())
            mb = mb.permute(0, 2, 3, 1)[:, 0]  # (B', bw, T)
            mb = mb * torch.from_numpy(freq_weights[i]).unsqueeze(-1)
            masks[:, s:e, :] += mb
        est = spec * masks / scale
        wav = torch.istft(est, n_fft, hop, win_length=win_length, window=w,
                          center=True, length=t_samples)
        outs.append(wav.reshape(b, ch, t_samples))
    return torch.stack(outs, 1)


def test_bandit_v1_matches_oracle():
    config = tiny_config()
    kw = bandit_v1._kwargs(config)
    specs, freq_weights = musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    params = bandit_v1.init(jax.random.PRNGKey(0), config)
    sd = export_state_dict(params, kw, specs)

    x = np.random.default_rng(0).standard_normal((1, 2, 4096)).astype(np.float32) * 0.1
    ref = oracle_forward(sd, kw, specs, freq_weights, torch.from_numpy(x)).numpy()
    got = np.asarray(bandit_v1.apply(params, config, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_bandit_v1_converter_round_trip():
    config = tiny_config()
    kw = bandit_v1._kwargs(config)
    specs, _ = musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    params = bandit_v1.init(jax.random.PRNGKey(1), config)
    sd = {k: v.numpy() for k, v in export_state_dict(params, kw, specs).items()}
    back = bandit_v1.convert_torch(sd, config)
    l1, l2 = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
