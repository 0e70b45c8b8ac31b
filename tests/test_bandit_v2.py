"""Bandit v2 parity vs the functional torch oracle + converter round trip."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bandit_v2


def tiny_config():
    return ConfigDict({"kwargs": dict(
        in_channels=1, stems=["speech", "music"], n_bands=6, n_sqm_modules=1,
        emb_dim=16, rnn_dim=16, mlp_dim=24, n_fft=256, win_length=256,
        hop_length=64, fs=8000, use_freq_weights=True, complex_mask=True,
    ), "model": {}})


def export_state_dict(params, kw, specs):
    sd = {}

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    def put(prefix, p):
        sd[f"{prefix}.weight"] = t(p["weight"])
        sd[f"{prefix}.bias"] = t(p["bias"])

    for i, bp in enumerate(params["band_split"]):
        put(f"band_split.norm_fc_modules.{i}.combined.0", bp["norm"])
        put(f"band_split.norm_fc_modules.{i}.combined.1", bp["fc"])

    for idx, p in enumerate(params["seqband"]):
        j = idx * 2
        put(f"tf_model.seqband.{j}.norm", p["norm"])
        put(f"tf_model.seqband.{j}.fc", p["fc"])
        for direction, suf in (("fwd", ""), ("bwd", "_reverse")):
            for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                sd[f"tf_model.seqband.{j}.rnn.{wn}_l0{suf}"] = t(p["lstm"][direction][wn])

    for stem, bands in params["mask_estim"].items():
        for i, bp in enumerate(bands):
            p = f"mask_estim.{stem}.norm_mlp.{i}.combined"
            put(f"{p}.0", bp["norm"])
            put(f"{p}.1.0", bp["hidden"])
            put(f"{p}.2.0", bp["output"])
    return sd


def test_bandit_v2_matches_torch_oracle():
    from tests.oracles import torch_bandit_v2

    config = tiny_config()
    kw = bandit_v2._kwargs(config)
    specs, freq_weights = bandit_v2.musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    params = bandit_v2.init(jax.random.PRNGKey(0), config)
    sd = export_state_dict(params, kw, specs)

    x = np.random.default_rng(0).standard_normal((1, 2, 4096)).astype(np.float32) * 0.1
    ref = torch_bandit_v2.forward(sd, kw, specs, freq_weights, torch.from_numpy(x)).numpy()
    got = np.asarray(bandit_v2.apply(params, config, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_bandit_v2_converter_round_trip():
    config = tiny_config()
    kw = bandit_v2._kwargs(config)
    specs, _ = bandit_v2.musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    params = bandit_v2.init(jax.random.PRNGKey(1), config)
    sd = {k: v.numpy() for k, v in export_state_dict(params, kw, specs).items()}
    back = bandit_v2.convert_torch(sd, config)
    l1, l2 = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_band_specs_cover_spectrum():
    specs, fw = bandit_v2.musical_band_specs(2048, 44100, 64)
    n_freq = 1025
    covered = np.zeros(n_freq, dtype=bool)
    for s, e in specs:
        covered[s:e] = True
    assert covered.all()
    assert len(specs) == len(fw)
