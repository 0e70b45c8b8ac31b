"""BS-RoFormer / Mel-Band RoFormer end-to-end parity vs the functional torch
oracle, plus converter round-trips, linear-attention and skip-connection
variants."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bs_roformer, mel_band_roformer
from sesa_tpu.ops import bands as B
from tests.oracles import torch_roformer


def bs_model_cfg(**over):
    cfg = dict(
        dim=32,
        depth=2,
        stereo=True,
        num_stems=2,
        time_transformer_depth=1,
        freq_transformer_depth=1,
        linear_transformer_depth=0,
        freqs_per_bands=(2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4, 4, 16, 17),
        dim_head=8,
        heads=4,
        stft_n_fft=128,
        stft_hop_length=32,
        stft_win_length=128,
        mask_estimator_depth=2,
        skip_connection=False,
    )
    cfg.update(over)
    return cfg


def mel_model_cfg(**over):
    cfg = dict(
        dim=32,
        depth=2,
        stereo=True,
        num_stems=1,
        time_transformer_depth=1,
        freq_transformer_depth=1,
        num_bands=8,
        sample_rate=44100,
        dim_head=8,
        heads=4,
        stft_n_fft=128,
        stft_hop_length=32,
        stft_win_length=128,
        mask_estimator_depth=1,
    )
    cfg.update(over)
    return cfg


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def export_state_dict(params, spec, transformer_norm_output, final_norm):
    """Inverse of bs_roformer.convert_from_spec -> torch state_dict."""
    plan = spec.band_plan()
    sd = {}
    for g, ids in enumerate(plan.group_band_ids):
        gp = params["band_split"]["groups"][g]
        for pos, i in enumerate(ids):
            sd[f"band_split.to_features.{i}.0.gamma"] = _t(gp["norm_gamma"][pos])
            sd[f"band_split.to_features.{i}.1.weight"] = _t(gp["weight"][pos]).T.contiguous()
            sd[f"band_split.to_features.{i}.1.bias"] = _t(gp["bias"][pos])

    def put_hc(prefix, hc):
        sd[f"{prefix}.norm.gamma"] = _t(hc["norm_gamma"])
        sd[f"{prefix}.static_alpha"] = _t(hc["static_alpha"])
        sd[f"{prefix}.static_beta"] = _t(hc["static_beta"])
        sd[f"{prefix}.dynamic_alpha_fn"] = _t(hc["dynamic_alpha_fn"])
        sd[f"{prefix}.dynamic_alpha_scale"] = _t(hc["dynamic_alpha_scale"])
        sd[f"{prefix}.dynamic_beta_fn"] = _t(hc["dynamic_beta_fn"])
        sd[f"{prefix}.dynamic_beta_scale"] = _t(hc["dynamic_beta_scale"])

    def put_transformer(prefix, tp, linear_attn=False):
        for i, layer in enumerate(tp["layers"]):
            a, f = layer["attn"], layer["ff"]
            ap = f"{prefix}.layers.{i}.0"
            if "hc" in a:
                put_hc(ap, a["hc"])
                a = a["branch"]
                ap = f"{ap}.branch"
            if linear_attn:
                sd[f"{ap}.norm.gamma"] = _t(a["norm_gamma"])
                sd[f"{ap}.to_qkv.0.weight"] = _t(a["qkv_w"])
                sd[f"{ap}.temperature"] = _t(a["temperature"])
                sd[f"{ap}.to_out.1.weight"] = _t(a["out_w"])
            else:
                sd[f"{ap}.norm.gamma"] = _t(a["norm_gamma"])
                sd[f"{ap}.to_qkv.weight"] = _t(a["qkv_w"])
                sd[f"{ap}.to_gates.weight"] = _t(a["gates_w"])
                sd[f"{ap}.to_gates.bias"] = _t(a["gates_b"])
                sd[f"{ap}.to_out.0.weight"] = _t(a["out_w"])
                if "vr_mix_w" in a:
                    sd[f"{ap}.to_value_residual_mix.weight"] = _t(a["vr_mix_w"])
                    sd[f"{ap}.to_value_residual_mix.bias"] = _t(a["vr_mix_b"])
            fp = f"{prefix}.layers.{i}.1"
            if "hc" in f:
                put_hc(fp, f["hc"])
                f = f["branch"]
                fp = f"{fp}.branch"
            sd[f"{fp}.net.0.gamma"] = _t(f["norm_gamma"])
            sd[f"{fp}.net.1.weight"] = _t(f["lin1_w"])
            sd[f"{fp}.net.1.bias"] = _t(f["lin1_b"])
            sd[f"{fp}.net.4.weight"] = _t(f["lin2_w"])
            sd[f"{fp}.net.4.bias"] = _t(f["lin2_b"])
        if transformer_norm_output:
            sd[f"{prefix}.norm.gamma"] = _t(tp["norm_gamma"])

    for d, layer in enumerate(params["layers"]):
        j = 0
        if "linear" in layer:
            put_transformer(f"layers.{d}.{j}", layer["linear"], linear_attn=True)
            j += 1
        put_transformer(f"layers.{d}.{j}", layer["time"])
        put_transformer(f"layers.{d}.{j + 1}", layer["freq"])
        if "fno" in layer:
            fn = layer["fno"]
            sd[f"layers.{d}.{j + 2}.weight_real"] = _t(fn["w_re"])
            sd[f"layers.{d}.{j + 2}.weight_imag"] = _t(fn["w_im"])
            sd[f"layers.{d}.{j + 2}.bypass.weight"] = _t(fn["bypass_w"]).T.contiguous()
            sd[f"layers.{d}.{j + 2}.bypass.bias"] = _t(fn["bypass_b"])

    for s, me in enumerate(params["mask_estimators"]):
        for li, h in enumerate(me["hidden"]):
            for i in range(plan.num_bands):
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.weight"] = _t(h["weight"][i]).T.contiguous()
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.bias"] = _t(h["bias"][i])
        last = 2 * len(me["hidden"])
        for g, ids in enumerate(plan.group_band_ids):
            gp = me["groups"][g]
            for pos, i in enumerate(ids):
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.weight"] = _t(gp["weight"][pos]).T.contiguous()
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.bias"] = _t(gp["bias"][pos])

    sd["time_rotary_embed.freqs"] = _t(params["rope_time_freqs"])
    sd["freq_rotary_embed.freqs"] = _t(params["rope_freq_freqs"])
    if final_norm:
        sd["final_norm.gamma"] = _t(params["final_norm_gamma"])
    return sd


@pytest.mark.parametrize(
    "over",
    [
        {},
        {"linear_transformer_depth": 1},
        {"skip_connection": True},
        # the COMBINATION pins the reference's ordering (linear transformer
        # first, THEN skip sums — bs_roformer.py:510-524); each flag alone
        # cannot distinguish the two orders
        {"linear_transformer_depth": 1, "skip_connection": True},
        {"stereo": False, "num_stems": 1},
        {"mask_estimator_depth": 1},
    ],
)
def test_bs_roformer_matches_torch_oracle(over):
    mcfg = bs_model_cfg(**over)
    config = ConfigDict({"model": mcfg})
    spec = bs_roformer.spec_from_config(mcfg)
    params = bs_roformer.init(jax.random.PRNGKey(0), config)
    sd = export_state_dict(params, spec, transformer_norm_output=False, final_norm=True)

    ch = 2 if mcfg["stereo"] else 1
    x = np.random.default_rng(0).standard_normal((2, ch, 1280)).astype(np.float32) * 0.1

    widths = [2 * f * ch for f in mcfg["freqs_per_bands"]]
    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x), band_widths=widths,
                                 variant="bs").numpy()
    got = np.asarray(bs_roformer.apply(params, config, jnp.asarray(x)))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_mel_band_roformer_matches_torch_oracle():
    mcfg = mel_model_cfg()
    config = ConfigDict({"model": mcfg})
    spec = mel_band_roformer.spec_from_config(mcfg)
    params = mel_band_roformer.init(jax.random.PRNGKey(1), config)
    sd = export_state_dict(params, spec, transformer_norm_output=True, final_norm=False)

    x = np.random.default_rng(1).standard_normal((2, 2, 1280)).astype(np.float32) * 0.1

    # reconstruct the oracle's band data from the same mel layout
    from sesa_tpu.ops.mel import mel_filter_bank

    fb = mel_filter_bank(mcfg["sample_rate"], mcfg["stft_n_fft"], mcfg["num_bands"])
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    mask = fb > 0
    rows = []
    widths = []
    for bidx in range(mcfg["num_bands"]):
        freqs = np.nonzero(mask[bidx])[0]
        r = (freqs[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)
        rows.append(r)
        widths.append(len(freqs) * 4)
    freq_indices = torch.from_numpy(np.concatenate(rows).astype(np.int64))
    nbpf = torch.from_numpy(mask.sum(0).astype(np.float32))

    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x), band_widths=widths,
                                 freq_indices=freq_indices, num_bands_per_freq=nbpf,
                                 variant="mel").numpy()
    got = np.asarray(mel_band_roformer.apply(params, config, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_bs_roformer_experimental_value_residual():
    """Value-residual variant vs oracle (reference bs_roformer_experimental.py)."""
    from sesa_tpu.models import bs_roformer_experimental as exp

    mcfg = bs_model_cfg(depth=3, use_value_residual_learning=True)
    config = ConfigDict({"model": mcfg})
    spec = bs_roformer.spec_from_config(mcfg)
    assert spec.value_residual
    params = exp.init(jax.random.PRNGKey(5), config)
    # depth>0 layers carry the learned mix, depth 0 does not
    assert "vr_mix_w" not in params["layers"][0]["time"]["layers"][0]["attn"]
    assert "vr_mix_w" in params["layers"][1]["time"]["layers"][0]["attn"]

    sd = export_state_dict(params, spec, transformer_norm_output=False, final_norm=True)
    x = np.random.default_rng(7).standard_normal((1, 2, 1280)).astype(np.float32) * 0.1
    widths = [2 * f * 2 for f in mcfg["freqs_per_bands"]]
    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x), band_widths=widths,
                                 variant="bs").numpy()
    got = np.asarray(exp.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)

    back = exp.convert_torch({k: v.numpy() for k, v in sd.items()}, config)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def _randomize_hc(params, seed):
    """HC params init mostly to zeros/identity; randomize so the dynamic
    alpha/beta paths are actually exercised by parity tests."""
    rng = np.random.default_rng(seed)

    def rand_like(v):
        return jnp.asarray(rng.standard_normal(np.shape(v)).astype(np.float32) * 0.3)

    for layer in params["layers"]:
        for t in ("time", "freq"):
            for lay in layer[t]["layers"]:
                for mod in ("attn", "ff"):
                    lay[mod]["hc"] = {k: rand_like(v)
                                      for k, v in lay[mod]["hc"].items()}
    return params


def test_bs_roformer_experimental_hyper_connections():
    """Hyper-connections (num_residual_streams=4) + value residual vs oracle
    (reference bs_roformer_experimental.py:213-228,558-610)."""
    import dataclasses

    from sesa_tpu.models import bs_roformer_experimental as exp

    mcfg = bs_model_cfg(depth=2, use_value_residual_learning=True,
                        num_residual_streams=4)
    config = ConfigDict({"model": mcfg})
    params = exp.init(jax.random.PRNGKey(5), config)
    lay0 = params["layers"][0]["time"]["layers"][0]
    assert "hc" in lay0["attn"] and "hc" in lay0["ff"]
    params = _randomize_hc(params, seed=11)

    spec = dataclasses.replace(bs_roformer.spec_from_config(mcfg),
                               experimental_forward=True)
    sd = export_state_dict(params, spec, transformer_norm_output=False,
                           final_norm=True)
    x = np.random.default_rng(8).standard_normal((2, 2, 1280)).astype(np.float32) * 0.1
    widths = [2 * f * 2 for f in mcfg["freqs_per_bands"]]
    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x),
                                 band_widths=widths, variant="bs",
                                 experimental=True).numpy()
    got = np.asarray(exp.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)

    back = exp.convert_torch({k: v.numpy() for k, v in sd.items()}, config)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_bs_roformer_experimental_forward_without_vr():
    """The experimental Transformer.forward threads values and drops explicit
    residuals after depth layer 0 even with use_value_residual_learning=False
    (reference bs_roformer_experimental.py:239-258)."""
    from sesa_tpu.models import bs_roformer_experimental as exp

    mcfg = bs_model_cfg(depth=2)
    config = ConfigDict({"model": mcfg})
    params = exp.init(jax.random.PRNGKey(6), config)
    spec = bs_roformer.spec_from_config(mcfg)
    sd = export_state_dict(params, spec, transformer_norm_output=False,
                           final_norm=True)
    x = np.random.default_rng(9).standard_normal((1, 2, 1280)).astype(np.float32) * 0.1
    widths = [2 * f * 2 for f in mcfg["freqs_per_bands"]]
    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x),
                                 band_widths=widths, variant="bs",
                                 experimental=True).numpy()
    got = np.asarray(exp.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)
    # and it differs from the base (always-residual) forward
    base = np.asarray(bs_roformer.apply(params, config, jnp.asarray(x)))
    assert np.abs(base - got).max() > 1e-5


def test_bs_roformer_fno_matches_torch_oracle():
    """The FNO custom variant (5th bs_roformer_custom entry, reference
    model.py:993-1004): spectral conv along time + bypass per depth layer,
    threaded through the experimental forward."""
    from sesa_tpu.models import bs_roformer_custom as custom

    mcfg = bs_model_cfg(depth=2, num_stems=1, use_fno=True, fno_modes=5)
    config = ConfigDict({"model": mcfg})
    params = custom.init(jax.random.PRNGKey(11), config)
    spec = bs_roformer.spec_from_config(mcfg)
    sd = export_state_dict(params, spec, transformer_norm_output=False,
                           final_norm=True)
    x = np.random.default_rng(12).standard_normal((1, 2, 1280)).astype(np.float32) * 0.1
    widths = [2 * f * 2 for f in mcfg["freqs_per_bands"]]
    ref = torch_roformer.forward(sd, mcfg, torch.from_numpy(x),
                                 band_widths=widths, variant="bs",
                                 experimental=True).numpy()
    got = np.asarray(custom.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)

    # converter round-trips the fno params
    back = custom.convert_torch({k: v.numpy() for k, v in sd.items()}, config)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_bs_converter_round_trip():
    mcfg = bs_model_cfg()
    config = ConfigDict({"model": mcfg})
    spec = bs_roformer.spec_from_config(mcfg)
    params = bs_roformer.init(jax.random.PRNGKey(2), config)
    sd = export_state_dict(params, spec, transformer_norm_output=False, final_norm=True)
    back = bs_roformer.convert_torch({k: v.numpy() for k, v in sd.items()}, config)

    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(back)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_band_plan_partition_coverage():
    mcfg = bs_model_cfg()
    spec = bs_roformer.spec_from_config(mcfg)
    plan = spec.band_plan()
    assert plan.num_bands == len(mcfg["freqs_per_bands"])
    np.testing.assert_array_equal(plan.coverage, np.ones(spec.num_features))


def test_experimental_rope_freqs_from_branch_nested_keys():
    """Real num_residual_streams>1 checkpoints carry rotary freqs ONLY at
    layers.{d}.{j}.layers.{i}.0.branch.rotary_embed.freqs (the
    hyper-connections wrapper nests the attention under .branch; reference
    bs_roformer_experimental.py init_hyper_conn(branch=...)) — no legacy
    top-level keys. The converter must find them there (regression: it
    raised KeyError)."""
    import dataclasses

    from sesa_tpu.models import bs_roformer_experimental as exp

    mcfg = bs_model_cfg(depth=2, use_value_residual_learning=True,
                        num_residual_streams=4)
    config = ConfigDict({"model": mcfg})
    params = exp.init(jax.random.PRNGKey(6), config)
    spec = dataclasses.replace(bs_roformer.spec_from_config(mcfg),
                               experimental_forward=True)
    sd = export_state_dict(params, spec, transformer_norm_output=False,
                           final_norm=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    # rewrite to the real checkpoint layout: per-attention nested keys only
    tfr = np.asarray(sd.pop("time_rotary_embed.freqs"))
    ffr = np.asarray(sd.pop("freq_rotary_embed.freqs"))
    for d in range(mcfg["depth"]):
        for i in range(mcfg["time_transformer_depth"]):
            sd[f"layers.{d}.0.layers.{i}.0.branch.rotary_embed.freqs"] = tfr
        for i in range(mcfg["freq_transformer_depth"]):
            sd[f"layers.{d}.1.layers.{i}.0.branch.rotary_embed.freqs"] = ffr

    back = exp.convert_torch(sd, config)
    np.testing.assert_allclose(np.asarray(back["rope_time_freqs"]), tfr)
    np.testing.assert_allclose(np.asarray(back["rope_freq_freqs"]), ffr)
