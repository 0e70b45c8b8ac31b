"""SCNet end-to-end parity vs the functional torch oracle + primitive checks
(BiLSTM vs torch.nn.LSTM, general conv_transpose2d vs torch)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import layers as L
from sesa_tpu.models import scnet


def tiny_kwargs():
    return dict(
        sources=["drums", "bass", "other", "vocals"],
        audio_channels=2,
        dims=[4, 8, 12, 16],
        nfft=512,
        hop_size=128,
        win_size=512,
        normalized=True,
        band_SR=[0.175, 0.392, 0.433],
        band_stride=[1, 4, 16],
        band_kernel=[3, 4, 16],
        conv_depths=[2, 1, 1],
        compress=4,
        conv_kernel=3,
        num_dplayer=2,
        expand=1,
    )


def export_state_dict(params, kw):
    """Inverse of scnet.convert_torch."""
    sd = {}

    def put(prefix, p):
        for name in ("weight", "bias"):
            sd[f"{prefix}.{name}"] = torch.from_numpy(np.asarray(p[name]).copy())

    for i, blk in enumerate(params["encoder"]):
        for bi in range(3):
            put(f"encoder.{i}.SDlayer.convs.{bi}", blk["sd_convs"][bi])
            for d, cm in enumerate(blk["conv_modules"][bi]):
                p = f"encoder.{i}.conv_modules.{bi}.layers.{d}"
                put(f"{p}.0", cm["norm1"])
                put(f"{p}.1", cm["conv_in"])
                put(f"{p}.3", cm["conv_dw"])
                put(f"{p}.4", cm["norm2"])
                put(f"{p}.6", cm["conv_pw"])
        put(f"encoder.{i}.globalconv", blk["global_conv"])

    for i, layer in enumerate(params["separation"]):
        if "freq" not in layer:  # tran layers are exported separately
            continue
        p = f"separation_net.dp_modules.{i}"
        for j, name in enumerate(("freq", "time")):
            put(f"{p}.norm_layers.{j}", layer[name]["norm"])
            put(f"{p}.linear_layers.{j}", layer[name]["linear"])
            for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                lp = layer[name]["lstm"][direction]
                for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    sd[f"{p}.lstm_layers.{j}.{wn}_l0{suffix}"] = torch.from_numpy(
                        np.asarray(lp[wn]).copy()
                    )

    for i, blk in enumerate(params["decoder"]):
        put(f"decoder.{i}.0.conv", blk["fusion_conv"])
        for bi in range(3):
            put(f"decoder.{i}.1.convtrs.{bi}", blk["su_convs"][bi])
    return sd


def test_bilstm_matches_torch():
    rng = np.random.default_rng(0)
    d, h, b, t = 12, 12, 3, 17
    mk = lambda *shape: rng.standard_normal(shape).astype(np.float32) * 0.3
    params = {
        dirname: {
            "weight_ih": jnp.asarray(mk(4 * h, d)),
            "weight_hh": jnp.asarray(mk(4 * h, h)),
            "bias_ih": jnp.asarray(mk(4 * h)),
            "bias_hh": jnp.asarray(mk(4 * h)),
        }
        for dirname in ("fwd", "bwd")
    }
    x = mk(b, t, d)

    mod = torch.nn.LSTM(d, h, num_layers=1, bidirectional=True, batch_first=True)
    with torch.no_grad():
        for tname, direction in (("", "fwd"), ("_reverse", "bwd")):
            for wn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                getattr(mod, f"{wn}_l0{tname}").copy_(
                    torch.from_numpy(np.asarray(params[direction][wn]))
                )
    ref, _ = mod(torch.from_numpy(x))
    got = np.asarray(L.bilstm(jnp.asarray(x), params))
    np.testing.assert_allclose(got, ref.detach().numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("stride,kernel", [(1, 3), (4, 4), (16, 16), (2, 5)])
def test_conv_transpose2d_matches_torch(stride, kernel):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 11, 7)).astype(np.float32)
    w = rng.standard_normal((6, 4, kernel, 1)).astype(np.float32) * 0.2
    bias = rng.standard_normal(4).astype(np.float32)
    ref = torch.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
        stride=(stride, 1)).numpy()
    got = np.asarray(L.conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(bias), stride=(stride, 1)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_scnet_matches_torch_oracle():
    from tests.oracles import torch_scnet

    kw = tiny_kwargs()
    config = ConfigDict({"model": kw})
    params = scnet.init(jax.random.PRNGKey(0), config)
    sd = export_state_dict(params, kw)

    x = np.random.default_rng(0).standard_normal((1, 2, 8000)).astype(np.float32) * 0.1
    ref = torch_scnet.forward(sd, kw, torch.from_numpy(x)).numpy()
    got = np.asarray(scnet.apply(params, config, jnp.asarray(x)))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_scnet_tran_forward_and_round_trip():
    from sesa_tpu.models import scnet_tran

    kw = tiny_kwargs()
    kw.update(tran_rotary_embedding_dim=8, tran_depth=1, tran_heads=2,
              tran_dim_head=8)
    config = ConfigDict({"model": kw})
    params = scnet_tran.init(jax.random.PRNGKey(3), config)
    x = np.random.default_rng(4).standard_normal((1, 2, 6000)).astype(np.float32) * 0.1
    out = scnet_tran.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, 6000)
    assert np.isfinite(np.asarray(out)).all()


def test_scnet_masked_forward():
    from sesa_tpu.models import scnet_masked

    config = ConfigDict({"model": tiny_kwargs()})
    params = scnet_masked.init(jax.random.PRNGKey(5), config)
    assert "pos_embed_f" in params and "mask_conv1" in params
    x = np.random.default_rng(6).standard_normal((1, 2, 6000)).astype(np.float32) * 0.1
    out = scnet_masked.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 4, 2, 6000)
    assert np.isfinite(np.asarray(out)).all()


def test_scnet_converter_round_trip():
    kw = tiny_kwargs()
    config = ConfigDict({"model": kw})
    params = scnet.init(jax.random.PRNGKey(1), config)
    sd = export_state_dict(params, kw)
    back = scnet.convert_torch({k: v.numpy() for k, v in sd.items()}, config)
    l1, l2 = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def export_state_dict_tran(params, kw):
    """Inverse of scnet.convert_torch(variant='tran'), including the
    per-attention-layer rotary_embed.freqs copies real checkpoints carry."""
    sd = dict(export_state_dict(params, kw))  # encoder/decoder are shared
    # drop the lstm separation keys the shared exporter produced
    sd = {k: v for k, v in sd.items() if ".lstm_layers." not in k
          and ".linear_layers." not in k
          and not (".norm_layers." in k and "dp_modules" in k)}

    def put_t(prefix, tr, depth, freqs):
        for j in range(depth):
            a, f = f"{prefix}.layers.{j}.0", f"{prefix}.layers.{j}.1"
            attn, ff = tr["layers"][j]["attn"], tr["layers"][j]["ff"]
            sd[f"{a}.norm.gamma"] = torch.from_numpy(np.asarray(attn["norm_gamma"]))
            sd[f"{a}.to_qkv.weight"] = torch.from_numpy(np.asarray(attn["qkv_w"]))
            sd[f"{a}.to_gates.weight"] = torch.from_numpy(np.asarray(attn["gates_w"]))
            sd[f"{a}.to_gates.bias"] = torch.from_numpy(np.asarray(attn["gates_b"]))
            sd[f"{a}.to_out.0.weight"] = torch.from_numpy(np.asarray(attn["out_w"]))
            sd[f"{a}.rotary_embed.freqs"] = freqs
            sd[f"{f}.net.0.gamma"] = torch.from_numpy(np.asarray(ff["norm_gamma"]))
            sd[f"{f}.net.1.weight"] = torch.from_numpy(np.asarray(ff["lin1_w"]))
            sd[f"{f}.net.1.bias"] = torch.from_numpy(np.asarray(ff["lin1_b"]))
            sd[f"{f}.net.4.weight"] = torch.from_numpy(np.asarray(ff["lin2_w"]))
            sd[f"{f}.net.4.bias"] = torch.from_numpy(np.asarray(ff["lin2_b"]))
        sd[f"{prefix}.norm.gamma"] = torch.from_numpy(
            np.asarray(tr["norm_gamma"]))

    tfreqs = torch.from_numpy(np.asarray(params["rope_time_freqs"]))
    ffreqs = torch.from_numpy(np.asarray(params["rope_freq_freqs"]))
    for i, layer in enumerate(params["separation"]):
        p = f"separation_net.dp_modules.{i}"
        for name in ("weight", "bias"):
            sd[f"{p}.norm_layers.0.{name}"] = torch.from_numpy(
                np.asarray(layer["freq_norm"][name]))
            sd[f"{p}.norm_layers.1.{name}"] = torch.from_numpy(
                np.asarray(layer["time_norm"][name]))
        put_t(f"{p}.freq_layer", layer["freq_tran"], kw["tran_depth"], ffreqs)
        put_t(f"{p}.time_layer", layer["time_tran"], kw["tran_depth"], tfreqs)
    sd["first_conv.weight"] = torch.from_numpy(np.asarray(params["first_conv"]))
    return sd


def tiny_tran_kwargs():
    kw = tiny_kwargs()
    kw.update(tran_rotary_embedding_dim=8, tran_depth=1, tran_heads=2,
              tran_dim_head=8, tran_attn_dropout=0.0, tran_ff_dropout=0.0,
              tran_flash_attn=False)
    return kw


def test_scnet_tran_matches_torch_oracle():
    from tests.oracles import torch_scnet
    from sesa_tpu.models import scnet_tran

    kw = tiny_tran_kwargs()
    config = ConfigDict({"model": kw})
    params = scnet_tran.init(jax.random.PRNGKey(5), config)
    sd = export_state_dict_tran(params, kw)
    x = np.random.default_rng(6).standard_normal((1, 2, 6000)).astype(np.float32) * 0.1
    ref = torch_scnet.forward(sd, kw, torch.from_numpy(x), variant="tran").numpy()
    out = np.asarray(scnet_tran.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=4e-4)


def test_scnet_tran_converter_round_trip():
    from sesa_tpu.models import scnet_tran

    kw = tiny_tran_kwargs()
    config = ConfigDict({"model": kw})
    params = scnet_tran.init(jax.random.PRNGKey(7), config)
    sd = export_state_dict_tran(params, kw)
    conv = scnet.convert_torch(sd, config, variant="tran")
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(conv)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scnet_masked_matches_torch_oracle():
    from tests.oracles import torch_scnet
    from sesa_tpu.models import scnet_masked

    kw = tiny_kwargs()
    config = ConfigDict({"model": kw})
    params = scnet_masked.init(jax.random.PRNGKey(9), config)
    sd = export_state_dict(params, kw)
    sd["pos_embed_f"] = torch.from_numpy(np.asarray(params["pos_embed_f"]).copy())
    sd["mask_layer.0.weight"] = torch.from_numpy(
        np.asarray(params["mask_conv1"]["weight"]).copy())
    sd["mask_layer.0.bias"] = torch.from_numpy(
        np.asarray(params["mask_conv1"]["bias"]).copy())
    sd["mask_layer.2.weight"] = torch.from_numpy(
        np.asarray(params["mask_conv2"]["weight"]).copy())
    sd["mask_layer.2.bias"] = torch.from_numpy(
        np.asarray(params["mask_conv2"]["bias"]).copy())

    x = np.random.default_rng(10).standard_normal((1, 2, 6000)).astype(np.float32) * 0.1
    ref = torch_scnet.forward(sd, kw, torch.from_numpy(x), variant="masked").numpy()
    got = np.asarray(scnet_masked.apply(params, config, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=4e-4)

    conv = scnet.convert_torch(sd, config, variant="masked")
    flat_a, flat_b = jax.tree.leaves(params), jax.tree.leaves(conv)
    assert len(flat_a) == len(flat_b)
    for a, b2 in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2))
