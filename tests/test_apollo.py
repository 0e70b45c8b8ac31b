"""Apollo end-to-end parity vs the functional torch oracle."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import apollo
from tests.oracles import torch_apollo


def tiny_cfg():
    # win=20ms at 16k -> win=320, enc_dim=161, bandwidth=2: 79*2=158, last=3
    return {"sr": 16000, "win": 20, "feature_dim": 16, "layer": 1}


def export_state_dict(params, cfg):
    sd = {}

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    for i in range(79):
        sd[f"BN.{i}.0.weight"] = t(params["bn_norm"][i])
        sd[f"BN.{i}.1.weight"] = t(params["bn_w"][i]).unsqueeze(-1)
        sd[f"BN.{i}.1.bias"] = t(params["bn_b"][i])
        sd[f"output.{i}.0.weight"] = t(params["out_norm"][i])
        sd[f"output.{i}.1.weight"] = t(params["out_w"][i]).unsqueeze(-1)
        sd[f"output.{i}.1.bias"] = t(params["out_b"][i])
    sd["BN.79.0.weight"] = t(params["bn_norm_last"])
    sd["BN.79.1.weight"] = t(params["bn_w_last"]).unsqueeze(-1)
    sd["BN.79.1.bias"] = t(params["bn_b_last"])
    sd["output.79.0.weight"] = t(params["out_norm_last"])
    sd["output.79.1.weight"] = t(params["out_w_last"]).unsqueeze(-1)
    sd["output.79.1.bias"] = t(params["out_b_last"])

    for l, lp in enumerate(params["layers"]):
        bn = f"net.{l}.band_net"
        sd[f"{bn}.input_norm.weight"] = t(lp["band_net"]["input_norm"])
        sd[f"{bn}.weight.weight"] = t(lp["band_net"]["qkv_w"]).unsqueeze(-1)
        sd[f"{bn}.output.weight"] = t(lp["band_net"]["out_w"]).unsqueeze(-1)
        sd[f"{bn}.MLP.0.weight"] = t(lp["band_net"]["mlp_norm"])
        sd[f"{bn}.MLP.1.weight"] = t(lp["band_net"]["mlp_in"]).unsqueeze(-1)
        sd[f"{bn}.MLP_output.weight"] = t(lp["band_net"]["mlp_out"]).unsqueeze(-1)
        for j, blk in enumerate(lp["seq_net"]):
            p = f"net.{l}.seq_net.blocks.{j}"
            sd[f"{p}.conv.0.weight"] = t(blk["dw_w"])
            sd[f"{p}.conv.0.bias"] = t(blk["dw_b"])
            sd[f"{p}.conv.1.weight"] = t(blk["norm"])
            sd[f"{p}.conv.2.weight"] = t(blk["pw1_w"]).unsqueeze(-1)
            sd[f"{p}.conv.2.bias"] = t(blk["pw1_b"])
            sd[f"{p}.conv.4.weight"] = t(blk["pw2_w"]).unsqueeze(-1)
            sd[f"{p}.conv.4.bias"] = t(blk["pw2_b"])
    return sd


def test_apollo_matches_torch_oracle():
    cfg = tiny_cfg()
    config = ConfigDict({"model": cfg})
    params = apollo.init(jax.random.PRNGKey(0), config)
    sd = export_state_dict(params, cfg)

    x = np.random.default_rng(0).standard_normal((1, 2, 4800)).astype(np.float32) * 0.1
    ref = torch_apollo.forward(sd, cfg, torch.from_numpy(x)).numpy()
    got = np.asarray(apollo.apply(params, config, jnp.asarray(x)))
    assert got.shape == (1, 1, 2, 4800)
    np.testing.assert_allclose(got[:, 0], ref, atol=5e-4, rtol=1e-3)


def test_apollo_converter_round_trip():
    cfg = tiny_cfg()
    config = ConfigDict({"model": cfg})
    params = apollo.init(jax.random.PRNGKey(1), config)
    sd = {k: v.numpy() for k, v in export_state_dict(params, cfg).items()}
    back = apollo.convert_torch(sd, config)
    l1, l2 = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
