"""MDX23C end-to-end parity: random weights exported to a torch state_dict,
forwarded through the functional torch oracle and through the JAX model +
converter — outputs must match within float tolerance (the benchmark_pytorch
test-mode pattern, reference benchmark_pytorch.py:156-242)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import mdx23c
from tests.oracles import torch_mdx23c


def tiny_config(norm="InstanceNorm", act="gelu", target=None, k=2):
    return ConfigDict(
        {
            "audio": {
                "n_fft": 512,
                "hop_length": 128,
                "dim_f": 256,
                "num_channels": 2,
                "chunk_size": 8064,
                "sample_rate": 44100,
            },
            "model": {
                "num_subbands": k,
                "num_scales": 2,
                "scale": [2, 2],
                "num_blocks_per_scale": 1,
                "num_channels": 8,
                "growth": 4,
                "bottleneck_factor": 2,
                "norm": norm,
                "act": act,
            },
            "training": {
                "instruments": ["vocals", "other"],
                "target_instrument": target,
            },
            "inference": {"num_overlap": 2, "batch_size": 2},
        }
    )


def export_torch_state_dict(params, config):
    """Inverse of mdx23c.convert_torch: param pytree -> torch state_dict."""
    norm_type = config.model.norm
    sd = {}

    def put_norm(prefix, p):
        for name, v in p.items():
            sd[f"{prefix}.{name}"] = torch.from_numpy(np.asarray(v))

    def put_tfc_tdf(prefix, blocks):
        for i, b in enumerate(blocks):
            p = f"{prefix}.blocks.{i}"
            put_norm(f"{p}.tfc1.0", b["tfc1_norm"])
            sd[f"{p}.tfc1.2.weight"] = torch.from_numpy(np.asarray(b["tfc1_conv"]))
            put_norm(f"{p}.tdf.0", b["tdf_norm1"])
            sd[f"{p}.tdf.2.weight"] = torch.from_numpy(np.asarray(b["tdf_lin1"]["weight"]))
            put_norm(f"{p}.tdf.3", b["tdf_norm2"])
            sd[f"{p}.tdf.5.weight"] = torch.from_numpy(np.asarray(b["tdf_lin2"]["weight"]))
            put_norm(f"{p}.tfc2.0", b["tfc2_norm"])
            sd[f"{p}.tfc2.2.weight"] = torch.from_numpy(np.asarray(b["tfc2_conv"]))
            sd[f"{p}.shortcut.weight"] = torch.from_numpy(np.asarray(b["shortcut"]))

    sd["first_conv.weight"] = torch.from_numpy(np.asarray(params["first_conv"]))
    for i, b in enumerate(params["encoder"]):
        put_tfc_tdf(f"encoder_blocks.{i}.tfc_tdf", b["tfc_tdf"])
        put_norm(f"encoder_blocks.{i}.downscale.conv.0", b["down_norm"])
        sd[f"encoder_blocks.{i}.downscale.conv.2.weight"] = torch.from_numpy(
            np.asarray(b["down_conv"])
        )
    put_tfc_tdf("bottleneck_block", params["bottleneck"])
    for i, b in enumerate(params["decoder"]):
        put_norm(f"decoder_blocks.{i}.upscale.conv.0", b["up_norm"])
        sd[f"decoder_blocks.{i}.upscale.conv.2.weight"] = torch.from_numpy(
            np.asarray(b["up_conv"])
        )
        put_tfc_tdf(f"decoder_blocks.{i}.tfc_tdf", b["tfc_tdf"])
    sd["final_conv.0.weight"] = torch.from_numpy(np.asarray(params["final_conv1"]))
    sd["final_conv.2.weight"] = torch.from_numpy(np.asarray(params["final_conv2"]))
    return sd


@pytest.mark.parametrize("norm,act", [("InstanceNorm", "gelu"), ("BatchNorm", "relu")])
def test_forward_matches_torch_oracle(norm, act):
    config = tiny_config(norm=norm, act=act)
    params = mdx23c.init(jax.random.PRNGKey(0), config)
    sd = export_torch_state_dict(params, config)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 8064)).astype(np.float32) * 0.1

    ref = torch_mdx23c.forward(sd, config, torch.from_numpy(x)).numpy()
    got = np.asarray(mdx23c.apply(params, config, jnp.asarray(x)))

    assert got.shape[0] == ref.shape[0]
    # torch.istft without length returns hop*(frames-1); ours pads back to T
    tmin = min(got.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(
        got[..., :tmin], ref[..., :tmin], atol=2e-4, rtol=1e-3
    )


def test_converter_round_trip():
    config = tiny_config()
    params = mdx23c.init(jax.random.PRNGKey(1), config)
    sd = export_torch_state_dict(params, config)
    back = mdx23c.convert_torch({k: v.numpy() for k, v in sd.items()}, config)

    flat1, _ = jax.tree.flatten(params)
    flat2, _ = jax.tree.flatten(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_target_instrument_single_stem():
    config = tiny_config(target="vocals")
    params = mdx23c.init(jax.random.PRNGKey(2), config)
    x = jnp.zeros((1, 2, 8064))
    out = mdx23c.apply(params, config, x)
    assert out.shape == (1, 1, 2, 8064)


def test_jit_and_demix_integration():
    from sesa_tpu.runtime import DemixSpec, demix

    config = tiny_config()
    params = mdx23c.init(jax.random.PRNGKey(3), config)
    apply = jax.tree_util.Partial(lambda p, c: mdx23c.apply(p, config, c))
    mix = np.random.default_rng(1).standard_normal((2, 20000)).astype(np.float32)
    spec = DemixSpec(chunk_size=8064, num_overlap=2, batch_size=2, num_stems=2)
    stems = demix(apply, params, mix, spec)
    assert stems.shape == (2, 2, 20000)
    assert np.isfinite(stems).all()
