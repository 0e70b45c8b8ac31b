"""Parity vs the reference's OWN scnet_unofficial and apollo modules.

Same refstub approach as the roformer/bandit true-reference oracles
(tests/refstubs/README.md): scnet_unofficial needs only the beartype shim
(+einops, available), apollo (look2hear) imports pure torch. Reference
random init -> state_dict -> our convert_torch -> JAX forward must match
the reference torch forward.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ml_collections import ConfigDict

REFERENCE_ROOT = "/root/reference"
REFSTUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refstubs")


@pytest.fixture(scope="module")
def ref():
    sys.dont_write_bytecode = True
    for p in (REFSTUBS, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    mods = types.SimpleNamespace()
    mods.scnet_unofficial = importlib.import_module(
        "models.scnet_unofficial.scnet")
    mods.apollo = importlib.import_module("models.look2hear.models.apollo")
    return mods


def _sd_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_scnet_unofficial_vs_real_reference(ref):
    from sesa_tpu.models import scnet_unofficial

    kw = dict(n_fft=256, dims=[4, 6, 8], bandsplit_ratios=[0.175, 0.392, 0.433],
              downsample_strides=[1, 4, 16], n_conv_modules=[1, 1, 1],
              n_rnn_layers=2, rnn_hidden_dim=8, n_sources=2,
              hop_length=64, win_length=256, stft_normalized=False)
    torch.manual_seed(0)
    model = ref.scnet_unofficial.SCNet(**kw)
    model.eval()

    config = ConfigDict({"model": dict(kw)})
    params = scnet_unofficial.convert_torch(_sd_np(model), config)

    x = np.random.default_rng(0).standard_normal((2, 2, 8192)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()
    got = np.asarray(scnet_unofficial.apply(params, config, jnp.asarray(x)))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    assert np.isfinite(ref_out).all()
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=1e-3)


def test_apollo_vs_real_reference(ref):
    from sesa_tpu.models import apollo

    cfg = {"sr": 16000, "win": 20, "feature_dim": 16, "layer": 1}
    torch.manual_seed(1)
    model = ref.apollo.Apollo(**cfg)
    model.eval()

    config = ConfigDict({"model": dict(cfg)})
    params = apollo.convert_torch(_sd_np(model), config)

    x = np.random.default_rng(1).standard_normal((2, 2, 6400)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()
    got = np.asarray(apollo.apply(params, config, jnp.asarray(x)))
    if got.ndim == ref_out.ndim + 1 and got.shape[1] == 1:
        got = got[:, 0]  # reference returns (B, ch, T) with no stem axis
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    assert np.isfinite(ref_out).all()
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=1e-3)
