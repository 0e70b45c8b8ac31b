"""Parity vs the reference's OWN torch modules (not re-implementations).

VERDICT r1 noted the hand-written oracles in tests/oracles/ could share a
misreading with the JAX port. The reference files that import only torch
(+einops) are imported here directly from /root/reference and used as
ground truth: models/mdx23c_tfc_tdf_v3.py, models/mdx23c_tfc_tdf_v3_with_STHT.py,
models/scnet/scnet.py (+separation.py), models/scnet/scnet_masked.py, and
models/ts_bs_mamba2.py (whose mamba_ssm import falls back to the pure-torch
ex_bi_mamba2.py). Random torch init -> state_dict -> our converter -> JAX
forward must match the torch forward within float tolerance.

The roformer/conformer families need packages unavailable offline
(beartype, rotary_embedding_torch, hyper_connections, conformer) and stay
covered by the hand-written oracles.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's directly-importable model modules."""
    sys.dont_write_bytecode = True  # /root/reference is read-only
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # models/mdx23c_tfc_tdf_v3.py does `from utils import
    # prefer_target_instrument` (reference utils.py:480-499). The real
    # reference utils imports soundfile/omegaconf/tqdm; stub just the one
    # function so the model module imports torch-only.
    if "utils" not in sys.modules or not hasattr(
        sys.modules["utils"], "prefer_target_instrument"
    ):
        stub = types.ModuleType("utils")

        def prefer_target_instrument(config):
            if getattr(config.training, "target_instrument", None):
                return [config.training.target_instrument]
            return list(config.training.instruments)

        stub.prefer_target_instrument = prefer_target_instrument
        sys.modules["utils"] = stub

    import importlib

    mods = types.SimpleNamespace()
    mods.mdx23c = importlib.import_module("models.mdx23c_tfc_tdf_v3")
    mods.mdx23c_stht = importlib.import_module("models.mdx23c_tfc_tdf_v3_with_STHT")
    mods.scnet = importlib.import_module("models.scnet.scnet")
    mods.scnet_masked = importlib.import_module("models.scnet.scnet_masked")
    mods.ts_bs_mamba2 = importlib.import_module("models.ts_bs_mamba2")
    return mods


def _to_jax_sd(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def _forward_both(torch_model, jax_apply, params, config, x_np, atol):
    torch_model.eval()
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x_np)).numpy()
    got = np.asarray(jax_apply(params, config, jnp.asarray(x_np)))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    assert np.isfinite(ref_out).all()
    np.testing.assert_allclose(got, ref_out, atol=atol, rtol=1e-3)


# ---------------------------------------------------------------- mdx23c

def test_mdx23c_matches_reference_module(ref):
    from sesa_tpu.models import mdx23c
    from tests.test_mdx23c import tiny_config

    config = tiny_config()
    torch.manual_seed(0)
    model = ref.mdx23c.TFC_TDF_net(config)
    params = mdx23c.convert_torch(_to_jax_sd(model.state_dict()), config)

    x = np.random.default_rng(0).standard_normal((1, 2, 8064)).astype(np.float32) * 0.3
    _forward_both(model, mdx23c.apply, params, config, x, atol=5e-4)


def test_mdx23c_stht_matches_reference_module(ref):
    from sesa_tpu.models import mdx23c_stht

    config = ConfigDict(
        {
            "audio": {"n_fft": 256, "hop_length": 64, "dim_f": 128,
                      "num_channels": 2, "chunk_size": 8128, "sample_rate": 44100},
            "model": {"num_subbands": 4, "num_scales": 2, "scale": [2, 2],
                      "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                      "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
            "training": {"instruments": ["vocals", "other"], "target_instrument": None},
            "inference": {"num_overlap": 2, "batch_size": 2},
        }
    )
    torch.manual_seed(1)
    model = ref.mdx23c_stht.TFC_TDF_net(config)
    params = mdx23c_stht.convert_torch(_to_jax_sd(model.state_dict()), config)

    x = np.random.default_rng(1).standard_normal((1, 2, 8128)).astype(np.float32) * 0.3
    _forward_both(model, mdx23c_stht.apply, params, config, x, atol=5e-4)


# ----------------------------------------------------------------- scnet

def test_scnet_matches_reference_module(ref):
    from sesa_tpu.models import scnet
    from tests.test_scnet import tiny_kwargs

    kw = tiny_kwargs()
    config = ConfigDict({"model": kw})
    torch.manual_seed(2)
    model = ref.scnet.SCNet(**kw)
    params = scnet.convert_torch(_to_jax_sd(model.state_dict()), config)

    x = np.random.default_rng(2).standard_normal((1, 2, 8192)).astype(np.float32) * 0.3
    _forward_both(model, scnet.apply, params, config, x, atol=5e-4)


def test_scnet_masked_matches_reference_module(ref):
    from sesa_tpu.models import scnet_masked
    from tests.test_scnet import tiny_kwargs

    kw = tiny_kwargs()
    config = ConfigDict({"model": kw})
    torch.manual_seed(3)
    model = ref.scnet_masked.SCNet(**kw)
    params = scnet_masked.convert_torch(_to_jax_sd(model.state_dict()), config)

    x = np.random.default_rng(3).standard_normal((1, 2, 8192)).astype(np.float32) * 0.3
    _forward_both(model, scnet_masked.apply, params, config, x, atol=5e-4)


# ------------------------------------------------------------- bs_mamba2

def test_bs_mamba2_matches_reference_module(ref):
    from sesa_tpu.models import bs_mamba2

    # num_repeat >= 2: the reference wraps the separator stacks in
    # checkpoint_sequential(_, 2, ...) (ts_bs_mamba2.py:264), which crashes
    # on single-module stacks (segment size 0) — a reference-side limit.
    config = ConfigDict({"model": dict(sr=44100, win=2048, stride=512,
                                       feature_dim=16, num_repeat_mask=2,
                                       num_repeat_map=2, num_output=2)})

    # The reference's pure-torch Mamba2 fallback (ex_bi_mamba2.py:112)
    # requires seq % 64 == 0 and the band-mixing stage always runs over 57
    # bands, so the fallback path cannot execute as-is (it only ever ran
    # under CUDA mamba_ssm, which accepts any length). The scan is causal
    # (left-padded depthwise conv + SSD), so right-padding the input to a
    # multiple of 64 and truncating the output is EXACT for the first L
    # positions — patch that shim onto the reference class.
    mamba_cls = ref.ts_bs_mamba2.Mamba2
    if not getattr(mamba_cls, "_sesa_padded", False):
        orig_forward = mamba_cls.forward

        def padded_forward(self, u):
            L = u.shape[1]
            pad = (-L) % 64
            if pad:
                u = torch.nn.functional.pad(u, (0, 0, 0, pad))
            return orig_forward(self, u)[:, :L]

        mamba_cls.forward = padded_forward
        mamba_cls._sesa_padded = True

    torch.manual_seed(4)
    model = ref.ts_bs_mamba2.Separator(**dict(config.model))
    # ex_bi_mamba2 leaves dt_bias/A_log/D as torch.empty() — uninitialized
    # memory (the real init lives in mamba_ssm). Give them the mamba_ssm
    # defaults-shaped values so the forward is finite; both sides consume
    # the same state_dict so parity is unaffected.
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("dt_bias"):
                p.copy_(torch.rand(p.shape, generator=gen) * 0.5 - 2.0)
            elif name.endswith("A_log"):
                p.copy_(torch.log(1 + torch.rand(p.shape, generator=gen) * 3))
            elif name.endswith(".D"):
                p.copy_(torch.rand(p.shape, generator=gen) * 0.5 + 0.5)
    params = bs_mamba2.convert_torch(_to_jax_sd(model.state_dict()), config)

    x = np.random.default_rng(4).standard_normal((1, 2, 8192)).astype(np.float32) * 0.1
    _forward_both(model, bs_mamba2.apply, params, config, x, atol=5e-4)


# ------------------------------------------------------- SDR delta target

def test_sdr_delta_vs_reference_below_target(ref):
    """BASELINE.json north star: SDR within 0.05 dB of the PyTorch
    reference. Real community checkpoints are not downloadable here, so the
    evidence is constructed end to end on an exported-state-dict model: the
    reference's own TFC_TDF_net and the converted JAX model separate the
    same synthetic two-source song, both estimates are scored with the
    framework's SDR metric against the synthetic truth, and the SDR delta
    between the two pipelines must sit far inside the 0.05 dB budget."""
    from sesa_tpu.metrics import signal_distortion_ratio
    from sesa_tpu.models import mdx23c
    from tests.test_mdx23c import tiny_config

    config = tiny_config(target="vocals")
    torch.manual_seed(11)
    model = ref.mdx23c.TFC_TDF_net(config)
    model.eval()
    params = mdx23c.convert_torch(_to_jax_sd(model.state_dict()), config)

    sr = 44100
    t = np.arange(8064) / sr
    truth = np.stack([np.sin(2 * np.pi * 330 * t),
                      np.sin(2 * np.pi * 220 * t)]).astype(np.float32) * 0.4
    noise = np.random.default_rng(3).standard_normal(truth.shape) * 0.1
    mix = (truth + noise.astype(np.float32))[None]

    with torch.no_grad():
        est_ref = model(torch.from_numpy(mix)).numpy()[0]
    est_jax = np.asarray(mdx23c.apply(params, config, jnp.asarray(mix)))[0]

    sdr_ref = float(np.mean(signal_distortion_ratio(est_ref, truth)))
    sdr_jax = float(np.mean(signal_distortion_ratio(est_jax, truth)))
    delta = abs(sdr_ref - sdr_jax)
    assert np.isfinite(sdr_ref) and np.isfinite(sdr_jax)
    assert delta < 0.05, (sdr_ref, sdr_jax)
    # the measured delta is orders of magnitude inside the budget
    assert delta < 0.005, (sdr_ref, sdr_jax, delta)
