"""TS-BS-Mamba2: SSD scan parity, Mamba2 block parity, TAC parity, full
separator forward + converter round trip vs the functional torch oracle."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import bs_mamba2
from sesa_tpu.ops.ssd import ssd
from tests.oracles import torch_mamba2 as O


def test_ssd_matches_reference_math():
    rng = np.random.default_rng(0)
    b, l, h, p, n = 2, 128, 4, 8, 16
    x = rng.standard_normal((b, l, h, p)).astype(np.float32) * 0.3
    a = -np.abs(rng.standard_normal((b, l, h)).astype(np.float32)) * 0.1
    bb = rng.standard_normal((b, l, 1, n)).astype(np.float32) * 0.3
    cc = rng.standard_normal((b, l, 1, n)).astype(np.float32) * 0.3

    ref = O.ssd(torch.from_numpy(x), torch.from_numpy(a), torch.from_numpy(bb),
                torch.from_numpy(cc), chunk=64).numpy()
    got = np.asarray(ssd(jnp.asarray(x), jnp.asarray(a), jnp.asarray(bb),
                         jnp.asarray(cc), chunk_size=64))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def _mamba_sd(rng, d_model, prefix):
    d_inner = 4 * d_model
    nheads = d_inner // 64
    conv_dim = d_inner + 2 * 128
    mk = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.1)
    return {
        f"{prefix}.in_proj.weight": mk(2 * d_inner + 2 * 128 + nheads, d_model),
        f"{prefix}.conv1d.weight": mk(conv_dim, 1, 4),
        f"{prefix}.conv1d.bias": mk(conv_dim),
        f"{prefix}.dt_bias": mk(nheads),
        f"{prefix}.A_log": torch.from_numpy(
            np.abs(rng.standard_normal(nheads)).astype(np.float32)),
        f"{prefix}.D": mk(nheads),
        f"{prefix}.norm.weight": torch.ones(d_inner),
        f"{prefix}.out_proj.weight": mk(d_model, d_inner),
    }


def test_mamba2_block_matches_oracle():
    rng = np.random.default_rng(1)
    d = 32
    sd = _mamba_sd(rng, d, "m")
    u = rng.standard_normal((2, 100, d)).astype(np.float32) * 0.3  # L not chunk-aligned

    ref = O.mamba2(sd, "m", torch.from_numpy(u)).numpy()
    params = {
        "in_proj": jnp.asarray(sd["m.in_proj.weight"].numpy()),
        "conv_w": jnp.asarray(sd["m.conv1d.weight"].numpy()),
        "conv_b": jnp.asarray(sd["m.conv1d.bias"].numpy()),
        "dt_bias": jnp.asarray(sd["m.dt_bias"].numpy()),
        "A_log": jnp.asarray(sd["m.A_log"].numpy()),
        "D": jnp.asarray(sd["m.D"].numpy()),
        "norm_w": jnp.asarray(sd["m.norm.weight"].numpy()),
        "out_proj": jnp.asarray(sd["m.out_proj.weight"].numpy()),
    }
    got = np.asarray(bs_mamba2.mamba2_apply(params, jnp.asarray(u)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def tiny_config():
    # the reference's band layout is hardcoded against win=2048-scale
    # spectra (63 bands); shrink everything else instead
    return ConfigDict({"model": dict(sr=44100, win=2048, stride=512,
                                     feature_dim=16, num_repeat_mask=1,
                                     num_repeat_map=1, num_output=2)})


def test_separator_forward_and_converter():
    config = tiny_config()
    params = bs_mamba2.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(2).standard_normal((1, 2, 8192)).astype(np.float32) * 0.1
    out = bs_mamba2.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 2, 2, 8192)
    assert np.isfinite(np.asarray(out)).all()


def test_tac_matches_oracle():
    rng = np.random.default_rng(3)
    n, h = 16, 48
    mk = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.2)
    sd = {
        "t.input_norm.weight": torch.ones(n),
        "t.input_norm.bias": torch.zeros(n),
        "t.TAC_input.0.weight": mk(h, n),
        "t.TAC_input.0.bias": mk(h),
        "t.TAC_mean.0.weight": mk(h, h),
        "t.TAC_mean.0.bias": mk(h),
        "t.TAC_output.0.weight": mk(n, 2 * h),
        "t.TAC_output.0.bias": mk(n),
    }
    x = rng.standard_normal((2, 3, n, 40)).astype(np.float32)
    ref = O.tac(sd, "t", torch.from_numpy(x)).numpy()

    params = {
        "norm": {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,))},
        "input": {"weight": jnp.asarray(sd["t.TAC_input.0.weight"].numpy()),
                  "bias": jnp.asarray(sd["t.TAC_input.0.bias"].numpy())},
        "mean": {"weight": jnp.asarray(sd["t.TAC_mean.0.weight"].numpy()),
                 "bias": jnp.asarray(sd["t.TAC_mean.0.bias"].numpy())},
        "output": {"weight": jnp.asarray(sd["t.TAC_output.0.weight"].numpy()),
                   "bias": jnp.asarray(sd["t.TAC_output.0.bias"].numpy())},
    }
    got = np.asarray(bs_mamba2._tac_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
