"""HDemucs (v3 hybrid) parity vs the hand-written torch oracle.

Reference dispatch: models/demucs4ht.py:696-713 routes ``model: hdemucs``
to demucs.hdemucs.HDemucs (external package, unavailable offline; oracle
in tests/oracles/torch_hdemucs.py documents the reconstruction). Uses the
real frequency topology (nfft 4096, depth 6: four strided freq layers, a
frequency-collapse layer, then a time layer) at tiny channel counts so
the last_freq/time-tail/DConv-insert paths all run.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import htdemucs
from tests.oracles.torch_hdemucs import HDemucs


def hd_config():
    return ConfigDict({
        "model": "hdemucs",
        "hdemucs": {"channels": 4, "dconv_comp": 4},
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": 44100, "segment": 2},
    })


def torch_model(config, seed=0):
    torch.manual_seed(seed)
    kw = htdemucs._kwargs(config)
    m = HDemucs(sources=kw["sources"], audio_channels=kw["audio_channels"],
                channels=kw["channels"], nfft=kw["nfft"], depth=kw["depth"],
                dconv_comp=kw["dconv_comp"])
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.15, 0.15)
    m.eval()
    return m


def test_plan_matches_reference_topology():
    kw = htdemucs._kwargs(hd_config())
    assert kw["variant"] == "hdemucs" and kw["depth"] == 6
    plan = htdemucs._layer_plan(kw)
    assert [lp["freq"] for lp in plan] == [True] * 5 + [False]
    assert [lp["last_freq"] for lp in plan] == [False] * 4 + [True, False]
    assert [lp["lstm"] for lp in plan] == [False] * 4 + [True, True]
    assert plan[5]["ker"] == 4 and plan[5]["stride"] == 2  # time_stride tail


def test_forward_parity():
    config = hd_config()
    m = torch_model(config)
    params = htdemucs.convert_torch(m.state_dict(), config)
    assert "crosstransformer" not in params
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 8192)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = np.asarray(htdemucs.apply(params, config, jnp.asarray(x)))
    assert out.shape == ref.shape == (1, 4, 2, 8192)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_converter_is_strict():
    config = hd_config()
    m = torch_model(config, seed=1)
    sd = dict(m.state_dict())
    sd["encoder.0.conv.stray"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        htdemucs.convert_torch(sd, config)


def test_fresh_init_forward():
    config = hd_config()
    params = htdemucs.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(1).standard_normal((1, 2, 8192)).astype(np.float32)
    out = np.asarray(htdemucs.apply(params, config, jnp.asarray(x)))
    assert out.shape == (1, 4, 2, 8192)
    assert np.isfinite(out).all()
