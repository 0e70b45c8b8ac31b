"""SQUIM objective-metric model parity vs the torch reconstruction.

Oracle basis: tests/oracles/torch_squim.py (reconstruction of reference
models/bandit/core/metrics/_squim.py — see that file's docstring)."""

import numpy as np
import pytest

import jax
from ml_collections import ConfigDict

from sesa_tpu.models import squim

torch = pytest.importorskip("torch")


SMALL = dict(feat_dim=16, win_len=16, d_model=32, nhead=4, hidden_dim=24,
             num_blocks=2, chunk_size=13)


def _oracle(kw, seed=0):
    from tests.oracles.torch_squim import squim_objective_model

    torch.manual_seed(seed)
    model = squim_objective_model(
        kw["feat_dim"], kw["win_len"], kw["d_model"], kw["nhead"],
        kw["hidden_dim"], kw["num_blocks"], kw["chunk_size"])
    model.eval()
    return model


@pytest.mark.parametrize("t_samples", [3210, 4096])
def test_squim_matches_torch(t_samples):
    kw = dict(SMALL)
    model = _oracle(kw)
    config = ConfigDict({"model": kw})
    params = squim.convert_torch(
        {k: v.numpy() for k, v in model.state_dict().items()}, config)

    rng = np.random.default_rng(t_samples)
    x = (0.2 * rng.standard_normal((2, t_samples))).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in model(torch.from_numpy(x))]
    got = squim.apply(params, config, x)
    for m, w in zip(squim.METRICS, want):
        np.testing.assert_allclose(np.asarray(got[m]), w, atol=2e-4,
                                   err_msg=m)


def test_squim_convert_rejects_leftovers():
    kw = dict(SMALL)
    model = _oracle(kw, seed=1)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["branches.0.0.bogus"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        squim.convert_torch(sd, ConfigDict({"model": kw}))


@pytest.mark.smoke
def test_squim_metrics_wrapper():
    from sesa_tpu.metrics import squim_objective_scores

    kw = dict(SMALL)
    config = ConfigDict({"model": kw})
    params = squim.init(jax.random.PRNGKey(2), config)
    mono = 0.1 * np.ones(2000, np.float32)
    out = squim_objective_scores(mono, params, config)
    assert set(out) == set(squim.METRICS)
    for m in squim.METRICS:
        assert isinstance(out[m], np.ndarray) and out[m].shape == (1,)


@pytest.mark.smoke
def test_squim_init_apply_shapes():
    kw = dict(SMALL)
    config = ConfigDict({"model": kw})
    params = squim.init(jax.random.PRNGKey(0), config)
    x = 0.1 * np.ones((3, 2000), np.float32)
    out = squim.apply(params, config, np.asarray(x))
    assert set(out) == set(squim.METRICS)
    for m in squim.METRICS:
        assert out[m].shape == (3,)
    assert float(out["stoi"].min()) >= 0.0 and float(out["stoi"].max()) <= 1.0
    assert float(out["pesq"].min()) >= 1.0
