"""Trainer tests: optimizer/loss parsing, train step, checkpoints, mesh.

Reference semantics: models/bandit/core/__init__.py:61-100 (optimizer
parsing), :116-136 (loss parsing), :336-353 (training_step with
augmentation), :725-729 (fader-based validation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.data import StemAugmentor, batch_iterator
from sesa_tpu.train import (ReduceLROnPlateau, Trainer, load_checkpoint,
                            parse_loss_config, parse_optimizer_config,
                            save_checkpoint)

SR = 8000


def _mdx_config():
    return ConfigDict({
        "audio": dict(n_fft=256, hop_length=64, dim_f=128, num_channels=2,
                      chunk_size=4064, sample_rate=SR),
        "model": dict(num_subbands=2, num_scales=1, scale=[2, 2],
                      num_blocks_per_scale=1, num_channels=4, growth=4,
                      bottleneck_factor=4, norm="InstanceNorm", act="gelu"),
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def _batch(b=2, c=2, t=4064, seed=0):
    rng = np.random.default_rng(seed)
    stems = {s: (0.1 * rng.standard_normal((b, c, t))).astype(np.float32)
             for s in ["vocals", "other"]}
    stems["mixture"] = stems["vocals"] + stems["other"]
    return {"audio": stems, "track": ["t"] * b}


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_parse_optimizer_names():
    import optax
    for name in ["Adam", "AdamW", "SGD", "RMSprop", "Adagrad", "Adamax",
                 "NAdam", "RAdam"]:
        tx = parse_optimizer_config(
            {"optimizer": {"name": name, "kwargs": {"lr": 1e-3}}})
        assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(NameError):
        parse_optimizer_config({"optimizer": {"name": "DeepSpeedCPUAdam",
                                              "kwargs": {}}})
    with pytest.raises(TypeError):
        parse_optimizer_config({"optimizer": {
            "name": "Adam", "kwargs": {"lr": 1e-3, "bogus": 1}}})


def test_parse_optimizer_schedulers():
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    for sched in [
        {"name": "StepLR", "kwargs": {"step_size": 2, "gamma": 0.5}},
        {"name": "ExponentialLR", "kwargs": {"gamma": 0.9}},
        {"name": "CosineAnnealingLR", "kwargs": {"T_max": 10}},
        {"name": "LinearLR", "kwargs": {"total_iters": 4}},
        {"name": "ConstantLR", "kwargs": {}},
    ]:
        tx = parse_optimizer_config({
            "optimizer": {"name": "SGD", "kwargs": {"lr": 1.0}},
            "scheduler": sched})
        state = tx.init(params)
        upd, state = tx.update(grads, state, params)
        assert np.isfinite(float(upd["w"][0]))
    with pytest.raises(ValueError):
        parse_optimizer_config({
            "optimizer": {"name": "SGD", "kwargs": {"lr": 1.0}},
            "scheduler": {"name": "ReduceLROnPlateau", "kwargs": {}}})


def test_steplr_halves_after_step_size():
    tx = parse_optimizer_config({
        "optimizer": {"name": "SGD", "kwargs": {"lr": 1.0}},
        "scheduler": {"name": "StepLR", "kwargs": {"step_size": 2,
                                                   "gamma": 0.5}}})
    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    lrs = []
    for _ in range(4):
        upd, state = tx.update({"w": jnp.ones(())}, state, params)
        lrs.append(-float(upd["w"]))
    assert lrs[0] == pytest.approx(1.0) and lrs[1] == pytest.approx(1.0)
    assert lrs[2] == pytest.approx(0.5) and lrs[3] == pytest.approx(0.5)


@pytest.mark.smoke
def test_parse_loss_names():
    r = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 2, 512)),
                    jnp.float32)
    t = jnp.zeros_like(r)
    for name, kwargs in [
        ("L1Loss", {}),
        ("MSELoss", {}),
        ("MultiResSTFTL1", {"window_sizes": (256, 128), "stft_n_fft": 256}),
        ("SignalNoisePNormRatio", {}),
        ("MultichannelSingleSrcNegSDR", {"sdr_type": "snr"}),
    ]:
        fn = parse_loss_config({"name": name, "kwargs": kwargs})
        if name == "MultichannelSingleSrcNegSDR":
            val = fn(r.reshape(2, 2, -1), t.reshape(2, 2, -1) + 1e-3)
        else:
            val = fn(r, t)
        assert np.isfinite(float(val))
    with pytest.raises(NameError):
        parse_loss_config({"name": "Nope"})


def test_reduce_lr_on_plateau():
    sched = ReduceLROnPlateau(patience=1, factor=0.1)
    assert sched.step(1.0) == 1.0      # best
    assert sched.step(1.2) == 1.0      # bad 1
    assert sched.step(1.2) == pytest.approx(0.1)  # bad 2 > patience
    assert sched.step(0.5) == pytest.approx(0.1)  # new best keeps scale


def test_reduce_lr_on_plateau_min_lr_floor():
    # torch floors the effective LR at min_lr; with base_lr 1.0 and
    # min_lr 0.05 the scale can never drop below 0.05
    sched = ReduceLROnPlateau(patience=0, factor=0.1, min_lr=0.05,
                              base_lr=1.0)
    sched.step(1.0)
    assert sched.step(2.0) == pytest.approx(0.1)
    assert sched.step(2.0) == pytest.approx(0.05)   # clamped, not 0.01
    assert sched.step(2.0) == pytest.approx(0.05)


def test_cosine_annealing_is_periodic():
    # torch's CosineAnnealingLR climbs back up past T_max; optax's
    # cosine_decay_schedule would hold at the floor instead
    tx = parse_optimizer_config({
        "optimizer": {"name": "SGD", "kwargs": {"lr": 1.0}},
        "scheduler": {"name": "CosineAnnealingLR",
                      "kwargs": {"T_max": 4, "eta_min": 0.1}}})
    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    lrs = []
    for _ in range(9):
        upd, state = tx.update({"w": jnp.ones(())}, state, params)
        lrs.append(-float(upd["w"]))
    assert lrs[0] == pytest.approx(1.0)
    assert lrs[4] == pytest.approx(0.1)             # trough at T_max
    assert lrs[8] == pytest.approx(1.0, abs=1e-6)   # back at the peak


def test_adam_weight_decay_is_coupled_l2():
    # torch Adam couples weight_decay into the gradient BEFORE the adaptive
    # scaling. With grad=0 and param=1, coupled L2 yields an update whose
    # magnitude saturates at ~lr (adam normalizes the decay direction);
    # decoupled AdamW would subtract exactly lr*wd*param instead.
    import optax
    tx = parse_optimizer_config({"optimizer": {
        "name": "Adam", "kwargs": {"lr": 0.1, "weight_decay": 0.5}}})
    params = {"w": jnp.ones(())}
    state = tx.init(params)
    upd, state = tx.update({"w": jnp.zeros(())}, state, params)
    # coupled: adam sees grad wd*w = 0.5, first-step update = -lr = -0.1
    assert float(upd["w"]) == pytest.approx(-0.1, rel=1e-3)
    txw = parse_optimizer_config({"optimizer": {
        "name": "AdamW", "kwargs": {"lr": 0.1, "weight_decay": 0.5}}})
    statew = txw.init(params)
    updw, _ = txw.update({"w": jnp.zeros(())}, statew, params)
    # decoupled: zero grad -> update is exactly -lr*wd*w = -0.05
    assert float(updw["w"]) == pytest.approx(-0.05, rel=1e-3)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_trainer_loss_decreases():
    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}},
                      optimizer={"optimizer": {"name": "Adam",
                                               "kwargs": {"lr": 3e-3}}},
                      seed=0)
    item = _batch()
    losses = [trainer.train_batch(item) for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert trainer.step == 8


def test_trainer_default_loss_is_multires():
    trainer = Trainer("mdx23c", _mdx_config(), seed=0)
    from sesa_tpu.losses import multi_res_stft_l1
    assert trainer.loss_fn is multi_res_stft_l1


def test_trainer_with_augmentor_and_iterator():
    aug = StemAugmentor({"[default]": {
        "name": "Gain", "kwargs": {"min_gain_in_db": -3, "max_gain_in_db": 3,
                                   "p": 1.0}}}, seed=0)

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            item = _batch(b=1, seed=i)
            return {"audio": {k: v[0] for k, v in item["audio"].items()},
                    "track": f"train/{i}"}

    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}},
                      augmentor=aug, seed=0)
    history = trainer.fit(batch_iterator(_DS(), 2, seed=0, epochs=None),
                          steps=3)
    assert len(history) == 3 and all(np.isfinite(l) for l in history)


def test_trainer_target_instrument_single_stem():
    config = _mdx_config()
    config.training.target_instrument = "vocals"
    trainer = Trainer("mdx23c", config,
                      loss={"name": "L1Loss", "kwargs": {}}, seed=0)
    assert trainer.target_stems() == ["vocals"]
    loss = trainer.train_batch(_batch())
    assert np.isfinite(loss)


def test_trainer_lr_scale_freezes_params():
    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}}, seed=0)
    trainer.set_lr_scale(0.0)
    before = jax.device_get(trainer.params)
    trainer.train_batch(_batch())
    after = jax.device_get(trainer.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Checkpoints
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_checkpoint_roundtrip(tmp_path):
    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}}, seed=0)
    trainer.train_batch(_batch())
    path = str(tmp_path / "ck.npz")
    trainer.save(path, extra={"note": "r4"})

    other = Trainer("mdx23c", _mdx_config(),
                    loss={"name": "L1Loss", "kwargs": {}}, seed=7)
    other.load(path)
    assert other.step == 1
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trainer.params)),
                    jax.tree_util.tree_leaves(jax.device_get(other.params))):
        np.testing.assert_array_equal(a, b)
    # training continues identically from the restored state
    la = trainer.train_batch(_batch(seed=3))
    lb = other.train_batch(_batch(seed=3))
    assert la == pytest.approx(lb, rel=1e-5)


def test_checkpoint_extra_and_step(tmp_path):
    params = {"layer": {"w": np.ones((2, 2), np.float32)},
              "stack": [np.zeros((3,), np.float32), np.ones((1,), np.float32)]}
    path = str(tmp_path / "p.npz")
    save_checkpoint(path, params, step=42, extra={"k": 1})
    loaded, opt, step, extra = load_checkpoint(path)
    assert step == 42 and extra == {"k": 1} and opt is None
    np.testing.assert_array_equal(loaded["layer"]["w"], params["layer"]["w"])
    assert isinstance(loaded["stack"], list) and len(loaded["stack"]) == 2


# ---------------------------------------------------------------------------
# Mesh (virtual 8-device CPU mesh from conftest)
# ---------------------------------------------------------------------------

def test_trainer_mesh_data_parallel():
    from sesa_tpu.parallel import make_mesh
    mesh = make_mesh(4)
    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}},
                      mesh=mesh, seed=0)
    item = _batch(b=4)
    losses = [trainer.train_batch(item) for _ in range(2)]
    assert all(np.isfinite(l) for l in losses)

    # replicated single-device training matches the sharded run
    solo = Trainer("mdx23c", _mdx_config(),
                   loss={"name": "L1Loss", "kwargs": {}}, seed=0)
    ref = [solo.train_batch(item) for _ in range(2)]
    np.testing.assert_allclose(losses, ref, rtol=2e-4)


def test_trainer_load_preserves_param_rule(tmp_path):
    # a custom TP rule must survive save/load: load() used to fall back to
    # the default roformer rule, silently re-placing the restored params
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sesa_tpu.parallel import make_mesh
    mesh = make_mesh(4)

    def replicate_rule(path, leaf):
        return NamedSharding(mesh, P())

    trainer = Trainer("mdx23c", _mdx_config(),
                      loss={"name": "L1Loss", "kwargs": {}},
                      mesh=mesh, param_rule=replicate_rule, seed=0)
    trainer.train_batch(_batch(b=4))
    path = str(tmp_path / "ck.npz")
    trainer.save(path)

    other = Trainer("mdx23c", _mdx_config(),
                    loss={"name": "L1Loss", "kwargs": {}},
                    mesh=mesh, param_rule=replicate_rule, seed=7)
    other.load(path)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.params),
                    jax.tree_util.tree_leaves(other.params)):
        assert a.sharding == b.sharding
    # opt_state moment tensors land on the param placement too (the scalar
    # step count's placement is immaterial — jit replicates it on use)
    for t, n in zip(jax.tree_util.tree_leaves(trainer.opt_state),
                    jax.tree_util.tree_leaves(other.opt_state)):
        if hasattr(t, "sharding") and hasattr(n, "sharding") and t.ndim > 0:
            assert t.sharding.is_equivalent_to(n.sharding, t.ndim)
    assert np.isfinite(other.train_batch(_batch(b=4)))


def test_trainer_validate_track():
    config = _mdx_config()
    trainer = Trainer("mdx23c", config,
                      loss={"name": "L1Loss", "kwargs": {}}, seed=0)
    item = _batch(b=1, t=3 * 4064)
    track = {"audio": {k: v[0] for k, v in item["audio"].items()},
             "track": "val/x"}
    scores = trainer.validate_track(track, window_seconds=0.25)
    assert set(scores) == {"vocals", "other"}
    assert all(np.isfinite(v) for v in scores.values())
