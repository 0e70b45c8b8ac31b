"""Training loop: config-parsed optimizer/loss/augmentation + jitted step.

TPU-native counterpart of the reference's PyTorch-Lightning scaffold
(reference models/bandit/core/__init__.py:61-743 ``LightningSystem``:
``parse_optimizer_config`` :73-100, ``parse_loss_config`` :125-136,
``training_step`` :336-353, fader-based validation :363-433). The
reference repo never invokes that scaffold; here it is a first-class,
tested surface:

- torch optimizer/scheduler names parse to optax transforms;
- losses come from :mod:`sesa_tpu.losses` (oracle-tested vs the
  reference's torch modules);
- the train step is ONE jitted function with donated params/opt-state,
  sharded over a ``jax.sharding.Mesh`` when given (batch data-parallel;
  optionally tensor-parallel params via ``sesa_tpu.parallel`` rules);
- validation runs the real chunked overlap-add engine
  (:func:`sesa_tpu.runtime.demix` — the counterpart of the reference's
  ``OverlapAddFader``, core/utils/audio.py:412-444) and the SNR/SDR
  metrics of :mod:`sesa_tpu.metrics`;
- checkpoints are flat ``.npz`` pytrees (no format churn, loud failure on
  structure drift) with optimizer state and step counter.

Unlike torch, a batch dict is uploaded once per step and everything else
stays on device; augmentation (:class:`sesa_tpu.data.StemAugmentor`) is
branchy per-example host work and runs in numpy before the upload.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sesa_tpu import losses as losses_mod

__all__ = [
    "parse_optimizer_config", "parse_loss_config", "ReduceLROnPlateau",
    "Trainer", "save_checkpoint", "load_checkpoint",
]


# ---------------------------------------------------------------------------
# Optimizer / scheduler parsing (reference core/__init__.py:61-100)
# ---------------------------------------------------------------------------

def _schedule_from_config(base_lr: float, spec: Optional[Dict[str, Any]]):
    """torch lr_scheduler names -> an optax schedule (step -> lr).

    ``ReduceLROnPlateau`` is metric-driven and cannot be a pure step
    schedule; it is handled host-side by :class:`ReduceLROnPlateau` and
    rejected here.
    """
    import optax

    if not spec:
        return base_lr
    name = spec["name"]
    kw = dict(spec.get("kwargs", {}))
    if name == "StepLR":
        return optax.exponential_decay(
            base_lr, transition_steps=int(kw["step_size"]),
            decay_rate=float(kw.get("gamma", 0.1)), staircase=True)
    if name == "ExponentialLR":
        return optax.exponential_decay(
            base_lr, transition_steps=1, decay_rate=float(kw["gamma"]))
    if name == "CosineAnnealingLR":
        # torch's closed form (eta_min + (base-eta_min)*(1+cos(pi*t/T_max))/2)
        # is periodic: past T_max the LR climbs back up. optax's
        # cosine_decay_schedule holds at the floor instead, so implement the
        # periodic cosine directly (a schedule is just step -> lr).
        t_max = int(kw["T_max"])
        eta_min = float(kw.get("eta_min", 0.0))

        def periodic_cosine(step):
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * step / t_max))

        return periodic_cosine
    if name == "LinearLR":
        start = float(kw.get("start_factor", 1.0 / 3.0))
        end = float(kw.get("end_factor", 1.0))
        total = int(kw.get("total_iters", 5))
        return optax.linear_schedule(base_lr * start, base_lr * end, total)
    if name == "ConstantLR":
        return base_lr
    if name == "ReduceLROnPlateau":
        raise ValueError(
            "ReduceLROnPlateau is metric-driven: construct "
            "sesa_tpu.train.ReduceLROnPlateau and pass it to Trainer "
            "(reference parses it specially too, core/__init__.py:95-97)")
    raise NameError(f"unknown scheduler {name!r}")


def parse_optimizer_config(config: Dict[str, Any]):
    """``{"optimizer": {"name", "kwargs"}, ["scheduler": ...]}`` ->
    ``optax.GradientTransformation`` (reference core/__init__.py:73-100).

    torch names map to optax: Adam, AdamW, SGD, RMSprop, Adagrad, Adamax,
    NAdam, RAdam. kwargs follow torch conventions (``lr``, ``betas``,
    ``eps``, ``weight_decay``, ``momentum``, ``nesterov``).
    """
    import optax

    ocfg = config["optimizer"]
    name = ocfg["name"]
    kw = dict(ocfg.get("kwargs", {}))
    lr = float(kw.pop("lr", 1e-3))
    schedule = _schedule_from_config(lr, config.get("scheduler"))
    b1, b2 = kw.pop("betas", (0.9, 0.999))
    eps = float(kw.pop("eps", 1e-8))
    wd = float(kw.pop("weight_decay", 0.0))

    if name in ("Adam", "AdamW"):
        if name == "AdamW":
            tx = optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                             weight_decay=wd)
        else:
            # torch Adam couples weight_decay INTO the gradient before the
            # adaptive scaling (L2), unlike AdamW's decoupled decay — so the
            # decay transform must run before the adam transform.
            tx = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "SGD":
        momentum = float(kw.pop("momentum", 0.0)) or None
        tx = optax.sgd(schedule, momentum=momentum,
                       nesterov=bool(kw.pop("nesterov", False)))
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "RMSprop":
        tx = optax.rmsprop(schedule, decay=float(kw.pop("alpha", 0.99)),
                           eps=eps, momentum=float(kw.pop("momentum", 0.0)))
    elif name == "Adagrad":
        tx = optax.adagrad(schedule, eps=float(kw.pop("eps", 1e-10) or eps))
    elif name == "Adamax":
        tx = optax.adamax(schedule, b1=b1, b2=b2, eps=eps)
    elif name == "NAdam":
        tx = optax.nadam(schedule, b1=b1, b2=b2, eps=eps)
    elif name == "RAdam":
        tx = optax.radam(schedule, b1=b1, b2=b2, eps=eps)
    else:
        raise NameError(f"unknown optimizer {name!r}")

    kw.pop("foreach", None)  # torch-only perf knobs
    kw.pop("fused", None)
    kw.pop("amsgrad", None)
    if kw:
        raise TypeError(f"unsupported {name} kwargs: {sorted(kw)}")
    return tx


class ReduceLROnPlateau:
    """Host-side metric-driven LR scaling (torch ReduceLROnPlateau).

    Call :meth:`step` with the monitored metric after each validation;
    multiply the returned factor into the loss-side LR via
    ``Trainer.set_lr_scale``.
    """

    def __init__(self, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0,
                 base_lr: float = 1.0):
        self.mode, self.factor, self.patience = mode, factor, patience
        self.min_lr = min_lr
        self.base_lr = base_lr
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        better = (self.best is None
                  or (metric < self.best if self.mode == "min"
                      else metric > self.best))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                # torch floors the effective LR at min_lr; the scale is
                # relative, so the floor is min_lr / base_lr
                floor = self.min_lr / self.base_lr if self.base_lr else 0.0
                self.scale = max(self.scale * self.factor, floor)
                self.bad_epochs = 0
        return self.scale


# ---------------------------------------------------------------------------
# Loss parsing (reference core/__init__.py:116-136)
# ---------------------------------------------------------------------------

_LOSSES: Dict[str, Callable[..., Any]] = {
    "L1Loss": lambda **kw: losses_mod.l1,
    "MSELoss": lambda **kw: (lambda r, t: jnp.mean(jnp.square(r - t))),
    "MultiResSTFTL1": lambda **kw: functools.partial(
        losses_mod.multi_res_stft_l1, **kw),
    "SignalNoisePNormRatio": lambda **kw: functools.partial(
        losses_mod.signal_noise_pnorm_ratio, **kw),
    "MultichannelSingleSrcNegSDR": lambda **kw: functools.partial(
        losses_mod.neg_sdr, **kw),
    "NegSDR": lambda **kw: functools.partial(losses_mod.neg_sdr, **kw),
}


def parse_loss_config(config: Dict[str, Any]) -> Callable:
    """``{"name", "kwargs"}`` -> ``loss(recon, target) -> scalar``."""
    name = config["name"]
    if name not in _LOSSES:
        raise NameError(f"unknown loss {name!r}; available: {sorted(_LOSSES)}")
    return _LOSSES[name](**dict(config.get("kwargs", {})))


# ---------------------------------------------------------------------------
# Checkpoints: flat npz pytrees
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str, params, opt_state=None, step: int = 0,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Write params (+ optimizer state, step) as one ``.npz`` with a JSON
    treedef. Loud failure over silent drift, like the torch converters."""
    payload = {"step": np.asarray(step)}
    payload.update({f"params/{k}": v for k, v in _flatten(params).items()})
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            payload[f"opt/{i}"] = np.asarray(leaf)
        payload["opt_treedef"] = np.asarray(str(treedef))
    _, params_def = jax.tree_util.tree_flatten(params)
    payload["params_treedef"] = np.asarray(str(params_def))
    if extra:
        payload["extra_json"] = np.asarray(json.dumps(extra))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file object: savez won't append .npz
        np.savez(f, **payload)
    os.replace(tmp, path)
    return path


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[k]) for k in sorted(keys, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def load_checkpoint(path: str, opt_state_template=None):
    """-> ``(params, opt_state, step, extra)``. ``opt_state`` needs the
    template (an initialized opt state of the same optimizer) to rebuild
    its pytree structure; pass None to skip optimizer state."""
    with np.load(path, allow_pickle=False) as z:
        step = int(z["step"])
        params = _unflatten({k[len("params/"):]: z[k] for k in z.files
                             if k.startswith("params/")})
        extra = (json.loads(str(z["extra_json"])) if "extra_json" in z.files
                 else {})
        opt_state = None
        if opt_state_template is not None:
            leaves_t, treedef = jax.tree_util.tree_flatten(opt_state_template)
            n = len(leaves_t)
            leaves = [z[f"opt/{i}"] for i in range(n)]
            if f"opt/{n}" in z.files:
                raise ValueError(
                    "checkpoint optimizer state has more leaves than the "
                    "template — optimizer config drift")
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, step, extra


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Jit-compiled training over a model module from the zoo.

    Args:
      model: a module exposing ``init(rng, config)`` / ``apply(params,
        config, mix)`` (every :mod:`sesa_tpu.models` entry), or a
        ``model_type`` string dispatched via ``get_model``.
      config: the model's ConfigDict/dict. ``config.training.instruments``
        (and optional ``target_instrument``) define the stem order of the
        target tensor, exactly as checkpoint stem outputs are ordered.
      loss: callable or a loss config dict (``parse_loss_config``).
        Default: the reference training objective — waveform L1 +
        multi-res STFT L1 (reference bs_roformer.py:586-622).
      optimizer: optax transform or an optimizer config dict
        (``parse_optimizer_config``). Default Adam(1e-4).
      mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis; batches
        shard over it (+ optional ``param_rule`` for tensor parallelism).
      augmentor: optional ``StemAugmentor`` applied to each host batch
        (reference training_step applies it under no_grad,
        core/__init__.py:338-341).
    """

    def __init__(self, model, config, *, loss=None, optimizer=None,
                 mesh=None, param_rule=None, augmentor=None, seed: int = 0,
                 params=None):
        if isinstance(model, str):
            from sesa_tpu.models import get_model
            model = get_model(model)
        self.model = model
        self.config = config
        self.augmentor = augmentor
        self.mesh = mesh
        self._param_rule = param_rule
        self._lr_scale = 1.0

        if loss is None:
            loss = losses_mod.multi_res_stft_l1
        elif isinstance(loss, dict):
            loss = parse_loss_config(loss)
        self.loss_fn = loss

        if optimizer is None:
            optimizer = {"optimizer": {"name": "Adam", "kwargs": {"lr": 1e-4}}}
        if isinstance(optimizer, dict):
            optimizer = parse_optimizer_config(optimizer)
        self.tx = optimizer

        self.params = (model.init(jax.random.PRNGKey(seed), config)
                       if params is None else params)
        if mesh is not None:
            from sesa_tpu.parallel import shard_params
            self.params = shard_params(mesh, self.params, rule=param_rule)
        self.opt_state = self.tx.init(self.params)
        self.step = 0

        def train_step(params, opt_state, mix, target, lr_scale):
            def objective(p):
                recon = model.apply(p, config, mix)
                return self.loss_fn(recon, target)

            loss_val, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            import optax
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_val

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    # -- stem plumbing -----------------------------------------------------

    def target_stems(self) -> Sequence[str]:
        tr = self.config["training"] if isinstance(self.config, dict) else \
            self.config.training
        target = tr.get("target_instrument") if hasattr(tr, "get") else \
            getattr(tr, "target_instrument", None)
        if target:
            return [target]
        return list(tr["instruments"] if hasattr(tr, "__getitem__")
                    else tr.instruments)

    def make_batch(self, item: Dict[str, Any]):
        """Batch dict -> (mix (B,C,T), target (B,S,C,T)) device arrays."""
        audio = item["audio"]
        mix = np.asarray(audio["mixture"], np.float32)
        if mix.ndim == 2:
            mix = mix[None]
        target = np.stack([np.asarray(audio[s], np.float32) for s in
                           self.target_stems()], axis=1)
        if target.ndim == 3:
            target = target[None]
        mix_j, tgt_j = jnp.asarray(mix), jnp.asarray(target)
        if self.mesh is not None:
            P = jax.sharding.PartitionSpec
            mix_j = jax.device_put(mix_j, jax.sharding.NamedSharding(
                self.mesh, P("data", None, None)))
            tgt_j = jax.device_put(tgt_j, jax.sharding.NamedSharding(
                self.mesh, P("data", None, None, None)))
        return mix_j, tgt_j

    # -- public API ----------------------------------------------------------

    def set_lr_scale(self, scale: float) -> None:
        """For ReduceLROnPlateau-style host-driven LR control."""
        self._lr_scale = float(scale)

    def train_batch(self, item: Dict[str, Any]) -> float:
        if self.augmentor is not None:
            item = self.augmentor(item)
        mix, target = self.make_batch(item)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, mix, target,
            jnp.float32(self._lr_scale))
        self.step += 1
        return float(loss)

    def fit(self, batches: Iterable[Dict[str, Any]], steps: int,
            log_cb: Optional[Callable[[int, float], None]] = None):
        """Run up to ``steps`` train steps over an iterator of batch dicts
        (e.g. :func:`sesa_tpu.data.batch_iterator`). Returns loss list."""
        history = []
        for item in batches:
            loss = self.train_batch(item)
            history.append(loss)
            if log_cb is not None:
                log_cb(self.step, loss)
            if len(history) >= steps:
                break
        return history

    def validate_track(self, item: Dict[str, Any], spec=None,
                       metric: str = "si_snr", window_seconds: float = 2.0):
        """Full-track validation through the REAL chunked overlap-add
        engine (the reference attaches an OverlapAddFader for val/test,
        core/__init__.py:725-729) + chunk-median metrics."""
        from sesa_tpu.metrics import (chunk_median_sdr, chunk_median_si_snr,
                                      chunk_median_snr)
        from sesa_tpu.runtime import DemixSpec, demix

        audio = item["audio"]
        mix = np.asarray(audio["mixture"], np.float32)
        if spec is None:
            audio_cfg = (self.config.get("audio", {})
                         if hasattr(self.config, "get") else self.config.audio)
            chunk = int(audio_cfg.get("chunk_size", 131072))
            spec = DemixSpec(chunk_size=chunk, num_overlap=2, batch_size=2,
                             num_stems=len(self.target_stems()))
        est = demix(lambda p, x: self.model.apply(p, self.config, x),
                    self.params, mix, spec, mesh=self.mesh)
        fs = int((self.config.get("audio", {}) if hasattr(self.config, "get")
                  else self.config.audio).get("sample_rate", 44100))
        window = int(window_seconds * fs)
        fn = {"snr": chunk_median_snr, "si_snr": chunk_median_si_snr,
              "sdr": chunk_median_sdr}[metric]
        out = {}
        for si, stem in enumerate(self.target_stems()):
            ref = np.asarray(audio[stem], np.float32)
            out[stem] = fn(est[si][..., : ref.shape[-1]], ref, window)
        return out

    def save(self, path: str, extra: Optional[Dict[str, Any]] = None) -> str:
        return save_checkpoint(path, jax.device_get(self.params),
                               jax.device_get(self.opt_state), self.step,
                               extra=extra)

    def load(self, path: str) -> None:
        params, opt_state, step, _ = load_checkpoint(
            path, opt_state_template=self.opt_state)
        cast = jax.tree.map(lambda ref, new: jnp.asarray(new, ref.dtype),
                            jax.device_get(self.params), params)
        self.params = cast
        if self.mesh is not None:
            from sesa_tpu.parallel import shard_params
            # same rule as __init__: a custom TP rule must survive resume,
            # or the restored params get the default roformer placement
            self.params = shard_params(self.mesh, self.params,
                                       rule=self._param_rule)
        if opt_state is not None:
            template = self.opt_state
            restored = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template),
                [jnp.asarray(n, jnp.asarray(t).dtype) for t, n in zip(
                    jax.tree_util.tree_leaves(template),
                    jax.tree_util.tree_leaves(opt_state))])
            if self.mesh is not None:
                # moment tensors must sit where their params sit, or the
                # first resumed step pays an all-to-all reshard. Leaves
                # whose template is NOT mesh-placed (e.g. the scalar step
                # count tx.init creates on the default device) stay
                # uncommitted so jit may move them freely.
                def _replace(t, n):
                    if (hasattr(t, "sharding") and isinstance(
                            t.sharding, jax.sharding.NamedSharding)):
                        return jax.device_put(n, t.sharding)
                    return n

                restored = jax.tree.map(_replace, self.opt_state, restored)
            self.opt_state = restored
        self.step = step
