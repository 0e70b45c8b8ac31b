"""Reference-shaped convenience API (the reference's utils.py surface).

Users migrating from the PyTorch reference find the same entry points
(reference utils.py: load_config :26, get_model_from_config :62, demix
:330, normalize/denormalize_audio :199/:220, prefer_target_instrument
:480, apply_tta :241, load_start_checkpoint :585) with models expressed
as (module, params) bundles instead of nn.Modules.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sesa_tpu.configs import load_config  # noqa: F401  (re-export)
from sesa_tpu.runtime.demix import DemixSpec
from sesa_tpu.runtime.demix import apply_tta as _apply_tta
from sesa_tpu.runtime.demix import demix as _demix
from sesa_tpu.runtime.session import (  # noqa: F401
    denormalize_audio,
    normalize_audio,
    prefer_target_instrument,
)


class ModelBundle:
    """(module, config, params) triple with a jittable __call__."""

    def __init__(self, model_type: str, module, config, params=None):
        self.model_type = model_type
        self.module = module
        self.config = config
        self.params = params

    def init(self, seed: int = 0):
        import jax

        self.params = self.module.init(jax.random.PRNGKey(seed), self.config)
        return self.params

    def __call__(self, chunks, compute_dtype=None):
        # signature inspection, NOT try/except TypeError: an exception
        # raised inside a dtype-aware apply must surface, not silently
        # re-run the model at default precision
        import inspect

        accepts = getattr(self.module, "_accepts_compute_dtype", None)
        if accepts is None:
            try:
                accepts = "compute_dtype" in inspect.signature(
                    self.module.apply).parameters
            except (TypeError, ValueError):
                accepts = False
            self.module._accepts_compute_dtype = accepts
        if accepts:
            return self.module.apply(self.params, self.config, chunks,
                                     compute_dtype=compute_dtype)
        return self.module.apply(self.params, self.config, chunks)


def get_model_from_config(model_type: str, config_path: str) -> Tuple[ModelBundle, object]:
    """Reference utils.py:62-161 equivalent: returns (bundle, config)."""
    from sesa_tpu.models import get_model

    config = load_config(model_type, config_path)
    bundle = ModelBundle(model_type, get_model(model_type), config)
    return bundle, config


def load_start_checkpoint(bundle: ModelBundle, checkpoint_path: str,
                          lora_checkpoint: str = "") -> None:
    """Load + convert a torch checkpoint into the bundle (utils.py:585-613).

    ``lora_checkpoint`` merges LoRA deltas into the base state dict before
    conversion (the reference's load_lora_weights / bind_lora_to_model
    pair, utils.py:614-671)."""
    from sesa_tpu.convert import convert_checkpoint, load_torch_state_dict

    if lora_checkpoint:
        from sesa_tpu.convert.lora import load_with_lora

        # the reference builds MergedLinear(**config['lora']) — the same
        # section drives the merge scaling and block routing here
        cfg = (bundle.config.to_dict() if hasattr(bundle.config, "to_dict")
               else dict(bundle.config))
        lora_cfg = dict(cfg.get("lora", {}) or {})
        kwargs = {k: lora_cfg[k] for k in ("r", "lora_alpha", "enable_lora")
                  if k in lora_cfg}
        sd = load_with_lora(checkpoint_path, lora_checkpoint, **kwargs)
    else:
        sd = load_torch_state_dict(checkpoint_path)
    bundle.params = convert_checkpoint(bundle.model_type, sd, bundle.config)


def load_not_compatible_weights(bundle: ModelBundle, checkpoint_path: str,
                                verbose: bool = False) -> None:
    """Load a shape-mismatched checkpoint (reference utils.py:502-558).

    Reference semantics per tensor: same shape -> copy; same rank but
    different shape -> copy the overlapping slice and ZERO-fill the rest
    (the reference builds a zero max-matrix, not the initialized values);
    different rank -> keep the model's current values. The reference
    additionally tolerates missing keys; here the checkpoint must carry
    the full key set (the per-architecture converters consume keys
    strictly), which holds for every real fine-tune of the same family.
    """
    import jax
    import jax.numpy as jnp

    from sesa_tpu.convert import convert_checkpoint, load_torch_state_dict

    if bundle.params is None:
        bundle.init()
    sd = load_torch_state_dict(checkpoint_path)
    loaded = convert_checkpoint(bundle.model_type, sd, bundle.config)

    def slice_copy(dst, src):
        if dst.shape == src.shape:
            return src.astype(dst.dtype)
        if dst.ndim != src.ndim:
            if verbose:
                print(f"rank mismatch {src.shape} -> {dst.shape}: kept")
            return dst
        if verbose:
            print(f"slice-copy {src.shape} -> {dst.shape}")
        sl = tuple(slice(0, min(a, b)) for a, b in zip(dst.shape, src.shape))
        return jnp.zeros(dst.shape, dst.dtype).at[sl].set(src[sl].astype(dst.dtype))

    bundle.params = jax.tree.map(slice_copy, bundle.params, loaded)


def _spec_for(config, model_type: str) -> DemixSpec:
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    audio = cfg.get("audio", {}) or {}
    training = cfg.get("training", {}) or {}
    inference = cfg.get("inference", {}) or {}
    demucs_mode = model_type == "htdemucs"
    if demucs_mode:
        chunk = int(training["samplerate"] * training["segment"])
        stems = len(training["instruments"])
    else:
        chunk = int(audio.get("chunk_size", 352800))
        stems = len(prefer_target_instrument(config))
    return DemixSpec(
        chunk_size=chunk,
        num_overlap=int(inference.get("num_overlap", 2)),
        batch_size=int(inference.get("batch_size", 4)),
        num_stems=stems,
        num_channels=int(audio.get("num_channels", 2)),
        demucs_mode=demucs_mode,
    )


def demix(config, bundle: ModelBundle, mix: np.ndarray, device=None,
          model_type: str = "", pbar: bool = False) -> Dict[str, np.ndarray]:
    """Reference utils.py:330-477 equivalent; ``device`` is ignored (the
    array placement follows JAX's default device)."""
    model_type = model_type or bundle.model_type
    spec = _spec_for(config, model_type)

    def apply_fn(params, chunks):
        out = bundle.module.apply(params, bundle.config, chunks)
        return out[:, None] if out.ndim == 3 else out

    stems = _demix(apply_fn, bundle.params, mix, spec)
    instruments = (list(config.training.instruments) if model_type == "htdemucs"
                   else prefer_target_instrument(config))
    return {name: stems[i] for i, name in enumerate(instruments)}


def apply_tta(config, bundle: ModelBundle, mix, waveforms_orig, device=None,
              model_type: str = "") -> Dict[str, np.ndarray]:
    """Reference utils.py:241-292 equivalent over the dict-of-stems form."""
    model_type = model_type or bundle.model_type
    spec = _spec_for(config, model_type)

    def apply_fn(params, chunks):
        out = bundle.module.apply(params, bundle.config, chunks)
        return out[:, None] if out.ndim == 3 else out

    names = list(waveforms_orig)
    stems = np.stack([waveforms_orig[n] for n in names])
    stems = _apply_tta(apply_fn, bundle.params, np.asarray(mix), stems, spec)
    return {n: stems[i] for i, n in enumerate(names)}
