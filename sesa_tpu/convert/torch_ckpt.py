"""PyTorch checkpoint → JAX parameter pytree conversion.

Handles the zoo's inconsistent state-dict layouts the way the reference
does (reference utils.py:502-613, inference_pytorch.py:326-369): unwraps
``state`` (htdemucs), ``state_dict`` (apollo/lightning), and ``model``
keys, strips DataParallel ``module.`` prefixes, and reports corrupted
files (HTML error pages masquerading as checkpoints,
pytorch_backend.py:256-279) with actionable messages.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.ckpt/.chpt file into {key: numpy array}."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    size = os.path.getsize(path)
    if size < 1024:
        raise ValueError(
            f"checkpoint file is only {size} bytes — likely a failed download "
            f"(HTML error page); re-download it: {path}"
        )
    with open(path, "rb") as f:
        head = f.read(256).lstrip().lower()
    if head.startswith((b"<!doctype", b"<html")):
        raise ValueError(
            f"checkpoint is an HTML page, not model weights — the download "
            f"URL probably needs the HuggingFace /blob/->/resolve/ fix: {path}"
        )

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)

    # unwrap known containers
    for key in ("state", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"unsupported checkpoint structure in {path}: {type(obj)}")

    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue  # skip non-tensor entries (schedulers, counters, ...)
        if k.startswith("module."):
            k = k[len("module."):]
        t = v.detach()
        if t.dtype == torch.bfloat16:
            t = t.float()
        out[k] = t.numpy()
    return out


def convert_checkpoint(model_type: str, state_dict: Dict[str, np.ndarray], config):
    """Dispatch to the model's converter."""
    from sesa_tpu.models import get_model

    return get_model(model_type).convert_torch(state_dict, config)
