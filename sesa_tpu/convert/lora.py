"""LoRA checkpoint support: merge adapters into base weights at load time.

The reference binds loralib MergedLinear modules into the model and loads
adapter weights non-strictly (reference utils.py:561-671). For inference
the adapters can be merged exactly: W' = W + scaling * (B @ A) — with
MergedLinear's ``enable_lora`` column masking when only a subset of the
fused output blocks (e.g. q and v of a qkv projection) carry adapters.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def merge_lora(
    base: Dict[str, np.ndarray],
    lora: Dict[str, np.ndarray],
    r: Optional[int] = None,
    lora_alpha: int = 1,
    enable_lora: Optional[Sequence[bool]] = None,
) -> Dict[str, np.ndarray]:
    """Return a new state dict with LoRA deltas merged into base weights.

    ``lora`` holds ``<prefix>.lora_A`` (r*k, in) / ``<prefix>.lora_B``
    (out_enabled, r) pairs for weights named ``<prefix>.weight``.
    """
    merged = dict(base)
    for key in list(lora):
        if not key.endswith(".lora_A"):
            continue
        prefix = key[: -len(".lora_A")]
        a = np.asarray(lora[key], dtype=np.float32)
        b = np.asarray(lora[f"{prefix}.lora_B"], dtype=np.float32)
        wkey = f"{prefix}.weight"
        if wkey not in merged:
            continue
        w = np.asarray(merged[wkey], dtype=np.float32)

        rank = r or (a.shape[0] if enable_lora is None
                     else a.shape[0] // sum(enable_lora))
        scaling = lora_alpha / rank

        if enable_lora is None or all(enable_lora):
            delta = (b @ a) * scaling  # (out, in)
            if delta.shape != w.shape:
                raise ValueError(f"LoRA delta shape {delta.shape} != {w.shape} for {prefix}")
            merged[wkey] = w + delta
        else:
            # MergedLinear: the fused output dim is split into len(enable_lora)
            # equal blocks; only enabled blocks receive deltas
            n_blocks = len(enable_lora)
            out_dim = w.shape[0]
            block = out_dim // n_blocks
            n_en = sum(enable_lora)
            a_blocks = a.reshape(n_en, rank, -1)
            b_blocks = b.reshape(n_en, block, rank)
            w = w.copy()
            bi = 0
            for blk, en in enumerate(enable_lora):
                if not en:
                    continue
                delta = (b_blocks[bi] @ a_blocks[bi]) * scaling
                w[blk * block : (blk + 1) * block] += delta
                bi += 1
            merged[wkey] = w
    return merged


def load_with_lora(checkpoint_path: str, lora_path: str, **kwargs):
    """Load a base checkpoint and merge a LoRA adapter checkpoint into it."""
    from sesa_tpu.convert.torch_ckpt import load_torch_state_dict

    base = load_torch_state_dict(checkpoint_path)
    lora = load_torch_state_dict(lora_path)
    return merge_lora(base, lora, **kwargs)
