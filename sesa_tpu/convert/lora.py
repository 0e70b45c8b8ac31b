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

        n_en = sum(enable_lora) if enable_lora else 1
        rank = r or a.shape[0] // n_en
        scaling = lora_alpha / rank

        if enable_lora is not None and len(enable_lora) > 1:
            # MergedLinear (any enable pattern, incl. all-True): loralib
            # stacks A as (n_en*r, in) and B as (n_en*block, r); the fused
            # output dim splits into len(enable_lora) equal blocks and
            # only enabled blocks receive deltas. A plain b @ a would be
            # dimensionally invalid here even when every block is enabled.
            n_blocks = len(enable_lora)
            out_dim = w.shape[0]
            block = out_dim // n_blocks
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
        else:
            if b.shape[1] != a.shape[0] or (b.shape[0], a.shape[1]) != w.shape:
                raise ValueError(
                    f"LoRA pair shapes A{a.shape} / B{b.shape} do not form "
                    f"a {w.shape} delta for {prefix}: the adapter looks "
                    "like a MergedLinear checkpoint — pass the config's "
                    "lora section (r/lora_alpha/enable_lora) so the blocks "
                    "can be routed correctly")
            delta = (b @ a) * scaling  # (out, in)
            if delta.shape != w.shape:
                raise ValueError(
                    f"LoRA delta shape {delta.shape} != {w.shape} for "
                    f"{prefix}: the adapter looks like a MergedLinear "
                    "checkpoint — pass the config's lora section "
                    "(r/lora_alpha/enable_lora) so the blocks can be "
                    "routed correctly")
            merged[wkey] = w + delta

    # the reference loads the adapter non-strictly into the model
    # (utils.py:581-582, strict=False): every OTHER matching tensor in the
    # adapter file (biases with lora bias modes, fine-tuned norms/heads)
    # overrides the base value too
    for key, value in lora.items():
        if key.endswith((".lora_A", ".lora_B")):
            continue
        if key in merged:
            merged[key] = value
    return merged


def load_with_lora(checkpoint_path: str, lora_path: str, **kwargs):
    """Load a base checkpoint and merge a LoRA adapter checkpoint into it."""
    from sesa_tpu.convert.torch_ckpt import load_torch_state_dict

    base = load_torch_state_dict(checkpoint_path)
    lora = load_torch_state_dict(lora_path)
    return merge_lora(base, lora, **kwargs)
