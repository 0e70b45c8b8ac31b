"""model_type string → model module dispatch.

Mirrors the reference dispatcher ``get_model_from_config``
(reference utils.py:62-161). Each entry is imported lazily so an
unfinished/optional model doesn't break the rest of the zoo.
"""

from __future__ import annotations

import importlib

# model_type -> module path (all expose init/apply/convert_torch)
MODEL_TYPES = {
    "mdx23c": "sesa_tpu.models.mdx23c",
    "bs_roformer": "sesa_tpu.models.bs_roformer",
    "mel_band_roformer": "sesa_tpu.models.mel_band_roformer",
    "bs_roformer_experimental": "sesa_tpu.models.bs_roformer_experimental",
    "bs_roformer_custom": "sesa_tpu.models.bs_roformer_custom",
    "mel_band_roformer_experimental": "sesa_tpu.models.mel_band_roformer_experimental",
    "scnet": "sesa_tpu.models.scnet",
    "scnet_unofficial": "sesa_tpu.models.scnet_unofficial",
    "scnet_tran": "sesa_tpu.models.scnet_tran",
    "scnet_masked": "sesa_tpu.models.scnet_masked",
    "htdemucs": "sesa_tpu.models.htdemucs",
    "apollo": "sesa_tpu.models.apollo",
    "bs_mamba2": "sesa_tpu.models.bs_mamba2",
    "bandit": "sesa_tpu.models.bandit",
    "bandit_v2": "sesa_tpu.models.bandit_v2",
    "conformer": "sesa_tpu.models.conformer",
    "mel_band_conformer": "sesa_tpu.models.mel_band_conformer",
    "experimental_mdx23c_stht": "sesa_tpu.models.mdx23c_stht",
    "segm_models": "sesa_tpu.models.segm_models",
    "torchseg": "sesa_tpu.models.segm_models",
    "swin_upernet": "sesa_tpu.models.swin_upernet",
}


def get_model(model_type: str):
    """Return the model module for a model_type string."""
    if model_type not in MODEL_TYPES:
        raise ValueError(
            f"Unknown model type: {model_type!r} (known: {sorted(MODEL_TYPES)})"
        )
    return importlib.import_module(MODEL_TYPES[model_type])
