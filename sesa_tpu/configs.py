"""Per-model YAML configuration loading.

Same config surface as the reference (reference utils.py:26-59
``load_config``): YAML → ml_collections.ConfigDict with sections
``audio.*``, ``model.*``, ``training.*``, ``inference.*``. htdemucs
configs use an OmegaConf-style layout; loaded with plain YAML here and
wrapped in the same ConfigDict (OmegaConf is not a dependency).
"""

from __future__ import annotations

import yaml
from ml_collections import ConfigDict


def load_config(model_type: str, config_path: str) -> ConfigDict:
    with open(config_path) as f:
        data = yaml.load(f, Loader=yaml.FullLoader)
    return ConfigDict(data)


def config_from_dict(data: dict) -> ConfigDict:
    return ConfigDict(data)
