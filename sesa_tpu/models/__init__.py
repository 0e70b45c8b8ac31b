"""Model zoo: pure-function models over parameter pytrees.

Each model module exposes:

- ``init(rng, config) -> params`` — random parameter pytree
- ``apply(params, config, mix[B, ch, T]) -> [B, S, ch, T]`` — jittable forward
- ``convert_torch(state_dict, config) -> params`` — PyTorch checkpoint import

Dispatch by ``model_type`` string mirrors the reference's
``get_model_from_config`` (reference utils.py:62-161).
"""

from sesa_tpu.models.registry import get_model, MODEL_TYPES
