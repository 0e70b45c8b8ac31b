"""SCNet masked variant.

Behavioral spec: reference models/scnet/scnet_masked.py — base SCNet plus
a learnable frequency positional embedding on the input spectrum, a
conv/GELU/conv/Tanh mask head, and an explicit complex mask applied to the
tiled mixture spectrum instead of direct synthesis (:333-415). Uses a
periodic hann window (unlike base SCNet's boxcar).
"""

from sesa_tpu.models import scnet


def init(rng, config):
    return scnet.init(rng, config, variant="masked")


def apply(params, config, x, precision=None, compute_dtype=None):
    return scnet.apply(params, config, x, variant="masked",
                       compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return scnet.convert_torch(state_dict, config, variant="masked")
