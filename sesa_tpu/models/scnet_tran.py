"""SCNet with dual-path transformers (scnet_tran).

Behavioral spec: reference models/scnet/scnet_tran.py — the SCNet
encoder/decoder with the separation net's BiLSTMs replaced by RoPE
transformers (DualPathTran, :196-247). The reference declares an unused
first_conv (kept for checkpoint compatibility). The STFT is boxcar-windowed
like base SCNet.
"""

from sesa_tpu.models import scnet


def init(rng, config):
    return scnet.init(rng, config, variant="tran")


def apply(params, config, x, precision=None, compute_dtype=None):
    return scnet.apply(params, config, x, variant="tran",
                       compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return scnet.convert_torch(state_dict, config, variant="tran")
