"""Mel-Band RoFormer — the roformer stack over overlapping mel bands.

Behavioral spec: reference models/bs_roformer/mel_band_roformer.py:324-668.
Differences from BS-RoFormer: the band layout comes from a binarized
librosa mel filterbank (overlapping bands; masks scatter-add back to
frequencies and are averaged by coverage, :603-612), each Transformer
carries its own output RMSNorm (norm_output defaults True) and there is no
model-level final_norm, and mask_estimator_depth defaults to 1.
"""

from __future__ import annotations

import numpy as np

from sesa_tpu.models.bs_roformer import (
    RoformerSpec,
    _IGNORED_CONFIG_KEYS,
    apply_from_spec,
    convert_from_spec,
    init_from_spec,
)
from sesa_tpu.ops.mel import mel_filter_bank


def mel_band_feats(num_bands: int, sample_rate: int, n_fft: int, stereo: bool):
    """Per-band packed-feature index arrays from the binarized mel bank.

    Matches reference mel_band_roformer.py:410-447: force fb[0,0] and
    fb[-1,-1] positive, binarize, then for each band take its freq bins;
    packed features are (f·ch + s)·2 + c with s, c minor.
    """
    fb = mel_filter_bank(sample_rate, n_fft, num_bands)
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    mask = fb > 0
    assert mask.any(axis=0).all(), "all frequencies must be covered by some band"
    ch = 2 if stereo else 1
    feats = []
    for bidx in range(num_bands):
        freqs = np.nonzero(mask[bidx])[0]
        # expand each freq to its (stereo, complex) features, f-major
        f = (freqs[:, None] * ch * 2 + np.arange(ch * 2)[None, :]).reshape(-1)
        feats.append(f.astype(np.int32))
    return tuple(tuple(f.tolist()) for f in feats)


_MEL_IGNORED = _IGNORED_CONFIG_KEYS | {"sample_rate", "num_bands"}


def spec_from_config(model_cfg: dict) -> RoformerSpec:
    cfg = {k: v for k, v in dict(model_cfg).items() if k not in _MEL_IGNORED}
    if "use_value_residual_learning" in cfg:  # experimental variant naming
        cfg["value_residual"] = bool(cfg.pop("use_value_residual_learning"))
    num_bands = int(dict(model_cfg).get("num_bands", 60))
    sample_rate = int(dict(model_cfg).get("sample_rate", 44100))
    cfg.setdefault("mask_estimator_depth", 1)
    stereo = bool(cfg.get("stereo", False))
    n_fft = int(cfg.get("stft_n_fft", 2048))
    feats = mel_band_feats(num_bands, sample_rate, n_fft, stereo)
    # the mel file's MLP builder has one more hidden layer per depth than
    # the bs file's (reference mel_band_roformer.py:271 vs bs_roformer.py:262)
    return RoformerSpec(band_feats=feats, mel_mlp_convention=True, **cfg)


def init(rng, config):
    return init_from_spec(rng, spec_from_config(config.model),
                          transformer_norm_output=True, final_norm=False)


def apply(params, config, x, precision=None, compute_dtype=None):
    return apply_from_spec(params, spec_from_config(config.model), x,
                           precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return convert_from_spec(state_dict, spec_from_config(config.model),
                             transformer_norm_output=True, final_norm=False)
