"""Mel-Band Conformer — the mel band-split stack with axial Conformers.

Behavioral spec: reference models/mel_band_conformer.py:129-424 — identical
band machinery to Mel-Band RoFormer (binarized mel bands, BandSplit and
MaskEstimator, scatter-add mask averaging) but the time/freq blocks are
lucidrains Conformers and there is no final norm (each ConformerBlock
post-norms itself).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import conformer_core as cc
from sesa_tpu.models.bs_roformer import RoformerSpec, _make_take
from sesa_tpu.models.mel_band_roformer import mel_band_feats
from sesa_tpu.ops import bands as B
from sesa_tpu.ops.prec import net_precision
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST


def _kwargs(config):
    kw = dict(dim=192, depth=6, stereo=False, num_stems=1,
              time_conformer_depth=2, freq_conformer_depth=2, num_bands=60,
              dim_head=64, heads=8, ff_mult=4, conv_expansion_factor=2,
              conv_kernel_size=31, sample_rate=44100, stft_n_fft=2048,
              stft_hop_length=512, stft_win_length=2048, stft_normalized=False,
              mask_estimator_depth=1, match_input_audio_length=False)
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    return kw


def _plan(kw):
    feats = mel_band_feats(kw["num_bands"], kw["sample_rate"], kw["stft_n_fft"],
                           kw["stereo"])
    ch = 2 if kw["stereo"] else 1
    n_features = (kw["stft_n_fft"] // 2 + 1) * ch * 2
    return B.make_band_plan([np.asarray(f, dtype=np.int32) for f in feats],
                            n_features)


def init(rng, config):
    kw = _kwargs(config)
    plan = _plan(kw)
    keys = iter(jax.random.split(rng, 4 + 2 * kw["depth"] + kw["num_stems"]))
    conf_kwargs = dict(dim_head=kw["dim_head"], heads=kw["heads"],
                       ff_mult=kw["ff_mult"],
                       conv_expansion_factor=kw["conv_expansion_factor"],
                       conv_kernel_size=kw["conv_kernel_size"])
    layers = [
        {"time": cc.conformer_init(next(keys), kw["dim"],
                                   kw["time_conformer_depth"], **conf_kwargs),
         "freq": cc.conformer_init(next(keys), kw["dim"],
                                   kw["freq_conformer_depth"], **conf_kwargs)}
        for _ in range(kw["depth"])
    ]
    return {
        "band_split": B.band_split_init(next(keys), plan, kw["dim"]),
        "layers": layers,
        "mask_estimators": [
            # mel MLP convention: n_hidden == mask_estimator_depth
            B.mask_estimator_init(next(keys), plan, kw["dim"],
                                  kw["mask_estimator_depth"], 4)
            for _ in range(kw["num_stems"])
        ],
    }


def apply(params, config, x, precision=None, compute_dtype=None):
    """(B, ch, T) -> (B, num_stems, ch, T).

    ``compute_dtype``: run the band-split/conformer/mask net in this dtype
    (bf16 on TPU); STFT/iSTFT and the mask application stay float32."""
    precision = net_precision(precision, compute_dtype)
    kw = _kwargs(config)
    plan = _plan(kw)
    b, ch, t = x.shape

    window = hann_window(kw["stft_win_length"], dtype=x.dtype)
    s = stft_ri(x, kw["stft_n_fft"], kw["stft_hop_length"], window,
                win_length=kw["stft_win_length"], normalized=kw["stft_normalized"])
    tf = s.shape[-2]
    n_features = plan.num_features
    sp = jnp.transpose(s, (0, 3, 2, 1, 4)).reshape(b, tf, n_features)

    net_in = sp if compute_dtype is None else sp.astype(compute_dtype)
    if compute_dtype is not None:
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    xb = B.band_split_apply(plan, params["band_split"], net_in,
                            precision=precision)
    nb, dim = plan.num_bands, kw["dim"]

    def one_layer(z, layer):
        zz = jnp.transpose(z, (0, 2, 1, 3)).reshape(b * nb, tf, dim)
        zz = cc.conformer_apply(layer["time"], zz, kw["heads"],
                                precision=precision)
        z = jnp.transpose(zz.reshape(b, nb, tf, dim), (0, 2, 1, 3))
        zz = z.reshape(b * tf, nb, dim)
        zz = cc.conformer_apply(layer["freq"], zz, kw["heads"],
                                precision=precision)
        return zz.reshape(b, tf, nb, dim)

    # depth-loop compile strategy (same as bs_roformer.apply): the layer
    # stack is homogeneous by construction, so run ONE lax.scan over
    # stacked per-depth params — XLA compiles the [time+freq] body once
    # instead of depth times (the chain's minutes-long first-run compile
    # was dominated by these unrolled depth programs). N-way body unroll
    # buys back the loop overhead; 0 = fully unrolled program.
    unroll = int(os.environ.get("SESA_CONFORMER_SCAN_UNROLL", "2"))
    if unroll > 0 and len(params["layers"]) > 1:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

        def scan_body(z, layer):
            return one_layer(z, layer), None

        xb, _ = jax.lax.scan(scan_body, xb, stacked,
                             unroll=min(unroll, len(params["layers"])))
    else:
        for layer in params["layers"]:
            xb = one_layer(xb, layer)

    masks = jnp.stack(
        [B.mask_estimator_apply(plan, p, xb, precision=precision)
         for p in params["mask_estimators"]], axis=1).astype(jnp.float32)

    nstems = masks.shape[1]
    m = masks.reshape(b, nstems, tf, n_features // 2, 2)
    sr_ = sp.reshape(b, 1, tf, n_features // 2, 2)
    re = m[..., 0] * sr_[..., 0] - m[..., 1] * sr_[..., 1]
    im = m[..., 0] * sr_[..., 1] + m[..., 1] * sr_[..., 0]
    out = jnp.stack([re, im], axis=-1)
    n_freq = kw["stft_n_fft"] // 2 + 1
    out = out.reshape(b, nstems, tf, n_freq, ch, 2)
    out = jnp.transpose(out, (0, 1, 4, 3, 2, 5))

    wav = istft_ri(out, kw["stft_n_fft"], kw["stft_hop_length"], window,
                   win_length=kw["stft_win_length"],
                   normalized=kw["stft_normalized"], length=t)
    return wav


def convert_torch(state_dict, config):
    """Band/mask keys identical to the roformer family; axial blocks are
    lucidrains Conformers at layers.{d}.{0,1}."""
    kw = _kwargs(config)
    plan = _plan(kw)
    sd, used, take = _make_take(cc.apply_key_map(state_dict))

    bs_groups = []
    for ids in plan.group_band_ids:
        bs_groups.append({
            "norm_gamma": jnp.stack([take(f"band_split.to_features.{i}.0.gamma") for i in ids]),
            "weight": jnp.stack([take(f"band_split.to_features.{i}.1.weight").T for i in ids]),
            "bias": jnp.stack([take(f"band_split.to_features.{i}.1.bias") for i in ids]),
        })

    layers = []
    for d in range(kw["depth"]):
        layers.append({
            "time": cc.convert_conformer(take, f"layers.{d}.0", kw["time_conformer_depth"]),
            "freq": cc.convert_conformer(take, f"layers.{d}.1", kw["freq_conformer_depth"]),
        })

    mask_estimators = []
    for s in range(kw["num_stems"]):
        # mel MLP convention: depth hidden layers, not depth-1 (reference
        # mel_band_conformer.py:45; see RoformerSpec.mask_hidden_layers)
        n_hidden = kw["mask_estimator_depth"]
        hidden = [
            {"weight": jnp.stack([take(f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.weight").T
                                  for i in range(plan.num_bands)]),
             "bias": jnp.stack([take(f"mask_estimators.{s}.to_freqs.{i}.0.{2*li}.bias")
                                for i in range(plan.num_bands)])}
            for li in range(n_hidden)
        ]
        last = 2 * n_hidden
        groups = [
            {"weight": jnp.stack([take(f"mask_estimators.{s}.to_freqs.{i}.0.{last}.weight").T for i in ids]),
             "bias": jnp.stack([take(f"mask_estimators.{s}.to_freqs.{i}.0.{last}.bias") for i in ids])}
            for ids in plan.group_band_ids
        ]
        mask_estimators.append({"hidden": hidden, "groups": groups})

    params = {"band_split": {"groups": bs_groups}, "layers": layers,
              "mask_estimators": mask_estimators}
    unused = {k for k in set(sd) - used
              if not k.endswith(("freq_indices", "freqs_per_band",
                                 "num_freqs_per_band", "num_bands_per_freq"))}
    if unused:
        raise ValueError(
            f"unconsumed checkpoint keys: {sorted(unused)[:8]} ... — this "
            "conformer-family checkpoint's module layout differs from the "
            "assumed lucidrains reconstruction (frozen in "
            "tests/fixtures/layouts/). See README 'Conformer checkpoint "
            "layout recovery' for what to report and how to supply a key "
            "mapping (SESA_CONFORMER_KEY_MAP).")
    return params
