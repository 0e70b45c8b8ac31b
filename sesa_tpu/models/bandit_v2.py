"""Bandit v2 — band-split RNN with musical band layout (cinematic 3-stem).

Behavioral spec: reference models/bandit_v2/ (bandit.py:22-366,
bandsplit.py, tfmodel.py, maskestim.py, utils.py:296-370). Stereo input is
processed as independent mono channels. Pipeline: window-energy-normalized
STFT (torchaudio Spectrogram semantics: constant pad, scale by
1/sqrt(sum(win^2))) → per-band LayerNorm+Linear embeds over a 64-band
musical (octave-spaced, overlapping) filterbank → 12 × [time BiLSTM, band
BiLSTM] residual modules → per-stem per-band LayerNorm/MLP/GLU complex
masks, scatter-added over overlaps with normalized filterbank weights →
mask × mixture → iSTFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

_HIGHEST = jax.lax.Precision.HIGHEST


def hz_to_midi(f):
    return 12.0 * np.log2(np.maximum(np.asarray(f, dtype=np.float64), 1e-12) / 440.0) + 69.0


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, dtype=np.float64) - 69.0) / 12.0)


def musical_band_specs(n_fft: int, fs: int, n_bands: int):
    """Octave-spaced overlapping bands (reference utils.py:324-356,90-124).

    Returns (band_specs [(start, end)), freq_weights [per-band (bw,)]).
    """
    n_freqs = n_fft // 2 + 1
    df = fs / n_fft
    f_max = fs / 2
    f_min = fs / n_fft

    n_octaves = np.log2(f_max / f_min)
    bandwidth_mult = 2.0 ** (n_octaves / n_bands)

    low_midi = max(0.0, float(hz_to_midi(f_min)))
    high_midi = float(hz_to_midi(f_max))
    hz_pts = midi_to_hz(np.linspace(low_midi, high_midi, n_bands))

    low_bins = np.floor(hz_pts / bandwidth_mult / df).astype(int)
    high_bins = np.ceil(hz_pts * bandwidth_mult / df).astype(int)

    fb = np.zeros((n_bands, n_freqs))
    for i in range(n_bands):
        fb[i, low_bins[i] : high_bins[i] + 1] = 1.0
    fb[0, : low_bins[0]] = 1.0
    fb[-1, high_bins[-1] + 1 :] = 1.0

    weight_per_bin = fb.sum(axis=0, keepdims=True)
    normalized = fb / weight_per_bin

    band_specs, freq_weights = [], []
    for i in range(n_bands):
        active = np.nonzero(fb[i])[0]
        if len(active) == 0:
            continue
        start, end = int(active[0]), int(active[-1]) + 1
        band_specs.append((start, end))
        freq_weights.append(normalized[i, start:end].astype(np.float32))
    return band_specs, freq_weights


def _kwargs(config):
    kw = dict(in_channels=1, stems=["speech", "music", "effects"], n_bands=64,
              n_sqm_modules=12, emb_dim=128, rnn_dim=256, mlp_dim=512,
              n_fft=2048, win_length=2048, hop_length=512, fs=44100,
              use_freq_weights=True, complex_mask=True)
    src = dict(config.kwargs) if hasattr(config, "kwargs") and config.kwargs else dict(config.model)
    kw.update({k: v for k, v in src.items() if k in kw})
    if kw["in_channels"] != 1:
        # apply() folds audio channels into the batch and treats the
        # spectral channel axis as 1 throughout; accepting a different
        # in_channels would initialize weights the forward cannot run
        raise NotImplementedError(
            f"bandit_v2 in_channels={kw['in_channels']} is not supported: "
            "the port (like every released checkpoint) runs per-channel "
            "with in_channels=1")
    return kw


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config):
    kw = _kwargs(config)
    specs, _ = musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    emb, rnn_dim, mlp = kw["emb_dim"], kw["rnn_dim"], kw["mlp_dim"]
    in_ch = kw["in_channels"]
    keys = iter(jax.random.split(rng, 8 + 4 * len(specs) * (1 + len(kw["stems"]))
                                 + 8 * kw["n_sqm_modules"]))

    def lin(ci, co):
        k1, k2 = jax.random.split(next(keys))
        return {"weight": L.kaiming_uniform(k1, (co, ci), ci),
                "bias": L.kaiming_uniform(k2, (co,), ci)}

    def lstm_dir(d, h):
        k = iter(jax.random.split(next(keys), 4))
        return {"weight_ih": L.kaiming_uniform(next(k), (4 * h, d), h),
                "weight_hh": L.kaiming_uniform(next(k), (4 * h, h), h),
                "bias_ih": L.kaiming_uniform(next(k), (4 * h,), h),
                "bias_hh": L.kaiming_uniform(next(k), (4 * h,), h)}

    band_split = []
    for (s, e) in specs:
        bw = e - s
        band_split.append({
            "norm": {"weight": jnp.ones((in_ch * bw * 2,)),
                     "bias": jnp.zeros((in_ch * bw * 2,))},
            "fc": lin(in_ch * bw * 2, emb),
        })

    seqband = []
    for _ in range(2 * kw["n_sqm_modules"]):
        seqband.append({
            "norm": {"weight": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
            "lstm": {"fwd": lstm_dir(emb, rnn_dim), "bwd": lstm_dir(emb, rnn_dim)},
            "fc": lin(2 * rnn_dim, emb),
        })

    mask_estim = {}
    for stem in kw["stems"]:
        bands = []
        for (s, e) in specs:
            bw = e - s
            bands.append({
                "norm": {"weight": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
                "hidden": lin(emb, mlp),
                "output": lin(mlp, bw * in_ch * 2 * 2),
            })
        mask_estim[stem] = bands

    return {"band_split": band_split, "seqband": seqband, "mask_estim": mask_estim}


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def apply(params, config, x, precision=None):
    """(B, ch, T) -> (B, stems, ch, T)."""
    precision = precision or _HIGHEST
    kw = _kwargs(config)
    specs, freq_weights = musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    n_freq = kw["n_fft"] // 2 + 1
    emb = kw["emb_dim"]
    stems = list(kw["stems"])
    b, ch, t_samples = x.shape

    # mono channels processed independently (reference bandit.py:193-200)
    mono = x.reshape(b * ch, t_samples)
    window = hann_window(kw["win_length"], dtype=x.dtype)
    # torchaudio Spectrogram(normalized=True): scale by 1/sqrt(sum(win^2))
    scale = 1.0 / jnp.sqrt(jnp.sum(window * window))
    spec = stft_ri(mono, kw["n_fft"], kw["hop_length"], window,
                   win_length=kw["win_length"], pad_mode="constant") * scale
    tf = spec.shape[-2]  # frames
    # (B', 1, F, T, 2) with in_channels=1
    spec = spec[:, None]

    # band split: (B', T, in_ch, bw, 2) -> LayerNorm -> Linear
    zs = []
    for i, (s, e) in enumerate(specs):
        xb = spec[:, :, s:e]  # (B', 1, bw, T, 2)
        xb = jnp.transpose(xb, (0, 3, 1, 2, 4))  # (B', T, 1, bw, 2)
        xb = xb.reshape(xb.shape[0], tf, -1)
        p = params["band_split"][i]
        xb = L.layer_norm(xb, p["norm"])
        zs.append(L.linear(xb, p["fc"], precision=precision))
    z = jnp.stack(zs, axis=1)  # (B', n_bands, T, emb)

    # seq-band modelling: alternate LSTM over time and over bands
    for j, p in enumerate(params["seqband"]):
        z0 = z
        zn = L.layer_norm(z, p["norm"])
        bb, d1, d2, _ = zn.shape
        flat = zn.reshape(bb * d1, d2, emb)
        out = L.bilstm(flat, p["lstm"], precision=precision)
        out = L.linear(out, p["fc"], precision=precision)
        z = z0 + out.reshape(bb, d1, d2, emb)
        z = jnp.swapaxes(z, 1, 2)  # Transpose(1, 2) after every module

    q = z  # (B', n_bands, T, emb) — 2*n_modules transposes = identity parity

    outputs = []
    for stem in stems:
        mask_re = jnp.zeros((b * ch, n_freq, tf), dtype=jnp.float32)
        mask_im = jnp.zeros((b * ch, n_freq, tf), dtype=jnp.float32)
        for i, (s, e) in enumerate(specs):
            bw = e - s
            p = params["mask_estim"][stem][i]
            qb = q[:, i]  # (B', T, emb)
            h = L.layer_norm(qb, p["norm"])
            h = jnp.tanh(L.linear(h, p["hidden"], precision=precision))
            o = L.linear(h, p["output"], precision=precision)
            a, g = jnp.split(o, 2, axis=-1)
            o = a * jax.nn.sigmoid(g)  # GLU -> (B', T, bw*in_ch*2)
            o = o.reshape(b * ch, tf, 1, bw, 2)
            o = jnp.transpose(o, (0, 2, 3, 1, 4))[:, 0]  # (B', bw, T, 2)
            if kw["use_freq_weights"]:
                fw = jnp.asarray(freq_weights[i])[:, None]
                o = o * fw[..., None]
            mask_re = mask_re.at[:, s:e].add(o[..., 0])
            mask_im = mask_im.at[:, s:e].add(o[..., 1])

        # complex mask × mixture
        sr_ = spec[:, 0]  # (B', F, T, 2)
        est_re = sr_[..., 0] * mask_re - sr_[..., 1] * mask_im
        est_im = sr_[..., 0] * mask_im + sr_[..., 1] * mask_re
        est = jnp.stack([est_re, est_im], axis=-1) / scale
        wav = istft_ri(est, kw["n_fft"], kw["hop_length"], window,
                       win_length=kw["win_length"], length=t_samples)
        outputs.append(wav.reshape(b, ch, t_samples))

    return jnp.stack(outputs, axis=1)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    kw = _kwargs(config)
    specs, _ = musical_band_specs(kw["n_fft"], kw["fs"], kw["n_bands"])
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("._orig_mod", "")  # torch.compile wrapper remnants
        sd[k] = jnp.asarray(np.asarray(v))
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def wb(prefix):
        return {"weight": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    band_split = [
        {"norm": wb(f"band_split.norm_fc_modules.{i}.combined.0"),
         "fc": wb(f"band_split.norm_fc_modules.{i}.combined.1")}
        for i in range(len(specs))
    ]

    seqband = []
    for j in range(0, 4 * kw["n_sqm_modules"], 2):  # RNNs at even Sequential slots
        p = f"tf_model.seqband.{j}"
        seqband.append({
            "norm": wb(f"{p}.norm"),
            "lstm": {
                "fwd": {"weight_ih": take(f"{p}.rnn.weight_ih_l0"),
                        "weight_hh": take(f"{p}.rnn.weight_hh_l0"),
                        "bias_ih": take(f"{p}.rnn.bias_ih_l0"),
                        "bias_hh": take(f"{p}.rnn.bias_hh_l0")},
                "bwd": {"weight_ih": take(f"{p}.rnn.weight_ih_l0_reverse"),
                        "weight_hh": take(f"{p}.rnn.weight_hh_l0_reverse"),
                        "bias_ih": take(f"{p}.rnn.bias_ih_l0_reverse"),
                        "bias_hh": take(f"{p}.rnn.bias_hh_l0_reverse")},
            },
            "fc": wb(f"{p}.fc"),
        })

    mask_estim = {}
    for stem in kw["stems"]:
        bands = []
        for i in range(len(specs)):
            p = f"mask_estim.{stem}.norm_mlp.{i}.combined"
            bands.append({
                "norm": wb(f"{p}.0"),
                "hidden": wb(f"{p}.1.0"),
                "output": wb(f"{p}.2.0"),
            })
            used.add(f"mask_estim.{stem}.freq_weights/{i}")  # buffer, recomputed
        mask_estim[stem] = bands

    params = {"band_split": band_split, "seqband": seqband, "mask_estim": mask_estim}

    def _alias(k):
        # v2's NormMLP registers its norm/hidden/output modules BOTH as
        # attributes and inside `combined = Sequential(...)` (reference
        # bandit_v2/maskestim.py:31-79), so real checkpoints carry the
        # same tensors twice; the converter reads the combined.* copies
        import re

        return re.search(r"\.norm_mlp\.\d+\.(norm|hidden|output)\.", k)

    unused = {k for k in set(sd) - used
              if not k.startswith(("stft.", "istft.")) and "freq_weights" not in k
              and not _alias(k)}
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
