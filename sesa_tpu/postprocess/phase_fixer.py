"""Phase fixer: transfer vocal-model phase into an instrumental stem.

Behavioral spec: reference phase_fixer.py:6-109. STFT (2048/512 hann) of
source and target; a frequency-dependent blend factor (``base`` below
``low_cutoff``, ``base + scale`` above ``high_cutoff``, linear ramp
between) mixes the phases; the result is wrapped to (−π, π], magnitude is
kept from the target, and the signal is resynthesized at the source
length. All math runs as one jitted RI-spectrum program on device.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

# curated GUI model lists (reference phase_fixer.py:111-139)
SOURCE_MODELS = [
    "VOCALS-MelBand-Roformer (by Becruily)",
    "VOCALS-Mel-Roformer big beta 4 (by unwa)",
    "VOCALS-Melband-Roformer BigBeta5e (by unwa)",
    "VOCALS-big_beta6 (by Unwa)",
    "VOCALS-big_beta6X (by Unwa)",
    "VOCALS-MelBand-Roformer (by KimberleyJSN)",
    "VOCALS-MelBand-Roformer Kim FT (by Unwa)",
    "VOCALS-MelBand-Roformer Kim FT 2 (by Unwa)",
    "VOCALS-MelBand-Roformer Kim FT 2 Blendless (by unwa)",
    "VOCALS-Mel-Roformer FT 3 Preview (by unwa)",
    "VOCALS-BS-Roformer_1296 (by viperx)",
    "VOCALS-BS-Roformer_1297 (by viperx)",
    "VOCALS-BS-RoformerLargev1 (by unwa)",
    "bs_roformer_revive (by unwa)",
]

TARGET_MODELS = [
    "INST-MelBand-Roformer (by Becruily)",
    "INST-Mel-Roformer v1 (by unwa)",
    "INST-Mel-Roformer v2 (by unwa)",
    "inst_v1e (by unwa)",
    "INST-Mel-Roformer v1e+ (by unwa)",
    "Inst_GaboxV7 (by Gabox)",
    "INST-VOC-Mel-Roformer a.k.a. duality (by unwa)",
    "INST-VOC-Mel-Roformer a.k.a. duality v2 (by unwa)",
    "inst_gabox (by Gabox)",
    "inst_gaboxFlowersV10 (by Gabox)",
]


def blend_factors(freqs: jax.Array, low_cutoff: float, high_cutoff: float,
                  base_factor: float, scale_factor: float) -> jax.Array:
    """Frequency-dependent phase blend factor (reference phase_fixer.py:6-23).

    Raises on low_cutoff >= high_cutoff like the reference (:11-12) — the
    ramp denominator would otherwise produce NaN/garbage blends silently."""
    if low_cutoff >= high_cutoff:
        raise ValueError(
            f"low_cutoff ({low_cutoff}) must be less than high_cutoff "
            f"({high_cutoff})")
    ramp = base_factor + scale_factor * (freqs - low_cutoff) / (high_cutoff - low_cutoff)
    f = jnp.where(freqs < low_cutoff, base_factor, ramp)
    return jnp.where(freqs > high_cutoff, base_factor + scale_factor, f)


def phase_fix_arrays(
    source: np.ndarray,
    target: np.ndarray,
    sr: int,
    low_cutoff: float = 500.0,
    high_cutoff: float = 9000.0,
    base_factor: float = 0.25,
    scale_factor: float = 1.4,
    return_device: bool = False,
):
    """Blend source phase into target: (ch, T) arrays -> fixed (ch, T_src).

    ``source``/``target`` may be host numpy or device arrays (a chain that
    already holds the song on device skips the re-upload), and
    ``return_device=True`` leaves the result on device so a downstream
    demix consumes it without a host round trip (~1 s saved per 60 s song
    on the relay link).
    """
    n_fft, hop = 2048, 512
    window = hann_window(n_fft)
    length = source.shape[-1]
    tmin = min(source.shape[-1], target.shape[-1])
    # the reference raises on ANY shape mismatch (phase_fixer.py:7-8); we
    # tolerate sub-hop drift from decoders but refuse real length gaps —
    # silently zero-padding seconds of output would masquerade as success
    if abs(source.shape[-1] - target.shape[-1]) > hop:
        raise ValueError(
            f"source/target lengths differ by "
            f"{abs(source.shape[-1] - target.shape[-1])} samples "
            f"({source.shape[-1]} vs {target.shape[-1]}); phase fixing "
            "requires the same audio span")

    src = jnp.asarray(source[..., :tmin]).astype(jnp.float32)
    tgt = jnp.asarray(target[..., :tmin]).astype(jnp.float32)

    s = stft_ri(src, n_fft, hop, window)
    t = stft_ri(tgt, n_fft, hop, window)
    fixed = blend_spectra(s, t, sr, low_cutoff, high_cutoff, base_factor, scale_factor)
    out = istft_ri(fixed, n_fft, hop, window, length=length)
    return out if return_device else np.asarray(out)


@functools.partial(
    jax.jit,
    static_argnames=("method", "sr", "low_cutoff", "high_cutoff",
                     "base_factor", "scale_factor", "length"))
def _ensemble_phase_fix(src, stack, weights, *, method, sr, low_cutoff,
                        high_cutoff, base_factor, scale_factor, length):
    from sesa_tpu.ops.fft import force_device_mats
    from sesa_tpu.postprocess.ensemble import combine_stack_device

    # trace-time: generate the 2048-point DFT tables on device instead of
    # baking ~17 MB of cos/sin constants into this whole-song executable —
    # the one-off recompute is noise next to the full-song STFT GEMMs, and
    # the slim program remote-compiles/loads far faster on a cold relay
    with force_device_mats():
        ens = combine_stack_device(stack, method, weights)
        n_fft, hop = 2048, 512
        window = hann_window(n_fft)
        s = stft_ri(src, n_fft, hop, window)
        t = stft_ri(ens, n_fft, hop, window)
        fixed = blend_spectra(s, t, sr, low_cutoff, high_cutoff,
                              base_factor, scale_factor)
        return istft_ri(fixed, n_fft, hop, window, length=length)


def ensemble_phase_fix_device(
    source,
    waves,
    sr: int,
    method: str = "avg_wave",
    weights=None,
    low_cutoff: float = 500.0,
    high_cutoff: float = 9000.0,
    base_factor: float = 0.25,
    scale_factor: float = 1.4,
):
    """Waveform ensemble + phase fix as ONE fused XLA program.

    The device-resident auto-ensemble chain (two separations -> combine ->
    phase fix -> Apollo) previously ran this stage eagerly: ~30 small op
    dispatches (each a relay round trip) plus a whole-song ``istft_ri``
    executable carrying ~17 MB of baked DFT constants that cost minutes of
    remote compile on a cold relay (BENCH_r04 ensemble compile_s 408).
    Fusing combine+STFT+blend+iSTFT yields one slim executable: one
    dispatch, one cache entry, device-generated DFT tables.

    ``source`` is the mix (phase donor, reference auto_ensemble flow);
    ``waves`` the model stems (device arrays from
    ``DemixJob.collect_device``). Returns a device array at the source
    length, like ``phase_fix_arrays(..., return_device=True)``.
    """
    if method.endswith("_fft"):
        raise ValueError(
            f"fused ensemble+phase-fix supports waveform methods only, "
            f"got {method!r}")
    if not waves:
        raise ValueError("no input waveforms")
    length = source.shape[-1]
    tmin = min([w.shape[-1] for w in waves] + [length])
    if abs(length - tmin) > 512:
        raise ValueError(
            f"source/stem lengths differ by {abs(length - tmin)} samples; "
            "phase fixing requires the same audio span")
    src = jnp.asarray(source[..., :tmin]).astype(jnp.float32)
    stack = jnp.stack([jnp.asarray(w[..., :tmin], jnp.float32)
                       for w in waves])
    w = (None if weights is None
         else jnp.asarray(weights, dtype=jnp.float32))
    # resynthesize at the SOURCE length like phase_fix_arrays (tolerating
    # sub-hop decoder drift)
    return _ensemble_phase_fix(
        src, stack, w, method=method, sr=int(sr),
        low_cutoff=float(low_cutoff), high_cutoff=float(high_cutoff),
        base_factor=float(base_factor), scale_factor=float(scale_factor),
        length=int(length))


def blend_spectra(s: jax.Array, t: jax.Array, sr: int,
                  low_cutoff: float, high_cutoff: float,
                  base_factor: float, scale_factor: float) -> jax.Array:
    """Blend source phase into target magnitude on RI spectra (..., F, T, 2).

    Note the blend operates on WRAPPED angles (like the reference), so bins
    whose angle sits at ±π are chaotically sensitive to STFT rounding — a
    property of the algorithm, not the implementation.
    """
    n_fft = 2 * (s.shape[-3] - 1)
    src_phase = jnp.arctan2(s[..., 1], s[..., 0])
    tgt_phase = jnp.arctan2(t[..., 1], t[..., 0])
    tgt_mag = jnp.sqrt(t[..., 0] ** 2 + t[..., 1] ** 2)

    freqs = jnp.linspace(0.0, sr // 2, n_fft // 2 + 1)
    bf = blend_factors(freqs, low_cutoff, high_cutoff, base_factor, scale_factor)
    blended = (1.0 - bf)[:, None] * tgt_phase + bf[:, None] * src_phase
    blended = jnp.remainder(blended + jnp.pi, 2 * jnp.pi) - jnp.pi

    return jnp.stack([tgt_mag * jnp.cos(blended), tgt_mag * jnp.sin(blended)], axis=-1)


def process_phase_fix(
    source_file: str,
    target_file: str,
    output_folder: str,
    low_cutoff: float = 500.0,
    high_cutoff: float = 9000.0,
    scale_factor: float = 1.4,
    output_format: str = "flac",
) -> Tuple[Optional[str], str]:
    """File-level surface matching reference phase_fixer.py:89-109."""
    from sesa_tpu.audio_io import read_audio, write_audio

    os.makedirs(output_folder, exist_ok=True)
    try:
        src, sr_s = read_audio(source_file)
        tgt, sr_t = read_audio(target_file)
        if sr_s != sr_t:
            raise ValueError("Sample rates of source and target audio files must match.")

        fixed = phase_fix_arrays(src, tgt, sr_s, low_cutoff, high_cutoff,
                                 scale_factor=scale_factor)

        name = os.path.splitext(os.path.basename(target_file))[0]
        for tag in ("_other", "_vocals", "_instrumental", "_Other", "_Vocals", "_Instrumental"):
            name = name.replace(tag, "")
        ext = ".flac" if output_format == "flac" else ".wav"
        out_path = os.path.join(output_folder, f"{name.strip()} (Fixed Instrumental){ext}")
        write_audio(out_path, fixed, sr_s, subtype="PCM_16" if output_format == "flac" else "FLOAT")
        return out_path, "Phase fix completed successfully!"
    except Exception as e:
        return None, f"Error during phase fix: {e}"
