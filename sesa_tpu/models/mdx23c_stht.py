"""MDX23C with Short-Time Hartley Transform (experimental_mdx23c_stht).

Behavioral spec: reference models/mdx23c_tfc_tdf_v3_with_STHT.py:8-315.
Same TFC-TDF U-Net as mdx23c, but the analysis/synthesis transform is a
real-valued Hartley STFT: H(x) = Re(FFT) − Im(FFT) with a periodic Hamming
window, full n_fft bins (no dim_f crop, no complex channel doubling), and
window²-normalized overlap-add inverse (eps-clamped).

The Hartley spectrum is assembled from the real DFT via the Hermitian
identities H[k] = Re[k] − Im[k] and H[N−k] = Re[k] + Im[k] — still pure
GEMMs on the MXU (no FFT on this backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import mdx23c
from sesa_tpu.ops.fft import rdft
from sesa_tpu.ops.stft import frame_signal, overlap_add


def hamming_window(n: int, dtype=jnp.float32) -> jax.Array:
    """torch.hamming_window(n, periodic=True)."""
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / n)
    return jnp.asarray(w, dtype=dtype)


def hartley(frames: jax.Array) -> jax.Array:
    """(..., N) real -> (..., N) Hartley coefficients (cas transform)."""
    n = frames.shape[-1]
    spec = rdft(frames)  # (..., N//2+1, 2)
    re, im = spec[..., 0], spec[..., 1]
    head = re - im  # k = 0 .. N/2
    # H[N-k] = Re[k] + Im[k] for k = 1 .. N/2-1, reversed
    tail = (re + im)[..., 1 : n - n // 2]
    return jnp.concatenate([head, jnp.flip(tail, axis=-1)], axis=-1)


def stht(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(B, ch, T) -> (B, ch, n_fft, frames) (reference STHT.transform)."""
    window = hamming_window(n_fft, dtype=x.dtype)
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, n_fft, hop) * window  # (B, ch, T', N)
    return jnp.swapaxes(hartley(frames), -1, -2)


def istht(coeffs: jax.Array, n_fft: int, hop: int, length: int) -> jax.Array:
    """(..., n_fft, frames) -> (..., length) with window²-normalized OLA."""
    window = hamming_window(n_fft, dtype=coeffs.dtype)
    frames = hartley(jnp.swapaxes(coeffs, -1, -2)) / n_fft  # inverse Hartley
    frames = frames * window

    batch_shape = frames.shape[:-2]
    n_frames = frames.shape[-2]
    sig = overlap_add(frames.reshape((-1, n_frames, n_fft)), hop)
    out_len = length + n_fft  # reference allocates length + n_fft (center)
    sig = sig[..., :out_len]
    if sig.shape[-1] < out_len:
        sig = jnp.pad(sig, ((0, 0), (0, out_len - sig.shape[-1])))

    wsq = overlap_add(
        jnp.broadcast_to(window * window, (1, n_frames, n_fft)), hop
    )[0]
    wsq = wsq[:out_len]
    if wsq.shape[-1] < out_len:
        wsq = jnp.pad(wsq, (0, out_len - wsq.shape[-1]))
    eps = float(np.finfo(np.float32).eps)
    sig = sig / jnp.maximum(wsq, eps)

    pad = n_fft // 2
    sig = sig[..., pad:-pad][..., :length]
    return sig.reshape(batch_shape + (length,))


def _transform_pair(config):
    n_fft = config.audio.n_fft
    hop = config.audio.hop_length

    def analysis(x, _config):
        return stht(x, n_fft, hop)

    def synthesis(spec, _config, length):
        batch_dims = spec.shape[:-3]
        c, f, t = spec.shape[-3:]
        flat = spec.reshape((-1, f, t))
        wav = istht(flat, n_fft, hop, length)
        return wav.reshape(batch_dims + (c, length))

    return analysis, synthesis


def init(rng, config):
    return mdx23c.init(rng, config, hartley=True)


def apply(params, config, x):
    return mdx23c.apply(params, config, x, transform=_transform_pair(config),
                        hartley=True)


def convert_torch(state_dict, config):
    return mdx23c.convert_torch(state_dict, config, hartley=True)
