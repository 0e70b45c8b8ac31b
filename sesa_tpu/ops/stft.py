"""torch-compatible STFT / iSTFT as pure JAX functions, complex-free on device.

Every model in the reference embeds its own analysis/synthesis transform built
on ``torch.stft`` / ``torch.istft`` (e.g. reference models/mdx23c_tfc_tdf_v3.py:7-44,
models/bs_roformer/bs_roformer.py:485,575, models/scnet/scnet.py:338,368).
Here there is ONE shared implementation whose semantics match ``torch.stft``:

- ``center=True`` pads the signal by ``n_fft // 2`` on both sides
  (reflect by default, matching torch's default ``pad_mode='reflect'``)
- ``win_length < n_fft`` zero-pads the window symmetrically to ``n_fft``
- ``normalized=True`` multiplies the STFT by ``n_fft ** -0.5`` (and the
  iSTFT frames by ``n_fft ** 0.5``), verified empirically against torch
- iSTFT overlap-adds windowed inverse-DFT frames and divides by the
  overlap-added squared-window envelope (NOLA normalization), then crops
  the center padding and trims/pads to ``length``

The device API is RI-native — spectra are real arrays with a trailing
(real, imag) axis of size 2 — because this TPU backend supports neither
complex dtypes nor a native FFT (see ``sesa_tpu.ops.fft``). ``stft``/``istft``
complex wrappers exist for host-side tests and interop.

Framing uses ``lax.conv_general_dilated_patches`` so XLA lowers it to an
efficient strided-window extraction on TPU instead of a scalar gather loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.ops.fft import irdft, rdft


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window(n, periodic=True)``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _pad_window(window: jax.Array, n_fft: int) -> jax.Array:
    """Center a short window inside an ``n_fft``-length zero buffer (torch semantics)."""
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Extract sliding frames: (..., T) -> (..., n_frames, frame_length).

    When ``hop`` divides ``frame_length`` (the usual STFT case) this is a
    pure reshape + k shifted slices — zero FLOPs and exact. (An earlier
    version used ``conv_general_dilated_patches``, but that lowers to a
    one-hot convolution that runs at the backend's default bf16 matmul
    precision on TPU, silently rounding the samples themselves.) The
    irregular-hop fallback is an int32 gather, also exact.
    """
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    if frame_length % hop == 0:
        k = frame_length // hop
        n_rows = t // hop
        xr = x[..., : n_rows * hop].reshape(batch_shape + (n_rows, hop))
        cols = [xr[..., s : s + n_frames, :] for s in range(k)]
        return jnp.concatenate(cols, axis=-1)
    idx = np.arange(n_frames, dtype=np.int32)[:, None] * hop + np.arange(
        frame_length, dtype=np.int32
    )
    return jnp.take(x, jnp.asarray(idx), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "normalized", "pad_mode"),
)
def stft_ri(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: Optional[jax.Array] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    normalized: bool = False,
    pad_mode: str = "reflect",
) -> jax.Array:
    """RI STFT of ``x`` with ``torch.stft`` semantics.

    Args:
      x: real signal, shape ``(..., T)``.
    Returns:
      real array of shape ``(..., n_fft // 2 + 1, n_frames, 2)`` — the last
      axis is (real, imag), matching ``torch.view_as_real(torch.stft(...))``.
    """
    if win_length is None:
        win_length = n_fft if window is None else window.shape[0]
    if window is None:
        window = jnp.ones((win_length,), dtype=x.dtype)
    window = _pad_window(window, n_fft)

    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * window
    spec = rdft(frames)  # (..., n_frames, F, 2)
    if normalized:
        spec = spec * (n_fft ** -0.5)
    return jnp.swapaxes(spec, -2, -3)  # (..., F, n_frames, 2)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """OLA (B, n_frames, frame_len) -> (B, frame_len + hop*(n_frames-1)).

    When ``hop`` divides the frame length this is k static slice-adds over a
    (B, n_frames+k-1, hop) accumulator — no scatter, which serializes badly
    on TPU (measured 40x slower than this form). Irregular hops fall back
    to a scatter-add.
    """
    b, n_frames, frame_len = frames.shape
    out_len = frame_len + hop * (n_frames - 1)
    if frame_len % hop == 0:
        k = frame_len // hop
        fr = frames.reshape(b, n_frames, k, hop)
        acc = jnp.zeros((b, n_frames + k - 1, hop), dtype=frames.dtype)
        for s in range(k):
            acc = acc.at[:, s : s + n_frames].add(fr[:, :, s])
        return acc.reshape(b, (n_frames + k - 1) * hop)
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len), dtype=frames.dtype)
    return sig.at[:, jnp.asarray(idx, dtype=jnp.int32)].add(
        frames.reshape(b, n_frames * frame_len)
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "normalized", "length"),
)
def istft_ri(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    window: Optional[jax.Array] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    normalized: bool = False,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse RI STFT with ``torch.istft`` semantics.

    Args:
      spec: real array ``(..., F, n_frames, 2)`` with ``F == n_fft // 2 + 1``.
    Returns:
      real array ``(..., out_length)``.
    """
    if win_length is None:
        win_length = n_fft if window is None else window.shape[0]
    if window is None:
        window = jnp.ones((win_length,), dtype=spec.dtype)
    window = _pad_window(window, n_fft)

    batch_shape = spec.shape[:-3]
    f, n_frames = spec.shape[-3:-1]
    assert f == n_fft // 2 + 1, f"expected {n_fft // 2 + 1} freq bins, got {f}"

    frames = irdft(jnp.swapaxes(spec, -2, -3), n_fft)  # (..., n_frames, n_fft)
    if normalized:
        frames = frames * (n_fft ** 0.5)
    frames = frames * window  # synthesis window

    out_len = n_fft + hop_length * (n_frames - 1)
    sig = overlap_add(frames.reshape((-1, n_frames, n_fft)), hop_length)
    sig = sig.reshape(batch_shape + (out_len,))

    # NOLA normalization by the overlap-added squared window envelope.
    wsq = overlap_add(
        jnp.broadcast_to(window * window, (1, n_frames, n_fft)), hop_length
    )[0]
    sig = sig / jnp.where(wsq > 1e-11, wsq, 1.0)

    if center:
        pad = n_fft // 2
        end = out_len - pad if length is None else pad + length
        sig = sig[..., pad:end]
        if length is not None and sig.shape[-1] < length:
            sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, length - sig.shape[-1])])
    elif length is not None:
        sig = sig[..., :length]
        if sig.shape[-1] < length:
            sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, length - sig.shape[-1])])
    return sig


def stft(x, n_fft, hop_length, window=None, **kwargs):
    """Complex-output convenience wrapper over :func:`stft_ri` (host/tests)."""
    ri = stft_ri(x, n_fft, hop_length, window, **kwargs)
    return jax.lax.complex(ri[..., 0], ri[..., 1])


def istft(spec, n_fft, hop_length, window=None, **kwargs):
    """Complex-input convenience wrapper over :func:`istft_ri` (host/tests)."""
    ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return istft_ri(ri, n_fft, hop_length, window, **kwargs)
