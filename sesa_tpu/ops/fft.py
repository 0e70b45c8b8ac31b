"""GEMM-native real DFT / inverse real DFT for TPU.

The TPU backend here implements neither ``fft`` nor complex dtypes, so the
DFT is computed as real matrix multiplications on the MXU — the natural
TPU-first formulation (all FLOPs land on the systolic array, and the DFT
matmul fuses with neighbouring elementwise work under XLA).

Spectra use the "RI" convention throughout the framework: a trailing axis of
size 2 holding (real, imag), matching ``torch.view_as_real`` layouts used by
every reference model (e.g. reference models/mdx23c_tfc_tdf_v3.py:27,
models/bs_roformer/bs_roformer.py:490).

Matmuls run at ``Precision.HIGHEST``: the backend's default matmul precision
is bf16-level (measured max-abs error ~0.17 on unit-variance 256x256), which
would destroy STFT parity; HIGHEST measures ~4e-5.

The current implementation is the direct O(N^2) matmul (one GEMM per real /
imag plane); a Cooley-Tukey two-stage GEMM factorization (N = N1*N2 costs
~(N1+N2)/N of the direct form) is the planned perf-pass upgrade.
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=32)
def _rdft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward rDFT matrices C, S of shape (n, n//2+1): X = x@C + i x@S."""
    k = np.arange(n // 2 + 1)
    t = np.arange(n)
    ang = -2.0 * np.pi * np.outer(t, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _irdft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT matrices Ci, Si of shape (n//2+1, n): x = Xr@Ci + Xi@Si."""
    nk = n // 2 + 1
    k = np.arange(nk)
    t = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, t) / n
    w = np.full(nk, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    ci = (w[:, None] * np.cos(ang) / n).astype(np.float32)
    si = (-w[:, None] * np.sin(ang) / n).astype(np.float32)
    return ci, si


# Above this transform size the f32 basis matrices are generated ON DEVICE
# from integer iotas instead of baked into the program as constants: at
# n_fft 8192 the baked cos/sin planes alone are ~270 MB of HLO constants,
# which blows past the remote compiler's request limit (HTTP 413). The
# integer (t*k) mod n reduction keeps every angle in [0, 2pi) exactly, so
# device-side f32 cos/sin match the host f64-then-cast tables to ~1e-7.
# int32 products stay exact up to n = 32768.
#
# The threshold sits ABOVE 4096: scnet's 4096-point bases are ~67 MB of
# constants, which the compiler still takes, and regenerating them per
# call measurably slowed scnet (bench 6.3x -> 4.7x when the threshold
# was 4096). Only 8192+ transforms pay the on-device recompute.
_DEVICE_MATS_MIN_N = 8192

_tls = threading.local()


def _min_device_n() -> int:
    return getattr(_tls, "device_mats_min_n", _DEVICE_MATS_MIN_N)


@contextlib.contextmanager
def force_device_mats(min_n: int = 0):
    """Trace-time override: generate DFT tables on device for any
    n >= ``min_n`` within this thread. Used by whole-song fused programs
    (e.g. the ensemble+phase-fix chain) whose embedded 2048-point tables
    would otherwise bloat the executable the remote compiler must ingest;
    per-chunk model programs keep the baked-constant default (regenerating
    a 4096-point basis per chunk measurably slowed scnet). Thread-local so
    concurrently-tracing demix worker threads are unaffected."""
    old = getattr(_tls, "device_mats_min_n", None)
    _tls.device_mats_min_n = min_n
    try:
        yield
    finally:
        if old is None:
            del _tls.device_mats_min_n
        else:
            _tls.device_mats_min_n = old


def _dft_angles(rows: int, cols: int, n: int) -> jax.Array:
    t = jax.lax.iota(jnp.int32, rows)
    k = jax.lax.iota(jnp.int32, cols)
    phase = (t[:, None] * k[None, :]) % n
    return phase.astype(jnp.float32) * jnp.float32(2.0 * np.pi / n)


def _rdft_mats_dev(n: int) -> tuple[jax.Array, jax.Array]:
    assert n <= 32768, "int32 phase reduction limit"
    ang = _dft_angles(n, n // 2 + 1, n)  # = +2pi t k / n
    return jnp.cos(ang), -jnp.sin(ang)  # forward kernel uses -2pi t k / n


def _irdft_mats_dev(n: int) -> tuple[jax.Array, jax.Array]:
    assert n <= 32768, "int32 phase reduction limit"
    nk = n // 2 + 1
    ang = _dft_angles(nk, n, n)
    k = jax.lax.iota(jnp.int32, nk)
    w = jnp.where((k == 0) | ((n % 2 == 0) & (k == nk - 1)), 1.0, 2.0)
    ci = w[:, None] * jnp.cos(ang) * (1.0 / n)
    si = -w[:, None] * jnp.sin(ang) * (1.0 / n)
    return ci, si


def rdft(x: jax.Array) -> jax.Array:
    """Real DFT: (..., N) real -> (..., N//2+1, 2) RI spectrum."""
    n = x.shape[-1]
    if n >= _min_device_n():
        c, s = _rdft_mats_dev(n)
    else:
        ch, sh = _rdft_mats(n)
        c, s = jnp.asarray(ch), jnp.asarray(sh)
    re = jnp.matmul(x, c, precision=_HIGHEST)
    im = jnp.matmul(x, s, precision=_HIGHEST)
    return jnp.stack([re, im], axis=-1)


def rdft_ortho(x: jax.Array) -> jax.Array:
    """Ortho-normalized real DFT (torch.fft.rfft(..., norm='ortho'))."""
    n = x.shape[-1]
    return rdft(x) * (n ** -0.5)


def irdft_ortho(spec_ri: jax.Array, n: int) -> jax.Array:
    """Ortho-normalized inverse real DFT (torch.fft.irfft(..., norm='ortho'))."""
    return irdft(spec_ri, n) * (n ** 0.5)


def irdft(spec_ri: jax.Array, n: int) -> jax.Array:
    """Inverse real DFT: (..., N//2+1, 2) RI spectrum -> (..., N) real."""
    if n >= _min_device_n():
        ci, si = _irdft_mats_dev(n)
    else:
        cih, sih = _irdft_mats(n)
        ci, si = jnp.asarray(cih), jnp.asarray(sih)
    re = spec_ri[..., 0]
    im = spec_ri[..., 1]
    return jnp.matmul(re, ci, precision=_HIGHEST) + jnp.matmul(
        im, si, precision=_HIGHEST
    )
