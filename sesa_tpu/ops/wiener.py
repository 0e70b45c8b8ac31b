"""Multichannel Wiener filtering (EM), RI-native for TPU.

Behavioral spec: the openunmix ``filtering.wiener`` /
``expectation_maximization`` algorithm as used by the reference's
htdemucs output stage (reference models/demucs4ht.py:487-517, which calls
``openunmix.filtering.wiener`` per 300-frame window). This is a fresh
implementation of the published algorithm in real/imag-stacked form — the
axon TPU backend has no complex dtypes — and it processes all frames in
one shot (no window loop: XLA fuses the frame-summed statistics, and the
per-frame covariance solve is a closed-form 1x1/2x2 complex inverse).

Shapes follow openunmix conventions with a trailing RI axis:
  targets  (T, F, C, S)      nonnegative magnitude estimates per source
  mix      (T, F, C, 2)      mixture STFT, RI
  returns  (T, F, C, 2, S)   filtered source STFTs, RI
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# this backend's DEFAULT matmul precision is bf16-level (see ops/fft.py);
# the EM statistics and gain solves need full f32 accumulation
_HIGHEST = jax.lax.Precision.HIGHEST


# ---- complex helpers on a trailing RI axis --------------------------------

def _cmul(a, b):
    """(..., 2) x (..., 2) complex multiply."""
    re = a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1]
    im = a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]
    return jnp.stack([re, im], axis=-1)


def _cconj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def _cmatmul(a, b):
    """(..., M, K, 2) @ (..., K, N, 2) complex matmul."""
    re = jnp.einsum("...mk,...kn->...mn", a[..., 0], b[..., 0],
                    precision=_HIGHEST) - jnp.einsum(
        "...mk,...kn->...mn", a[..., 1], b[..., 1], precision=_HIGHEST)
    im = jnp.einsum("...mk,...kn->...mn", a[..., 0], b[..., 1],
                    precision=_HIGHEST) + jnp.einsum(
        "...mk,...kn->...mn", a[..., 1], b[..., 0], precision=_HIGHEST)
    return jnp.stack([re, im], axis=-1)


def _cinv(m):
    """Inverse of (..., C, C, 2) complex matrices; closed form for C<=2."""
    c = m.shape[-2]
    if c == 1:
        den = m[..., 0] ** 2 + m[..., 1] ** 2
        return (_cconj(m) / jnp.maximum(den[..., None], 1e-30))
    if c == 2:
        a, b = m[..., 0, 0, :], m[..., 0, 1, :]
        cc, d = m[..., 1, 0, :], m[..., 1, 1, :]
        det = _cmul(a, d) - _cmul(b, cc)
        den = det[..., 0] ** 2 + det[..., 1] ** 2
        idet = _cconj(det) / jnp.maximum(den[..., None], 1e-30)
        row0 = jnp.stack([_cmul(d, idet), -_cmul(b, idet)], axis=-2)
        row1 = jnp.stack([-_cmul(cc, idet), _cmul(a, idet)], axis=-2)
        return jnp.stack([row0, row1], axis=-3)
    # general C: complex inverse via the real 2Cx2C block matrix
    # [[Re, -Im], [Im, Re]]^-1 = [[Re', -Im'], [Im', Re']]
    re, im = m[..., 0], m[..., 1]
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    inv = jnp.linalg.inv(jnp.concatenate([top, bot], axis=-2))
    return jnp.stack([inv[..., :c, :c], inv[..., c:, :c]], axis=-1)


# ---- the filter ------------------------------------------------------------

def wiener_ri(targets, mix, niters, softmask=False, residual=False,
              scale_factor=10.0, eps=1e-10):
    """Multichannel Wiener EM filter in RI form (see module docstring).

    ``niters`` EM iterations refine the initial estimates; ``niters=0``
    returns the initialization (mix-phase magnitudes, or the soft mask when
    ``softmask``). ``residual`` appends a (mix - sum) source that joins the
    EM but is kept in the output (callers drop it, matching the reference).
    """
    t, f, c, s = targets.shape
    if softmask:
        frac = targets / (eps + targets.sum(axis=-1, keepdims=True))
        # mix (T,F,C,2) x frac (T,F,C,S) -> (T,F,C,2,S)
        y = mix[..., None] * frac[..., None, :]
    else:
        ang = jnp.arctan2(mix[..., 1], mix[..., 0])  # (T,F,C)
        y = jnp.stack([targets * jnp.cos(ang)[..., None],
                       targets * jnp.sin(ang)[..., None]], axis=-2)
    if residual:
        y = jnp.concatenate([y, mix[..., None] - y.sum(axis=-1, keepdims=True)],
                            axis=-1)
        s = s + 1
    if niters == 0:
        return y

    mag = jnp.sqrt(mix[..., 0] ** 2 + mix[..., 1] ** 2)
    max_abs = jnp.maximum(1.0, mag.max() / scale_factor)
    mix = mix / max_abs
    y = y / max_abs

    reg = jnp.sqrt(eps) * jnp.eye(c)  # (C, C) real regularizer
    for _ in range(niters):
        # PSD per source: mean over channels of |y|^2 -> (T, F, S)
        v = (y[..., 0, :] ** 2 + y[..., 1, :] ** 2).mean(axis=-2)
        # spatial covariance per source: (F, C, C, 2)
        # R_j = sum_T y_c1 y_c2^* / (eps + sum_T v_j)
        num_re = jnp.einsum("tfas,tfbs->fabs", y[..., 0, :], y[..., 0, :],
                            precision=_HIGHEST) + \
                 jnp.einsum("tfas,tfbs->fabs", y[..., 1, :], y[..., 1, :],
                            precision=_HIGHEST)
        num_im = jnp.einsum("tfas,tfbs->fabs", y[..., 1, :], y[..., 0, :],
                            precision=_HIGHEST) - \
                 jnp.einsum("tfas,tfbs->fabs", y[..., 0, :], y[..., 1, :],
                            precision=_HIGHEST)
        den = eps + v.sum(axis=0)  # (F, S)
        r = jnp.stack([num_re, num_im], axis=-1) / den[:, None, None, :, None]

        # mixture covariance: (T, F, C, C, 2)
        cxx = jnp.einsum("tfs,fabsr->tfabr", v, r, precision=_HIGHEST)
        cxx = cxx.at[..., 0].add(reg)
        inv_cxx = _cinv(cxx)

        # gain_j = v_j R_j inv_Cxx; y_j = gain_j mix
        rj = jnp.moveaxis(r, -2, 0)  # (S, F, C, C, 2)
        gain = _cmatmul(rj[:, None], inv_cxx[None])  # (S, T, F, C, C, 2)
        gain = gain * jnp.moveaxis(v, -1, 0)[..., None, None, None]
        ynew = _cmatmul(gain, mix[None, ..., None, :])[..., 0, :]  # (S,T,F,C,2)
        y = jnp.moveaxis(ynew, 0, -1)  # (T, F, C, 2, S)

    return y * max_abs
