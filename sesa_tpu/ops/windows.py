"""Fade windows for chunked overlap-add blending.

Matches the reference's linear fade window (reference utils.py:295-327
``_getWindowingArray``): first ``fade_size`` samples ramp 0→1, last
``fade_size`` ramp 1→0, ones in between. Note torch's ``linspace(0, 1, n)``
includes both endpoints, so ``window[0] == 0`` and ``window[-1] == 0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fade_window(window_size: int, fade_size: int, dtype=jnp.float32) -> jax.Array:
    w = np.ones(window_size, dtype=np.float64)
    if fade_size > 0:  # w[-0:] would select (and clobber) the whole array
        w[:fade_size] = np.linspace(0.0, 1.0, fade_size)
        w[-fade_size:] = np.linspace(1.0, 0.0, fade_size)
    return jnp.asarray(w, dtype=dtype)
