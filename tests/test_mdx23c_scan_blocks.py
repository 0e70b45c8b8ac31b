"""Scan-over-blocks path in mdx23c matches the unrolled composition.

The oracle suite uses num_blocks_per_scale=1 (no scan); this covers the
multi-block groups the InstVocHQ shape actually uses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import mdx23c


def _config(k_blocks):
    return ConfigDict({
        "audio": dict(n_fft=512, hop_length=128, dim_f=256, num_channels=2,
                      chunk_size=8064, sample_rate=44100),
        "model": dict(num_subbands=2, num_scales=2, scale=[2, 2],
                      num_blocks_per_scale=k_blocks, num_channels=8, growth=4,
                      bottleneck_factor=2, norm="InstanceNorm", act="gelu"),
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def test_scan_matches_unrolled(monkeypatch):
    config = _config(3)
    params = mdx23c.init(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 2, 8064)).astype(np.float32) * 0.1)

    monkeypatch.setattr(mdx23c, "_SCAN_BLOCKS", 1)
    scan = np.asarray(mdx23c.apply(params, config, x))
    monkeypatch.setattr(mdx23c, "_SCAN_BLOCKS", 0)
    loop = np.asarray(mdx23c.apply(params, config, x))
    np.testing.assert_allclose(scan, loop, atol=1e-6, rtol=1e-6)
