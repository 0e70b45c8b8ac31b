"""Warmup CLI: compiles the real demix executables for a model/config."""

import os

import numpy as np
import pytest

from sesa_tpu import warmup
from sesa_tpu.cache import cache_dir, enable_persistent_cache

TINY_MDX23C_YAML = """
audio:
  n_fft: 256
  hop_length: 64
  dim_f: 128
  num_channels: 2
  chunk_size: 4032
  sample_rate: 44100
model:
  num_subbands: 2
  num_scales: 2
  scale: [2, 2]
  num_blocks_per_scale: 1
  num_channels: 8
  growth: 4
  bottleneck_factor: 2
  norm: InstanceNorm
  act: gelu
training:
  instruments: [vocals, other]
  target_instrument: null
inference:
  num_overlap: 2
  batch_size: 2
"""


def test_warmup_compiles_and_caches(tmp_path, monkeypatch):
    cfg = tmp_path / "mdx23c.yaml"
    cfg.write_text(TINY_MDX23C_YAML)
    monkeypatch.setenv("SESA_CACHE_DIR", str(tmp_path / "cache"))
    rc = warmup.main([
        "--model_type", "mdx23c", "--config_path", str(cfg),
        "--song_seconds", "1", "--compute_dtype", "f32",
    ])
    assert rc == 0
    assert cache_dir() == str(tmp_path / "cache")


def test_cache_dir_env_override(monkeypatch):
    monkeypatch.setenv("SESA_CACHE_DIR", "/tmp/somewhere")
    assert cache_dir() == "/tmp/somewhere"
    assert enable_persistent_cache() in (True, False)
