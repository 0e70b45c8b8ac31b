"""Auxiliary subsystems: LoRA merge, throughput tracking, model info, export."""

import numpy as np

from sesa_tpu.convert.lora import merge_lora
from sesa_tpu.runtime.profiling import ThroughputTracker, get_model_info


def test_merge_lora_full():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 4)).astype(np.float32)
    a = rng.standard_normal((2, 4)).astype(np.float32)  # (r, in)
    b = rng.standard_normal((8, 2)).astype(np.float32)  # (out, r)
    merged = merge_lora({"lin.weight": w}, {"lin.lora_A": a, "lin.lora_B": b},
                        r=2, lora_alpha=4)
    np.testing.assert_allclose(merged["lin.weight"], w + (b @ a) * 2.0, atol=1e-6)


def test_merge_lora_partial_blocks():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((12, 4)).astype(np.float32)  # 3 blocks of 4 (qkv)
    a = rng.standard_normal((4, 4)).astype(np.float32)   # 2 enabled * r=2
    b = rng.standard_normal((8, 2)).astype(np.float32)   # 2 enabled * block 4
    merged = merge_lora({"qkv.weight": w},
                        {"qkv.lora_A": a, "qkv.lora_B": b},
                        lora_alpha=2, enable_lora=[True, False, True])
    out = merged["qkv.weight"]
    np.testing.assert_array_equal(out[4:8], w[4:8])  # disabled block untouched
    assert not np.allclose(out[:4], w[:4])
    assert not np.allclose(out[8:], w[8:])


def test_merge_lora_all_enabled_merged_linear():
    """MergedLinear with every block enabled still stores A/B in the
    stacked per-block layout — a plain b @ a is dimensionally invalid, so
    the per-block path must route it (review regression)."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((12, 4)).astype(np.float32)  # 3 blocks of 4
    a = rng.standard_normal((6, 4)).astype(np.float32)   # 3 enabled * r=2
    b = rng.standard_normal((12, 2)).astype(np.float32)  # 3 enabled * block 4
    merged = merge_lora({"qkv.weight": w},
                        {"qkv.lora_A": a, "qkv.lora_B": b},
                        r=2, lora_alpha=4, enable_lora=[True, True, True])
    out = merged["qkv.weight"]
    for blk in range(3):
        delta = (b[blk * 4:(blk + 1) * 4] @ a[blk * 2:(blk + 1) * 2]) * 2.0
        np.testing.assert_allclose(out[blk * 4:(blk + 1) * 4],
                                   w[blk * 4:(blk + 1) * 4] + delta, atol=1e-6)


def test_merge_lora_applies_non_lora_adapter_keys():
    """Reference loads adapters non-strictly (utils.py:581-582): biases or
    fine-tuned norms saved alongside lora_A/lora_B must override base."""
    w = np.zeros((4, 4), dtype=np.float32)
    norm = np.ones((4,), dtype=np.float32)
    new_norm = np.full((4,), 2.0, dtype=np.float32)
    merged = merge_lora({"lin.weight": w, "norm.weight": norm},
                        {"norm.weight": new_norm})
    np.testing.assert_array_equal(merged["norm.weight"], new_norm)


def test_merge_lora_shape_mismatch_is_typed():
    import pytest

    w = np.zeros((12, 4), dtype=np.float32)
    a = np.zeros((4, 4), dtype=np.float32)   # looks like 2-block MergedLinear
    b = np.zeros((8, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="MergedLinear"):
        merge_lora({"qkv.weight": w}, {"qkv.lora_A": a, "qkv.lora_B": b})


def test_throughput_tracker():
    t = ThroughputTracker(sample_rate=44100)
    t.update(samples=44100 * 10, chunks=5)
    assert t.rtf > 0 and t.chunks_per_sec > 0
    assert "RTF" in t.report()


def test_get_model_info():
    import jax.numpy as jnp

    info = get_model_info({"a": jnp.zeros((10, 10)), "b": [jnp.zeros((5,))]})
    assert info["parameters"] == 105
    assert info["arrays"] == 2


def test_export_stablehlo():
    import jax
    import jax.numpy as jnp

    from ml_collections import ConfigDict

    from sesa_tpu.convert.export import export_model
    from sesa_tpu.models import mdx23c

    config = ConfigDict({
        "audio": {"n_fft": 512, "hop_length": 128, "dim_f": 256,
                  "num_channels": 2, "chunk_size": 8064, "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"], "target_instrument": None},
    })
    params = mdx23c.init(jax.random.PRNGKey(0), config)
    blob = export_model("mdx23c", config, params, chunk_size=8064)
    assert isinstance(blob, bytes) and len(blob) > 1000

    # round trip: the deserialized callable reproduces the direct forward
    import numpy as np

    from sesa_tpu.convert.export import load_exported

    fn = load_exported(blob)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 2, 8064)).astype(np.float32) * 0.1)
    got = np.asarray(fn(params, x))
    ref = np.asarray(mdx23c.apply(params, config, x))
    np.testing.assert_allclose(got, ref, atol=1e-5)
