"""Reference-shaped convenience API round trip."""

import numpy as np
import yaml


def test_get_model_demix_tta_flow(tmp_path):
    cfg = {
        "audio": {"n_fft": 512, "hop_length": 128, "dim_f": 256,
                  "num_channels": 2, "chunk_size": 8064, "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 4,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"], "target_instrument": None},
        "inference": {"num_overlap": 2, "batch_size": 2},
    }
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))

    from sesa_tpu import utils

    bundle, config = utils.get_model_from_config("mdx23c", path)
    bundle.init(0)

    mix = np.random.default_rng(0).standard_normal((2, 20000)).astype(np.float32) * 0.1
    stems = utils.demix(config, bundle, mix, model_type="mdx23c")
    assert set(stems) == {"vocals", "other"}
    assert stems["vocals"].shape == (2, 20000)

    out = utils.apply_tta(config, bundle, mix, stems, model_type="mdx23c")
    assert set(out) == {"vocals", "other"}
    assert np.isfinite(out["vocals"]).all()
