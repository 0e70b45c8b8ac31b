"""Reference-shaped convenience API round trip."""

import jax
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


def test_load_not_compatible_weights(tmp_path):
    """Checkpoint from a dim=32 model loads into a dim=48 model: overlap
    slices copied, the rest zero-filled (reference utils.py:502-558)."""
    import torch
    import yaml
    from ml_collections import ConfigDict
    from tests.test_roformer import bs_model_cfg, export_state_dict
    from sesa_tpu.models import bs_roformer
    from sesa_tpu.utils import get_model_from_config, load_not_compatible_weights

    small_m = bs_model_cfg(dim=32)
    small = ConfigDict({"model": small_m})
    spec = bs_roformer.spec_from_config(small_m)
    p_small = bs_roformer.init(jax.random.PRNGKey(0), small)
    sd = export_state_dict(p_small, spec, transformer_norm_output=False,
                           final_norm=True)
    ckpt = str(tmp_path / "small.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    big = ConfigDict({"model": bs_model_cfg(dim=48)})
    cfgp = str(tmp_path / "big.yaml")
    yaml.safe_dump(big.to_dict(), open(cfgp, "w"))
    bundle, _ = get_model_from_config("bs_roformer", cfgp)
    bundle.init(seed=1)
    load_not_compatible_weights(bundle, ckpt)

    # a same-rank leaf: overlap equals the small model, tail is zero
    lw = np.asarray(bundle.params["layers"][0]["time"]["layers"][0]["ff"]["lin1_w"])
    sw = np.asarray(p_small["layers"][0]["time"]["layers"][0]["ff"]["lin1_w"])
    oh, ow = sw.shape
    np.testing.assert_array_equal(lw[:oh, :ow], sw)
    assert (lw[oh:] == 0).all() and (lw[:, ow:] == 0).all()
