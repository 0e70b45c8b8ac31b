"""Every dispatchable model_type imports and exposes init/apply/convert_torch
(the reference's 19-type dispatcher surface, utils.py:89-157)."""

import pytest

from sesa_tpu.models import MODEL_TYPES, get_model


@pytest.mark.parametrize("model_type", sorted(MODEL_TYPES))
def test_dispatch(model_type):
    mod = get_model(model_type)
    assert callable(getattr(mod, "init"))
    assert callable(getattr(mod, "apply"))
    assert callable(getattr(mod, "convert_torch"))


def test_unknown_type():
    with pytest.raises(ValueError, match="Unknown model type"):
        get_model("nope")


def test_bs_roformer_custom_declarative():
    """HyperACE-class custom configs (VR + hyper-connections) resolve onto
    the experimental machinery; unknown architecture knobs raise typed."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ml_collections import ConfigDict

    from sesa_tpu.models import bs_roformer_custom as custom

    mcfg = dict(
        dim=32, depth=2, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        freqs_per_bands=(2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4, 4, 16, 17),
        dim_head=8, heads=4, stft_n_fft=128, stft_hop_length=32,
        stft_win_length=128, mask_estimator_depth=2,
        use_value_residual_learning=True, num_residual_streams=4,
    )
    config = ConfigDict({"model": mcfg})
    params = custom.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(0).standard_normal((1, 2, 1280)).astype(np.float32) * 0.1
    out = custom.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 1, 2, 1280)
    assert np.isfinite(np.asarray(out)).all()

    # the FNO variant (5th custom entry) now resolves declaratively too
    fno_cfg = ConfigDict({"model": dict(
        mcfg, use_value_residual_learning=False, num_residual_streams=1,
        use_fno=True, fno_modes=4)})
    params = custom.init(jax.random.PRNGKey(0), fno_cfg)
    assert "fno" in params["layers"][0]
    out = custom.apply(params, fno_cfg, jnp.asarray(x))
    assert out.shape == (1, 1, 2, 1280)
    assert np.isfinite(np.asarray(out)).all()

    # knobs outside the declarative space still raise typed
    bad = ConfigDict({"model": dict(mcfg, wavelet_depth=3)})
    with pytest.raises(custom.UnsupportedCustomArchitecture,
                       match="wavelet_depth"):
        custom.init(jax.random.PRNGKey(0), bad)


def test_segm_forward_and_unsupported_convert():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ml_collections import ConfigDict

    from sesa_tpu.models import segm_models

    config = ConfigDict({
        "audio": {"n_fft": 512, "hop_length": 128, "dim_f": 256,
                  "num_channels": 2, "chunk_size": 8064, "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_channels": 8, "act": "gelu"},
        "training": {"instruments": ["vocals", "other"], "target_instrument": None},
    })
    params = segm_models.init(jax.random.PRNGKey(0), config)
    x = np.random.default_rng(0).standard_normal((1, 2, 8064)).astype(np.float32) * 0.1
    out = segm_models.apply(params, config, jnp.asarray(x))
    assert out.shape == (1, 2, 2, 8064)
    with pytest.raises(NotImplementedError, match="imagenet"):
        segm_models.convert_torch({}, config)
