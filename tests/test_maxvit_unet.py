"""MaxViT-Unet segm_models: parity vs the hand-written torch oracle.

Covers the VOCALS-VitLarge23 path (reference models/segm_models.py:64-110,
encoder 'tu-maxvit_large_tf_512' + smp.Unet) on a tiny same-shaped variant:
state-dict conversion, image-path parity, strict converter behavior, and
the full waveform forward through the registry dispatch.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import segm_models, maxvit_unet
from tests.oracles.torch_maxvit_unet import SegmModelsNet

DIMS = (8, 16, 16, 32)
DEPTHS = (1, 2, 1, 1)
STEM = 8
DIM_HEAD = 8
PART = 2
DEC = (16, 12, 10, 8, 6)


def tiny_config():
    return ConfigDict({
        "audio": {"n_fft": 254, "hop_length": 64, "dim_f": 128,
                  "num_channels": 2, "chunk_size": 64 * 64 - 64,
                  "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_channels": 8, "act": "gelu",
                  "encoder_name": "tu-maxvit_large_tf_512",
                  "decoder_type": "unet",
                  "maxvit": {"dims": DIMS, "depths": DEPTHS,
                             "stem_width": STEM, "dim_head": DIM_HEAD,
                             "partition": PART}},
        "decoder_unet": {"decoder_channels": DEC},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def torch_model(seed=0):
    torch.manual_seed(seed)
    dim_c = 2 * 2 * 2  # k * channels * 2
    m = SegmModelsNet(dim_c, 8, 2, DIMS, DEPTHS, STEM, DIM_HEAD, PART,
                      decoder_channels=DEC)
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.25, 0.25)
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.uniform_(0.5, 1.5)  # BN running stats off the init values
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted():
    m = torch_model()
    config = tiny_config()
    params = segm_models.convert_torch(m.state_dict(), config)
    return m, config, params


def test_image_path_parity(converted):
    m, config, params = converted
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 8, 64, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = m(torch.from_numpy(img)).numpy()
    out = np.asarray(segm_models.image_path(params, config, jnp.asarray(img)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_full_forward_shapes(converted):
    _, config, params = converted
    rng = np.random.default_rng(1)
    t = int(config.audio.chunk_size)
    x = rng.standard_normal((1, 2, t)).astype(np.float32) * 0.1
    out = np.asarray(segm_models.apply(params, config, jnp.asarray(x)))
    assert out.shape == (1, 2, 2, t)
    assert np.isfinite(out).all()


def test_converter_is_strict(converted):
    m, config, _ = converted
    sd = dict(m.state_dict())
    sd["unet_model.encoder.model.stem.conv1.stray"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        segm_models.convert_torch(sd, config)
    sd = dict(m.state_dict())
    del sd["unet_model.segmentation_head.0.weight"]
    with pytest.raises(KeyError):
        segm_models.convert_torch(sd, config)


def test_nested_stage_naming_alias(converted):
    """timm without flatten_sequential emits stages.0.* — both convert."""
    m, config, params = converted
    sd = {k.replace("stages_0.", "stages.0.").replace("stages_1.", "stages.1.")
           .replace("stages_2.", "stages.2.").replace("stages_3.", "stages.3."): v
          for k, v in m.state_dict().items()}
    params2 = segm_models.convert_torch(sd, config)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_non_maxvit_encoder_still_typed():
    config = tiny_config()
    config.model.encoder_name = "timm-regnetx_064"
    with pytest.raises(NotImplementedError, match="timm-regnetx_064"):
        segm_models.convert_torch({}, config)


def test_named_variant_spec():
    config = tiny_config()
    del config.model["maxvit"]
    del config["decoder_unet"]
    spec = maxvit_unet.spec_from_config(config)
    assert spec["dims"] == (128, 256, 512, 1024)
    assert spec["depths"] == (2, 6, 14, 2)
    assert spec["stem_width"] == 128
    assert spec["partition"] == 16
    assert spec["decoder_channels"] == (256, 128, 64, 32, 16)


def test_fresh_init_forward():
    config = tiny_config()
    params = segm_models.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 8, 64, 64)).astype(np.float32) * 0.1
    out = np.asarray(segm_models.image_path(params, config, jnp.asarray(img)))
    assert out.shape == (1, 16, 64, 64)
    assert np.isfinite(out).all()
