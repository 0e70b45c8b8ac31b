"""ResNet-Unet segm_models: parity vs the hand-written torch oracle.

Extends the encoder zoo beyond MaxViT (reference models/segm_models.py:
64-110 accepts any smp encoder; VERDICT r3 flagged the typed boundary):
torchvision-layout ResNet encoders (resnet18/34/50 families) through the
same smp Unet decoder, with strict loud-failure conversion.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import resnet_unet, segm_models
from tests.oracles.torch_resnet_unet import SegmModelsResNet

BASE = 8
LAYERS = (1, 1, 1, 1)
DEC = (16, 12, 10, 8, 6)


def tiny_config(block="basic"):
    name = "resnet18" if block == "basic" else "resnet50"
    return ConfigDict({
        "audio": {"n_fft": 254, "hop_length": 64, "dim_f": 128,
                  "num_channels": 2, "chunk_size": 64 * 64 - 64,
                  "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_channels": 8, "act": "gelu",
                  "encoder_name": name, "decoder_type": "unet",
                  "resnet": {"base": BASE, "layers": list(LAYERS)}},
        "decoder_unet": {"decoder_channels": list(DEC)},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def torch_model(block="basic", seed=0):
    torch.manual_seed(seed)
    dim_c = 2 * 2 * 2  # k * channels * 2
    m = SegmModelsResNet(dim_c, 8, 2, BASE, LAYERS, block,
                         decoder_channels=DEC)
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.25, 0.25)
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.uniform_(0.5, 1.5)
    m.eval()
    return m


@pytest.mark.parametrize("block", ["basic", "bottleneck"])
def test_image_path_parity(block):
    m = torch_model(block)
    config = tiny_config(block)
    params = segm_models.convert_torch(m.state_dict(), config)
    rng = np.random.default_rng(0)
    # image is (B, dim_c, f//k, t) = (1, 8, 64, 64): 64 divisible by 32
    x = rng.standard_normal((1, 8, 64, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = np.asarray(segm_models.image_path(params, config, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_full_waveform_forward():
    config = tiny_config()
    m = torch_model()
    params = segm_models.convert_torch(m.state_dict(), config)
    x = np.random.default_rng(1).standard_normal(
        (1, 2, config.audio.chunk_size)).astype(np.float32) * 0.2
    out = np.asarray(segm_models.apply(params, config, jnp.asarray(x)))
    assert out.shape == (1, 2, 2, config.audio.chunk_size)
    assert np.isfinite(out).all()


def test_fresh_init_matches_converted_structure():
    config = tiny_config()
    m = torch_model()
    converted = segm_models.convert_torch(m.state_dict(), config)
    fresh = segm_models.init(jax.random.PRNGKey(0), config)

    def shapes(t):
        flat, _ = jax.tree_util.tree_flatten_with_path(t)
        return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}

    # converted carries BN running stats the fresh init also has; compare
    # the full maps
    assert shapes(converted) == shapes(fresh)


def test_converter_is_strict():
    config = tiny_config()
    m = torch_model(seed=1)
    sd = dict(m.state_dict())
    sd["unet_model.encoder.layer1.0.stray"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        segm_models.convert_torch(sd, config)
    sd = dict(m.state_dict())
    del sd["unet_model.encoder.conv1.weight"]
    with pytest.raises(KeyError):
        segm_models.convert_torch(sd, config)


def test_unknown_encoder_still_raises_typed():
    config = tiny_config()
    config.model.encoder_name = "mobilenet_v2"
    with pytest.raises(NotImplementedError, match="mobilenet_v2"):
        segm_models.convert_torch({}, config)


def test_resnet_layout_fixture():
    """Pin the assumed torchvision/smp layout like the other families
    (tests/test_layout_fixtures.py)."""
    from tests.test_layout_fixtures import _assert_matches_fixture

    sd = {k: v.numpy() for k, v in torch_model().state_dict().items()}
    _assert_matches_fixture("resnet_unet", sd)
