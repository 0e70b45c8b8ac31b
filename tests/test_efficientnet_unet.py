"""EfficientNet-Unet segm_models: parity vs the hand-written lukemelas/smp
oracle PLUS an independent MBConv numerics cross-check against the REAL
torch EfficientNet in `transformers` (models/efficientnet), which shares
the TF-SAME padding / SE / BN-eps-1e-3 conventions. Closes the encoder-zoo
boundary VERDICT r4 #9 flagged (reference models/segm_models.py:64-110
accepts any smp encoder)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from ml_collections import ConfigDict

from sesa_tpu.models import efficientnet_unet, segm_models
from tests.oracles.torch_efficientnet_unet import SegmModelsEfficientNet

DEC = (16, 12, 10, 8, 6)


def tiny_config():
    return ConfigDict({
        "audio": {"n_fft": 254, "hop_length": 64, "dim_f": 128,
                  "num_channels": 2, "chunk_size": 64 * 64 - 64,
                  "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_channels": 8, "act": "gelu",
                  "encoder_name": "efficientnet-b0", "decoder_type": "unet",
                  # tiny-test override of the width/depth coefficients
                  "efficientnet": {"width": 0.25, "depth": 0.35}},
        "decoder_unet": {"decoder_channels": list(DEC)},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def torch_model(seed=0):
    torch.manual_seed(seed)
    spec = efficientnet_unet.spec_from_config(tiny_config())
    dim_c = 2 * 2 * 2  # k * channels * 2
    m = SegmModelsEfficientNet(dim_c, 8, 2, spec)
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.25, 0.25)
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_spec_derivation_matches_smp():
    """The stage splits derived from stride positions must reproduce
    smp's hardcoded stage_idxs and out_channels tables."""
    cfg = tiny_config()
    cfg.model.efficientnet = {}
    cfg.model.encoder_name = "efficientnet-b1"
    spec = efficientnet_unet.spec_from_config(cfg)
    assert spec["splits"] == (5, 8, 16, 23)  # smp efficientnet-b1
    assert efficientnet_unet._feat_channels(spec) == [32, 24, 40, 112, 320]
    cfg.model.encoder_name = "efficientnet-b0"
    spec = efficientnet_unet.spec_from_config(cfg)
    assert len(spec["blocks"]) == 16
    assert efficientnet_unet._feat_channels(spec) == [32, 24, 40, 112, 320]
    cfg.model.encoder_name = "efficientnet-b7"
    spec = efficientnet_unet.spec_from_config(cfg)
    # b7: width 2.0 -> stem 64, pyramid (64, 48, 80, 224, 640), 55 blocks
    assert efficientnet_unet._feat_channels(spec) == [64, 48, 80, 224, 640]
    assert len(spec["blocks"]) == 55


def test_image_path_parity():
    m = torch_model()
    config = tiny_config()
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


def test_encoder_vs_transformers_efficientnet():
    """Independent numerics check: convert the REAL transformers
    EfficientNet-B0 weights into this module's pytree and compare the
    feature pyramid at every stage boundary. Validates TF-SAME padding,
    SE wiring, swish, and BN eps against a real implementation rather
    than only the hand-written oracle."""
    from transformers import EfficientNetConfig
    from transformers.models.efficientnet.modeling_efficientnet import (
        EfficientNetEmbeddings,
        EfficientNetEncoder,
    )

    hf_cfg = EfficientNetConfig(
        num_channels=3, width_coefficient=1.0, depth_coefficient=1.0,
        hidden_dim=1280, depthwise_padding=[], drop_connect_rate=0.0)
    torch.manual_seed(3)
    emb = EfficientNetEmbeddings(hf_cfg)
    enc = EfficientNetEncoder(hf_cfg)
    with torch.no_grad():
        for mod in (emb, enc):
            for p in mod.parameters():
                p.uniform_(-0.2, 0.2)
            for b in mod.buffers():
                if b.dtype.is_floating_point:
                    b.uniform_(0.5, 1.5)
    emb.eval()
    enc.eval()

    cfg = tiny_config()
    cfg.model.efficientnet = {}
    spec = efficientnet_unet.spec_from_config(cfg)

    def t(x):
        return jnp.asarray(x.detach().numpy())

    def bn(mod):
        return {"weight": t(mod.weight), "bias": t(mod.bias),
                "running_mean": t(mod.running_mean),
                "running_var": t(mod.running_var)}

    blocks = []
    for i, blk in enumerate(spec["blocks"]):
        hb = enc.blocks[i]
        p = {}
        if blk["e"] != 1:
            p["expand"] = {"weight": t(hb.expansion.expand_conv.weight)}
            p["expand_bn"] = bn(hb.expansion.expand_bn)
        p["dw"] = {"weight": t(hb.depthwise_conv.depthwise_conv.weight)}
        p["dw_bn"] = bn(hb.depthwise_conv.depthwise_norm)
        p["se_reduce"] = {"weight": t(hb.squeeze_excite.reduce.weight),
                          "bias": t(hb.squeeze_excite.reduce.bias)}
        p["se_expand"] = {"weight": t(hb.squeeze_excite.expand.weight),
                          "bias": t(hb.squeeze_excite.expand.bias)}
        p["project"] = {"weight": t(hb.projection.project_conv.weight)}
        p["project_bn"] = bn(hb.projection.project_bn)
        blocks.append(p)
    params = {"stem": {"conv": {"weight": t(emb.convolution.weight)},
                       "bn": bn(emb.batchnorm)},
              "blocks": blocks}

    x = np.random.default_rng(4).standard_normal(
        (1, 3, 64, 64)).astype(np.float32) * 0.4
    with torch.no_grad():
        h = emb(torch.from_numpy(x))
        hf_hidden = enc(h, output_hidden_states=True,
                        return_dict=True).hidden_states
    feats = efficientnet_unet._encoder(params, jnp.asarray(x), spec)

    np.testing.assert_allclose(np.asarray(feats[0]), h.numpy(),
                               atol=2e-4, rtol=1e-3)
    # hf_hidden[0] is the stem input; block i's output is hf_hidden[i+1]
    for fi, end in enumerate(spec["splits"]):
        np.testing.assert_allclose(
            np.asarray(feats[fi + 1]), hf_hidden[end].numpy(),
            atol=5e-4, rtol=1e-3,
            err_msg=f"stage boundary {fi} (block {end - 1})")


def test_fresh_init_matches_converted_structure():
    config = tiny_config()
    m = torch_model()
    converted = segm_models.convert_torch(m.state_dict(), config)
    fresh = segm_models.init(jax.random.PRNGKey(0), config)

    def shapes(t):
        flat, _ = jax.tree_util.tree_flatten_with_path(t)
        return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}

    assert shapes(converted) == shapes(fresh)


def test_converter_is_strict():
    config = tiny_config()
    m = torch_model(seed=1)
    sd = dict(m.state_dict())
    sd["unet_model.encoder._blocks.0.stray"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        segm_models.convert_torch(sd, config)
    sd = dict(m.state_dict())
    del sd["unet_model.encoder._conv_stem.weight"]
    with pytest.raises(KeyError):
        segm_models.convert_torch(sd, config)


def test_unknown_encoder_still_raises_typed():
    config = tiny_config()
    config.model.encoder_name = "resnext50_32x4d"
    with pytest.raises(NotImplementedError, match="resnext50_32x4d"):
        segm_models.convert_torch({}, config)


def test_efficientnet_layout_fixture():
    """Pin the assumed lukemelas/smp layout like the other families
    (tests/test_layout_fixtures.py)."""
    from tests.test_layout_fixtures import _assert_matches_fixture

    sd = {k: v.numpy() for k, v in torch_model().state_dict().items()}
    _assert_matches_fixture("efficientnet_unet", sd)
