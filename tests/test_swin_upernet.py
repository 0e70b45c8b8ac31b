"""swin_upernet vs the REAL HuggingFace torch stack.

transformers is available offline, so unlike the smp/timm encoder zoo
this family is verified against the actual reference dependency: a torch
wrapper replicating reference upernet_swin_transformers.py:147-227
(UperNetForSemanticSegmentation with a Swin backbone inside the STFT
shell), built with random weights and converted through convert_torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from ml_collections import ConfigDict

from sesa_tpu.models import swin_upernet

torch.manual_seed(0)


def tiny_config():
    return ConfigDict({
        "audio": {"n_fft": 256, "hop_length": 64, "dim_f": 128,
                  "num_channels": 2, "chunk_size": 4096,
                  "sample_rate": 44100},
        "model": {"num_subbands": 2, "num_channels": 8, "act": "gelu",
                  "embed_dim": 16, "depths": [1, 1, 2],
                  "num_heads": [1, 2, 4], "window_size": 4, "patch_size": 4,
                  "upernet_hidden": 24, "pool_scales": [1, 2]},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })


def build_torch_model(config):
    from transformers import (SwinConfig, UperNetConfig,
                              UperNetForSemanticSegmentation)

    m = config.model
    c = m.num_channels
    backbone = SwinConfig(
        image_size=32, num_channels=c, embed_dim=m.embed_dim,
        depths=list(m.depths), num_heads=list(m.num_heads),
        window_size=m.window_size, patch_size=m.patch_size,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        out_features=[f"stage{i + 1}" for i in range(len(m.depths))],
    )
    top = m.embed_dim * 2 ** (len(m.depths) - 1)
    upernet = UperNetConfig(
        backbone_config=backbone, hidden_size=m.upernet_hidden,
        pool_scales=list(m.pool_scales), num_labels=c,
        use_auxiliary_head=True, auxiliary_in_channels=top,
        auxiliary_channels=16, auxiliary_num_convs=1,
        auxiliary_concat_input=False,
    )

    # replicate reference Swin_UperNet_Model (upernet_swin_transformers.py:
    # 147-227) with a locally-constructed (no network) UperNet
    class Shell(torch.nn.Module):
        def __init__(self):
            super().__init__()
            k = m.num_subbands
            dim_c = k * config.audio.num_channels * 2
            self.k, self.dim_c, self.c = k, dim_c, c
            self.first_conv = torch.nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)
            self.swin_upernet_model = UperNetForSemanticSegmentation(upernet)
            self.final_conv = torch.nn.Sequential(
                torch.nn.Conv2d(c + dim_c, c, 1, 1, 0, bias=False),
                torch.nn.GELU(),
                torch.nn.Conv2d(c, 2 * dim_c, 1, 1, 0, bias=False),
            )

        def stft(self, x):
            window = torch.hann_window(config.audio.n_fft)
            batch_dims = x.shape[:-2]
            ch, t = x.shape[-2:]
            x = x.reshape([-1, t])
            x = torch.stft(x, n_fft=config.audio.n_fft,
                           hop_length=config.audio.hop_length, window=window,
                           center=True, return_complex=True)
            x = torch.view_as_real(x).permute([0, 3, 1, 2])
            x = x.reshape([*batch_dims, ch, 2, -1, x.shape[-1]])
            x = x.reshape([*batch_dims, ch * 2, -1, x.shape[-1]])
            return x[..., : config.audio.dim_f, :]

        def istft(self, x, length):
            window = torch.hann_window(config.audio.n_fft)
            batch_dims = x.shape[:-3]
            ch, f, t = x.shape[-3:]
            n = config.audio.n_fft // 2 + 1
            x = torch.cat([x, torch.zeros([*batch_dims, ch, n - f, t])], -2)
            x = x.reshape([*batch_dims, ch // 2, 2, n, t]).reshape(
                [-1, 2, n, t])
            x = x.permute([0, 2, 3, 1])
            x = x[..., 0] + x[..., 1] * 1.0j
            x = torch.istft(x, n_fft=config.audio.n_fft,
                            hop_length=config.audio.hop_length, window=window,
                            center=True)
            return x.reshape([*batch_dims, 2, -1])

        def forward(self, x):
            length = x.shape[-1]
            x = self.stft(x)
            b, cc, f, t = x.shape
            x = x.reshape(b, cc, self.k, f // self.k, t)
            mix = x = x.reshape(b, cc * self.k, f // self.k, t)
            first = x = self.first_conv(x)
            x = x.transpose(-1, -2)
            x = self.swin_upernet_model(x).logits
            x = x.transpose(-1, -2)
            x = x * first
            x = self.final_conv(torch.cat([mix, x], 1))
            b, cc, f, t = x.shape
            x = x.reshape(b, cc // self.k, self.k, f, t)
            x = x.reshape(b, cc // self.k, f * self.k, t)
            x = x.reshape(b, 2, -1, f * self.k, t)
            return self.istft(x, length)

    model = Shell()
    model.eval()
    return model


@pytest.mark.parametrize("t", [4096])
def test_matches_hf_torch(t):
    config = tiny_config()
    model = build_torch_model(config)
    sd = {k: v for k, v in model.state_dict().items()}

    params = swin_upernet.convert_torch(sd, config)
    x = np.random.default_rng(0).standard_normal((1, 2, t)).astype(np.float32) * 0.3

    with torch.inference_mode():
        ref = model(torch.from_numpy(x)).numpy()
    got = np.asarray(swin_upernet.apply(params, config, jnp.asarray(x)))

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=max(3e-4, 2e-3 * scale))


def test_convert_rejects_unknown_keys():
    config = tiny_config()
    model = build_torch_model(config)
    sd = {k: v for k, v in model.state_dict().items()}
    sd["swin_upernet_model.backbone.bogus.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        swin_upernet.convert_torch(sd, config)


def test_bf16_forward_finite():
    config = tiny_config()
    params = swin_upernet.init(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 2, 4096)).astype(np.float32) * 0.1)
    out = swin_upernet.apply(params, config, x, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(out)).all()
