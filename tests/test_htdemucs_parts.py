"""htdemucs component numerics vs real torch operators.

The demucs package is unavailable offline, so full-model parity can't be
checked — but every reconstructed component can be verified against the
actual torch ops it mirrors (nn.MultiheadAttention, conv/conv_transpose,
group/layer norms, GLU), catching transposition, padding, and norm-axis
bugs in the JAX transcription."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.models import htdemucs

from tests.test_htdemucs import tiny_config


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _params():
    return htdemucs.init(jax.random.PRNGKey(0), tiny_config())


def _torch_mha(p, q, k, v, heads):
    d = q.shape[-1]
    mod = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    with torch.no_grad():
        mod.in_proj_weight.copy_(_t(p["in_proj_weight"]))
        mod.in_proj_bias.copy_(_t(p["in_proj_bias"]))
        mod.out_proj.weight.copy_(_t(p["out_proj"]["weight"]))
        mod.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))
    out, _ = mod(q, k, v, need_weights=False)
    return out


def test_mha_matches_torch():
    p = _params()["crosstransformer"]["layers"][0]["attn"]
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 10, 64)).astype(np.float32) * 0.3
    kv = rng.standard_normal((2, 14, 64)).astype(np.float32) * 0.3
    got = np.asarray(htdemucs._mha(p, jnp.asarray(q), jnp.asarray(kv),
                                   jnp.asarray(kv), 4, None))
    ref = _torch_mha(p, torch.from_numpy(q), torch.from_numpy(kv),
                     torch.from_numpy(kv), 4).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def _torch_mygroupnorm(x, p):
    # demucs MyGroupNorm(1, d) applied on (B, T, C)
    y = x.transpose(1, 2)
    y = F.group_norm(y, 1, _t(p["weight"]), _t(p["bias"]))
    return y.transpose(1, 2)


def _torch_self_layer(p, x, heads):
    y = F.layer_norm(x, x.shape[-1:], _t(p["norm1"]["weight"]),
                     _t(p["norm1"]["bias"]))
    x = x + _t(p["gamma_1"]) * _torch_mha(p["attn"], y, y, y, heads)
    y = F.layer_norm(x, x.shape[-1:], _t(p["norm2"]["weight"]),
                     _t(p["norm2"]["bias"]))
    h = F.linear(y, _t(p["linear1"]["weight"]), _t(p["linear1"]["bias"]))
    h = F.gelu(h)
    h = F.linear(h, _t(p["linear2"]["weight"]), _t(p["linear2"]["bias"]))
    x = x + _t(p["gamma_2"]) * h
    return _torch_mygroupnorm(x, p["norm_out"])


def test_self_layer_matches_torch():
    ct = _params()["crosstransformer"]
    p = ct["layers"][0]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 64)).astype(np.float32) * 0.3
    got = np.asarray(htdemucs._t_self_layer(p, jnp.asarray(x), 4, None))
    ref = _torch_self_layer(p, torch.from_numpy(x), 4).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_cross_layer_matches_torch():
    ct = _params()["crosstransformer"]
    p = ct["layers"][1]  # odd layers are cross layers (t_cross_first=False)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 9, 64)).astype(np.float32) * 0.3
    kv = rng.standard_normal((2, 13, 64)).astype(np.float32) * 0.3
    got = np.asarray(htdemucs._t_cross_layer(p, jnp.asarray(q),
                                             jnp.asarray(kv), 4, None))

    qt, kt = torch.from_numpy(q), torch.from_numpy(kv)
    qn = F.layer_norm(qt, (64,), _t(p["norm1"]["weight"]), _t(p["norm1"]["bias"]))
    kn = F.layer_norm(kt, (64,), _t(p["norm2"]["weight"]), _t(p["norm2"]["bias"]))
    x = qt + _t(p["gamma_1"]) * _torch_mha(p["attn"], qn, kn, kn, 4)
    y = F.layer_norm(x, (64,), _t(p["norm3"]["weight"]), _t(p["norm3"]["bias"]))
    h = F.gelu(F.linear(y, _t(p["linear1"]["weight"]), _t(p["linear1"]["bias"])))
    h = F.linear(h, _t(p["linear2"]["weight"]), _t(p["linear2"]["bias"]))
    x = x + _t(p["gamma_2"]) * h
    ref = _torch_mygroupnorm(x, p["norm_out"]).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def _torch_dconv(blocks, x):
    for d, b in enumerate(blocks):
        dil = 2 ** d
        k = b["conv1"]["weight"].shape[-1]
        h = F.conv1d(x, _t(b["conv1"]["weight"]), _t(b["conv1"]["bias"]),
                     padding=dil * (k // 2), dilation=dil)
        h = F.group_norm(h, 1, _t(b["norm1"]["weight"]), _t(b["norm1"]["bias"]))
        h = F.gelu(h)
        h = F.conv1d(h, _t(b["conv2"]["weight"]), _t(b["conv2"]["bias"]))
        h = F.group_norm(h, 1, _t(b["norm2"]["weight"]), _t(b["norm2"]["bias"]))
        h = F.glu(h, dim=1)
        x = x + h * _t(b["scale"])[None, :, None]
    return x


def test_dconv_matches_torch():
    p = _params()["encoder"][2]["dconv"]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 32, 20)).astype(np.float32) * 0.3
    got = np.asarray(htdemucs._dconv_apply(p, jnp.asarray(x), None))
    ref = _torch_dconv(p, torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_henc_freq_matches_torch():
    """Frequency encoder layer with norms + dconv + rewrite (encoder[2])."""
    params = _params()
    kw = htdemucs._kwargs(tiny_config())
    p = params["encoder"][2]
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 32, 12)).astype(np.float32) * 0.3

    got = np.asarray(htdemucs._henc_apply(p, jnp.asarray(x), kw, True, 8, 4,
                                          True, norm=True))

    xt = torch.from_numpy(x)
    y = F.conv2d(xt, _t(p["conv"]["weight"]), _t(p["conv"]["bias"]),
                 stride=(4, 1), padding=(2, 0))
    y = F.gelu(F.group_norm(y, kw["norm_groups"], _t(p["norm1"]["weight"]),
                            _t(p["norm1"]["bias"])))
    b, c, fr, t = y.shape
    z = y.permute(0, 2, 1, 3).reshape(-1, c, t)
    z = _torch_dconv(p["dconv"], z)
    y = z.reshape(b, fr, c, t).permute(0, 2, 1, 3)
    z2 = F.conv2d(y, _t(p["rewrite"]["weight"]), _t(p["rewrite"]["bias"]))
    z2 = F.group_norm(z2, kw["norm_groups"], _t(p["norm2"]["weight"]),
                      _t(p["norm2"]["bias"]))
    ref = F.glu(z2, dim=1).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_hdec_freq_matches_torch():
    """Frequency decoder layer (rewrite GLU + conv_transpose + crop)."""
    params = _params()
    kw = htdemucs._kwargs(tiny_config())
    p = params["decoder"][0]
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 64, 8, 12)).astype(np.float32) * 0.3
    skip = rng.standard_normal((1, 64, 8, 12)).astype(np.float32) * 0.3

    got, _ = htdemucs._hdec_apply(p, jnp.asarray(x), jnp.asarray(skip), None,
                                  kw, True, 8, 4, True, chin=64)
    got = np.asarray(got)

    xt = torch.from_numpy(x) + torch.from_numpy(skip)
    # HDecLayer freq rewrite is a SQUARE int-kernel Conv2d with int padding
    # (demucs hdemucs.py HDecLayer: klass(chin, 2*chin, 1+2*context, 1,
    # context) where klass is nn.Conv2d for freq layers)
    w = p["rewrite"]["weight"]
    z = F.conv2d(xt, _t(w), _t(p["rewrite"]["bias"]),
                 padding=((w.shape[2] - 1) // 2, (w.shape[3] - 1) // 2))
    z = F.group_norm(z, kw["norm_groups"], _t(p["norm1"]["weight"]),
                     _t(p["norm1"]["bias"]))
    y = F.glu(z, dim=1)
    z = F.conv_transpose2d(y, _t(p["conv_tr"]["weight"]),
                           _t(p["conv_tr"]["bias"]), stride=(4, 1))
    z = F.group_norm(z, kw["norm_groups"], _t(p["norm2"]["weight"]),
                     _t(p["norm2"]["bias"]))
    pad = (8 - 4) // 2
    z = z[..., pad:-pad, :]
    ref = F.gelu(z).detach().numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
