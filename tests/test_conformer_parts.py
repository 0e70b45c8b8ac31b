"""Conformer component numerics vs real torch operators (the lucidrains
conformer package is unavailable offline; each reconstructed block is
checked against the torch ops it mirrors)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sesa_tpu.models import conformer_core as C


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _block(dim=32, heads=2, dim_head=8, kernel=7):
    return C.conformer_block_init(jax.random.PRNGKey(0), dim,
                                  dim_head=dim_head, heads=heads,
                                  conv_expansion_factor=2,
                                  conv_kernel_size=kernel)


def test_ff_half_matches_torch():
    p = _block()["ff1"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 32)).astype(np.float32) * 0.3
    got = np.asarray(C._ff_apply(p, jnp.asarray(x), None))
    y = F.layer_norm(torch.from_numpy(x), (32,), _t(p["norm"]["weight"]),
                     _t(p["norm"]["bias"]))
    y = F.linear(y, _t(p["lin1"]["weight"]), _t(p["lin1"]["bias"]))
    y = F.silu(y)
    y = F.linear(y, _t(p["lin2"]["weight"]), _t(p["lin2"]["bias"]))
    np.testing.assert_allclose(got, 0.5 * y.numpy(), atol=2e-5, rtol=1e-4)


def test_attention_with_shaw_rel_pos_matches_torch():
    heads, dh = 2, 8
    p = _block(heads=heads, dim_head=dh)["attn"]
    rng = np.random.default_rng(1)
    b, n, d = 2, 11, 32
    x = rng.standard_normal((b, n, d)).astype(np.float32) * 0.3
    got = np.asarray(C._attn_apply(p, jnp.asarray(x), heads, None))

    xn = F.layer_norm(torch.from_numpy(x), (d,), _t(p["norm"]["weight"]),
                      _t(p["norm"]["bias"]))
    q = F.linear(xn, _t(p["to_q"]["weight"]))
    kv = F.linear(xn, _t(p["to_kv"]["weight"]))
    q = q.view(b, n, heads, dh).transpose(1, 2)
    k, v = kv.view(b, n, 2, heads, dh).unbind(2)
    k, v = k.transpose(1, 2), v.transpose(1, 2)
    scale = dh ** -0.5
    maxp = C._MAX_POS_EMB
    seq = torch.arange(n)
    dist = (seq[:, None] - seq[None, :]).clamp(-maxp, maxp) + maxp  # i - j (lucidrains)
    rel = _t(p["rel_pos_emb"])[dist]  # (n, n, dh)
    pos = torch.einsum("bhnd,nrd->bhnr", q, rel) * scale
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * scale + pos
    attn = sim.softmax(-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(1, 2).reshape(b, n, heads * dh)
    ref = F.linear(out, _t(p["to_out"]["weight"]), _t(p["to_out"]["bias"]))
    np.testing.assert_allclose(got, ref.numpy(), atol=3e-5, rtol=1e-4)


def test_conv_module_matches_torch():
    p = _block(kernel=7)["conv"]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 15, 32)).astype(np.float32) * 0.3
    got = np.asarray(C._conv_apply(p, jnp.asarray(x), None))

    y = F.layer_norm(torch.from_numpy(x), (32,), _t(p["norm"]["weight"]),
                     _t(p["norm"]["bias"]))
    y = y.transpose(1, 2)
    y = F.conv1d(y, _t(p["pw1"]["weight"]), _t(p["pw1"]["bias"]))
    y = F.glu(y, dim=1)
    # lucidrains DepthWiseConv1d uses 'same' padding for odd kernels
    y = F.conv1d(y, _t(p["dw"]["weight"]), _t(p["dw"]["bias"]),
                 padding=7 // 2, groups=y.shape[1])
    y = F.batch_norm(y, _t(p["bn"]["running_mean"]), _t(p["bn"]["running_var"]),
                     _t(p["bn"]["weight"]), _t(p["bn"]["bias"]), training=False)
    y = F.silu(y)
    y = F.conv1d(y, _t(p["pw2"]["weight"]), _t(p["pw2"]["bias"]))
    ref = y.transpose(1, 2).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
