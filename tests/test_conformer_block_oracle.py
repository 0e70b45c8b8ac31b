"""Full conformer block / stack vs the torch composition.

test_conformer_parts.py verifies each submodule against real torch
operators; this composes those verified pieces the lucidrains way
(ff-half, attn, conv, ff-half, post-LayerNorm with half-step residuals)
and checks the whole block and a depth-2 stack end to end, closing the
composition gap in the conformer family's evidence.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sesa_tpu.models import conformer_core as C


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _torch_ff(p, x):
    y = F.layer_norm(x, (x.shape[-1],), _t(p["norm"]["weight"]),
                     _t(p["norm"]["bias"]))
    y = F.linear(y, _t(p["lin1"]["weight"]), _t(p["lin1"]["bias"]))
    y = F.silu(y)
    y = F.linear(y, _t(p["lin2"]["weight"]), _t(p["lin2"]["bias"]))
    return 0.5 * y


def _torch_attn(p, x, heads):
    b, n, d = x.shape
    xn = F.layer_norm(x, (d,), _t(p["norm"]["weight"]), _t(p["norm"]["bias"]))
    q = F.linear(xn, _t(p["to_q"]["weight"]))
    kv = F.linear(xn, _t(p["to_kv"]["weight"]))
    dh = q.shape[-1] // heads
    q = q.view(b, n, heads, dh).transpose(1, 2)
    k, v = kv.view(b, n, 2, heads, dh).unbind(2)
    k, v = k.transpose(1, 2), v.transpose(1, 2)
    scale = dh ** -0.5
    maxp = C._MAX_POS_EMB
    seq = torch.arange(n)
    dist = (seq[:, None] - seq[None, :]).clamp(-maxp, maxp) + maxp  # i - j (lucidrains)
    rel = _t(p["rel_pos_emb"])[dist]
    sim = (torch.einsum("bhid,bhjd->bhij", q, k)
           + torch.einsum("bhnd,nrd->bhnr", q, rel)) * scale
    out = torch.einsum("bhij,bhjd->bhid", sim.softmax(-1), v)
    out = out.transpose(1, 2).reshape(b, n, heads * dh)
    return F.linear(out, _t(p["to_out"]["weight"]), _t(p["to_out"]["bias"]))


def _torch_conv(p, x):
    kernel = np.asarray(p["dw"]["weight"]).shape[-1]
    y = F.layer_norm(x, (x.shape[-1],), _t(p["norm"]["weight"]),
                     _t(p["norm"]["bias"]))
    y = y.transpose(1, 2)
    y = F.conv1d(y, _t(p["pw1"]["weight"]), _t(p["pw1"]["bias"]))
    y = F.glu(y, dim=1)
    y = F.conv1d(y, _t(p["dw"]["weight"]), _t(p["dw"]["bias"]),
                 padding=kernel // 2, groups=y.shape[1])
    y = F.batch_norm(y, _t(p["bn"]["running_mean"]),
                     _t(p["bn"]["running_var"]), _t(p["bn"]["weight"]),
                     _t(p["bn"]["bias"]), training=False)
    y = F.silu(y)
    y = F.conv1d(y, _t(p["pw2"]["weight"]), _t(p["pw2"]["bias"]))
    return y.transpose(1, 2)


def _torch_block(p, x, heads):
    x = _torch_ff(p["ff1"], x) + x
    x = _torch_attn(p["attn"], x, heads) + x
    x = _torch_conv(p["conv"], x) + x
    x = _torch_ff(p["ff2"], x) + x
    return F.layer_norm(x, (x.shape[-1],), _t(p["post_norm"]["weight"]),
                        _t(p["post_norm"]["bias"]))


def test_block_matches_torch_composition():
    heads = 2
    p = C.conformer_block_init(jax.random.PRNGKey(0), 32, dim_head=8,
                               heads=heads, conv_expansion_factor=2,
                               conv_kernel_size=7)
    x = np.random.default_rng(0).standard_normal((2, 13, 32)).astype(np.float32) * 0.3
    got = np.asarray(C.conformer_block_apply(p, jnp.asarray(x), heads))
    ref = _torch_block(p, torch.from_numpy(x), heads).numpy()
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_stack_matches_torch_composition():
    heads = 2
    params = C.conformer_init(jax.random.PRNGKey(1), 32, 2, dim_head=8,
                              heads=heads, conv_expansion_factor=2,
                              conv_kernel_size=7)
    x = np.random.default_rng(1).standard_normal((1, 17, 32)).astype(np.float32) * 0.3
    got = np.asarray(C.conformer_apply(params, jnp.asarray(x), heads))
    y = torch.from_numpy(x)
    for block in params["layers"]:
        y = _torch_block(block, y, heads)
    np.testing.assert_allclose(got, y.numpy(), atol=1e-4, rtol=1e-4)
