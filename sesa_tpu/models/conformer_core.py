"""Conformer block stack (lucidrains `conformer` package semantics).

The reference conformer models build on the external lucidrains package
(reference models/conformer_model.py:5, models/mel_band_conformer.py):
ConformerBlock = 0.5·FF → self-attention with Shaw relative position
embeddings (max_pos_emb 512) → conv module (pointwise-GLU → depthwise →
BatchNorm → Swish → pointwise) → 0.5·FF → LayerNorm, all pre-normed with
residuals. Converter key names follow that package's module layout
(layers.{i}.{ff1,attn,conv,ff2,post_norm}; note the checkpoints' conv
BatchNorm carries running stats).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models.layers import kaiming_uniform, layer_norm, swish

_HIGHEST = jax.lax.Precision.HIGHEST
_MAX_POS_EMB = 512


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _lin(rng, ci, co, bias=True):
    k1, k2 = jax.random.split(rng)
    p = {"weight": kaiming_uniform(k1, (co, ci), ci)}
    if bias:
        p["bias"] = kaiming_uniform(k2, (co,), ci)
    return p


def conformer_block_init(rng, dim, dim_head=64, heads=8, ff_mult=4,
                         conv_expansion_factor=2, conv_kernel_size=31):
    keys = iter(jax.random.split(rng, 16))
    inner = dim_head * heads
    conv_inner = dim * conv_expansion_factor

    def ff():
        return {
            "norm": {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "lin1": _lin(next(keys), dim, dim * ff_mult),
            "lin2": _lin(next(keys), dim * ff_mult, dim),
        }

    return {
        "ff1": ff(),
        "attn": {
            "norm": {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "to_q": _lin(next(keys), dim, inner, bias=False),
            "to_kv": _lin(next(keys), dim, inner * 2, bias=False),
            "to_out": _lin(next(keys), inner, dim),
            "rel_pos_emb": 0.02 * jax.random.normal(
                next(keys), (2 * _MAX_POS_EMB + 1, dim_head)),
        },
        "conv": {
            "norm": {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "pw1": {"weight": kaiming_uniform(next(keys), (conv_inner * 2, dim, 1), dim),
                    "bias": kaiming_uniform(next(keys), (conv_inner * 2,), dim)},
            "dw": {"weight": kaiming_uniform(next(keys), (conv_inner, 1, conv_kernel_size),
                                             conv_kernel_size),
                   "bias": kaiming_uniform(next(keys), (conv_inner,), conv_kernel_size)},
            "bn": {"weight": jnp.ones((conv_inner,)), "bias": jnp.zeros((conv_inner,)),
                   "running_mean": jnp.zeros((conv_inner,)),
                   "running_var": jnp.ones((conv_inner,))},
            "pw2": {"weight": kaiming_uniform(next(keys), (dim, conv_inner, 1), conv_inner),
                    "bias": kaiming_uniform(next(keys), (dim,), conv_inner)},
        },
        "ff2": ff(),
        "post_norm": {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
    }


def conformer_init(rng, dim, depth, **kwargs):
    keys = jax.random.split(rng, depth)
    return {"layers": [conformer_block_init(k, dim, **kwargs) for k in keys]}


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _ff_apply(p, x, precision):
    y = layer_norm(x, p["norm"])
    y = jnp.einsum("...d,od->...o", y, p["lin1"]["weight"],
                   precision=precision) + p["lin1"]["bias"]
    y = swish(y)
    y = jnp.einsum("...d,od->...o", y, p["lin2"]["weight"],
                   precision=precision) + p["lin2"]["bias"]
    return 0.5 * y


def _attn_apply(p, x, heads, precision):
    b, n, dim = x.shape
    xn = layer_norm(x, p["norm"])
    q = jnp.einsum("bnd,od->bno", xn, p["to_q"]["weight"], precision=precision)
    kv = jnp.einsum("bnd,od->bno", xn, p["to_kv"]["weight"], precision=precision)
    dh = q.shape[-1] // heads
    q = jnp.transpose(q.reshape(b, n, heads, dh), (0, 2, 1, 3))
    k, v = jnp.split(kv.reshape(b, n, 2, heads, dh), 2, axis=2)
    k = jnp.transpose(k[:, :, 0], (0, 2, 1, 3))
    v = jnp.transpose(v[:, :, 0], (0, 2, 1, 3))
    scale = dh ** -0.5

    # Shaw relative position bias: q · E_rel[dist] (lucidrains conformer,
    # dist[i, j] = i - j — the table is learned and non-symmetric, so the
    # sign convention matters for real checkpoints)
    seq = np.arange(n)
    # derive max_pos from the checkpoint's own table (a non-default
    # max_pos_emb would otherwise silently clamp to the wrong edge; the
    # fused kernel already derives it the same way)
    max_pos = (p["rel_pos_emb"].shape[0] - 1) // 2
    dist = np.clip(seq[:, None] - seq[None, :], -max_pos, max_pos) + max_pos
    rel = jnp.take(p["rel_pos_emb"], jnp.asarray(dist, dtype=jnp.int32), axis=0)  # (n, n, dh)
    pos_attn = jnp.einsum("bhnd,nrd->bhnr", q, rel, precision=precision) * scale

    sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=precision) * scale + pos_attn
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=precision)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, heads * dh)
    return jnp.einsum("bno,do->bnd", out, p["to_out"]["weight"],
                      precision=precision) + p["to_out"]["bias"]


def _conv_apply(p, x, precision):
    """(B, N, D) conv module; kernel-size 'same' padding, eval BatchNorm.

    Stays channels-LAST end to end (lanes = channels is the TPU-native
    layout): the 1x1 convs run as token GEMMs and only the depthwise
    conv is a real convolution — no NLC<->NCL transposes."""
    y = layer_norm(x, p["norm"])
    y = jnp.einsum("bnd,od->bno", y, p["pw1"]["weight"][:, :, 0],
                   precision=precision) + p["pw1"]["bias"]
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)  # GLU over channels
    kernel = p["dw"]["weight"].shape[-1]
    pad = (kernel // 2, kernel // 2 - (kernel + 1) % 2)
    dw = jnp.transpose(p["dw"]["weight"], (2, 1, 0))  # (k, 1, C) HIO
    y = jax.lax.conv_general_dilated(
        y, dw, (1,), [pad], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=y.shape[-1], precision=precision,
    ) + p["dw"]["bias"]
    bn = p["bn"]
    scale = (bn["weight"].astype(jnp.float32)
             * jax.lax.rsqrt(bn["running_var"].astype(jnp.float32) + 1e-5))
    shift = (bn["bias"].astype(jnp.float32)
             - bn["running_mean"].astype(jnp.float32) * scale)
    y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
    y = swish(y)
    return jnp.einsum("bne,de->bnd", y, p["pw2"]["weight"][:, :, 0],
                      precision=precision) + p["pw2"]["bias"]


def _ff_fused(p, x):
    """Conformer FF via the fused Pallas kernel (LayerNorm/SiLU/0.5·out)."""
    from sesa_tpu.ops.ff import fused_ff_residual

    x2d = x.reshape(-1, x.shape[-1])
    out = fused_ff_residual(
        x2d, p["norm"]["weight"], p["lin1"]["weight"], p["lin1"]["bias"],
        p["lin2"]["weight"], p["lin2"]["bias"], beta=p["norm"]["bias"],
        norm="ln", act="swish", out_scale=0.5)
    return out.reshape(x.shape)


def _use_fused_conformer(x, p, heads) -> bool:
    from sesa_tpu.ops.attention import _use_fused
    from sesa_tpu.ops.ff import use_fused_ff

    n, dim = x.shape[-2:]
    dh = p["attn"]["to_q"]["weight"].shape[0] // heads
    return (_use_fused(n, dh, heads, dim, dtype=x.dtype)
            and use_fused_ff(x.reshape(-1, dim), p["ff1"]["lin1"]["weight"]))


def conformer_block_apply(p, x, heads, precision=_HIGHEST):
    if _use_fused_conformer(x, p, heads):
        # bf16 TPU path: both FFs, the biased attention and the conv
        # module run as fused Pallas kernels — the (n, n) logits, the
        # (tokens, 4·dim) FF hidden and the (tokens, 2e) GLU stream never
        # touch HBM. The Shaw bias is realized in-kernel via a strided
        # lane rotation (see ops/attention.py, ops/convblock.py).
        from sesa_tpu.ops.attention import fused_conformer_attention
        from sesa_tpu.ops.convblock import fused_conformer_conv, use_fused_conv

        a = p["attn"]
        x = _ff_fused(p["ff1"], x)
        b, n, dim = x.reshape(-1, *x.shape[-2:]).shape
        if n < int(os.environ.get("SESA_CONF_SHORTSEQ_ATTN", "0")):
            # A/B knob: below this seq length, run the attention sub-module
            # UNFUSED (one big qkv GEMM over all tokens + einsum attention)
            # while keeping the fused FF/conv kernels. At short sequences
            # (melconf freq leg: 60 mel bands) the fused kernel fragments
            # the qkv projection into tiny per-program GEMMs, costing more
            # than the whole-tensor GEMM + the small (n, n) logits it saves.
            x = _attn_apply(a, x.reshape(b, n, dim), heads,
                            _HIGHEST).reshape(x.shape) + x
        else:
            wqkv = jnp.concatenate([a["to_q"]["weight"],
                                    a["to_kv"]["weight"]], axis=0)
            x = fused_conformer_attention(
                x.reshape(b, n, dim), a["norm"]["weight"], a["norm"]["bias"],
                wqkv, a["rel_pos_emb"], a["to_out"]["weight"],
                a["to_out"]["bias"], heads).reshape(x.shape)
        if use_fused_conv(x, p["conv"]["pw1"]["weight"].shape[0]):
            x = fused_conformer_conv(
                x.reshape(b, n, dim), p["conv"]).reshape(x.shape)
        else:
            x = _conv_apply(p["conv"], x, precision) + x
        x = _ff_fused(p["ff2"], x)
        return layer_norm(x, p["post_norm"])
    x = _ff_apply(p["ff1"], x, precision) + x
    x = _attn_apply(p["attn"], x, heads, precision) + x
    x = _conv_apply(p["conv"], x, precision) + x
    x = _ff_apply(p["ff2"], x, precision) + x
    return layer_norm(x, p["post_norm"])


def conformer_apply(params, x, heads, precision=_HIGHEST):
    """(B, N, D) -> (B, N, D)."""
    for block in params["layers"]:
        x = conformer_block_apply(block, x, heads, precision=precision)
    return x


# --------------------------------------------------------------------------
# torch conversion (lucidrains conformer key layout)
# --------------------------------------------------------------------------

def apply_key_map(state_dict):
    """Field-recovery hatch for conformer-family checkpoints whose module
    layout differs from the assumed lucidrains reconstruction (frozen in
    tests/fixtures/layouts/). Set ``SESA_CONFORMER_KEY_MAP`` to a JSON
    file of ``{"actual_key_or_prefix": "expected_key_or_prefix"}``;
    checkpoint keys are renamed (exact match first, else longest matching
    prefix; suffix the map key with ``$`` to forbid prefix matching) before
    conversion. See README 'Conformer checkpoint layout recovery'.
    """
    import json
    import os

    path = os.environ.get("SESA_CONFORMER_KEY_MAP")
    if not path:
        return state_dict
    with open(path, encoding="utf-8") as f:
        key_map = json.load(f)
    prefixes = sorted((k for k in key_map if not k.endswith("$")),
                      key=len, reverse=True)
    out = {}
    for k, v in state_dict.items():
        if k in key_map or k + "$" in key_map:
            out[key_map.get(k, key_map.get(k + "$"))] = v
            continue
        for p in prefixes:
            if k.startswith(p):
                out[key_map[p] + k[len(p):]] = v
                break
        else:
            out[k] = v
    return out


def convert_conformer(take, prefix, depth):
    layers = []
    for i in range(depth):
        b = f"{prefix}.layers.{i}"

        def ff(fp):
            return {
                "norm": {"weight": take(f"{fp}.fn.norm.weight"),
                         "bias": take(f"{fp}.fn.norm.bias")},
                "lin1": {"weight": take(f"{fp}.fn.fn.net.0.weight"),
                         "bias": take(f"{fp}.fn.fn.net.0.bias")},
                "lin2": {"weight": take(f"{fp}.fn.fn.net.3.weight"),
                         "bias": take(f"{fp}.fn.fn.net.3.bias")},
            }

        layers.append({
            "ff1": ff(f"{b}.ff1"),
            "attn": {
                "norm": {"weight": take(f"{b}.attn.norm.weight"),
                         "bias": take(f"{b}.attn.norm.bias")},
                "to_q": {"weight": take(f"{b}.attn.fn.to_q.weight")},
                "to_kv": {"weight": take(f"{b}.attn.fn.to_kv.weight")},
                "to_out": {"weight": take(f"{b}.attn.fn.to_out.weight"),
                           "bias": take(f"{b}.attn.fn.to_out.bias")},
                "rel_pos_emb": take(f"{b}.attn.fn.rel_pos_emb.weight"),
            },
            "conv": {
                "norm": {"weight": take(f"{b}.conv.net.0.weight"),
                         "bias": take(f"{b}.conv.net.0.bias")},
                "pw1": {"weight": take(f"{b}.conv.net.2.weight"),
                        "bias": take(f"{b}.conv.net.2.bias")},
                "dw": {"weight": take(f"{b}.conv.net.4.conv.weight"),
                       "bias": take(f"{b}.conv.net.4.conv.bias")},
                "bn": {"weight": take(f"{b}.conv.net.5.weight"),
                       "bias": take(f"{b}.conv.net.5.bias"),
                       "running_mean": take(f"{b}.conv.net.5.running_mean"),
                       "running_var": take(f"{b}.conv.net.5.running_var")},
                "pw2": {"weight": take(f"{b}.conv.net.7.weight"),
                        "bias": take(f"{b}.conv.net.7.bias")},
            },
            "ff2": ff(f"{b}.ff2"),
            "post_norm": {"weight": take(f"{b}.post_norm.weight"),
                          "bias": take(f"{b}.post_norm.bias")},
        })
    return {"layers": layers}
