"""swin_upernet — STFT image through a Swin-backbone UperNet.

Behavioral spec: reference models/upernet_swin_transformers.py:147-227 —
an STFT-image shell (identical to segm_models'/mdx23c's) around
HuggingFace's ``UperNetForSemanticSegmentation`` with a Swin backbone,
with the decode-head classifier re-targeted to ``num_channels`` outputs.

This is a full JAX port of the HF vision stack at inference:

* Swin backbone (transformers/models/swin/modeling_swin.py): patch embed
  (conv4x4 + LayerNorm), stages of shifted-window attention blocks with
  relative position bias (always_partition=True, as SwinBackbone uses),
  patch merging between stages, per-stage feature LayerNorms.
* UperNet decode head (transformers/models/upernet/modeling_upernet.py):
  pyramid pooling over the top stage, FPN lateral/top-down fusion,
  conv+BN+ReLU modules, bilinear (align_corners=False) resizes.
* The auxiliary FCN head only contributes to the training loss — the
  reference consumes ``.logits`` (decode head) — so its weights are
  accepted by convert_torch but not executed.

Defaults mirror openmmlab/upernet-swin-large (the checkpoint the
reference wraps): embed 192, depths [2,2,18,2], heads [6,12,24,48],
window 12, UperNet hidden 512, pool scales (1,2,3,6). Every value is
overridable through config.model.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L
from sesa_tpu.ops.prec import net_precision
from sesa_tpu.models.mdx23c import num_target_instruments
from sesa_tpu.models.segm_models import (_cac2cws, _cws2cac, _dims,
                                         inverse_spectrogram, spectrogram)

_HIGHEST = jax.lax.Precision.HIGHEST


def _swin_kwargs(config):
    kw = dict(embed_dim=192, depths=[2, 2, 18, 2], num_heads=[6, 12, 24, 48],
              window_size=12, patch_size=4, mlp_ratio=4.0, qkv_bias=True,
              layer_norm_eps=1e-5, upernet_hidden=512,
              pool_scales=[1, 2, 3, 6])
    kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    kw["depths"] = list(kw["depths"])
    kw["num_heads"] = list(kw["num_heads"])
    kw["pool_scales"] = list(kw["pool_scales"])
    return kw


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng, config):
    k, dim_c, c = _dims(config)
    kw = _swin_kwargs(config)
    s = num_target_instruments(config)
    emb, win = kw["embed_dim"], kw["window_size"]
    hid = kw["upernet_hidden"]
    keys = iter(jax.random.split(rng, 4096))

    def dense(ci, co):
        lim = 1.0 / math.sqrt(ci)
        return {
            "weight": jax.random.uniform(next(keys), (co, ci), minval=-lim, maxval=lim),
            "bias": jnp.zeros((co,)),
        }

    def ln(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def conv(ci, co, kh, kwd):
        fan = ci * kh * kwd
        lim = 1.0 / math.sqrt(fan)
        return jax.random.uniform(next(keys), (co, ci, kh, kwd),
                                  minval=-lim, maxval=lim)

    def conv_module(ci, co, kk):
        return {"conv_w": conv(ci, co, kk, kk),
                "bn": {"weight": jnp.ones((co,)), "bias": jnp.zeros((co,)),
                       "running_mean": jnp.zeros((co,)),
                       "running_var": jnp.ones((co,))}}

    def block(dim, heads):
        return {
            "ln1": ln(dim),
            "q": dense(dim, dim), "k": dense(dim, dim), "v": dense(dim, dim),
            "proj": dense(dim, dim),
            "rel_bias": 0.02 * jax.random.normal(
                next(keys), ((2 * win - 1) * (2 * win - 1), heads)),
            "ln2": ln(dim),
            "mlp1": dense(dim, int(kw["mlp_ratio"] * dim)),
            "mlp2": dense(int(kw["mlp_ratio"] * dim), dim),
        }

    stages = []
    n_stages = len(kw["depths"])
    for i, (depth, heads) in enumerate(zip(kw["depths"], kw["num_heads"])):
        dim = emb * 2 ** i
        st = {"blocks": [block(dim, heads) for _ in range(depth)]}
        if i < n_stages - 1:
            st["downsample"] = {"norm": ln(4 * dim),
                                "reduction": dense(4 * dim, 2 * dim)}
            st["downsample"]["reduction"].pop("bias")  # bias=False
        stages.append(st)

    in_ch = [emb * 2 ** i for i in range(n_stages)]
    head = {
        "psp": [conv_module(in_ch[-1], hid, 1) for _ in kw["pool_scales"]],
        "bottleneck": conv_module(in_ch[-1] + len(kw["pool_scales"]) * hid,
                                  hid, 3),
        "laterals": [conv_module(ci, hid, 1) for ci in in_ch[:-1]],
        "fpn": [conv_module(hid, hid, 3) for _ in in_ch[:-1]],
        "fpn_bottleneck": conv_module(n_stages * hid, hid, 3),
        "classifier": {"weight": conv(hid, c, 1, 1), "bias": jnp.zeros((c,))},
    }

    return {
        "first_conv": conv(dim_c, c, 1, 1),
        "backbone": {
            "patch_proj": {"weight": conv(c, emb, kw["patch_size"],
                                          kw["patch_size"]),
                           "bias": jnp.zeros((emb,))},
            "embed_norm": ln(emb),
            "stages": stages,
            "stage_norms": [ln(d) for d in in_ch],
        },
        "decode_head": head,
        "final_conv1": conv(c + dim_c, c, 1, 1),
        "final_conv2": conv(c, s * dim_c, 1, 1),
    }


# --------------------------------------------------------------------------
# swin backbone
# --------------------------------------------------------------------------

def _layer_norm(x, p, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _rel_position_index(win):
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += win - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 0] *= 2 * win - 1
    return rel.sum(-1)  # (N, N)


def _shift_mask(hp, wp, win, shift):
    """HF get_attn_mask: (num_windows, N, N) additive mask of 0 / -100."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    m = img.reshape(hp // win, win, wp // win, win)
    m = m.transpose(0, 2, 1, 3).reshape(-1, win * win)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, win):
    b, h, w, ch = x.shape
    x = x.reshape(b, h // win, win, w // win, win, ch)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, win * win, ch)


def _window_reverse(x, win, b, h, w):
    ch = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, ch)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, ch)


def _swin_block(p, x, hw, heads, win, shift, eps, rel_index, precision):
    """x (B, H*W, C) -> same; HF SwinLayer.forward with always_partition."""
    h, w = hw
    b, _, ch = x.shape
    shortcut = x
    x = _layer_norm(x, p["ln1"], eps).reshape(b, h, w, ch)

    hp = h + (-h) % win
    wp = w + (-w) % win
    if hp != h or wp != w:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

    xw = _window_partition(x, win)  # (B*nw, N, C)
    n = win * win

    def proj(d, t):
        return jnp.einsum("bnc,oc->bno", t, d["weight"],
                          precision=precision) + d["bias"]

    dh = ch // heads
    q = proj(p["q"], xw).reshape(-1, n, heads, dh).transpose(0, 2, 1, 3)
    kk = proj(p["k"], xw).reshape(-1, n, heads, dh).transpose(0, 2, 1, 3)
    v = proj(p["v"], xw).reshape(-1, n, heads, dh).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhid,bhjd->bhij", q, kk,
                        precision=precision) / math.sqrt(dh)
    bias = p["rel_bias"][rel_index.reshape(-1)].reshape(n, n, heads)
    scores = scores + jnp.transpose(bias, (2, 0, 1))[None]
    if shift > 0:
        mask = jnp.asarray(_shift_mask(hp, wp, win, shift))  # (nw, N, N)
        nw = mask.shape[0]
        scores = scores.reshape(-1, nw, heads, n, n) + mask[None, :, None]
        scores = scores.reshape(-1, heads, n, n)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(-1, n, ch)
    out = proj(p["proj"], out)

    out = _window_reverse(out, win, b, hp, wp)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    out = out[:, :h, :w].reshape(b, h * w, ch)

    x = shortcut + out
    y = _layer_norm(x, p["ln2"], eps)
    y = jnp.einsum("bnc,oc->bno", y, p["mlp1"]["weight"],
                   precision=precision) + p["mlp1"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    y = jnp.einsum("bnc,oc->bno", y, p["mlp2"]["weight"],
                   precision=precision) + p["mlp2"]["bias"]
    return x + y


def _patch_merge(p, x, hw, eps, precision):
    h, w = hw
    b, _, ch = x.shape
    x = x.reshape(b, h, w, ch)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(b, -1, 4 * ch)
    x = _layer_norm(x, p["norm"], eps)
    return jnp.einsum("bnc,oc->bno", x, p["reduction"]["weight"],
                      precision=precision)


def _backbone(p, pixels, kw, precision):
    """(B, C, H, W) -> list of 4 feature maps (B, Ci, Hi, Wi)."""
    eps = kw["layer_norm_eps"]
    ps = kw["patch_size"]
    b, _, h0, w0 = pixels.shape
    if w0 % ps:
        pixels = jnp.pad(pixels, ((0, 0), (0, 0), (0, 0), (0, ps - w0 % ps)))
    if h0 % ps:
        pixels = jnp.pad(pixels, ((0, 0), (0, 0), (0, ps - h0 % ps), (0, 0)))
    x = L.conv2d(pixels, p["patch_proj"]["weight"], p["patch_proj"]["bias"],
                 stride=(ps, ps), precision=precision)
    _, emb, h, w = x.shape
    x = x.reshape(b, emb, h * w).transpose(0, 2, 1)
    x = _layer_norm(x, p["embed_norm"], eps)

    rel_index = jnp.asarray(_rel_position_index(kw["window_size"]))
    feats = []
    hw = (h, w)
    for i, st in enumerate(p["stages"]):
        for j, blk in enumerate(st["blocks"]):
            shift = 0 if j % 2 == 0 else kw["window_size"] // 2
            x = _swin_block(blk, x, hw, kw["num_heads"][i], kw["window_size"],
                            shift, eps, rel_index, precision)
        # stage feature = BEFORE downsampling, with its own LayerNorm
        f = _layer_norm(x, p["stage_norms"][i], eps)
        ch = f.shape[-1]
        feats.append(f.reshape(b, hw[0], hw[1], ch).transpose(0, 3, 1, 2))
        if "downsample" in st:
            x = _patch_merge(st["downsample"], x, hw, eps, precision)
            hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)
    return feats


# --------------------------------------------------------------------------
# upernet head
# --------------------------------------------------------------------------

def _resize(x, size):
    """torch F.interpolate(mode='bilinear', align_corners=False)."""
    b, c = x.shape[:2]
    return jax.image.resize(x, (b, c) + tuple(size), method="bilinear")


def _conv_module(p, x, padding, precision):
    x = L.conv2d(x, p["conv_w"], padding=padding, precision=precision)
    x = L.batch_norm2d(x, p["bn"])
    return jax.nn.relu(x)


def _adaptive_avg_pool(x, out):
    b, c, h, w = x.shape
    rows = []
    for i in range(out):
        h0, h1 = (i * h) // out, -(-((i + 1) * h) // out)
        cols = []
        for j in range(out):
            w0, w1 = (j * w) // out, -(-((j + 1) * w) // out)
            cols.append(x[:, :, h0:h1, w0:w1].mean(axis=(2, 3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)  # (B, C, out, out)


def _decode_head(p, feats, kw, precision):
    top = feats[-1]
    psp = [top]
    for scale, blk in zip(kw["pool_scales"], p["psp"]):
        y = _adaptive_avg_pool(top, scale)
        y = _conv_module(blk, y, (0, 0), precision)
        psp.append(_resize(y, top.shape[2:]))
    x = _conv_module(p["bottleneck"], jnp.concatenate(psp, axis=1), (1, 1),
                     precision)

    laterals = [_conv_module(blk, f, (0, 0), precision)
                for blk, f in zip(p["laterals"], feats[:-1])]
    laterals.append(x)
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _resize(
            laterals[i], laterals[i - 1].shape[2:])

    outs = [_conv_module(p["fpn"][i], laterals[i], (1, 1), precision)
            for i in range(len(laterals) - 1)]
    outs.append(laterals[-1])
    outs = [outs[0]] + [_resize(o, outs[0].shape[2:]) for o in outs[1:]]
    x = _conv_module(p["fpn_bottleneck"], jnp.concatenate(outs, axis=1),
                     (1, 1), precision)
    return L.conv2d(x, p["classifier"]["weight"], p["classifier"]["bias"],
                    precision=precision)


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------

def apply(params, config, x, precision=None, compute_dtype=None):
    """(B, ch, T) -> (B, S, ch, T) (shell identical to segm_models')."""
    precision = net_precision(precision, compute_dtype)
    kw = _swin_kwargs(config)
    k, dim_c, c = _dims(config)
    act = L.make_act(config.model.act)
    s_stems = num_target_instruments(config)
    length = x.shape[-1]

    spec = spectrogram(x, config)
    if compute_dtype is not None:
        spec = spec.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    mix = xx = _cac2cws(spec, k)
    first_out = xx = L.conv2d(xx, params["first_conv"], precision=precision)
    xx = jnp.swapaxes(xx, -1, -2)  # (B, c, T, F)

    feats = _backbone(params["backbone"], xx, kw, precision)
    logits = _decode_head(params["decode_head"], feats, kw, precision)
    xx = _resize(logits, xx.shape[2:])

    xx = jnp.swapaxes(xx, -1, -2)
    xx = xx * first_out
    xx = L.conv2d(jnp.concatenate([mix, xx], axis=1), params["final_conv1"],
                  precision=precision)
    xx = L.conv2d(act(xx), params["final_conv2"], precision=precision)
    xx = _cws2cac(xx, k).astype(jnp.float32)
    b = xx.shape[0]
    xx = xx.reshape(b, s_stems, dim_c // k, xx.shape[-2], xx.shape[-1])
    wav = inverse_spectrogram(xx, config, length)
    if wav.shape[-1] < length:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, length - wav.shape[-1])])
    return wav[..., :length]


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch(state_dict, config):
    """Map a reference Swin_UperNet_Model state_dict onto this pytree.

    Key scheme: reference upernet_swin_transformers.py:147-227 wraps HF's
    UperNetForSemanticSegmentation under ``swin_upernet_model.``.
    Auxiliary-head weights exist in checkpoints but only feed the training
    loss; they are consumed and dropped.
    """
    kw = _swin_kwargs(config)
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def dense(prefix, bias=True):
        d = {"weight": take(prefix + ".weight")}
        if bias:
            d["bias"] = take(prefix + ".bias")
        return d

    def ln(prefix):
        return {"weight": take(prefix + ".weight"),
                "bias": take(prefix + ".bias")}

    def conv_module(prefix):
        return {"conv_w": take(prefix + ".conv.weight"),
                "bn": {"weight": take(prefix + ".batch_norm.weight"),
                       "bias": take(prefix + ".batch_norm.bias"),
                       "running_mean": take(prefix + ".batch_norm.running_mean"),
                       "running_var": take(prefix + ".batch_norm.running_var")}}

    bb = "swin_upernet_model.backbone"
    stages = []
    n_stages = len(kw["depths"])
    for i in range(n_stages):
        blocks = []
        for j in range(kw["depths"][i]):
            p = f"{bb}.encoder.layers.{i}.blocks.{j}"
            blocks.append({
                "ln1": ln(p + ".layernorm_before"),
                "q": dense(p + ".attention.self.query"),
                "k": dense(p + ".attention.self.key"),
                "v": dense(p + ".attention.self.value"),
                "proj": dense(p + ".attention.output.dense"),
                "rel_bias": take(p + ".attention.self.relative_position_bias_table"),
                "ln2": ln(p + ".layernorm_after"),
                "mlp1": dense(p + ".intermediate.dense"),
                "mlp2": dense(p + ".output.dense"),
            })
        st = {"blocks": blocks}
        if i < n_stages - 1:
            d = f"{bb}.encoder.layers.{i}.downsample"
            st["downsample"] = {"norm": ln(d + ".norm"),
                                "reduction": dense(d + ".reduction", bias=False)}
        stages.append(st)

    dh = "swin_upernet_model.decode_head"
    head = {
        "psp": [conv_module(f"{dh}.psp_modules.{i}.1")
                for i in range(len(kw["pool_scales"]))],
        "bottleneck": conv_module(dh + ".bottleneck"),
        "laterals": [conv_module(f"{dh}.lateral_convs.{i}")
                     for i in range(n_stages - 1)],
        "fpn": [conv_module(f"{dh}.fpn_convs.{i}")
                for i in range(n_stages - 1)],
        "fpn_bottleneck": conv_module(dh + ".fpn_bottleneck"),
        "classifier": dense(dh + ".classifier"),
    }

    params = {
        "first_conv": take("first_conv.weight"),
        "backbone": {
            "patch_proj": dense(bb + ".embeddings.patch_embeddings.projection"),
            "embed_norm": ln(bb + ".embeddings.norm"),
            "stages": stages,
            "stage_norms": [ln(f"{bb}.hidden_states_norms.stage{i + 1}")
                            for i in range(n_stages)],
        },
        "decode_head": head,
        "final_conv1": take("final_conv.0.weight"),
        "final_conv2": take("final_conv.2.weight"),
    }

    # buffers and training-only heads: consumed, not executed
    for key in sd:
        if (key.endswith("relative_position_index")
                or key.endswith("num_batches_tracked")
                or ".auxiliary_head." in key
                or key.endswith("attn_mask")):
            used.add(key)
    unused = set(sd) - used
    if unused:
        raise ValueError(
            f"unconsumed checkpoint keys: {sorted(unused)[:10]} ...")
    return params
