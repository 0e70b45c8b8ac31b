"""SQUIM objective speech-quality model (STOI / PESQ / SI-SDR prediction).

Behavioral spec: reference models/bandit/core/metrics/_squim.py:47-340
(the vendored torchaudio SquimObjective): Conv1d encoder -> DPRNN over
overlapped chunks (row/col BiLSTMs with GroupNorm residuals) -> three
transformer branches, each a post-norm TransformerEncoderLayer followed
by AutoPool over time and a small PReLU head; stoi/pesq heads end in a
range sigmoid (_squim.py:34-44, PESQRange _squim.py:26-31). Reference-
default ("base") hyperparameters: feat_dim 256, win_len 64, d_model 256,
nhead 4, hidden 256, 2 DPRNN blocks, chunk 71 (_squim.py:322-334).

Scores reproduce the reference model bit-compatibly given a converted
checkpoint (tests/test_squim.py vs the torch reconstruction in
tests/oracles/torch_squim.py). Input is 16 kHz mono waveforms
(B, T); the trained torchaudio weights assume that rate
(_squim.py:369-372).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import layers as L

_HIGHEST = jax.lax.Precision.HIGHEST

# wide-band PESQ range: 0.999 + 4/(1+exp(-1.3669·4.5+3.8224)) upper bound
# (reference _squim.py:13-31)
_PESQ_LO = 1.0
_PESQ_HI = 0.999 + (4.999 - 0.999) / (1.0 + float(np.exp(-1.3669 * 4.5 + 3.8224)))

METRICS = ("stoi", "pesq", "sisdr")


def _kwargs(config):
    kw = dict(feat_dim=256, win_len=64, d_model=256, nhead=4,
              hidden_dim=256, num_blocks=2, chunk_size=71, chunk_stride=None)
    if config is not None and "model" in config:
        kw.update({k: v for k, v in dict(config.model).items() if k in kw})
    if kw["chunk_stride"] is None:
        kw["chunk_stride"] = kw["chunk_size"] // 2
    return kw


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _lin_init(rng, ci, co):
    k1, k2 = jax.random.split(rng)
    return {"weight": L.kaiming_uniform(k1, (co, ci), ci),
            "bias": L.kaiming_uniform(k2, (co,), ci)}


def _lstm_dir_init(rng, ci, h):
    ks = jax.random.split(rng, 4)
    return {"weight_ih": L.kaiming_uniform(ks[0], (4 * h, ci), h),
            "weight_hh": L.kaiming_uniform(ks[1], (4 * h, h), h),
            "bias_ih": L.kaiming_uniform(ks[2], (4 * h,), h),
            "bias_hh": L.kaiming_uniform(ks[3], (4 * h,), h)}


def _single_rnn_init(rng, input_size, hidden):
    ks = jax.random.split(rng, 3)
    return {
        "lstm": {"fwd": _lstm_dir_init(ks[0], input_size, hidden),
                 "bwd": _lstm_dir_init(ks[1], input_size, hidden)},
        "proj": _lin_init(ks[2], 2 * hidden, input_size),
    }


def _branch_init(rng, d, nhead):
    ks = iter(jax.random.split(rng, 8))
    return {
        "attn": {
            "in_proj": _lin_init(next(ks), d, 3 * d),
            "out_proj": _lin_init(next(ks), d, d),
        },
        "linear1": _lin_init(next(ks), d, 4 * d),
        "linear2": _lin_init(next(ks), 4 * d, d),
        "norm1": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "norm2": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "autopool_alpha": jnp.ones((1,)),
        "head1": _lin_init(next(ks), d, d),
        "head_prelu": 0.25 * jnp.ones((1,)),
        "head2": _lin_init(next(ks), d, 1),
    }


def init(rng, config=None):
    kw = _kwargs(config)
    fd, hd = kw["feat_dim"], kw["hidden_dim"]
    ks = iter(jax.random.split(rng, 4 * kw["num_blocks"] + 8))
    blocks = []
    for _ in range(kw["num_blocks"]):
        blocks.append({
            "row_rnn": _single_rnn_init(next(ks), fd, hd),
            "col_rnn": _single_rnn_init(next(ks), fd, hd),
            "row_norm": {"weight": jnp.ones((fd,)), "bias": jnp.zeros((fd,))},
            "col_norm": {"weight": jnp.ones((fd,)), "bias": jnp.zeros((fd,))},
        })
    return {
        "encoder": {"weight": L.kaiming_uniform(
            next(ks), (fd, 1, kw["win_len"]), kw["win_len"])},
        "dprnn": {
            "blocks": blocks,
            "conv": {**_lin_init(next(ks), fd, kw["d_model"]),
                     "prelu": 0.25 * jnp.ones((1,))},
        },
        "branches": [_branch_init(next(ks), kw["d_model"], kw["nhead"])
                     for _ in METRICS],
    }


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _single_rnn(p, x, precision):
    """(B, T, N) -> (B, T, N): BiLSTM + linear projection (_squim.py:76-100)."""
    out = L.bilstm(x, p["lstm"], precision=precision)
    return L.linear(out, p["proj"], precision=precision)


def _chunking(x, chunk, stride):
    """(B, N, T) -> (B, N, chunk, 2K), rest (reference _squim.py:143-162)."""
    b, n, seq = x.shape
    # note rest == chunk (not 0) when (stride + seq % chunk) % chunk == 0,
    # exactly as the reference computes it (_squim.py:147)
    rest = chunk - (stride + seq % chunk) % chunk
    out = jnp.pad(x, ((0, 0), (0, 0), (stride, rest + stride)))
    seg1 = out[:, :, :-stride].reshape(b, n, -1, chunk)
    seg2 = out[:, :, stride:].reshape(b, n, -1, chunk)
    out = jnp.concatenate([seg1, seg2], axis=3)
    out = out.reshape(b, n, -1, chunk).transpose(0, 1, 3, 2)
    return out, rest


def _merging(x, rest, chunk, stride):
    """(B, D, chunk, 2K) -> (B, D, T) overlap-add (_squim.py:164-173)."""
    b, d = x.shape[:2]
    out = x.transpose(0, 1, 3, 2).reshape(b, d, -1, chunk * 2)
    out1 = out[:, :, :, :chunk].reshape(b, d, -1)[:, :, stride:]
    out2 = out[:, :, :, chunk:].reshape(b, d, -1)[:, :, :-stride]
    out = out1 + out2
    if rest > 0:
        out = out[:, :, :-rest]
    return out


def _dprnn(p, x, kw, precision):
    """(B, N, T) -> (B, T', d_model) (reference _squim.py:102-195)."""
    chunk, stride = kw["chunk_size"], kw["chunk_stride"]
    out, rest = _chunking(x, chunk, stride)
    b, n, dim1, dim2 = out.shape
    for blk in p["blocks"]:
        row_in = out.transpose(0, 3, 2, 1).reshape(b * dim2, dim1, n)
        row_out = _single_rnn(blk["row_rnn"], row_in, precision)
        row_out = row_out.reshape(b, dim2, dim1, n).transpose(0, 3, 2, 1)
        row_out = L.group_norm(row_out, blk["row_norm"], 1, eps=1e-8)
        out = out + row_out

        col_in = out.transpose(0, 2, 3, 1).reshape(b * dim1, dim2, n)
        col_out = _single_rnn(blk["col_rnn"], col_in, precision)
        col_out = col_out.reshape(b, dim1, dim2, n).transpose(0, 3, 1, 2)
        col_out = L.group_norm(col_out, blk["col_norm"], 1, eps=1e-8)
        out = out + col_out
    # 1x1 Conv2d + PReLU == per-position linear (weight (D, N, 1, 1))
    conv = p["conv"]
    out = jnp.einsum("bnct,dn->bdct", out, conv["weight"],
                     precision=precision) + conv["bias"][None, :, None, None]
    out = L.prelu(out, conv["prelu"])
    out = _merging(out, rest, chunk, stride)
    return out.transpose(0, 2, 1)


def _transformer_layer(p, x, nhead, precision):
    """torch nn.TransformerEncoderLayer, post-norm, relu (_squim.py:268)."""
    b, t, d = x.shape
    qkv = L.linear(x, p["attn"]["in_proj"], precision=precision)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = d // nhead

    def heads(z):
        return z.reshape(b, t, nhead, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k, precision=precision) / np.sqrt(dh)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", a, v, precision=precision)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    x = L.layer_norm(x + L.linear(o, p["attn"]["out_proj"],
                                  precision=precision), p["norm1"])
    ff = L.linear(jax.nn.relu(L.linear(x, p["linear1"], precision=precision)),
                  p["linear2"], precision=precision)
    return L.layer_norm(x + ff, p["norm2"])


def _autopool(x, alpha):
    """softmax(x·alpha) attention pool over time (_squim.py:198-208)."""
    w = jax.nn.softmax(x * alpha, axis=1)
    return jnp.sum(x * w, axis=1)


def _range_sigmoid(x, lo, hi):
    return jax.nn.sigmoid(x) * (hi - lo) + lo


def _branch(p, x, metric, nhead, precision):
    out = _transformer_layer(p, x, nhead, precision)
    out = _autopool(out, p["autopool_alpha"])
    out = L.prelu(L.linear(out, p["head1"], precision=precision),
                  p["head_prelu"])
    out = L.linear(out, p["head2"], precision=precision)[..., 0]
    if metric == "stoi":
        return _range_sigmoid(out, 0.0, 1.0)
    if metric == "pesq":
        return _range_sigmoid(out, _PESQ_LO, _PESQ_HI)
    return out


def apply(params, config, x, precision=_HIGHEST):
    """(B, T) 16 kHz mono -> dict of (B,) scores {stoi, pesq, sisdr}.

    Mirrors SquimObjective.forward (_squim.py:233-253): RMS-normalize to
    1/20, encode, DPRNN, one transformer branch per metric.
    """
    kw = _kwargs(config)
    assert x.ndim == 2, f"input must be (batch, time), got {x.shape}"
    x = x / (jnp.sqrt(jnp.mean(x ** 2, axis=1, keepdims=True)) * 20.0)
    feats = L.conv1d(x[:, None, :], params["encoder"]["weight"],
                     stride=kw["win_len"] // 2, precision=precision)
    feats = jax.nn.relu(feats)  # (B, N, frames)
    out = _dprnn(params["dprnn"], feats, kw, precision)
    return {m: _branch(p, out, m, kw["nhead"], precision)
            for m, p in zip(METRICS, params["branches"])}


# --------------------------------------------------------------------------
# torch checkpoint conversion (torchaudio SquimObjective key layout)
# --------------------------------------------------------------------------

def convert_torch(state_dict, config=None):
    from sesa_tpu.models.bs_roformer import _make_take

    kw = _kwargs(config)
    sd, used, take = _make_take(state_dict)

    def lstm_dir(prefix, suffix=""):
        return {"weight_ih": take(f"{prefix}.weight_ih_l0{suffix}"),
                "weight_hh": take(f"{prefix}.weight_hh_l0{suffix}"),
                "bias_ih": take(f"{prefix}.bias_ih_l0{suffix}"),
                "bias_hh": take(f"{prefix}.bias_hh_l0{suffix}")}

    def single_rnn(prefix):
        return {
            "lstm": {"fwd": lstm_dir(f"{prefix}.rnn"),
                     "bwd": lstm_dir(f"{prefix}.rnn", "_reverse")},
            "proj": {"weight": take(f"{prefix}.proj.weight"),
                     "bias": take(f"{prefix}.proj.bias")},
        }

    blocks = []
    for i in range(kw["num_blocks"]):
        blocks.append({
            "row_rnn": single_rnn(f"dprnn.row_rnn.{i}"),
            "col_rnn": single_rnn(f"dprnn.col_rnn.{i}"),
            "row_norm": {"weight": take(f"dprnn.row_norm.{i}.weight"),
                         "bias": take(f"dprnn.row_norm.{i}.bias")},
            "col_norm": {"weight": take(f"dprnn.col_norm.{i}.weight"),
                         "bias": take(f"dprnn.col_norm.{i}.bias")},
        })

    branches = []
    for j in range(len(METRICS)):
        b = f"branches.{j}"
        branches.append({
            "attn": {
                "in_proj": {"weight": take(f"{b}.0.self_attn.in_proj_weight"),
                            "bias": take(f"{b}.0.self_attn.in_proj_bias")},
                "out_proj": {"weight": take(f"{b}.0.self_attn.out_proj.weight"),
                             "bias": take(f"{b}.0.self_attn.out_proj.bias")},
            },
            "linear1": {"weight": take(f"{b}.0.linear1.weight"),
                        "bias": take(f"{b}.0.linear1.bias")},
            "linear2": {"weight": take(f"{b}.0.linear2.weight"),
                        "bias": take(f"{b}.0.linear2.bias")},
            "norm1": {"weight": take(f"{b}.0.norm1.weight"),
                      "bias": take(f"{b}.0.norm1.bias")},
            "norm2": {"weight": take(f"{b}.0.norm2.weight"),
                      "bias": take(f"{b}.0.norm2.bias")},
            "autopool_alpha": take(f"{b}.1.alpha"),
            "head1": {"weight": take(f"{b}.2.0.weight"),
                      "bias": take(f"{b}.2.0.bias")},
            "head_prelu": take(f"{b}.2.1.weight"),
            "head2": {"weight": take(f"{b}.2.2.weight"),
                      "bias": take(f"{b}.2.2.bias")},
        })

    params = {
        "encoder": {"weight": take("encoder.conv1d.weight")},
        "dprnn": {
            "blocks": blocks,
            "conv": {"weight": take("dprnn.conv.0.weight")[:, :, 0, 0],
                     "bias": take("dprnn.conv.0.bias"),
                     "prelu": take("dprnn.conv.1.weight")},
        },
        "branches": branches,
    }
    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params
