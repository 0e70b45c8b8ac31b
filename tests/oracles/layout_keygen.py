"""Synthetic torch state-dict generators for converter-layout fixtures.

The htdemucs-v4 and conformer families have no importable torch oracle
(the `demucs` and lucidrains `conformer` packages are unavailable
offline), so their `convert_torch` key schemas are reconstructions
(htdemucs: reference demucs4ht.py:28-693 + demucs/hdemucs.py; conformer:
lucidrains conformer layout). These generators emit state dicts in
exactly that assumed layout — names from the schema, shapes from the
model's own `init` — so the layout can be PINNED as a committed manifest
fixture: any drift in either the converter or init fails a fixture test
with a readable diff instead of a field checkpoint-load failure.

Families with real torch oracles (demucs_legacy, hdemucs-v3,
maxvit_unet) take their state dicts from those oracles directly (see
tests/test_layout_fixtures.py); they do not appear here.
"""

import numpy as np

import jax


def _np(tree):
    return jax.tree.map(np.asarray, tree)


# --------------------------------------------------------------------------
# htdemucs (v4, cross-transformer) — inverse walk of
# sesa_tpu/models/htdemucs.py convert_torch (which stores torch tensors
# raw, so shapes come straight from init's leaves)
# --------------------------------------------------------------------------

def htdemucs_state_dict(config, seed=0):
    from sesa_tpu.models import htdemucs

    params = _np(htdemucs.init(jax.random.PRNGKey(seed), config))
    kw = htdemucs._kwargs(config)
    sd = {}

    def put(key, arr):
        assert key not in sd, key
        sd[key] = np.asarray(arr)

    def wb(prefix, p):
        put(f"{prefix}.weight", p["weight"])
        if "bias" in p:
            put(f"{prefix}.bias", p["bias"])

    def lstm(pfx, p):
        for li, lay in enumerate(p["layers"]):
            for suffix, side in (("", lay["fwd"]), ("_reverse", lay["bwd"])):
                for nm in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    put(f"{pfx}.lstm.{nm}_l{li}{suffix}", side[nm])
        wb(f"{pfx}.linear", p["linear"])

    def dconv(prefix, blocks):
        for d, blk in enumerate(blocks):
            p = f"{prefix}.layers.{d}"
            wb(f"{p}.0", blk["conv1"])
            wb(f"{p}.1", blk["norm1"])
            j = 3  # GELU at 2; BLSTM/LocalState insert from 3 (demucs DConv)
            if "lstm" in blk:
                lstm(f"{p}.{j}", blk["lstm"])
                j += 1
            if "attn" in blk:
                for name in ("content", "query", "key", "query_decay", "proj"):
                    wb(f"{p}.{j}.{name}", blk["attn"][name])
                j += 1
            wb(f"{p}.{j}", blk["conv2"])
            wb(f"{p}.{j + 1}", blk["norm2"])
            put(f"{p}.{j + 3}.scale", blk["scale"])

    def enc(prefix, p):
        wb(f"{prefix}.conv", p["conv"])
        if "norm1" in p:
            wb(f"{prefix}.norm1", p["norm1"])
        if "rewrite" in p:
            wb(f"{prefix}.rewrite", p["rewrite"])
        if "norm2" in p:
            wb(f"{prefix}.norm2", p["norm2"])
        if "dconv" in p:
            dconv(f"{prefix}.dconv", p["dconv"])

    def dec(prefix, p):
        wb(f"{prefix}.conv_tr", p["conv_tr"])
        if "norm2" in p:
            wb(f"{prefix}.norm2", p["norm2"])
        if "rewrite" in p:
            wb(f"{prefix}.rewrite", p["rewrite"])
        if "norm1" in p:
            wb(f"{prefix}.norm1", p["norm1"])
        if "dconv" in p:
            dconv(f"{prefix}.dconv", p["dconv"])

    for branch, emit in (("encoder", enc), ("decoder", dec)):
        for i, p in enumerate(params[branch]):
            if "layers" in p:  # MultiWrap replicas (multi_freqs)
                for k, sub in enumerate(p["layers"]):
                    emit(f"{branch}.{i}.layers.{k}", sub)
            else:
                emit(f"{branch}.{i}", p)
    for i, p in enumerate(params["tencoder"]):
        enc(f"tencoder.{i}", p)
    for i, p in enumerate(params["tdecoder"]):
        dec(f"tdecoder.{i}", p)

    put("freq_emb.embedding.weight", params["freq_emb"])

    if "crosstransformer" in params:
        ct = params["crosstransformer"]
        wb("crosstransformer.norm_in", ct["norm_in"])
        wb("crosstransformer.norm_in_t", ct["norm_in_t"])
        parity = 1 if kw["t_cross_first"] else 0
        for branch in ("layers", "layers_t"):
            for i, lp in enumerate(ct[branch]):
                cross = i % 2 != parity
                pfx = f"crosstransformer.{branch}.{i}"
                attn_name = "cross_attn" if cross else "self_attn"
                put(f"{pfx}.{attn_name}.in_proj_weight",
                    lp["attn"]["in_proj_weight"])
                put(f"{pfx}.{attn_name}.in_proj_bias",
                    lp["attn"]["in_proj_bias"])
                wb(f"{pfx}.{attn_name}.out_proj", lp["attn"]["out_proj"])
                wb(f"{pfx}.linear1", lp["linear1"])
                wb(f"{pfx}.linear2", lp["linear2"])
                wb(f"{pfx}.norm1", lp["norm1"])
                wb(f"{pfx}.norm2", lp["norm2"])
                put(f"{pfx}.gamma_1.scale", lp["gamma_1"])
                put(f"{pfx}.gamma_2.scale", lp["gamma_2"])
                wb(f"{pfx}.norm_out", lp["norm_out"])
                if cross:
                    wb(f"{pfx}.norm3", lp["norm3"])
    for name in ("channel_upsampler", "channel_downsampler",
                 "channel_upsampler_t", "channel_downsampler_t"):
        if name in params:
            wb(name, params[name])
    return sd


# --------------------------------------------------------------------------
# conformer family — inverse of conformer_core.convert_conformer
# (raw torch layout; lucidrains conformer key scheme)
# --------------------------------------------------------------------------

def _conformer_block_keys(sd, prefix, blk):
    def put(key, arr):
        assert key not in sd, key
        sd[key] = np.asarray(arr)

    def wb(pfx, p):
        put(f"{pfx}.weight", p["weight"])
        if "bias" in p:
            put(f"{pfx}.bias", p["bias"])

    def ff(fp, p):
        wb(f"{fp}.fn.norm", p["norm"])
        wb(f"{fp}.fn.fn.net.0", p["lin1"])
        wb(f"{fp}.fn.fn.net.3", p["lin2"])

    ff(f"{prefix}.ff1", blk["ff1"])
    a = blk["attn"]
    wb(f"{prefix}.attn.norm", a["norm"])
    put(f"{prefix}.attn.fn.to_q.weight", a["to_q"]["weight"])
    put(f"{prefix}.attn.fn.to_kv.weight", a["to_kv"]["weight"])
    wb(f"{prefix}.attn.fn.to_out", a["to_out"])
    put(f"{prefix}.attn.fn.rel_pos_emb.weight", a["rel_pos_emb"])
    c = blk["conv"]
    wb(f"{prefix}.conv.net.0", c["norm"])
    wb(f"{prefix}.conv.net.2", c["pw1"])
    wb(f"{prefix}.conv.net.4.conv", c["dw"])
    put(f"{prefix}.conv.net.5.weight", c["bn"]["weight"])
    put(f"{prefix}.conv.net.5.bias", c["bn"]["bias"])
    put(f"{prefix}.conv.net.5.running_mean", c["bn"]["running_mean"])
    put(f"{prefix}.conv.net.5.running_var", c["bn"]["running_var"])
    wb(f"{prefix}.conv.net.7", c["pw2"])
    ff(f"{prefix}.ff2", blk["ff2"])
    wb(f"{prefix}.post_norm", blk["post_norm"])


def _conformer_stack_keys(sd, prefix, stack):
    for i, blk in enumerate(stack["layers"]):
        _conformer_block_keys(sd, f"{prefix}.layers.{i}", blk)


def conformer_state_dict(config, seed=0):
    from sesa_tpu.models import conformer

    params = _np(conformer.init(jax.random.PRNGKey(seed), config))
    sd = {}
    sd["core.input_proj_stft.weight"] = params["input_proj"]["weight"]
    sd["core.input_proj_stft.bias"] = params["input_proj"]["bias"]
    _conformer_stack_keys(sd, "core.model", params["conformer"])
    sd["core.output_proj.weight"] = params["output_proj"]["weight"]
    sd["core.output_proj.bias"] = params["output_proj"]["bias"]
    return sd


def mel_band_conformer_state_dict(config, seed=0):
    """Band/mask keys match the mel-band-roformer scheme (per-band Sequential
    modules, stacked + transposed by the converter); conformer blocks at
    layers.{d}.{0,1}."""
    from sesa_tpu.models import mel_band_conformer as mbc

    kw = mbc._kwargs(config)
    plan = mbc._plan(kw)
    params = _np(mbc.init(jax.random.PRNGKey(seed), config))
    sd = {}

    for g, ids in enumerate(plan.group_band_ids):
        gp = params["band_split"]["groups"][g]
        for j, i in enumerate(ids):
            sd[f"band_split.to_features.{i}.0.gamma"] = gp["norm_gamma"][j]
            sd[f"band_split.to_features.{i}.1.weight"] = gp["weight"][j].T
            sd[f"band_split.to_features.{i}.1.bias"] = gp["bias"][j]

    for d, layer in enumerate(params["layers"]):
        _conformer_stack_keys(sd, f"layers.{d}.0", layer["time"])
        _conformer_stack_keys(sd, f"layers.{d}.1", layer["freq"])

    for s, me in enumerate(params["mask_estimators"]):
        n_hidden = len(me["hidden"])
        for li, hp in enumerate(me["hidden"]):
            for i in range(plan.num_bands):
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2 * li}.weight"] = hp["weight"][i].T
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{2 * li}.bias"] = hp["bias"][i]
        last = 2 * n_hidden
        for g, ids in enumerate(plan.group_band_ids):
            gp = me["groups"][g]
            for j, i in enumerate(ids):
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.weight"] = gp["weight"][j].T
                sd[f"mask_estimators.{s}.to_freqs.{i}.0.{last}.bias"] = gp["bias"][j]
    return sd
