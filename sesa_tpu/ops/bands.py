"""Band-split projections as grouped batched GEMMs.

The reference BandSplit / MaskEstimator modules loop over ~62 bands in
Python, running a tiny per-band Linear each (reference
models/bs_roformer/bs_roformer.py:222-249,277-310). On TPU that shape is
hostile: 62 launches of (·, w_i)×(w_i, D) matmuls. Here bands with equal
width are stacked and run as ONE batched einsum per width group (7 groups
for the default BS layout), keeping the MXU fed.

A band layout is a list of int32 feature-index arrays into the packed
(freq·stereo·complex) feature axis. This covers both the contiguous
BS-RoFormer partition and Mel-Band RoFormer's overlapping mel bands: mask
reassembly scatter-adds per-band outputs back to features and divides by
the coverage count (count 1 everywhere for a partition, so the same code
implements the reference's overlap averaging, mel_band_roformer.py:603-612).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models.layers import rms_norm

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class BandPlan:
    """Static plan: width groups over a band layout."""

    num_bands: int
    num_features: int
    # one entry per width group
    group_band_ids: tuple  # tuple[tuple[int, ...]]
    group_feat_idx: tuple  # tuple[np.ndarray (m, w) int32]
    band_perm: np.ndarray  # (num_bands,) int32: group-stacked order -> band order
    scatter_feats: np.ndarray  # (sum m*w,) feature index per group-stacked output
    coverage: np.ndarray  # (num_features,) float32 count of bands per feature

    @property
    def widths(self) -> list:
        return [idx.shape[1] for idx in self.group_feat_idx]


def make_band_plan(band_feats: Sequence[np.ndarray], num_features: int) -> BandPlan:
    """Group a per-band feature-index layout by band width."""
    widths = [len(f) for f in band_feats]
    order: dict = {}
    for i, w in enumerate(widths):
        order.setdefault(w, []).append(i)
    group_band_ids = tuple(tuple(v) for v in order.values())
    group_feat_idx = tuple(
        np.stack([np.asarray(band_feats[i], dtype=np.int32) for i in ids])
        for ids in order.values()
    )
    stacked_order = np.concatenate([np.asarray(ids) for ids in group_band_ids])
    band_perm = np.argsort(stacked_order).astype(np.int32)
    scatter_feats = np.concatenate([idx.reshape(-1) for idx in group_feat_idx])
    coverage = np.zeros(num_features, dtype=np.float32)
    np.add.at(coverage, scatter_feats, 1.0)
    return BandPlan(
        num_bands=len(band_feats),
        num_features=num_features,
        group_band_ids=group_band_ids,
        group_feat_idx=group_feat_idx,
        band_perm=band_perm.astype(np.int32),
        scatter_feats=scatter_feats.astype(np.int32),
        coverage=coverage,
    )


def contiguous_band_feats(widths: Sequence[int]) -> List[np.ndarray]:
    """Contiguous partition layout (BS-RoFormer's freqs_per_bands_with_complex)."""
    feats, off = [], 0
    for w in widths:
        feats.append(np.arange(off, off + w, dtype=np.int32))
        off += w
    return feats


# --------------------------------------------------------------------------
# band split: per-band RMSNorm + Linear -> (B, T, NB, D)
# --------------------------------------------------------------------------

def band_split_init(rng, plan: BandPlan, dim: int):
    from sesa_tpu.models.layers import kaiming_uniform

    groups = []
    keys = jax.random.split(rng, len(plan.group_feat_idx) * 2)
    for g, idx in enumerate(plan.group_feat_idx):
        m, w = idx.shape
        groups.append(
            {
                "norm_gamma": jnp.ones((m, w)),
                "weight": kaiming_uniform(keys[2 * g], (m, w, dim), w),
                "bias": kaiming_uniform(keys[2 * g + 1], (m, dim), w),
            }
        )
    return {"groups": groups}


def band_split_apply(plan: BandPlan, params, x, precision=_HIGHEST):
    """x (B, T, F2) -> (B, T, NB, D)."""
    outs = []
    for g, idx in enumerate(plan.group_feat_idx):
        m, w = idx.shape
        p = params["groups"][g]
        xg = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=-1)
        xg = xg.reshape(x.shape[:-1] + (m, w))
        xg = rms_norm(xg, p["norm_gamma"])
        outs.append(
            jnp.einsum("btmw,mwd->btmd", xg, p["weight"], precision=precision)
            + p["bias"]
        )
    stacked = jnp.concatenate(outs, axis=2)
    if not np.array_equal(plan.band_perm, np.arange(plan.num_bands)):
        stacked = jnp.take(stacked, jnp.asarray(plan.band_perm), axis=2)
    return stacked


# --------------------------------------------------------------------------
# mask estimator: per-band MLP + GLU -> packed feature mask (B, T, F2)
# --------------------------------------------------------------------------

def mask_estimator_init(rng, plan: BandPlan, dim: int, n_hidden: int,
                        expansion: int = 4):
    """``n_hidden`` = number of hidden Linear+Tanh layers before the final
    GLU Linear. NOTE the bs and mel reference files map the same
    ``mask_estimator_depth`` config to different counts (bs: depth-1,
    mel: depth) — see RoformerSpec.mask_hidden_layers."""
    from sesa_tpu.models.layers import kaiming_uniform

    hidden = dim * expansion
    keys = iter(jax.random.split(rng, 2 * n_hidden + 2 * len(plan.group_feat_idx) + 6))
    params = {"hidden": []}
    d_in = dim
    for _ in range(n_hidden):
        params["hidden"].append(
            {
                "weight": kaiming_uniform(next(keys), (plan.num_bands, d_in, hidden), d_in),
                "bias": kaiming_uniform(next(keys), (plan.num_bands, hidden), d_in),
            }
        )
        d_in = hidden
    groups = []
    for idx in plan.group_feat_idx:
        m, w = idx.shape
        groups.append(
            {
                "weight": kaiming_uniform(next(keys), (m, d_in, 2 * w), d_in),
                "bias": kaiming_uniform(next(keys), (m, 2 * w), d_in),
            }
        )
    params["groups"] = groups
    return params


def mask_estimator_apply(plan: BandPlan, params, x, precision=_HIGHEST):
    """x (B, T, NB, D) -> (B, T, F2) mask over packed RI features.

    Overlapping bands are averaged by coverage (identity for partitions).
    """
    h = x
    for layer in params["hidden"]:
        h = jnp.einsum("btnd,ndh->btnh", h, layer["weight"], precision=precision)
        h = jnp.tanh(h + layer["bias"])

    flats = []
    for g, idx in enumerate(plan.group_feat_idx):
        m, w = idx.shape
        p = params["groups"][g]
        hg = jnp.take(h, jnp.asarray(plan.group_band_ids[g], dtype=np.int32), axis=2)
        og = jnp.einsum("btmd,mdw->btmw", hg, p["weight"], precision=precision)
        og = og + p["bias"]
        a, b = jnp.split(og, 2, axis=-1)  # GLU
        og = a * jax.nn.sigmoid(b)
        flats.append(og.reshape(x.shape[:2] + (m * w,)))

    flat = jnp.concatenate(flats, axis=-1)
    # Invert the band packing as a GATHER — scatter-add serializes on TPU
    # (measured 40x penalties on this backend for scatter patterns).
    scatter = np.asarray(plan.scatter_feats)
    if np.all(plan.coverage == 1.0):
        # partition (bs_roformer): pure permutation
        inv = np.empty(plan.num_features, np.int64)
        inv[scatter] = np.arange(len(scatter))
        return jnp.take(flat, jnp.asarray(inv, dtype=np.int32), axis=-1)
    # overlapping bands (mel): per-feature gather-sum over a padded index
    # table whose empty slots point at an appended zero column
    max_cov = int(np.max(plan.coverage))
    idx = np.full((plan.num_features, max_cov), len(scatter), np.int64)
    fill = np.zeros(plan.num_features, np.int64)
    for src, f in enumerate(scatter):
        idx[f, fill[f]] = src
        fill[f] += 1
    flatz = jnp.concatenate(
        [flat, jnp.zeros(flat.shape[:-1] + (1,), flat.dtype)], axis=-1)
    out = jnp.take(flatz, jnp.asarray(idx, dtype=np.int32), axis=-1).sum(-1)
    cov = jnp.asarray(np.maximum(plan.coverage, 1e-8))
    return out / cov
