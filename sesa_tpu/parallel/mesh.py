"""Device-mesh utilities: data-parallel chunk sharding + tensor parallelism.

The reference's only parallelism is single-host nn.DataParallel over the
chunk batch (reference inference.py:209-210, SURVEY.md §2.4). The TPU
equivalents here:

- ``make_mesh`` builds a (data, model) mesh over the available devices
- ``shard_chunks`` places a chunk batch on the data axis (used inside the
  demix engine via ``demix(..., mesh=...)``) — pure data parallelism,
  weights replicated, no collectives except the final gather
- ``roformer_tp_rule``/``shard_params`` lay transformer weights out
  Megatron-style over the model axis (qkv/ff-in split on the output dim,
  out/ff-out on the input dim) so XLA inserts one all-reduce per
  attention+FF pair — exercised by the multi-chip training-step dry run
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2D (data, model) mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_chunks(mesh: Mesh):
    """NamedSharding for a (batch, channels, chunk) chunk batch on data."""
    return NamedSharding(mesh, P("data", None, None))


def replicate(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    spec = NamedSharding(mesh, P())
    return jax.device_put(tree, spec)


def roformer_tp_rule(mesh: Mesh):
    """Path-based Megatron-style layout rule for the roformer param tree."""

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        name = keys[-1] if keys else None
        if name in ("qkv_w", "lin1_w"):
            spec = P("model", None)
        elif name in ("out_w", "lin2_w"):
            spec = P(None, "model")
        elif name == "lin1_b":
            spec = P("model")
        else:
            spec = P(*([None] * np.ndim(leaf)))
        return NamedSharding(mesh, spec)

    return rule


def conformer_tp_rule(mesh: Mesh):
    """Megatron-style layout for the conformer family's param tree.

    Conformer linears keep torch (out, in) orientation: the two FF
    expansions and q/kv projections split on the output dim, the FF
    contraction and attention out-projection on the input dim, so each
    ff/attn pair costs one all-reduce. The conv module (depthwise +
    BatchNorm) and norms stay replicated — they are a few percent of the
    FLOPs and sharding the GLU-paired pointwise convs buys nothing.
    """

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        parent = keys[-2] if len(keys) >= 2 else None
        name = keys[-1] if keys else None
        if parent in ("lin1", "to_q", "to_kv") and name == "weight":
            spec = P("model", None)
        elif parent == "lin1" and name == "bias":
            spec = P("model")
        elif parent in ("lin2", "to_out") and name == "weight":
            spec = P(None, "model")
        else:
            spec = P(*([None] * np.ndim(leaf)))
        return NamedSharding(mesh, spec)

    return rule


def shard_params(mesh: Mesh, params, rule=None):
    """Place a param tree according to ``rule`` (default: roformer TP)."""
    rule = rule or roformer_tp_rule(mesh)
    shardings = jax.tree_util.tree_map_with_path(rule, params)
    return jax.device_put(params, shardings)
