"""Mesh utilities + multi-chip dry run on the virtual 8-device CPU mesh."""

import numpy as np

import jax

from sesa_tpu.parallel import make_mesh, replicate, shard_chunks, shard_params


def test_make_mesh_and_shard():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")

    import jax.numpy as jnp

    chunks = jnp.zeros((8, 2, 1024))
    placed = jax.device_put(chunks, shard_chunks(mesh))
    assert placed.sharding.spec == jax.sharding.PartitionSpec("data", None, None)


def test_tp_param_sharding():
    from ml_collections import ConfigDict

    from sesa_tpu.models import bs_roformer

    mesh = make_mesh(8, model_parallel=2)
    cfg = ConfigDict({"model": dict(
        dim=32, depth=1, stereo=True, num_stems=1, time_transformer_depth=1,
        freq_transformer_depth=1, freqs_per_bands=(2,) * 8 + (4,) * 4 + (16, 17),
        dim_head=8, heads=4, stft_n_fft=128, stft_hop_length=32,
        stft_win_length=128)})
    params = bs_roformer.init(jax.random.PRNGKey(0), cfg)
    placed = shard_params(mesh, params)
    qkv = placed["layers"][0]["time"]["layers"][0]["attn"]["qkv_w"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec("model", None)
    gamma = placed["final_norm_gamma"]
    assert gamma.sharding.spec == jax.sharding.PartitionSpec(None)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
