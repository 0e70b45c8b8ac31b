"""End-to-end CLI drive: wav + YAML + torch checkpoint -> stems on disk,
exercising the registry-free checkpoint conversion path."""

import os

import numpy as np
import torch
import yaml

import jax

import pytest

def test_cli_end_to_end(tmp_path):
    from sesa_tpu.audio_io import read_audio, write_audio
    from sesa_tpu.models import bs_roformer
    from tests.test_roformer import bs_model_cfg, export_state_dict

    # fixtures: song, config, torch checkpoint
    sr = 44100
    t = np.arange(sr * 3) / sr
    song = np.stack([0.4 * np.sin(2 * np.pi * 220 * t)] * 2).astype(np.float32)
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    write_audio(str(in_dir / "song.wav"), song, sr)

    mcfg = bs_model_cfg(num_stems=1, stereo=True, depth=1)
    cfg = {
        "audio": {"chunk_size": 8192, "num_channels": 2, "sample_rate": sr},
        "model": {k: (list(v) if isinstance(v, tuple) else v) for k, v in mcfg.items()},
        "training": {"instruments": ["vocals", "other"], "target_instrument": "vocals"},
        "inference": {"num_overlap": 2, "batch_size": 2, "normalize": False},
    }
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from ml_collections import ConfigDict

    spec = bs_roformer.spec_from_config(mcfg)
    params = bs_roformer.init(jax.random.PRNGKey(0), ConfigDict({"model": mcfg}))
    sd = export_state_dict(params, spec, transformer_norm_output=False, final_norm=True)
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save(sd, ckpt_path)

    from sesa_tpu.cli import main

    rc = main([
        "--model_type", "bs_roformer", "--config_path", cfg_path,
        "--start_check_point", ckpt_path, "--input_folder", str(in_dir),
        "--store_dir", str(out_dir), "--extract_instrumental",
        "--force_cpu", "--compute_dtype", "f32",
    ])
    assert rc == 0

    outs = sorted(os.listdir(out_dir))
    assert any("vocals" in f for f in outs)
    assert any("instrumental" in f for f in outs)
    v, _ = read_audio(str(out_dir / [f for f in outs if "vocals" in f][0]))
    i, _ = read_audio(str(out_dir / [f for f in outs if "instrumental" in f][0]))
    # instrumental = mix - vocals by construction
    np.testing.assert_allclose(v + i, song, atol=1e-4)


@pytest.mark.smoke
def test_cli_missing_input():
    from sesa_tpu.cli import main

    rc = main(["--config_path", "/nonexistent.yaml"])  # no input source
    assert rc == 2
