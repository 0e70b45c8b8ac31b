"""Apollo enhancement post-processing — native, no subprocess.

Functional parity with reference apollo_processing.py:9-216, with one
design change: the reference shells out to an external Apollo repo per
stem; here the Apollo model (sesa_tpu.models.apollo) runs in-process
through the demix engine. Supports the same four model presets, the
per-file ``normal_method`` and the ``mid_side_method`` (M/S encode →
enhance each mono channel → L/R decode), and the same per-file fallback
to the unenhanced file on error.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from sesa_tpu.helpers import sanitize_filename

# display name -> (checkpoint url, config url) — the reference's four presets
APOLLO_MODELS = {
    "MP3 Enhancer": (
        "https://huggingface.co/JusperLee/Apollo/resolve/main/pytorch_model.bin",
        "https://github.com/JusperLee/Apollo/raw/main/configs/apollo.yaml",
    ),
    "Lew Vocal Enhancer": (
        "https://huggingface.co/lew1s/apollo_vocal/resolve/main/apollo_model.ckpt",
        "https://github.com/JusperLee/Apollo/raw/main/configs/apollo.yaml",
    ),
    "Lew Vocal Enhancer v2 (beta)": (
        "https://huggingface.co/lew1s/apollo_vocal/resolve/main/apollo_model_v2.ckpt",
        "https://huggingface.co/lew1s/apollo_vocal/resolve/main/config_apollo_vocal.yaml",
    ),
    "Apollo Universal Model": (
        "https://huggingface.co/jarredou/apollo_universal/resolve/main/apollo_universal_model.ckpt",
        "https://huggingface.co/jarredou/apollo_universal/resolve/main/config_apollo.yaml",
    ),
}


def _apollo_session(model_name: str, chunk_size: int, overlap: int,
                    num_channels: int = 2):
    from sesa_tpu.registry import download_file
    from sesa_tpu.runtime.session import InferenceSession

    ckpt_url, config_url = APOLLO_MODELS.get(model_name, APOLLO_MODELS["Apollo Universal Model"])
    ckpt = download_file(ckpt_url)
    config = download_file(config_url)
    return InferenceSession.create(
        "apollo", config, ckpt,
        # the GUI expresses apollo chunk size in seconds (default 19)
        chunk_size=int(chunk_size) * 44100 if chunk_size < 100 else int(chunk_size),
        num_overlap=int(overlap),
        num_channels=num_channels,
    )


def process_with_apollo(
    output_files: List[str],
    output_dir: str,
    apollo_chunk_size: int,
    apollo_overlap: int,
    apollo_method: str,
    apollo_normal_model: str,
    apollo_midside_model: str,
    output_format: str = "wav",
    progress=None,
    total_progress_start: int = 80,
    total_progress_end: int = 100,
) -> List[str]:
    """Enhance separated stems with Apollo; per-file errors keep the original."""
    from sesa_tpu.audio_io import read_audio, write_audio

    os.makedirs(output_dir, exist_ok=True)
    model_name = (apollo_midside_model if apollo_method == "mid_side_method"
                  else apollo_normal_model)
    try:
        session = _apollo_session(
            model_name, apollo_chunk_size, apollo_overlap,
            num_channels=1 if apollo_method == "mid_side_method" else 2)
    except Exception as e:
        print(f"Apollo unavailable ({e}); returning unenhanced files")
        return list(output_files)

    files = [f for f in output_files if f and os.path.exists(f)]
    span = total_progress_end - total_progress_start
    enhanced = []
    done = 0  # progress counts PROCESSED files, not list positions —
    # indexing output_files against len(files) overshot the end bound
    # whenever entries were missing
    for path in output_files:
        if not path or not os.path.exists(path):
            enhanced.append(path)
            continue
        base = sanitize_filename(os.path.splitext(os.path.basename(path))[0])
        suffix = "_Mid_Side_Enhanced" if apollo_method == "mid_side_method" else "_Enhanced"
        out_path = os.path.join(output_dir, f"{base}{suffix}.{output_format}")
        try:
            if progress is not None:
                progress(total_progress_start + done * span / max(1, len(files)),
                         desc=f"Enhancing with Apollo... ({done + 1}/{len(files)})")
            done += 1
            audio, sr = read_audio(path)
            if apollo_method == "mid_side_method":
                if audio.shape[0] == 1:
                    audio = np.repeat(audio, 2, axis=0)
                mid = (audio[0] + audio[1]) * 0.5
                side = (audio[0] - audio[1]) * 0.5
                mid_e = session.separate(mid[None])  # mono channel
                side_e = session.separate(side[None])
                mid_e = next(iter(mid_e.values()))[0]
                side_e = next(iter(side_e.values()))[0]
                n = min(len(mid_e), len(side_e))
                out = np.stack([mid_e[:n] + side_e[:n], mid_e[:n] - side_e[:n]])
            else:
                stems = session.separate(audio)
                out = next(iter(stems.values()))
            enhanced.append(write_audio(out_path, out, sr))
        except Exception as e:
            print(f"Apollo failed for {path}: {e}; keeping original")
            enhanced.append(path)
    return enhanced
