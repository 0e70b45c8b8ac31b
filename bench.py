"""Headline benchmarks: the BASELINE.json configs on one TPU chip.

Emits ONE JSON line per config, in this order (env `SESA_BENCH_ONLY` — a
comma list of config names — subsets the run):

  mel_band_roformer_rtf       dominant registry family (83/121 entries)
  mdx23c_2stem_rtf            MDX23C TFC-TDF v3 2-stem (InstVocHQ shape)
  htdemucs_4stem_rtf          demucs4ht hybrid transformer, demucs-mode
  scnet_melconf_rtf           SCNet 4-stem + mel-band conformer vocals
  ensemble_pipeline_rtf       avg_wave ensemble + phase_fixer + Apollo
  bs_roformer_vocals_300s_rtf flagship on a 5-minute song
  bs_roformer_vocals_rtf      flagship (LAST: driver parses the final line)

Each separates a synthetic 60 s 44.1 kHz stereo song through the on-device
demix engine in bf16 and reports RTF = audio-seconds processed per
wall-second per chip. vs_baseline is RTF / 20: the north-star target from
BASELINE.json is >= 20x realtime per v5e chip on the flagship (the PyTorch
reference publishes no numbers of its own — BASELINE.md).

Model shapes mirror the reference's flagship community checkpoints:
MDX23C InstVocHQ (reference model.py:631, mdx23c_tfc_tdf_v3.py:141-242),
htdemucs_ft (demucs4ht.py:28-693), SCNet (scnet/scnet.py:230-373), mel-band
conformer (mel_band_conformer.py), Apollo universal (look2hear).
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax

try:  # persistent XLA compilation cache: first bench of a session is slow,
    # later runs (and later rounds) reuse the compiled executables
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    # the Pallas kernels embed caller tracebacks in MLIR locations, which
    # destabilizes the cache key across otherwise-identical runs
    jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:
    pass

import jax.numpy as jnp

from ml_collections import ConfigDict

from sesa_tpu.runtime import DemixSpec, demix

SR = 44100
SONG_SECONDS = 60


def make_song(seconds=SONG_SECONDS, seed=0, gain=0.3):
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * SR) / SR
    song = (
        gain * np.sin(2 * np.pi * 220 * t)
        + 0.1 * rng.standard_normal(seconds * SR)
    ).astype(np.float32)
    mix = np.stack([song, 0.9 * song])
    # real input is 16-bit PCM; quantizing keeps the benchmark honest and
    # exercises the lossless int16 host->device upload path
    return np.clip(np.round(mix * 32768), -32768, 32767).astype(np.float32) / 32768


def _cache_entries():
    """(count, bytes) of the persistent XLA compile cache."""
    d = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        files = [os.path.join(d, f) for f in os.listdir(d)]
        return len(files), sum(os.path.getsize(f) for f in files)
    except OSError:
        return 0, 0


def timed(fn, runs):
    """Compile (first call) then best-of-N timed runs. demix() returns host
    numpy, so every timing ends with a device->host data fetch.

    Cache forensics: `cache_new` counts persistent-cache entries written
    by the first call. 0 means every executable was served from
    .jax_cache (a LOCAL hit — any residual compile_s is the relay's
    remote-side compile/load, whose cache is ephemeral per session;
    tools/coldstart_probe.py decomposes it)."""
    n0, _ = _cache_entries()
    t0 = time.time()
    out = fn()
    compile_s = time.time() - t0
    n1, _ = _cache_entries()
    times = []
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    assert np.isfinite(out).all()
    return min(times), compile_s, n1 - n0


def emit(metric, rtf, best, compile_s, cache_new=None, hold=False, **detail):
    if cache_new is not None:
        # 0 => all executables came from the local persistent cache
        detail.update(cache_new_entries=cache_new,
                      local_cache_hit=cache_new == 0)
    detail.update(
        song_seconds=SONG_SECONDS,
        best_wall_s=round(best, 3),
        compile_s=round(compile_s, 1),
        compute_dtype="bfloat16",
        device=str(jax.devices()[0]),
    )
    line = json.dumps({
        "metric": metric,
        "value": round(rtf, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(rtf / 20.0, 3),
        "detail": detail,
    })
    if hold:
        return line
    print(line, flush=True)


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _flagship_setup():
    """Flagship bs_roformer (viperx vocals architecture — reference
    model.py:650) at the production demix shape. Single source of truth:
    the perf tools (int8_eval, long_song_probe) import this so every
    sweep measures the exact model the bench reports.

    batch 6 x seg_batches 1: the 17-chunk song runs as 3 pipelined
    segments, so two of the three output-slab fetches hide behind the
    next segment's compute (tools/pipeline_sweep.json; re-verified under
    int16 transport: seg1 29.6x vs seg3 23.6x interleaved)."""
    from sesa_tpu.models import bs_roformer

    config = ConfigDict({"model": dict(
        dim=512, depth=12, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=2,
    )})
    params = bs_roformer.init(jax.random.PRNGKey(0), config)

    def model_apply(p, chunks):
        return bs_roformer.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=6,
                     num_stems=1)
    return model_apply, params, spec


def bench_flagship(runs=5, hold=False):
    model_apply, params, spec = _flagship_setup()
    mix = make_song()
    best, compile_s, cache_new = timed(
        lambda: demix(model_apply, params, mix, spec, seg_batches=1, transport="int16"), runs)
    return emit("bs_roformer_vocals_rtf", SONG_SECONDS / best, best, compile_s,
                cache_new=cache_new, hold=hold, chunk_size=352800, batch_size=6, num_overlap=2,
                seg_batches=1, dim=512, depth=12)


@functools.lru_cache(maxsize=1)
def _melband_setup():
    """Mel-Band RoFormer at the dominant registry shape: 83 of 121
    registry entries are mel_band_roformer and the common community
    architecture (Kim vocal lineage, reference model.py mel-band entries)
    is dim 384 / depth 12 / 60 mel bands."""
    from sesa_tpu.models import mel_band_roformer

    config = ConfigDict({"model": dict(
        dim=384, depth=12, stereo=True, num_stems=1, num_bands=60,
        sample_rate=SR, time_transformer_depth=1, freq_transformer_depth=1,
        dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=512,
        stft_win_length=2048, mask_estimator_depth=1,
    )})
    params = mel_band_roformer.init(jax.random.PRNGKey(2), config)

    def model_apply(p, chunks):
        return mel_band_roformer.apply(p, config, chunks,
                                       compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=6,
                     num_stems=1)
    return model_apply, params, spec


def bench_mel_band_roformer(runs=3):
    model_apply, params, spec = _melband_setup()
    mix = make_song()
    best, compile_s, cache_new = timed(
        lambda: demix(model_apply, params, mix, spec, seg_batches=1,
                      transport="int16"), runs)
    emit("mel_band_roformer_rtf", SONG_SECONDS / best, best, compile_s,
         cache_new=cache_new, chunk_size=352800, batch_size=6, num_overlap=2,
         dim=384, depth=12, num_bands=60)


def bench_flagship_300s(runs=2):
    """The 5-minute scaling point: same flagship executable per chunk, a
    bigger buffer bucket and 9 pipelined segments — fixed overheads
    amortize, so RTF should EXCEED the 60 s number (BASELINE.md)."""
    model_apply, params, spec = _flagship_setup()
    seconds = 300
    mix = make_song(seconds=seconds)
    best, compile_s, cache_new = timed(
        lambda: demix(model_apply, params, mix, spec, seg_batches=1,
                      transport="int16"), runs)
    rtf = seconds / best
    print(json.dumps({
        "metric": "bs_roformer_vocals_300s_rtf", "value": round(rtf, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(rtf / 20.0, 3),
        "detail": {"song_seconds": seconds, "best_wall_s": round(best, 3),
                   "compile_s": round(compile_s, 1),
                   "cache_new_entries": cache_new,
                   "local_cache_hit": cache_new == 0,
                   "chunk_size": 352800, "batch_size": 6,
                   "compute_dtype": "bfloat16",
                   "device": str(jax.devices()[0])},
    }), flush=True)


def bench_mdx23c(runs=3):
    from sesa_tpu.models import mdx23c

    # InstVocHQ shape (SDR 10.17, reference model.py:631): dim_f 4096,
    # n_fft 8192, 5 scales x 128ch + 128 growth, 4 subbands
    config = ConfigDict({
        "audio": dict(n_fft=8192, hop_length=1024, dim_f=4096,
                      num_channels=2, chunk_size=261120, sample_rate=SR),
        "model": dict(num_subbands=4, num_scales=5, scale=[2, 2],
                      num_blocks_per_scale=2, num_channels=128, growth=128,
                      bottleneck_factor=4, norm="InstanceNorm", act="gelu"),
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })
    params = mdx23c.init(jax.random.PRNGKey(0), config)

    def model_apply(p, chunks):
        return mdx23c.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    # batch 8: the conv U-Net fills the MXU ~1.55x better than batch 4
    # (tools/profile_mdx23c.py: forward RTF 24.8 -> 38.6)
    spec = DemixSpec(chunk_size=261120, num_overlap=2, batch_size=8,
                     num_stems=2)
    mix = make_song()
    best, compile_s, cache_new = timed(
        lambda: demix(model_apply, params, mix, spec, seg_batches=1, transport="int16"), runs)
    emit("mdx23c_2stem_rtf", SONG_SECONDS / best, best, compile_s,
         cache_new=cache_new,
         chunk_size=261120, batch_size=8, num_overlap=2,
         dim_f=4096, num_scales=5, num_channels=128)


def bench_htdemucs(runs=3):
    from sesa_tpu.models import htdemucs

    # htdemucs_ft shape (reference demucs4ht.py:28-693): 48ch, depth 4,
    # nfft 4096, 5 cross-transformer layers @ dim 512
    config = ConfigDict({
        "model": "htdemucs",
        "training": {"instruments": ["drums", "bass", "other", "vocals"],
                     "channels": 2, "samplerate": SR, "segment": 11},
        "htdemucs": dict(channels=48, growth=2, nfft=4096, depth=4,
                         kernel_size=8, stride=4, norm_starts=4,
                         norm_groups=4, dconv_depth=2, dconv_comp=8,
                         t_layers=5, t_heads=8, t_hidden_scale=4.0,
                         bottom_channels=512, freq_emb=0.2, emb_scale=10),
    })
    params = htdemucs.init(jax.random.PRNGKey(0), config)

    def model_apply(p, chunks):
        return htdemucs.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    # demucs-mode demix: plain averaging, zero-pad tail, no fade window
    # (reference demix in processing: transition_power=1 shifts path)
    spec = DemixSpec(chunk_size=11 * SR, num_overlap=2, batch_size=8,
                     num_stems=4, demucs_mode=True)
    mix = make_song()
    best, compile_s, cache_new = timed(
        lambda: demix(model_apply, params, mix, spec, seg_batches=1, transport="int16"), runs)
    emit("htdemucs_4stem_rtf", SONG_SECONDS / best, best, compile_s,
         cache_new=cache_new,
         chunk_size=11 * SR, batch_size=8, num_overlap=2,
         channels=48, t_layers=5, bottom_channels=512)


@functools.lru_cache(maxsize=1)
def _scnet_setup():
    """Shared across the scnet_melconf and ensemble configs so both reuse
    ONE jitted executable (the demix jit is keyed on the apply object)."""
    from sesa_tpu.models import scnet

    config = ConfigDict({"model": dict(
        dims=[4, 32, 64, 128], nfft=4096, hop_size=1024, win_size=4096,
        normalized=True, num_dplayer=6, expand=1,
    )})
    params = scnet.init(jax.random.PRNGKey(0), config)

    def apply_fn(p, chunks):
        return scnet.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=6,
                     num_stems=4)
    return apply_fn, params, spec


@functools.lru_cache(maxsize=1)
def _melconf_setup():
    from sesa_tpu.models import mel_band_conformer

    config = ConfigDict({"model": dict(
        dim=384, depth=8, stereo=True, num_stems=1, num_bands=60,
        time_conformer_depth=1, freq_conformer_depth=1,
        stft_n_fft=2048, stft_hop_length=512, stft_win_length=2048,
    )})
    params = mel_band_conformer.init(jax.random.PRNGKey(1), config)

    def apply_fn(p, chunks):
        return mel_band_conformer.apply(p, config, chunks,
                                        compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=352800, num_overlap=2, batch_size=6,
                     num_stems=1)
    return apply_fn, params, spec


def bench_scnet_melconf(runs=5):
    """SCNet 4-stem then mel-band conformer vocals over the same song — the
    BASELINE 'SCNet + mel-band conformer stems' config. RTF counts ONE pass
    of the song through BOTH models. The song uploads once (shared device
    mix) and both jobs dispatch before either collects, so scnet's 42 MB
    4-stem fetch hides behind melconf's compute (runtime/demix.py
    DemixJob)."""
    from sesa_tpu.runtime import demix_start, upload_mix

    sc_apply, sc_params, sc_spec = _scnet_setup()
    mc_apply, mc_params, mc_spec = _melconf_setup()
    mix = make_song()

    def run():
        mix_dev = upload_mix(mix)
        j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                         seg_batches=1, transport="int16")
        j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                         seg_batches=1, transport="int16")
        a, b = j1.collect(), j2.collect()
        return np.concatenate([a.reshape(4, -1), b.reshape(1, -1)], axis=0)

    best, compile_s, cache_new = timed(run, runs)
    emit("scnet_melconf_rtf", SONG_SECONDS / best, best, compile_s,
         cache_new=cache_new,
         chunk_size=352800, batch_size=6, num_overlap=2,
         scnet_dims=[4, 32, 64, 128], melconf_dim=384, melconf_depth=8)


@functools.lru_cache(maxsize=1)
def _apollo_setup():
    """Apollo universal model shape (look2hear): 44.1k, 20ms win, 256
    feat, 6 layers; GUI default chunk 19 s (apollo_processing.py). Shared
    with tools/chain_sweep.py so sweeps measure the benched model."""
    from sesa_tpu.models import apollo

    config = ConfigDict({"model": dict(sr=SR, win=20, feature_dim=256,
                                       layer=6)})
    params = apollo.init(jax.random.PRNGKey(0), config)

    def ap_apply(p, chunks):
        return apollo.apply(p, config, chunks, compute_dtype=jnp.bfloat16)

    spec = DemixSpec(chunk_size=19 * SR, num_overlap=2, batch_size=2,
                     num_stems=1)
    return ap_apply, params, spec


def bench_ensemble_pipeline(runs=4):
    """REAL auto-ensemble data flow (reference auto_ensemble_process,
    processing.py:798-1188): two actual model separations of the same song
    (SCNet vocals + mel-band conformer vocals) feed the avg_wave ensemble,
    then phase_fixer against the mix, then Apollo restoration. The chain
    runs DEVICE-RESIDENT end to end (demix transport="device" ->
    DemixJob.collect_device -> fused ensemble_phase_fix_device (ONE XLA
    program for combine+STFT+blend+iSTFT) -> Apollo demix): the song
    uploads once and only Apollo's restored output crosses back to the
    host, so the recorded RTF covers the production chain's two real relay
    transfers instead of the reference's per-stage host round trips."""
    from sesa_tpu.postprocess.phase_fixer import ensemble_phase_fix_device
    from sesa_tpu.runtime import demix_start, upload_mix

    sc_apply, sc_params, sc_spec = _scnet_setup()
    mc_apply, mc_params, mc_spec = _melconf_setup()
    ap_apply, ap_params, ap_spec = _apollo_setup()
    mix = make_song()

    def run():
        mix_dev = upload_mix(mix)
        j1 = demix_start(sc_apply, sc_params, mix_dev, sc_spec,
                         seg_batches=1, transport="device")
        j2 = demix_start(mc_apply, mc_params, mix_dev, mc_spec,
                         seg_batches=1, transport="device")
        # scnet stem 3 = vocals; both stems stay in HBM
        fixed = ensemble_phase_fix_device(
            mix_dev, [j1.collect_device(stems=[3])[0],
                      j2.collect_device()[0]], SR, method="avg_wave")
        restored = demix(ap_apply, ap_params, fixed, ap_spec,
                         seg_batches=1, transport="int16")
        return np.asarray(restored)

    best, compile_s, cache_new = timed(run, runs)
    emit("ensemble_pipeline_rtf", SONG_SECONDS / best, best, compile_s,
         cache_new=cache_new,
         chain="scnet+melconf -> avg_wave -> phase_fix -> apollo (device-resident)",
         n_models=2, method="avg_wave", apollo_chunk_s=19,
         apollo_feature_dim=256, apollo_layers=6,
         apollo_batch=ap_spec.batch_size)


CONFIGS = {
    "mel_band_roformer": bench_mel_band_roformer,
    "mdx23c": bench_mdx23c,
    "htdemucs": bench_htdemucs,
    "scnet_melconf": bench_scnet_melconf,
    "ensemble": bench_ensemble_pipeline,
    "flagship_300s": bench_flagship_300s,
}


def _probe_devices_once(timeout_s=600.0):
    """Bounded TPU-backend probe in a SUBPROCESS: the device relay has
    multi-hour outages during which first device use HANGS ~25 min before
    raising. A subprocess keeps the hang out of this process — a hung
    in-process init poisons every later jax.devices() call (the prior
    daemon-thread probe could not be retried for exactly that reason) —
    and is simply killed at the deadline."""
    import subprocess

    code = ("import jax; d = jax.devices(); "
            "print('SESA_PROBE_OK', d[0].platform, len(d))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, (f"device init did not return within {timeout_s:.0f}s "
                       "(TPU relay down?)")
    if proc.returncode == 0 and "SESA_PROBE_OK" in proc.stdout:
        return True, None
    tail = (proc.stderr or proc.stdout).strip()[-300:]
    return False, f"probe rc={proc.returncode}: {tail}"


def _probe_devices(budget_s, t_start):
    """Spread up to SESA_BENCH_PROBE_ATTEMPTS bounded probes across the
    bench budget: relay outages often end mid-window, and round 3 lost its
    whole bench to a single 600 s probe that gave up ~37 minutes before
    the budget ran out. Reserves SESA_BENCH_RESERVE_S of budget so a late
    success still leaves time to bench the flagship."""
    probe_s = float(os.environ.get("SESA_BENCH_PROBE_S", "600"))
    attempts = int(os.environ.get("SESA_BENCH_PROBE_ATTEMPTS", "3"))
    retry_sleep = float(os.environ.get("SESA_BENCH_PROBE_SLEEP_S", "240"))
    reserve = float(os.environ.get("SESA_BENCH_RESERVE_S", "600"))
    err = None
    for i in range(attempts):
        remaining = budget_s - (time.time() - t_start)
        if i > 0 and remaining <= reserve + 60:
            break  # too late for another probe to leave bench time
        ok, err = _probe_devices_once(
            min(probe_s, max(60.0, remaining - reserve)))
        if ok:
            return True, None
        print(f"[bench] probe {i + 1}/{attempts} failed: {err}",
              file=sys.stderr, flush=True)
        remaining = budget_s - (time.time() - t_start)
        if i < attempts - 1 and remaining > reserve + retry_sleep + 60:
            time.sleep(retry_sleep)
    return False, err


def main():
    """Flagship RUNS first (so a compile blow-up in a secondary config can
    never lose the headline number) but PRINTS last — the driver parses
    the final JSON line. Secondary configs share a wall-clock budget
    (SESA_BENCH_BUDGET_S, default 45 min; their compiles are minutes-long
    cold but cached across runs)."""
    only = [s for s in os.environ.get("SESA_BENCH_ONLY", "").split(",") if s]
    budget = float(os.environ.get("SESA_BENCH_BUDGET_S", "2700"))
    t_start = time.time()

    ok, err = _probe_devices(budget, t_start)
    if not ok:
        # one explainable line instead of five ~25-min hangs
        print(json.dumps({"metric": "bs_roformer_vocals_rtf", "value": 0,
                          "unit": "audio_sec_per_sec_per_chip",
                          "vs_baseline": 0,
                          "detail": {"error": f"tpu_unavailable: {err}"}}),
              flush=True)
        return 0

    flagship_line = None
    if not only or "flagship" in only:
        try:
            flagship_line = bench_flagship(hold=True)
        except Exception as e:
            flagship_line = json.dumps(
                {"metric": "flagship_error", "value": 0, "unit": "error",
                 "vs_baseline": 0, "detail": {"error": repr(e)[:300]}})

    for name, fn in CONFIGS.items():
        if only and name not in only:
            continue
        if time.time() - t_start > budget:
            print(json.dumps({"metric": f"{name}_skipped", "value": 0,
                              "unit": "skipped_over_budget", "vs_baseline": 0,
                              "detail": {"budget_s": budget}}), flush=True)
            continue
        try:
            fn()
        except Exception as e:  # one config failing must not kill the rest
            print(json.dumps({"metric": f"{name}_error", "value": 0,
                              "unit": "error", "vs_baseline": 0,
                              "detail": {"error": repr(e)[:300]}}), flush=True)
    if flagship_line:
        print(flagship_line, flush=True)


if __name__ == "__main__":
    sys.exit(main())
