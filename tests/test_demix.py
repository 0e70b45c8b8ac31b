"""Demix engine tests: overlap-add identity, parity with the reference
chunking semantics (spec: reference utils.py:330-477 at batch_size=1),
demucs-mode averaging, TTA math, and multi-device sharding equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sesa_tpu.runtime import DemixSpec, demix, apply_tta


# ---------------------------------------------------------------------------
# numpy oracle implementing the documented reference chunking semantics
# (linear fade window, reflect tail > chunk/2, border reflect pad, batch=1)
# ---------------------------------------------------------------------------

def oracle_demix(model_np, mix, chunk, overlap, n_stems, demucs=False):
    step = chunk // overlap
    fade = chunk // 10
    border = 0 if demucs else chunk - step
    l0 = mix.shape[-1]
    padded = (not demucs) and border > 0 and l0 > 2 * border
    if padded:
        mix = np.pad(mix, ((0, 0), (border, border)), mode="reflect")
    l = mix.shape[-1]

    base = np.ones(chunk, dtype=np.float64)
    base[:fade] = np.linspace(0, 1, fade)
    base[-fade:] = np.linspace(1, 0, fade)

    result = np.zeros((n_stems, mix.shape[0], l))
    counter = np.zeros(l)
    n = -(-l // step)
    for j in range(n):
        i = j * step
        part = mix[:, i : i + chunk]
        m = part.shape[-1]
        if m < chunk:
            if not demucs and m > chunk // 2:
                part = np.pad(part, ((0, 0), (0, chunk - m)), mode="reflect")
            else:
                part = np.pad(part, ((0, 0), (0, chunk - m)))
        out = model_np(part[None])[0]  # (S, ch, C)
        if demucs:
            w = np.ones(chunk)
        else:
            w = base.copy()
            if j == 0:
                w[:fade] = 1
            elif j == n - 1:
                w[-fade:] = 1
        result[..., i : i + m] += out[..., :m] * w[:m]
        counter[i : i + m] += w[:m]
    est = result / counter[None, None, :]
    est = np.nan_to_num(est)
    if padded:
        est = est[..., border:-border]
    else:
        est = est[..., :l0]
    return est


def _mix_model_np(chunks):
    """Deterministic 2-stem toy model: (B, 2, C) -> (B, 2, 2, C)."""
    s0 = 0.3 * chunks
    s1 = 0.7 * chunks[:, ::-1, :]
    return np.stack([s0, s1], axis=1)


def _mix_model_jax(params, chunks):
    s0 = 0.3 * chunks
    s1 = 0.7 * chunks[:, ::-1, :]
    return jnp.stack([s0, s1], axis=1)


def _identity_model(params, chunks):
    return chunks[:, None]


@pytest.mark.parametrize("t", [44100, 100000, 12000])
def test_overlap_add_identity(t):
    """An identity model must reproduce the mix (bandit audio.py:447-463 pattern)."""
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, t)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=3, num_stems=1)
    out = demix(_identity_model, None, mix, spec)
    assert out.shape == (1, 2, t)
    np.testing.assert_allclose(out[0], mix, atol=2e-5)


@pytest.mark.parametrize(
    "t,chunk,overlap,batch",
    [
        (100000, 16384, 2, 1),
        (100000, 16384, 4, 4),
        (50001, 8192, 2, 3),
        (9000, 16384, 2, 2),  # shorter than one chunk
        (20000, 16384, 2, 2),  # length <= 2*border: no outer padding
        (131072, 16384, 8, 4),
    ],
)
def test_matches_reference_semantics(t, chunk, overlap, batch):
    rng = np.random.default_rng(1)
    mix = rng.standard_normal((2, t)).astype(np.float32)
    ref = oracle_demix(_mix_model_np, mix.astype(np.float64), chunk, overlap, 2)
    spec = DemixSpec(chunk_size=chunk, num_overlap=overlap, batch_size=batch, num_stems=2)
    got = demix(_mix_model_jax, None, mix, spec)
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_demucs_mode_matches_reference_semantics():
    rng = np.random.default_rng(2)
    mix = rng.standard_normal((2, 70000)).astype(np.float32)
    ref = oracle_demix(_mix_model_np, mix.astype(np.float64), 16384, 2, 2, demucs=True)
    spec = DemixSpec(
        chunk_size=16384, num_overlap=2, batch_size=2, num_stems=2, demucs_mode=True
    )
    got = demix(_mix_model_jax, None, mix, spec)
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_tta_combination():
    """TTA math: (base + unswap(swapped) - inverted) / 3 (reference utils.py:241-292)."""
    rng = np.random.default_rng(3)
    mix = rng.standard_normal((2, 40000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=2, num_stems=2)
    base = demix(_mix_model_jax, None, mix, spec)
    out = apply_tta(_mix_model_jax, None, mix, base.copy(), spec)

    swapped = demix(_mix_model_jax, None, mix[::-1].copy(), spec)
    inverted = demix(_mix_model_jax, None, -mix, spec)
    expected = (base + swapped[:, ::-1] - inverted) / 3.0
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_sharded_matches_unsharded():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = jax.sharding.Mesh(np.array(devices[:8]), ("data",))

    rng = np.random.default_rng(4)
    mix = rng.standard_normal((2, 200000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=8, num_stems=2)
    plain = demix(_mix_model_jax, None, mix, spec)
    sharded = demix(_mix_model_jax, None, mix, spec, mesh=mesh)
    np.testing.assert_allclose(sharded, plain, atol=1e-6)


def test_progress_callback():
    progress = []
    mix = np.zeros((2, 100000), dtype=np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=2, num_stems=1)
    demix(_identity_model, None, mix, spec, progress_cb=progress.append)
    assert progress and progress[-1] == 1.0
    assert all(b >= a for a, b in zip(progress, progress[1:]))


def test_upload_mix_int16_exactness():
    from sesa_tpu.runtime.demix import _upload_mix

    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=(2, 1000), dtype=np.int16)
    as_f32 = pcm.astype(np.float32) / 32768.0
    up = np.asarray(_upload_mix(as_f32))
    np.testing.assert_array_equal(up, as_f32)  # bit-exact round trip

    # non-PCM16 content must take the float path unchanged
    arb = rng.standard_normal((2, 1000)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(_upload_mix(arb)), arb)

    # out-of-range samples (clipping-hot masters) also fall back
    hot = as_f32 * 1.5
    np.testing.assert_array_equal(np.asarray(_upload_mix(hot)), hot)


def test_affine_matches_host_normalization():
    """demix(raw, affine=(m, s)) == demix((raw - m)/s) exactly, and the TTA
    wrapper flips the mean for the polarity-inverted augmentation."""
    from sesa_tpu.runtime.demix import DemixSpec, apply_tta, demix

    def model_apply(params, chunks):
        return (chunks * params["g"] + 0.1 * chunks[:, ::-1])[:, None]

    params = {"g": jnp.float32(0.7)}
    spec = DemixSpec(chunk_size=1000, num_overlap=2, batch_size=2, num_stems=1)
    mix = np.random.default_rng(3).standard_normal((2, 5000)).astype(np.float32)
    m, s = float(mix.mean()), float(mix.std())

    host = demix(model_apply, params, (mix - m) / s, spec)
    dev = demix(model_apply, params, mix, spec, affine=(m, s))
    np.testing.assert_allclose(dev, host, atol=1e-6)

    base_host = demix(model_apply, params, (mix - m) / s, spec)
    tta_host = apply_tta(model_apply, params, (mix - m) / s, base_host, spec)
    tta_dev = apply_tta(model_apply, params, mix, dev, spec, affine=(m, s))
    np.testing.assert_allclose(tta_dev, tta_host, atol=1e-5)


def test_int16_transport_close_and_seg_parity():
    """transport="int16" (halved-bytes slab fetch) matches exact-f32
    transport within the scaled-int16 quantization floor, across both the
    single-segment crop path and the pipelined multi-segment path."""
    rng = np.random.default_rng(7)
    mix = rng.standard_normal((2, 100000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=4, num_stems=2)
    exact = demix(_mix_model_jax, None, mix, spec)
    for seg in (1, 8):
        q = demix(_mix_model_jax, None, mix, spec, seg_batches=seg,
                  transport="int16")
        tol = np.abs(exact).max() / 32767.0
        assert np.abs(q - exact).max() <= tol * 1.01, seg


def test_demix_start_overlap_and_shared_upload():
    """Two jobs dispatched before either collects (the multi-model overlap
    path) match sequential demix exactly, including from a shared
    pre-uploaded device mix."""
    from sesa_tpu.runtime.demix import demix_start, upload_mix

    rng = np.random.default_rng(11)
    mix = rng.standard_normal((2, 80000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=2, num_stems=2)
    seq = demix(_mix_model_jax, None, mix, spec, seg_batches=1)

    mix_dev = upload_mix(mix)
    j1 = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=1)
    j2 = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=1,
                     transport="int16")
    a, b = j1.collect(), j2.collect()
    np.testing.assert_allclose(a, seq, atol=1e-6)
    assert np.abs(b - seq).max() <= np.abs(seq).max() / 32767.0 * 1.01


def test_int16_scale_alignment_with_border_only_slabs():
    """Regression: when the left reflect border spans whole slabs
    (num_overlap - 1 >= seg_batches * batch_size), collect() skips those
    slabs — their quantization scales must not shift onto later slabs."""
    rng = np.random.default_rng(13)
    mix = rng.standard_normal((2, 120000)).astype(np.float32)
    # step 2048, border 14336 -> slab_len 4096: first 3 slabs are
    # entirely inside the border
    spec = DemixSpec(chunk_size=16384, num_overlap=8, batch_size=2, num_stems=2)
    exact = demix(_mix_model_jax, None, mix, spec, seg_batches=1)
    q = demix(_mix_model_jax, None, mix, spec, seg_batches=1,
              transport="int16")
    tol = np.abs(exact).max() / 32767.0
    assert np.abs(q - exact).max() <= tol * 1.01


def test_collect_device_matches_host_collect():
    """transport="device" + collect_device assembles the exact f32 engine
    output on device (no host fetch), including stem subsetting, and
    dequantizes correctly when called on an int16-transport job."""
    from sesa_tpu.runtime.demix import demix_start, upload_mix

    rng = np.random.default_rng(19)
    mix = rng.standard_normal((2, 100000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=3, num_stems=2)
    exact = demix(_mix_model_jax, None, mix, spec, seg_batches=1)

    mix_dev = upload_mix(mix)
    for seg in (1, 8):
        j = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=seg,
                        transport="device")
        dev = j.collect_device()
        assert isinstance(dev, jax.Array) and dev.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(dev), exact, atol=1e-6)

    # stem subset: only the selected stems are assembled
    j = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=1,
                    transport="device")
    one = j.collect_device(stems=[1])
    assert one.shape == (1,) + exact.shape[1:]
    np.testing.assert_allclose(np.asarray(one)[0], exact[1], atol=1e-6)

    # device assembly of an int16-transport job dequantizes on device
    j = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=1,
                    transport="int16")
    dev = j.collect_device()
    tol = np.abs(exact).max() / 32767.0
    assert np.abs(np.asarray(dev) - exact).max() <= tol * 1.01


def test_device_chain_matches_host_chain():
    """The device-resident ensemble chain (collect_device -> device
    avg_wave -> phase fix -> downstream demix input) matches the
    host-round-trip chain bit-close at every stage."""
    from sesa_tpu.postprocess.ensemble import (ensemble_waveforms,
                                               ensemble_waveforms_device)
    from sesa_tpu.postprocess.phase_fixer import phase_fix_arrays
    from sesa_tpu.runtime.demix import demix_start, upload_mix

    rng = np.random.default_rng(23)
    mix = rng.standard_normal((2, 90000)).astype(np.float32) * 0.3
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=2, num_stems=2)

    # host chain
    host = demix(_mix_model_jax, None, mix, spec, seg_batches=1)
    ens_host = ensemble_waveforms([host[0], host[1]], "avg_wave")
    fixed_host = phase_fix_arrays(mix, ens_host, 44100)

    # device chain
    mix_dev = upload_mix(mix)
    j = demix_start(_mix_model_jax, None, mix_dev, spec, seg_batches=1,
                    transport="device")
    stems_dev = j.collect_device()
    ens_dev = ensemble_waveforms_device([stems_dev[0], stems_dev[1]],
                                        "avg_wave")
    np.testing.assert_allclose(np.asarray(ens_dev), ens_host, atol=1e-5)
    fixed_dev = phase_fix_arrays(mix_dev, ens_dev, 44100, return_device=True)
    assert isinstance(fixed_dev, jax.Array)
    np.testing.assert_allclose(np.asarray(fixed_dev), fixed_host, atol=1e-4)


def _nan_model(params, chunks):
    out = chunks[:, None] * jnp.float32(1.0)
    return out.at[:, :, :, 5].set(jnp.nan)


def test_nonfinite_outputs_stay_visible():
    """Model-produced NaN must survive to the host on BOTH transports so
    the session's bf16->f32 rescue can fire (the finalize math only zeroes
    counter==0 positions; int16 transport surfaces NaN via its scale)."""
    rng = np.random.default_rng(17)
    mix = rng.standard_normal((2, 60000)).astype(np.float32)
    spec = DemixSpec(chunk_size=16384, num_overlap=2, batch_size=2, num_stems=1)
    for transport in ("f32", "int16"):
        out = demix(_nan_model, None, mix, spec, transport=transport)
        assert not np.isfinite(out).all(), transport


def test_leading_border_slabs_not_fetched():
    """Slabs entirely inside the LEFT reflect border must not submit
    host-fetch futures at dispatch (those bytes cross the scarce relay
    link only to be dropped in collect) — and the skip must not shift
    later slabs' positional index si."""
    from sesa_tpu.runtime.demix import demix_start

    rng = np.random.default_rng(14)
    mix = rng.standard_normal((2, 120000)).astype(np.float32)
    # step 2048, border 14336, slab_len 4096: slabs 0-2 are border-only
    spec = DemixSpec(chunk_size=16384, num_overlap=8, batch_size=2,
                     num_stems=2)
    job = demix_start(_mix_model_jax, None, mix, spec, seg_batches=1,
                      transport="int16")
    placeholders = [i for i, (s, _) in enumerate(job._slabs) if s is None]
    assert placeholders[:3] == [0, 1, 2]
    assert all(job._futures[i] is None for i in placeholders)
    got = job.collect()
    ref = oracle_demix(_mix_model_np, mix.astype(np.float64), 16384, 8, 2)
    tol = np.abs(ref).max() / 32767.0
    assert np.abs(got - ref).max() <= tol * 1.1

    # device-collect path handles the placeholders too
    job2 = demix_start(_mix_model_jax, None, mix, spec, seg_batches=1,
                       transport="device")
    np.testing.assert_allclose(np.asarray(job2.collect_device()), ref,
                               atol=3e-5)
