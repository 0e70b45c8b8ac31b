"""Chunked overlap-add separation engine — the framework's hot path.

Re-designs the reference's host-side chunk loop (reference utils.py:330-477
``demix`` and inference_pytorch.py:55-186 ``demix_pytorch_optimized``) as
device-resident compute:

- the full (padded) mix lives in HBM once; chunks are gathered on device
  inside jit (dynamic_slice + reflect-tail index math), never on the host
- fade-window overlap-add accumulation happens on device into donated
  accumulator buffers, so there is no per-batch host↔device round trip
  (the reference moves every batch output back to CPU, utils.py:441-445)
- the batch loop itself is an on-device ``lax.scan`` over fixed-size
  segments, so a whole song costs a handful of dispatches and ONE compiled
  executable is reused across songs: chunk counts are bucketed to the
  segment size and the HBM buffers to power-of-two lengths, both of which
  only pad compute that is masked out (weight 0)
- with a ``jax.sharding.Mesh``, the chunk batch is sharded over the mesh's
  ``data`` axis — the TPU equivalent of the reference's nn.DataParallel
  (reference inference.py:209-210)

Numerical semantics match the reference at ``batch_size=1`` exactly:
linear fade window with no fade-in on the first chunk and no fade-out on
the last (reference utils.py:432-437), per-chunk reflect padding of short
tails when more than half a chunk remains (utils.py:417-421), outer
reflect border padding (utils.py:391-393), and division by the window
counter with NaN→0 (utils.py:457-459). At ``batch_size>1`` the reference
applies the first/last-chunk window fix to a whole batch; that differs
only at the two exact zero endpoints of the fade (where its counter math
divides 0/0 → 0) and never inside overlap regions for ``num_overlap ≤ 10``.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.ops.stft import overlap_add
from sesa_tpu.ops.windows import fade_window

# model_apply(params, chunks[B, ch, C]) -> [B, S, ch, C]
ModelApply = Callable[..., jax.Array]

# batches of chunks processed per device dispatch (one lax.scan segment)
_SEG_BATCHES = 8


@dataclasses.dataclass(frozen=True)
class DemixSpec:
    """Static chunking parameters (hashable — part of the jit cache key)."""

    chunk_size: int
    num_overlap: int = 2
    batch_size: int = 4
    num_stems: int = 1
    num_channels: int = 2
    # demucs mode: plain averaging, zero tail padding, no fade window,
    # no outer border padding (reference utils.py:376-380,443-445)
    demucs_mode: bool = False

    @property
    def step(self) -> int:
        return self.chunk_size // self.num_overlap

    @property
    def border(self) -> int:
        return 0 if self.demucs_mode else self.chunk_size - self.step

    @property
    def fade_size(self) -> int:
        return self.chunk_size // 10


def _windows(spec: DemixSpec) -> np.ndarray:
    """(3, chunk) stack: [interior, first-chunk, last-chunk] blend windows."""
    c, f = spec.chunk_size, spec.fade_size
    if spec.demucs_mode:
        return np.ones((3, c), dtype=np.float32)
    base = np.asarray(fade_window(c, f))
    first = base.copy()
    first[:f] = 1.0
    last = base.copy()
    last[-f:] = 1.0
    return np.stack([base, first, last]).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _windows_device(spec: DemixSpec) -> jax.Array:
    """Device-resident blend windows, uploaded once per spec (the (3, chunk)
    f32 stack is ~4 MB — a real cost per call on the ~50 MB/s link). Safe to
    cache across jit traces: created eagerly, never a tracer."""
    return jnp.asarray(_windows(spec))


def _process_batch(
    model_apply: ModelApply,
    spec: DemixSpec,
    params,
    mix_buf: jax.Array,  # (ch, L_buf), zero-padded beyond true length
    result: jax.Array,  # (S, ch, L_buf)
    counter: jax.Array,  # (L_buf,)
    windows: jax.Array,  # (3, chunk)
    length: jax.Array,  # () int32 — true (padded-mix) length
    n_chunks: jax.Array,  # () int32 — number of real chunks
    first_chunk: jax.Array,  # () int32 — index of this batch's first chunk
    batch_sharding,
):
    """Gather, forward, and accumulate one batch of chunks (traced)."""
    c, step, b = spec.chunk_size, spec.step, spec.batch_size
    chunk_idx = first_chunk + jnp.arange(b, dtype=jnp.int32)  # (B,)
    starts = chunk_idx * step

    def gather_chunk(start):
        sliced = jax.lax.dynamic_slice(
            mix_buf, (0, start), (mix_buf.shape[0], c)
        )  # (ch, C); zeros beyond true length
        m = jnp.clip(length - start, 0, c)  # valid samples in this chunk
        k = jnp.arange(c, dtype=jnp.int32)
        if spec.demucs_mode:
            return jnp.where(k < m, sliced, 0.0)
        # reflect the tail when more than half a chunk remains, else zeros
        refl = jnp.clip(2 * m - 2 - k, 0, c - 1)
        idx = jnp.where(k < m, k, refl)
        gathered = jnp.take(sliced, idx, axis=-1)
        return jnp.where(
            (k < m) | (m > c // 2), jnp.where(k < m, sliced, gathered), 0.0
        )

    chunks = jax.vmap(gather_chunk)(starts)  # (B, ch, C)
    if batch_sharding is not None:
        chunks = jax.lax.with_sharding_constraint(chunks, batch_sharding)

    out = model_apply(params, chunks)  # (B, S, ch, C)
    out = out.astype(result.dtype)

    # per-chunk blend window: interior / first / last
    which = jnp.where(chunk_idx == 0, 1, jnp.where(chunk_idx == n_chunks - 1, 2, 0))
    win = windows[which]  # (B, C)
    # chunks past the end contribute nothing
    valid = (chunk_idx < n_chunks).astype(win.dtype)
    win = win * valid[:, None]

    # batch-level OLA via static slice-adds, then ONE read-add-write into
    # the global accumulators. (A per-chunk scan re-sliced the
    # hundreds-of-MB result buffer B times per batch — on a 5-minute song
    # that overhead halved the realtime factor.)
    s_stems, ch = out.shape[1], out.shape[2]
    lb = c + step * (b - 1)
    ow = out * win[:, None, None, :]  # (B, S, ch, C)
    ow = jnp.moveaxis(ow, 0, 2).reshape(s_stems * ch, b, c)
    seg = overlap_add(ow, step).reshape(s_stems, ch, lb)
    cseg = overlap_add(win[None], step)[0]  # (Lb,)
    start0 = starts[0]
    r_sl = jax.lax.dynamic_slice(result, (0, 0, start0), (s_stems, ch, lb))
    result = jax.lax.dynamic_update_slice(result, r_sl + seg, (0, 0, start0))
    c_sl = jax.lax.dynamic_slice(counter, (start0,), (lb,))
    counter = jax.lax.dynamic_update_slice(counter, c_sl + cseg, (start0,))
    return result, counter


@functools.partial(
    jax.jit,
    static_argnames=("model_apply", "spec", "seg_batches", "batch_sharding"),
    donate_argnames=("result", "counter"),
)
def _demix_segment(
    model_apply: ModelApply,
    spec: DemixSpec,
    seg_batches: int,
    params,
    mix_buf: jax.Array,
    result: jax.Array,
    counter: jax.Array,
    windows: jax.Array,
    length: jax.Array,
    n_chunks: jax.Array,
    first_chunk: jax.Array,
    batch_sharding=None,
):
    """Process ``seg_batches`` consecutive batches as one on-device scan.

    One executable per (spec, seg_batches, buffer-bucket); reused across
    segments and across songs.

    Besides the carried accumulators, each call returns the FINALIZED
    output slab for the chunk range it just completed: once every chunk
    with index < first_chunk + seg_batches*batch_size has been
    accumulated, output samples below that bound's start position can
    never be written again (later chunks only add at >= their own start),
    so their result/counter division is final. Returning the slab from
    the same executable lets the caller ``copy_to_host_async`` it while
    the NEXT segment computes — the device->host transfer (the single
    largest non-compute cost on the ~44 MB/s relay link: ~0.8 s for a
    60 s stereo stem, ~2.2 s for four stems) hides behind compute
    instead of serializing after it (reference utils.py:441-445 pays
    this per batch, on every batch).
    """

    n_batches = (n_chunks + spec.batch_size - 1) // spec.batch_size
    first_batch = first_chunk // spec.batch_size
    hi = jnp.minimum(first_batch + seg_batches, n_batches)

    def cond(state):
        bi, _, _ = state
        return bi < hi

    def body(state):
        bi, result, counter = state
        result, counter = _process_batch(
            model_apply,
            spec,
            params,
            mix_buf,
            result,
            counter,
            windows,
            length,
            n_chunks,
            bi * spec.batch_size,
            batch_sharding,
        )
        return (bi + 1, result, counter)

    # while_loop (not scan): the trip count is the TRACED number of real
    # batches, so short songs don't pay for padded scan iterations while the
    # executable still serves every song length.
    _, result, counter = jax.lax.while_loop(
        cond, body, (first_batch, result, counter)
    )

    slab_len = seg_batches * spec.batch_size * spec.step
    start = first_chunk * spec.step
    s_stems, ch = result.shape[0], result.shape[1]
    slab_r = jax.lax.dynamic_slice(result, (0, 0, start), (s_stems, ch, slab_len))
    slab_c = jax.lax.dynamic_slice(counter, (start,), (slab_len,))
    slab = _finalize_math(slab_r, slab_c)
    return result, counter, slab


def _finalize_math(result: jax.Array, counter: jax.Array) -> jax.Array:
    est = result / jnp.where(counter > 0, counter, 1.0)[None, None, :]
    # counter==0 positions are zeroed explicitly; model-produced NaN/Inf is
    # deliberately NOT scrubbed here — the session's bf16->f32 rescue
    # detects it after the fetch (int16 transport surfaces it too: the
    # quantization scale is max|slab|, which propagates the non-finite).
    # The final nan_to_num of reference utils.py:459 happens host-side in
    # session.separate, after the rescue decision.
    return jnp.where(counter[None, None, :] > 0, est, 0.0)


def _bucket_length(l_buf: int, chunk: int) -> int:
    """Round the HBM buffer length up so few shapes cover all songs."""
    base = max(l_buf, 2 * chunk)
    # next power of two — at most ~5 distinct buckets for real-world songs
    return 1 << (base - 1).bit_length()


@functools.lru_cache(maxsize=32)
def _shard_mapped(model_apply: ModelApply, mesh) -> ModelApply:
    """Wrap the model in shard_map over the mesh's data axis.

    Explicitly-local execution (not GSPMD constraints) is required here:
    the fused Pallas kernels are opaque custom calls the SPMD partitioner
    cannot split, but under shard_map each shard runs them on its local
    chunk slice. Params are replicated; the chunk batch shards on dim 0.
    Cached so repeated demix() calls reuse one wrapper (the demix jit is
    keyed on the model_apply object).
    """
    P = jax.sharding.PartitionSpec
    try:
        from jax import shard_map

        return shard_map(model_apply, mesh=mesh,
                         in_specs=(P(), P("data")), out_specs=P("data"))
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(model_apply, mesh=mesh,
                         in_specs=(P(), P("data")), out_specs=P("data"),
                         check_rep=False)


_FETCH_POOL = None


def _fetch_pool() -> concurrent.futures.ThreadPoolExecutor:
    """Shared background pool for device->host slab transfers.

    The relay link is single-stream saturated (~35-50 MB/s; extra
    concurrent streams measured no faster, tools/profile_fetch.py) but a
    transfer DOES overlap queued compute (~1 s of a 42 MB fetch hides
    behind a busy queue). Two workers: one transfers while the other
    blocks on the next slab's buffer becoming ready.
    """
    global _FETCH_POOL
    if _FETCH_POOL is None:
        _FETCH_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="sesa-fetch")
    return _FETCH_POOL


def _fetch_slab(slab: jax.Array, scale):
    """Blocking device->host fetch of one finalized slab (runs on the
    fetch pool). The scale rides the same task: it comes from the same
    program as the quantized slab, so it is ready when the slab is, and
    fetching it here never dispatches a new device op (a host-side
    ``jnp.stack`` of scales at collect() time queues BEHIND every other
    dispatched program — that sync was the bug that serialized the whole
    transfer after all compute)."""
    arr = np.asarray(slab)
    return arr, None if scale is None else float(np.asarray(scale))


@jax.jit
def _int16_to_f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32) * (1.0 / 32768.0)


@functools.partial(jax.jit, static_argnames=("needed",))
def _crop_quant16(slab: jax.Array, needed: int):
    """Crop a finalized slab to its real span and quantize it to int16.

    Device->host transfer is the single largest non-compute demix cost on
    the ~50 MB/s relay link (a 60 s 4-stem separation fetches 85 MB of
    float32). Scaled-int16 transport halves the bytes; the quantization
    noise floor sits ~90 dB below the slab peak — far beneath the ~48 dB
    noise of the bf16 model compute that produced the samples — so for
    bf16 sessions the transport is effectively lossless. One tiny program
    per (slab shape, crop span), persistently cached like the crop slice.
    """
    s = slab[..., :needed] if needed < slab.shape[-1] else slab
    m = jnp.maximum(jnp.max(jnp.abs(s)), 1e-12)
    q = jnp.clip(jnp.round(s * (32767.0 / m)), -32767.0, 32767.0)
    return q.astype(jnp.int16), m


@jax.jit
def _apply_affine(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return (x - mean) / std


def _upload_mix(mix: np.ndarray) -> jax.Array:
    """Host->device transfer of the mix, halved when lossless.

    Audio decoded from 16-bit PCM is exactly ``n / 32768`` — for such
    signals an int16 transfer plus an on-device rescale reproduces the
    float32 array bit-for-bit at half the bytes. The relay link runs at
    ~50 MB/s, so this saves ~0.2 s on a 60 s stereo song. Anything not
    exactly representable (float sources, 24-bit, processed audio) falls
    back to the plain float32 upload.
    """
    scaled = mix * 32768.0
    if np.all(np.abs(scaled) <= 32767):
        as_int = scaled.astype(np.int16)
        if np.array_equal(as_int.astype(np.float32), scaled):
            return _int16_to_f32(jnp.asarray(as_int))
    return jnp.asarray(mix)


def _plan(spec: DemixSpec, length: int) -> tuple[int, int]:
    n_chunks = max(1, -(-length // spec.step))
    n_batches = -(-n_chunks // spec.batch_size)
    return n_chunks, n_batches


def demix(
    model_apply: ModelApply,
    params,
    mix: np.ndarray,
    spec: DemixSpec,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_cb: Optional[Callable[[float], None]] = None,
    seg_batches: int = _SEG_BATCHES,
    affine: Optional[tuple] = None,
    transport: str = "f32",
) -> np.ndarray:
    """Separate ``mix`` (channels, T) into ``(num_stems, channels, T)`` stems.

    ``model_apply(params, chunks[B, ch, C]) -> [B, S, ch, C]`` must be a pure
    jax function (it is traced under jit, once per DemixSpec).

    ``affine=(mean, std)`` normalizes the mix ON DEVICE as (x - mean)/std
    after upload — callers with normalize-enabled configs pass the raw
    audio (which stays int16-exact for the halved-bytes transfer) plus its
    host-computed stats, instead of uploading pre-normalized float32.

    ``transport="int16"`` fetches output slabs as scaled int16 (half the
    bytes of the default exact-float32 transport; ~90 dB SNR). Sessions
    running bf16 compute enable it — the transport floor is far below the
    compute noise (see _crop_quant16). ``transport="device"`` skips the
    host transfer entirely: the job is meant for
    :meth:`DemixJob.collect_device`, which assembles the stems in HBM for
    a downstream device consumer (ensemble / phase fix / another model).
    """
    return demix_start(
        model_apply, params, mix, spec, mesh=mesh, progress_cb=progress_cb,
        seg_batches=seg_batches, affine=affine, transport=transport,
    ).collect()


class DemixJob:
    """A dispatched separation whose output has not been assembled yet.

    ``demix_start`` returns immediately after queuing every segment's
    compute and (for the last slabs) their device-side crop/quantize.
    For host transports it also SUBMITS each slab's device->host fetch to
    a background thread the moment the slab is dispatched — the relay
    transfers finished buffers while queued programs still compute
    (measured ~1 s of a 42 MB fetch hiding behind a busy queue,
    tools/profile_fetch.py), so by :meth:`collect` time most bytes have
    already crossed. Starting a SECOND model's job before collecting the
    first additionally hides the first job's tail transfer behind the
    second's compute — the auto-ensemble orchestration and the
    multi-model bench configs overlap whole models this way.
    """

    def __init__(self, spec, slabs, futures, slab_len, lo, hi):
        self._spec = spec
        self._slabs = slabs
        self._futures = futures
        self._slab_len = slab_len
        self._lo = lo
        self._hi = hi

    def collect_device(self, stems=None) -> jax.Array:
        """Assemble the separation ON DEVICE — no host fetch at all.

        Returns a float32 device array ``(S, ch, T)`` (or ``(len(stems),
        ch, T)`` when ``stems`` selects a subset) that downstream device
        consumers — device ensemble (:func:`postprocess.ensemble.
        ensemble_waveforms_device`), :func:`postprocess.phase_fixer.
        phase_fix_arrays`, another :func:`demix` — use directly. Chains
        like auto-ensemble (two separations -> avg_wave -> phase fix ->
        Apollo restore) keep every intermediate in HBM this way: the only
        relay transfers of the whole chain are the one mix upload and the
        final result fetch (the reference round-trips every stage through
        host RAM, processing.py:798-1188). Jobs started with
        ``transport="device"`` skip the int16 quantize + host prefetch so
        the assembled stems are the exact float32 engine output; jobs on
        other transports are dequantized/assembled from whatever slabs
        they hold — but their dispatch already queued host prefetches, so
        a job MEANT for collect_device should always be started with
        ``transport="device"`` to keep those bytes off the relay link.
        """
        lo, hi = self._lo, self._hi
        parts = []
        for si, (slab, scale) in enumerate(self._slabs):
            if slab is None:  # border-only slab skipped at dispatch
                continue
            s0 = si * self._slab_len
            s1 = s0 + slab.shape[-1]
            c0, c1 = max(s0, lo), min(s1, hi)
            if c0 >= c1:
                continue
            part = slab[..., c0 - s0 : c1 - s0]
            if stems is not None:
                part = part[jnp.asarray(stems, dtype=jnp.int32)]
            if scale is not None:
                part = part.astype(jnp.float32) * (scale / 32767.0)
            elif part.dtype != jnp.float32:
                part = part.astype(jnp.float32)
            parts.append(part)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

    def collect(self) -> np.ndarray:
        spec, slab_len, lo, hi = self._spec, self._slab_len, self._lo, self._hi
        est = np.empty((spec.num_stems, spec.num_channels, hi - lo),
                       dtype=np.float32)
        for si, ((slab, scale), fut) in enumerate(
                zip(self._slabs, self._futures)):
            if slab is None:  # border-only slab skipped at dispatch
                continue
            s0 = si * slab_len
            s1 = s0 + slab.shape[-1]
            c0, c1 = max(s0, lo), min(s1, hi)
            if c0 >= c1:
                continue
            if fut is not None:  # host transports: prefetched in background
                arr, scale_f = fut.result()
            else:  # a "device" job collected on host anyway (scale is None
                # there — quantization is skipped for device transport)
                arr = np.asarray(slab)
                scale_f = None if scale is None else float(np.asarray(scale))
            part = arr[..., c0 - s0 : c1 - s0]
            if scale_f is not None:
                part = part.astype(np.float32) * (scale_f / 32767.0)
            est[..., c0 - lo : c1 - lo] = part
        return est


def demix_start(
    model_apply: ModelApply,
    params,
    mix,
    spec: DemixSpec,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_cb: Optional[Callable[[float], None]] = None,
    seg_batches: int = _SEG_BATCHES,
    affine: Optional[tuple] = None,
    transport: str = "f32",
) -> DemixJob:
    """Dispatch a separation and return a :class:`DemixJob` (see demix).

    ``mix`` may be a host array or a DEVICE array previously returned by
    :func:`upload_mix` — multi-model flows over the same song upload it
    once instead of paying the host->device transfer per model.
    """
    on_device = isinstance(mix, jax.Array)
    if not on_device:
        mix = np.asarray(mix, dtype=np.float32)
    assert mix.ndim == 2, f"mix must be (channels, T), got {mix.shape}"
    length_init = mix.shape[-1]
    border = spec.border

    padded = not spec.demucs_mode and border > 0 and length_init > 2 * border
    length = length_init + (2 * border if padded else 0)
    n_chunks, n_batches = _plan(spec, length)
    n_segments = -(-n_batches // seg_batches)
    slab_len = seg_batches * spec.batch_size * spec.step
    # buffer must cover the furthest chunk slot of the last REAL batch
    # (the while_loop never runs padded segment iterations) AND the last
    # segment's full finalized slab
    l_buf = _bucket_length(
        max((n_batches * spec.batch_size - 1) * spec.step + spec.chunk_size,
            n_segments * slab_len),
        spec.chunk_size,
    )

    # upload only the raw mix; border reflect pad and buffer zero pad happen
    # on device (the relay link is ~50 MB/s — padding host-side costs real
    # seconds of upload on long songs)
    mix_dev = mix if on_device else _upload_mix(mix)
    if affine is not None:
        mix_dev = _apply_affine(mix_dev, jnp.float32(affine[0]),
                                jnp.float32(affine[1]))
    if padded:
        mix_dev = jnp.pad(mix_dev, ((0, 0), (border, border)), mode="reflect")
    mix_buf = jnp.pad(mix_dev, ((0, 0), (0, l_buf - length)))
    result = jnp.zeros((spec.num_stems, spec.num_channels, l_buf), dtype=jnp.float32)
    counter = jnp.zeros((l_buf,), dtype=jnp.float32)
    windows = _windows_device(spec)
    length_a = jnp.asarray(length, dtype=jnp.int32)
    n_chunks_a = jnp.asarray(n_chunks, dtype=jnp.int32)

    batch_sharding = None
    if mesh is not None:
        data_size = mesh.shape.get("data", 1)
        if spec.batch_size % data_size:
            raise ValueError(
                f"batch_size {spec.batch_size} must be divisible by the "
                f"mesh data axis ({data_size}) for sharded demix")
        model_apply = _shard_mapped(model_apply, mesh)
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None, None)
        )

    # Slab-streaming pipeline: dispatch segment si+1 before materializing
    # segment si's finalized slab on the host, and hand each finished
    # slab's device->host transfer to a background thread immediately, so
    # the transfers overlap the next segment's (and any later-dispatched
    # job's) compute (verified to overlap on the TPU relay link; see
    # tools/profile_fetch.py).
    slabs = []
    futures = []
    for si in range(n_segments):
        result, counter, slab = _demix_segment(
            model_apply,
            spec,
            seg_batches,
            params,
            mix_buf,
            result,
            counter,
            windows,
            length_a,
            n_chunks_a,
            jnp.asarray(si * seg_batches * spec.batch_size, dtype=jnp.int32),
            batch_sharding,
        )
        # Fetch no more than the song actually needs: the LAST segment's
        # slab spans its full seg_batches*batch_size*step slots even when
        # most are masked padding (at the default seg_batches a short song
        # is ONE segment whose nominal slab can be several times the song
        # — fetching it whole costs seconds of relay bandwidth). The
        # eager device-side crop below means only real samples transfer;
        # its tiny slice program varies with song length, like the final
        # crop did before slab streaming.
        hi_bound = (length - border) if padded else length_init
        lo_bound = border if padded else 0
        s0 = si * slab_len
        needed = min(slab_len, int(hi_bound) - s0)
        if needed > 0 and s0 + needed > lo_bound:
            if transport == "int16":
                slab, scale = _crop_quant16(slab, needed)
            else:
                scale = None
                if needed < slab_len:
                    slab = slab[..., :needed]
            slabs.append((slab, scale))
            # "device" jobs are consumed by collect_device — their slabs
            # never cross to the host, so prefetching would waste the
            # relay link the chain is trying to spare
            futures.append(None if transport == "device" else
                           _fetch_pool().submit(_fetch_slab, slab, scale))
        else:
            # a slab fully inside the reflect border (trailing when
            # needed <= 0, LEADING at high overlap where border =
            # (num_overlap-1)*step can exceed slab_len) carries no real
            # samples: skip its fetch entirely (those bytes would cross
            # the scarce relay link only to be dropped in collect) but
            # keep a placeholder so slab index si stays positional
            slabs.append((None, None))
            futures.append(None)
        if progress_cb is not None:
            progress_cb((si + 1) / n_segments)

    lo = border if padded else 0
    hi = (length - border) if padded else length_init
    return DemixJob(spec, slabs, futures, slab_len, lo, hi)


def upload_mix(mix: np.ndarray) -> jax.Array:
    """Upload a (channels, T) mix once for reuse across demix calls.

    The returned device array can be passed as ``mix`` to demix /
    demix_start; multi-model flows (auto-ensemble, model chains) skip the
    per-model host->device transfer this way. Uses the same lossless
    halved-bytes int16 path as the internal upload.
    """
    mix = np.asarray(mix, dtype=np.float32)
    assert mix.ndim == 2, f"mix must be (channels, T), got {mix.shape}"
    return _upload_mix(mix)


def apply_tta(
    model_apply: ModelApply,
    params,
    mix: np.ndarray,
    stems: np.ndarray,
    spec: DemixSpec,
    **demix_kwargs,
) -> np.ndarray:
    """Test-time augmentation: channel swap + polarity inversion, averaged.

    Matches reference utils.py:241-292 ``apply_tta``: the channel-swapped
    result is swapped back and added, the polarity-inverted result is
    subtracted, and the total is divided by 3.

    When ``mix`` is already a device array (shared upload), the channel
    swap and negation run as trivial device ops instead of re-uploading
    the full song twice over the relay.
    """
    if isinstance(mix, jax.Array):
        swapped_mix = jnp.flip(mix, axis=0)
        negated_mix = -mix
    else:
        swapped_mix = mix[::-1].copy()
        negated_mix = -mix
    swapped = demix(model_apply, params, swapped_mix, spec, **demix_kwargs)
    stems = stems + swapped[:, ::-1]
    inv_kwargs = dict(demix_kwargs)
    if inv_kwargs.get("affine") is not None:
        # -((x - m)/s) == ((-x) - (-m))/s: negate the raw mix, flip the mean
        m, s = inv_kwargs["affine"]
        inv_kwargs["affine"] = (-m, s)
    inverted = demix(model_apply, params, negated_mix, spec, **inv_kwargs)
    stems = stems - inverted
    return stems / 3.0
