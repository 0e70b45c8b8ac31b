"""Attention primitives for the roformer family.

Math matches the reference's Attend module (reference
models/bs_roformer/attend.py:97-126): softmax(q·kᵀ·scale)·v with
scale = dim_head**-0.5 unless overridden. Flash/SDPA/einsum backends in
the reference are numerically identical at inference (dropout 0), so one
implementation serves: a batched einsum pair that XLA fuses and tiles onto
the MXU. Softmax runs in float32 regardless of compute dtype.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    precision=_HIGHEST,
) -> jax.Array:
    """Scaled dot-product attention over (..., heads, seq, dim_head).

    Long-enough sequences on TPU route to the fused Pallas VMEM kernel
    (identical f32-softmax numerics); everything else uses the einsum pair.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    seq, dim_head = q.shape[-2], q.shape[-1]
    if (q.shape == k.shape == v.shape) and _use_pallas(seq, dim_head, q.dtype):
        lead = q.shape[:-2]
        out = _vmem_attention(
            q.reshape((-1, seq, dim_head)),
            k.reshape((-1, seq, dim_head)),
            v.reshape((-1, seq, dim_head)),
            scale,
            group=_vmem_group(seq, dim_head),
        )
        return out.reshape(lead + (seq, dim_head))

    sim = jnp.einsum("...id,...jd->...ij", q, k, precision=precision) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v, precision=precision)


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics (norm clamped at eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def sdpa_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """INT8-quantized attention — the TPU analog of the reference's
    optional SageAttention path (reference bs_roformer/attend_sage.py:
    int8 QK^T with K smoothing, high-precision softmax and PV).

    Per-token symmetric quantization: each query/key row gets its own
    scale, so the int8 QK^T dequantizes exactly per (i, j) pair. K is
    mean-centered first ("smoothing") — the removed component contributes
    q·k_mean equally to every logit in a row, which softmax cancels, so
    no correction term is needed. The logit matmul runs on the MXU's
    int8 path (int32 accumulation); softmax stays f32 and PV stays in
    the input dtype. Opt-in (SESA_INT8_ATTN=1): quantization error is
    larger than bf16 — acceptable for preview-grade separation, not for
    mastering.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    def quant(x):
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return x8, s

    km = k.mean(axis=-2, keepdims=True)
    q8, qs = quant(q)
    k8, ks = quant(k - km)

    sim = jax.lax.dot_general(
        q8, k8,
        ((( q8.ndim - 1,), (k8.ndim - 1,)),
         (tuple(range(q8.ndim - 2)), tuple(range(k8.ndim - 2)))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    sim = sim * (qs * jnp.swapaxes(ks, -1, -2)) * scale
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v)


# ---------------------------------------------------------------------------
# Pallas whole-sequence VMEM attention
# ---------------------------------------------------------------------------
#
# The roformer workload is many (batch·head) pairs with SHORT sequences
# (~700 frames, 64-dim heads): one head's entire Q/K/V (265 KB bf16) plus
# its f32 score matrix (1.9 MB) fit comfortably in VMEM. So instead of
# flash-attention tiling, each Pallas program computes one head's full
# attention on-chip — the score matrix never touches HBM, which is what
# makes the unfused einsum path memory-bound (it writes + reads ~2 GB of
# logits per layer at these shapes).

def _vmem_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, group):
    col = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[1], q_ref.shape[1]), 1
    )
    key_mask = col < seq_len
    for g in range(group):  # static unroll: heads within one program
        q = q_ref[g]  # (S, D)
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(key_mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)


def _vmem_attention(q, k, v, scale, group=8):
    """(BH, S, D) full-sequence attention, ``group`` heads per program
    (amortizes per-program overhead across the many short-seq heads)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, s, d = q.shape
    pad = (-s) % 128
    bh_pad = (-bh) % group
    padding = ((0, bh_pad), (0, pad), (0, 0))
    if pad or bh_pad:
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    sp = s + pad
    bhp = bh + bh_pad

    spec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_vmem_attn_kernel, scale=scale, seq_len=s, group=group),
        grid=(bhp // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bhp, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * sp * sp * d * bhp,
            bytes_accessed=4 * bhp * sp * d * q.dtype.itemsize,
            transcendentals=bhp * sp * sp,
        ),
    )(q, k, v)
    return out[:bh, :s]


# sequences at least this long route to the Pallas kernel on TPU; the
# (1.9 MB per 700-seq) f32 score tile must also still fit in VMEM
_PALLAS_MIN_SEQ = 256
_PALLAS_MAX_SEQ = 2048
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scope


def _gb_for(sp: int, cap: Optional[int] = None) -> int:
    """Sequences per fused-kernel program: target a slab of
    ``SESA_FUSED_SLAB`` (default 1024) GEMM rows.

    The cap bounds the kernels' static per-sequence unroll (attention
    temporaries scale with it). Overridable for A/B sweeps via
    ``SESA_FUSED_GB_CAP`` / ``SESA_FUSED_SLAB`` (tools/sweep_gb_cap.py,
    tools/ab_perf_knobs.py)."""
    if cap is None:
        cap = int(os.environ.get("SESA_FUSED_GB_CAP", "4"))
    slab = int(os.environ.get("SESA_FUSED_SLAB", "1024"))
    return min(cap, max(1, slab // sp))


def _vmem_group(seq: int, dim_head: int) -> int:
    """Heads per program such that the kernel's blocks + one f32 score
    tile fit the VMEM budget; 0 if even a single head does not fit."""
    sp = seq + ((-seq) % 128)
    score = sp * sp * 4
    for g in (8, 4, 2, 1):
        if 4 * g * sp * dim_head * 2 + score <= _VMEM_BUDGET:
            return g
    return 0


def _use_pallas(seq: int, dim_head: int, dtype=None) -> bool:
    if not (_PALLAS_MIN_SEQ <= seq <= _PALLAS_MAX_SEQ) or dim_head > 128:
        return False
    if _vmem_group(seq, dim_head) == 0:
        # long-chunk shapes whose whole-sequence tiles exceed scoped VMEM
        # fall back to the einsum path instead of failing Mosaic compile
        return False
    if dtype is not None and dtype != jnp.bfloat16:
        # f32 (parity / bf16-rescue mode) doubles the kernel's VMEM
        # footprint past the 16 MB scoped limit at production shapes —
        # keep it on the einsum path
        return False
    if os.environ.get("SESA_NO_FUSED"):  # kill switch covers ALL kernels
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fused rope + attention over packed qkv
# ---------------------------------------------------------------------------
#
# The roformer hot path spends more time on data movement around attention
# than in it: the (b, n, 3·h·dh) -> (3, b, h, n, dh) transpose, two rope
# passes, and the output head re-pack each stream ~2 GB through HBM per
# layer at production shapes. This kernel keeps the projection GEMM's
# natural packed layout end-to-end: each program loads a slab of sequences,
# slices q/k/v per head from the packed columns in VMEM, rotates q/k with
# the interleaved-rope ±1 matrix on the MXU, runs f32-softmax attention,
# and writes the (b, n, h·dh) output the out-projection wants. Nothing but
# the qkv tensor and the output ever touches HBM.

def _fused_attn_kernel(qkv_ref, cos_ref, sin_ref, j_ref, o_ref, *,
                       scale, seq_len, heads, dh, gb, use_rope):
    sp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    key_mask = col < seq_len
    if use_rope:
        cos = cos_ref[...]  # (sp, dh)
        sin = sin_ref[...]
        jm = j_ref[...]     # (dh, dh) rotate-half matrix (zero outside the
        #                     rotary slice; cos/sin are 1/0 there)

    def one_seq(bi, _):
        # dynamic leading-dim index + fori_loop keep VMEM stack usage at
        # one sequence's temporaries (a static gb-unroll OOMs scoped vmem)
        for h in range(heads):
            q = qkv_ref[bi, :, h * dh:(h + 1) * dh]
            k = qkv_ref[bi, :, (heads + h) * dh:(heads + h + 1) * dh]
            v = qkv_ref[bi, :, (2 * heads + h) * dh:(2 * heads + h + 1) * dh]
            if use_rope:
                # Mosaic requires a 32-bit matmul accumulator; the ±1
                # rotate-half product stays exact either way
                q = q * cos + jax.lax.dot(
                    q, jm, preferred_element_type=jnp.float32
                ).astype(q.dtype) * sin
                k = k * cos + jax.lax.dot(
                    k, jm, preferred_element_type=jnp.float32
                ).astype(k.dtype) * sin
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[bi, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)
        return 0

    if gb == 1:
        one_seq(0, None)
    else:
        jax.lax.fori_loop(0, gb, one_seq, 0)


def fused_rope_attention(qkv, heads, scale, rope=None, interpret=False,
                         gb_cap=None):
    """Packed-qkv attention: (b, n, 3·h·dh) -> (b, n, h·dh).

    ``rope`` is the interleaved-convention (cos, sin) table pair of shape
    (n, w) with w <= dh (partial rotary rotates only the leading w dims,
    matching rotary_embedding_torch). Numerics are identical to the
    unfused path: rope via the exact ±1 matrix, f32 softmax.

    Not on the production dispatch path (models use the fully-fused
    ``fused_attention_block``): retained, with its parity test, as the
    intermediate diagnostic between plain sdpa and the full block — when
    the fused block misbehaves on new silicon, this isolates whether the
    fault is in rope+attention or in the norm/projection/gating fusion.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sesa_tpu.ops.rope import _rotate_half_matrix

    b, n, packed = qkv.shape
    dh = packed // (3 * heads)
    sp = n + (-n) % 64  # 64-row padding: a 128 pad doubles short-seq FLOPs
    # short sequences group several per program to amortize grid overhead
    gb = _gb_for(sp, gb_cap)
    bp = b + (-b) % gb
    if sp != n or bp != b:
        qkv = jnp.pad(qkv, ((0, bp - b), (0, sp - n), (0, 0)))

    use_rope = rope is not None
    if use_rope:
        cos, sin = rope
        w = cos.shape[-1]
        cos = jnp.pad(cos.astype(qkv.dtype), ((0, sp - n), (0, dh - w)),
                      constant_values=1)
        sin = jnp.pad(sin.astype(qkv.dtype), ((0, sp - n), (0, dh - w)))
        jm = jnp.pad(_rotate_half_matrix(w, qkv.dtype.name),
                     ((0, dh - w), (0, dh - w)))
    else:  # dummies keep one kernel signature; the kernel never reads them
        cos = sin = jnp.zeros((sp, dh), qkv.dtype)
        jm = jnp.zeros((dh, dh), qkv.dtype)

    tbl = pl.BlockSpec((sp, dh), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_attn_kernel, scale=scale, seq_len=n,
                          heads=heads, dh=dh, gb=gb, use_rope=use_rope),
        grid=(bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, sp, packed), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tbl, tbl,
            pl.BlockSpec((dh, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, sp, packed // 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, sp, packed // 3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * sp * sp * dh * bp * heads,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=bp * heads * sp * sp,
        ),
        interpret=interpret,
    )(qkv, cos, sin, jm)
    return out[:b, :n]


# ---------------------------------------------------------------------------
# Fully fused attention block: norm + qkv + rope + attention + gates + out
# ---------------------------------------------------------------------------
#
# One step further than fused_rope_attention: the projection GEMMs move into
# the kernel too. Per program the residual stream tile is read once, RMS-
# normed in f32, projected against the VMEM-resident qkv/gates/out weights,
# attended per head with rope applied in registers, gated, projected back,
# and written with the residual already added. The (tokens, 3·h·dh) qkv
# tensor and the (tokens, dim) normed activation never exist in HBM at all
# (~4 GB of traffic per layer at production shapes).

def _attn_block_kernel(*refs, scale, seq_len, heads, dh, gb, use_rope,
                       vr_mode=0, add_residual=True):
    from jax.experimental import pallas as pl

    # vr_mode 0: standard block. 1: also emit the pre-mix V (first layer of
    # a value-residual transformer). 2: additionally lerp V toward a given
    # first-layer V with a learned per-head sigmoid mix (reference
    # bs_roformer_experimental.py:111-135).
    (x_ref, gamma_ref, wqkv_ref, wg_ref, bg_ref, wo_ref,
     cos_ref, sin_ref, j_ref, ge_ref) = refs[:10]
    rest = refs[10:]
    if vr_mode == 2:
        wvr_ref, bvr_ref, vres_ref = rest[:3]
        rest = rest[3:]
    if vr_mode:
        o_ref, vout_ref, qkv_scr, ao_scr = rest
    else:
        o_ref, qkv_scr, ao_scr = rest

    sp, d = x_ref.shape[1], x_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    key_mask = col < seq_len
    if use_rope:
        cos = cos_ref[...]
        sin = sin_ref[...]
        jm = j_ref[...]

    # norm + qkv + gates batched over the whole (gb·sp) slab: one large GEMM
    # instead of gb small ones (the short-seq path was GEMM-bound, not
    # attention-bound)
    x_all = x_ref[...].reshape(gb * sp, d)
    xf = x_all.astype(jnp.float32)
    nrm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xn = ((xf * (d ** 0.5) / jnp.maximum(nrm, 1e-12))
          .astype(x_all.dtype) * gamma_ref[...])
    qkv_scr[...] = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_all.dtype)
    gates = jax.lax.dot_general(
        xn, wg_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bg_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(gates)  # (gb·sp, heads) f32

    hd = heads * dh
    if vr_mode:
        # emit the pre-mix V for downstream layers
        vout_ref[...] = qkv_scr[:, 2 * hd:3 * hd].reshape(gb, sp, hd)
    if vr_mode == 2:
        mix = jax.lax.dot_general(
            xn, wvr_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bvr_ref[...].astype(jnp.float32)
        mix = jax.nn.sigmoid(mix)  # (gs, heads)
        mix_exp = jax.lax.dot(mix, ge_ref[...].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        v_all = qkv_scr[:, 2 * hd:3 * hd].astype(jnp.float32)
        vres = vres_ref[...].reshape(gb * sp, hd).astype(jnp.float32)
        qkv_scr[:, 2 * hd:3 * hd] = (
            v_all + (vres - v_all) * mix_exp).astype(x_all.dtype)

    def one_seq(bi, _):
        for h in range(heads):
            q = qkv_scr[pl.dslice(bi * sp, sp), h * dh:(h + 1) * dh]
            k = qkv_scr[pl.dslice(bi * sp, sp),
                        (heads + h) * dh:(heads + h + 1) * dh]
            v = qkv_scr[pl.dslice(bi * sp, sp),
                        (2 * heads + h) * dh:(2 * heads + h + 1) * dh]
            if use_rope:
                q = q * cos + jax.lax.dot(
                    q, jm, preferred_element_type=jnp.float32).astype(q.dtype) * sin
                k = k * cos + jax.lax.dot(
                    k, jm, preferred_element_type=jnp.float32).astype(k.dtype) * sin
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            ao_scr[pl.dslice(bi * sp, sp),
                   h * dh:(h + 1) * dh] = o.astype(ao_scr.dtype)
        return 0

    # static unroll (gb <= 4 by construction): Mosaic pipelines the small
    # per-sequence dots far better than a fori_loop, and the bound keeps
    # unrolled temporaries within scoped vmem
    for bi in range(gb):
        one_seq(bi, None)

    # per-head gating via the block-ones expansion matmul (Mosaic supports
    # neither 3D reshapes nor dynamic_slice on values in this kernel type);
    # sig @ E copies each head's gate across its dh output columns exactly
    expand = jax.lax.dot(sig, ge_ref[...].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    ao = ao_scr[...] * expand.astype(ao_scr.dtype)
    out = jax.lax.dot_general(
        ao, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out.astype(o_ref.dtype)
    if add_residual:
        out = out + x_all
    o_ref[...] = out.reshape(gb, sp, d)


def fused_attention_block(x, gamma, wqkv, wg, bg, wo, heads, scale,
                          rope=None, interpret=False, vr=None,
                          add_residual=True, gb_cap=None):
    """x (b, n, d) -> x + gated-attention(rms_norm(x)) in one kernel.

    Weights keep their torch (out_features, in_features) layouts:
    wqkv (3·h·dh, d), wg (heads, d), wo (d, h·dh); bg (heads,).

    ``vr`` enables value-residual learning (reference
    bs_roformer_experimental.py:111-135): pass ``(wvr, bvr, v_first)``
    where wvr (heads, d) / bvr (heads,) are the mix projection and
    v_first the first layer's V in (b, n, h·dh) layout (or None on the
    first layer). Returns (out, v_pre_mix) instead of out, and
    ``add_residual=False`` matches the new-style forward where hyper
    connections own the residual stream.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sesa_tpu.ops.rope import _rotate_half_matrix

    b, n, d = x.shape
    dh = wqkv.shape[0] // (3 * heads)
    # pad to 64, not 128: at seq 62 a 128-pad would double every projection
    # and attention FLOP; Mosaic masks sub-128 lane tails itself
    # pad to 64, not 128: at seq 62 a 128-pad would double every projection
    # and attention FLOP; Mosaic masks sub-128 lane tails itself
    sp = n + (-n) % 64
    gb = _gb_for(sp, gb_cap)
    bp = b + (-b) % gb
    if sp != n or bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, sp - n), (0, 0)))

    use_rope = rope is not None
    if use_rope:
        cos, sin = rope
        w = cos.shape[-1]
        cos = jnp.pad(cos.astype(x.dtype), ((0, sp - n), (0, dh - w)),
                      constant_values=1)
        sin = jnp.pad(sin.astype(x.dtype), ((0, sp - n), (0, dh - w)))
        jm = jnp.pad(_rotate_half_matrix(w, x.dtype.name),
                     ((0, dh - w), (0, dh - w)))
    else:
        cos = sin = jnp.zeros((sp, dh), x.dtype)
        jm = jnp.zeros((dh, dh), x.dtype)

    # gate-expansion matrix: E[h, h*dh:(h+1)*dh] = 1
    ge = jnp.asarray(np.repeat(np.eye(heads, dtype=np.float32), dh, axis=1),
                     dtype=x.dtype)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    stream = pl.BlockSpec((gb, sp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    hd = heads * dh
    vstream = pl.BlockSpec((gb, sp, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    inputs = [x, gamma, wqkv, wg, bg, wo, cos, sin, jm, ge]
    in_specs = [stream, const((d,)), const(wqkv.shape), const(wg.shape),
                const(bg.shape), const(wo.shape), const((sp, dh)),
                const((sp, dh)), const((dh, dh)), const((heads, hd))]
    vr_mode = 0
    if vr is not None:
        wvr, bvr, v_first = vr
        if v_first is None:
            vr_mode = 1
        else:
            vr_mode = 2
            if v_first.shape[0] != bp or v_first.shape[1] != sp:
                v_first = jnp.pad(v_first, ((0, bp - v_first.shape[0]),
                                            (0, sp - v_first.shape[1]),
                                            (0, 0)))
            inputs += [wvr, bvr, v_first]
            in_specs += [const(wvr.shape), const(bvr.shape), vstream]
    out_specs = stream if not vr_mode else (stream, vstream)
    out_shape = (jax.ShapeDtypeStruct((bp, sp, d), x.dtype) if not vr_mode
                 else (jax.ShapeDtypeStruct((bp, sp, d), x.dtype),
                       jax.ShapeDtypeStruct((bp, sp, hd), x.dtype)))

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, scale=scale, seq_len=n,
                          heads=heads, dh=dh, gb=gb, use_rope=use_rope,
                          vr_mode=vr_mode, add_residual=add_residual),
        grid=(bp // gb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((gb * sp, wqkv.shape[0]), x.dtype),
                        pltpu.VMEM((gb * sp, hd), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * sp * (d * 4 * heads * dh + 2 * sp * heads * dh),
            bytes_accessed=2 * bp * sp * d * x.dtype.itemsize,
            transcendentals=bp * heads * sp * sp,
        ),
        interpret=interpret,
    )(*inputs)
    if vr_mode:
        o, v_pre = out
        return o[:b, :n], v_pre[:b, :n]
    return out[:b, :n]


# ---------------------------------------------------------------------------
# Fused conformer attention block: LayerNorm + qkv + Shaw rel-pos bias +
# attention + out projection + residual
# ---------------------------------------------------------------------------
#
# The lucidrains-conformer attention (reference models/mel_band_conformer.py
# :192-195 via the `conformer` package) adds a Shaw relative-position bias
# pos[i,j] = q[i]·E[clip(j-i,-P,P)+P] to the logits. Materialized naively
# that is an (n, n, dh) gather plus n tiny batched GEMMs per layer — the
# recorded bottleneck of the scnet_melconf config (VERDICT r2 item 2).
# Here the bias never exists outside VMEM: per head the kernel computes
# qE = q @ E_expᵀ against a pre-clipped expanded table (one MXU matmul),
# then realizes the skew qE[i, j-i+c] with a SINGLE per-sublane strided
# lane rotation (pltpu.roll(stride=1): out[i,j] = in[i, j-shift-i mod W],
# so shift = W-c lands exactly on j-i+c). No gather, no HBM logits.

def _conformer_attn_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, eexp_ref,
                           wo_ref, bo_ref, o_ref, qkv_scr, ao_scr, *,
                           scale, seq_len, heads, dh, gb, variant="full"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sp, d = x_ref.shape[1], x_ref.shape[2]
    w = eexp_ref.shape[0]  # roll width (2·sp)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    key_mask = col < seq_len

    x_all = x_ref[...].reshape(gb * sp, d)
    xf = x_all.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + 1e-5)).astype(x_all.dtype)
    xn = xn * lnw_ref[...] + lnb_ref[...]
    qkv_scr[...] = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_all.dtype)

    def one_seq(bi):
        for h in range(heads):
            q = qkv_scr[pl.dslice(bi * sp, sp), h * dh:(h + 1) * dh]
            k = qkv_scr[pl.dslice(bi * sp, sp),
                        (heads + h) * dh:(heads + h + 1) * dh]
            v = qkv_scr[pl.dslice(bi * sp, sp),
                        (2 * heads + h) * dh:(2 * heads + h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if variant != "no_bias":  # profiling variants (tools/ab_*)
                qe = jax.lax.dot_general(
                    q, eexp_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (sp, W)
                if variant == "no_roll":
                    bias = qe[:, :sp]
                else:
                    bias = pltpu.roll(qe, (w - (sp - 1)) % w, 1,
                                      stride=1, stride_axis=0)[:, :sp]
                s = s + bias
            s = s * scale
            s = jnp.where(key_mask, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            ao_scr[pl.dslice(bi * sp, sp),
                   h * dh:(h + 1) * dh] = o.astype(ao_scr.dtype)

    for bi in range(gb):  # static unroll (gb kept small)
        one_seq(bi)

    out = jax.lax.dot_general(
        ao_scr[...], wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...].astype(jnp.float32)
    o_ref[...] = (out.astype(o_ref.dtype) + x_all).reshape(gb, sp, d)


def fused_conformer_attention(x, ln_w, ln_b, wqkv, rel_pos_emb, wo, bo,
                              heads, scale=None, interpret=False,
                              variant="full", gb_cap=None):
    """x (b, n, d) -> x + conformer-attention(layer_norm(x)) in one kernel.

    Weights keep torch layouts: wqkv (3·h·dh, d) = [to_q; to_kv] rows,
    wo (d, h·dh), bo (d,). ``rel_pos_emb`` is the Shaw table
    (2·max_pos_emb+1, dh) shared across heads (lucidrains conformer).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = x.shape
    dh = wqkv.shape[0] // (3 * heads)
    if scale is None:
        scale = dh ** -0.5
    sp = n + (-n) % 64
    gb = _gb_for(sp, gb_cap)
    bp = b + (-b) % gb
    if sp != n or bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, sp - n), (0, 0)))

    # pre-clipped expanded table: the kernel's per-row roll reads row
    # r = (j-i)+(sp-1), and lucidrains' Shaw convention is dist = i-j, so
    # row r maps to table[clip((sp-1)-r)]; rows past 2·sp-2 never read
    w_roll = 2 * sp
    max_pos = (rel_pos_emb.shape[0] - 1) // 2
    rel_idx = np.clip((sp - 1) - np.arange(w_roll), -max_pos, max_pos) + max_pos
    e_exp = rel_pos_emb[jnp.asarray(rel_idx, jnp.int32)].astype(x.dtype)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    stream = pl.BlockSpec((gb, sp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    hd = heads * dh
    out = pl.pallas_call(
        functools.partial(_conformer_attn_kernel, scale=scale, seq_len=n,
                          heads=heads, dh=dh, gb=gb, variant=variant),
        grid=(bp // gb,),
        in_specs=[stream, const((d,)), const((d,)), const(wqkv.shape),
                  const((w_roll, dh)), const(wo.shape), const((d,))],
        out_specs=stream,
        out_shape=jax.ShapeDtypeStruct((bp, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((gb * sp, 3 * hd), x.dtype),
                        pltpu.VMEM((gb * sp, hd), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * sp * (d * 4 * hd + 3 * sp * hd),
            bytes_accessed=2 * bp * sp * d * x.dtype.itemsize,
            transcendentals=bp * heads * sp * sp,
        ),
        interpret=interpret,
    )(x, ln_w, ln_b, wqkv, e_exp, wo, bo)
    return out[:b, :n]


def _use_fused(seq: int, dim_head: int, heads: int, dim: int = 0,
               dtype=None) -> bool:
    if not (8 <= seq <= _PALLAS_MAX_SEQ) or dim_head > 128 or dim_head < 8:
        return False
    if heads * dim_head > 1024 or dim_head % 8:
        return False
    # VMEM estimate: resident weights (qkv + out projections, bf16) +
    # gb sequences of qkv/attn-out scratch (the kernel batches
    # gb = min(4, 1024//sp) sequences per program) + an f32 score tile;
    # shapes past the budget fall back instead of failing Mosaic compile
    sp = seq + ((-seq) % 64)  # kernel pads to 64 lanes
    gb = _gb_for(sp)
    d_attn = heads * dim_head
    d_model = dim or d_attn
    weights = (d_model * 3 * d_attn + d_attn * d_model) * 2
    scratch = gb * sp * (3 * d_attn + d_attn) * 2 + sp * sp * 4
    if weights + scratch > _VMEM_BUDGET:
        return False
    if dim % 64:  # keep model-dim lanes MXU-tileable; odd dims fall back
        return False
    if dtype is not None and dtype != jnp.bfloat16:
        # f32 parity mode keeps the unfused HIGHEST-precision path
        return False
    if os.environ.get("SESA_NO_FUSED"):  # debugging / A-B kill switch
        return False
    if os.environ.get("SESA_INT8_ATTN"):  # int8 attention runs unfused
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
