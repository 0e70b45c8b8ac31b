"""BS-RoFormer — band-split RoPE transformer (the flagship family).

Behavioral spec: reference models/bs_roformer/bs_roformer.py:327-622.
Forward: STFT → pack (freq·stereo·complex) features → per-band linear embed
(grouped GEMMs, see sesa_tpu.ops.bands) → depth × [optional linear-attention
stage over the flattened grid, time transformer over frames, freq
transformer over bands] with RoPE shared across depth → final RMSNorm →
per-stem MaskEstimator → complex mask × STFT → iSTFT.

The same machinery drives MelBandRoformer (overlapping mel bands,
scatter-add mask averaging) via a different band layout; see
sesa_tpu/models/mel_band_roformer.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sesa_tpu.models import hyper_connections as HC
from sesa_tpu.models import roformer_core as core
from sesa_tpu.models.layers import rms_norm
from sesa_tpu.ops import bands as B
from sesa_tpu.ops.rope import default_freqs, rope_tables
from sesa_tpu.ops.stft import hann_window, istft_ri, stft_ri

# depth-loop compilation strategy: 0 = fully unrolled program, N >= 1 =
# lax.scan over stacked per-depth params with N-way body unrolling. Scan
# collapses compile time (the body compiles once); unrolling the body a few
# times buys back most of the loop's runtime overhead.
_SCAN_UNROLL = int(os.environ.get("SESA_ROFORMER_SCAN_UNROLL", "2"))

DEFAULT_FREQS_PER_BANDS = (
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    12, 12, 12, 12, 12, 12, 12, 12,
    24, 24, 24, 24, 24, 24, 24, 24,
    48, 48, 48, 48, 48, 48, 48, 48,
    128, 129,
)


@dataclasses.dataclass(frozen=True)
class RoformerSpec:
    """Static architecture spec shared by the roformer family."""

    dim: int
    depth: int
    stereo: bool = False
    num_stems: int = 1
    time_transformer_depth: int = 2
    freq_transformer_depth: int = 2
    linear_transformer_depth: int = 0
    dim_head: int = 64
    heads: int = 8
    stft_n_fft: int = 2048
    stft_hop_length: int = 512
    stft_win_length: int = 2048
    stft_normalized: bool = False
    mask_estimator_depth: int = 2
    mlp_expansion_factor: int = 4
    skip_connection: bool = False
    # band layout: per-band feature index arrays (packed freq·stereo·complex)
    band_feats: Tuple[tuple, ...] = ()
    # mel only: pad iSTFT output back to the input length
    match_input_audio_length: bool = False
    # roformer_experimental extensions
    value_residual: bool = False
    num_residual_streams: int = 1
    # FNO variant (bs_roformer_fno by unwa, reference model.py:993-1004):
    # a Fourier-neural-operator stage per depth layer operating along the
    # time axis. The upstream model source is download-only (never executed
    # here); this follows the standard FNO1d formulation (Li et al.):
    # y = x + gelu(spectral_conv(x) + x @ W_bypass), spectral_conv keeping
    # the lowest `fno_modes` rDFT modes with full channel mixing. The
    # checkpoint converter fails loudly on any key-layout mismatch, so a
    # real upstream checkpoint can never silently mis-load.
    use_fno: bool = False
    fno_modes: int = 16
    # the experimental file's Transformer.forward threads value residuals
    # across depth and drops explicit residual adds after the first depth
    # layer EVEN when use_value_residual_learning is false (reference
    # bs_roformer_experimental.py:239-258); experimental model types set
    # this so that semantics apply regardless of the VR flag
    experimental_forward: bool = False
    # The bs and mel reference files define DIFFERENT MLP builders for the
    # mask estimator: bs_roformer.py:262 uses (depth-1) hidden layers,
    # mel_band_roformer.py:271 (and mel_band_conformer.py:45) uses depth
    # hidden layers — one extra Linear+Tanh for the same config value.
    # Mel variants set this flag (caught by the true-reference oracle,
    # tests/test_reference_roformer_oracles.py).
    mel_mlp_convention: bool = False

    @property
    def mask_hidden_layers(self) -> int:
        return self.mask_estimator_depth - 1 + int(self.mel_mlp_convention)

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def num_freqs(self) -> int:
        return self.stft_n_fft // 2 + 1

    @property
    def num_features(self) -> int:
        return self.num_freqs * self.audio_channels * 2

    def band_plan(self) -> B.BandPlan:
        feats = [np.asarray(f, dtype=np.int32) for f in self.band_feats]
        return B.make_band_plan(feats, self.num_features)


_IGNORED_CONFIG_KEYS = {
    "multi_stft_resolution_loss_weight",
    "multi_stft_resolutions_window_sizes",
    "multi_stft_hop_size",
    "multi_stft_normalized",
    "multi_stft_window_fn",
    "stft_window_fn",
    "attn_dropout",
    "ff_dropout",
    "flash_attn",
    "use_torch_checkpoint",
    "sage_attention",
    "dim_freqs_in",
    "debug",
    "use_shared_bias",
    "norm_output",  # handled implicitly per variant
}


def spec_from_config(model_cfg: dict) -> RoformerSpec:
    """BSRoformer(**config.model) equivalent (reference utils.py:104-106)."""
    cfg = {k: v for k, v in dict(model_cfg).items() if k not in _IGNORED_CONFIG_KEYS}
    if "use_value_residual_learning" in cfg:  # experimental variant naming
        cfg["value_residual"] = bool(cfg.pop("use_value_residual_learning"))
    freqs_per_bands = tuple(cfg.pop("freqs_per_bands", DEFAULT_FREQS_PER_BANDS))
    stereo = bool(cfg.get("stereo", False))
    ch = 2 if stereo else 1
    widths = [2 * f * ch for f in freqs_per_bands]
    n_fft = int(cfg.get("stft_n_fft", 2048))
    assert sum(freqs_per_bands) == n_fft // 2 + 1, (
        f"bands must cover {n_fft // 2 + 1} freqs, got {sum(freqs_per_bands)}"
    )
    feats = tuple(tuple(f.tolist()) for f in B.contiguous_band_feats(widths))
    return RoformerSpec(band_feats=feats, **cfg)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _fno_init(rng, dim, modes):
    k1, k2, k3 = jax.random.split(rng, 3)
    s = 1.0 / dim
    return {
        "w_re": s * jax.random.normal(k1, (modes, dim, dim)),
        "w_im": s * jax.random.normal(k2, (modes, dim, dim)),
        "bypass_w": s * jax.random.normal(k3, (dim, dim)),
        "bypass_b": jnp.zeros((dim,)),
    }


def _fno_apply(p, x, precision=None):
    """FNO1d stage along the time axis: x (B, Tf, NB, D) -> same shape.

    Spectral convolution over the lowest `modes` rDFT frequencies with full
    channel mixing, plus a pointwise bypass, GELU, residual. The rDFT runs
    as MXU GEMMs (the backend has no fft/complex; see sesa_tpu/ops/fft.py).
    """
    from sesa_tpu.ops.fft import _irdft_mats, _rdft_mats

    t = x.shape[1]
    modes = p["w_re"].shape[0]
    cdt = x.dtype
    c, s = _rdft_mats(t)
    ci, si = _irdft_mats(t)
    cm = jnp.asarray(c[:, :modes], cdt)
    sm = jnp.asarray(s[:, :modes], cdt)
    cim = jnp.asarray(ci[:modes], cdt)
    sim = jnp.asarray(si[:modes], cdt)

    xr = jnp.einsum("btnd,tk->bknd", x, cm, precision=precision)
    xi = jnp.einsum("btnd,tk->bknd", x, sm, precision=precision)
    yr = (jnp.einsum("bknd,kde->bkne", xr, p["w_re"], precision=precision)
          - jnp.einsum("bknd,kde->bkne", xi, p["w_im"], precision=precision))
    yi = (jnp.einsum("bknd,kde->bkne", xr, p["w_im"], precision=precision)
          + jnp.einsum("bknd,kde->bkne", xi, p["w_re"], precision=precision))
    spectral = (jnp.einsum("bknd,kt->btnd", yr, cim, precision=precision)
                + jnp.einsum("bknd,kt->btnd", yi, sim, precision=precision))
    bypass = jnp.einsum("btnd,de->btne", x, p["bypass_w"],
                        precision=precision) + p["bypass_b"]
    return x + jax.nn.gelu(spectral + bypass, approximate=False)


def init_from_spec(rng, spec: RoformerSpec, transformer_norm_output: bool = False,
                   final_norm: bool = True):
    plan = spec.band_plan()
    keys = iter(jax.random.split(rng, 8 + 5 * spec.depth + spec.num_stems))
    layers = []
    for layer_index in range(spec.depth):
        vr = spec.value_residual and layer_index > 0
        layer = {}
        if spec.linear_transformer_depth > 0:
            layer["linear"] = core.transformer_init(
                next(keys), spec.dim, spec.linear_transformer_depth, spec.heads,
                spec.dim_head, norm_output=transformer_norm_output, linear_attn=True)
        layer["time"] = core.transformer_init(
            next(keys), spec.dim, spec.time_transformer_depth, spec.heads,
            spec.dim_head, norm_output=transformer_norm_output, value_residual=vr,
            num_residual_streams=spec.num_residual_streams)
        layer["freq"] = core.transformer_init(
            next(keys), spec.dim, spec.freq_transformer_depth, spec.heads,
            spec.dim_head, norm_output=transformer_norm_output, value_residual=vr,
            num_residual_streams=spec.num_residual_streams)
        if spec.use_fno:
            layer["fno"] = _fno_init(next(keys), spec.dim, spec.fno_modes)
        layers.append(layer)

    params = {
        "band_split": B.band_split_init(next(keys), plan, spec.dim),
        "layers": layers,
        "mask_estimators": [
            B.mask_estimator_init(next(keys), plan, spec.dim,
                                  spec.mask_hidden_layers,
                                  spec.mlp_expansion_factor)
            for _ in range(spec.num_stems)
        ],
        "rope_time_freqs": jnp.asarray(default_freqs(spec.dim_head)),
        "rope_freq_freqs": jnp.asarray(default_freqs(spec.dim_head)),
    }
    if final_norm:
        params["final_norm_gamma"] = jnp.ones((spec.dim,))
    return params


def init(rng, config):
    return init_from_spec(rng, spec_from_config(config.model),
                          transformer_norm_output=False, final_norm=True)


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def apply_from_spec(params, spec: RoformerSpec, x, precision=None,
                    compute_dtype=None):
    """x (B, ch, T) -> (B, num_stems, ch, T).

    ``compute_dtype=jnp.bfloat16`` runs the transformer stack in bf16 (the
    analog of the reference's AMP autocast, utils.py:399) while the STFT,
    mask multiply, and iSTFT stay float32.
    """
    from sesa_tpu.ops.prec import net_precision

    precision = net_precision(precision, compute_dtype)
    plan = spec.band_plan()
    b, ch, t = x.shape
    assert ch == spec.audio_channels

    window = hann_window(spec.stft_win_length, dtype=x.dtype)
    s = stft_ri(
        x, spec.stft_n_fft, spec.stft_hop_length, window,
        win_length=spec.stft_win_length, normalized=spec.stft_normalized,
    )  # (B, ch, F, Tf, 2)
    tf = s.shape[-2]
    # pack (f, s, c) minor-to-major order: feature = (f*ch + s)*2 + c
    sp = jnp.transpose(s, (0, 3, 2, 1, 4)).reshape(b, tf, spec.num_features)

    nb = plan.num_bands
    # RoPE tables in float32 (bf16 angles lose phase accuracy at long range)
    rope_time = rope_tables(params["rope_time_freqs"].astype(jnp.float32), tf)
    rope_freq = rope_tables(params["rope_freq_freqs"].astype(jnp.float32), nb)

    net_in = sp if compute_dtype is None else sp.astype(compute_dtype)
    if compute_dtype is not None:
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
        rope_time = tuple(r.astype(compute_dtype) for r in rope_time)
        rope_freq = tuple(r.astype(compute_dtype) for r in rope_freq)
    xb = B.band_split_apply(plan, params["band_split"], net_in, precision=precision)

    streams = spec.num_residual_streams
    vr_forward = spec.value_residual or spec.experimental_forward or streams > 1
    if streams > 1:
        # expand residual streams once before the depth loop (reference
        # bs_roformer_experimental.py:558-560)
        xb = HC.expand_streams(xb, streams)

    # Uniform stacks (no skip/linear/VR/streams) run as ONE lax.scan over
    # stacked per-depth params instead of a depth-times unrolled program:
    # XLA compiles the [time+freq] body once, cutting flagship cold-compile
    # from minutes to tens of seconds with identical numerics (same ops,
    # same order). Deeper-shared structure is guaranteed by init_from_spec.
    use_scan = (_SCAN_UNROLL > 0 and not spec.skip_connection and not vr_forward
                and spec.linear_transformer_depth == 0 and not spec.use_fno
                and len(params["layers"]) > 1)
    if use_scan:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

        def scan_body(z, layer):
            z = jnp.transpose(z, (0, 2, 1, 3))  # (B, NB, Tf, D)
            z = core.transformer_apply(layer["time"], z, spec.heads,
                                       rope=rope_time, precision=precision)
            z = jnp.transpose(z, (0, 2, 1, 3))  # (B, Tf, NB, D)
            z = core.transformer_apply(layer["freq"], z, spec.heads,
                                       rope=rope_freq, precision=precision)
            return z, None

        xb, _ = jax.lax.scan(scan_body, xb, stacked,
                             unroll=min(_SCAN_UNROLL, len(params["layers"])))

    store = []
    time_v_res = freq_v_res = None
    for layer in (() if use_scan else params["layers"]):
        # reference order (bs_roformer.py:510-524): the linear transformer
        # runs FIRST, then the skip sums are added
        if "linear" in layer:
            z = xb.reshape(-1, tf * nb, spec.dim)
            z = core.transformer_apply(layer["linear"], z, spec.heads,
                                       linear_attn=True, precision=precision)
            xb = z.reshape(-1, tf, nb, spec.dim)
        if spec.skip_connection and store:
            xb = xb + sum(store)
        # time transformer: sequence axis = frames
        z = jnp.transpose(xb, (0, 2, 1, 3))  # (B, NB, Tf, D)
        if vr_forward:
            z, next_tv = core.transformer_apply_vr(
                layer["time"], z, spec.heads, rope=rope_time,
                value_residual=time_v_res, precision=precision, streams=streams)
            time_v_res = time_v_res if time_v_res is not None else next_tv
        else:
            z = core.transformer_apply(layer["time"], z, spec.heads,
                                       rope=rope_time, precision=precision)
        z = jnp.transpose(z, (0, 2, 1, 3))  # (B, Tf, NB, D)
        # freq transformer: sequence axis = bands
        if vr_forward:
            xb, next_fv = core.transformer_apply_vr(
                layer["freq"], z, spec.heads, rope=rope_freq,
                value_residual=freq_v_res, precision=precision, streams=streams)
            freq_v_res = freq_v_res if freq_v_res is not None else next_fv
        else:
            xb = core.transformer_apply(layer["freq"], z, spec.heads,
                                        rope=rope_freq, precision=precision)
        if "fno" in layer:
            xb = _fno_apply(layer["fno"], xb, precision=precision)
        if spec.skip_connection:
            store.append(xb)

    if streams > 1:
        # sum-reduce the residual streams (reference :608-610)
        xb = HC.reduce_streams(xb, streams)

    if "final_norm_gamma" in params:
        xb = rms_norm(xb, params["final_norm_gamma"])

    masks = jnp.stack(
        [B.mask_estimator_apply(plan, p, xb, precision=precision)
         for p in params["mask_estimators"]],
        axis=1,
    ).astype(jnp.float32)  # (B, S, Tf, F2)

    # complex multiply mask × stft in packed RI features
    nstems = masks.shape[1]
    m = masks.reshape(b, nstems, tf, spec.num_features // 2, 2)
    sr = sp.reshape(b, 1, tf, spec.num_features // 2, 2)
    re = m[..., 0] * sr[..., 0] - m[..., 1] * sr[..., 1]
    im = m[..., 0] * sr[..., 1] + m[..., 1] * sr[..., 0]
    out = jnp.stack([re, im], axis=-1)  # (B, S, Tf, F*ch, 2)

    # unpack rows (f, s) -> (B, S, ch, F, Tf, 2)
    out = out.reshape(b, nstems, tf, spec.num_freqs, ch, 2)
    out = jnp.transpose(out, (0, 1, 4, 3, 2, 5))

    # bs_roformer always passes the input length to istft; the mel variant
    # only when match_input_audio_length is set (the spec accepts the knob
    # because real mel YAMLs carry it). We always reconstruct to T: on
    # hop-aligned chunks (hop*(frames-1) == T, which demix guarantees) the
    # two behaviors are numerically identical, and on misaligned inputs the
    # reference returns hop*(frames-1) samples — a shape its own demix
    # accumulator cannot even consume — so a fixed-T output is the only
    # semantics that composes, and it keeps demix shapes static.
    wav = istft_ri(
        out, spec.stft_n_fft, spec.stft_hop_length, window,
        win_length=spec.stft_win_length, normalized=spec.stft_normalized,
        length=t,
    )
    return wav  # (B, S, ch, T)


def apply(params, config, x, precision=None, compute_dtype=None):
    return apply_from_spec(params, spec_from_config(config.model), x,
                           precision=precision, compute_dtype=compute_dtype)


# --------------------------------------------------------------------------
# torch checkpoint conversion
# --------------------------------------------------------------------------

def _make_take(state_dict):
    sd = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        try:
            return sd[key]
        except KeyError:
            import difflib

            near = difflib.get_close_matches(key, sd.keys(), n=3, cutoff=0.5)
            raise KeyError(
                f"checkpoint key {key!r} not found (expected by this "
                f"model's assumed layout); closest present keys: {near}. "
                "If this is a conformer-family checkpoint, see README "
                "'Conformer checkpoint layout recovery'."
            ) from None

    return sd, used, take


def convert_from_spec(state_dict, spec: RoformerSpec,
                      transformer_norm_output: bool = False,
                      final_norm: bool = True):
    plan = spec.band_plan()
    sd, used, take = _make_take(state_dict)

    # band split: to_features.{i} = [RMSNorm, Linear] per band -> width groups
    bs_groups = []
    for g, ids in enumerate(plan.group_band_ids):
        bs_groups.append(
            {
                "norm_gamma": jnp.stack([take(f"band_split.to_features.{i}.0.gamma") for i in ids]),
                "weight": jnp.stack(
                    # torch Linear weight (out, in) -> stacked (m, in, out)
                    [take(f"band_split.to_features.{i}.1.weight").T for i in ids]
                ),
                "bias": jnp.stack([take(f"band_split.to_features.{i}.1.bias") for i in ids]),
            }
        )

    layers = []
    for d in range(spec.depth):
        vr = spec.value_residual and d > 0
        j = 0
        layer = {}
        if spec.linear_transformer_depth > 0:
            layer["linear"] = core.convert_transformer(
                take, f"layers.{d}.{j}", spec.linear_transformer_depth,
                norm_output=transformer_norm_output, linear_attn=True)
            j += 1
        layer["time"] = core.convert_transformer(
            take, f"layers.{d}.{j}", spec.time_transformer_depth,
            norm_output=transformer_norm_output, value_residual=vr,
            num_residual_streams=spec.num_residual_streams)
        layer["freq"] = core.convert_transformer(
            take, f"layers.{d}.{j + 1}", spec.freq_transformer_depth,
            norm_output=transformer_norm_output, value_residual=vr,
            num_residual_streams=spec.num_residual_streams)
        if spec.use_fno:
            layer["fno"] = {
                "w_re": take(f"layers.{d}.{j + 2}.weight_real"),
                "w_im": take(f"layers.{d}.{j + 2}.weight_imag"),
                "bypass_w": take(f"layers.{d}.{j + 2}.bypass.weight").T,
                "bypass_b": take(f"layers.{d}.{j + 2}.bypass.bias"),
            }
        layers.append(layer)

    mask_estimators = []
    for s in range(spec.num_stems):
        n_hidden = spec.mask_hidden_layers
        hidden = []
        for li in range(n_hidden):
            # MLP Sequential: Linear at even indices (act between)
            hidden.append(
                {
                    "weight": jnp.stack(
                        [take(f"mask_estimators.{s}.to_freqs.{i}.0.{2 * li}.weight").T
                         for i in range(plan.num_bands)]
                    ),
                    "bias": jnp.stack(
                        [take(f"mask_estimators.{s}.to_freqs.{i}.0.{2 * li}.bias")
                         for i in range(plan.num_bands)]
                    ),
                }
            )
        last = 2 * n_hidden
        groups = []
        for g, ids in enumerate(plan.group_band_ids):
            groups.append(
                {
                    "weight": jnp.stack(
                        [take(f"mask_estimators.{s}.to_freqs.{i}.0.{last}.weight").T for i in ids]
                    ),
                    "bias": jnp.stack(
                        [take(f"mask_estimators.{s}.to_freqs.{i}.0.{last}.bias") for i in ids]
                    ),
                }
            )
        mask_estimators.append({"hidden": hidden, "groups": groups})

    # The reference builds ONE shared RotaryEmbedding per axis and hands it
    # to every Transformer (bs_roformer.py:384-397); torch registers the
    # shared module under each attention layer, so real checkpoints carry
    # `layers.{d}.{j}.layers.{i}.0.rotary_embed.freqs` (identical tensors).
    # Older exports may instead have top-level `time_rotary_embed.freqs`.
    j0 = 1 if spec.linear_transformer_depth > 0 else 0

    def rope_freqs(legacy_key, j):
        if legacy_key in sd:
            return take(legacy_key)
        key = f"layers.0.{j}.layers.0.0.rotary_embed.freqs"
        if key in sd:
            return take(key)
        # num_residual_streams > 1: the hyper-connections wrapper nests the
        # attention under '.branch' (reference bs_roformer_experimental.py
        # init_hyper_conn(branch=Attention(...)))
        return take(f"layers.0.{j}.layers.0.0.branch.rotary_embed.freqs")

    params = {
        "band_split": {"groups": bs_groups},
        "layers": layers,
        "mask_estimators": mask_estimators,
        "rope_time_freqs": rope_freqs("time_rotary_embed.freqs", j0),
        "rope_freq_freqs": rope_freqs("freq_rotary_embed.freqs", j0 + 1),
    }
    if final_norm:
        params["final_norm_gamma"] = take("final_norm.gamma")

    unused = {k for k in set(sd) - used if not k.endswith(("freqs_per_band",
              "freq_indices", "num_freqs_per_band", "num_bands_per_freq",
              ".rotary_embed.freqs"))}
    if unused:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(unused)[:8]} ...")
    return params


def convert_torch(state_dict, config):
    return convert_from_spec(state_dict, spec_from_config(config.model),
                             transformer_norm_output=False, final_norm=True)
