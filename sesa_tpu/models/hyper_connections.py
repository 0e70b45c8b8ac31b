"""Hyper-connections: learned multi-stream residuals (arXiv 2409.19606).

Behavioral spec: the ``hyper_connections`` package used by the reference
(models/bs_roformer/bs_roformer_experimental.py:19,213,413) — lucidrains'
implementation of ByteDance's hyper-connections. Each wrapped branch
(attention or feed-forward) reads a learned mixture of ``S`` residual
streams and writes its output back into every stream with learned
depth weights:

    r        : (b, n, S, d)           residual streams
    normed   = rmsnorm(r)             (zero-init gamma, +1 offset)
    alpha    = tanh(normed @ Wa) * sa + static_alpha   # (b, n, S, S+1)
    beta     = tanh(normed @ Wb) * sb + static_beta    # (b, n, S)
    mix      = einsum('b n s t, b n s d -> b n t d', alpha, r)
    branch_in, r' = mix[..., 0, :], mix[..., 1:, :]
    out      = branch(branch_in)
    r''      = r' + out[..., None, :] * beta[..., None]

Stream folding follows the package's einops patterns verbatim so that the
composition with the roformer's axial ``pack``/``unpack`` reshapes matches
the reference bit-for-bit: ``expand = repeat('b ... -> (b s) ...')``,
``reduce = reduce('(b s) ... -> b ...', 'sum')``, and inside the wrapper
``rearrange('(b s) n d -> b n s d')``. Inside the packed axial stages the
leading dim is (batch·streams·bands), so the '(b s)' split deliberately
reproduces the reference's grouping rather than a semantically "clean"
stream axis.

State-dict layout (per wrapped module): ``branch.*`` plus ``norm.gamma``,
``static_alpha`` (S, S+1), ``static_beta`` (S,), ``dynamic_alpha_fn``
(d, S+1), ``dynamic_alpha_scale`` (), ``dynamic_beta_fn`` (d,),
``dynamic_beta_scale`` (). The RMSNorm uses the package's zero-init gamma
with unit offset: ``l2norm(x) * sqrt(d) * (gamma + 1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_streams(x: jax.Array, streams: int) -> jax.Array:
    """repeat 'b ... -> (b s) ...' (identity for streams == 1)."""
    if streams == 1:
        return x
    shape = x.shape
    x = jnp.broadcast_to(x[:, None], (shape[0], streams) + shape[1:])
    return x.reshape((shape[0] * streams,) + shape[1:])


def reduce_streams(x: jax.Array, streams: int) -> jax.Array:
    """reduce '(b s) ... -> b ...' sum (identity for streams == 1)."""
    if streams == 1:
        return x
    shape = x.shape
    return x.reshape((shape[0] // streams, streams) + shape[1:]).sum(axis=1)


def hc_init(rng, dim: int, streams: int, layer_index: int):
    """Parameters of one HyperConnections wrapper (branch excluded)."""
    del rng  # all-deterministic init, matching the package
    alpha0 = jnp.zeros((streams, 1)).at[layer_index % streams, 0].set(1.0)
    return {
        "norm_gamma": jnp.zeros((dim,)),
        "static_alpha": jnp.concatenate([alpha0, jnp.eye(streams)], axis=1),
        "static_beta": jnp.ones((streams,)),
        "dynamic_alpha_fn": jnp.zeros((dim, streams + 1)),
        "dynamic_alpha_scale": jnp.asarray(1e-2),
        "dynamic_beta_fn": jnp.zeros((dim,)),
        "dynamic_beta_scale": jnp.asarray(1e-2),
    }


def _hc_norm(x, gamma):
    scale = x.shape[-1] ** 0.5
    n = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    return n * scale * (gamma + 1.0)


def hc_width(p, x: jax.Array, streams: int, precision=None):
    """x ((b s), n, d) -> branch_in (b, n, d), residuals (b, n, s, d), beta.

    The mixing matmuls thread ``precision`` like every other matmul in the
    family — the backend's DEFAULT matmul precision is bf16-level (see
    ops/fft.py), which would silently degrade f32 parity runs on TPU."""
    bs, n, d = x.shape
    r = x.reshape(bs // streams, streams, n, d)
    r = jnp.transpose(r, (0, 2, 1, 3))  # (b, n, s, d)
    normed = _hc_norm(r, p["norm_gamma"])
    alpha = (
        jnp.tanh(jnp.matmul(normed, p["dynamic_alpha_fn"],
                            precision=precision)) * p["dynamic_alpha_scale"]
        + p["static_alpha"]
    )  # (b, n, s, s+1)
    beta = (
        jnp.tanh(jnp.matmul(normed, p["dynamic_beta_fn"],
                            precision=precision)) * p["dynamic_beta_scale"]
        + p["static_beta"]
    )  # (b, n, s)
    mix = jnp.einsum("bnst,bnsd->bntd", alpha, r, precision=precision)
    return mix[..., 0, :], mix[..., 1:, :], beta


def hc_depth(branch_out: jax.Array, residuals: jax.Array, beta: jax.Array):
    """Write the branch output into every stream; back to ((b s), n, d)."""
    r = residuals + branch_out[..., None, :] * beta[..., None]
    b, n, s, d = r.shape
    return jnp.transpose(r, (0, 2, 1, 3)).reshape(b * s, n, d)


def hc_apply(p, x: jax.Array, streams: int, branch_fn, precision=None):
    """Full wrapper: branch_fn (b, n, d) -> (b, n, d) or (out, extras)."""
    branch_in, residuals, beta = hc_width(p, x, streams, precision=precision)
    out = branch_fn(branch_in)
    extras = None
    if isinstance(out, tuple):
        out, *extras = out
    x = hc_depth(out, residuals, beta)
    if extras:
        return (x, *extras)
    return x


def hc_convert(take, prefix: str):
    """Read one wrapper's params from a torch state_dict accessor."""
    return {
        "norm_gamma": take(f"{prefix}.norm.gamma"),
        "static_alpha": take(f"{prefix}.static_alpha"),
        "static_beta": take(f"{prefix}.static_beta"),
        "dynamic_alpha_fn": take(f"{prefix}.dynamic_alpha_fn"),
        "dynamic_alpha_scale": take(f"{prefix}.dynamic_alpha_scale"),
        "dynamic_beta_fn": take(f"{prefix}.dynamic_beta_fn"),
        "dynamic_beta_scale": take(f"{prefix}.dynamic_beta_scale"),
    }
