"""StableHLO export — the parity feature for the reference's ONNX export
(reference pytorch_backend.py:539-590). Serializes a jitted separation
forward for deployment outside this runtime.
"""

from __future__ import annotations

from typing import Optional


def export_model(model_type: str, config, params, chunk_size: int,
                 batch_size: int = 1, num_channels: int = 2,
                 path: Optional[str] = None) -> bytes:
    """Export ``apply(params, chunks)`` as serialized StableHLO bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from sesa_tpu.models import get_model

    model = get_model(model_type)

    def fn(p, chunks):
        return model.apply(p, config, chunks)

    chunks_spec = jax.ShapeDtypeStruct((batch_size, num_channels, chunk_size),
                                       jnp.float32)
    exported = jexport.export(jax.jit(fn))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        chunks_spec,
    )
    blob = bytes(exported.serialize())
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob: bytes):
    """Deserialize an exported model into a callable ``fn(params, chunks)``
    (the load half of the reference's save/load optimized-model pair,
    pytorch_backend.py:281-333). Accepts the bytes from
    :func:`export_model` or a path to them."""
    from jax import export as jexport

    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(bytearray(blob))
    return exported.call
