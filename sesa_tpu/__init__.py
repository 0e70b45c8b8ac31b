"""sesa_tpu — TPU-native (JAX/XLA/Pallas/pjit) music source-separation framework.

A ground-up rebuild of the capabilities of test4373/SESA-Audio-Separation
(reference mounted read-only at /root/reference) designed TPU-first:

- a single shared torch-compatible STFT/iSTFT (``sesa_tpu.ops.stft``) instead of
  per-model copies (reference: models/mdx23c_tfc_tdf_v3.py:7-44,
  models/bs_roformer/bs_roformer.py:485,575, ...)
- chunked overlap-add separation as an on-device scan over HBM-resident chunks
  (``sesa_tpu.runtime.demix``) instead of a host loop with per-batch transfers
  (reference: utils.py:330-477)
- models as pure functions over parameter pytrees (``sesa_tpu.models``) with
  grouped/batched band projections instead of per-band Python loops
- data parallelism over chunk batches via ``jax.sharding`` meshes
  (``sesa_tpu.parallel``) instead of nn.DataParallel (reference:
  inference.py:209-210)
"""

__version__ = "0.1.0"
