from sesa_tpu.parallel.mesh import (
    conformer_tp_rule,
    make_mesh,
    replicate,
    roformer_tp_rule,
    shard_chunks,
    shard_params,
)
