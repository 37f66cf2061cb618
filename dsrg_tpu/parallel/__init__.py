from dsrg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    pad_batch_to_multiple,
    shard_batch,
    shard_global_batch,
    replicate_to_mesh,
    data_parallel_step,
)
