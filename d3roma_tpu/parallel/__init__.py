from d3roma_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate_sharding,
    shard_batch,
)
