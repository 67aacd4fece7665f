from d3roma_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    slice_process_local,
    replicate_sharding,
    shard_batch,
)
from d3roma_tpu.parallel.spatial import (  # noqa: F401
    SEQ_AXIS,
    make_mesh_dp_sp,
    spatial_batch_spec,
    spatial_sharding,
)
from d3roma_tpu.parallel.tensor import (  # noqa: F401
    MODEL_AXIS,
    make_mesh_dp_tp,
    shard_params_tp,
    shard_pipeline_tp,
    shard_state_tp,
    tp_param_shardings,
    tp_param_specs,
    tp_shard_count,
)
