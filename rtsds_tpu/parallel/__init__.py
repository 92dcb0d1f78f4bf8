from rtsds_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    dp_spatial_sharding,
    fsdp_shard_state,
    hybrid_batch_sharding,
    input_sharding,
    make_hybrid_mesh,
    make_mesh,
    make_mesh_2d,
    make_mesh_from_config,
    place_state,
    replicated_sharding,
    shard_batch,
    shard_spatial,
    shard_state,
    spatial_sharding,
)
from rtsds_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_apply_stateful,
    stack_block_params,
)
