from munit_tpu.dist.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_batch, unreplicate,
    replicate_state, make_global_batch, check_spatial_extent,
)
