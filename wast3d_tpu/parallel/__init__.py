from wast3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    scene_sharding,
    shard_train_state,
)
