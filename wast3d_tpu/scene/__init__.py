from wast3d_tpu.scene.gaussians import (  # noqa: F401
    GaussianScene,
    empty_scene,
    from_arrays,
    from_point_cloud,
    compact,
    grow_capacity,
)
