from wast3d_tpu.core import sh, transforms, camera, lr  # noqa: F401
