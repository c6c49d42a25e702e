from wast3d_tpu.ops.rasterizer.api import (  # noqa: F401
    RasterizeSettings,
    render,
)
