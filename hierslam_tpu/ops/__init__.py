from hierslam_tpu.ops.rasterize import RasterConfig, RenderOutput, rasterize  # noqa: F401
