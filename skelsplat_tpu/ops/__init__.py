from skelsplat_tpu.ops.rasterizer import preprocess_gaussians, rasterize_dense, render
from skelsplat_tpu.ops import heatmaps

__all__ = ["preprocess_gaussians", "rasterize_dense", "render", "heatmaps"]
