"""skelsplat-tpu: TPU-native differentiable skeletal Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework for per-frame multi-view 3D human pose
estimation by optimizing one 3D Gaussian per joint against 2D-detection-derived
heatmaps (capability parity with laurabragagnolo/SkelSplat; see SURVEY.md).

Layering (cf. SURVEY.md §1):
  core/      pure geometry + parameter pytrees (cameras, gaussians, EWA math)
  ops/       compute kernels: rasterizer (dense jnp + fused Pallas), heatmap
             synthesis, SSIM, kNN, soft-argmax
  losses     loss/consistency/early-stopping registries
  engine/    per-scene optimizer (Adam groups + expon LR) and scan-based trainer
  data/      dataset trees (npz), camera calibration IO, PLY codec
  config/    hydra-compatible YAML config system
  parallel/  device-mesh sharding of the scene axis / view axis
"""

__version__ = "0.1.0"

from skelsplat_tpu.core import geometry  # noqa: F401
