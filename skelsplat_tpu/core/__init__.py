from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.cameras import Camera, CameraBatch
from skelsplat_tpu.core.gaussians import GaussianParams, SkeletonModel

__all__ = ["geometry", "Camera", "CameraBatch", "GaussianParams", "SkeletonModel"]
