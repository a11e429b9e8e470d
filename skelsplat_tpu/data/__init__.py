from skelsplat_tpu.data.loader import DataLoader
from skelsplat_tpu.data import ply, cameras_io

__all__ = ["DataLoader", "ply", "cameras_io"]
