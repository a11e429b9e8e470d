"""Camera model as a JAX pytree.

Replaces the reference's ``scene/cameras.py`` nn.Module: a frozen dataclass of
stacked float32 arrays, vmap/shard-friendly. A ``CameraBatch`` holds all V
views of one scene; the trainer vmaps the renderer over its leading axis
(replacing the round-robin view loop of train.py:136-141).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import numpy as np

from skelsplat_tpu.core import geometry

ZNEAR = 0.01   # scene/cameras.py:89
ZFAR = 100.0   # scene/cameras.py:88


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One pinhole view (or a batch, with leading axes on every field).

    Matrices are stored in plain math convention (row-vector-free):
    ``view4 @ [p;1]`` maps world→camera, ``full4 = proj4 @ view4`` maps
    world→clip. The reference stores these transposed for glm
    (scene/cameras.py:94-99); conversion happens at construction time.
    """

    view4: Any      # (…,4,4) world→view
    proj4: Any      # (…,4,4) intrinsics frustum
    full4: Any      # (…,4,4) proj4 @ view4
    cam_center: Any  # (…,3)
    focal_x: Any    # (…,)
    focal_y: Any    # (…,)
    tan_fovx: Any   # (…,)
    tan_fovy: Any   # (…,)
    width: Any      # (…,) float32 (static per-config in practice)
    height: Any     # (…,)
    uid: Any        # (…,) int32


def make_camera(R: np.ndarray, T: np.ndarray, K: np.ndarray,
                width: int, height: int, uid: int = 0,
                trans: np.ndarray | None = None, scale: float = 1.0) -> Camera:
    """Build a single Camera from loader-convention extrinsics/intrinsics.

    ``R`` is the transposed rotation as produced by the dataset readers
    (dataset_readers.py:263-267) and consumed by getWorld2View2; ``T`` the
    world→camera translation. FoVs derive from K exactly as in
    dataset_readers.py:269-272.
    """
    w2v = geometry.world2view(R, T, trans, scale).astype(np.float64)
    proj = geometry.projection_from_K(ZNEAR, ZFAR, K, width, height).astype(np.float64)
    full = (proj @ w2v).astype(np.float32)
    c2w = np.linalg.inv(w2v)
    fov_x = geometry.focal2fov(K[0, 0], width)
    fov_y = geometry.focal2fov(K[1, 1], height)
    # The kernel receives tan(fov/2) computed from the fov round-trip, and
    # focal = size / (2·tanfov) (gaussian_renderer/__init__.py:43-44 +
    # rasterize_points.cu focal computation) — NOT K's focal directly.
    tan_fovx = math.tan(fov_x * 0.5)
    tan_fovy = math.tan(fov_y * 0.5)
    f32 = np.float32
    return Camera(
        view4=w2v.astype(np.float32),
        proj4=proj.astype(np.float32),
        full4=full,
        cam_center=c2w[:3, 3].astype(np.float32),
        focal_x=f32(width / (2.0 * tan_fovx)),
        focal_y=f32(height / (2.0 * tan_fovy)),
        tan_fovx=f32(tan_fovx),
        tan_fovy=f32(tan_fovy),
        width=f32(width),
        height=f32(height),
        uid=np.int32(uid),
    )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack V single Cameras into one batched Camera (leading axis V)."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *cams)


# Alias used throughout: a Camera whose leading axis is the view axis.
CameraBatch = Camera
