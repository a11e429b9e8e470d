"""Skeletal Gaussian parameter store as a JAX pytree.

Replaces the reference's mutable ``GaussianModel`` (scene/gaussian_model.py:30-498)
with a frozen dataclass of raw (pre-activation) arrays plus pure activation
functions. The per-joint one-hot "color" features (gaussian_model.py:159-166)
are not stored — they are the identity matrix by construction, and the
renderer exploits that: channel j only ever receives Gaussian j's α·T.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from skelsplat_tpu.core import geometry

# Per-dataset extremity joints whose initial (log-)scale is boosted by
# ``model.scaling_modifier`` (gaussian_model.py:173-178).
EXTREMITY_JOINTS = {
    "h36m": [3, 6, 12, 13, 15, 16],
    "panoptic": [8, 14, 4, 5, 10, 11],
    "occlusion-person": [3, 6, 10, 11, 13, 14],
}

N_JOINTS = {"h36m": 17, "panoptic": 19, "occlusion-person": 15}

# The reference initializes the opacity logit to inverse_sigmoid(1.0) = +inf
# (gaussian_model.py:183): sigmoid saturates at exactly 1.0 with an exactly
# zero gradient, pinning opacity. +inf under JAX autodiff produces NaNs
# (inf·0), so we use a large finite logit: sigmoid(40) rounds to 1.0f and
# s·(1−s) evaluates to exactly 0.0f — same fixed point, NaN-free.
OPACITY_INIT_LOGIT = 40.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Raw optimization parameters for N joints (trailing shapes fixed).

    xyz:          (N,3) Gaussian means, world units (mm) — the pose estimate.
    log_scales:   (N,3) log of per-axis scale (activation exp,
                  gaussian_model.py:39).
    quats:        (N,4) unnormalized quaternions (w,x,y,z); activation is L2
                  normalization (gaussian_model.py:47).
    opacity_logit:(N,1) sigmoid-activated opacity (gaussian_model.py:44).
    """

    xyz: Any
    log_scales: Any
    quats: Any
    opacity_logit: Any

    # --- activations (gaussian_model.py:102-143) ---
    @property
    def scales(self):
        return jnp.exp(self.log_scales)

    @property
    def rotations(self):
        q = self.quats
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    @property
    def opacity(self):
        return jax.nn.sigmoid(self.opacity_logit)

    def covariance(self, scale_modifier: float = 1.0):
        """(N,6) packed world covariance (gaussian_model.py:33-37,142-143)."""
        return geometry.build_cov3d(self.scales, self.quats, scale_modifier)

    @property
    def n_joints(self) -> int:
        return self.xyz.shape[-2]


def init_params(initial_pose: np.ndarray, scene_type: str, scaling: float,
                scaling_modifier: float = 1.0) -> GaussianParams:
    """Seed parameters from an (N,3) initial 3D pose.

    Mirrors gaussian_model.py:149-200 (create_from_pcd): means = initial
    guess; raw log-scales = constant ``scaling`` with extremity joints
    multiplied by ``scaling_modifier`` (on the RAW value, i.e. the activated
    scale becomes e^(scaling·modifier)); identity quaternions; opacity pinned
    at 1. If ``scaling <= 0`` the reference falls back to using the point
    coordinates as raw scales (gaussian_model.py:170), reproduced here.
    """
    pts = np.asarray(initial_pose, dtype=np.float32).reshape(-1, 3)
    n = pts.shape[0]
    if scaling > 0.0:
        scales = np.full((n, 3), scaling, dtype=np.float32)
        idx = EXTREMITY_JOINTS.get(scene_type)
        if idx is not None:
            # full skeletons always contain all extremity indices; the filter
            # only matters for reduced test skeletons
            idx = [i for i in idx if i < n]
            scales[idx, :] *= scaling_modifier
    else:
        scales = pts.copy()
    quats = np.zeros((n, 4), dtype=np.float32)
    quats[:, 0] = 1.0
    opacity = np.full((n, 1), OPACITY_INIT_LOGIT, dtype=np.float32)
    return GaussianParams(
        xyz=jnp.asarray(pts),
        log_scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacity_logit=jnp.asarray(opacity),
    )


def one_hot_features(n_joints: int) -> jnp.ndarray:
    """The (N,N) one-hot joint-identity features (gaussian_model.py:159-166).
    Provided for API parity and the dense reference renderer; the fused
    kernels never materialize it."""
    return jnp.eye(n_joints, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class SkeletonModel:
    """Static per-dataset model description (scene/__init__.py:47-55 +
    configs/*/model)."""

    scene_type: str                 # "h36m" | "panoptic" | "occlusion-person"
    n_joints: int
    scaling: float = 3.0
    scaling_modifier: float = 1.0
    opacity_on: bool = True

    @classmethod
    def for_dataset(cls, data_root: str, scaling: float = 3.0,
                    scaling_modifier: float = 1.0, opacity_on: bool = True):
        scene_type = scene_type_of(data_root)
        return cls(scene_type, N_JOINTS[scene_type], scaling, scaling_modifier,
                   opacity_on)

    def init(self, initial_pose: np.ndarray) -> GaussianParams:
        return init_params(initial_pose, self.scene_type, self.scaling,
                           self.scaling_modifier)


def scene_type_of(data_root: str) -> str:
    """Dataset dispatch by substring of data_root — the reference's idiom
    (scene/__init__.py:47-55, general_utils.py:177-182 etc.). Order matters:
    'h36m-occ' contains 'h36m'."""
    if "panoptic" in data_root:
        return "panoptic"
    if "occlusion-person" in data_root:
        return "occlusion-person"
    if "h36m" in data_root:
        return "h36m"
    raise ValueError(f"Could not recognize scene type from {data_root!r}")
