"""Monocular-3D fusion initial guess — the core algorithm of
dataset_tools/h36m/compute_initial_guess.py:23-116 (and its Panoptic twin).

Each camera's monocular 3D prediction is reprojected into EVERY view; cameras
are weighted per joint by the inverse of their mean reprojection error and
the per-joint 3D positions are weighted-averaged. Vectorized over frames /
cameras / joints (the reference loops in Python); semantics identical.
"""

from __future__ import annotations

import numpy as np


def reprojection_errors(poses3d_world, poses2d, projection_matrices):
    """(C,F,J,3) world poses per source camera, (C,F,J,2) detections,
    C projection matrices → (F,C,J) mean-over-views reprojection error of
    each source camera's pose (compute_reprojection_error, :23-80)."""
    P = np.asarray(projection_matrices)            # (C,3,4)
    poses3d = np.asarray(poses3d_world, dtype=np.float64)
    C, F, J, _ = poses3d.shape
    ones = np.ones((C, F, J, 1))
    hom = np.concatenate([poses3d, ones], axis=-1)     # (C,F,J,4)
    # project source-pose c through view v: (V,C,F,J,3)
    proj = np.einsum("vij,cfkj->vcfki", P, hom)
    uv = proj[..., :2] / proj[..., 2:3]
    det = np.asarray(poses2d, dtype=np.float64)[:, None]   # (V,1,F,J,2)? no:
    # detections indexed by the VIEW axis
    det = np.asarray(poses2d, dtype=np.float64)            # (V,F,J,2)
    diff = uv - det[:, None]                               # (V,C,F,J,2)
    l2 = np.linalg.norm(diff, axis=-1)                     # (V,C,F,J)
    mean_over_views = l2.mean(axis=0)                      # (C,F,J)
    return np.transpose(mean_over_views, (1, 0, 2))        # (F,C,J)


def errors_to_weights(errors, axis=0):
    """Inverse-error weights normalized to 1 (convert_errors_to_weights,
    :84-89)."""
    w = 1.0 / np.asarray(errors)
    return w / w.sum(axis=axis, keepdims=True)


def fuse_poses(poses3d_world, poses2d, projection_matrices):
    """(C,F,J,3) + (C,F,J,2) + C×(3,4) → (F,J,3) fused poses
    (compute_weighted_average_pose, :96-117)."""
    errs = reprojection_errors(poses3d_world, poses2d, projection_matrices)
    w = 1.0 / errs                                         # (F,C,J)
    w = w / w.sum(axis=1, keepdims=True)
    poses = np.transpose(np.asarray(poses3d_world, dtype=np.float64),
                         (1, 0, 2, 3))                     # (F,C,J,3)
    return np.einsum("fcj,fcjd->fjd", w, poses)
