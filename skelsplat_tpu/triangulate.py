"""DLT multi-camera triangulation of 2D detections — port of triangulation.py.

Produces the ``point_cloud/iteration_0/{scene}.ply`` initial-guess clouds
consumed by dataset_tools/preprocess_triang_initial_guess.py. Per joint,
solves the homogeneous DLT system with an SVD (triangulation.py:122-150);
the whole (scenes × joints) batch is solved in one vectorized
``np.linalg.svd`` call instead of a per-joint Python loop — the math is
identical, the per-dataset projection-matrix construction is preserved
(K·[R|t]; H36M per-subject extrinsics, Panoptic per-activity calibration ×10
cm→mm, Occlusion-Person t = −R·T with the every-other-camera selection).
"""

from __future__ import annotations

import json
import os

import numpy as np

from skelsplat_tpu.data import ply
from skelsplat_tpu.data.cameras_io import (H36M_CAMERAS, OP_CAMERAS,
                                           PANOPTIC_CAMERAS)


# --------------------------- projection matrices ---------------------------

def get_calibration_matrices_h36m(camera_data):
    """triangulation.py:34-41."""
    return [np.array(camera_data["intrinsics"][cam]["calibration_matrix"],
                     dtype=np.float64).reshape(3, 3)
            for cam in H36M_CAMERAS]


def get_extrinsics_h36m(camera_data, subject_id):
    """triangulation.py:44-57."""
    R, t = [], []
    for cam in H36M_CAMERAS:
        ext = camera_data["extrinsics"][subject_id][cam]
        R.append(np.array(ext["R"], dtype=np.float64).reshape(3, 3))
        t.append(np.array(ext["t"], dtype=np.float64).reshape(3, 1))
    return R, t


def create_projection_matrix_h36m(K_list, R_list, t_list):
    """triangulation.py:59-67: P = K·[R|t]."""
    return [k @ np.hstack((r, t.reshape(-1, 1)))
            for k, r, t in zip(K_list, R_list, t_list)]


def get_camera_parameters_op(camera_data, nviews):
    """triangulation.py:70-90 (odd cameras, t = −R·T)."""
    cameras = OP_CAMERAS[1::2][:nviews]
    K, R, t = {}, {}, {}
    for cam in cameras:
        cam = int(cam)
        c = camera_data[cam]
        K[cam] = np.array([[c["fx"], 0, c["cx"]],
                           [0, c["fy"], c["cy"]], [0, 0, 1]])
        R[cam] = np.array(c["R"], dtype=np.float64).reshape(3, 3)
        t[cam] = -R[cam] @ np.array(c["T"], dtype=np.float64).reshape(3, 1)
    return K, R, t


def get_camera_parameters_panoptic(camera_data, nviews):
    """triangulation.py:94-108 (t ×10 cm→mm)."""
    names = PANOPTIC_CAMERAS[:nviews]
    K, R, t = {}, {}, {}
    for cam in names:
        for data in camera_data["cameras"]:
            if data["name"] == cam:
                K[cam] = np.array(data["K"], dtype=np.float64).reshape(3, 3)
                R[cam] = np.array(data["R"], dtype=np.float64).reshape(3, 3)
                t[cam] = np.array(data["t"], dtype=np.float64).reshape(3, 1) * 10
    return K, R, t


def create_projection_matrix(K_dict, R_dict, t_dict):
    """triangulation.py:111-119 (sorted camera keys)."""
    return [K_dict[cam] @ np.hstack((R_dict[cam], t_dict[cam].reshape(-1, 1)))
            for cam in sorted(K_dict.keys())]


# ------------------------------- DLT solve --------------------------------

def triangulate_points_multi_camera(P_list, x_list):
    """triangulation.py:122-138: single-point DLT (kept for API parity)."""
    A = []
    for P, x in zip(P_list, x_list):
        x_hom = np.append(x, 1)
        A.append(x_hom[0] * P[2, :] - P[0, :])
        A.append(x_hom[1] * P[2, :] - P[1, :])
    _, _, Vt = np.linalg.svd(np.array(A))
    X = Vt[-1]
    return X / X[3]


def triangulate_poses(P_list, poses_2d):
    """(V,N,2) detections → (N,4) homogeneous points; batched SVD over
    joints (triangulation.py:141-150)."""
    poses_2d = np.asarray(poses_2d)[..., :2]
    P = np.asarray(P_list)                        # (V,3,4)
    N = poses_2d.shape[1]
    # rows: x·P₂ − P₀ and y·P₂ − P₁ per view  →  A (N, 2V, 4)
    x = poses_2d[:, :, 0].T[..., None]            # (N,V,1)
    y = poses_2d[:, :, 1].T[..., None]
    r0 = x * P[None, :, 2, :] - P[None, :, 0, :]  # (N,V,4)
    r1 = y * P[None, :, 2, :] - P[None, :, 1, :]
    A = np.concatenate([r0[:, :, None, :], r1[:, :, None, :]],
                       axis=2).reshape(N, -1, 4)
    _, _, Vt = np.linalg.svd(A)
    X = Vt[:, -1, :]                              # (N,4)
    return X / X[:, 3:4]


# ------------------------------ scene sweep --------------------------------

def run_triangulation(dataset_cfg, dataset_loader, output_dir, log=None):
    """triangulation.py:153-200: triangulate every scene, write iteration_0
    PLYs (double precision, matching the o3d output the reference emits)."""
    info = (log.info if log else print)
    data_root = dataset_cfg.data_root

    camera_data = None
    if "h36m" in data_root:
        meta = os.path.join(data_root, "3d_gt", "cameras",
                            "camera-parameters.json")
        if not os.path.exists(meta):
            meta = os.path.join(data_root, "initial_guess", "cameras",
                                "camera-parameters.json")
        with open(meta) as f:
            camera_data = json.load(f)
        K_cameras = get_calibration_matrices_h36m(camera_data)
    elif "occlusion-person" in data_root:
        with open(os.path.join(data_root, "cameras.json")) as f:
            camera_data = json.load(f)

    info(f"{len(dataset_loader)} scenes to process")
    pan_cal = {}
    out_dir = os.path.join(output_dir, "point_cloud/iteration_0")
    os.makedirs(out_dir, exist_ok=True)

    for scene_id, rec in dataset_loader:
        scene_name = rec.scene_name
        subject_id = scene_name.split("_")[0]
        if "h36m" in data_root:
            R_c, t_c = get_extrinsics_h36m(camera_data, subject_id)
            P = create_projection_matrix_h36m(K_cameras, R_c, t_c)
        elif "occlusion-person" in data_root:
            K_c, R_c, t_c = get_camera_parameters_op(
                camera_data[str(scene_id)], dataset_cfg.nviews)
            P = create_projection_matrix(K_c, R_c, t_c)
        else:  # panoptic
            activity = scene_name.split("_")[1] + "_" + scene_name.split("_")[2]
            if activity not in pan_cal:
                path = os.path.join(data_root, "3d_gt", "cameras",
                                    f"calibration_{activity}.json")
                with open(path) as f:
                    pan_cal[activity] = json.load(f)
            K_c, R_c, t_c = get_camera_parameters_panoptic(
                pan_cal[activity], dataset_cfg.nviews)
            P = create_projection_matrix(K_c, R_c, t_c)

        X = triangulate_poses(P, rec.poses_2d)
        pose_3d = X[:, :3] / X[:, 3:4]
        ply.write_xyz_double_ply(
            os.path.join(out_dir, f"{scene_name}.ply"), pose_3d)
    info(f"Wrote triangulated clouds to {out_dir}")
