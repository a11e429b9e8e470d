"""Camera-list construction (port of utils/camera_utils.py).

The SkelSplat-live path is the image-free branch (camera_utils.py:21-25:
``image_path == ""`` ⇒ image=None, resolution = (width, height) as-is); the
resolution-scaling logic for image-carrying datasets (upstream 3DGS) is kept
for surface parity.
"""

from __future__ import annotations

import numpy as np

from skelsplat_tpu.core.cameras import Camera, make_camera
from skelsplat_tpu.data.cameras_io import CameraInfo, camera_to_json

WARNED = False


def loadCam(args, id, cam_info: CameraInfo, resolution_scale,
            is_nerf_synthetic=False) -> Camera:
    """camera_utils.py:20-76. For SkelSplat data there is no image, so the
    original (width, height) pass through; with a ``resolution`` setting in
    [1,2,4,8] or an explicit target width the intrinsics rescale."""
    orig_w, orig_h = cam_info.width, cam_info.height
    resolution_setting = getattr(args, "resolution", -1)

    if resolution_setting in [1, 2, 4, 8]:
        scale = resolution_scale * resolution_setting
        resolution = (round(orig_w / scale), round(orig_h / scale))
    else:
        if resolution_setting == -1:
            global_down = 1
        else:
            global_down = orig_w / resolution_setting
        scale = float(global_down) * float(resolution_scale)
        resolution = (int(orig_w / scale), int(orig_h / scale))

    K = cam_info.K.copy()
    if resolution != (orig_w, orig_h):
        sx = resolution[0] / orig_w
        sy = resolution[1] / orig_h
        K = K.copy()
        K[0, :] *= sx
        K[1, :] *= sy

    return make_camera(cam_info.R, cam_info.T, K, resolution[0],
                       resolution[1], uid=id)


def cameraList_from_camInfos(cam_infos, resolution_scale, args,
                             is_nerf_synthetic=False):
    """camera_utils.py:78-85."""
    return [loadCam(args, idx, c, resolution_scale, is_nerf_synthetic)
            for idx, c in enumerate(cam_infos)]


def camera_to_JSON(id, camera: CameraInfo):
    """camera_utils.py:87-105 (delegates to cameras_io.camera_to_json)."""
    return camera_to_json(id, camera)
