"""Shared test fixtures: synthetic multi-camera rigs and skeletons."""

import numpy as np

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.cameras import make_camera, stack_cameras


def synthetic_rig(n_views=4, width=128, height=112, dist=4000.0, focal=1100.0,
                  scale_to_fit=True):
    """Cameras on a ring looking at the origin, H36M-like conventions.

    Uses loader conventions: world→cam extrinsics (R_wc, t), with the reader's
    transposed-R storage (dataset_readers.py:263-267). Focal scaled so a
    ~human-sized scene fits the (small, test-friendly) image.
    """
    if scale_to_fit:
        focal = focal * width / 1000.0
    cams = []
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views + 0.35
        # camera position in world
        pos = np.array([dist * np.cos(theta), dist * np.sin(theta), 900.0])
        # look-at rotation: camera z to origin-ish target
        target = np.array([0.0, 0.0, 800.0])
        z = target - pos
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=0)  # world→camera rows
        t = -R_wc @ pos
        K = np.array(
            [[focal, 0.0, width / 2 + 3.0],
             [0.0, focal * 1.01, height / 2 - 2.0],
             [0.0, 0.0, 1.0]]
        )
        # loaders store R transposed (camera→world) for getWorld2View2
        cams.append(make_camera(R_wc.T, t, K, width, height, uid=v))
    return stack_cameras(cams), width, height


def synthetic_skeleton(n_joints=17, rng=None, spread=350.0, center_z=800.0):
    rng = rng or np.random.default_rng(0)
    pts = rng.normal(0.0, spread, size=(n_joints, 3))
    pts[:, 2] = center_z + rng.normal(0, 250.0, n_joints)
    return pts.astype(np.float32)


def project_np(xyz, cam_single):
    """Host-side projection of world points to pixels for one (unbatched)
    camera pytree — used to fabricate consistent 2D 'detections'."""
    full = np.asarray(cam_single.view4)
    # full projective path, matching geometry.project_point_full
    F = np.asarray(cam_single.full4)
    hom = xyz @ F[:3, :4].T[:3, :] if False else xyz @ F[:3, :3].T + F[:3, 3]
    w = xyz @ F[3, :3].T + F[3, 3]
    ndc = hom / (w[:, None] + 1e-7)
    px = geometry.ndc2pix(ndc[:, 0], float(cam_single.width))
    py = geometry.ndc2pix(ndc[:, 1], float(cam_single.height))
    return np.stack([np.asarray(px), np.asarray(py)], axis=-1)


def take_cam(cams, v):
    """Slice view v out of a batched Camera pytree."""
    import jax
    return jax.tree.map(lambda x: x[v], cams)
