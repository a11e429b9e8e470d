#!/usr/bin/env python
"""Generate a synthetic dataset in the H36M on-disk layout.

Creates the npz tree the DataLoader expects (SURVEY §2.2: initial_guess/…,
2d_<detector>/…, 3d_gt/…, camera-parameters.json) from random smooth
skeleton motions projected through a 4-camera rig — enough to exercise
train/eval/triangulation end-to-end without the (license-restricted) real
datasets, and the fixture for the integration tests.

    python -m skelsplat_tpu.tools.make_synthetic_dataset /tmp/synth-h36m \
        --subjects S9 S11 --frames 128 --frame-step 64 [--image-size 256]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from skelsplat_tpu.data.cameras_io import H36M_CAMERAS

ACTIVITIES = ["Directions", "Walking"]


def make_rig(n_views=4, img=1000, dist=4500.0, focal_scale=2.3):
    cams = []
    rng = np.random.default_rng(42)
    for v in range(n_views):
        th = 2 * np.pi * v / n_views + 0.45
        pos = np.array([dist * np.cos(th), dist * np.sin(th),
                        1200.0 + 150 * v])
        target = np.array([0.0, 0.0, 900.0])
        z = target - pos
        z /= np.linalg.norm(z)
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)          # world→camera
        t = -R @ pos
        f = focal_scale * img
        K = np.array([[f, 0, img / 2 + rng.normal(0, 2)],
                      [0, f * 1.002, img / 2 + rng.normal(0, 2)],
                      [0, 0, 1.0]])
        cams.append((K, R, t))
    return cams


def make_motion(n_frames, n_joints=17, seed=0):
    """Smooth random walk around a canonical skeleton (mm)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 280, (n_joints, 3))
    base[:, 2] = 900 + rng.normal(0, 220, n_joints)
    # symmetric limbs so the consistency prior is meaningful (h36m pairs)
    for a, b in [((12, 13), (15, 16)), ((5, 6), (2, 3))]:
        la = np.linalg.norm(base[a[0]] - base[a[1]])
        d = base[b[0]] - base[b[1]]
        base[b[1]] = base[b[0]] - d / np.linalg.norm(d) * la
    drift = np.cumsum(rng.normal(0, 4, (n_frames, 1, 3)), axis=0)
    wiggle = np.cumsum(rng.normal(0, 2.0, (n_frames, n_joints, 3)), axis=0)
    return base[None] + drift + wiggle


def project(K, R, t, pts):
    pc = pts @ R.T + t
    uv = pc[:, :2] / pc[:, 2:3]
    return uv @ K[:2, :2].T + K[:2, 2]


def write_tree(root: str, subjects, frames, frame_step, image_size=1000,
               detector="metrabs", noise_2d=0.7, noise_3d=80.0, seed=0):
    cams = make_rig(img=image_size)
    os.makedirs(os.path.join(root, "initial_guess", "cameras"), exist_ok=True)

    # camera-parameters.json in the H36M schema (dataset_readers.py:242-267)
    params = {"intrinsics": {}, "extrinsics": {}}
    for name, (K, R, t) in zip(H36M_CAMERAS, cams):
        params["intrinsics"][name] = {
            "calibration_matrix": K.reshape(-1).tolist()}
    if image_size != 1000:
        # synthetic-size override honored by cameras_io.get_h36m_camera
        params["image_sizes"] = {name: [image_size, image_size]
                                 for name in H36M_CAMERAS}
    for s in subjects:
        params["extrinsics"][s] = {}
        for name, (K, R, t) in zip(H36M_CAMERAS, cams):
            params["extrinsics"][s][name] = {
                "R": R.tolist(), "t": t.reshape(3, 1).tolist()}
    with open(os.path.join(root, "initial_guess", "cameras",
                           "camera-parameters.json"), "w") as f:
        json.dump(params, f)

    rng = np.random.default_rng(seed)
    for si, subject in enumerate(subjects):
        for ai, activity in enumerate(ACTIVITIES):
            gt = make_motion(frames, seed=seed + 31 * si + 7 * ai)
            sub = gt[::1]  # full-rate GT tree; loader subsamples
            d3 = os.path.join(root, "3d_gt", subject, activity)
            os.makedirs(d3, exist_ok=True)
            np.savez(os.path.join(d3, "poses.npz"), poses=sub)

            # initial guess at the loader's frame_step cadence
            init = gt[::frame_step] + rng.normal(
                0, noise_3d, gt[::frame_step].shape)
            dig = os.path.join(root, "initial_guess", detector, subject,
                               activity)
            os.makedirs(dig, exist_ok=True)
            np.savez(os.path.join(dig, "poses.npz"), poses=init)

            # per-camera 2D detections (subsampled like the guesses)
            for name, (K, R, t) in zip(H36M_CAMERAS, cams):
                p2 = np.stack([project(K, R, t, f) for f in gt[::frame_step]])
                p2 = p2 + rng.normal(0, noise_2d, p2.shape)
                d2 = os.path.join(root, "2d_" + detector, subject, activity,
                                  name)
                os.makedirs(d2, exist_ok=True)
                np.savez(os.path.join(d2, "poses.npz"), poses=p2)
    n_scenes = len(subjects) * len(ACTIVITIES) * len(range(0, frames,
                                                           frame_step))
    return n_scenes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--subjects", nargs="+", default=["S9", "S11"])
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--frame-step", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=1000)
    ap.add_argument("--detector", default="metrabs")
    args = ap.parse_args(argv)
    n = write_tree(args.root, args.subjects, args.frames, args.frame_step,
                   args.image_size, args.detector)
    print(f"Wrote synthetic h36m-style dataset with {n} scenes to {args.root}")


if __name__ == "__main__":
    main()
