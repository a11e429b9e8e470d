#!/usr/bin/env python
"""Filter Panoptic samples to those valid in ALL selected views
(port of dataset_tools/panoptic/filter_preds_number_views.py). Writes
``poses_filtered_{nviews}.npz`` next to each source npz; GT gets ×10 (cm)."""

import argparse
import os
import sys

import numpy as np

from skelsplat_tpu.data.cameras_io import PANOPTIC_CAMERAS


def load_npz(file, key):
    with np.load(file, allow_pickle=True) as npz:
        if key not in npz:
            raise KeyError(f"Key '{key}' not found in {os.path.basename(file)}")
        return npz[key]


def compute_valid_mask_across_views(view_arrays):
    """True iff the sample exists (not None) and is NaN-free in every view."""
    if not view_arrays:
        raise ValueError("No view arrays provided.")
    lengths = [arr.shape[0] for arr in view_arrays]
    if len(set(lengths)) != 1:
        raise ValueError(f"Inconsistent sample counts: {lengths}")
    valid = np.ones(lengths[0], dtype=bool)
    for arr in view_arrays:
        if arr.dtype == object:
            mask = np.array([(x is not None) and (not np.any(np.isnan(x)))
                             for x in arr], dtype=bool)
        else:
            mask = ~np.isnan(arr).any(axis=tuple(range(1, arr.ndim)))
        valid &= mask
    return valid


def save_filtered(src_file, dst_file, indices, key):
    data = load_npz(src_file, key)
    filtered = np.asarray(data[indices], dtype=np.float64)
    if "gt" in dst_file:
        filtered = filtered * 10  # convert to cm (reference :72-74)
    os.makedirs(os.path.dirname(dst_file), exist_ok=True)
    np.savez(dst_file, poses=filtered)
    return filtered.shape


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", default="data/panoptic")
    parser.add_argument("--activities", nargs="+",
                        default=["171204_pose5", "171204_pose6"])
    parser.add_argument("--nviews", type=int, default=4)
    parser.add_argument("--cameras", nargs="*", default=PANOPTIC_CAMERAS)
    parser.add_argument("--preds3d_name", default="3d_metrabs_mono")
    parser.add_argument("--preds2d_name", default="2d_metrabs")
    parser.add_argument("--gt2d_name", default="2d_gt")
    parser.add_argument("--gt3d_name", default="3d_gt")
    args = parser.parse_args(argv)

    camera_names = args.cameras[: args.nviews]
    nv = len(camera_names)
    for activity in args.activities:
        files = [os.path.join(args.data_path, args.preds3d_name, "S0",
                              activity, cam, "poses.npz")
                 for cam in camera_names]
        try:
            preds_views = [load_npz(f, "poses") for f in files]
        except (FileNotFoundError, KeyError) as e:
            print(f"[ERROR] {e}", file=sys.stderr)
            continue
        valid = np.nonzero(compute_valid_mask_across_views(preds_views))[0]
        print(f"{activity}: {len(valid)} / {preds_views[0].shape[0]} valid")
        if len(valid) == 0:
            continue
        for cam in camera_names:
            for name in (args.preds3d_name, args.preds2d_name,
                         args.gt2d_name):
                d = os.path.join(args.data_path, name, "S0", activity, cam)
                try:
                    save_filtered(os.path.join(d, "poses.npz"),
                                  os.path.join(d, f"poses_filtered_{nv}.npz"),
                                  valid, "poses")
                except (FileNotFoundError, KeyError) as e:
                    print(f"[ERROR] {e}", file=sys.stderr)
        d = os.path.join(args.data_path, args.gt3d_name, "S0", activity)
        try:
            save_filtered(os.path.join(d, "poses.npz"),
                          os.path.join(d, f"poses_filtered_{nv}.npz"),
                          valid, "poses")
        except (FileNotFoundError, KeyError) as e:
            print(f"[ERROR] {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
