#!/usr/bin/env python
"""Cross-renderer parity study: dense oracle vs XLA fused vs Pallas kernel.

BASELINE.md's north star is MPJPE parity with the reference. Without a CUDA
machine in the environment, the strongest in-env evidence is agreement
between INDEPENDENT implementations of the same math run through the full
optimization: the dense autodiff oracle (rasterizer.py — literal
forward-semantics transcription of forward.cu, gradients by jax autodiff),
the XLA streaming path (fused.py) and the hand-derived Pallas kernel
(pallas_raster.py, optionally windowed). Each renderer optimizes the same
synthetic H36M-scale scenes (1002×1000, 4 views, 500 iterations, stock
budgets); the resulting PLY trees are then compared pairwise with
tools/ab_harness (exercising it end-to-end, BASELINE stand-in until a
reference CUDA run exists).

    python -m skelsplat_tpu.tools.parity_study [--scenes 3] [--out DIR]
        [--renderers dense fused pallas pallas-windowed] [--iterations 500]

Prints per-pair max/mean pose disagreement (mm) and MPJPE deltas — the
PERF.md "cross-renderer MPJPE agreement" row.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=500)
    ap.add_argument("--preset", default="h36m",
                    choices=["h36m", "panoptic", "op"],
                    help="dataset scale (image size / joint count / "
                         "skeleton), same table as bench.py")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default="/tmp/skelsplat-parity")
    ap.add_argument("--renderers", nargs="+",
                    default=["dense", "fused", "pallas", "pallas-windowed"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from __graft_entry__ import _synthetic_inputs
    from skelsplat_tpu.core.gaussians import SkeletonModel
    from skelsplat_tpu.data import ply
    from skelsplat_tpu.engine.optim import OptConfig
    from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings
    from skelsplat_tpu.tools import ab_harness

    presets = {"h36m": (1002, 1000, 17, "h36m"),
               "panoptic": (1920, 1080, 19, "panoptic"),
               "op": (1280, 720, 15, "occlusion-person")}
    W, H, n_joints, scene_type = presets[args.preset]
    W = args.width or W
    H = args.height or H
    K = args.scenes
    init, gt, p2d, cams_b = _synthetic_inputs(K, W, H, n_joints=n_joints)
    model = SkeletonModel(scene_type, n_joints, scaling=3.0)
    opt = OptConfig(iterations=args.iterations)

    # GT npz tree for ab_harness's MPJPE columns (scene s ↔ frame id s)
    gt_root = os.path.join(args.out, "3d_gt")
    os.makedirs(os.path.join(gt_root, "S1", "Synth"), exist_ok=True)
    np.savez(os.path.join(gt_root, "S1", "Synth", "poses.npz"), poses=gt)
    names = [f"S1_Synth_{s:06d}" for s in range(K)]

    results = {}
    for r in args.renderers:
        renderer = "pallas" if r == "pallas-windowed" else r
        if r == "pallas-windowed":
            os.environ["SKELSPLAT_PALLAS_WINDOW"] = "auto"
        elif renderer == "pallas":
            os.environ["SKELSPLAT_PALLAS_WINDOW"] = "off"
        tr = SceneTrainer(model, opt, TrainSettings(), W, H,
                          renderer=renderer)
        if r == "pallas-windowed" and tr._pallas_win is None:
            print(f"[{r}] window covers frame — same as pallas, skipping")
            continue
        d = os.path.join(args.out, r, "point_cloud",
                         f"iteration_{args.iterations}")
        os.makedirs(d, exist_ok=True)
        errs, t0 = [], time.perf_counter()
        for s in range(K):
            params, hist = tr.optimize_scene(init[s], p2d[s], cams_b, gt[s])
            xyz = np.asarray(params.xyz)
            errs.append(float(np.linalg.norm(xyz - gt[s], axis=1).mean()))
            ply.write_gaussian_ply(
                os.path.join(d, names[s] + ".ply"), xyz,
                np.asarray(params.log_scales), np.asarray(params.quats),
                np.asarray(params.opacity_logit))
        dt = time.perf_counter() - t0
        results[r] = {"mpjpe_mm": errs, "seconds": dt}
        print(f"[{r}] MPJPE {np.mean(errs):.4f} mm "
              f"(per-scene {['%.4f' % e for e in errs]}), {dt:.1f}s total")

    ran = [r for r in args.renderers if r in results]
    pair_rows = {}
    for i in range(len(ran)):
        for j in range(i + 1, len(ran)):
            a, b = ran[i], ran[j]
            print(f"\n=== ab_harness: {a} vs {b} ===")
            out = ab_harness.compare(
                os.path.join(args.out, a), os.path.join(args.out, b),
                gt_root, args.iterations)
            dis = [r_["pose_disagreement_mm"] for r_ in out["scenes"]]
            pair_rows[f"{a}_vs_{b}"] = {
                "max_disagreement_mm": max(dis),
                "mean_disagreement_mm": float(np.mean(dis)),
            }
    print("\nsummary:", json.dumps(pair_rows, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"renderers": results, "pairs": pair_rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
