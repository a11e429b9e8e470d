"""MPJPE evaluation over saved result clouds — port of eval.py.

Reads ``<output>/point_cloud/iteration_{it}/{scene}.ply`` clouds and the
dataset's 3D GT npz tree, computes absolute and root-relative MPJPE and, for
H36M, the per-activity breakdown over the 15 ordered activities
(eval.py:91-171). Protocol quirks preserved: S9 {SittingDown 1, Waiting 1,
Greeting} excluded from absolute MPJPE (eval.py:29,62), the CPN variant's
S11/Directions exclusion + zero-padding (eval.py:10-20,64-66), and the
frame_step-64 GT subsampling.
"""

from __future__ import annotations

import os

import numpy as np

from skelsplat_tpu.data import ply

H36M_ACTIVITIES = (
    "Directions Discussion Eating Greeting Phoning Posing Purchases "
    "Sitting SittingDown Smoking Photo Waiting Walking WalkDog WalkTogether"
).split()

S9_BAD = ["SittingDown 1", "Waiting 1", "Greeting"]


def align_pred_cpn(pred_coords, gt_coords, image_relpaths):
    """eval.py:10-20: zero-pad predictions at the S11/Directions gap."""
    start_poses = 0
    count = 0
    for i, path in enumerate(image_relpaths):
        if "S11" in path and "Directions." in path:
            start_poses = i
            count += 1
    insert = np.zeros((count, 17, 3))
    return np.vstack((pred_coords[:start_poses], insert,
                      pred_coords[start_poses:]))


def _bulk_read(paths):
    """Threaded native PLY sweep with Python fallback — the eval bottleneck
    when sweeping thousands of per-scene clouds."""
    from skelsplat_tpu import native

    out, counts = native.read_xyz_batch(paths, max_pts=64)
    n = counts[0]
    if not np.all(counts == n):
        # mixed sizes or native parse errors: per-file fallback
        return np.array([ply.read_xyz(p) for p in paths])
    return np.ascontiguousarray(out[:, :n, :])


def get_pred_coords_h36m(ply_dir, sorted_entries, absolute=False, cpn=False):
    """eval.py:22-39."""
    activities, paths = [], []
    for subject, activity, frame in sorted_entries:
        if absolute and subject == "S9" and activity in S9_BAD:
            continue
        paths.append(f"{ply_dir}/{subject}_{activity}_{frame}")
        activities.append(activity.split(" ")[0])
    return _bulk_read(paths), np.array(activities)


def get_pred_coords(ply_dir, sorted_entries, absolute=False):
    """eval.py:41-52."""
    return _bulk_read([f"{ply_dir}/{subject}_{activity}_{frame}"
                       for subject, activity, frame in sorted_entries])


def get_gt_poses_h36m(gt_path, absolute=False, cpn=False, frame_step=64):
    """eval.py:55-71."""
    gt_poses = []
    for subject in sorted(os.listdir(gt_path)):
        if not subject.startswith("S"):
            continue
        for activity in sorted(os.listdir(f"{gt_path}/{subject}")):
            if absolute and subject == "S9" and activity in S9_BAD:
                continue
            if cpn and subject == "S11" and activity == "Directions":
                continue
            gt_3d = np.load(f"{gt_path}/{subject}/{activity}/poses.npz")["poses"]
            gt_poses.append(gt_3d[::frame_step])
    return np.concatenate(gt_poses, axis=0)


def get_gt_poses(gt_path, absolute=False, dataset="panoptic", frame_step=1,
                 nviews=4):
    """eval.py:74-89."""
    gt_poses = []
    for subject in sorted(os.listdir(gt_path)):
        if not subject.startswith("S"):
            continue
        for activity in sorted(os.listdir(f"{gt_path}/{subject}")):
            if dataset == "panoptic":
                gt_3d = np.load(
                    f"{gt_path}/{subject}/{activity}/poses_filtered_{nviews}.npz",
                    allow_pickle=True)["poses"]
            else:
                gt_3d = np.load(f"{gt_path}/{subject}/{activity}/poses.npz",
                                allow_pickle=True)["poses3d"]
            gt_poses.append(gt_3d[::frame_step])
    return np.concatenate(gt_poses, axis=0)


def _entries(ply_dir, gt_path):
    """eval.py:96-106: parse {subject}_{activity}_{frame} ply names."""
    entries = os.listdir(ply_dir)
    if "panoptic" in gt_path:
        name_parts = [[e.split("_")[0], e.split("_")[1] + "_" + e.split("_")[2],
                       e.split("_")[-1]] for e in entries]
    elif "occlusion-person" in gt_path:
        name_parts = [[e.split("_")[0], e.split("_")[1], e.split("_")[-1]]
                      for e in entries]
    else:
        name_parts = [e.split("_") for e in entries]
    return sorted(name_parts)


def evaluate(gt_path, output_path, iterations, start_id, end_id, cpn=False,
             nviews=4, print_fn=print):
    """eval.py:91-171. Returns {iteration: {absolute, relative,
    per_activity_abs, per_activity_rel}} for programmatic use (the reference
    only prints)."""
    results = {}
    for it in iterations:
        print_fn(f"Results for {it} iterations \n")
        ply_dir = f"{output_path}/point_cloud/iteration_{it}"
        sorted_entries = _entries(ply_dir, gt_path)
        res = {}

        if "h36m" in gt_path:
            # absolute
            gt_coords = get_gt_poses_h36m(gt_path, True, cpn, frame_step=64)
            pred_coords, activities = get_pred_coords_h36m(
                ply_dir, sorted_entries, True, cpn)
            e_id = min(end_id, pred_coords.shape[0]) if end_id else pred_coords.shape[0]
            print_fn(f"Evaluating scenes from {start_id} to {e_id}")
            abs_error = np.linalg.norm(
                gt_coords[start_id:e_id] - pred_coords[start_id:e_id], axis=-1)
            res["absolute"] = float(np.mean(abs_error))
            print_fn(f"Absolute MPJPE:  {np.round(res['absolute'], 2)}")
            act = activities[start_id:e_id]
            res["per_activity_abs"] = {
                a: float(np.mean(abs_error[act == a]))
                for a in H36M_ACTIVITIES}
            print_fn(str(np.round([res["per_activity_abs"][a]
                                   for a in H36M_ACTIVITIES], 2)))
            # relative
            gt_coords = get_gt_poses_h36m(gt_path, False, cpn, frame_step=64)
            pred_coords, activities = get_pred_coords_h36m(
                ply_dir, sorted_entries, False, cpn)
            gt_coords = gt_coords - gt_coords[:, 0, None]
            pred_coords = pred_coords - pred_coords[:, 0, None]
            e_id = min(end_id, pred_coords.shape[0]) if end_id else pred_coords.shape[0]
            rel_error = np.linalg.norm(
                gt_coords[start_id:e_id] - pred_coords[start_id:e_id], axis=-1)
            res["relative"] = float(np.mean(rel_error))
            print_fn(f"Relative MPJPE:  {np.round(res['relative'], 2)}")
            act = activities[start_id:e_id]
            res["per_activity_rel"] = {
                a: float(np.mean(rel_error[act == a]))
                for a in H36M_ACTIVITIES}
            print_fn(str(np.round([res["per_activity_rel"][a]
                                   for a in H36M_ACTIVITIES], 2)))
        else:
            dataset = "panoptic" if "panoptic" in gt_path else "occlusion-person"
            gt_coords = get_gt_poses(gt_path, True, dataset, frame_step=1,
                                     nviews=nviews)
            pred_coords = get_pred_coords(ply_dir, sorted_entries, True)
            e_id = min(end_id, pred_coords.shape[0]) if end_id and end_id > 0 \
                else pred_coords.shape[0]
            print_fn(f"Evaluating scenes from {start_id} to {e_id}")
            abs_error = np.linalg.norm(
                gt_coords[start_id:e_id] - pred_coords[start_id:e_id], axis=-1)
            res["absolute"] = float(np.mean(abs_error))
            print_fn(f"Absolute MPJPE:  {np.round(res['absolute'], 2)}")
            gt_rel = gt_coords - gt_coords[:, 0, None]
            pred_rel = pred_coords - pred_coords[:, 0, None]
            rel_error = np.linalg.norm(
                gt_rel[start_id:e_id] - pred_rel[start_id:e_id], axis=-1)
            res["relative"] = float(np.mean(rel_error))
            print_fn(f"Relative MPJPE:  {np.round(res['relative'], 2)}")
        results[it] = res
    return results


def image_metrics(loader, output_path, scaling=3.0, scaling_modifier=1.0,
                  lpips_net="vgg", lpips_weights=None, print_fn=print):
    """Image-space eval extras: per-view SSIM (fused-SSIM) and, when
    pretrained weights are available, LPIPS between each scene's rendered
    optimized splats and its GT heatmaps.

    The eval counterpart of the reference's fused-ssim / lpipsPyTorch
    submodules (BASELINE "fused-SSIM + LPIPS losses" extras; neither is
    wired into the reference's entry points). GT heatmaps follow the
    training parity rules (initial-covariance spec, train.py:91-92), so
    SSIM/LPIPS measure how well the optimized splats reproduce the
    detection-derived targets. For LPIPS the C-channel maps are
    channel-summed, min-max normalized, replicated to RGB and scaled to
    [-1, 1] (LPIPS's input convention).

    Returns {"ssim": mean, "lpips": mean | None, "per_scene": {...}}.
    """
    import jax
    import jax.numpy as jnp

    from skelsplat_tpu.data import cameras_io
    from skelsplat_tpu.engine.trainer import init_params_jnp
    from skelsplat_tpu.core.gaussians import GaussianParams, scene_type_of
    from skelsplat_tpu.ops import heatmaps as hm_ops
    from skelsplat_tpu.ops import lpips as lpips_ops
    from skelsplat_tpu.ops import rasterizer
    from skelsplat_tpu.ops.ssim import fused_ssim
    from skelsplat_tpu.tools.analyze_confidence import _scene_plys

    plys = _scene_plys(output_path)
    if lpips_weights is None:
        lpips_weights = lpips_ops.default_weights_path(lpips_net)
    lpips_model = (lpips_ops.LPIPS.from_npz(lpips_weights)
                   if lpips_weights else None)
    if lpips_model is None:
        print_fn("LPIPS weights not available "
                 "(tools/fetch_lpips_weights.py) — reporting SSIM only")

    scene_type = scene_type_of(loader.data_root)
    per_scene, ssims, lpipss = {}, [], []
    for _, rec in loader:
        path = plys.get(rec.scene_name)
        if path is None:
            continue
        g = ply.read_gaussian_ply(path)
        params = GaussianParams(
            jnp.asarray(g["xyz"], jnp.float32),
            jnp.asarray(g["log_scales"], jnp.float32),
            jnp.asarray(g["quats"], jnp.float32),
            jnp.asarray(g["opacity_logit"], jnp.float32))
        cams = cameras_io.build_camera_batch(rec.cameras)
        W = int(np.asarray(cams.width).max())
        H = int(np.asarray(cams.height).max())
        camsj = jax.tree.map(jnp.asarray, cams)

        # GT heatmaps from the INITIAL covariance (train.py:91-92 parity)
        p0 = init_params_jnp(jnp.asarray(rec.pose_3d, jnp.float32),
                             scene_type, scaling, scaling_modifier)
        spec = hm_ops.heatmap_spec(
            p0.xyz, p0.covariance(),
            jnp.asarray(np.asarray(rec.poses_2d, np.float32)[..., :2]),
            camsj, W, H)
        gt_hm = hm_ops.eval_heatmaps(spec, W, H)          # (V,C,H,W)

        def render_view(cam):
            return rasterizer.render(params, cam, W, H)["render"]
        renders = jax.vmap(render_view)(camsj)            # (V,C,H,W)

        s = float(np.mean([float(fused_ssim(renders[v], gt_hm[v]))
                           for v in range(renders.shape[0])]))
        entry = {"ssim": s}
        ssims.append(s)
        if lpips_model is not None:
            def to_rgb(x):                                # (C,H,W)→(3,H,W)
                im = jnp.sum(x, axis=0)
                lo, hi = jnp.min(im), jnp.max(im)
                im = (im - lo) / jnp.where(hi > lo, hi - lo, 1.0)
                return jnp.broadcast_to(im[None], (3,) + im.shape) * 2 - 1
            a = jnp.stack([to_rgb(renders[v])
                           for v in range(renders.shape[0])])
            b = jnp.stack([to_rgb(gt_hm[v])
                           for v in range(gt_hm.shape[0])])
            d = float(jnp.mean(lpips_model(a, b)))
            entry["lpips"] = d
            lpipss.append(d)
        per_scene[rec.scene_name] = entry

    out = {"ssim": float(np.mean(ssims)) if ssims else float("nan"),
           "lpips": float(np.mean(lpipss)) if lpipss else None,
           "per_scene": per_scene}
    print_fn(f"SSIM (render vs GT heatmaps): {out['ssim']:.4f}")
    if out["lpips"] is not None:
        print_fn(f"LPIPS ({lpips_net}): {out['lpips']:.4f}")
    return out
