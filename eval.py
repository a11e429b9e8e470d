#!/usr/bin/env python
"""MPJPE evaluation over saved result clouds — CLI entry point.

    python eval.py --config-name h36m.yaml \
        [eval.output_path=experiments/h36m/<date>/<time>] [overrides ...]

Mirrors the reference eval.py:175-197, with one practical extension: the
reference evaluates the CURRENT hydra run dir (which is freshly timestamped,
so in practice one re-ran eval inside the training dir); here
``eval.output_path=<run dir>`` points at any past run. Without it the newest
run dir for the dataset is used.
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="configs")
    parser.add_argument("--config-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from skelsplat_tpu.config import (latest_run_dir, load_config,
                                      parse_overrides)
    from skelsplat_tpu.evaluation import evaluate

    ovr = parse_overrides(args.overrides)
    output_path = ovr.pop("eval.output_path", None)
    # additive eval extras: eval.image_metrics=true renders each scene's
    # optimized splats and reports SSIM (+LPIPS when weights are shipped)
    # against the GT heatmaps — the fused-ssim / lpipsPyTorch surface
    image_metrics_on = str(ovr.pop("eval.image_metrics", "false")
                           ).lower() in ("1", "true", "yes")
    lpips_weights = ovr.pop("eval.lpips_weights", None)
    lpips_net = ovr.pop("eval.lpips_net", "vgg")
    remaining = [o for o in args.overrides
                 if not o.split("=", 1)[0] in (
                     "eval.output_path", "eval.image_metrics",
                     "eval.lpips_weights", "eval.lpips_net")]

    cfg = load_config(args.config_name, remaining,
                      config_dir=args.config_path, make_run_dir=False)
    dataset = cfg.dataset
    debug = cfg.debug

    if output_path is None:
        output_path = latest_run_dir(cfg)
    print("Evaluating ", output_path)

    gt_path = os.path.join(dataset.data_root, "3d_gt")
    iterations = list(debug.save_iterations)
    evaluate(gt_path, output_path, iterations, dataset.start_scene_id,
             dataset.end_scene_id, dataset.poses_2d == "cpn",
             nviews=dataset.nviews)

    if image_metrics_on:
        from skelsplat_tpu.data.loader import DataLoader
        from skelsplat_tpu.evaluation import image_metrics

        loader = DataLoader(
            dataset.data_root,
            os.path.join(dataset.data_root, "initial_guess",
                         dataset.initial_guess),
            os.path.join(dataset.data_root, "2d_" + dataset.poses_2d),
            frame_step=dataset.frame_step, start_id=dataset.start_scene_id,
            end_id=dataset.end_scene_id, nviews=dataset.nviews)
        image_metrics(loader, output_path,
                      scaling=float(cfg.model.scaling),
                      scaling_modifier=float(cfg.model.scaling_modifier),
                      lpips_net=lpips_net, lpips_weights=lpips_weights)


if __name__ == "__main__":
    main()
