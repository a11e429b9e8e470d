#!/usr/bin/env python
"""Render saved per-scene result clouds to PNG heatmap images.

    python render.py --config-name h36m.yaml eval.output_path=<run dir> \
        [render.iteration=500] [render.max_scenes=4]

The reference's render.py is inherited from upstream 3DGS and broken (it
imports a non-existent ``gaussian_renderer.render`` and the argparse params,
render.py:17,21). This is the working equivalent for the SkelSplat pipeline:
it loads iteration_{it} PLYs, re-renders every camera view and writes
channel-summed PNGs under ``<run>/renders/``.
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--config-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from skelsplat_tpu.config import (latest_run_dir, load_config,
                                      parse_overrides)
    from skelsplat_tpu.core.gaussians import GaussianParams
    from skelsplat_tpu.data import cameras_io, ply
    from skelsplat_tpu.data.loader import DataLoader
    from skelsplat_tpu.ops import rasterizer

    ovr = parse_overrides(args.overrides)
    output_path = ovr.pop("eval.output_path", None)
    iteration = int(ovr.pop("render.iteration", 500))
    max_scenes = int(ovr.pop("render.max_scenes", 4))
    remaining = [o for o in args.overrides if "=" in o and
                 o.split("=")[0] not in ("eval.output_path",
                                         "render.iteration",
                                         "render.max_scenes")]

    cfg = load_config(args.config_name, remaining,
                      config_dir=args.config_path, make_run_dir=False)
    dataset = cfg.dataset
    if output_path is None:
        output_path = latest_run_dir(cfg)

    loader = DataLoader(
        dataset.data_root,
        os.path.join(dataset.data_root, "initial_guess",
                     dataset.initial_guess),
        os.path.join(dataset.data_root, "2d_" + dataset.poses_2d),
        frame_step=dataset.frame_step, start_id=dataset.start_scene_id,
        end_id=dataset.end_scene_id, nviews=dataset.nviews)

    ply_dir = os.path.join(output_path, "point_cloud",
                           f"iteration_{iteration}")
    out_dir = os.path.join(output_path, "renders")
    os.makedirs(out_dir, exist_ok=True)

    count = 0
    for scene_id, rec in loader:
        if count >= max_scenes:
            break
        path = os.path.join(ply_dir, f"{rec.scene_name}.ply")
        if not os.path.exists(path):
            continue
        g = ply.read_gaussian_ply(path)
        params = GaussianParams(
            xyz=jnp.asarray(g["xyz"]),
            log_scales=jnp.asarray(g["log_scales"]),
            quats=jnp.asarray(g["quats"]),
            opacity_logit=jnp.asarray(g["opacity_logit"]))
        cams = cameras_io.build_camera_batch(rec.cameras)
        W = int(np.asarray(cams.width).max())
        H = int(np.asarray(cams.height).max())
        camsj = jax.tree.map(jnp.asarray, cams)
        for v in range(len(rec.cameras)):
            cam = jax.tree.map(lambda x: x[v], camsj)
            out = rasterizer.render(params, cam, W, H)
            im = np.asarray(out["render"]).sum(axis=0)
            rng = im.max() - im.min()
            im = (im - im.min()) / (rng if rng > 0 else 1.0)
            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{rec.scene_name}_cam{v}.png"))
        count += 1
    print(f"Rendered {count} scenes to {out_dir}")


if __name__ == "__main__":
    main()
