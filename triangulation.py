#!/usr/bin/env python
"""DLT triangulation of 2D detections → iteration_0 initial-guess clouds.

    python triangulation.py --config-name triangulation.yaml [overrides ...]

Port of the reference triangulation.py:203-226.
"""

import argparse
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--config-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from skelsplat_tpu.config import TriangulationConfigHandler, load_config
    from skelsplat_tpu.data.loader import DataLoader
    from skelsplat_tpu.triangulate import run_triangulation

    cfg = load_config(args.config_name, args.overrides,
                      config_dir=args.config_path)
    config = TriangulationConfigHandler(cfg)
    output_dir = config.hydra_out
    dataset = cfg.dataset

    print(output_dir)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger(__name__)

    initial_guess_path = os.path.join(dataset.data_root, "initial_guess",
                                      dataset.initial_guess)
    poses_2d_path = os.path.join(dataset.data_root, "2d_" + dataset.poses_2d)

    dataset_loader = DataLoader(
        dataset.data_root, initial_guess_path, poses_2d_path,
        frame_step=dataset.frame_step, start_id=dataset.start_scene_id,
        end_id=dataset.end_scene_id, nviews=dataset.nviews)

    run_triangulation(dataset, dataset_loader, output_dir, log)


if __name__ == "__main__":
    main()
