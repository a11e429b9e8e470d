#!/usr/bin/env python
"""Per-scene skeletal-Gaussian optimization — CLI entry point.

Usage (same public interface as the reference train.py:307-341):

    python train.py --config-name h36m.yaml [group.key=value ...]

e.g. ``python train.py --config-name h36m.yaml dataset.end_scene_id=10``.
Outputs go to the hydra-style run dir ``experiments/<ds>/<date>/<time>``.
"""

import argparse
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="config",
                        help="config YAML under skelsplat_tpu/config/configs "
                             "(or a path)")
    parser.add_argument("--config-path", default=None,
                        help="alternative config directory")
    parser.add_argument("overrides", nargs="*",
                        help="hydra-style group.key=value overrides")
    args = parser.parse_args(argv)

    from skelsplat_tpu.config import ConfigHandler, load_config
    from skelsplat_tpu.data.loader import DataLoader
    from skelsplat_tpu.engine import driver
    from skelsplat_tpu.utils import safe_state

    cfg = load_config(args.config_name, args.overrides,
                      config_dir=args.config_path)
    config = ConfigHandler(cfg)
    output_dir = config.hydra_out

    dataset = cfg.dataset
    train = cfg.training
    debug = cfg.debug
    model = cfg.model
    opt = cfg.optimization
    pipe = cfg.pipeline

    print(output_dir)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger(__name__)

    if train.dropout:
        print("Dropping out some gt joints during training")

    initial_guess_path = os.path.join(dataset.data_root, "initial_guess",
                                      dataset.initial_guess)
    poses_2d_path = os.path.join(dataset.data_root, "2d_" + dataset.poses_2d)

    dataset_loader = DataLoader(
        dataset.data_root, initial_guess_path, poses_2d_path,
        frame_step=dataset.frame_step, start_id=dataset.start_scene_id,
        end_id=dataset.end_scene_id, nviews=dataset.nviews)

    safe_state(train.quiet)
    driver.training(dataset, model, opt, pipe, debug, train, dataset_loader,
                    output_dir, log)


if __name__ == "__main__":
    main()
