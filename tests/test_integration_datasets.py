"""Train→eval integration for the Panoptic and Occlusion-Person dataset
families (19/15 joints, filtered-npz convention, per-activity calibration,
odd-camera selection)."""

import os

import numpy as np
import pytest
import yaml

from skelsplat_tpu.tools import make_synthetic_dataset as synth


def _run_cfg(tmp_path_factory, name, data_root, iters=80):
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR
    with open(os.path.join(DEFAULT_CONFIG_DIR, f"{name}.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["data_root"] = data_root
    cfg["dataset"]["end_scene_id"] = 3
    cfg["optimization"]["iterations"] = iters
    cfg["debug"]["save_iterations"] = [iters]
    cfg["debug"]["save_images"] = False
    exp = tmp_path_factory.mktemp(f"exp-{name}")
    cfg["hydra"]["run"]["dir"] = str(exp / "run")
    path = str(exp / f"{name}-synth.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, str(exp / "run")


def test_panoptic_pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("d") / "synth-panoptic")
    synth.write_panoptic_tree(root, frames=3, image_size=128)
    cfg_path, run_dir = _run_cfg(tmp_path_factory, "panoptic", root)

    import train as train_cli
    train_cli.main(["--config-name", cfg_path])
    plys = os.listdir(os.path.join(run_dir, "point_cloud", "iteration_80"))
    assert len(plys) == 3
    assert all(p.startswith("S0_171204_pose5_") for p in plys)

    from skelsplat_tpu.evaluation import evaluate
    res = evaluate(os.path.join(root, "3d_gt"), run_dir, [80], 0, 3,
                   nviews=4, print_fn=lambda *a: None)
    assert np.isfinite(res[80]["absolute"])
    assert np.isfinite(res[80]["relative"])

    # improvement over the noisy initial guess
    from skelsplat_tpu.data import ply as plyio
    from skelsplat_tpu.data.loader import DataLoader
    loader = DataLoader(root,
                        os.path.join(root, "initial_guess", "triang_metrabs"),
                        os.path.join(root, "2d_metrabs"), frame_step=1,
                        start_id=0, end_id=3, nviews=4)
    e0, e1 = [], []
    for sid, rec in loader:
        pred = plyio.read_xyz(os.path.join(
            run_dir, "point_cloud", "iteration_80", f"{rec.scene_name}.ply"))
        e0.append(np.linalg.norm(rec.pose_3d - rec.pose_3d_gt, axis=1).mean())
        e1.append(np.linalg.norm(pred - rec.pose_3d_gt, axis=1).mean())
    assert np.mean(e1) < np.mean(e0)


def test_occlusion_person_pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("d") / "synth-occlusion-person")
    synth.write_occlusion_person_tree(root, frames=3, image_size=128)
    cfg_path, run_dir = _run_cfg(tmp_path_factory, "occlusion-person", root)

    import train as train_cli
    train_cli.main(["--config-name", cfg_path])
    plys = os.listdir(os.path.join(run_dir, "point_cloud", "iteration_80"))
    assert len(plys) == 3

    from skelsplat_tpu.evaluation import evaluate
    res = evaluate(os.path.join(root, "3d_gt"), run_dir, [80], 0, 3,
                   print_fn=lambda *a: None)
    assert np.isfinite(res[80]["absolute"])

    from skelsplat_tpu.data import ply as plyio
    from skelsplat_tpu.data.loader import DataLoader
    loader = DataLoader(root,
                        os.path.join(root, "initial_guess", "triang_resnet"),
                        os.path.join(root, "2d_resnet"), frame_step=1,
                        start_id=0, end_id=3, nviews=4)
    e0, e1 = [], []
    for sid, rec in loader:
        pred = plyio.read_xyz(os.path.join(
            run_dir, "point_cloud", "iteration_80", f"{rec.scene_name}.ply"))
        e0.append(np.linalg.norm(rec.pose_3d - rec.pose_3d_gt, axis=1).mean())
        e1.append(np.linalg.norm(pred - rec.pose_3d_gt, axis=1).mean())
    assert np.mean(e1) < np.mean(e0)
