"""Full-budget END-METRIC parity — the north-star 0.5 mm assertion.

BASELINE.json's north star demands "MPJPE within 0.5 mm of the reference".
tests/test_reference_train_loop.py proves per-iteration bitwise-level parity
but legitimately stops at 24 iterations (roundoff-seeded chaos separates ANY
two correct implementations beyond that). Converged END metrics must not
drift though: two correct optimizers of the same loss over the same GT
heatmaps land on the same optimum. This test runs BOTH pipelines to the
FULL production budget (500 iterations, configs/*.yaml `iterations`,
reference train.py:130) on synthetic scenes per dataset family, saves PLYs
both ways through each side's own save path, pushes both result trees
through the repo's eval path (evaluation.evaluate == eval.py:91-171) and
asserts the final MPJPE gap is inside the 0.5 mm tolerance.

Pipelines under test, end to end:
 - repo:      train.py CLI (production driver: DataLoader -> SceneTrainer ->
              PLY tree) with the stock per-dataset YAML at its full budget.
 - reference: its ACTUAL training() (train.py:56-244) on CPU torch with the
              CUDA rasterizers shimmed to the repo's dense oracle renderer
              (the machinery of tests/test_reference_train_loop.py), fed the
              SAME DataLoader records and calibration, with hyperparameters
              read from the SAME YAML file.

Measured gaps are printed per family (run with -s). Observed: h36m
0.00062 mm abs, panoptic 0.00010 mm abs, occlusion-person 0.242 mm abs /
0.403 mm rel (the dropout-noised loss surface is flatter, so the two
optimizers' roundoff-divergent trajectories land measurably further apart
— still inside the tolerance, and the largest gap anywhere).

Runtime: ~2-4 min per family on CPU (the reference loop's torch<->numpy
round-trips dominate; the budget is the point — do not shrink it).
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import yaml

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REF / "train.py").exists(),
    reason="reference checkout not available")

torch = pytest.importorskip("torch")

import jax

cpu_oracle = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="CPU-calibrated end-to-end oracle; TPU parity is covered by the "
           "golden regressions and tools/parity_study")

IMG = 128
ITERS = 500  # the FULL production budget (configs/*.yaml `iterations`)

# family -> (config yaml name, renderer registry key)
FAMILIES = {
    "h36m": ("h36m", "diff-gaussian-rasterization-h36m"),
    "panoptic": ("panoptic", "diff-gaussian-rasterization-panoptic"),
    "occlusion-person": ("occlusion-person", "diff-gaussian-rasterization-op"),
}


def _build_tree(family: str, root: str) -> int:
    """Synthetic dataset tree in the family's on-disk layout; returns the
    scene count. noise_3d=40 keeps every joint inside the heatmap loss's
    finite capture radius so both optimizers actually converge (joints that
    start outside it freeze at the shared init in BOTH pipelines — still
    parity, but then the test would not witness converged optima)."""
    from skelsplat_tpu.tools import make_synthetic_dataset as synth

    if family == "h36m":
        n = synth.write_tree(root, ["S1"], 128, 64, image_size=IMG,
                             noise_3d=40.0)
        assert n == 4
        return n
    if family == "panoptic":
        synth.write_panoptic_tree(root, activities=("171204_pose5",),
                                  frames=3, image_size=IMG, noise_3d=40.0)
        return 3
    synth.write_occlusion_person_tree(root, frames=3, image_size=IMG,
                                      noise_3d=40.0)
    return 3


def _load_cfg(family: str, data_root: str, run_dir: str, n_scenes: int,
              cfg_dir: str) -> str:
    """The family's stock YAML pointed at the synthetic tree, full budget."""
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR

    with open(os.path.join(DEFAULT_CONFIG_DIR,
                           f"{FAMILIES[family][0]}.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["data_root"] = data_root
    cfg["dataset"]["start_scene_id"] = 0
    cfg["dataset"]["end_scene_id"] = n_scenes
    cfg["optimization"]["iterations"] = ITERS
    cfg["debug"]["save_iterations"] = [ITERS]
    cfg["debug"]["save_images"] = False
    cfg["hydra"]["run"]["dir"] = run_dir
    path = os.path.join(cfg_dir, f"{family}-fullbudget.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _records(cfg: dict):
    """The production DataLoader over the synthetic tree — the SAME records
    the repo train CLI consumes (train.py:54-60)."""
    from skelsplat_tpu.data.loader import DataLoader

    ds = cfg["dataset"]
    return list(DataLoader(
        ds["data_root"],
        os.path.join(ds["data_root"], "initial_guess", ds["initial_guess"]),
        os.path.join(ds["data_root"], "2d_" + ds["poses_2d"]),
        frame_step=ds["frame_step"], start_id=ds["start_scene_id"],
        end_id=ds["end_scene_id"], nviews=ds["nviews"]))


def _ref_loader_and_cfg(cfg: dict, records):
    """The reference training() inputs from the same YAML + records:
    cfg SimpleNamespaces mirroring its hydra groups, CameraInfo namedtuples
    from the records' calibration (dataset_readers.py stored conventions —
    the loader already returns R in the readers' transposed storage)."""
    from skelsplat_tpu.core import geometry

    dsr = sys.modules["scene.dataset_readers"]
    loader = []
    for sid, rec in records:
        infos = []
        for v, ci in enumerate(rec.cameras):
            infos.append(dsr.CameraInfo(
                uid=v, R=ci.R, T=ci.T,
                FovY=geometry.focal2fov(ci.K[1, 1], ci.height),
                FovX=geometry.focal2fov(ci.K[0, 0], ci.width),
                K=ci.K, depth_params=None, image_path="",
                image_name=f"cam{v}", depth_path="",
                width=ci.width, height=ci.height, heatmap=None))
        loader.append((sid, (rec.pose_3d, rec.pose_3d_gt,
                             torch.from_numpy(
                                 np.asarray(rec.poses_2d, np.float32)),
                             infos, rec.scene_name)))

    ns = lambda d: SimpleNamespace(**d)  # noqa: E731
    dataset = ns(cfg["dataset"])
    model = ns(cfg["model"])
    model.data_device = "cpu"  # yaml says tpu; reference feeds it to torch
    opt = ns(cfg["optimization"])
    pipe = ns(cfg["pipeline"])
    debug = ns(cfg["debug"])
    training = ns(cfg["training"])
    return loader, (dataset, model, opt, pipe, debug, training)


@cpu_oracle
@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_full_budget_end_metric_parity(family, tmp_path, monkeypatch,
                                       capsys):
    # shared shim machinery (reference loader + CUDA->CPU mode). Imported
    # under the tests.* namespace; pytest may hold a second copy of the
    # module under its rootdir import name — the underlying reference
    # packages are shared through sys.modules either way.
    from tests.test_reference_train_loop import (_CudaToCpu, _DummyEvent,
                                                 _ref_train)

    root = str(tmp_path / f"synth-{family}")
    n_scenes = _build_tree(family, root)
    repo_dir = str(tmp_path / "repo_run")
    ref_dir = str(tmp_path / "ref_run")
    cfg_path = _load_cfg(family, root, repo_dir, n_scenes, str(tmp_path))
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)

    # ---------------- repo side: the production train CLI ----------------
    import train as train_cli
    train_cli.main(["--config-name", cfg_path])
    assert len(os.listdir(
        os.path.join(repo_dir, "point_cloud", f"iteration_{ITERS}"))) \
        == n_scenes

    # ---------------- reference side: its own training() -----------------
    mod = _ref_train()
    records = _records(cfg)
    assert len(records) == n_scenes
    loader, (dataset, model, opt, pipe, debug, training) = \
        _ref_loader_and_cfg(cfg, records)

    monkeypatch.setattr(torch.cuda, "Event", _DummyEvent)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    monkeypatch.setattr(torch.cuda, "empty_cache", lambda *a, **k: None)
    os.makedirs(ref_dir, exist_ok=True)
    with _CudaToCpu():
        mod.training(dataset, model, opt, pipe, debug, training, loader,
                     ref_dir, logging.getLogger("ref-fullbudget"))
    assert len(os.listdir(
        os.path.join(ref_dir, "point_cloud", f"iteration_{ITERS}"))) \
        == n_scenes

    # ---------------- eval path over BOTH result trees -------------------
    from skelsplat_tpu.evaluation import evaluate

    gt_path = os.path.join(root, "3d_gt")
    quiet = lambda *a: None  # noqa: E731
    res_repo = evaluate(gt_path, repo_dir, [ITERS], 0, n_scenes,
                        nviews=cfg["dataset"]["nviews"],
                        print_fn=quiet)[ITERS]
    res_ref = evaluate(gt_path, ref_dir, [ITERS], 0, n_scenes,
                       nviews=cfg["dataset"]["nviews"],
                       print_fn=quiet)[ITERS]

    # both sides must have actually optimized (a frozen-at-init pair would
    # agree trivially): final absolute MPJPE beats the noisy initial guess
    init_err = float(np.mean([
        np.linalg.norm(rec.pose_3d - rec.pose_3d_gt, axis=1).mean()
        for _, rec in records]))
    assert res_repo["absolute"] < 0.6 * init_err, \
        (res_repo["absolute"], init_err)
    assert res_ref["absolute"] < 0.6 * init_err, \
        (res_ref["absolute"], init_err)

    gap_abs = abs(res_ref["absolute"] - res_repo["absolute"])
    gap_rel = abs(res_ref["relative"] - res_repo["relative"])
    with capsys.disabled():
        print(f"\n[full-budget parity] {family}: {n_scenes} scenes x "
              f"{ITERS} iters — abs MPJPE ref {res_ref['absolute']:.4f} vs "
              f"repo {res_repo['absolute']:.4f} (gap {gap_abs:.5f} mm), "
              f"rel gap {gap_rel:.5f} mm, init {init_err:.1f} mm")

    # the north-star tolerance (BASELINE.json: "MPJPE within 0.5 mm")
    assert gap_abs < 0.5, \
        f"{family}: end-metric absolute MPJPE gap {gap_abs} mm >= 0.5 mm"
    assert gap_rel < 0.5, \
        f"{family}: end-metric relative MPJPE gap {gap_rel} mm >= 0.5 mm"
