"""End-to-end CLI pipeline over a synthetic H36M-layout dataset:
train → saved PLYs → eval MPJPE; triangulation → iteration_0 clouds;
render → PNGs. Exercises DataLoader, config system, driver, PLY codec."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from skelsplat_tpu.tools import make_synthetic_dataset

IMG = 128
FRAMES = 128
STEP = 64  # → 2 frames per (subject, activity); 2 subj × 2 act = 8 scenes


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "synth-h36m"
    n = make_synthetic_dataset.write_tree(
        str(root), ["S9", "S11"], FRAMES, STEP, image_size=IMG)
    assert n == 8
    return str(root)


@pytest.fixture(scope="module")
def runcfg(synth, tmp_path_factory):
    """A config file pointing at the synthetic tree with a small budget."""
    cfgdir = tmp_path_factory.mktemp("cfg")
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR
    with open(os.path.join(DEFAULT_CONFIG_DIR, "h36m.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["data_root"] = synth
    cfg["dataset"]["end_scene_id"] = 4
    cfg["optimization"]["iterations"] = 200
    cfg["debug"]["save_iterations"] = [100, 200]
    cfg["debug"]["save_images"] = True
    exp = tmp_path_factory.mktemp("exp")
    cfg["hydra"]["run"]["dir"] = str(exp / "run")
    path = cfgdir / "synth.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path), str(exp / "run")


def test_train_eval_pipeline(synth, runcfg):
    cfg_path, run_dir = runcfg
    import train as train_cli
    train_cli.main(["--config-name", cfg_path])

    # artifacts
    assert os.path.exists(os.path.join(run_dir, "input.ply"))
    assert os.path.exists(os.path.join(run_dir, "cameras.json"))
    summary = json.load(open(os.path.join(run_dir, "train_summary.json")))
    assert len(summary["scenes"]) == 4
    for it in (100, 200):
        plys = os.listdir(os.path.join(run_dir, "point_cloud",
                                       f"iteration_{it}"))
        assert len(plys) == 4

    # result clouds should beat the noisy initial guess
    from skelsplat_tpu.data import ply as plyio
    from skelsplat_tpu.data.loader import DataLoader
    loader = DataLoader(synth, os.path.join(synth, "initial_guess", "metrabs"),
                        os.path.join(synth, "2d_metrabs"), frame_step=STEP,
                        start_id=0, end_id=4)
    err0, err1 = [], []
    for sid, rec in loader:
        pred = plyio.read_xyz(os.path.join(
            run_dir, "point_cloud", "iteration_200",
            f"{rec.scene_name}.ply"))
        err0.append(np.linalg.norm(rec.pose_3d - rec.pose_3d_gt,
                                   axis=1).mean())
        err1.append(np.linalg.norm(pred - rec.pose_3d_gt, axis=1).mean())
    assert np.mean(err1) < np.mean(err0)

    # debug renders got written
    assert any(f.startswith("render_")
               for f in os.listdir(os.path.join(run_dir, "images")))

    # eval CLI over the run
    import eval as eval_cli
    eval_cli.main(["--config-name", cfg_path,
                   f"eval.output_path={run_dir}"])

    # programmatic eval returns finite MPJPE matching the per-scene errors
    from skelsplat_tpu.evaluation import evaluate
    res = evaluate(os.path.join(synth, "3d_gt"), run_dir, [200], 0, 4,
                   print_fn=lambda *a: None)
    assert np.isclose(res[200]["absolute"], np.mean(err1), atol=2.0)


def test_triangulation_pipeline(synth, runcfg, tmp_path):
    cfg_path, _ = runcfg
    import triangulation as tri_cli
    out = str(tmp_path / "triout")
    # reuse the synth config; redirect the run dir via a copy
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["hydra"]["run"]["dir"] = out
    tri_path = str(tmp_path / "tri.yaml")
    with open(tri_path, "w") as f:
        yaml.safe_dump(cfg, f)
    tri_cli.main(["--config-name", tri_path])

    from skelsplat_tpu.data import ply as plyio
    from skelsplat_tpu.data.loader import DataLoader
    loader = DataLoader(synth, os.path.join(synth, "initial_guess", "metrabs"),
                        os.path.join(synth, "2d_metrabs"), frame_step=STEP,
                        start_id=0, end_id=4)
    # triangulated clouds ≈ GT (2D noise 1.5 px → a few mm of error)
    for sid, rec in loader:
        tri = plyio.read_xyz(os.path.join(out, "point_cloud", "iteration_0",
                                          f"{rec.scene_name}.ply"))
        err = np.linalg.norm(tri - rec.pose_3d_gt, axis=1).mean()
        assert err < 30.0, f"scene {rec.scene_name}: DLT error {err}"


def test_render_cli(synth, runcfg):
    cfg_path, run_dir = runcfg
    import render as render_cli
    render_cli.main(["--config-name", cfg_path,
                     f"eval.output_path={run_dir}",
                     "render.iteration=200", "render.max_scenes=2"])
    pngs = os.listdir(os.path.join(run_dir, "renders"))
    assert len(pngs) == 8  # 2 scenes × 4 cams


def test_train_dropout_and_stop_iteration_saves(synth, tmp_path_factory):
    """dropout=true draws the torch-RNG masks per scene, and early-stopped
    scenes save ONE PLY under their stop iteration with nothing after
    (train.py:227-233). REPEAT_TOL=1e6 makes the 8-loss window fire at the
    earliest possible iteration: 8 for the first scene (the history needs 8
    entries), and 1 for every later scene — the reference constructs
    OptEarlyStopping once BEFORE the scene loop (train.py:64), so the
    carried history is already full at the next scene's first check."""
    import skelsplat_tpu.engine.trainer as trainer_mod
    import train as train_cli
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR

    with open(os.path.join(DEFAULT_CONFIG_DIR, "h36m.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["data_root"] = synth
    cfg["dataset"]["end_scene_id"] = 2
    cfg["optimization"]["iterations"] = 40
    cfg["debug"]["save_iterations"] = [20]
    cfg["training"]["dropout"] = True
    cfg["training"]["early_stopping"] = "opt_early_stopping"
    exp = tmp_path_factory.mktemp("exp_stop")
    run_dir = str(exp / "run")
    cfg["hydra"]["run"]["dir"] = run_dir
    path = tmp_path_factory.mktemp("cfg_stop") / "synth_stop.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    old_tol = trainer_mod.REPEAT_TOL
    trainer_mod.REPEAT_TOL = 1e6
    try:
        train_cli.main(["--config-name", str(path)])
    finally:
        trainer_mod.REPEAT_TOL = old_tol

    summary = json.load(open(os.path.join(run_dir, "train_summary.json")))
    assert len(summary["scenes"]) == 2
    pc = os.path.join(run_dir, "point_cloud")
    expected_stop = [8, 1]   # fresh history gate, then carried-full history
    for sc, stop in zip(summary["scenes"], expected_stop):
        assert sc["stopped_at"] == stop
        name = sc["scene_name"] + ".ply"
        assert os.path.exists(os.path.join(pc, f"iteration_{stop}", name))
        assert not os.path.exists(os.path.join(pc, "iteration_20", name))
        assert not os.path.exists(os.path.join(pc, "iteration_40", name))

    # stop-aware resume: skip_existing consults the summary for early-stop
    # iterations, skips the scenes, and keeps their records in the rewritten
    # summary (hydra '+key' add-prefix must parse too)
    mtimes = {sc["scene_name"]: os.path.getmtime(os.path.join(
        pc, f"iteration_{stop}", sc["scene_name"] + ".ply"))
        for sc, stop in zip(summary["scenes"], expected_stop)}
    train_cli.main(["--config-name", str(path),
                    "+training.skip_existing=true"])
    summary2 = json.load(open(os.path.join(run_dir, "train_summary.json")))
    assert len(summary2["scenes"]) == 2
    for sc, stop in zip(summary2["scenes"], expected_stop):
        assert sc["stopped_at"] == stop
        assert os.path.getmtime(os.path.join(
            pc, f"iteration_{stop}", sc["scene_name"] + ".ply")) \
            == mtimes[sc["scene_name"]]          # not rewritten → skipped


def test_scene_batch_with_early_stopping_falls_back(synth, tmp_path_factory):
    """scene_batch>1 + opt_early_stopping must take the per-scene path: the
    reference's stopper window straddles scene boundaries (train.py:64),
    which batching cannot reproduce. The fallback run must match a
    scene_batch=1 run exactly."""
    import train as train_cli

    runs = {}
    for name, batch in [("b1", 1), ("b4", 4)]:
        run_dir = str(tmp_path_factory.mktemp(f"esb_{name}"))
        train_cli.main([
            "--config-name", "h36m.yaml",
            f"dataset.data_root={synth}", "dataset.end_scene_id=2",
            "optimization.iterations=32", "debug.save_iterations=[32]",
            "debug.save_images=false",
            "training.early_stopping=opt_early_stopping",
            f"training.scene_batch={batch}",
            f"hydra.run.dir={run_dir}"])
        runs[name] = json.load(open(os.path.join(run_dir,
                                                 "train_summary.json")))
    # the per-scene path (and only it) records the pipelining flag — its
    # presence in the batch=4 summary proves the fallback engaged
    assert "pipelined_scenes" in runs["b4"]
    for a, b in zip(runs["b1"]["scenes"], runs["b4"]["scenes"]):
        assert a["scene_name"] == b["scene_name"]
        assert a["abs_error"] == b["abs_error"]
        assert a["stopped_at"] == b["stopped_at"]


def test_scene_batch_pipelined_matches_per_scene(synth, tmp_path_factory):
    """The PIPELINED batched throughput path (training.scene_batch>1, no
    stopping — one batch in flight, the packed fetch of batch k
    overlapping batch k+1's execution) must produce the per-scene path's
    results to f32-ulp level and every per-scene PLY, and record the
    wall-clock sweep time."""
    import train as train_cli

    runs, dirs = {}, {}
    for name, batch in [("b1", 1), ("b3", 3)]:
        run_dir = str(tmp_path_factory.mktemp(f"pb_{name}"))
        train_cli.main([
            "--config-name", "h36m.yaml",
            f"dataset.data_root={synth}", "dataset.end_scene_id=4",
            "optimization.iterations=24", "debug.save_iterations=[24]",
            "debug.save_images=false",
            f"training.scene_batch={batch}",
            f"hydra.run.dir={run_dir}"])
        runs[name] = json.load(open(os.path.join(run_dir,
                                                 "train_summary.json")))
        dirs[name] = run_dir
    assert "wall_clock_sweep_seconds" in runs["b3"]
    assert len(runs["b3"]["scenes"]) == 4
    for a, b in zip(runs["b1"]["scenes"], runs["b3"]["scenes"]):
        assert a["scene_name"] == b["scene_name"]
        assert abs(a["abs_error"] - b["abs_error"]) < 1e-3
        ply_path = os.path.join(dirs["b3"], "point_cloud", "iteration_24",
                                b["scene_name"] + ".ply")
        assert os.path.exists(ply_path)


def test_analyze_confidence_workflow(synth, runcfg):
    """python -m skelsplat_tpu.tools.analyze_confidence over a finished run
    dir: produces the info JSON (the reference script's missing producer),
    the k-sigma coverage stats and both plot PNGs."""
    cfg_path, run_dir = runcfg
    if not os.path.isdir(os.path.join(run_dir, "point_cloud")):
        pytest.skip("needs the train run from test_train_eval_pipeline")
    from skelsplat_tpu.tools import analyze_confidence as ac

    out = os.path.join(run_dir, "confidence_analysis")
    ac.main([run_dir, "--data-root", synth, "--initial-guess", "metrabs",
             "--poses-2d", "metrabs", "--end-id", "4", "--out", out])
    info = json.load(open(os.path.join(out, "info_confidences.json")))
    assert len(info) == 4
    first = next(iter(info[0]["info"].values()))
    for key in ("3d_pred", "3d_gt", "covariance", "error", "joint_errors",
                "anisotropy", "trace", "eigenvalues"):
        assert key in first
    assert os.path.exists(os.path.join(out, "error_vs_trace.png"))
    assert os.path.exists(os.path.join(out, "sigma_coverage.png"))
    res = ac.analyze(info)
    assert 0.0 <= res["coverage"][1] <= res["coverage"][3] <= 1.0


def test_eval_image_metrics(synth, runcfg, tmp_path):
    """evaluation.image_metrics: SSIM always, LPIPS when a weights npz is
    available (random weights here — exercises the full path)."""
    cfg_path, run_dir = runcfg
    if not os.path.isdir(os.path.join(run_dir, "point_cloud")):
        pytest.skip("needs the train run from test_train_eval_pipeline")
    from skelsplat_tpu.data.loader import DataLoader
    from skelsplat_tpu.evaluation import image_metrics
    from skelsplat_tpu.ops import lpips as L

    w = L.random_weights("alex")
    npz = {"net_type": np.asarray("alex")}
    for i, (cw, cb) in enumerate(zip(w["conv_w"], w["conv_b"])):
        npz[f"conv{i}_w"], npz[f"conv{i}_b"] = cw, cb
    for i, lw in enumerate(w["lin_w"]):
        npz[f"lin{i}_w"] = lw
    wpath = str(tmp_path / "alex.npz")
    np.savez(wpath, **npz)

    loader = DataLoader(
        synth, os.path.join(synth, "initial_guess", "metrabs"),
        os.path.join(synth, "2d_metrabs"), frame_step=64,
        start_id=0, end_id=2, nviews=4)
    out = image_metrics(loader, run_dir, lpips_net="alex",
                        lpips_weights=wpath)
    assert 0.0 < out["ssim"] <= 1.0
    assert out["lpips"] is not None and np.isfinite(out["lpips"])
    assert len(out["per_scene"]) == 2
    for entry in out["per_scene"].values():
        assert "ssim" in entry and "lpips" in entry

    # without an explicit weights path: falls back to committed npzs if
    # any, else SSIM-only with LPIPS None
    out2 = image_metrics(loader, run_dir, lpips_weights=None)
    assert (out2["lpips"] is None) == (L.default_weights_path("vgg") is None)
    assert 0.0 < out2["ssim"] <= 1.0


def test_fetch_grouping_matches_serial(synth, tmp_path_factory):
    """The grouped-fetch pipeline (driver _finalize_group: results of
    training.fetch_scenes scenes packed into one device round-trip) must
    produce scene-for-scene identical errors/stop iterations to strictly
    serial dispatch+fetch (pipeline_scenes=false) — grouping only changes
    WHEN results cross the device boundary, never what is computed."""
    import train as train_cli
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR

    def run(tag, overrides):
        exp = tmp_path_factory.mktemp(tag)
        cfgdir = tmp_path_factory.mktemp(tag + "cfg")
        with open(os.path.join(DEFAULT_CONFIG_DIR, "h36m.yaml")) as f:
            cfg = yaml.safe_load(f)
        cfg["dataset"]["data_root"] = synth
        cfg["dataset"]["end_scene_id"] = 8
        cfg["optimization"]["iterations"] = 40
        cfg["debug"]["save_iterations"] = [40]
        cfg["hydra"]["run"]["dir"] = str(exp / "run")
        for k, v in overrides.items():
            cfg["training"][k] = v
        path = cfgdir / "cfg.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        train_cli.main(["--config-name", str(path)])
        summary = json.load(open(os.path.join(
            str(exp / "run"), "train_summary.json")))
        return summary["scenes"]

    grouped = run("grp", {"fetch_scenes": 3})   # groups of 3 over 8 scenes
    serial = run("ser", {"pipeline_scenes": False})
    assert len(grouped) == len(serial) == 8
    for g, s in zip(grouped, serial):
        assert g["scene_name"] == s["scene_name"]
        assert g["abs_error"] == s["abs_error"]
        assert g["rel_error"] == s["rel_error"]
        assert g["stopped_at"] == s["stopped_at"]


def test_chained_sweep_matches_serial(synth, tmp_path_factory):
    """With debug.save_images off and final-only save_iterations, the
    driver CHAINS each put-group into one program (optimize_scene_chain).
    Scene errors, stop iterations and saved PLYs must match the strictly
    serial per-scene run — including the cross-scene hist8 stopper window
    that same-chip batching cannot preserve (driver.py chain comment)."""
    import train as train_cli
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR

    def run(tag, overrides):
        exp = tmp_path_factory.mktemp(tag)
        cfgdir = tmp_path_factory.mktemp(tag + "cfg")
        with open(os.path.join(DEFAULT_CONFIG_DIR, "h36m.yaml")) as f:
            cfg = yaml.safe_load(f)
        cfg["dataset"]["data_root"] = synth
        cfg["dataset"]["end_scene_id"] = 8
        cfg["optimization"]["iterations"] = 40
        cfg["debug"]["save_iterations"] = [40]
        cfg["debug"]["save_images"] = False
        cfg["training"]["early_stopping"] = "opt_early_stopping"
        cfg["hydra"]["run"]["dir"] = str(exp / "run")
        for k, v in overrides.items():
            cfg["training"][k] = v
        path = cfgdir / "cfg.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        train_cli.main(["--config-name", str(path)])
        run_dir = str(exp / "run")
        summary = json.load(open(os.path.join(run_dir,
                                              "train_summary.json")))
        return summary["scenes"], run_dir

    chained, cdir = run("chn", {"fetch_scenes": 3})
    serial, sdir = run("srl", {"pipeline_scenes": False})
    assert len(chained) == len(serial) == 8
    for c, s in zip(chained, serial):
        assert c["scene_name"] == s["scene_name"]
        assert c["abs_error"] == s["abs_error"]
        assert c["rel_error"] == s["rel_error"]
        assert c["stopped_at"] == s["stopped_at"]
        it = c["stopped_at"] or 40
        ply_rel = os.path.join("point_cloud", f"iteration_{it}",
                               c["scene_name"] + ".ply")
        with open(os.path.join(cdir, ply_rel), "rb") as f1, \
                open(os.path.join(sdir, ply_rel), "rb") as f2:
            assert f1.read() == f2.read()   # saved checkpoints bitwise
