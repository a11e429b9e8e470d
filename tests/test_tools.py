import numpy as np
import pytest

from skelsplat_tpu.tools import initial_guess


def _reference_fusion(world_poses, poses2d, P):
    """Literal loop transcription of compute_initial_guess.py:23-117."""
    ncams, nframes, njoints, _ = world_poses.shape
    ones = np.ones((ncams, nframes, njoints, 1))
    hom = np.concatenate([world_poses, ones], axis=-1)

    errors_all = []
    for frame in range(nframes):
        per_pose = []
        for i_pose in range(ncams):
            projs = []
            for i_image in range(ncams):
                t3 = (P[i_image] @ hom[i_pose, frame].T).T
                projs.append(t3[:, :2] / t3[:, 2:3])
            l2 = [np.linalg.norm(projs[c] - poses2d[c, frame], axis=-1)
                  for c in range(ncams)]
            per_pose.append(np.mean(np.stack(l2, 0), axis=0))
        errors_all.append(np.stack(per_pose, 0))
    errors = np.array(errors_all)  # (F, C, J)

    fused = []
    for frame in range(nframes):
        pose = []
        for j in range(njoints):
            w = 1.0 / errors[frame, :, j]
            w = w / w.sum()
            pose.append(np.average(world_poses[:, frame, j, :], axis=0,
                                   weights=w))
        fused.append(pose)
    return np.array(fused)


def test_fusion_matches_reference_loop(rng):
    C, F, J = 4, 3, 17
    world = rng.normal(0, 300, (C, F, J, 3))
    world[..., 2] += 4000
    P = rng.normal(0, 1, (C, 3, 4))
    P[:, 2, 3] += 50  # keep projective depth away from 0
    det = rng.normal(0, 100, (C, F, J, 2)) + 500
    ours = initial_guess.fuse_poses(world, det, P)
    ref = _reference_fusion(world, det, P)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


def test_fusion_prefers_consistent_camera(rng):
    """A camera whose mono pose reprojects consistently everywhere should
    dominate the weighted average."""
    C, F, J = 3, 1, 5
    true = rng.normal(0, 200, (J, 3))
    true[:, 2] += 3000
    # simple orthographic-ish projections
    P = np.zeros((C, 3, 4))
    for c in range(C):
        P[c, 0, 0] = P[c, 1, 1] = 1.0
        P[c, 2, 3] = 1.0
        P[c, 0, 3] = 10.0 * c
    det = np.stack([(P[c, :2, :3] @ true.T).T + P[c, :2, 3]
                    for c in range(C)])[:, None]
    world = np.stack([true[None] + rng.normal(0, 200, (1, J, 3)),
                      true[None] + rng.normal(0, 200, (1, J, 3)),
                      true[None] + rng.normal(0, 1, (1, J, 3))])
    # camera 2's mono pose is near-exact (exactly 0 would make the inverse
    # reprojection-error weight infinite — a real quirk of the reference)
    fused = initial_guess.fuse_poses(world, det, P)
    err_fused = np.linalg.norm(fused[0] - true, axis=1).mean()
    err_mean = np.linalg.norm(world.mean(0)[0] - true, axis=1).mean()
    assert err_fused < err_mean


def test_similarity_weights(rng):
    import jax.numpy as jnp
    from skelsplat_tpu.ops import similarity

    grads = rng.normal(0, 1, (4, 17, 3)).astype(np.float32)
    # make views 0-2 agree on joint 0, view 3 disagree
    grads[0, 0] = grads[1, 0] = grads[2, 0] = [1.0, 0, 0]
    grads[3, 0] = [-1.0, 0, 0]
    w = np.asarray(similarity.compute_scaling_weights(
        similarity.pairwise_cosine_norm_similarity(jnp.asarray(grads))))
    assert w.shape == (4, 17)
    assert w[3, 0] < w[0, 0]  # disagreeing view downweighted
    sim = np.asarray(similarity.pairwise_cosine_similarity(jnp.asarray(grads)))
    assert np.isclose(sim[0, 0, 1], 1.0, atol=1e-6)
    assert np.isclose(sim[0, 0, 3], -1.0, atol=1e-6)
    idx = np.asarray(similarity.select_consistent_views(jnp.asarray(grads), 3))
    assert 3 not in idx[0]
    cons = np.asarray(similarity.identify_consistent_views(sim))
    assert cons[0, 0] and cons[0, 1] and cons[0, 2] and not cons[0, 3]


def test_ab_harness(tmp_path, rng):
    """A/B harness over two fabricated runs + GT tree."""
    import json
    import os

    from skelsplat_tpu.data import ply
    from skelsplat_tpu.tools.ab_harness import compare

    gt_dir = tmp_path / "3d_gt" / "S9" / "Walking"
    os.makedirs(gt_dir)
    frames = 3
    gt = rng.normal(0, 200, (frames * 64, 17, 3)).astype(np.float32)
    np.savez(gt_dir / "poses.npz", poses=gt)

    for run, noise in [("ours", 5.0), ("theirs", 6.0)]:
        d = tmp_path / run / "point_cloud" / "iteration_500"
        os.makedirs(d)
        for f in range(frames):
            pose = gt[f * 64] + rng.normal(0, noise, (17, 3))
            ply.write_gaussian_ply(
                str(d / f"S9_Walking_{f * 64:06d}.ply"),
                pose.astype(np.float32), np.zeros((17, 3), np.float32),
                np.tile([1, 0, 0, 0], (17, 1)).astype(np.float32),
                np.zeros((17, 1), np.float32))

    out = compare(str(tmp_path / "ours"), str(tmp_path / "theirs"),
                  str(tmp_path / "3d_gt"), 500, print_fn=lambda *a: None)
    s = out["summary"]
    assert s["n_scenes"] == 3
    assert s["pose_disagreement_mm"]["mean"] > 0
    assert 5 < s["mpjpe"]["ours_mean"] < 20
    assert abs(s["mpjpe"]["delta_mean"]) < 10


def test_noise_injection_reproducible(rng):
    """training.std_dev_noise uses the reference's per-scene seed-0 RNG
    (train.py:82) — two runs must produce identical params."""
    import jax
    from skelsplat_tpu.core.gaussians import SkeletonModel
    from skelsplat_tpu.engine.optim import OptConfig
    from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings
    from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, \
        project_np

    cams, W, H = synthetic_rig(n_views=4, width=96, height=80)
    gt = synthetic_skeleton(17, rng=rng)
    p2d = np.stack([project_np(gt, take_cam(cams, v)) for v in range(4)])
    tr = SceneTrainer(SkeletonModel("h36m", 17, scaling=3.0),
                      OptConfig(iterations=8),
                      TrainSettings(std_dev_noise=30.0), W, H,
                      renderer="fused")
    p1, _ = tr.optimize_scene(gt, p2d, cams, gt)
    p2_, _ = tr.optimize_scene(gt, p2d, cams, gt)
    np.testing.assert_array_equal(np.asarray(p1.xyz), np.asarray(p2_.xyz))
    # and the noise actually moved the start away from gt
    assert np.linalg.norm(np.asarray(p1.xyz) - gt, axis=1).mean() > 1.0


def test_anisotropy_analysis(rng):
    """analysis.scene_lambdas + anisotropy_per_joint — the 2D-anisotropy
    statistic of analize_2D_anisotropy.py over a synthetic scene."""
    import jax
    import jax.numpy as jnp

    from skelsplat_tpu import analysis
    from skelsplat_tpu.engine.trainer import init_params_jnp
    from tests.utils import synthetic_rig, synthetic_skeleton

    cams, W, H = synthetic_rig(n_views=3, width=96, height=80)
    gt = synthetic_skeleton(17, rng=np.random.default_rng(2))
    params = init_params_jnp(jnp.asarray(gt), "h36m", 3.0, 1.0)
    lam = analysis.scene_lambdas(params, jax.tree.map(jnp.asarray, cams),
                                 W, H)
    assert set(lam) == {str(j) for j in range(17)}
    assert all(len(v) == 3 for v in lam.values())
    for views in lam.values():
        for l1, l2 in views:
            assert l1 >= l2 > 0
    aniso = analysis.anisotropy_per_joint(lam)
    assert all(a >= 1.0 for views in aniso.values() for a in views)


def test_trace_summary_exclusive_times():
    """exclusive_times subtracts nested children from their parents per
    timeline lane (a flat sum double-counts every hierarchy level — the
    profiler bug that made `cond` look like the whole macro step)."""
    from skelsplat_tpu.tools.trace_summary import exclusive_times

    # lane A: while [0,100) contains cond [10,40) contains fusion [15,25);
    # a second cond [50,80) is a sibling. lane B: independent op [0,30).
    mk = lambda name, ts, dur, tid: {"name": name, "ts": ts, "dur": dur,
                                     "pid": 1, "tid": tid}
    events = [
        mk("while", 0, 100, 7),
        mk("cond", 10, 30, 7),
        mk("fusion", 15, 10, 7),
        mk("cond", 50, 30, 7),
        mk("other", 0, 30, 8),
    ]
    self_time, counts = exclusive_times(events)
    assert self_time["while"] == 100 - 30 - 30
    assert self_time["cond"] == (30 - 10) + 30
    assert self_time["fusion"] == 10
    assert self_time["other"] == 30
    assert counts["cond"] == 2
    # total exclusive time == wall coverage per lane (100 + 30)
    assert sum(self_time.values()) == 130


def test_trace_summary_hlo_source_map(tmp_path):
    """hlo_source_map extracts op → file:line from an optimized-HLO text
    dump's metadata clauses."""
    from skelsplat_tpu.tools.trace_summary import hlo_source_map

    hlo = tmp_path / "m.txt"
    hlo.write_text(
        '  %fusion.252 = f32[4,1024,128]{2,1,0} fusion(%a), kind=kOutput, '
        'metadata={op_name="jit(f)/dot" source_file="/repo/a/trainer.py" '
        'source_line=570 source_end_line=573}\n'
        '  %add.1 = f32[2]{0} add(%x, %y), metadata={op_name="jit(f)/add" '
        'source_file="/repo/ops/geometry.py" source_line=33}\n'
        '  %no_meta = f32[2]{0} multiply(%x, %y)\n')
    loc = hlo_source_map(str(hlo))
    assert loc["fusion.252"] == "trainer.py:570"
    assert loc["add.1"] == "geometry.py:33"
    assert "no_meta" not in loc


def test_filter_preds_number_views(tmp_path):
    """The panoptic view-consistency filter keeps exactly the frames that
    are present and NaN-free in ALL selected views, writes float64
    'poses_filtered_{nviews}' npzs, and scales GT x10 (reference
    dataset_tools/panoptic/filter_preds_number_views.py)."""
    from skelsplat_tpu.tools.panoptic import filter_preds_number_views as f

    root, act, cams = tmp_path / "pan", "171204_pose5", ["00_01", "00_02"]
    rng = np.random.default_rng(3)
    n = 6

    def put(name, cam, poses):
        d = root / name / "S0" / act / (cam or "")
        d.mkdir(parents=True, exist_ok=True)
        np.savez(d / "poses.npz", poses=poses)

    # view 0: frame 1 has a NaN; view 1: frame 3 is None (object dtype)
    p3d_v0 = rng.normal(size=(n, 19, 3))
    p3d_v0[1, 0, 0] = np.nan
    p3d_v1 = np.empty(n, dtype=object)
    for i in range(n):
        p3d_v1[i] = rng.normal(size=(19, 3))
    p3d_v1[3] = None
    put("3d_metrabs_mono", cams[0], p3d_v0)
    put("3d_metrabs_mono", cams[1], p3d_v1)
    p2d = {c: rng.normal(size=(n, 19, 2)) for c in cams}
    gt2d = {c: rng.normal(size=(n, 19, 2)) for c in cams}
    for c in cams:
        put("2d_metrabs", c, p2d[c])
        put("2d_gt", c, gt2d[c])
    gt3d = rng.normal(size=(n, 19, 3))
    put("3d_gt", None, gt3d)

    f.main(["--data_path", str(root), "--activities", act,
            "--nviews", "2", "--cameras", *cams])

    keep = [0, 2, 4, 5]  # 1 (NaN in v0) and 3 (None in v1) dropped
    for c in cams:
        out = np.load(root / "2d_metrabs" / "S0" / act / c /
                      "poses_filtered_2.npz")["poses"]
        np.testing.assert_allclose(out, p2d[c][keep])
        assert out.dtype == np.float64
        out = np.load(root / "2d_gt" / "S0" / act / c /
                      "poses_filtered_2.npz")["poses"]
        np.testing.assert_allclose(out, gt2d[c][keep] * 10)  # GT -> cm
        out = np.load(root / "3d_metrabs_mono" / "S0" / act / c /
                      "poses_filtered_2.npz", allow_pickle=True)["poses"]
        assert out.shape[0] == len(keep)
    out = np.load(root / "3d_gt" / "S0" / act /
                  "poses_filtered_2.npz")["poses"]
    np.testing.assert_allclose(out, gt3d[keep] * 10)
