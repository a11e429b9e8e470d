"""Multi-device SPMD tests on the virtual 8-device CPU mesh: the sharded
(scenes × views) training step must produce the same update as the
single-device trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.core.gaussians import SkeletonModel
from skelsplat_tpu.engine.optim import OptConfig
from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings
from skelsplat_tpu.parallel import choose_mesh, make_mesh, multichip_train_step
from skelsplat_tpu.parallel.mesh import scene_batch_extents
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np

W, H = 96, 80
NV = 4
N_J = 17


@pytest.fixture(scope="module")
def batch():
    cams, _, _ = synthetic_rig(n_views=NV, width=W, height=H)
    rng = np.random.default_rng(5)
    scenes = []
    for b in range(2):
        gt = synthetic_skeleton(N_J, rng=rng, spread=280.0)
        p2d = np.stack([project_np(gt, take_cam(cams, v)) for v in range(NV)])
        init = gt + rng.normal(0, 40, gt.shape).astype(np.float32)
        scenes.append((init, gt, p2d.astype(np.float32)))
    initial_b = np.stack([s[0] for s in scenes])
    gt_b = np.stack([s[1] for s in scenes])
    p2d_b = np.stack([s[2] for s in scenes])
    cams_b = jax.tree.map(lambda x: np.stack([x, x]), cams)
    return initial_b, gt_b, p2d_b, cams_b


def test_choose_mesh_factoring():
    """One policy for every call site (driver + __graft_entry__): views take
    the largest divisor of nviews that divides n_devices."""
    assert choose_mesh(8, 4) == (2, 4)
    assert choose_mesh(4, 4) == (1, 4)
    assert choose_mesh(6, 4) == (3, 2)   # odd device count: fall back to 2
    assert choose_mesh(2, 4) == (1, 2)
    assert choose_mesh(5, 4) == (5, 1)   # coprime: scenes only
    assert choose_mesh(8, 5) == (8, 1)
    assert choose_mesh(10, 5) == (2, 5)
    assert choose_mesh(1, 4) == (1, 1)
    for n_dev, nv in [(2, 4), (4, 4), (6, 4), (8, 4), (8, 5), (12, 6)]:
        s, v = choose_mesh(n_dev, nv)
        assert s * v == n_dev and nv % v == 0
    with pytest.raises(ValueError):
        choose_mesh(0, 4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device(batch):
    initial_b, gt_b, p2d_b, cams_b = batch
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    opt = OptConfig(iterations=8)
    settings = TrainSettings(consistency_loss="none")
    trainer = SceneTrainer(model, opt, settings, W, H, renderer="fused")

    mesh = make_mesh(2, 4)
    prepare, step, _run = multichip_train_step(mesh, trainer)
    extent_b = jnp.asarray(scene_batch_extents(cams_b))
    camsj = jax.tree.map(jnp.asarray, cams_b)
    drop_b = jnp.zeros(p2d_b.shape[:3], dtype=bool)

    carry, view_aux = prepare(jnp.asarray(initial_b), jnp.asarray(p2d_b),
                              camsj, drop_b)
    # two sharded macro steps
    for k in range(2):
        carry, rec = step(carry, view_aux, jnp.asarray(p2d_b), camsj,
                          extent_b, jnp.asarray(gt_b),
                          jnp.asarray(k, jnp.int32))
    params_b = carry[0]

    # single-device reference: SceneTrainer per scene for 8 iterations
    for b in range(2):
        cams = jax.tree.map(lambda x: x[b], cams_b)
        p_ref, _ = trainer.optimize_scene(initial_b[b], p2d_b[b], cams,
                                          gt_b[b])
        np.testing.assert_allclose(
            np.asarray(params_b.xyz)[b], np.asarray(p_ref.xyz),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(params_b.log_scales)[b], np.asarray(p_ref.log_scales),
            rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes_and_sharding(batch):
    initial_b, gt_b, p2d_b, cams_b = batch
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"scenes": 2, "views": 4}
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    trainer = SceneTrainer(model, OptConfig(iterations=4),
                           TrainSettings(consistency_loss="none"),
                           W, H, renderer="fused")
    prepare, step, _run = multichip_train_step(mesh, trainer)
    drop_b = jnp.zeros(p2d_b.shape[:3], dtype=bool)
    carry, spec_b = prepare(
        jnp.asarray(initial_b), jnp.asarray(p2d_b),
        jax.tree.map(jnp.asarray, cams_b), drop_b)
    # the heatmap spec is sharded over both axes; params over scenes only
    s = spec_b.y0.sharding
    assert "scenes" in str(s.spec) and "views" in str(s.spec)
    sp = carry[0].xyz.sharding
    assert "scenes" in str(sp.spec) and "views" not in str(sp.spec)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_optimize_full_run(batch):
    """Scanned multichip optimization: full run over the mesh matches the
    single-device trainer, history telemetry included."""
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    initial_b, gt_b, p2d_b, cams_b = batch
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    trainer = SceneTrainer(model, OptConfig(iterations=12),
                           TrainSettings(consistency_loss="none"),
                           W, H, renderer="fused")
    mesh = make_mesh(2, 4)
    params_b, hist_b = multichip_optimize(mesh, trainer, initial_b, p2d_b,
                                          cams_b, gt_b)
    assert hist_b.losses.shape == (2, 3, NV)   # (B, K, V)
    for b in range(2):
        cams = jax.tree.map(lambda x: x[b], cams_b)
        p_ref, h_ref = trainer.optimize_scene(initial_b[b], p2d_b[b], cams,
                                              gt_b[b])
        np.testing.assert_allclose(np.asarray(params_b.xyz)[b],
                                   np.asarray(p_ref.xyz),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(hist_b.losses)[b],
                                   np.asarray(h_ref.losses),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(hist_b.error)[b],
                                   np.asarray(h_ref.error),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_early_stopping_and_dropout_parity(batch):
    """Early stopping + dropout on the mesh must reproduce the single-chip
    trainer exactly: forced stop (huge tolerance fires the 8-loss window at
    the earliest gated iteration), per-scene dropout masks, stop-aware
    frozen params."""
    import skelsplat_tpu.engine.trainer as trainer_mod
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    initial_b, gt_b, p2d_b, cams_b = batch
    rng = np.random.default_rng(11)
    drop_b = rng.random((2, NV, N_J)) < 0.2

    model = SkeletonModel("h36m", N_J, scaling=3.0)
    settings = TrainSettings(consistency_loss="none",
                             early_stopping="opt_early_stopping",
                             dropout=True)
    old_tol = trainer_mod.REPEAT_TOL
    trainer_mod.REPEAT_TOL = 1e6   # every window "repeats" once gated
    try:
        trainer = SceneTrainer(model, OptConfig(iterations=16), settings,
                               W, H, renderer="fused")
        mesh = make_mesh(2, 4)
        params_b, hist_b = multichip_optimize(
            mesh, trainer, initial_b, p2d_b, cams_b, gt_b, drop_b=drop_b)
        for b in range(2):
            cams = jax.tree.map(lambda x: x[b], cams_b)
            p_ref, h_ref = trainer.optimize_scene(
                initial_b[b], p2d_b[b], cams, gt_b[b],
                drop_mask=drop_b[b])
            assert int(np.asarray(h_ref.stopped_at)) == 8
            assert (int(np.asarray(hist_b.stopped_at)[b])
                    == int(np.asarray(h_ref.stopped_at)))
            np.testing.assert_allclose(np.asarray(params_b.xyz)[b],
                                       np.asarray(p_ref.xyz),
                                       rtol=2e-5, atol=2e-5)
    finally:
        trainer_mod.REPEAT_TOL = old_tol


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_general_accumulation_parity(batch):
    """accumulation_steps ≠ nviews on the mesh: the round-robin window +
    persistent accumulated_grads rows must match the single-chip trainer."""
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    initial_b, gt_b, p2d_b, cams_b = batch
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    settings = TrainSettings(consistency_loss="none", accumulation_steps=3)
    trainer = SceneTrainer(model, OptConfig(iterations=12), settings,
                           W, H, renderer="fused")
    mesh = make_mesh(2, 4)
    params_b, hist_b = multichip_optimize(mesh, trainer, initial_b, p2d_b,
                                          cams_b, gt_b)
    for b in range(2):
        cams = jax.tree.map(lambda x: x[b], cams_b)
        p_ref, h_ref = trainer.optimize_scene(initial_b[b], p2d_b[b], cams,
                                              gt_b[b])
        np.testing.assert_allclose(np.asarray(params_b.xyz)[b],
                                   np.asarray(p_ref.xyz),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(hist_b.losses)[b],
                                   np.asarray(h_ref.losses),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_driver_cli(tmp_path):
    """train.py with training.multichip=true runs the mesh path end-to-end
    on the virtual device mesh."""
    import os
    import yaml

    from skelsplat_tpu.tools import make_synthetic_dataset as synth
    from skelsplat_tpu.config import DEFAULT_CONFIG_DIR

    root = str(tmp_path / "synth-h36m")
    synth.write_tree(root, ["S9"], 128, 64, image_size=96)
    with open(os.path.join(DEFAULT_CONFIG_DIR, "h36m.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["data_root"] = root
    cfg["dataset"]["end_scene_id"] = 4
    cfg["optimization"]["iterations"] = 40
    cfg["debug"]["save_iterations"] = [40]
    cfg["debug"]["save_images"] = False
    cfg["training"]["multichip"] = True
    cfg["training"]["scene_batch"] = 2
    cfg["hydra"]["run"]["dir"] = str(tmp_path / "run")
    cfg_path = str(tmp_path / "mc.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    import train as train_cli
    train_cli.main(["--config-name", cfg_path])
    plys = os.listdir(str(tmp_path / "run" / "point_cloud" / "iteration_40"))
    assert len(plys) == 4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_multichip_windowed_pallas_matches_fused(monkeypatch):
    """The windowed Pallas kernel on the mesh: the tier switch is hoisted
    above the scene/view vmaps and outside the all_gather (devices may pick
    different tiers; collectives inside diverging branches would mismatch).
    A (2 scenes × 2 views) mesh run must match the single-device fused
    trainer. Rig sized so the 96×256 tier actually engages."""
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    W2, H2, NV2 = 224, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(5)
    gt = synthetic_skeleton(N_J, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    initial_b = np.stack([init, init + rng.normal(0, 10, init.shape)
                          .astype(np.float32)])
    gt_b, p2d_b = np.stack([gt, gt]), np.stack([p2d, p2d])
    cams_b = jax.tree.map(lambda x: np.stack([x, x]), cams)

    model = SkeletonModel("h36m", N_J, scaling=3.0)
    opt = OptConfig(iterations=4)
    st = TrainSettings(consistency_loss="none", accumulation_steps=2)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256")
    t_p = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_p._pallas_win == [(96, 256, None, 32)]
    mesh = make_mesh(2, 2)
    params_b, hist_b = multichip_optimize(mesh, t_p, initial_b, p2d_b,
                                          cams_b, gt_b)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    for b in range(2):
        cams1 = jax.tree.map(lambda x: x[b], cams_b)
        p_ref, h_ref = t_f.optimize_scene(initial_b[b], p2d_b[b], cams1,
                                          gt_b[b])
        np.testing.assert_allclose(np.asarray(params_b.xyz)[b],
                                   np.asarray(p_ref.xyz),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(hist_b.losses)[b],
                                   np.asarray(h_ref.losses),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_programs_cached_across_batches(batch):
    """The sharded (prepare, step, run_segment) programs must be built ONCE
    per (trainer, mesh): rebuilding the closures per mesh batch defeats the
    jit cache (fresh function identity → retrace per batch — real money
    through a remote-compile tunnel)."""
    from skelsplat_tpu.parallel import mesh as mesh_mod

    initial_b, gt_b, p2d_b, cams_b = batch
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    trainer = SceneTrainer(model, OptConfig(iterations=8),
                           TrainSettings(consistency_loss="none"), W, H,
                           renderer="fused")
    mesh = make_mesh(2, 4)

    calls = []
    orig = mesh_mod.multichip_train_step
    mesh_mod.multichip_train_step = \
        lambda m, t: (calls.append(1), orig(m, t))[1]
    try:
        p1 = mesh_mod.multichip_programs(mesh, trainer)
        p2 = mesh_mod.multichip_programs(mesh, trainer)
        assert p1 is p2 and len(calls) == 1

        # two mesh batches through the driver's entry point share the build
        mesh_mod.multichip_optimize(mesh, trainer, initial_b, p2d_b,
                                    cams_b, gt_b)
        mesh_mod.multichip_optimize(mesh, trainer, initial_b, p2d_b,
                                    cams_b, gt_b)
        assert len(calls) == 1
    finally:
        mesh_mod.multichip_train_step = orig

    # an equivalent mesh object hashes equal → still no rebuild
    mesh2 = make_mesh(2, 4)
    assert mesh_mod.multichip_programs(mesh2, trainer) is p1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_multichip_slot_sliced_matches_fused(monkeypatch):
    """The slot-sliced windowed tier on the (scenes x views) mesh: per-slot
    column slicing must compose with the sharded step and match the
    single-device fused trainer."""
    from skelsplat_tpu.parallel.mesh import multichip_optimize
    from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, \
        project_np

    W2, H2, NV2 = 288, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(11)
    gt = synthetic_skeleton(N_J, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    initial_b = np.stack([init, init + rng.normal(0, 10, init.shape)
                          .astype(np.float32)])
    gt_b, p2d_b = np.stack([gt, gt]), np.stack([p2d, p2d])
    cams_b = jax.tree.map(lambda x: np.stack([x, x]), cams)

    model = SkeletonModel("h36m", N_J, scaling=3.0)
    opt = OptConfig(iterations=4)
    st = TrainSettings(consistency_loss="none", accumulation_steps=2)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256x128,96x256")
    t_p = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_p._pallas_win == [(96, 256, 128, 32),
                               (96, 256, None, 32)]
    mesh = make_mesh(2, 2)
    params_b, hist_b = multichip_optimize(mesh, t_p, initial_b, p2d_b,
                                          cams_b, gt_b)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    for b in range(2):
        cams1 = jax.tree.map(lambda x: x[b], cams_b)
        p_ref, _ = t_f.optimize_scene(initial_b[b], p2d_b[b], cams1,
                                      gt_b[b])
        np.testing.assert_allclose(np.asarray(params_b.xyz)[b],
                                   np.asarray(p_ref.xyz),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_stopper_window_reset_divergence(batch):
    """QUANTIFY the one documented semantic divergence of the mesh path
    (engine/driver.py _training_multichip): the reference's OptEarlyStopping
    window is constructed once before the scene loop (train.py:64) and
    straddles scene boundaries — a serial effect — while the mesh path
    starts a fresh window per scene in each mesh batch.

    Construction: forced tolerance (every 8-loss window "repeats" once
    gated) makes the straddle deterministic — the serial path enters scene
    2+ with a full carried window and stops at ITERATION 1, while the mesh
    path's fresh windows need 8 losses again. The test measures the stop
    gap and the end-metric (final xyz) gap that the early freeze causes,
    and pins both:

      - scene 0 (nothing to straddle): identical stops, both paths;
      - later scenes: serial stops at 1, mesh at 8 — a 7-iteration gap,
        the maximum the 8-window can produce at accumulation_steps=4;
      - the end-metric gap is the cost of those 7 extra Adam iterations
        FROM the shared iteration-1 state — measured ~3.0 mm mean xyz on
        this rig (the forced-tol stop freezes the serial scene right at
        its ~65 mm-error init, so the early steps are the largest of the
        whole run — the worst case by construction), and strictly TOWARD
        the ground truth: the mesh path optimizes longer, so its MPJPE is
        asserted <= serial's. With the production tolerance, windows fire
        on loss plateaus where params barely move per iteration, so the
        production-side gap is far smaller than this bound.
    """
    import skelsplat_tpu.engine.trainer as trainer_mod
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    initial_b, gt_b, p2d_b, cams_b = batch
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    settings = TrainSettings(consistency_loss="none",
                             early_stopping="opt_early_stopping")
    old_tol = trainer_mod.REPEAT_TOL
    trainer_mod.REPEAT_TOL = 1e6
    try:
        trainer = SceneTrainer(model, OptConfig(iterations=16), settings,
                               W, H, renderer="fused")

        # serial reference: the driver's per-scene loop with hist8 chained
        hist8, stops_serial, xyz_serial = None, [], []
        for b in range(2):
            cams = jax.tree.map(lambda x: x[b], cams_b)
            p_s, h_s = trainer.optimize_scene(
                initial_b[b], p2d_b[b], cams, gt_b[b], hist8_init=hist8)
            hist8 = h_s.hist8
            stops_serial.append(int(np.asarray(h_s.stopped_at)))
            xyz_serial.append(np.asarray(p_s.xyz))

        # mesh path: both scenes in ONE batch, fresh windows
        mesh = make_mesh(2, 4)
        params_b, hist_b = multichip_optimize(
            mesh, trainer, initial_b, p2d_b, cams_b, gt_b)
        stops_mesh = [int(s) for s in np.asarray(hist_b.stopped_at)]
    finally:
        trainer_mod.REPEAT_TOL = old_tol

    # scene 0: no carried history on either path -> identical stop
    assert stops_mesh[0] == stops_serial[0] == 8
    # scene 1: serial stops at iteration 1 off scene 0's carried tail;
    # the mesh's fresh window gates until 8 — the documented divergence,
    # at its maximum (the stop gap can never exceed the 8-loss warm-up)
    assert stops_serial[1] == 1
    assert stops_mesh[1] == 8
    gap_iters = stops_mesh[1] - stops_serial[1]
    assert 0 < gap_iters <= 8 - 1

    # end-metric cost of the divergence: the gap Adam iterations from the
    # shared iteration-1 state (~3.0 mm here — the worst case: the forced
    # tol freezes the serial scene at its ~65 mm-error init where steps
    # are largest), and strictly TOWARD the ground truth
    gaps_mm = [float(np.abs(np.asarray(params_b.xyz)[b]
                            - xyz_serial[b]).mean()) for b in range(2)]
    assert gaps_mm[0] < 1e-5          # same stop -> same frozen params
    assert 0.0 < gaps_mm[1] < 10.0, (
        f"stopper-reset divergence {gaps_mm[1]:.4f} mm mean xyz "
        f"(stop gap {gap_iters} iterations)")
    mpjpe = lambda xyz, b: float(np.linalg.norm(
        xyz - gt_b[b], axis=-1).mean())
    m_mesh = mpjpe(np.asarray(params_b.xyz)[1], 1)
    m_serial = mpjpe(xyz_serial[1], 1)
    assert m_mesh <= m_serial, (
        "the mesh path optimizes longer past the reset — it must land at "
        f"or closer to GT (mesh {m_mesh:.3f} vs serial {m_serial:.3f} mm)")
    print(f"stopper-window reset divergence: stop gap {gap_iters} "
          f"iterations, xyz gap {gaps_mm[1]:.4f} mm, MPJPE mesh "
          f"{m_mesh:.3f} vs serial {m_serial:.3f} mm")
