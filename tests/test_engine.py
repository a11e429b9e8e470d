import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu import losses as L
from skelsplat_tpu.core.gaussians import SkeletonModel
from skelsplat_tpu.engine.optim import AdamGroups, OptConfig, BETA1, BETA2, EPS
from skelsplat_tpu.engine.trainer import (SceneTrainer, TrainSettings,
                                          cameras_extent, init_params_jnp)
from skelsplat_tpu.ops import fused, heatmaps, rasterizer
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np


N_J = 17
W, H = 112, 96
NV = 4


@pytest.fixture(scope="module")
def scene():
    cams, _, _ = synthetic_rig(n_views=NV, width=W, height=H)
    rng = np.random.default_rng(3)
    gt = synthetic_skeleton(N_J, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v)) for v in range(NV)])
    init = gt + rng.normal(0, 50, gt.shape).astype(np.float32)
    return cams, gt, p2d.astype(np.float32), init


def _model():
    return SkeletonModel("h36m", N_J, scaling=3.0, scaling_modifier=1.0)


# The _reference_loop oracle is CPU-calibrated: it jits its own per-view
# grad fns, and on the TPU backend ulp-level reduction-order differences
# between that path and the scan get amplified by Adam's normalization of
# the pure-roundoff quaternion gradients (see the docstring of
# test_trainer_matches_reference_loop). Compiled-on-TPU parity is covered
# by the golden regressions (bitwise CPU==TPU) and tools/parity_study
# (<=1.4e-4 mm over full 500-iteration runs on the chip).
cpu_oracle = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="CPU-calibrated reference-loop oracle; TPU parity covered by "
           "golden regressions + parity_study")


def test_fused_loss_equals_dense(scene):
    cams, gt, p2d, init = scene
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    cov6 = params.covariance()
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(p2d), cams,
                                 W, H)
    gt_hm = heatmaps.eval_heatmaps(spec, W, H)
    for v in range(NV):
        cam = take_cam(jax.tree.map(jnp.asarray, cams), v)
        out = rasterizer.render(params, cam, W, H)
        dense_loss, _ = L.l2_loss_gaussian(out["render"], gt_hm[v],
                                           p2d[v, :, :2])
        spec_v = jax.tree.map(lambda x: x[v], spec)
        fl = fused.fused_view_loss(params, cam, spec_v, W, H)
        assert np.isclose(float(dense_loss), float(fl), rtol=1e-5), \
            f"view {v}: dense {float(dense_loss)} vs fused {float(fl)}"


def _reference_loop(cams, p2d, init, iters, opt_cfg, model):
    """Literal transcription of train.py:116-233 semantics: one view per
    iteration round-robin, per-view grads accumulated, torch-Adam step every
    accumulation_steps with mean-xyz / last-view-others fusion."""
    settings = TrainSettings()
    params = init_params_jnp(jnp.asarray(init), model.scene_type,
                             model.scaling, model.scaling_modifier)
    cov6 = params.covariance()
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(p2d), cams,
                                 W, H)
    gt_hm = heatmaps.eval_heatmaps(spec, W, H)
    camsj = jax.tree.map(jnp.asarray, cams)

    def view_loss(p, v):
        cam = take_cam(camsj, v)
        out = rasterizer.render(p, cam, W, H)
        main, _ = L.l2_loss_gaussian(out["render"], gt_hm[v], p2d[v, :, :2])
        cons = L.limb_3d_consistency_loss(p.xyz, "h36m")
        return main + cons * settings.lambda_consistency

    grad_fns = [jax.jit(jax.grad(lambda p, v=v: view_loss(p, v)))
                for v in range(NV)]

    adam = AdamGroups(opt_cfg)
    ext = cameras_extent(jax.tree.map(jnp.asarray, cams))
    # torch-style state in numpy
    m = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    v_ = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    t = 0
    accum = np.zeros((NV, N_J, 3), np.float32)
    accum_steps = settings.accumulation_steps
    p = params
    for it in range(1, iters + 1):
        vidx = (it - 1) % NV
        g = grad_fns[vidx](p)
        accum[vidx] = np.asarray(g.xyz)
        last = g  # scale/rot/opacity .grad overwritten each iteration
        if it % accum_steps == 0:
            t += 1
            gx = accum.mean(axis=0)
            grads = {"xyz": gx, "log_scales": np.asarray(last.log_scales),
                     "quats": np.asarray(last.quats),
                     "opacity_logit": np.asarray(last.opacity_logit)}
            lrs = {"xyz": float(adam.xyz_lr(it, ext)),
                   "log_scales": opt_cfg.scaling_lr,
                   "quats": opt_cfg.rotation_lr,
                   "opacity_logit": opt_cfg.opacity_lr}
            newvals = {}
            for name in grads:
                g_ = grads[name]
                m_ = BETA1 * getattr(m, name) + (1 - BETA1) * g_
                vv = BETA2 * getattr(v_, name) + (1 - BETA2) * g_ * g_
                m = dataclasses.replace(m, **{name: m_})
                v_ = dataclasses.replace(v_, **{name: vv})
                mh = m_ / (1 - BETA1 ** t)
                vh = vv / (1 - BETA2 ** t)
                newvals[name] = (np.asarray(getattr(p, name))
                                 - lrs[name] * mh / (np.sqrt(vh) + EPS))
            p = dataclasses.replace(
                p, **{k: jnp.asarray(v2) for k, v2 in newvals.items()})
    return p


@pytest.mark.parametrize("renderer", ["dense", "fused"])
@cpu_oracle
def test_trainer_matches_reference_loop(scene, renderer):
    """The macro-step scan must reproduce the reference's per-iteration
    round-robin + grad-accumulation + torch-Adam semantics.

    Through 2 macro steps the match is bitwise-level (verified ≤ 5e-7); we
    assert tight parity at 8 iterations. Beyond that, quaternion components
    diverge chaotically: quat grads at the isotropic init are pure roundoff
    (~1e-9) and Adam normalizes them to full ±lr steps, so ANY two equally
    correct implementations (including two CUDA runs with different reduction
    orders) drift there. xyz/scales — the quantities MPJPE depends on — stay
    tightly matched.
    """
    model = _model()
    cams, gt, p2d, init = scene

    iters = 8
    ref_p = _reference_loop(cams, p2d, init, iters,
                            OptConfig(iterations=iters), model)
    tr = SceneTrainer(model, OptConfig(iterations=iters), TrainSettings(),
                      W, H, renderer=renderer)
    params, hist = tr.optimize_scene(init, p2d, cams, gt)
    for name in ["xyz", "log_scales", "quats", "opacity_logit"]:
        a = np.asarray(getattr(params, name))
        b = np.asarray(getattr(ref_p, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{renderer}:{name}")

    iters = 24
    ref_p = _reference_loop(cams, p2d, init, iters,
                            OptConfig(iterations=iters), model)
    tr = SceneTrainer(model, OptConfig(iterations=iters), TrainSettings(),
                      W, H, renderer=renderer)
    params, hist = tr.optimize_scene(init, p2d, cams, gt)
    for name in ["xyz", "log_scales"]:
        a = np.asarray(getattr(params, name))
        b = np.asarray(getattr(ref_p, name))
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                   err_msg=f"{renderer}:{name}")


def test_trainer_converges(scene):
    cams, gt, p2d, init = scene
    opt_cfg = OptConfig(iterations=400)
    # consistency off: the symmetry prior is meaningful for real (symmetric)
    # skeletons but actively harmful on this random synthetic one
    tr = SceneTrainer(_model(), opt_cfg,
                      TrainSettings(consistency_loss="none"), W, H,
                      renderer="fused")
    params, hist = tr.optimize_scene(init, p2d, cams, gt)
    mpjpe0 = np.linalg.norm(init - gt, axis=1).mean()
    mpjpe1 = np.linalg.norm(np.asarray(params.xyz) - gt, axis=1).mean()
    # telemetry should agree with direct computation
    assert np.isclose(np.asarray(hist.error)[-1].mean(), mpjpe1, rtol=1e-4)
    # ~32 mm/px at this synthetic rig's resolution; expect at least a halving
    assert mpjpe1 < 0.5 * mpjpe0
    # loss decreased
    l0 = np.asarray(hist.losses)[0].mean()
    l1 = np.asarray(hist.losses)[-1].mean()
    assert l1 < l0


def test_early_stopping_on_flat_loss(scene):
    cams, gt, p2d, init = scene
    # all joints far outside every frustum → zero grads → constant losses
    # (consistency off: at degenerate geometry its norm-at-zero grad is NaN)
    init_far = init.copy()
    init_far[:, 2] += 1e7
    opt_cfg = OptConfig(iterations=40)
    tr = SceneTrainer(_model(), opt_cfg,
                      TrainSettings(early_stopping="opt_early_stopping",
                                    consistency_loss="none"),
                      W, H, renderer="fused")
    params, hist = tr.optimize_scene(init_far, p2d, cams, gt)
    assert int(hist.stopped_at) == 8  # second macro step (iterations 5-8)
    # frozen after stop
    assert np.allclose(np.asarray(params.xyz), init_far, atol=1e-3)


@pytest.mark.skipif(jax.default_backend() == "tpu",
                    reason="auto picks the pallas renderer on TPU")
def test_trainer_auto_selects_fused():
    tr = SceneTrainer(_model(), OptConfig(iterations=4), TrainSettings(),
                      W, H)
    assert tr.renderer == "fused"
    tr2 = SceneTrainer(_model(), OptConfig(iterations=4),
                       TrainSettings(loss_function="cauchy"), W, H)
    assert tr2.renderer == "dense"


def test_consistency_loss_symmetrizes_limbs(scene):
    """With a large λ, the limb prior must pull |l_arm|−|r_arm| and
    |l_leg|−|r_leg| toward zero (loss_utils.py:226-250)."""
    cams, gt, p2d, init = scene
    tr = SceneTrainer(_model(), OptConfig(iterations=200),
                      TrainSettings(lambda_consistency=5e-3), W, H,
                      renderer="fused")
    params, _ = tr.optimize_scene(init, p2d, cams, gt)

    def asym(x):
        d = lambda a, b: np.linalg.norm(x[a] - x[b])
        return abs(d(12, 13) - d(15, 16)) + abs(d(5, 6) - d(2, 3))

    assert asym(np.asarray(params.xyz)) < asym(init)


def test_batched_scene_trainer_matches_single(scene):
    """optimize_scene_batch must match per-scene runs to f32-ulp level.

    (Bitwise until round 3's fused prepare+scan single-dispatch: the
    batched and single-scene programs now each fuse across the prepare
    boundary, and vmapped vs unvmapped XLA fusion choices differ at
    1 ulp on isolated elements.)"""
    import jax
    cams, gt, p2d, init = scene
    rng = np.random.default_rng(11)
    inits = np.stack([init, init + rng.normal(0, 30, init.shape)
                      .astype(np.float32)])
    gts = np.stack([gt, gt])
    p2ds = np.stack([p2d, p2d])
    cams_b = jax.tree.map(lambda x: np.stack([x, x]), cams)
    tr = SceneTrainer(_model(), OptConfig(iterations=16), TrainSettings(),
                      W, H, renderer="fused")
    pb, hb = tr.optimize_scene_batch(inits, p2ds, cams_b, gts)
    for b in range(2):
        p1, h1 = tr.optimize_scene(inits[b], p2ds[b], cams, gts[b])
        np.testing.assert_allclose(np.asarray(pb.xyz)[b],
                                    np.asarray(p1.xyz),
                                    rtol=3e-7, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hb.losses)[b],
                                   np.asarray(h1.losses),
                                   rtol=3e-7, atol=1e-9)

    # lean=True reduces telemetry to the LAST row on-device (the TB-off
    # batched sweep's fetch) — params and that row bitwise the full run's
    pl_, hl = tr.optimize_scene_batch(inits, p2ds, cams_b, gts, lean=True)
    np.testing.assert_array_equal(np.asarray(pl_.xyz), np.asarray(pb.xyz))
    assert hl.losses.shape[1] == 1
    np.testing.assert_array_equal(np.asarray(hl.losses[:, 0]),
                                  np.asarray(hb.losses[:, -1]))
    np.testing.assert_array_equal(np.asarray(hl.error[:, 0]),
                                  np.asarray(hb.error[:, -1]))
    np.testing.assert_array_equal(np.asarray(hl.stopped_at),
                                  np.asarray(hb.stopped_at))


def test_grouped_inputs_path_matches_direct(scene):
    """The sweep drivers pre-transfer several scenes' inputs in ONE packed
    put (host_inputs + put_trees) and dispatch with optimize_scene(...,
    inputs=...); results must be bitwise the direct path's — the program
    dispatched is identical, only the transfer batching differs."""
    from skelsplat_tpu.utils import put_trees

    cams, gt, p2d, init = scene
    rng = np.random.default_rng(5)
    init2 = (init + rng.normal(0, 25, init.shape)).astype(np.float32)
    tr = SceneTrainer(_model(), OptConfig(iterations=12), TrainSettings(),
                      W, H, renderer="fused")
    dev_ins = put_trees([tr.host_inputs(i, p2d, cams, gt)
                         for i in (init, init2)])
    for i, dev_in in zip((init, init2), dev_ins):
        pg, hg = tr.optimize_scene(None, None, inputs=dev_in)
        pd, hd = tr.optimize_scene(i, p2d, cams, gt)
        np.testing.assert_array_equal(np.asarray(pg.xyz), np.asarray(pd.xyz))
        np.testing.assert_array_equal(np.asarray(hg.losses),
                                      np.asarray(hd.losses))
        # per-scene lean mode: last telemetry row only, bitwise the full
        # run's final row (chain/batch have the same knob + tests)
        pl_, hl = tr.optimize_scene(i, p2d, cams, gt, lean=True)
        np.testing.assert_array_equal(np.asarray(pl_.xyz),
                                      np.asarray(pd.xyz))
        assert hl.losses.shape[0] == 1
        np.testing.assert_array_equal(np.asarray(hl.losses[0]),
                                      np.asarray(hd.losses[-1]))
        np.testing.assert_array_equal(np.asarray(hl.error[0]),
                                      np.asarray(hd.error[-1]))


@pytest.mark.parametrize("stopping", ["no_stopping", "opt_early_stopping"])
def test_chained_scenes_match_serial(scene, stopping):
    """optimize_scene_chain scans the per-scene program over the group and
    threads the cross-scene stopper window (hist8) between scenes — results
    must match the serial per-scene dispatch loop exactly, INCLUDING the
    early-stopping carry the vmapped batch path cannot reproduce."""
    cams, gt, p2d, init = scene
    rng = np.random.default_rng(9)
    inits = [init] + [(init + rng.normal(0, 30, init.shape))
                      .astype(np.float32) for _ in range(2)]
    tr = SceneTrainer(_model(), OptConfig(iterations=16),
                      TrainSettings(early_stopping=stopping),
                      W, H, renderer="fused")
    pg, hg = tr.optimize_scene_chain(
        [tr.host_inputs(i, p2d, cams, gt) for i in inits])
    h8 = None
    for s, i in enumerate(inits):
        ps, hs = tr.optimize_scene(i, p2d, cams, gt, hist8_init=h8)
        if hs.hist8 is not None:
            h8 = hs.hist8
        np.testing.assert_array_equal(np.asarray(pg.xyz[s]),
                                      np.asarray(ps.xyz))
        np.testing.assert_array_equal(np.asarray(hg.losses[s]),
                                      np.asarray(hs.losses))
        assert int(hg.stopped_at[s]) == int(hs.stopped_at)
    if stopping == "opt_early_stopping":
        np.testing.assert_array_equal(np.asarray(hg.hist8),
                                      np.asarray(h8))
    else:
        assert hg.hist8 is None

    # lean=True reduces telemetry to the LAST row on-device (what the
    # TB-off driver sweep fetches) — params/stopped_at/hist8 and that
    # row must be bitwise the full variant's
    pl_, hl = tr.optimize_scene_chain(
        [tr.host_inputs(i, p2d, cams, gt) for i in inits], lean=True)
    np.testing.assert_array_equal(np.asarray(pl_.xyz), np.asarray(pg.xyz))
    for lean_leaf, full_leaf in ((hl.losses, hg.losses),
                                 (hl.error, hg.error),
                                 (hl.error_rel, hg.error_rel)):
        assert lean_leaf.shape[1] == 1
        np.testing.assert_array_equal(np.asarray(lean_leaf[:, 0]),
                                      np.asarray(full_leaf[:, -1]))
    np.testing.assert_array_equal(np.asarray(hl.stopped_at),
                                  np.asarray(hg.stopped_at))
    if stopping == "opt_early_stopping":
        np.testing.assert_array_equal(np.asarray(hl.hist8),
                                      np.asarray(hg.hist8))


def _reference_loop_with_stop(cams, p2d, init, iters, opt_cfg, model,
                              tol=1e-6):
    """_reference_loop + the literal OptEarlyStopping / mid-macro stop
    semantics of train.py:130-233 and general_utils.py:467-491."""
    settings = TrainSettings()
    params = init_params_jnp(jnp.asarray(init), model.scene_type,
                             model.scaling, model.scaling_modifier)
    cov6 = params.covariance()
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(p2d), cams,
                                 W, H)
    gt_hm = heatmaps.eval_heatmaps(spec, W, H)
    camsj = jax.tree.map(jnp.asarray, cams)

    def view_loss(p, v):
        cam = take_cam(camsj, v)
        out = rasterizer.render(p, cam, W, H)
        main, _ = L.l2_loss_gaussian(out["render"], gt_hm[v], p2d[v, :, :2])
        cons = L.limb_3d_consistency_loss(p.xyz, "h36m")
        return main + cons * settings.lambda_consistency

    grad_fns = [jax.jit(jax.value_and_grad(lambda p, v=v: view_loss(p, v)))
                for v in range(NV)]
    adam = AdamGroups(opt_cfg)
    ext = cameras_extent(jax.tree.map(jnp.asarray, cams))
    m = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    v_ = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    t = 0
    accum = np.zeros((NV, N_J, 3), np.float32)
    history = []
    p = params
    stop_iter = 0
    for it in range(1, iters + 1):
        vidx = (it - 1) % NV
        lv, g = grad_fns[vidx](p)
        history.append(float(lv))
        stop = False
        if len(history) >= 8:
            w1 = np.array(history[-8:-4])
            w2 = np.array(history[-4:])
            stop = bool(np.all(np.abs(w1 - w2) < tol))
        accum[vidx] = np.asarray(g.xyz)
        last = g
        if it % 4 == 0 or stop:
            t += 1
            grads = {"xyz": accum.mean(axis=0),
                     "log_scales": np.asarray(last.log_scales),
                     "quats": np.asarray(last.quats),
                     "opacity_logit": np.asarray(last.opacity_logit)}
            lrs = {"xyz": float(adam.xyz_lr(it, ext)),
                   "log_scales": opt_cfg.scaling_lr,
                   "quats": opt_cfg.rotation_lr,
                   "opacity_logit": opt_cfg.opacity_lr}
            newvals = {}
            for name in grads:
                g_ = grads[name]
                m_ = BETA1 * getattr(m, name) + (1 - BETA1) * g_
                vv = BETA2 * getattr(v_, name) + (1 - BETA2) * g_ * g_
                m = dataclasses.replace(m, **{name: m_})
                v_ = dataclasses.replace(v_, **{name: vv})
                mh = m_ / (1 - BETA1 ** t)
                vh = vv / (1 - BETA2 ** t)
                newvals[name] = (np.asarray(getattr(p, name))
                                 - lrs[name] * mh / (np.sqrt(vh) + EPS))
            p = dataclasses.replace(
                p, **{k: jnp.asarray(x) for k, x in newvals.items()})
        if stop:
            stop_iter = it
            break
    return p, stop_iter


@cpu_oracle
def test_exact_early_stopping_matches_reference_loop(scene):
    """Force a mid-macro stop (huge tolerance makes the window check fire at
    the earliest gated iteration) and verify the mixed-stale-gradient stop
    step matches the literal reference loop, stop iteration included."""
    import skelsplat_tpu.engine.trainer as trainer_mod
    cams, gt, p2d, init = scene
    model = _model()
    opt_cfg = OptConfig(iterations=40)

    old_tol = trainer_mod.REPEAT_TOL
    trainer_mod.REPEAT_TOL = 1e6  # every window "repeats"
    try:
        tr = SceneTrainer(model, opt_cfg,
                          TrainSettings(early_stopping="opt_early_stopping"),
                          W, H, renderer="fused")
        params, hist = tr.optimize_scene(init, p2d, cams, gt)
    finally:
        trainer_mod.REPEAT_TOL = old_tol
    ref_p, ref_stop = _reference_loop_with_stop(cams, p2d, init, 40,
                                                opt_cfg, model, tol=1e6)
    assert ref_stop == 8  # earliest possible (history needs 8 entries)
    assert int(hist.stopped_at) == ref_stop
    np.testing.assert_allclose(np.asarray(params.xyz), np.asarray(ref_p.xyz),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params.log_scales),
                               np.asarray(ref_p.log_scales),
                               rtol=1e-5, atol=1e-6)


def test_stop_offset_matches_history_simulation(rng):
    """Fuzz the window logic against a literal OptEarlyStopping history
    simulation across random loss sequences and accumulation lengths —
    covers every macro-boundary straddle offset."""
    from skelsplat_tpu.engine.trainer import stop_offset

    tol = 0.1
    for trial in range(200):
        A = int(rng.choice([1, 2, 3, 4, 5, 8]))
        n_macro = (20 + A - 1) // A
        # random per-view losses with frequent repeats to trigger stops
        losses = rng.choice([0.5, 0.50001, 0.7, 0.9],
                            size=(n_macro, A)).astype(np.float32)
        # literal simulation: iterate inner iterations, keep history
        history = []
        ref = None
        for k1 in range(1, n_macro + 1):
            for m in range(1, A + 1):
                history.append(losses[k1 - 1, m - 1])
                if len(history) >= 8:
                    w1 = np.array(history[-8:-4])
                    w2 = np.array(history[-4:])
                    if np.all(np.abs(w1 - w2) < tol):
                        ref = (k1, m)
                        break
            if ref:
                break
        # scan-version: evaluate per macro step with the rolling history
        ours = None
        hist8 = jnp.full((8,), jnp.inf)
        for k1 in range(1, n_macro + 1):
            stop, m_star, hist8 = stop_offset(
                hist8, jnp.asarray(losses[k1 - 1]), k1, tol)
            if bool(stop):
                ours = (k1, int(m_star))
                break
        assert ours == ref, f"trial {trial} A={A}: ours {ours} vs ref {ref}"


@cpu_oracle
def test_general_accumulation_matches_reference_loop():
    """nviews=6, accumulation_steps=4: the reference round-robins subsets of
    views per optimizer step with persistent accumulated_grads rows. The
    generalized trainer must match the literal loop."""
    NV6 = 6
    cams6, _, _ = synthetic_rig(n_views=NV6, width=W, height=H)
    rng = np.random.default_rng(7)
    gt = synthetic_skeleton(N_J, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams6, v))
                    for v in range(NV6)]).astype(np.float32)
    init = gt + rng.normal(0, 40, gt.shape).astype(np.float32)
    model = _model()
    iters = 12
    opt_cfg = OptConfig(iterations=iters)
    settings = TrainSettings()  # accumulation_steps=4

    # ---- literal reference loop (train.py:116-233) with V=6, accum=4 ----
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    spec = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                 jnp.asarray(p2d), cams6, W, H)
    gt_hm = heatmaps.eval_heatmaps(spec, W, H)
    camsj = jax.tree.map(jnp.asarray, cams6)

    def view_loss(p, v):
        cam = take_cam(camsj, v)
        out = rasterizer.render(p, cam, W, H)
        main, _ = L.l2_loss_gaussian(out["render"], gt_hm[v], p2d[v, :, :2])
        return main + L.limb_3d_consistency_loss(p.xyz, "h36m") * 1e-5

    grad_fns = [jax.jit(jax.grad(lambda p, v=v: view_loss(p, v)))
                for v in range(NV6)]
    adam = AdamGroups(opt_cfg)
    ext = cameras_extent(camsj)
    m = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    v_ = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    t = 0
    accum = np.zeros((NV6, N_J, 3), np.float32)
    p = params
    for it in range(1, iters + 1):
        vidx = (it - 1) % NV6
        g = grad_fns[vidx](p)
        accum[vidx] = np.asarray(g.xyz)
        last = g
        if it % settings.accumulation_steps == 0:
            t += 1
            grads = {"xyz": accum.mean(axis=0),
                     "log_scales": np.asarray(last.log_scales),
                     "quats": np.asarray(last.quats),
                     "opacity_logit": np.asarray(last.opacity_logit)}
            lrs = {"xyz": float(adam.xyz_lr(it, ext)),
                   "log_scales": opt_cfg.scaling_lr,
                   "quats": opt_cfg.rotation_lr,
                   "opacity_logit": opt_cfg.opacity_lr}
            newvals = {}
            for name in grads:
                g_ = grads[name]
                m_ = BETA1 * getattr(m, name) + (1 - BETA1) * g_
                vv = BETA2 * getattr(v_, name) + (1 - BETA2) * g_ * g_
                m = dataclasses.replace(m, **{name: m_})
                v_ = dataclasses.replace(v_, **{name: vv})
                newvals[name] = (np.asarray(getattr(p, name))
                                 - lrs[name] * (m_ / (1 - BETA1 ** t))
                                 / (np.sqrt(vv / (1 - BETA2 ** t)) + EPS))
            p = dataclasses.replace(
                p, **{k: jnp.asarray(x) for k, x in newvals.items()})

    tr = SceneTrainer(model, opt_cfg, settings, W, H, renderer="fused")
    params2, hist = tr.optimize_scene(init, p2d, cams6, gt)
    np.testing.assert_allclose(np.asarray(params2.xyz), np.asarray(p.xyz),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(params2.log_scales),
                               np.asarray(p.log_scales),
                               rtol=2e-5, atol=2e-5)


@cpu_oracle
def test_general_accumulation_mid_macro_stop_matches_reference_loop():
    """nviews=6, accum=4 with a mid-macro early stop: force the window check
    to fire at macro 3, offset 2 (inner iteration 10) in BOTH the literal
    reference loop and the trainer (by monkeypatching stop_offset with the
    same forced decision), and verify the mixed stale/fresh
    accumulated_grads step, the Adam step count, and the LR iteration all
    match (train.py:155-233)."""
    import skelsplat_tpu.engine.trainer as trainer_mod

    NV6 = 6
    cams6, _, _ = synthetic_rig(n_views=NV6, width=W, height=H)
    rng = np.random.default_rng(13)
    gt = synthetic_skeleton(N_J, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams6, v))
                    for v in range(NV6)]).astype(np.float32)
    init = gt + rng.normal(0, 40, gt.shape).astype(np.float32)
    model = _model()
    opt_cfg = OptConfig(iterations=20)
    settings = TrainSettings(early_stopping="opt_early_stopping")
    STOP_IT = 10   # macro 3 (k1=3), offset m=2

    # ---- literal reference loop with the same forced stop decision ----
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    spec = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                 jnp.asarray(p2d), cams6, W, H)
    gt_hm = heatmaps.eval_heatmaps(spec, W, H)
    camsj = jax.tree.map(jnp.asarray, cams6)

    def view_loss(p, v):
        cam = take_cam(camsj, v)
        out = rasterizer.render(p, cam, W, H)
        main, _ = L.l2_loss_gaussian(out["render"], gt_hm[v], p2d[v, :, :2])
        return main + L.limb_3d_consistency_loss(p.xyz, "h36m") * 1e-5

    grad_fns = [jax.jit(jax.grad(lambda p, v=v: view_loss(p, v)))
                for v in range(NV6)]
    adam = AdamGroups(opt_cfg)
    ext = cameras_extent(camsj)
    m = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    v_ = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    t = 0
    accum = np.zeros((NV6, N_J, 3), np.float32)
    p = params
    for it in range(1, opt_cfg.iterations + 1):
        vidx = (it - 1) % NV6
        g = grad_fns[vidx](p)
        stop = it == STOP_IT
        accum[vidx] = np.asarray(g.xyz)
        last = g
        if it % settings.accumulation_steps == 0 or stop:
            t += 1
            grads = {"xyz": accum.mean(axis=0),
                     "log_scales": np.asarray(last.log_scales),
                     "quats": np.asarray(last.quats),
                     "opacity_logit": np.asarray(last.opacity_logit)}
            lrs = {"xyz": float(adam.xyz_lr(it, ext)),
                   "log_scales": opt_cfg.scaling_lr,
                   "quats": opt_cfg.rotation_lr,
                   "opacity_logit": opt_cfg.opacity_lr}
            newvals = {}
            for name in grads:
                g_ = grads[name]
                m_ = BETA1 * getattr(m, name) + (1 - BETA1) * g_
                vv = BETA2 * getattr(v_, name) + (1 - BETA2) * g_ * g_
                m = dataclasses.replace(m, **{name: m_})
                v_ = dataclasses.replace(v_, **{name: vv})
                newvals[name] = (np.asarray(getattr(p, name))
                                 - lrs[name] * (m_ / (1 - BETA1 ** t))
                                 / (np.sqrt(vv / (1 - BETA2 ** t)) + EPS))
            p = dataclasses.replace(
                p, **{k: jnp.asarray(x) for k, x in newvals.items()})
        if stop:
            break

    # ---- trainer with the identical forced decision ----
    real = trainer_mod.stop_offset

    def forced(hist8, cur, k1, tol):
        _, _, new_hist = real(hist8, cur, k1, tol)
        stop_now = k1 == 3
        m_star = jnp.where(stop_now, 2, cur.shape[0])
        return stop_now, m_star, new_hist

    trainer_mod.stop_offset = forced
    try:
        tr = SceneTrainer(model, opt_cfg, settings, W, H, renderer="fused")
        params2, hist = tr.optimize_scene(init, p2d, cams6, gt)
    finally:
        trainer_mod.stop_offset = real

    assert int(hist.stopped_at) == STOP_IT
    np.testing.assert_allclose(np.asarray(params2.xyz), np.asarray(p.xyz),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(params2.log_scales),
                               np.asarray(p.log_scales),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(params2.quats),
                               np.asarray(p.quats),
                               rtol=2e-5, atol=2e-5)


def test_stop_offset_cross_scene_carry_matches_global_history(rng):
    """The reference constructs OptEarlyStopping once before the scene loop
    (train.py:64), so its 8-loss window straddles scene boundaries and a
    stopped scene leaves its history truncated at the stop iteration. Fuzz
    a two-scene run: the literal global-history simulation vs the stop_offset
    chain carrying hist8 across the boundary."""
    from skelsplat_tpu.engine.trainer import stop_offset

    tol = 0.1
    for trial in range(100):
        A = int(rng.choice([1, 2, 3, 4, 5]))
        n_macro = (16 + A - 1) // A
        losses = rng.choice([0.5, 0.50001, 0.7, 0.9],
                            size=(2, n_macro, A)).astype(np.float32)

        # literal: one persistent history; each scene breaks on its stop
        history, ref = [], []
        for s in range(2):
            fired = None
            for k1 in range(1, n_macro + 1):
                for m in range(1, A + 1):
                    history.append(losses[s, k1 - 1, m - 1])
                    if len(history) >= 8 and np.all(np.abs(
                            np.array(history[-8:-4])
                            - np.array(history[-4:])) < tol):
                        fired = (k1, m)
                        break
                if fired:
                    break
            ref.append(fired)

        # ours: per-scene loops chaining hist8 (stop-aligned) across scenes
        hist8, ours = jnp.full((8,), jnp.inf), []
        for s in range(2):
            fired = None
            for k1 in range(1, n_macro + 1):
                stop, m_star, hist8 = stop_offset(
                    hist8, jnp.asarray(losses[s, k1 - 1]), k1, tol)
                if bool(stop):
                    fired = (k1, int(m_star))
                    break
            ours.append(fired)
        assert ours == ref, f"trial {trial} A={A}: {ours} vs {ref}"


def test_optimize_scene_hist8_carry_fires_immediately(scene):
    """End-to-end: with a carried all-equal history and a forced tolerance,
    scene 2 must stop at its very first iteration (a fresh history cannot
    fire before iteration 8 — test_exact_early_stopping covers that side)."""
    import skelsplat_tpu.engine.trainer as trainer_mod
    cams, gt, p2d, init = scene
    opt_cfg = OptConfig(iterations=40)
    old_tol = trainer_mod.REPEAT_TOL
    trainer_mod.REPEAT_TOL = 1e6
    try:
        tr = SceneTrainer(_model(), opt_cfg,
                          TrainSettings(early_stopping="opt_early_stopping"),
                          W, H, renderer="fused")
        params, hist = tr.optimize_scene(
            init, p2d, cams, gt, hist8_init=np.full(8, 0.5, np.float32))
    finally:
        trainer_mod.REPEAT_TOL = old_tol
    assert int(hist.stopped_at) == 1
    assert hist.hist8 is not None
    # the carried-out history holds the stop-time window: 7 seeds + loss_1
    np.testing.assert_allclose(np.asarray(hist.hist8[:7]), 0.5)


def test_confidence_weighted_view_fusion_engages(scene):
    """training.view_fusion=confidence_weighted (the similarity_utils.py
    pipeline made live) on a scene with one corrupted view: the mode must
    change the trajectory, stay finite, and on this occluded rig not lose
    to the plain mean on the corrupted joints."""
    cams, gt, p2d, init = scene
    p2d_occ = p2d.copy()
    # view 3's detections for joints 0-5 are wildly wrong ("occlusion")
    p2d_occ[3, :6, :2] = p2d_occ[3, :6, :2] + np.float32([40.0, -35.0])

    outs = {}
    for mode in ("mean", "confidence_weighted"):
        tr = SceneTrainer(_model(), OptConfig(iterations=100),
                          TrainSettings(consistency_loss="none",
                                        view_fusion=mode), W, H,
                          renderer="fused")
        params, hist = tr.optimize_scene(init, p2d_occ, cams, gt)
        xyz = np.asarray(params.xyz)
        assert np.isfinite(xyz).all()
        outs[mode] = (xyz, float(np.asarray(hist.error)[-1].mean()))

    # the mode engages: trajectories genuinely differ
    assert not np.allclose(outs["mean"][0], outs["confidence_weighted"][0])
    # and does not catastrophically regress on the occluded scene
    assert outs["confidence_weighted"][1] <= outs["mean"][1] * 1.5


def test_view_fusion_unknown_mode_raises(scene):
    cams, gt, p2d, init = scene
    tr = SceneTrainer(_model(), OptConfig(iterations=8),
                      TrainSettings(view_fusion="nope"), W, H,
                      renderer="fused")
    with pytest.raises(ValueError, match="view_fusion"):
        tr.optimize_scene(init, p2d, cams, gt)
