"""Pallas fused kernel parity vs the XLA fused path (interpret mode on CPU;
the same assertions run compiled on TPU via SKELSPLAT_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.core.gaussians import SkeletonModel
from skelsplat_tpu.engine.optim import OptConfig
from skelsplat_tpu.engine.trainer import (SceneTrainer, TrainSettings,
                                          init_params_jnp)
from skelsplat_tpu.ops import fused, heatmaps
from skelsplat_tpu.ops.pallas_raster import fused_view_loss_pallas
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np

N_J = 17
W, H = 112, 96
NV = 3


@pytest.fixture(scope="module")
def scene():
    cams, _, _ = synthetic_rig(n_views=NV, width=W, height=H)
    rng = np.random.default_rng(3)
    gt = synthetic_skeleton(N_J, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v)) for v in range(NV)])
    init = gt + rng.normal(0, 50, gt.shape).astype(np.float32)
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    spec = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                 jnp.asarray(p2d.astype(np.float32)),
                                 cams, W, H)
    return cams, gt, p2d.astype(np.float32), init, params, spec


def test_pallas_value_matches_fused(scene):
    cams, gt, p2d, init, params, spec = scene
    for v in range(NV):
        cam = take_cam(jax.tree.map(jnp.asarray, cams), v)
        spec_v = jax.tree.map(lambda x: x[v], spec)
        l_ref = float(fused.fused_view_loss(params, cam, spec_v, W, H))
        l_pal = float(fused_view_loss_pallas(params, cam, spec_v, W, H))
        assert abs(l_ref - l_pal) < 1e-6, f"view {v}"


def test_pallas_grads_match_fused(scene):
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    spec_v = jax.tree.map(lambda x: x[0], spec)
    g1 = jax.grad(lambda p: fused.fused_view_loss(p, cam, spec_v, W, H))(params)
    g2 = jax.grad(
        lambda p: fused_view_loss_pallas(p, cam, spec_v, W, H))(params)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        a = np.asarray(getattr(g1, nm))
        b = np.asarray(getattr(g2, nm))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() < 1e-5 * max(scale, 1e-3), nm


def test_pallas_grads_nontrivial_pose(scene):
    """After some optimization the scales are anisotropic and quats get real
    gradients — check parity away from the symmetric init point."""
    import dataclasses
    cams, gt, p2d, init, params, spec = scene
    rng = np.random.default_rng(9)
    params2 = dataclasses.replace(
        params,
        log_scales=params.log_scales + jnp.asarray(
            rng.normal(0, 0.3, (N_J, 3)).astype(np.float32)),
        quats=params.quats + jnp.asarray(
            rng.normal(0, 0.2, (N_J, 4)).astype(np.float32)),
    )
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 1)
    spec_v = jax.tree.map(lambda x: x[1], spec)
    g1 = jax.grad(lambda p: fused.fused_view_loss(p, cam, spec_v, W, H))(params2)
    g2 = jax.grad(
        lambda p: fused_view_loss_pallas(p, cam, spec_v, W, H))(params2)
    assert np.abs(np.asarray(g1.quats)).max() > 0
    for nm in ["xyz", "log_scales", "quats"]:
        a = np.asarray(getattr(g1, nm))
        b = np.asarray(getattr(g2, nm))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-8,
                                   err_msg=nm)


def test_trainer_pallas_matches_fused(scene):
    cams, gt, p2d, init, params, spec = scene
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    opt = OptConfig(iterations=12)
    t_f = SceneTrainer(model, opt, TrainSettings(), W, H, renderer="fused")
    t_p = SceneTrainer(model, opt, TrainSettings(), W, H, renderer="pallas")
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    pp, hp = t_p.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pp.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hp.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("loss_fn", ["l1_gaussian", "l1_masked"])
def test_pallas_l1_losses_match_fused(scene, loss_fn):
    """The kernel's error op is parameterized over FUSED_LOSSES (the l1
    family shares |d| with sign(d) backward, loss_utils.py:103-118); value
    AND gradient must match the XLA fused path per loss."""
    cams, gt, p2d, init, params, spec = scene
    for v in range(NV):
        cam = take_cam(jax.tree.map(jnp.asarray, cams), v)
        spec_v = jax.tree.map(lambda x: x[v], spec)
        l_ref = float(fused.fused_view_loss(params, cam, spec_v, W, H,
                                            loss_function=loss_fn))
        l_pal = float(fused_view_loss_pallas(params, cam, spec_v, W, H,
                                             loss_function=loss_fn))
        assert abs(l_ref - l_pal) < 1e-6, f"view {v}"
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    spec_v = jax.tree.map(lambda x: x[0], spec)
    g1 = jax.grad(lambda p: fused.fused_view_loss(
        p, cam, spec_v, W, H, loss_function=loss_fn))(params)
    g2 = jax.grad(lambda p: fused_view_loss_pallas(
        p, cam, spec_v, W, H, loss_function=loss_fn))(params)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        a = np.asarray(getattr(g1, nm))
        b = np.asarray(getattr(g2, nm))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() < 1e-5 * max(scale, 1e-3), nm


def test_windowed_kernel_matches_full(monkeypatch):
    """The windowed kernel (dynamic crop around the union bbox of splat
    rects ∪ GT supports, with a fits-cond fallback to the full frame) must
    reproduce the full kernel's values and gradients. 224×160 rig so the
    96×128 window is a real crop; the trainer path exercises the per-macro
    cond under scan."""
    from skelsplat_tpu.ops.pallas_raster import (pallas_view_profiles,
                                                 pallas_window_bounds)
    N, W2, H2, NV2 = 17, 224, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(5)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    spec = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                 jnp.asarray(p2d), cams, W2, H2)
    WIN = (96, 256)
    fits_any = False
    for v in range(NV2):
        cam = take_cam(jax.tree.map(jnp.asarray, cams), v)
        spec_v = jax.tree.map(lambda x: x[v], spec)
        profs = pallas_view_profiles(spec_v, W2, H2)
        offs, fits = pallas_window_bounds(params, cam, spec_v, W2, H2,
                                          *WIN, profiles=profs)
        if not bool(fits):
            continue
        fits_any = True
        l_full, g_full = jax.value_and_grad(
            lambda p: fused_view_loss_pallas(p, cam, spec_v, W2, H2,
                                             profiles=profs))(params)
        l_win, g_win = jax.value_and_grad(
            lambda p: fused_view_loss_pallas(
                p, cam, spec_v, W2, H2, profiles=profs,
                window=offs, win_shape=WIN))(params)
        assert abs(float(l_win) - float(l_full)) < 1e-6
        for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
            a = np.asarray(getattr(g_full, nm))
            b = np.asarray(getattr(g_win, nm))
            sc = max(np.abs(a).max(), 1e-12)
            assert np.abs(a - b).max() < 1e-5 * max(sc, 1e-3), nm
    assert fits_any, "no view fit the window — test rig needs adjusting"

    # trainer path: windowed pallas (2-tier cascade: the 32-row tier can
    # never fit, so the switch must route to tier 1) vs fused trainer
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "32x256,96x256")
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=6)
    st = TrainSettings(accumulation_steps=2)
    t_w = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_w._pallas_win == [(32, 256, None, 32),
                               WIN + (None, 32)]
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    pw, hw = t_w.optimize_scene(init, p2d, cams, gt)
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pw.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hw.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_batched_windowed_pallas_matches_fused(monkeypatch):
    """The batched path hoists the window switch above the scene vmap:
    a 2-scene batch through the windowed Pallas kernel must match the
    fused batched trainer."""
    N, W2, H2, NV2 = 17, 224, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(5)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    inits = np.stack([init, init + rng.normal(0, 10, init.shape)
                      .astype(np.float32)])
    gts, p2ds = np.stack([gt, gt]), np.stack([p2d, p2d])
    cams_b = jax.tree.map(lambda x: np.stack([x, x]), cams)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=8)
    st = TrainSettings(accumulation_steps=2)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256")
    t_p = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_p._pallas_win == [(96, 256, None, 32)]
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    pp, hp = t_p.optimize_scene_batch(inits, p2ds, cams_b, gts)
    pf, hf = t_f.optimize_scene_batch(inits, p2ds, cams_b, gts)
    np.testing.assert_allclose(np.asarray(pp.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hp.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_windowed_general_accumulation_matches_fused(monkeypatch):
    """Windowing must compose with accumulation_steps != nviews: the window
    bounds are computed on the round-robin-gathered view subset each macro
    step (3 views, accum 2 → different subsets per macro)."""
    N, W2, H2, NV3 = 17, 224, 160, 3
    cams, _, _ = synthetic_rig(n_views=NV3, width=W2, height=H2)
    rng = np.random.default_rng(7)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV3)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=8)
    st = TrainSettings(accumulation_steps=2)
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256")
    t_w = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    pw, hw = t_w.optimize_scene(init, p2d, cams, gt)
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pw.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hw.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_pallas_edge_cases_match_fused(scene):
    """Degenerate inputs through the Pallas paths: every Gaussian behind
    the camera (frustum-culled, GT-only loss) and detections far off-image
    (border-clamped heatmaps) must stay finite and equal the fused path —
    windowed variant included when its bbox fits."""
    import dataclasses
    from skelsplat_tpu.ops.pallas_raster import (pallas_view_profiles,
                                                 pallas_window_bounds)
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    sv = jax.tree.map(lambda x: x[0], spec)
    profs = pallas_view_profiles(sv, W, H)

    behind = dataclasses.replace(
        params, xyz=params.xyz - jnp.asarray([0.0, 0.0, 1e7]))
    lw, gw = jax.value_and_grad(lambda p: fused_view_loss_pallas(
        p, cam, sv, W, H, profiles=profs))(behind)
    lr = fused.fused_view_loss(behind, cam, sv, W, H)
    assert np.isfinite(float(lw)) and abs(float(lw) - float(lr)) < 1e-6
    assert np.isfinite(np.asarray(gw.xyz)).all()
    from skelsplat_tpu.ops.pallas_raster import ROWS
    wh = 2 * ROWS    # window heights must be ROWS multiples (guarded)
    offs, fits = pallas_window_bounds(behind, cam, sv, W, H, wh, 128,
                                      profiles=profs)
    if bool(fits):
        lwin = fused_view_loss_pallas(behind, cam, sv, W, H, profiles=profs,
                                      window=offs, win_shape=(wh, 128))
        assert abs(float(lwin) - float(lw)) < 1e-6
    with pytest.raises(ValueError, match="multiples"):
        fused_view_loss_pallas(behind, cam, sv, W, H, profiles=profs,
                               window=offs, win_shape=(ROWS + 1, 128))

    p2d_bad = np.asarray(p2d).copy()
    p2d_bad[0] += 5000.0      # far off-image → border clamp (reference)
    spec2 = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                  jnp.asarray(p2d_bad), cams, W, H)
    sv2 = jax.tree.map(lambda x: x[0], spec2)
    l2p = fused_view_loss_pallas(params, cam, sv2, W, H)
    l2f = fused.fused_view_loss(params, cam, sv2, W, H)
    assert np.isfinite(float(l2p)) and abs(float(l2p) - float(l2f)) < 1e-6


def test_trainer_pallas_matches_fused_l1(scene):
    cams, gt, p2d, init, params, spec = scene
    model = SkeletonModel("h36m", N_J, scaling=3.0)
    opt = OptConfig(iterations=8)
    st = TrainSettings(loss_function="l1_gaussian")
    t_f = SceneTrainer(model, opt, st, W, H, renderer="fused")
    t_p = SceneTrainer(model, opt, st, W, H, renderer="pallas")
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    pp, hp = t_p.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pp.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hp.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_slot_sliced_windowed_matches_fused(monkeypatch):
    """Kernel slot slicing (per-slot 128-aligned column windows inside the
    windowed kernel): a 96x256x128 tier must match the fused trainer, and
    a cascade whose sliced tier cannot hold the slot spans must fall
    through to the unsliced tier (exactness never depends on slot_w)."""
    N, W2, H2, NV2 = 17, 288, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(9)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=6)
    st = TrainSettings(accumulation_steps=2)

    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256x128")
    t_s = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_s._pallas_win == [(96, 256, 128, 32)]
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    ps, hs = t_s.optimize_scene(init, p2d, cams, gt)
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(ps.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hs.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)

    # cascade: sliced tier first; both must agree with the fused result
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256x128,96x256")
    t_c = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_c._pallas_win == [(96, 256, 128, 32),
                               (96, 256, None, 32)]
    pc, hc = t_c.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pc.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hc.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_band_exit_variant_bitwise(monkeypatch):
    """The SKELSPLAT_PALLAS_BANDEXIT measurement probe (skip a slot whose
    column slice is fully early-outed, T ≡ 0) must be BITWISE the default
    kernel: a dead slice contributes exactly zero to compositing, loss and
    gradients, so the skip only removes arithmetic that lands on zeros.
    Opacity logit 40 (sigmoid exactly 1, α clamped 0.99) makes the T_MIN
    early-out actually fire by the 2nd covering splat, so the gate is live
    in this configuration, not vacuous. Measured on TPU and rejected as a
    default (PERF.md round 4): the per-slot aliveness reduction costs more
    than the skips save on skeleton splats."""
    N, W2, H2, NV2 = 17, 288, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(29)
    gt = synthetic_skeleton(N, rng=rng, spread=60.0)  # tight → overlaps
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=6)
    st = TrainSettings(accumulation_steps=2)

    results = {}
    for force in ("1", "0"):
        monkeypatch.setenv("SKELSPLAT_PALLAS_BANDEXIT", force)
        monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256x128")
        tr = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
        results[force] = tr.optimize_scene(init, p2d, cams, gt)
    (p1_, h1), (p0, h0) = results["1"], results["0"]
    np.testing.assert_array_equal(np.asarray(p1_.xyz), np.asarray(p0.xyz))
    np.testing.assert_array_equal(np.asarray(p1_.log_scales),
                                  np.asarray(p0.log_scales))
    np.testing.assert_array_equal(np.asarray(h1.losses),
                                  np.asarray(h0.losses))


def test_ghat_stack_variant_bitwise(monkeypatch):
    """The 4-stack bwd kernel (ghat/E stashed in pass 1, no pass-2
    recompute — _run_bwd's gstacks upgrade) must be BITWISE the 2-stack
    recompute form: the stored values are exactly what pass 2 would
    recompute. SKELSPLAT_PALLAS_GHAT forces each variant."""
    N, W2, H2, NV2 = 17, 288, 160, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(13)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=6)
    st = TrainSettings(accumulation_steps=2)

    results = {}
    for force in ("1", "0"):
        monkeypatch.setenv("SKELSPLAT_PALLAS_GHAT", force)
        monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "96x256x128")
        tr = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
        results[force] = tr.optimize_scene(init, p2d, cams, gt)
    (p1_, h1), (p0, h0) = results["1"], results["0"]
    np.testing.assert_array_equal(np.asarray(p1_.xyz), np.asarray(p0.xyz))
    np.testing.assert_array_equal(np.asarray(p1_.log_scales),
                                  np.asarray(p0.log_scales))
    np.testing.assert_array_equal(np.asarray(h1.losses),
                                  np.asarray(h0.losses))


def test_tall_band_tier_matches_fused(monkeypatch):
    """Per-tier row-band heights (trainer._window_config tier_rows): a
    64-row-band sliced tier (HxWxSLOTxROWS env form) must match the fused
    trainer — the taller bands change only per-program granularity and
    reduction grouping, never the masked-sum semantics."""
    N, W2, H2, NV2 = 17, 288, 192, 2
    cams, _, _ = synthetic_rig(n_views=NV2, width=W2, height=H2)
    rng = np.random.default_rng(11)
    gt = synthetic_skeleton(N, rng=rng, spread=120.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(NV2)]).astype(np.float32)
    init = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    model = SkeletonModel("h36m", N, scaling=3.0)
    opt = OptConfig(iterations=6)
    st = TrainSettings(accumulation_steps=2)

    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "128x256x128x64")
    t_t = SceneTrainer(model, opt, st, W2, H2, renderer="pallas")
    assert t_t._pallas_win == [(128, 256, 128, 64)]
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "off")
    t_f = SceneTrainer(model, opt, st, W2, H2, renderer="fused")
    pt, ht = t_t.optimize_scene(init, p2d, cams, gt)
    pf, hf = t_f.optimize_scene(init, p2d, cams, gt)
    np.testing.assert_allclose(np.asarray(pt.xyz), np.asarray(pf.xyz),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ht.losses), np.asarray(hf.losses),
                               rtol=1e-5, atol=1e-7)


def test_window_config_auto_tier_rows(monkeypatch):
    """The auto cascade picks 64-row bands for windowed tiers whose
    backward VJP stacks fit the VMEM budget and keeps heights that the
    bands divide; the full-frame fallback is implied (not a tier)."""
    monkeypatch.setenv("SKELSPLAT_PALLAS_WINDOW", "auto")
    model = SkeletonModel("h36m", 17, scaling=3.0)
    t = SceneTrainer(model, OptConfig(iterations=4), TrainSettings(),
                     1002, 1000, renderer="pallas")
    wins = t._pallas_win
    assert wins is not None
    for wh, ww, sw, rw in wins:
        assert wh % rw == 0
        assert ww % 128 == 0
        assert sw is None or (sw % 128 == 0 and sw < ww)
        stack_w = sw or ww
        # the auto rule's own VMEM budget (incl. the full resident
        # profiles and the in-kernel-permute scratch) must hold for the
        # choice made
        vmem = 4 * (2 * 17 * rw * stack_w + 3 * rw * ww
                    + 1024 * 128 + 17 * 1024 + wh * 128 + 128 * 128)
        assert vmem <= 13.5 * 2**20
    # the H36M-scale tier runs 64-row bands (the round-3 continuation win);
    # width 768 absorbs the ≤127-column alignment straddle of ~640-wide
    # bodies (the column origin snaps down to a 128-lane boundary)
    assert wins[0][:2] == (512, 768) and wins[0][3] == 64

    # Panoptic at 19 joints: every tier's choice also satisfies the
    # budget with ITS full profile sizes (1088x128 p1, 19x1920 p2)
    model19 = SkeletonModel("panoptic", 19, scaling=3.0)
    t19 = SceneTrainer(model19, OptConfig(iterations=4), TrainSettings(),
                       1920, 1080, renderer="pallas")
    for wh, ww, sw, rw in t19._pallas_win:
        vmem = 4 * (2 * 19 * rw * (sw or ww) + 3 * rw * ww
                    + 1088 * 128 + 19 * 1920 + wh * 128 + 128 * 128)
        assert vmem <= 13.5 * 2**20 and wh % rw == 0


@pytest.mark.parametrize("windowed", [False, True])
def test_inkernel_permute_variant_bitwise(scene, monkeypatch, windowed):
    """The default in-kernel p1 permute (program-0 window permute of the
    unpermuted p1, one HIGHEST dot into VMEM scratch) must be BITWISE the
    SKELSPLAT_PALLAS_PERMUTE=xla external permute through loss AND grads —
    both are the same one-hot K=128 contraction per output row, and the
    scratch persists across the sequential grid programs."""
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    spec_v = jax.tree.map(lambda x: x[0], spec)
    kw = {}
    if windowed:
        from skelsplat_tpu.ops.pallas_raster import (pallas_view_profiles,
                                                     pallas_window_bounds)
        profs = pallas_view_profiles(spec_v, W, H)
        offs, fits = pallas_window_bounds(params, cam, spec_v, W, H,
                                          64, 128, profiles=profs)
        # even a non-covering window is a valid A/B (both variants get the
        # same window); a real nonzero offset exercises row0 - r_off
        kw = dict(profiles=profs, window=offs, win_shape=(64, 128))

    def run():
        return jax.value_and_grad(lambda p: fused_view_loss_pallas(
            p, cam, spec_v, W, H, **kw))(params)

    monkeypatch.setenv("SKELSPLAT_PALLAS_PERMUTE", "xla")
    l_ref, g_ref = jax.tree.map(np.asarray, run())
    monkeypatch.delenv("SKELSPLAT_PALLAS_PERMUTE", raising=False)
    l_new, g_new = jax.tree.map(np.asarray, run())
    np.testing.assert_array_equal(l_ref, l_new)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        np.testing.assert_array_equal(getattr(g_ref, nm),
                                      getattr(g_new, nm), err_msg=nm)


def test_onehot_permute_highest_exact_hostile():
    """The precision=HIGHEST one-hot lane permute is bitwise a gather for
    every NORMAL f32 and zero — tiny-normal / huge / odd-mantissa values
    included. This is the exactness invariant the per-macro depth permutes
    rely on (pallas_raster.fused_view_loss_pallas); production profiles
    are truncated Gaussians (exact zeros outside the support, O(1)-scaled
    normals inside), never subnormal — and both CPU and TPU matmuls flush
    subnormal inputs, so subnormals are excluded by construction here.
    Runs compiled on TPU under SKELSPLAT_TEST_TPU=1, where the f32 matmul
    emulation actually happens. (The HIGH variant — even with a 2^48
    prescale — was measured INEXACT on chip at ~2^-16 rel: HIGH is a
    2-term bf16 split. Rejected, PERF.md round 4.)"""
    from skelsplat_tpu.ops.pallas_raster import LANES

    rng = np.random.default_rng(7)
    rows = 256
    hostile = np.float32([2.0**-126, 2.0**-120, 1e-30, 0.0, 1.0,
                          1 + 2.0**-23, 1e20, 2.0**30, 2.0**100])
    x = rng.choice(hostile, size=(rows, LANES)).astype(np.float32)
    x += rng.standard_normal((rows, LANES)).astype(np.float32) \
        * rng.choice(hostile, size=(rows, LANES)).astype(np.float32)
    x = np.where(np.abs(x) < np.float32(2.0**-126), np.float32(0.0),
                 x).astype(np.float32)   # flush subnormals (FTZ on-chip)

    order = rng.permutation(LANES)
    PL = (np.arange(LANES)[:, None] == order[None, :]).astype(np.float32)

    out = np.asarray(jax.jit(
        lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST))(
        jnp.asarray(x), jnp.asarray(PL)))
    np.testing.assert_array_equal(out, x[:, order])


@pytest.mark.parametrize("sliced", [False, True])
def test_zero_glue_pack_variant_bitwise(scene, monkeypatch, sliced):
    """The env-gated zero-glue pack (SKELSPLAT_PALLAS_PACK=kernel:
    unsorted per-quantity SMEM refs + the depth order; program 0 gathers
    slots through ord_ref into sorted scratch) must be BITWISE the
    default legacy path (sorted (N,16) pack + HIGHEST one-hot sort
    matmuls) through loss AND grads — every one-hot matmul it replaces
    was exactly the gather the kernel now performs, and the rank-ordered
    gradient block unsorts through one take(). (The kernel pack was
    measured-REJECTED on the headline sweep, PERF.md round 5 — the
    default is "xla"; this test must OPT IN to the variant or it
    compares the legacy path against itself.)"""
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    spec_v = jax.tree.map(lambda x: x[0], spec)
    kw = {}
    if sliced:
        from skelsplat_tpu.ops.pallas_raster import (pallas_view_profiles,
                                                     pallas_window_bounds)
        profs = pallas_view_profiles(spec_v, W, H)
        offs, fits = pallas_window_bounds(params, cam, spec_v, W, H,
                                          64, 128, profiles=profs)
        # a non-covering window is still a valid A/B (both variants get
        # the same window + slot slices)
        kw = dict(profiles=profs, window=offs, win_shape=(64, 128),
                  slot_w=128, rows=32)

    def run():
        return jax.value_and_grad(lambda p: fused_view_loss_pallas(
            p, cam, spec_v, W, H, **kw))(params)

    monkeypatch.setenv("SKELSPLAT_PALLAS_PACK", "xla")
    l_ref, g_ref = jax.tree.map(np.asarray, run())
    monkeypatch.setenv("SKELSPLAT_PALLAS_PACK", "kernel")
    l_new, g_new = jax.tree.map(np.asarray, run())
    np.testing.assert_array_equal(l_ref, l_new)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        np.testing.assert_array_equal(getattr(g_ref, nm),
                                      getattr(g_new, nm), err_msg=nm)


@pytest.mark.parametrize("sliced", [False, True])
def test_lazy_slot_read_variant_bitwise(scene, monkeypatch, sliced):
    """The default lazy slot read (read only the 5 culling-test scalars
    per (slot, band) iteration, defer the remaining pack scalars into
    the pl.when regions, skip the dead bwd-stack pre-zeroing — ADOPTED
    round 5, 0.0162 vs 0.0176 s/frame) must be BITWISE the
    SKELSPLAT_PALLAS_SLOTREAD=eager round-4 form through loss AND grads
    — it is a pure
    reordering of SMEM loads plus removal of stores pass 2 provably never
    reads (a slot's stacks are read only under the same rends[i]
    predicate that guarantees pass 1's region fully overwrote them)."""
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    spec_v = jax.tree.map(lambda x: x[0], spec)
    kw = {}
    if sliced:
        from skelsplat_tpu.ops.pallas_raster import (pallas_view_profiles,
                                                     pallas_window_bounds)
        profs = pallas_view_profiles(spec_v, W, H)
        offs, fits = pallas_window_bounds(params, cam, spec_v, W, H,
                                          64, 128, profiles=profs)
        kw = dict(profiles=profs, window=offs, win_shape=(64, 128),
                  slot_w=128, rows=32)

    def run():
        return jax.value_and_grad(lambda p: fused_view_loss_pallas(
            p, cam, spec_v, W, H, **kw))(params)

    # set BOTH modes explicitly — the default flipped to "lazy" on
    # adoption, and an env-delete would compare the default against
    # itself (the vacuity the zero-glue pack test once had)
    monkeypatch.setenv("SKELSPLAT_PALLAS_SLOTREAD", "eager")
    l_ref, g_ref = jax.tree.map(np.asarray, run())
    monkeypatch.setenv("SKELSPLAT_PALLAS_SLOTREAD", "lazy")
    l_new, g_new = jax.tree.map(np.asarray, run())
    np.testing.assert_array_equal(l_ref, l_new)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        np.testing.assert_array_equal(getattr(g_ref, nm),
                                      getattr(g_new, nm), err_msg=nm)
