import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.gaussians import init_params
from skelsplat_tpu.ops import rasterizer
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np


@pytest.fixture(scope="module")
def scene():
    cams, W, H = synthetic_rig(n_views=2, width=96, height=80)
    pts = synthetic_skeleton(5, spread=250.0)
    params = init_params(pts, "h36m", scaling=3.0)
    return cams, W, H, params


def _render(params, cam, W, H):
    return jax.jit(
        lambda p: rasterizer.render(p, cam, W, H)
    )(params)


def test_render_shapes_and_range(scene):
    cams, W, H, params = scene
    out = _render(params, take_cam(cams, 0), W, H)
    n = params.n_joints
    assert out["render"].shape == (n, H, W)
    assert out["radii"].shape == (n,)
    assert out["depth"].shape == (H, W)
    r = np.asarray(out["render"])
    assert np.all(r >= 0) and np.all(r <= 1)
    assert r.max() > 0.5  # splats actually visible


def test_one_hot_channel_isolation(scene):
    """Channel j must only receive Gaussian j (one-hot features)."""
    cams, W, H, params = scene
    cam = take_cam(cams, 0)
    out_full = np.asarray(_render(params, cam, W, H)["render"])
    # Move gaussian 2 behind the camera: only channel 2 may change.
    import dataclasses
    xyz = np.asarray(params.xyz).copy()
    cam_center = np.asarray(cam.cam_center)
    view = np.asarray(cam.view4)
    # place far behind camera (negative view z)
    back = cam_center - 5000.0 * (view[2, :3] / np.linalg.norm(view[2, :3]))
    xyz[2] = back
    p2 = dataclasses.replace(params, xyz=jnp.asarray(xyz))
    out2 = np.asarray(_render(p2, cam, W, H)["render"])
    assert np.asarray(out2[2]).max() == 0.0
    # With T-chain, removing an occluder CAN brighten other channels, but
    # only where gaussian 2 overlapped; elsewhere identical.
    alpha2_support = out_full[2] > 0
    for ch in [0, 1, 3, 4]:
        diff = np.abs(out2[ch] - out_full[ch])
        assert np.all(diff[~alpha2_support] < 1e-6)


def test_single_gaussian_analytic_alpha():
    """One isotropic Gaussian: peak pixel value must equal
    min(0.99, exp(power)) with the analytic conic."""
    cams, W, H = synthetic_rig(n_views=1, width=64, height=64)
    cam = take_cam(cams, 0)
    pts = np.array([[0.0, 0.0, 800.0]], dtype=np.float32)
    params = init_params(pts, "h36m", scaling=3.0)
    cov6 = params.covariance()
    pp = jax.jit(
        lambda: rasterizer.preprocess_gaussians(
            params.xyz, cov6, params.opacity, cam, W, H)
    )()
    assert bool(pp.valid[0])
    out = np.asarray(_render(params, cam, W, H)["render"])[0]
    py, px = np.unravel_index(np.argmax(out), out.shape)
    cx, cy = float(pp.pix[0, 0]), float(pp.pix[0, 1])
    dx, dy = cx - px, cy - py
    a, b, c = (float(x) for x in np.asarray(pp.conic[0]))
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    expected = min(0.99, float(params.opacity[0, 0]) * np.exp(power))
    assert np.isclose(out[py, px], expected, rtol=1e-5)


def test_depth_order_occlusion():
    """Two coincident-screen Gaussians: the nearer one keeps α·1, the farther
    gets α·(1−α_near) — exact front-to-back compositing."""
    cams, W, H = synthetic_rig(n_views=1, width=64, height=64)
    cam = take_cam(cams, 0)
    cc = np.asarray(cam.cam_center)
    view = np.asarray(cam.view4)
    fwd = view[2, :3]
    # two points along the optical ray → identical projection
    base = np.array([0.0, 0.0, 800.0])
    d0 = float(fwd @ base + view[2, 3])
    p_near = base - 100.0 * fwd
    p_far = base + 100.0 * fwd
    pts = np.stack([p_far, p_near]).astype(np.float32)  # index 0 = far
    params = init_params(pts, "h36m", scaling=3.0)
    out = np.asarray(_render(params, cam, W, H)["render"])
    py, px = np.unravel_index(np.argmax(out[1]), out[1].shape)
    a_near = out[1, py, px]
    a_far = out[0, py, px]
    # far channel = α_far · (1 − α_near) at the shared center
    cov6 = params.covariance()
    pp = jax.jit(
        lambda: rasterizer.preprocess_gaussians(
            params.xyz, cov6, params.opacity, cam, W, H)
    )()

    def alpha_at(i):
        dx = float(pp.pix[i, 0]) - px
        dy = float(pp.pix[i, 1]) - py
        a, b, c = (float(x) for x in np.asarray(pp.conic[i]))
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        return min(0.99, np.exp(power))

    assert np.isclose(a_near, alpha_at(1), rtol=1e-4)
    assert np.isclose(a_far, alpha_at(0) * (1 - alpha_at(1)), rtol=1e-4)


def test_early_out_T_min():
    """Three stacked opaque Gaussians: after two α=0.99 hits, T = 1e-4 and the
    third must contribute exactly 0 (forward.cu:367-372)."""
    cams, W, H = synthetic_rig(n_views=1, width=64, height=64)
    cam = take_cam(cams, 0)
    cc = np.asarray(cam.cam_center)
    base = np.array([0.0, 0.0, 800.0])
    ray = (base - cc) / np.linalg.norm(base - cc)
    # three points on the same camera ray → identical projections
    pts = np.stack([base + 600.0 * ray, base - 600.0 * ray, base]).astype(np.float32)
    params = init_params(pts, "h36m", scaling=6.0)  # huge, α-clamped splats
    out = np.asarray(_render(params, cam, W, H)["render"])
    # channel of farthest gaussian (index 0) at the common center
    py, px = np.unravel_index(np.argmax(out[1]), out[1].shape)
    near, mid, far = out[1, py, px], out[2, py, px], out[0, py, px]
    assert near == np.float32(0.99)  # clamped α, T=1
    # f32: T after the first hit is 1−0.99 ≈ 0.00999999978, and the test
    # transmittance for the SECOND hit is (1−0.99)² ≈ 9.9999e-5 < 1e-4 —
    # so the early-out already fires at the second splat, exactly as the
    # reference's sequential f32 chain does (forward.cu:367-372).
    assert mid == 0.0
    assert far == 0.0


def test_frustum_cull_zero_radii(scene):
    cams, W, H, params = scene
    cam = take_cam(cams, 0)
    import dataclasses
    xyz = np.asarray(params.xyz).copy()
    cc = np.asarray(cam.cam_center)
    view = np.asarray(cam.view4)
    xyz[0] = cc - 100.0 * view[2, :3]  # behind camera
    p = dataclasses.replace(params, xyz=jnp.asarray(xyz))
    out = _render(p, cam, W, H)
    assert float(out["radii"][0]) == 0.0
    assert not bool(out["visibility_filter"][0])


def test_gradients_flow_and_finite(scene):
    cams, W, H, params = scene
    cam = take_cam(cams, 0)
    target = np.asarray(_render(params, cam, W, H)["render"])

    def loss_fn(p):
        out = rasterizer.render(p, cam, W, H)
        return jnp.mean((out["render"] - jnp.asarray(target) * 0.5) ** 2)

    g = jax.jit(jax.grad(loss_fn))(params)
    for leaf in [g.xyz, g.log_scales, g.quats]:
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr))
    assert np.abs(np.asarray(g.xyz)).max() > 0
    assert np.abs(np.asarray(g.log_scales)).max() > 0
    # opacity logit pinned at saturation → exactly zero grad (reference
    # parity: inverse_sigmoid(1.0) = inf gives zero grads in torch)
    assert np.abs(np.asarray(g.opacity_logit)).max() == 0.0


def test_clamped_alpha_gradient_quirk():
    """The reference backward chains through α = min(0.99, opa·G)
    unconditionally (backward.cu:619 dL_dG=opa·dL_dα, :635 dL_dopacity=
    G·dL_dα): a saturated splat's clamped pixels still feed gradient to
    mean2D/conic/opacity. geometry.alpha_clamp reproduces this; a plain
    jnp.minimum would zero it."""
    cams, W, H = synthetic_rig(n_views=1, width=64, height=64)
    cam = take_cam(cams, 0)
    pts = synthetic_skeleton(1, spread=0.0)
    params = init_params(pts, "h36m", scaling=6.0)  # huge, α-clamped splat
    # confirm the configuration actually clamps: peak pixel at exactly 0.99
    out = np.asarray(_render(params, cam, W, H)["render"])
    yc, xc = np.unravel_index(out[0].argmax(), out[0].shape)
    assert out[0, yc, xc] == np.float32(0.99)

    def center_pixel(xyz):
        import dataclasses
        p = dataclasses.replace(params, xyz=xyz)
        o = rasterizer.render(p, cam, W, H)
        return o["render"][0, yc, xc]

    g = jax.grad(center_pixel)(params.xyz)
    # numerically the clamp is flat here — the reference quirk makes the
    # analytic gradient the UNCLAMPED chain instead, so it must be nonzero
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0.0

    # single splat, T=1, loss=α ⇒ dα/d(opa·E) = 1 via the straight-through
    # clamp; check the analytic value against the reference formula
    # dL_dmean2D ∝ opa·E·(conic terms) evaluated at the UNCLAMPED product.
    cov6 = params.covariance()
    pp = rasterizer.preprocess_gaussians(
        params.xyz, cov6, params.opacity, jax.tree.map(jnp.asarray, cam),
        W, H)
    dx = float(pp.pix[0, 0]) - float(xc)
    dy = float(pp.pix[0, 1]) - float(yc)
    a_c, b_c, c_c = (float(v) for v in pp.conic[0])
    power = -0.5 * (a_c * dx * dx + c_c * dy * dy) - b_c * dx * dy
    opaE = float(pp.opacity_eff[0]) * np.exp(power)
    assert opaE > geometry.ALPHA_MAX  # really clamped at this pixel
    dpix = jax.grad(
        lambda pix: geometry.alpha_clamp(
            pp.opacity_eff[0] * jnp.exp(
                -0.5 * (a_c * (pix[0] - xc) ** 2 + c_c * (pix[1] - yc) ** 2)
                - b_c * (pix[0] - xc) * (pix[1] - yc))))(pp.pix[0])
    expect = np.array([opaE * (-a_c * dx - b_c * dy),
                       opaE * (-c_c * dy - b_c * dx)])
    np.testing.assert_allclose(np.asarray(dpix), expect, rtol=1e-5)


def test_grad_check_numerical():
    """check_grads on a tiny scene (first-order, forward+reverse)."""
    from jax.test_util import check_grads
    cams, W, H = synthetic_rig(n_views=1, width=48, height=40)
    cam = take_cam(cams, 0)
    pts = synthetic_skeleton(3, spread=200.0)
    params = init_params(pts, "h36m", scaling=3.0)
    cov6_static_opacity = params.opacity

    def f(xyz, log_scales, quats):
        cov6 = geometry.build_cov3d(jnp.exp(log_scales), quats)
        out = rasterizer.rasterize_dense(
            xyz, cov6, cov6_static_opacity, cam, W, H)
        return jnp.sum(out["render"] ** 2)

    check_grads(f, (params.xyz, params.log_scales, params.quats),
                order=1, modes=["rev"], atol=5e-2, rtol=5e-2)
