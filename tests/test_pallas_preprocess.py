"""Preprocess-kernel parity: the lane-major Pallas EWA preprocess
(ops/pallas_preprocess.py) vs the jnp closed-form path it replaces —
same IEEE ops in the same order, but compiled separately, so FMA
contraction leaves ~1-ulp element drift: forward pack to ulp tolerance,
hand-derived adjoint vs JAX autodiff to reordering ULPs (interpret mode
on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.core import geometry
from skelsplat_tpu.engine.trainer import init_params_jnp
from skelsplat_tpu.ops import heatmaps, rasterizer
from skelsplat_tpu.ops.pallas_preprocess import (PACK, pack_camera,
                                                 pack_inputs,
                                                 preprocess_pack,
                                                 preprocess_pack_view)
from skelsplat_tpu.ops.pallas_raster import (fused_view_loss_pallas,
                                             pallas_view_bbox,
                                             pallas_view_profiles,
                                             pallas_window_bounds)
from tests.utils import project_np, synthetic_rig, synthetic_skeleton, take_cam

N_J = 17
W, H = 112, 96
NV = 3


@pytest.fixture(scope="module")
def scene():
    cams, _, _ = synthetic_rig(n_views=NV, width=W, height=H)
    rng = np.random.default_rng(11)
    gt = synthetic_skeleton(N_J, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v)) for v in range(NV)])
    init = gt + rng.normal(0, 50, gt.shape).astype(np.float32)
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    # anisotropic perturbation so quats/scales carry real gradients
    params = dataclasses.replace(
        params,
        log_scales=params.log_scales + jnp.asarray(
            rng.normal(0, 0.3, (N_J, 3)).astype(np.float32)),
        quats=params.quats + jnp.asarray(
            rng.normal(0, 0.2, (N_J, 4)).astype(np.float32)))
    spec = heatmaps.heatmap_spec(params.xyz, params.covariance(),
                                 jnp.asarray(p2d.astype(np.float32)),
                                 cams, W, H)
    return cams, gt, p2d.astype(np.float32), init, params, spec


def _view(scene, v):
    cams, gt, p2d, init, params, spec = scene
    cam = take_cam(jax.tree.map(jnp.asarray, cams), v)
    spec_v = jax.tree.map(lambda x: x[v], spec)
    return cam, spec_v, params


def _ulp_eq(a, b, msg):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = np.maximum(np.abs(a), 1e-12)
    finite = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b), msg)
    np.testing.assert_array_equal(a[~finite], b[~finite], msg)
    assert (np.abs(a - b)[finite] / scale[finite]).max() < 1e-6, msg


@pytest.mark.parametrize("antialiasing", [False, True])
def test_pack_rows_bitwise_vs_oracle(scene, antialiasing):
    """G rows 0-16 vs the jnp preprocess + pack assembly: continuous
    rows (pix/conic/opacity/depth) to ulp tolerance (FMA contraction
    differs between the separately compiled programs); quantized rows
    (rect tiles, B, spans) exactly."""
    cam, spec_v, params = _view(scene, 0)
    profiles = pallas_view_profiles(spec_v, W, H)
    G, bbox = preprocess_pack_view(params, cam, spec_v, profiles, W, H,
                                   antialiasing)
    G = np.asarray(G)
    pp = rasterizer.preprocess_gaussians(
        params.xyz, params.covariance(), params.opacity, cam, W, H,
        antialiasing)
    rect = np.asarray(jnp.concatenate(
        [pp.rect_min, pp.rect_max], axis=1).astype(jnp.float32))
    _, _, B, spans = map(np.asarray, profiles)
    _ulp_eq(np.asarray(pp.pix)[:, 0], G[0, :N_J], "pix_x")
    _ulp_eq(np.asarray(pp.pix)[:, 1], G[1, :N_J], "pix_y")
    for k in range(3):
        _ulp_eq(np.asarray(pp.conic)[:, k], G[2 + k, :N_J], f"conic{k}")
    opa = np.asarray(jnp.where(pp.valid, pp.opacity_eff, 0.0))
    _ulp_eq(opa, G[5, :N_J], "opa")
    for k in range(4):
        np.testing.assert_array_equal(G[6 + k, :N_J], rect[:, k])
    np.testing.assert_array_equal(G[10, :N_J], B)
    np.testing.assert_array_equal(G[13, :N_J], spans[:, 0])
    np.testing.assert_array_equal(G[14, :N_J], spans[:, 1])
    key = np.asarray(jnp.where(pp.valid, pp.depth, jnp.inf))
    _ulp_eq(key, G[PACK, :N_J], "sort key")


def test_bbox_bitwise_vs_xla(scene, monkeypatch):
    cam, spec_v, params = _view(scene, 1)
    profiles = pallas_view_profiles(spec_v, W, H)
    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "xla")
    ref = np.asarray(pallas_view_bbox(params, cam, spec_v, W, H,
                                      profiles=profiles))
    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "kernel")
    new = np.asarray(pallas_view_bbox(params, cam, spec_v, W, H,
                                      profiles=profiles))
    np.testing.assert_array_equal(ref, new)


@pytest.mark.parametrize("windowed", [False, True])
def test_loss_bitwise_grads_close(scene, monkeypatch, windowed):
    """End-to-end kernel-preprocess loss vs the XLA preprocess path:
    same pack to ~1 ulp (FMA contraction) -> loss to tight relative
    tolerance; gradients agree to reordering ULPs (the analytic adjoint
    vs autodiff sum orders)."""
    cam, spec_v, params = _view(scene, 0)
    kw = {}
    if windowed:
        profs = pallas_view_profiles(spec_v, W, H)
        offs, fits = pallas_window_bounds(params, cam, spec_v, W, H,
                                          64, 128, profiles=profs)
        kw = dict(profiles=profs, window=offs, win_shape=(64, 128))

    def run():
        return jax.value_and_grad(lambda p: fused_view_loss_pallas(
            p, cam, spec_v, W, H, **kw))(params)

    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "xla")
    l_ref, g_ref = jax.tree.map(np.asarray, run())
    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "kernel")
    l_new, g_new = jax.tree.map(np.asarray, run())
    np.testing.assert_allclose(l_new, l_ref, rtol=1e-5)
    for nm in ["xyz", "log_scales", "quats", "opacity_logit"]:
        a, b = getattr(g_ref, nm), getattr(g_new, nm)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5 * scale,
                                   err_msg=nm)


@pytest.mark.parametrize("antialiasing", [False, True])
def test_adjoint_matches_autodiff_random_cotangent(scene, antialiasing):
    """Direct VJP check: random cotangents on the differentiable pack
    rows (pix/conic/opacity), hand adjoint vs jax.vjp of a jnp replica
    of the same pack."""
    cam, spec_v, params = _view(scene, 2)
    profiles = pallas_view_profiles(spec_v, W, H)
    _, _, B_row, spans = profiles
    cov6 = params.covariance()
    opac = params.opacity

    def kernel_rows(xyz, c6, op):
        inp = pack_inputs(xyz, c6, op, B_row, spans)
        camp = pack_camera(cam, spec_v.width[0], spec_v.height[0],
                           jnp.zeros((2,), jnp.float32))
        G, _ = preprocess_pack(inp, camp, N_J, W, H, antialiasing,
                               None, None, True)
        return G[:6, :N_J]

    def oracle_rows(xyz, c6, op):
        pp = rasterizer.preprocess_gaussians(xyz, c6, op, cam, W, H,
                                             antialiasing)
        opa = jnp.where(pp.valid, pp.opacity_eff, 0.0)
        return jnp.stack([pp.pix[:, 0], pp.pix[:, 1], pp.conic[:, 0],
                          pp.conic[:, 1], pp.conic[:, 2], opa], axis=0)

    rng = np.random.default_rng(5)
    cot = jnp.asarray(rng.normal(0, 1, (6, N_J)).astype(np.float32))
    out_k, vjp_k = jax.vjp(kernel_rows, params.xyz, cov6, opac)
    out_o, vjp_o = jax.vjp(oracle_rows, params.xyz, cov6, opac)
    _ulp_eq(np.asarray(out_o), np.asarray(out_k), "fwd rows")
    for a, b, nm in zip(vjp_o(cot), vjp_k(cot), ["xyz", "cov6", "opa"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6 * scale,
                                   err_msg=nm)


def test_vmapped_over_views(scene, monkeypatch):
    """The kernel path must vmap over views exactly like the XLA path
    (the trainer's per_view_grads shape)."""
    cams, gt, p2d, init, params, spec = scene
    cams_j = jax.tree.map(jnp.asarray, cams)
    spec_j = jax.tree.map(jnp.asarray, spec)

    def losses(p, mode):
        def one(cam, spec_v):
            return fused_view_loss_pallas(p, cam, spec_v, W, H)
        return jax.vmap(one)(cams_j, spec_j)

    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "xla")
    ref = np.asarray(losses(params, "xla"))
    monkeypatch.setenv("SKELSPLAT_PALLAS_PREPROCESS", "kernel")
    new = np.asarray(losses(params, "kernel"))
    np.testing.assert_allclose(new, ref, rtol=1e-5)
