import os

import numpy as np
import pytest

from skelsplat_tpu.compat import BasicPointCloud, GaussianModel, Scene
from skelsplat_tpu.ops import densify
from skelsplat_tpu.engine.optim import AdamGroups, OptConfig
from tests.utils import synthetic_skeleton


class _Args:
    iterations = 500
    position_lr_init = 5e-4
    position_lr_final = 5e-6
    position_lr_delay_mult = 0.0
    position_lr_max_steps = 4000
    feature_lr = 0.0
    opacity_lr = 0.0
    scaling_lr = 5e-3
    rotation_lr = 1e-3


def test_gaussian_model_roundtrip(tmp_path):
    pts = synthetic_skeleton(17)
    gm = GaussianModel(sh_degree=1)
    pcd = BasicPointCloud(pts, np.ones_like(pts), np.zeros_like(pts))
    gm.create_from_pcd(pcd, [], spatial_lr_scale=5000.0, opacity_on=True,
                       scaling=3.0, n_joints=17, scaling_modifier=1.0)
    gm.training_setup(_Args())
    assert np.allclose(np.asarray(gm.get_xyz), pts)
    assert np.allclose(np.asarray(gm.get_scaling), np.exp(3.0), atol=1e-4)
    assert np.allclose(np.asarray(gm.get_opacity), 1.0)
    assert np.isclose(gm.update_learning_rate(4), 5e-4 * 5000 *
                      (5e-6 / 5e-4) ** (4 / 4000), rtol=1e-4)
    cov = np.asarray(gm.get_covariance())
    assert cov.shape == (17, 6)

    path = str(tmp_path / "pc" / "point_cloud.ply")
    gm.save_ply(path)
    gm2 = GaussianModel(sh_degree=1)
    gm2.load_ply(path)
    assert np.allclose(np.asarray(gm2.get_xyz), pts, atol=1e-6)
    assert np.allclose(np.asarray(gm2.params.log_scales),
                       np.asarray(gm.params.log_scales))
    # capture/restore
    snap = gm.capture()
    gm3 = GaussianModel(sh_degree=1)
    gm3.restore(snap, _Args())
    assert np.allclose(np.asarray(gm3.get_xyz), pts)


def test_densify_and_prune_shapes():
    import jax.numpy as jnp
    from skelsplat_tpu.core.gaussians import init_params

    pts = synthetic_skeleton(17)
    params = init_params(pts, "h36m", scaling=3.0)
    adam = AdamGroups(OptConfig())
    state = adam.init(params)
    aux = densify.DensifyAux.zeros(17)
    # fake accumulated gradients: joints 0-2 high-grad
    aux.xyz_gradient_accum[:3] = 1.0
    aux.denom[:] = 1.0
    radii = np.full(17, 10.0)
    extent = 5000.0
    # small scale (e^3 ≈ 20 ≪ 0.01·extent=50) → clones
    p2, s2, aux2 = densify.densify_and_prune(
        params, state, aux, max_grad=0.5, min_opacity=0.005, extent=extent,
        max_screen_size=None, radii=radii)
    assert p2.xyz.shape[0] == 20  # 17 + 3 clones
    assert np.asarray(s2.m.xyz).shape[0] == 20
    # large extent threshold → splits instead
    aux3 = densify.DensifyAux.zeros(17)
    aux3.xyz_gradient_accum[:2] = 1.0
    aux3.denom[:] = 1.0
    p3, s3, _ = densify.densify_and_prune(
        params, state, aux3, max_grad=0.5, min_opacity=0.005, extent=100.0,
        max_screen_size=None, radii=radii)
    # 2 split parents pruned, 2×2 children added
    assert p3.xyz.shape[0] == 17 - 2 + 4


def test_reset_opacity():
    from skelsplat_tpu.core.gaussians import init_params

    pts = synthetic_skeleton(5)
    params = init_params(pts, "h36m", scaling=3.0)
    adam = AdamGroups(OptConfig())
    state = adam.init(params)
    p2, s2 = densify.reset_opacity(params, state)
    assert np.all(np.asarray(p2.opacity) <= 0.0101)
