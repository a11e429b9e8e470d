import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.core.gaussians import init_params
from skelsplat_tpu.ops import heatmaps
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np


@pytest.fixture(scope="module")
def scene():
    cams, W, H = synthetic_rig(n_views=3, width=96, height=80)
    pts = synthetic_skeleton(6, spread=250.0)
    params = init_params(pts, "h36m", scaling=3.0)
    cov6 = jax.jit(lambda p: p.covariance())(params)
    poses_2d = np.stack([
        project_np(pts, take_cam(cams, v)) for v in range(3)
    ])
    # perturb detections a bit (they come from a 2D detector in reality)
    rng = np.random.default_rng(1)
    poses_2d = poses_2d + rng.normal(0, 1.5, poses_2d.shape)
    return cams, W, H, params, cov6, poses_2d.astype(np.float32)


def test_closed_form_matches_scipy_oracle(scene):
    cams, W, H, params, cov6, poses_2d = scene
    oracle = heatmaps.generate_heatmaps_scipy(
        params.xyz, cov6, poses_2d, cams, W, H)
    spec = jax.jit(
        lambda: heatmaps.heatmap_spec(params.xyz, cov6,
                                      jnp.asarray(poses_2d), cams, W, H)
    )()
    ours = np.asarray(jax.jit(
        lambda s: heatmaps.eval_heatmaps(s, W, H))(spec))
    assert ours.shape == oracle.shape
    assert np.abs(ours - oracle).max() < 2e-5


def test_closed_form_matches_scipy_at_edges():
    """Keypoints at/near the image border exercise the reflect-mode mirrors."""
    cams, W, H = synthetic_rig(n_views=1, width=64, height=48)
    pts = synthetic_skeleton(4, spread=250.0)
    params = init_params(pts, "h36m", scaling=3.0)
    cov6 = jax.jit(lambda p: p.covariance())(params)
    poses_2d = np.array([[[1.0, 2.0], [62.9, 46.2], [0.0, 0.0],
                          [63.0, 0.4]]], dtype=np.float32)
    oracle = heatmaps.generate_heatmaps_scipy(
        params.xyz, cov6, poses_2d, cams, W, H)
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(poses_2d),
                                 cams, W, H)
    ours = np.asarray(heatmaps.eval_heatmaps(spec, W, H))
    assert np.abs(ours - oracle).max() < 2e-5


def test_out_of_frame_detections_clamped(scene):
    cams, W, H, params, cov6, _ = scene
    poses_2d = np.full((3, params.n_joints, 2), -5.0, dtype=np.float32)
    poses_2d[1] = np.array([W + 40.0, H + 20.0])
    oracle = heatmaps.generate_heatmaps_scipy(
        params.xyz, cov6, poses_2d, cams, W, H)
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(poses_2d),
                                 cams, W, H)
    ours = np.asarray(heatmaps.eval_heatmaps(spec, W, H))
    assert np.abs(ours - oracle).max() < 2e-5


def test_normalization_peak_is_one(scene):
    cams, W, H, params, cov6, poses_2d = scene
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(poses_2d),
                                 cams, W, H)
    hm = np.asarray(heatmaps.eval_heatmaps(spec, W, H))
    peaks = hm.reshape(hm.shape[0], hm.shape[1], -1).max(-1)
    assert np.all(peaks > 0.999) and np.all(peaks <= 1.0)
    mins = hm.reshape(hm.shape[0], hm.shape[1], -1).min(-1)
    assert np.all(mins == 0.0)


def test_dropout_zeroes_channels(scene):
    cams, W, H, params, cov6, poses_2d = scene
    mask = heatmaps.dropout_masks(jax.random.PRNGKey(0), 3, params.n_joints)
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(poses_2d),
                                 cams, W, H, drop_mask=mask)
    hm = np.asarray(heatmaps.eval_heatmaps(spec, W, H))
    m = np.asarray(mask)
    assert m.sum() > 0
    for v in range(3):
        for j in range(params.n_joints):
            if m[v, j]:
                assert hm[v, j].max() == 0.0
            else:
                assert hm[v, j].max() > 0.99


def test_dropout_masks_torch_matches_reference_draw():
    """The host-side dropout draw must consume the torch GLOBAL CPU RNG
    exactly like the reference (general_utils.py:267-282 under
    torch.manual_seed(0)): two randint calls per scene, scenes in order,
    camera range hardcoded to 4."""
    import torch

    n_joints = 17
    torch.manual_seed(0)
    refs = []
    for _ in range(3):          # three consecutive scenes
        dropout_cams = torch.randint(4, (3,))
        dropout_joints = torch.randint(n_joints, (3,))
        mask = np.zeros((4, n_joints), bool)
        for i_cam in range(4):
            if i_cam in dropout_cams:       # tensor __contains__, as in ref
                joints_to_use = list(filter(
                    lambda x: x not in dropout_joints, range(n_joints)))
                for j in range(n_joints):
                    mask[i_cam, j] = j not in joints_to_use
        refs.append(mask)

    torch.manual_seed(0)
    for ref in refs:
        got = heatmaps.dropout_masks_torch(4, n_joints)
        np.testing.assert_array_equal(got, ref)


def test_channel_eval_matches_full(scene):
    cams, W, H, params, cov6, poses_2d = scene
    spec = heatmaps.heatmap_spec(params.xyz, cov6, jnp.asarray(poses_2d),
                                 cams, W, H)
    full = np.asarray(heatmaps.eval_heatmaps(spec, W, H))
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    ch = np.asarray(heatmaps.eval_heatmap_channel(spec, 2, 4, ys, xs, W, H))
    assert np.allclose(ch, full[2, 4], atol=1e-6)
