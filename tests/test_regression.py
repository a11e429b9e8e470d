"""Seeded end-to-end regression (SURVEY §4 item 4): the deterministic
synthetic-scene optimization must reproduce golden telemetry across
refactors. Values recorded on the CPU backend with f32 math; the tolerance
absorbs BLAS/fusion reordering, not behavioral drift."""

import numpy as np
import pytest

from skelsplat_tpu.core.gaussians import SkeletonModel
from skelsplat_tpu.engine.optim import OptConfig
from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings
from tests.utils import synthetic_rig, synthetic_skeleton, take_cam, project_np

# Re-recorded after the alpha-clamp gradient fix (backward.cu:619/635 chain
# through min(0.99,·) unconditionally; geometry.alpha_clamp): the quirk
# shifts this trajectory by 0.138 mm MPJPE over 100 iterations.
GOLDEN_MPJPE = 52.693695068359375
GOLDEN_LOSS = 0.0450650155544281


@pytest.fixture(scope="module")
def scene():
    cams, _, _ = synthetic_rig(n_views=4, width=112, height=96)
    rng = np.random.default_rng(3)
    gt = synthetic_skeleton(17, rng=rng, spread=300.0)
    p2d = np.stack([project_np(gt, take_cam(cams, v))
                    for v in range(4)]).astype(np.float32)
    init = gt + rng.normal(0, 50, gt.shape).astype(np.float32)
    return cams, gt, p2d, init


@pytest.mark.parametrize("renderer", ["fused", "pallas"])
def test_seeded_end_to_end_golden(scene, renderer):
    cams, gt, p2d, init = scene
    tr = SceneTrainer(SkeletonModel("h36m", 17, scaling=3.0),
                      OptConfig(iterations=100), TrainSettings(),
                      112, 96, renderer=renderer)
    params, hist = tr.optimize_scene(init, p2d, cams, gt)
    mpjpe = float(np.asarray(hist.error)[-1].mean())
    loss = float(np.asarray(hist.losses)[-1].mean())
    assert abs(mpjpe - GOLDEN_MPJPE) < 0.05, mpjpe
    assert abs(loss - GOLDEN_LOSS) < 1e-4, loss


def test_render_functions_registry(scene):
    from skelsplat_tpu.engine.trainer import init_params_jnp
    from skelsplat_tpu.renderer_registry import render_functions

    cams, gt, p2d, init = scene
    import jax
    import jax.numpy as jnp
    cam = take_cam(jax.tree.map(jnp.asarray, cams), 0)
    params = init_params_jnp(jnp.asarray(init), "h36m", 3.0, 1.0)
    out = render_functions["diff-gaussian-rasterization-h36m"](cam, params)
    assert out["render"].shape == (17, 96, 112)
    assert float(out["render"].max()) <= 1.0
    with pytest.raises(ValueError):
        render_functions["diff-gaussian-rasterization-panoptic"](cam, params)


def test_legacy_arguments_groups():
    from argparse import ArgumentParser

    from skelsplat_tpu.arguments import (ModelParams, OptimizationParams,
                                         PipelineParams)

    parser = ArgumentParser()
    mp = ModelParams(parser)
    pp = PipelineParams(parser)
    op = OptimizationParams(parser)
    args = parser.parse_args(["--source_path", "/x", "-r", "2",
                              "--iterations", "100"])
    g = mp.extract(args)
    assert g.source_path == "/x" and g.resolution == 2
    g2 = op.extract(args)
    assert g2.iterations == 100 and g2.scaling_lr == 0.005
    g3 = pp.extract(args)
    assert g3.antialiasing is False


def test_cfg_args_namespace_parsing(tmp_path, monkeypatch):
    """get_combined_args merges a saved cfg_args Namespace repr with the
    CLI (upstream semantics), parsed via ast — not eval."""
    from argparse import ArgumentParser

    from skelsplat_tpu.arguments import (ModelParams, get_combined_args,
                                         parse_namespace_repr)

    ns = parse_namespace_repr(
        "Namespace(sh_degree=2, source_path='/data', eval=True)")
    assert ns.sh_degree == 2 and ns.source_path == "/data" and ns.eval

    with pytest.raises(ValueError):
        parse_namespace_repr("__import__('os').system('true')")

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "cfg_args").write_text(
        "Namespace(source_path='/saved', resolution=4, images='imgs')")
    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    monkeypatch.setattr("sys.argv",
                        ["prog", "--model_path", str(model_dir),
                         "--resolution", "2"])
    merged = get_combined_args(parser)
    assert merged.source_path == "/saved"   # from cfg_args
    assert merged.resolution == 2           # CLI override wins
    assert merged.images == "imgs"
