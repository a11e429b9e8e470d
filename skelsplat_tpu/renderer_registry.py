"""The render-function registry (gaussian_renderer/__init__.py:28-371).

The reference selects one of three near-identical functions
(render_h36m/render_panoptic/render_op) by the ``pipeline.rendering`` config
key — each bound to a separately compiled CUDA package whose only difference
is ``NUM_CHANNELS`` (config.h:15). Here one channel-generic renderer serves
all three; the registry preserves the config-driven public API including the
reference's call signature and output dict.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from skelsplat_tpu.ops import rasterizer

RENDERING_CHANNELS = {
    "diff-gaussian-rasterization-h36m": 17,
    "diff-gaussian-rasterization-panoptic": 19,
    "diff-gaussian-rasterization-op": 15,
}


def _make_render(n_channels: int):
    def render_fn(viewpoint_camera, pc, pipe=None, bg_color=None,
                  scaling_modifier=1.0, separate_sh=False,
                  override_color=None, use_trained_exp=False):
        """Reference-signature render (gaussian_renderer/__init__.py:28):
        ``viewpoint_camera`` is a Camera pytree; ``pc`` a GaussianParams or
        the compat GaussianModel. Returns the reference's output dict
        (background add is disabled in the reference kernel, forward.cu:396,
        so ``bg_color`` is accepted and ignored)."""
        params = getattr(pc, "params", pc)
        W = int(np.asarray(viewpoint_camera.width))
        H = int(np.asarray(viewpoint_camera.height))
        features = override_color
        antialiasing = bool(getattr(pipe, "antialiasing", False)) if pipe else False
        out = rasterizer.render(params, viewpoint_camera, W, H,
                                scaling_modifier=scaling_modifier,
                                antialiasing=antialiasing,
                                features=features)
        n = params.n_joints
        if n != n_channels:
            raise ValueError(
                f"renderer expects {n_channels} channels, model has {n} "
                "joints (pipeline.rendering mismatch)")
        return {
            "render": out["render"],
            "viewspace_points": jnp.zeros((n, 3), jnp.float32),
            "visibility_filter": out["visibility_filter"],
            "radii": out["radii"],
            "depth": out["depth"],
        }

    render_fn.__name__ = f"render_{n_channels}ch"
    return render_fn


render_h36m = _make_render(17)
render_panoptic = _make_render(19)
render_op = _make_render(15)

render_functions = {
    "diff-gaussian-rasterization-h36m": render_h36m,
    "diff-gaussian-rasterization-panoptic": render_panoptic,
    "diff-gaussian-rasterization-op": render_op,
}
