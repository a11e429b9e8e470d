"""Differentiable skeletal Gaussian rasterizer — dense reference implementation.

This is the exact functional transcription of the reference CUDA pipeline
(cuda_rasterizer/forward.cu + rasterizer_impl.cu + auxiliary.h), replacing the
three per-dataset compiled packages (NUM_CHANNELS 17/19/15, config.h:15) with
one channel-generic jnp program:

  preprocess   forward.cu:153-273  (frustum cull, EWA cov2d, conic, tile rect)
  binning      rasterizer_impl.cu:280-321 — for N ≤ 19 static Gaussians the
               scan/radix-sort/tile-range machinery collapses to a single
               depth argsort plus a per-pixel tile-rect gate, which reproduces
               the per-tile visibility of the binned pipeline exactly.
  render       forward.cu:278-401  (front-to-back α·T compositing with the
               0.99 α clamp, 1/255 α cull and T<1e-4 early-out)

Because the per-Gaussian features are the one-hot joint identity
(gaussian_model.py:159-166), channel j of the output receives only Gaussian
j's α·T — the fused production kernels exploit this; the dense path keeps the
general feature matmul for test parity with arbitrary features.

Gradients come from JAX autodiff of this forward, which by construction
matches the reference's hand-written backward (backward.cu implements the
analytic adjoint of the same forward; gate discontinuities carry no gradient
in either system) — with one deliberate exception: the reference chains
through the α = min(0.99, opa·G) clamp unconditionally (backward.cu:619,635),
so the clamp here is a straight-through ``geometry.alpha_clamp`` rather than
a plain ``jnp.minimum``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.cameras import Camera
from skelsplat_tpu.core.gaussians import GaussianParams, one_hot_features


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (forward.cu:153-273)."""

    pix: jnp.ndarray        # (N,2) projected pixel centers
    depth: jnp.ndarray      # (N,) view-space z
    conic: jnp.ndarray      # (N,3) inverse dilated 2D covariance (a,b,c)
    opacity_eff: jnp.ndarray  # (N,) opacity × antialiasing rescale
    radius: jnp.ndarray     # (N,) 3σ screen radius (0 ⇒ culled)
    rect_min: jnp.ndarray   # (N,2) tile rect (int32)
    rect_max: jnp.ndarray   # (N,2)
    valid: jnp.ndarray      # (N,) bool — survives all preprocess culls


def preprocess_gaussians(xyz, cov6, opacity, camera: Camera, W: int, H: int,
                         antialiasing: bool = False) -> Preprocessed:
    """Screen-space preprocess of all N Gaussians for one view."""
    p_view = geometry.view_transform_point(xyz, camera.view4)
    depth = p_view[..., 2]
    in_front = depth > geometry.NEAR_Z                      # auxiliary.h:168

    p_proj = geometry.project_point_full(xyz, camera.full4)
    pix = jnp.stack(
        [geometry.ndc2pix(p_proj[..., 0], camera.width),
         geometry.ndc2pix(p_proj[..., 1], camera.height)], axis=-1)

    cov2d = geometry.ewa_cov2d_render(
        xyz, cov6, camera.view4, camera.focal_x, camera.focal_y,
        camera.tan_fovx, camera.tan_fovy)

    det_cov = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] ** 2
    conic, radius, det_dilated = geometry.cov2d_to_conic_radius(cov2d)

    if antialiasing:                                        # forward.cu:224-227
        h_scaling = jnp.sqrt(jnp.maximum(0.000025, det_cov / det_dilated))
    else:
        h_scaling = jnp.ones_like(det_cov)
    opacity_eff = jnp.reshape(opacity, depth.shape) * h_scaling

    rect_min, rect_max = geometry.tile_rect(pix, radius, W, H)
    area = ((rect_max[..., 0] - rect_min[..., 0])
            * (rect_max[..., 1] - rect_min[..., 1]))

    valid = in_front & (det_dilated != 0.0) & (area > 0)    # forward.cu:232,248
    radius = jnp.where(valid, radius, 0.0)
    return Preprocessed(pix, depth, conic, opacity_eff, radius,
                        rect_min, rect_max, valid)


def composite_weights(pp: Preprocessed, dx, dy, tile_gate):
    """Front-to-back compositing weights for every Gaussian at a pixel set.

    dx, dy: (N, ...) offsets (splat center − pixel); tile_gate: (N, ...) bool.
    Returns (contrib (N,...), order (N,)): contrib[i] is α·T of depth-sorted
    Gaussian i; ``order`` maps sorted slot → original Gaussian index.
    Implements the gate/early-out chain of forward.cu:346-386.
    """
    a_c = pp.conic[..., 0]
    b_c = pp.conic[..., 1]
    c_c = pp.conic[..., 2]
    bshape = (slice(None),) + (None,) * (dx.ndim - 1)
    power = (-0.5 * (a_c[bshape] * dx * dx + c_c[bshape] * dy * dy)
             - b_c[bshape] * dx * dy)
    # straight-through clamp: gradient flows through min(0.99, ·)
    # unconditionally, as in backward.cu:619/635 (see geometry.alpha_clamp)
    alpha = geometry.alpha_clamp(pp.opacity_eff[bshape] * jnp.exp(power))
    gate = (pp.valid[bshape] & (power <= 0.0)
            & (alpha >= geometry.ALPHA_MIN) & tile_gate)

    # Depth sort (stable, matching cub radix sort; invalids sink to the back).
    sort_key = jnp.where(pp.valid, pp.depth, jnp.inf)
    order = jnp.argsort(sort_key)

    a = jnp.where(gate, alpha, 0.0)[order]
    gate_s = gate[order]
    one_minus = 1.0 - a
    # Exclusive cumulative transmittance T_i = Π_{k<i} (1−a_k), computed as a
    # shifted inclusive cumprod so the f32 rounding matches the reference's
    # sequential T *= (1−α) exactly (the threshold tests below sit right at
    # representability edges, e.g. (1−0.99)² < 1e-4 in f32).
    shifted = jnp.concatenate(
        [jnp.ones_like(one_minus[:1]), one_minus[:-1]], axis=0)
    T = jnp.cumprod(shifted, axis=0)
    test = T * one_minus
    # done: first gated slot whose test transmittance drops below T_MIN stops
    # the pixel BEFORE contributing (forward.cu:367-372).
    stop = gate_s & (test < geometry.T_MIN)
    done_before = jnp.cumsum(stop.astype(jnp.int32), axis=0) - stop.astype(jnp.int32)
    live = gate_s & (done_before == 0) & (test >= geometry.T_MIN)
    contrib = jnp.where(live, a * T, 0.0)
    return contrib, order


def rasterize_dense(xyz, cov6, opacity, camera: Camera, W: int, H: int,
                    features: jnp.ndarray | None = None,
                    antialiasing: bool = False):
    """Render the full (C,H,W) heatmap image for one view.

    Returns dict(render, radii, invdepth) mirroring the reference bindings
    (rasterize_points.cu:35-124: out {C,H,W}, radii {N}, invdepth {1,H,W}).
    No background add — the reference comments it out (forward.cu:396).
    """
    n = xyz.shape[0]
    feats = one_hot_features(n) if features is None else features

    pp = preprocess_gaussians(xyz, cov6, opacity, camera, W, H, antialiasing)

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    dx = pp.pix[:, 0][:, None, None] - xs[None, None, :]     # (N,1,W) - bc
    dy = pp.pix[:, 1][:, None, None] - ys[None, :, None]
    dx = jnp.broadcast_to(dx, (n, H, W))
    dy = jnp.broadcast_to(dy, (n, H, W))

    tile_x = (jnp.arange(W, dtype=jnp.int32) // geometry.BLOCK_X)[None, None, :]
    tile_y = (jnp.arange(H, dtype=jnp.int32) // geometry.BLOCK_Y)[None, :, None]
    tg = ((tile_x >= pp.rect_min[:, 0][:, None, None])
          & (tile_x < pp.rect_max[:, 0][:, None, None])
          & (tile_y >= pp.rect_min[:, 1][:, None, None])
          & (tile_y < pp.rect_max[:, 1][:, None, None]))

    contrib, order = composite_weights(pp, dx, dy, tg)

    render = jnp.einsum("nhw,nc->chw", contrib, feats[order],
                        precision=jax.lax.Precision.HIGHEST)
    inv_d = jnp.where(pp.depth[order] != 0.0, 1.0 / pp.depth[order], 0.0)
    invdepth = jnp.einsum("nhw,n->hw", contrib, inv_d,
                          precision=jax.lax.Precision.HIGHEST)
    return {"render": render, "radii": pp.radius, "invdepth": invdepth}


def render(params: GaussianParams, camera: Camera, W: int, H: int,
           scaling_modifier: float = 1.0, antialiasing: bool = False,
           features: jnp.ndarray | None = None):
    """High-level render of a GaussianParams pytree for one view, with the
    [0,1] clamp applied by the reference dispatch
    (gaussian_renderer/__init__.py:28-138, render_h36m/panoptic/op).

    Returns dict(render, radii, depth) — ``visibility_filter`` is radii > 0.
    """
    cov6 = params.covariance(scaling_modifier)
    out = rasterize_dense(params.xyz, cov6, params.opacity, camera, W, H,
                          features=features, antialiasing=antialiasing)
    out["render"] = jnp.clip(out["render"], 0.0, 1.0)
    out["depth"] = out.pop("invdepth")
    out["visibility_filter"] = out["radii"] > 0
    return out
