"""Fused render + GT-heatmap + masked-MSE loss.

The reference's hot loop materializes, per view, a (C,H,W) rendering and a
(C,H,W) GT heatmap stack and then reduces them to one scalar
(train.py:140-150). On TPU that is pure HBM-bandwidth waste: the GT heatmap
has a closed form (ops/heatmaps.py) and the rendering is a short per-pixel
compositing chain over N ≤ 19 static Gaussians — so the entire l2_gaussian
loss collapses to a streaming reduction over pixels with zero image-sized
HBM traffic.

This module computes, for one view,

    S = Σ_{c,y,x} [mask]·(render − gt)²  with mask = (gt>0) | (render>0)
    C = Σ mask
    loss = S / max(C,1)                       (loss_utils.py:86-100)

by scanning over row-chunks; each chunk's (N, rows, W) intermediates live in
registers/VMEM and are rematerialized in the backward pass
(``jax.checkpoint``), keeping the whole 500-iteration optimization's memory
footprint at a few MB. A Pallas kernel with identical semantics can be
swapped in behind the same signature (see ops/pallas_raster.py).

Exactness: tests assert this path's loss equals the dense
rasterize→eval_heatmaps→l2_gaussian value bit-for-near-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skelsplat_tpu import losses as loss_registry
from skelsplat_tpu.core import geometry
from skelsplat_tpu.ops import heatmaps as hm
from skelsplat_tpu.ops import rasterizer

# losses the fused path implements; everything else falls back to dense
FUSED_LOSSES = ("l2_gaussian", "l1_gaussian", "l1_masked")


def fused_view_loss_available(loss_function: str,
                              consistency_loss: str) -> bool:
    return loss_function in FUSED_LOSSES


def _chunk_sums(pp: rasterizer.Preprocessed, spec_v, y0: jnp.ndarray,
                rows: int, W: int, H: int, loss_function: str):
    """Masked error sum + mask count for image rows [y0, y0+rows).

    spec_v: HeatmapSpec sliced to one view (leaves (N,)).
    """
    n = pp.pix.shape[0]
    ys = y0 + jnp.arange(rows, dtype=jnp.int32)          # (rows,)
    xs = jnp.arange(W, dtype=jnp.int32)                  # (W,)
    # per-view true image domain (H36M mixes 1000/1002-wide cameras)
    in_img = ((ys < spec_v.height[0])[None, :, None]
              & (xs < spec_v.width[0])[None, None, :])

    dx = pp.pix[:, 0][:, None, None] - xs.astype(jnp.float32)[None, None, :]
    dy = pp.pix[:, 1][:, None, None] - ys.astype(jnp.float32)[None, :, None]

    tile_x = (xs // geometry.BLOCK_X)[None, None, :]
    tile_y = (ys // geometry.BLOCK_Y)[None, :, None]
    tg = ((tile_x >= pp.rect_min[:, 0][:, None, None])
          & (tile_x < pp.rect_max[:, 0][:, None, None])
          & (tile_y >= pp.rect_min[:, 1][:, None, None])
          & (tile_y < pp.rect_max[:, 1][:, None, None]))

    contrib, order = rasterizer.composite_weights(
        pp, jnp.broadcast_to(dx, (n, rows, W)),
        jnp.broadcast_to(dy, (n, rows, W)), tg)
    # contrib is in depth-sorted slots; channel c = original index → invert
    inv = jnp.argsort(order)
    render = jnp.clip(contrib[inv], 0.0, 1.0)            # (N, rows, W)

    # closed-form GT for all channels of this view over the chunk
    p1 = hm._profile(ys[None, :], spec_v.y0[:, None], spec_v.sigma1[:, None],
                     spec_v.r1[:, None], spec_v.sum1[:, None],
                     spec_v.height[:, None])
    p2 = hm._profile(xs[None, :], spec_v.x0[:, None], spec_v.sigma2[:, None],
                     spec_v.r2[:, None], spec_v.sum2[:, None],
                     spec_v.width[:, None])
    raw = spec_v.amp[:, None, None] * p1[:, :, None] * p2[:, None, :]
    mn = spec_v.mn[:, None, None]
    mx = spec_v.mx[:, None, None]
    gt = (raw - mn) / (mx - mn + hm.NORM_EPS)            # (N, rows, W)

    mask = ((gt > 0) | (render > 0)) & in_img
    if loss_function in ("l1_gaussian", "l1_masked"):
        err = jnp.abs(render - gt)
    else:
        err = (render - gt) ** 2
    s = jnp.sum(jnp.where(mask, err, 0.0))
    c = jnp.sum(mask)
    return s, c


def fused_view_loss(params, cam, spec_v, W: int, H: int,
                    loss_function: str = "l2_gaussian",
                    antialiasing: bool = False,
                    rows_per_chunk: int = 64):
    """Masked heatmap loss of one view, streamed over row chunks."""
    cov6 = params.covariance()
    pp = rasterizer.preprocess_gaussians(
        params.xyz, cov6, params.opacity, cam, W, H, antialiasing)

    n_chunks = -(-H // rows_per_chunk)

    @jax.checkpoint
    def body(carry, y0):
        s, c = _chunk_sums(pp, spec_v, y0, rows_per_chunk, W, H,
                           loss_function)
        return (carry[0] + s, carry[1] + c), None

    y0s = jnp.arange(n_chunks, dtype=jnp.int32) * rows_per_chunk
    (S, C), _ = jax.lax.scan(body, (jnp.asarray(0.0), jnp.asarray(0)), y0s)
    return S / jnp.maximum(C, 1).astype(jnp.float32)


def make_fused_view_loss(model, settings, W: int, H: int,
                         antialiasing: bool = False):
    """Build the per-view total loss (heatmap term + λ·consistency) with the
    SceneTrainer's (params, cam, spec_v, pose_2d_v) signature."""
    cons_fn = loss_registry.consistency_losses[settings.consistency_loss]

    def view_loss(params, cam, spec_v, pose_2d_v):
        main = fused_view_loss(params, cam, spec_v, W, H,
                               settings.loss_function, antialiasing)
        cons = cons_fn(params.xyz, model.scene_type, reduction="mean")
        return main + cons * settings.lambda_consistency

    return view_loss
