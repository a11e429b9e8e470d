"""Loss registry — functional port of utils/loss_utils.py + utils/__init__.py.

Every loss keeps the reference signature
``(rendering, gt_heatmap, gt_2d, lambda_loss, reduction)`` over one view's
(C,H,W) rendering, but returns a uniform ``(loss, error_map)`` pair — the
reference's registry is inconsistent (only ``l2_gaussian`` returns the tuple
train.py:150 unpacks; the other losses would crash there). ``error_map`` is
None where the reference has no map.

Masked losses use the sum/count formulation instead of boolean indexing
(dynamic shapes don't jit); identical value: mean over masked elements.

Every loss also accepts an optional ``domain=(width, height)`` (static or
traced scalars) giving the view's TRUE image extent when the (C,H,W) arrays
are zero-padded to a rig-wide static shape (H36M mixes 1000/1002-wide
cameras). The reference computes per-view at the true size; with ``domain``
set, softargmax excludes the pad pixels from its softmax and rescales
coordinates by the true extents, and plain-mean reductions divide by the
true pixel count. Masked (union-of-support) losses are domain-invariant —
both maps are zero on the pad — so they ignore it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def softargmax2d(inp, beta=100, domain=None):
    """Spatial soft-argmax (loss_utils.py:41-64): softmax(β·x) over flattened
    H·W, expectation of normalized coordinates, rescaled to pixels. Returns
    (..., 2) as (col, row) to match the reference's [result_c, result_r].

    With ``domain=(wt, ht)``, pad pixels outside the true extent are masked
    out of the softmax (−inf logits → zero mass) and the coordinate grids
    normalize by the true (ht, wt) — equal to running the reference on the
    unpadded view."""
    *lead, h, w = inp.shape
    flat = inp.reshape(*lead, h * w)
    if domain is None:
        p = jax.nn.softmax(beta * flat, axis=-1)
        rr = jnp.linspace(0, 1, h)[:, None].repeat(w, axis=1).reshape(h * w)
        cc = jnp.linspace(0, 1, w)[None, :].repeat(h, axis=0).reshape(h * w)
        result_r = jnp.sum(p * rr, axis=-1) * (h - 1)
        result_c = jnp.sum(p * cc, axis=-1) * (w - 1)
    else:
        wt, ht = domain
        inside = ((jnp.arange(h)[:, None] < ht)
                  & (jnp.arange(w)[None, :] < wt)).reshape(h * w)
        p = jax.nn.softmax(jnp.where(inside, beta * flat, -jnp.inf), axis=-1)
        rows = (jnp.arange(h, dtype=jnp.float32)[:, None]
                .repeat(w, axis=1).reshape(h * w))
        cols = (jnp.arange(w, dtype=jnp.float32)[None, :]
                .repeat(h, axis=0).reshape(h * w))
        # pad coordinates carry zero mass, so the un-normalized index
        # expectation equals linspace(0,1,ht)·(ht−1) on the true subimage
        result_r = jnp.sum(p * rows, axis=-1)
        result_c = jnp.sum(p * cols, axis=-1)
    return jnp.stack([result_c, result_r], axis=-1)


def _reduce(x, reduction, domain=None):
    if reduction == "mean":
        if domain is not None and x.ndim >= 3:
            # mean over the TRUE pixel count; x is zero on the pad
            wt, ht = domain
            cnt = (x.size // (x.shape[-1] * x.shape[-2])) * ht * wt
            return jnp.sum(x) / cnt
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def _masked(err, rendering, gt_heatmap, reduction):
    """union-of-support mask (loss_utils.py:88-91): gt>0 | rendering>0."""
    mask = (gt_heatmap > 0) | (rendering > 0)
    if reduction == "mean":
        cnt = jnp.maximum(jnp.sum(mask), 1)
        return jnp.sum(jnp.where(mask, err, 0.0)) / cnt
    if reduction == "sum":
        return jnp.sum(jnp.where(mask, err, 0.0))
    return jnp.where(mask, err, 0.0)


# --- heatmap-space losses -------------------------------------------------

def l1_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0, reduction="mean",
            domain=None):
    return _reduce(jnp.abs(rendering - gt_heatmap), reduction, domain), None


def l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0, reduction="mean",
            domain=None):
    pred = softargmax2d(rendering, domain=domain)
    return _reduce((pred - gt_2d) ** 2, reduction), None


def l2_loss_gaussian(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                     reduction="mean", domain=None):
    """The configured default (loss_utils.py:86-100): masked MSE over the
    union of nonzero pixels; also returns the dense error map."""
    err = (rendering - gt_heatmap) ** 2
    return _masked(err, rendering, gt_heatmap, reduction), err


def l1_loss_gaussian(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                     reduction="mean", domain=None):
    err = jnp.abs(rendering - gt_heatmap)
    return _masked(err, rendering, gt_heatmap, reduction), err


def l2_loss_gaussian_l1_loss_gaussian(rendering, gt_heatmap, gt_2d,
                                      lambda_loss=1.0, reduction="mean",
                                      domain=None):
    l2m, _ = l2_loss_gaussian(rendering, gt_heatmap, gt_2d, lambda_loss,
                              reduction="none")
    l1m, _ = l1_loss_gaussian(rendering, gt_heatmap, gt_2d, lambda_loss,
                              reduction="none")
    # reference reduces the masked maps; with the sum/count form the masked
    # "none" maps are already zero off-mask, so mean-over-mask = sum/cnt
    mask = (gt_heatmap > 0) | (rendering > 0)
    cnt = jnp.maximum(jnp.sum(mask), 1)
    if reduction == "mean":
        return ((1.0 - lambda_loss) * jnp.sum(l2m) / cnt
                + lambda_loss * jnp.sum(l1m) / cnt), None
    if reduction == "sum":
        return ((1.0 - lambda_loss) * jnp.sum(l2m)
                + lambda_loss * jnp.sum(l1m)), None
    return (1.0 - lambda_loss) * l2m + lambda_loss * l1m, None


def l2_loss_sqrt(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                 reduction="mean", domain=None):
    pred = softargmax2d(rendering, domain=domain)
    loss = jnp.sqrt(jnp.sum((pred - gt_2d) ** 2))
    return _reduce(loss, reduction), None


def huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0, delta=1.0,
               reduction="mean", domain=None):
    """The reference's (idiosyncratic) huber (loss_utils.py:141-150):
    |e|≤δ → e², else |δ−|e|| − δ/2."""
    pred = softargmax2d(rendering, domain=domain)
    error = jnp.abs(pred - gt_2d)
    loss = jnp.where(error <= delta, error ** 2,
                     jnp.abs(delta - error) - 0.5 * delta)
    return _reduce(loss, reduction), None


def l1_l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
               reduction="mean", domain=None):
    if reduction == "mean":
        l1, _ = l1_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "mean",
                        domain)
        l2, _ = l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "mean",
                        domain)
        return (1.0 - lambda_loss) * l1 + lambda_loss * l2, None
    l1, _ = l1_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "none", domain)
    l2, _ = l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "none", domain)
    if reduction == "sum":
        return (1.0 - lambda_loss) * jnp.sum(l1) + lambda_loss * jnp.sum(l2), None
    return (1.0 - lambda_loss) * l1 + lambda_loss * l2, None


def l1_huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0, delta=1.0,
                  reduction="mean", domain=None):
    if reduction == "mean":
        l1, _ = l1_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "mean",
                        domain)
        hu, _ = huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss, delta,
                           "mean", domain)
        return (1.0 - lambda_loss) * l1 + lambda_loss * hu, None
    l1, _ = l1_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "none", domain)
    hu, _ = huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss, delta,
                       "none", domain)
    if reduction == "sum":
        return (1.0 - lambda_loss) * jnp.sum(l1) + lambda_loss * jnp.sum(hu), None
    return (1.0 - lambda_loss) * l1 + lambda_loss * hu, None


def l1_loss_masked(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                   reduction="mean", domain=None):
    err = jnp.abs(rendering - gt_heatmap)
    return _masked(err, rendering, gt_heatmap, reduction), None


def l1_masked_l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                      reduction="mean", domain=None):
    l1m, _ = l1_loss_masked(rendering, gt_heatmap, gt_2d, lambda_loss, "none")
    l2, _ = l2_loss(rendering, gt_heatmap, gt_2d, lambda_loss, "none", domain)
    mask = (gt_heatmap > 0) | (rendering > 0)
    cnt = jnp.maximum(jnp.sum(mask), 1)
    if reduction == "mean":
        return ((1.0 - lambda_loss) * jnp.sum(l1m) / cnt
                + lambda_loss * jnp.mean(l2)), None
    if reduction == "sum":
        return (1.0 - lambda_loss) * jnp.sum(l1m) + lambda_loss * jnp.sum(l2), None
    return (1.0 - lambda_loss) * l1m + lambda_loss * l2, None


def l1_masked_huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                         delta=1.0, reduction="mean", domain=None):
    l1m, _ = l1_loss_masked(rendering, gt_heatmap, gt_2d, lambda_loss, "none")
    hu, _ = huber_loss(rendering, gt_heatmap, gt_2d, lambda_loss, delta,
                       "none", domain)
    mask = (gt_heatmap > 0) | (rendering > 0)
    cnt = jnp.maximum(jnp.sum(mask), 1)
    if reduction == "mean":
        return ((1.0 - lambda_loss) * jnp.sum(l1m) / cnt
                + lambda_loss * jnp.mean(hu)), None
    if reduction == "sum":
        return (1.0 - lambda_loss) * jnp.sum(l1m) + lambda_loss * jnp.sum(hu), None
    return (1.0 - lambda_loss) * l1m + lambda_loss * hu, None


def cauchy_loss(rendering, gt_heatmap, gt_2d, lambda_loss=1.0,
                reduction="mean", domain=None):
    pred = softargmax2d(rendering, domain=domain)
    residual = pred - gt_2d
    return _reduce(jnp.log(1 + residual ** 2), reduction), None


# --- 3D consistency losses (loss_utils.py:226-254) ------------------------

# limb endpoint joint-index pairs per dataset: (l_arm, r_arm, l_leg, r_leg)
LIMB_PAIRS = {
    "h36m": ((12, 13), (15, 16), (5, 6), (2, 3)),
    "panoptic": ((4, 5), (10, 11), (7, 8), (13, 14)),
    "occlusion-person": ((10, 11), (13, 14), (5, 6), (2, 3)),
}


def limb_3d_consistency_loss(gaussians_xyz, scene_type, reduction="mean"):
    """|‖l_arm‖−‖r_arm‖| + |‖l_leg‖−‖r_leg‖| limb-length symmetry prior."""
    (la, ra, ll, rl) = LIMB_PAIRS[scene_type]
    def limb(pair):
        return jnp.linalg.norm(gaussians_xyz[pair[0]] - gaussians_xyz[pair[1]])
    return jnp.abs(limb(la) - limb(ra)) + jnp.abs(limb(ll) - limb(rl))


def no_consistency(gaussians_xyz, scene_type, reduction="mean"):
    return jnp.asarray(0.0, dtype=jnp.float32)


losses = {
    "l1": l1_loss,
    "l2": l2_loss,
    "l2_sqrt": l2_loss_sqrt,
    "huber": huber_loss,
    "l1_l2": l1_l2_loss,
    "l1_huber": l1_huber_loss,
    "l1_masked": l1_loss_masked,
    "l1_masked_l2": l1_masked_l2_loss,
    "l1_masked_huber": l1_masked_huber_loss,
    "cauchy": cauchy_loss,
    "l2_gaussian": l2_loss_gaussian,
    "l2_gaussian_l1_gaussian": l2_loss_gaussian_l1_loss_gaussian,
    "l1_gaussian": l1_loss_gaussian,
}

consistency_losses = {
    "3D_length_consistency": limb_3d_consistency_loss,
    "none": no_consistency,
}


def __getattr__(name):
    # early_stopping_strategy lives with the engine but is re-exported here
    # to mirror utils/__init__.py:10-34's single registry module (lazy to
    # avoid an import cycle).
    if name == "early_stopping_strategy":
        from skelsplat_tpu.engine.early_stopping import early_stopping_strategy
        return early_stopping_strategy
    raise AttributeError(name)
