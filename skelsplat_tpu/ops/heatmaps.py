"""Ground-truth heatmap synthesis from 2D keypoint detections.

The reference builds GT heatmaps once per scene (train.py:91-92) by writing a
255-impulse at each detection pixel and blurring it with an anisotropic
``cupyx.scipy.ndimage.gaussian_filter`` whose per-axis sigmas are the
eigenvalue square roots of the EWA-projected initial covariance
(utils/general_utils.py:175-304). Blurring an impulse with a normalized,
truncated, reflect-padded separable kernel has a closed form — the outer
product of two mirrored 1D truncated-Gaussian profiles — so the TPU version
evaluates heatmap values analytically at any pixel, with no convolution, no
(V,C,H,W) materialization, and exact agreement with the scipy path
(including reflect boundary handling and the int(4σ+0.5) truncation radius).

Two implementations:
  * ``generate_heatmaps_scipy`` — host-side numpy/scipy oracle, a line-for-
    line behavioral transcription of general_utils.py:175-304 (cupy→scipy,
    numerically identical filters);
  * ``heatmap_spec`` + ``eval_heatmaps`` — jit-able closed form used by the
    fused training path; validated against the oracle in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.cameras import Camera

TRUNCATE = 4.0  # scipy.ndimage.gaussian_filter default
AMPLITUDE = 255.0  # impulse value (general_utils.py:285)
NORM_EPS = 1e-8    # normalize_heatmaps (general_utils.py:303)
# Static bound on the truncation radius int(4σ+0.5) for jit; σ beyond
# D_MAX/4 ≈ 24 px would mean a >96-px-σ splat — far outside this workload.
D_MAX = 96


def heatmap_sigmas_for_views(xyz, cov6, cameras: Camera):
    """(V,N) σ1/σ2 via the heatmap-convention EWA projection
    (general_utils.py:190-265). ``cameras`` is a batched Camera (leading V)."""
    def per_view(cam):
        cov2d = geometry.ewa_cov2d_heatmap(
            xyz, cov6, cam.view4, cam.focal_x, cam.focal_y,
            cam.tan_fovx, cam.tan_fovy)
        return geometry.heatmap_sigmas(cov2d)
    s1, s2 = jax.vmap(per_view)(cameras)
    return s1, s2


class HeatmapSpec(NamedTuple):
    """Per-(view, joint) closed-form heatmap description.

    y0/x0: impulse pixel (trunc-then-clamp of the detection,
    general_utils.py:275-278); sigma1 blurs rows (y), sigma2 columns (x);
    r*/sum* the kernel truncation radii and normalizers; mn/mx the
    per-channel extremes used by normalize_heatmaps; amp the channel
    amplitude (0 for dropped-out channels); width/height the per-view true
    image sizes (≤ the static evaluation grid).
    """

    y0: jnp.ndarray
    x0: jnp.ndarray
    sigma1: jnp.ndarray
    sigma2: jnp.ndarray
    r1: jnp.ndarray
    r2: jnp.ndarray
    sum1: jnp.ndarray
    sum2: jnp.ndarray
    mn: jnp.ndarray
    mx: jnp.ndarray
    amp: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray


def _kernel_sum(sigma, r):
    """Σ_{|d|≤r} exp(−d²/2σ²) with dynamic r under a static D_MAX bound."""
    d = jnp.arange(-D_MAX, D_MAX + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (d / sigma[..., None]) ** 2)
    mask = jnp.abs(d) <= r[..., None]
    return jnp.sum(jnp.where(mask, w, 0.0), axis=-1)


def _wtap(d, sigma, r, s):
    """Normalized truncated kernel tap at (possibly non-integer-free) integer
    offset d; 0 outside |d| ≤ r."""
    w = jnp.exp(-0.5 * (d / sigma) ** 2) / s
    return jnp.where(jnp.abs(d) <= r, w, 0.0)


def _profile(y, y0, sigma, r, s, size):
    """Mirrored (reflect-mode) impulse-response profile at row/col ``y``.

    reflect padding maps in[-1-k]=in[k] and in[2·size-1-k]=in[k], so the
    impulse at y0 contributes through its two nearest mirror images as well;
    farther mirrors are beyond the truncation radius for r ≤ size.
    """
    y = y.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    return (_wtap(y - y0f, sigma, r, s)
            + _wtap(y + y0f + 1.0, sigma, r, s)
            + _wtap(y - (2.0 * size - 1.0 - y0f), sigma, r, s))


def heatmap_spec(xyz, cov6, poses_2d, cameras: Camera, W: int, H: int,
                 drop_mask=None) -> HeatmapSpec:
    """Build the closed-form spec for all (V,N) channels.

    poses_2d: (V,N,2) detections in pixels. drop_mask: optional (V,N) bool,
    True ⇒ channel zeroed (training.dropout, general_utils.py:267-282).

    W/H are the STATIC evaluation grid (max over views); the per-view true
    image sizes come from ``cameras.width/height`` (H36M mixes 1000- and
    1002-wide cameras in one rig, dataset_readers.py:68-80) and govern
    detection clamping, reflect mirrors and the normalization extremes.
    """
    sigma1, sigma2 = heatmap_sigmas_for_views(xyz, cov6, cameras)  # (V,N)
    w_v = jnp.reshape(cameras.width, (-1, 1)).astype(jnp.float32)   # (V,1)
    h_v = jnp.reshape(cameras.height, (-1, 1)).astype(jnp.float32)
    # trunc-toward-zero then clamp (torch .long(), general_utils.py:275-278)
    x0 = jnp.clip(jnp.trunc(poses_2d[..., 0]), 0,
                  w_v - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.trunc(poses_2d[..., 1]), 0,
                  h_v - 1).astype(jnp.int32)
    # static D_MAX bounds the jit-able truncation radius; σ beyond D_MAX/4
    # (≈24 px, far outside this workload's splat sizes) would silently lose
    # kernel mass, so clamp the radius and keep the normalization consistent
    # with the clamped support.
    r1 = jnp.minimum(jnp.floor(TRUNCATE * sigma1 + 0.5), D_MAX
                     ).astype(jnp.int32)
    r2 = jnp.minimum(jnp.floor(TRUNCATE * sigma2 + 0.5), D_MAX
                     ).astype(jnp.int32)
    sum1 = _kernel_sum(sigma1, r1)
    sum2 = _kernel_sum(sigma2, r2)

    # Channel extremes for min-max normalization: the 2D image is the outer
    # product of two non-negative 1D profiles, so its min/max factorize.
    # Restricted to each view's true image domain.
    ys = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)
    p1 = _profile(ys[None, None, :], y0[..., None], sigma1[..., None],
                  r1[..., None], sum1[..., None], h_v[..., None])  # (V,N,H)
    p2 = _profile(xs[None, None, :], x0[..., None], sigma2[..., None],
                  r2[..., None], sum2[..., None], w_v[..., None])  # (V,N,W)
    in_h = (ys[None, None, :] < jnp.reshape(cameras.height, (-1, 1, 1)))
    in_w = (xs[None, None, :] < jnp.reshape(cameras.width, (-1, 1, 1)))
    amp = jnp.full(sigma1.shape, AMPLITUDE, dtype=jnp.float32)
    if drop_mask is not None:
        amp = jnp.where(drop_mask, 0.0, amp)
    mn = (amp * jnp.min(jnp.where(in_h, p1, jnp.inf), axis=-1)
          * jnp.min(jnp.where(in_w, p2, jnp.inf), axis=-1))
    mx = (amp * jnp.max(jnp.where(in_h, p1, -jnp.inf), axis=-1)
          * jnp.max(jnp.where(in_w, p2, -jnp.inf), axis=-1))
    wv = jnp.broadcast_to(w_v, y0.shape).astype(jnp.float32)
    hv = jnp.broadcast_to(h_v, y0.shape).astype(jnp.float32)
    return HeatmapSpec(y0, x0, sigma1, sigma2, r1, r2, sum1, sum2, mn, mx,
                       amp, wv, hv)


def eval_heatmap_channel(spec: HeatmapSpec, v, j, ys, xs, W: int, H: int):
    """Evaluate channel (v,j) of the normalized GT heatmap at integer pixel
    rows ``ys`` and cols ``xs`` (broadcastable). Matches
    normalize_heatmaps((255-impulse ⊛ gaussian)) of the reference. Zero
    outside the view's true image domain."""
    p1 = _profile(ys, spec.y0[v, j], spec.sigma1[v, j], spec.r1[v, j],
                  spec.sum1[v, j], spec.height[v, j])
    p2 = _profile(xs, spec.x0[v, j], spec.sigma2[v, j], spec.r2[v, j],
                  spec.sum2[v, j], spec.width[v, j])
    raw = spec.amp[v, j] * p1 * p2
    val = (raw - spec.mn[v, j]) / (spec.mx[v, j] - spec.mn[v, j] + NORM_EPS)
    inside = (ys < spec.height[v, j]) & (xs < spec.width[v, j])
    return jnp.where(inside, val, 0.0)


def eval_heatmaps(spec: HeatmapSpec, W: int, H: int) -> jnp.ndarray:
    """Materialize the full (V,N,H,W) normalized GT heatmap stack (the
    equivalent of the reference's per-scene TensorDict of (N,H,W) images)."""
    V, N = spec.y0.shape
    ys = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)
    p1 = _profile(ys[None, None, :], spec.y0[..., None],
                  spec.sigma1[..., None], spec.r1[..., None],
                  spec.sum1[..., None], spec.height[..., None])  # (V,N,H)
    p2 = _profile(xs[None, None, :], spec.x0[..., None],
                  spec.sigma2[..., None], spec.r2[..., None],
                  spec.sum2[..., None], spec.width[..., None])   # (V,N,W)
    raw = spec.amp[..., None, None] * p1[..., :, None] * p2[..., None, :]
    mn = spec.mn[..., None, None]
    mx = spec.mx[..., None, None]
    val = (raw - mn) / (mx - mn + NORM_EPS)
    inside = ((ys[None, None, :, None] < spec.height[..., None, None])
              & (xs[None, None, None, :] < spec.width[..., None, None]))
    return jnp.where(inside, val, 0.0)


def dropout_masks(key, n_views: int, n_joints: int):
    """Joint-dropout masks: 3 random cameras × 3 random joints zeroed
    (general_utils.py:267-282; the reference hardcodes randint(4) for the
    camera draw — reproduced via the modulo below when n_views == 4).

    Device-traceable variant keyed by a JAX PRNG key (statistical twin).
    The training driver uses ``dropout_masks_torch`` below, which reproduces
    the reference's torch global-RNG draw bitwise.
    """
    kc, kj = jax.random.split(key)
    cams = jax.random.randint(kc, (3,), 0, 4)
    joints = jax.random.randint(kj, (3,), 0, n_joints)
    cam_hit = jnp.any(jnp.arange(n_views)[:, None] == cams[None, :], axis=-1)
    joint_hit = jnp.any(jnp.arange(n_joints)[:, None] == joints[None, :], axis=-1)
    return cam_hit[:, None] & joint_hit[None, :]


def dropout_masks_torch(n_views: int, n_joints: int) -> np.ndarray:
    """Bitwise twin of the reference's per-scene dropout draw
    (general_utils.py:267-271): two ``torch.randint`` calls on the GLOBAL
    torch CPU generator — which ``safe_state`` seeds to 0 exactly like the
    reference's torch.manual_seed(0) (general_utils.py:141) — consumed one
    scene at a time in dataset order. The camera draw range is the
    reference's hardcoded 4 regardless of n_views. Returns a host-side
    (n_views, n_joints) bool mask."""
    import torch

    cams = torch.randint(4, (3,)).numpy()
    joints = torch.randint(n_joints, (3,)).numpy()
    cam_hit = np.any(np.arange(n_views)[:, None] == cams[None, :], axis=-1)
    joint_hit = np.any(
        np.arange(n_joints)[:, None] == joints[None, :], axis=-1)
    return cam_hit[:, None] & joint_hit[None, :]


# ---------------------------------------------------------------------------
# Host-side oracle (numpy + scipy) — transcription of general_utils.py:175-304
# ---------------------------------------------------------------------------

def generate_heatmaps_scipy(xyz, cov6, poses_2d, cameras: Camera,
                            W: int, H: int, drop_mask=None) -> np.ndarray:
    """Reference oracle: (V,N,H,W) via scipy.ndimage.gaussian_filter, exactly
    as the CUDA-side pipeline builds its GT (cupy's gaussian_filter is the
    same algorithm). Used by tests and the debug save_heatmaps path."""
    from scipy.ndimage import gaussian_filter

    s1, s2 = jax.jit(heatmap_sigmas_for_views)(jnp.asarray(xyz),
                                               jnp.asarray(cov6), cameras)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    poses_2d = np.asarray(poses_2d)
    widths = np.asarray(cameras.width).astype(int).reshape(-1)
    heights = np.asarray(cameras.height).astype(int).reshape(-1)
    V, N = s1.shape
    out = np.zeros((V, N, H, W), dtype=np.float32)
    for v in range(V):
        w_v, h_v = widths[v], heights[v]
        x0 = np.clip(np.trunc(poses_2d[v, :, 0]).astype(np.int64), 0, w_v - 1)
        y0 = np.clip(np.trunc(poses_2d[v, :, 1]).astype(np.int64), 0, h_v - 1)
        hm_v = np.zeros((N, h_v, w_v), dtype=np.float32)
        for j in range(N):
            if drop_mask is not None and drop_mask[v, j]:
                continue
            img = np.zeros((h_v, w_v), dtype=np.float32)
            img[y0[j], x0[j]] = AMPLITUDE
            hm_v[j] = gaussian_filter(img, sigma=[s1[v, j], s2[v, j]])
        mn = hm_v.reshape(N, -1).min(axis=-1)[:, None, None]
        mx = hm_v.reshape(N, -1).max(axis=-1)[:, None, None]
        out[v, :, :h_v, :w_v] = (hm_v - mn) / (mx - mn + NORM_EPS)
    return out
