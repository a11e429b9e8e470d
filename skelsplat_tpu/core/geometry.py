"""Camera / projection / EWA-splatting geometry — the single source of truth.

The reference implements this math three times (numpy in utils/graphics_utils.py,
batched torch in utils/general_utils.py:175-265, CUDA in
cuda_rasterizer/forward.cu:74-150 + auxiliary.h). Here it lives once, in two
deliberate flavors where the reference's duplicates genuinely disagree:

* ``ewa_cov2d_render``  — the rasterizer's convention
  (forward.cu:74-108: cov = (J·W) Σ (J·W)ᵀ),
* ``ewa_cov2d_heatmap`` — the GT-heatmap-synthesis convention
  (general_utils.py:212-246: cov = (W·J)ᵀ Σ (W·J)).

Both are kept verbatim because MPJPE parity requires reproducing each call
site's numerics exactly.

Host-side (numpy, float64 → float32) camera-matrix builders mirror
utils/graphics_utils.py; device-side (jnp, float32) functions mirror the
CUDA kernel and are shared by the dense renderer, the windowed/Pallas
renderer and heatmap synthesis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# All geometry matmuls are tiny (3×3 / 4×4) but feed positions and
# covariances, where TPU-default bf16 MXU precision would cost ~0.3% error —
# far above the sub-mm MPJPE parity budget. Force full f32.
MM = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

# Tile size of the reference rasterizer (cuda_rasterizer/config.h:16-17).
# The tile-rect culling of renderCUDA is part of the forward semantics, so the
# block size is part of the math, not just a CUDA launch detail.
BLOCK_X = 16
BLOCK_Y = 16

# EWA low-pass dilation added to the 2D covariance diagonal (forward.cu:219).
H_VAR = 0.3
# Near-plane cull threshold (auxiliary.h:168).
NEAR_Z = 0.2
# Compositing constants (forward.cu:364-372).
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1.0e-4


@jax.custom_jvp
def alpha_clamp(x):
    """α = min(ALPHA_MAX, x) with the gradient passing straight through the
    clamp — the reference's hand-written backward chains
    dL_dG = opa·dL_dα (backward.cu:619) and dL_dopacity = G·dL_dα
    (backward.cu:635) with no clamp gate, so a saturated splat (opacity
    pinned at 1.0 puts every pixel within ~0.14σ of a center over the
    clamp) still feeds gradient to its screen-space quantities. Plain
    jnp.minimum autodiff would zero those; reproduce the quirk exactly."""
    return jnp.minimum(ALPHA_MAX, x)


@alpha_clamp.defjvp
def _alpha_clamp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.minimum(ALPHA_MAX, x), dx


# ---------------------------------------------------------------------------
# Host-side camera matrix construction (numpy; mirrors utils/graphics_utils.py)
# ---------------------------------------------------------------------------

def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """COLMAP-convention quaternion (w,x,y,z) to rotation matrix.

    Mirrors scene/colmap_loader.py:43-57 (the only live entry of that module).
    """
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2],
        ]
    )


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix to COLMAP (w,x,y,z) quaternion (inverse of qvec2rotmat).

    The reference converts matrices to quaternions with scipy and reorders
    (x,y,z,w)→(w,x,y,z) (dataset_readers.py:264-265); same here.
    """
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    qvec = np.array([q[3], q[0], q[1], q[2]])
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def world2view(R: np.ndarray, t: np.ndarray,
               translate: np.ndarray | None = None, scale: float = 1.0) -> np.ndarray:
    """World→camera 4×4 matrix (utils/graphics_utils.py:38-49, getWorld2View2).

    ``R`` is stored transposed by the loaders (dataset_readers.py:266), so the
    rotation block here is ``R.T``. With the default translate/scale the double
    inversion of the reference is the identity, but we keep it for fidelity.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def projection_from_K(znear: float, zfar: float, K: np.ndarray,
                      W: int, H: int) -> np.ndarray:
    """OpenGL-style frustum from pinhole intrinsics with principal point.

    Mirrors utils/graphics_utils.py:74-95 (getProjectionMatrix2), including the
    reference's sign quirk on P[0,2].
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    top = znear * cy / fy
    bottom = -znear * (H - cy) / fy
    right = znear * (W - cx) / fx
    left = -znear * cx / fx

    P = np.zeros((4, 4), dtype=np.float64)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = -(right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P)


def projection_symmetric(znear: float, zfar: float, fovX: float, fovY: float) -> np.ndarray:
    """Symmetric-frustum projection (utils/graphics_utils.py:51-71) — kept for
    the vestigial render path / MiniCam compatibility."""
    tanY = math.tan(fovY / 2)
    tanX = math.tan(fovX / 2)
    top, right = tanY * znear, tanX * znear
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Device-side math (jnp, float32)
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion(s) (w,x,y,z) → rotation matrix, batched over
    leading axes. Mirrors utils/general_utils.py:87-108 (build_rotation),
    which L2-normalizes internally."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) activated scales + (N,4) quaternions → (N,6) packed covariance
    [xx,xy,xz,yy,yz,zz]. Σ = R·diag(s²)·Rᵀ, identically computed by
    forward.cu:114-150 (Mᵀ·M with M=S·R in glm) and
    utils/general_utils.py:110-119 + gaussian_model.py:33-37 (L·Lᵀ, L=R·S).

    Computed in CLOSED FORM (σ_ab = Σ_k L[a,k]·L[b,k] expanded elementwise)
    rather than a batched 3×3 matmul: on TPU a (V,N,3,3) dot_general is a
    tiny MXU op with fixed launch overhead inside the per-macro scan —
    elementwise products fuse into the surrounding XLA fusion for free,
    and true-f32 elementwise math needs no precision=HIGHEST workaround."""
    R = quat_to_rotmat(quats)
    s = scale_modifier * scales
    L = R * s[..., None, :]        # R @ diag(s)
    r0, r1, r2 = L[..., 0, :], L[..., 1, :], L[..., 2, :]
    dot3 = lambda a, b: (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
                         + a[..., 2] * b[..., 2])
    return jnp.stack(
        [dot3(r0, r0), dot3(r0, r1), dot3(r0, r2),
         dot3(r1, r1), dot3(r1, r2), dot3(r2, r2)],
        axis=-1,
    )


def unpack_cov6(cov6: jnp.ndarray) -> jnp.ndarray:
    """(…,6) packed covariance → (…,3,3) symmetric matrix
    (utils/general_utils.py:144-165, unpack_covariance)."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    rows = jnp.stack(
        [xx, xy, xz, xy, yy, yz, xz, yz, zz], axis=-1
    )
    return rows.reshape(cov6.shape[:-1] + (3, 3))


def _affine_rows(p: jnp.ndarray, M: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(…,3) points through the first ``rows`` rows of a 4×4 matrix,
    expanded elementwise (out[j] = Σ_k p[k]·M[j,k] + M[j,3]) instead of a
    batched matvec: a (V,N,3)×(3,3) dot_general is a tiny fixed-overhead
    MXU op inside the per-macro scan, while elementwise mul/adds fuse into
    the neighboring XLA fusions — and true-f32 elementwise math needs no
    precision=HIGHEST workaround."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [x * M[j, 0] + y * M[j, 1] + z * M[j, 2] + M[j, 3]
         for j in range(rows)], axis=-1)


def view_transform_point(p: jnp.ndarray, view4: jnp.ndarray) -> jnp.ndarray:
    """World point(s) (…,3) through a 4×4 world→view matrix → camera coords.
    (auxiliary.h:71-79, transformPoint4x3; ``view4`` is the plain math matrix,
    not the transposed torch storage)."""
    return _affine_rows(p, view4, 3)


def project_point_full(p: jnp.ndarray, full4: jnp.ndarray) -> jnp.ndarray:
    """World point(s) (…,3) through the full 4×4 projection (P·W2V) → NDC,
    with the reference's 1e-7-regularized perspective divide
    (auxiliary.h:82-90 + forward.cu:197-199)."""
    hom = _affine_rows(p, full4, 4)
    w = 1.0 / (hom[..., 3:4] + 1.0e-7)
    return hom[..., :3] * w


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC → pixel coordinate (auxiliary.h:39-42)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def _clamped_view_point(t: jnp.ndarray, tan_fovx, tan_fovy) -> jnp.ndarray:
    """The 1.3·tan(fov/2) frustum clamp applied to the view-space point before
    the projective Jacobian (forward.cu:82-87 == general_utils.py:215-222)."""
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = t[..., 2]
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz
    return jnp.stack([tx, ty, tz], axis=-1)


def _proj_jacobian(t: jnp.ndarray, focal_x, focal_y) -> jnp.ndarray:
    """Row-form projective Jacobian J (3×3, last row zero) at clamped
    view-space point t. J[0] = (fx/tz, 0, −fx·tx/tz²); J[1] likewise for y."""
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    z = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            focal_x / tz, z, -(focal_x * tx) / (tz * tz),
            z, focal_y / tz, -(focal_y * ty) / (tz * tz),
            z, z, z,
        ],
        axis=-1,
    )
    return J.reshape(t.shape[:-1] + (3, 3))


def ewa_cov2d_render(mean3d: jnp.ndarray, cov6: jnp.ndarray, view4: jnp.ndarray,
                     focal_x, focal_y, tan_fovx, tan_fovy) -> jnp.ndarray:
    """2D screen-space covariance, rasterizer convention (forward.cu:74-108).

    cov2d = B Σ Bᵀ with B = J · W2V[:3,:3] (the glm transposes in the CUDA
    source reduce to exactly this). Returns (…,3) = (cov_xx, cov_xy, cov_yy)
    WITHOUT the +0.3 dilation (applied by the caller, forward.cu:219-222).
    """
    t = view_transform_point(mean3d, view4)
    t = _clamped_view_point(t, tan_fovx, tan_fovy)
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    # Closed-form expansion of cov2d = B Σ Bᵀ with B = J·W: J's two live
    # rows are (fx/tz, 0, −fx·tx/tz²) and (0, fy/tz, −fy·ty/tz²), so
    # b0 = (fx/tz)·W[0,:] − (fx·tx/tz²)·W[2,:] (likewise b1) and the three
    # needed entries are quadratic forms bᵢᵀ Σ bⱼ — all elementwise over
    # the (V,N) batch, fusing into one XLA kernel instead of three tiny
    # fixed-overhead (V,N,3,3) MXU dots per macro step (and true-f32
    # elementwise math needs no precision=HIGHEST workaround).
    W = view4[:3, :3]
    s0, s2 = focal_x / tz, focal_y / tz
    s1 = -(focal_x * tx) / (tz * tz)
    s3 = -(focal_y * ty) / (tz * tz)
    b0 = [s0 * W[0, k] + s1 * W[2, k] for k in range(3)]
    b1 = [s2 * W[1, k] + s3 * W[2, k] for k in range(3)]
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))

    def quad(u, v):
        return (u[0] * v[0] * xx + u[1] * v[1] * yy + u[2] * v[2] * zz
                + (u[0] * v[1] + u[1] * v[0]) * xy
                + (u[0] * v[2] + u[2] * v[0]) * xz
                + (u[1] * v[2] + u[2] * v[1]) * yz)

    return jnp.stack([quad(b0, b0), quad(b0, b1), quad(b1, b1)], axis=-1)


def ewa_cov2d_heatmap(mean3d: jnp.ndarray, cov6: jnp.ndarray, view4: jnp.ndarray,
                      focal_x, focal_y, tan_fovx, tan_fovy) -> jnp.ndarray:
    """2D covariance, GT-heatmap-synthesis convention
    (utils/general_utils.py:212-250).

    The reference's torch re-implementation composes the matrices as
    cov = (W·J)ᵀ Σ (W·J) — NOT the rasterizer's (J·W) Σ (J·W)ᵀ — and reads
    entries (0,0),(0,1),(1,1) of the result. GT heatmaps must reproduce this
    variant bit-for-bit, so it is preserved as written. Returns (…,3) without
    the +0.3 dilation (applied by the caller, general_utils.py:252-254).
    """
    t = view_transform_point(mean3d, view4)
    t = _clamped_view_point(t, tan_fovx, tan_fovy)
    J = _proj_jacobian(t, focal_x, focal_y)
    A = MM(view4[:3, :3], J)
    Vrk = unpack_cov6(cov6)
    cov = MM(MM(jnp.swapaxes(A, -1, -2), jnp.swapaxes(Vrk, -1, -2)), A)
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]], axis=-1)


def cov2d_to_conic_radius(cov2d: jnp.ndarray):
    """Dilated 2D covariance → (conic (…,3), radius (…,), det (…,)).

    Mirrors forward.cu:219-244: +0.3 on the diagonal, conic = inverse of the
    dilated covariance, radius = ceil(3·√λmax) with the mid²−det floor of 0.1.
    """
    cx = cov2d[..., 0] + H_VAR
    cy = cov2d[..., 1]
    cz = cov2d[..., 2] + H_VAR
    det = cx * cz - cy * cy
    det_inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    conic = jnp.stack([cz * det_inv, -cy * det_inv, cx * det_inv], axis=-1)
    mid = 0.5 * (cx + cz)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))
    return conic, radius, det


def heatmap_sigmas(cov2d: jnp.ndarray):
    """Dilated 2D covariance → (σ1, σ2) = (√λ1, √λ2) used as the anisotropic
    blur sigmas for GT heatmaps (general_utils.py:252-265). σ1 ≥ σ2; σ1 blurs
    image rows (y), σ2 columns (x) — the reference discards the covariance
    orientation by feeding axis-aligned sigmas to ``gaussian_filter``."""
    cx = cov2d[..., 0] + H_VAR
    cy = cov2d[..., 1]
    cz = cov2d[..., 2] + H_VAR
    det = cx * cz - cy * cy
    mid = 0.5 * (cx + cz)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    return jnp.sqrt(mid + disc), jnp.sqrt(mid - disc)


def tile_rect(point_image: jnp.ndarray, radius: jnp.ndarray, W: int, H: int):
    """Tile-space bounding rect of a splat (auxiliary.h:45-56, getRect).

    ``radius`` is float (already ceil'd); the CUDA code truncates the division
    toward zero on positive operands — after the max(0,·) clamp plain floor
    division is equivalent. Returns (rect_min_xy, rect_max_xy) int32 arrays in
    tile units; a splat with zero rect area is culled (forward.cu:248).
    """
    grid_x = (W + BLOCK_X - 1) // BLOCK_X
    grid_y = (H + BLOCK_Y - 1) // BLOCK_Y
    px, py = point_image[..., 0], point_image[..., 1]
    # (int) cast in C truncates toward zero; operands can be negative before
    # the max clamp, so emulate trunc then clamp.
    def trunc_div(a, b):
        return jnp.trunc(a / b).astype(jnp.int32)

    min_x = jnp.minimum(grid_x, jnp.maximum(0, trunc_div(px - radius, BLOCK_X)))
    min_y = jnp.minimum(grid_y, jnp.maximum(0, trunc_div(py - radius, BLOCK_Y)))
    max_x = jnp.minimum(grid_x, jnp.maximum(0, trunc_div(px + radius + BLOCK_X - 1, BLOCK_X)))
    max_y = jnp.minimum(grid_y, jnp.maximum(0, trunc_div(py + radius + BLOCK_Y - 1, BLOCK_Y)))
    rect_min = jnp.stack([min_x, min_y], axis=-1)
    rect_max = jnp.stack([max_x, max_y], axis=-1)
    return rect_min, rect_max


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) symmetric matrix → (…,6) packed upper triangle
    (utils/general_utils.py:73-85, strip_lowerdiag/strip_symmetric)."""
    return jnp.stack(
        [sym[..., 0, 0], sym[..., 0, 1], sym[..., 0, 2],
         sym[..., 1, 1], sym[..., 1, 2], sym[..., 2, 2]], axis=-1)


strip_lowerdiag = strip_symmetric


def build_scaling_rotation(s: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """L = R·diag(s) (utils/general_utils.py:110-119)."""
    return quat_to_rotmat(r) * s[..., None, :]


def geom_transform_points(points: jnp.ndarray,
                          transf_matrix: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous point transform with the reference's transposed-matrix
    convention and 1e-7-regularized divide (graphics_utils.py:22-29;
    vestigial)."""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    out = MM(hom, transf_matrix)
    return out[..., :3] / (out[..., 3:] + 1e-7)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-linear LR decay with optional sine warm-delay
    (utils/general_utils.py:38-71, Plenoxels-style). jnp-traceable in ``step``."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
