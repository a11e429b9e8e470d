"""Pallas preprocess kernel — the per-macro screen-space EWA preprocess
(forward.cu:153-273 equivalent; the jnp oracle is
``ops.rasterizer.preprocess_gaussians`` + the gauss pack assembly in
``ops.pallas_raster.fused_view_loss_pallas``) collapsed into ONE tiny
lane-major kernel with a hand-derived analytic adjoint.

Why: the closed-form elementwise preprocess lowers to ~60-90 sub-µs
launch-bound XLA fusions per macro step (trace_summary: the
trainer.py:611 soup), and it runs twice per macro (the no-grad bbox pass
that picks the window tier, then the differentiated pass inside
value_and_grad) plus its autodiff adjoint. On joints-on-lanes (1, 128)
vectors the whole chain is ~200 VPU flops — one kernel dispatch each
instead of dozens of fixed-overhead ops.

STATUS (round 4, measured on chip — PERF.md "preprocess Pallas
kernel"): NEUTRAL on the headline sweep (0.0164 vs 0.0163 s/frame) and
kept OPT-IN via SKELSPLAT_PALLAS_PREPROCESS=kernel. The kernels
themselves are cheap (4.3 µs/macro for bbox+fwd+bwd, vs ~10 µs of
removed fusions) but the input-pack assembly below is ~4-6 µs of new
XLA glue — a wash. A sublane-major variant with natural-layout inputs
(zero glue) and the activations folded in measured WORSE (0.0177:
lane-offset column stores are slow in Mosaic, and Mosaic-vs-XLA
transcendental drift compounded to ~1 mm over 500 Adam steps) and was
reverted. Correctness of THIS variant: ≤ 0.0015 mm final-xyz drift
over full 500-iter runs (on-chip A/B probe).

Layout (n ≤ LANES joints on the lane axis):
  IN  (16, LANES) f32 rows: 0-2 xyz, 3-8 cov6 [xx,xy,xz,yy,yz,zz],
      9 opacity, 10 B, 11-14 GT spans [gy0,gy1,gx0,gx1], 15 pad.
  CAM (1, 48) SMEM f32: 0-15 view4 (row-major), 16-31 full4, 32 fx,
      33 fy, 34 tan_fovx, 35 tan_fovy, 36 cam W, 37 cam H, 38 spec
      width, 39 spec height, 40-41 window (row, col), 42-47 pad.
  OUT G (24, LANES) f32: rows 0-15 the raster kernel's gauss pack in
      IDX_* order (pallas_raster.py:74-76), row 16 the depth sort key
      (valid ? view z : +inf), rows 17-23 zero.
  OUT bbox (1, 8) SMEM f32: [lo_y, hi_y, lo_x, hi_x, slot_need, 0,0,0]
      — ``pallas_view_bbox``'s union bbox reductions, computed in-kernel.

Exactness: every op is f32 mul/add/div/sqrt/floor/trunc/ceil/min/max —
no transcendentals — and the expression tree mirrors the jnp oracle
operation-for-operation (including association order). The two paths
still differ by ~1 ulp on some elements: the compiler contracts mul+add
chains into FMAs independently per program, so bitwise equality across
separately compiled expression trees is not achievable (measured 1.2e-7
max rel on CPU interpret) — this mode is a ulp-close renderer VARIANT
(like fused vs pallas, covered by tools/parity_study.py), not a bitwise
twin. The adjoint mirrors JAX's autodiff of the oracle (rect/spans/B/
c0/sort-key are stop-gradient, exactly as the XLA pack's stop_gradients
route them), to reordering ULPs.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skelsplat_tpu.core import geometry

LANES = 128
PACK = 16
G_ROWS = 24
CAM_SLOTS = 48
_BIG = 1.0e9


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _cam(cam_ref, k):
    return cam_ref[0, k]


def _fwd_math(n, W, H, antialiasing, slot_w, win_w, in_ref, cam_ref):
    """The shared forward chain: returns every intermediate the pack and
    the adjoint need, as (1, LANES) f32 rows. Mirrors
    rasterizer.preprocess_gaussians + the gauss stack op-for-op."""
    x = in_ref[0:1, :]
    y = in_ref[1:2, :]
    z = in_ref[2:3, :]
    c6 = [in_ref[3 + i:4 + i, :] for i in range(6)]
    opa = in_ref[9:10, :]

    V = [_cam(cam_ref, k) for k in range(16)]        # view4 row-major
    F = [_cam(cam_ref, 16 + k) for k in range(16)]   # full4 row-major
    fx, fy = _cam(cam_ref, 32), _cam(cam_ref, 33)
    tanx, tany = _cam(cam_ref, 34), _cam(cam_ref, 35)
    cw, ch = _cam(cam_ref, 36), _cam(cam_ref, 37)

    def affine(M, j):
        # geometry._affine_rows association: ((x·m0 + y·m1) + z·m2) + m3
        return x * M[4 * j + 0] + y * M[4 * j + 1] + z * M[4 * j + 2] \
            + M[4 * j + 3]

    # view transform (rows 0-2) + depth/frustum (auxiliary.h:71-79,168)
    t0, t1, tz = affine(V, 0), affine(V, 1), affine(V, 2)
    in_front = tz > geometry.NEAR_Z

    # full projection rows 0,1,3 + regularized divide (auxiliary.h:82-90)
    h0, h1, h3 = affine(F, 0), affine(F, 1), affine(F, 3)
    w = 1.0 / (h3 + 1.0e-7)
    ndc0, ndc1 = h0 * w, h1 * w
    pix_x = ((ndc0 + 1.0) * cw - 1.0) * 0.5
    pix_y = ((ndc1 + 1.0) * ch - 1.0) * 0.5

    # frustum-clamped view point (forward.cu:82-87)
    limx, limy = 1.3 * tanx, 1.3 * tany
    u, v = t0 / tz, t1 / tz
    uc = jnp.clip(u, -limx, limx)
    vc = jnp.clip(v, -limy, limy)
    txc, tyc = uc * tz, vc * tz

    # closed-form cov2d = B Σ Bᵀ, B = J·W (geometry.ewa_cov2d_render)
    s0, s2 = fx / tz, fy / tz
    s1 = -(fx * txc) / (tz * tz)
    s3 = -(fy * tyc) / (tz * tz)
    b0 = [s0 * V[0 + k] + s1 * V[8 + k] for k in range(3)]
    b1 = [s2 * V[4 + k] + s3 * V[8 + k] for k in range(3)]
    xx, xy, xz, yy, yz, zz = c6

    def quad(a, b):
        return (a[0] * b[0] * xx + a[1] * b[1] * yy + a[2] * b[2] * zz
                + (a[0] * b[1] + a[1] * b[0]) * xy
                + (a[0] * b[2] + a[2] * b[0]) * xz
                + (a[1] * b[2] + a[2] * b[1]) * yz)

    cxx, cxy, cyy = quad(b0, b0), quad(b0, b1), quad(b1, b1)
    det_cov = cxx * cyy - cxy * cxy

    # conic + radius (geometry.cov2d_to_conic_radius, forward.cu:219-244)
    cx = cxx + geometry.H_VAR
    cy = cxy
    cz = cyy + geometry.H_VAR
    det = cx * cz - cy * cy
    det_inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    conA, conB, conC = cz * det_inv, -cy * det_inv, cx * det_inv
    mid = 0.5 * (cx + cz)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, mid - disc)))

    if antialiasing:                      # forward.cu:224-227
        hs = jnp.sqrt(jnp.maximum(0.000025, det_cov / det))
    else:
        hs = jnp.ones_like(det_cov)
    opa_eff = opa * hs

    # tile rect in f32 (geometry.tile_rect — trunc/min/max commute with
    # the int32 round-trip for in-range finite values)
    gx = float((W + geometry.BLOCK_X - 1) // geometry.BLOCK_X)
    gy = float((H + geometry.BLOCK_Y - 1) // geometry.BLOCK_Y)
    bx, by = float(geometry.BLOCK_X), float(geometry.BLOCK_Y)
    min_x = jnp.minimum(gx, jnp.maximum(0.0, jnp.trunc((pix_x - radius) / bx)))
    min_y = jnp.minimum(gy, jnp.maximum(0.0, jnp.trunc((pix_y - radius) / by)))
    max_x = jnp.minimum(gx, jnp.maximum(
        0.0, jnp.trunc((pix_x + radius + bx - 1.0) / bx)))
    max_y = jnp.minimum(gy, jnp.maximum(
        0.0, jnp.trunc((pix_y + radius + by - 1.0) / by)))
    area = (max_x - min_x) * (max_y - min_y)

    valid = in_front & (det != 0.0) & (area > 0.0)
    opa_pack = jnp.where(valid, opa_eff, 0.0)

    return dict(x=x, y=y, z=z, c6=c6, opa=opa, V=V, F=F, fx=fx, fy=fy,
                w=w, h0=h0, h1=h1, cw=cw, ch=ch, u=u, v=v, limx=limx,
                limy=limy, uc=uc, vc=vc, txc=txc, tyc=tyc, tz=tz,
                s0=s0, s1=s1, s2=s2, s3=s3, b0=b0, b1=b1,
                cxx=cxx, cxy=cxy, cyy=cyy, det_cov=det_cov,
                cx=cx, cy=cy, cz=cz, det=det, det_inv=det_inv,
                conA=conA, conB=conB, conC=conC, hs=hs,
                pix_x=pix_x, pix_y=pix_y, depth=tz, valid=valid,
                opa_eff=opa_eff, opa_pack=opa_pack,
                min_x=min_x, min_y=min_y, max_x=max_x, max_y=max_y)


def _fwd_kernel(n, W, H, antialiasing, slot_w, win_w,
                in_ref, cam_ref, g_ref, bbox_ref):
    f = _fwd_math(n, W, H, antialiasing, slot_w, win_w, in_ref, cam_ref)
    B_row = in_ref[10:11, :]
    gy0, gy1 = in_ref[11:12, :], in_ref[12:13, :]
    gx0, gx1 = in_ref[13:14, :], in_ref[14:15, :]
    spec_w = _cam(cam_ref, 38)
    spec_h = _cam(cam_ref, 39)
    win_col = _cam(cam_ref, 41)
    ones = jnp.ones_like(f["x"])

    # per-slot 128-aligned column-slice starts (IDX_C0) — mirrors
    # fused_view_loss_pallas' c0 chain
    if slot_w is not None and win_w is not None and slot_w < win_w:
        rx0 = f["min_x"] * float(geometry.BLOCK_X)
        rx1 = f["max_x"] * float(geometry.BLOCK_X)
        act_r = rx1 > rx0
        act_g = gx1 > gx0
        lo = jnp.minimum(jnp.where(act_r, rx0, _BIG),
                         jnp.where(act_g, gx0, _BIG))
        c0 = jnp.clip(jnp.floor(lo / LANES) * LANES - win_col,
                      0.0, float(win_w - slot_w))
        c0 = jnp.where(act_r | act_g, c0, 0.0)
    else:
        c0 = jnp.zeros_like(f["x"])

    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < n
    key = jnp.where(f["valid"] & lane_ok, f["depth"], jnp.inf)

    zero = jnp.zeros_like(f["x"])
    g_ref[:, :] = jnp.concatenate(
        [f["pix_x"], f["pix_y"], f["conA"], f["conB"], f["conC"],
         f["opa_pack"], f["min_x"], f["min_y"], f["max_x"], f["max_y"],
         B_row, spec_w * ones, spec_h * ones, gy0, gy1, c0,
         key] + [zero] * (G_ROWS - PACK - 1), axis=0)

    # union bbox of (splat rects ∪ GT supports) — pallas_view_bbox
    ry0 = f["min_y"] * float(geometry.BLOCK_Y)
    ry1 = f["max_y"] * float(geometry.BLOCK_Y)
    rx0 = f["min_x"] * float(geometry.BLOCK_X)
    rx1 = f["max_x"] * float(geometry.BLOCK_X)
    act_r = f["valid"] & (ry1 > ry0) & (rx1 > rx0) & lane_ok
    act_g = (gy1 > gy0) & lane_ok
    bbox_ref[0, 0] = jnp.minimum(jnp.min(jnp.where(act_r, ry0, _BIG)),
                                 jnp.min(jnp.where(act_g, gy0, _BIG)))
    bbox_ref[0, 1] = jnp.maximum(jnp.max(jnp.where(act_r, ry1, -_BIG)),
                                 jnp.max(jnp.where(act_g, gy1, -_BIG)))
    bbox_ref[0, 2] = jnp.minimum(jnp.min(jnp.where(act_r, rx0, _BIG)),
                                 jnp.min(jnp.where(act_g, gx0, _BIG)))
    bbox_ref[0, 3] = jnp.maximum(jnp.max(jnp.where(act_r, rx1, -_BIG)),
                                 jnp.max(jnp.where(act_g, gx1, -_BIG)))
    lo_s = jnp.minimum(jnp.where(act_r, rx0, _BIG),
                       jnp.where(act_g, gx0, _BIG))
    hi_s = jnp.maximum(jnp.where(act_r, rx1, -_BIG),
                       jnp.where(act_g, gx1, -_BIG))
    act = act_r | act_g
    need = jnp.where(act, hi_s - jnp.floor(lo_s / LANES) * LANES, 0.0)
    bbox_ref[0, 4] = jnp.max(need)
    bbox_ref[0, 5] = 0.0
    bbox_ref[0, 6] = 0.0
    bbox_ref[0, 7] = 0.0


def _bwd_kernel(n, W, H, antialiasing, slot_w, win_w,
                in_ref, cam_ref, dg_ref, din_ref):
    """Recompute-forward analytic adjoint: dG rows 0-5 (pix, conic,
    packed opacity) → d(xyz, cov6, opacity). Rows 6-15 of the pack are
    stop-gradient in the oracle (rect/B/spans/c0/spec sizes), as is the
    sort key — their cotangents are ignored, matching the XLA path."""
    f = _fwd_math(n, W, H, antialiasing, slot_w, win_w, in_ref, cam_ref)
    dpx = dg_ref[0:1, :]
    dpy = dg_ref[1:2, :]
    dA = dg_ref[2:3, :]
    dB_ = dg_ref[3:4, :]
    dC = dg_ref[4:5, :]
    dop = dg_ref[5:6, :]
    zero = jnp.zeros_like(dpx)

    # --- opacity pack: where(valid, opa·hs, 0) ---
    dopa_eff = jnp.where(f["valid"], dop, 0.0)
    dopa = dopa_eff * f["hs"]
    if antialiasing:
        dhs = dopa_eff * f["opa"]
        q = f["det_cov"] / f["det"]
        m = jnp.maximum(0.000025, q)
        dm = dhs * (0.5 / jnp.sqrt(m))
        # jnp.maximum ties split evenly; below the floor no gradient
        dq = jnp.where(q > 0.000025, dm,
                       jnp.where(q == 0.000025, 0.5 * dm, 0.0))
        ddet_cov = dq / f["det"]
        ddet = -dq * f["det_cov"] / (f["det"] * f["det"])
    else:
        ddet_cov = zero
        ddet = zero

    # --- conic = (cz, −cy, cx)·det_inv ---
    di = f["det_inv"]
    dcx = dC * di
    dcy = -dB_ * di
    dcz = dA * di
    ddet_inv = dA * f["cz"] - dB_ * f["cy"] + dC * f["cx"]
    ddet = ddet + jnp.where(f["det"] != 0.0,
                            -ddet_inv / (f["det"] * f["det"]), 0.0)
    # det = cx·cz − cy²
    dcx = dcx + ddet * f["cz"]
    dcz = dcz + ddet * f["cx"]
    dcy = dcy - 2.0 * ddet * f["cy"]
    # dilation is additive; det_cov = cxx·cyy − cxy²
    dcxx = dcx + ddet_cov * f["cyy"]
    dcyy = dcz + ddet_cov * f["cxx"]
    dcxy = dcy - 2.0 * ddet_cov * f["cxy"]

    # --- quadratic forms: c•• = quad(b•, b•) over Σ (cov6) ---
    b0, b1 = f["b0"], f["b1"]
    xx, xy, xz, yy, yz, zz = f["c6"]
    # dΣ entries (cov6 is linear in each quad)
    dxx = dcxx * b0[0] * b0[0] + dcxy * b0[0] * b1[0] + dcyy * b1[0] * b1[0]
    dyy = dcxx * b0[1] * b0[1] + dcxy * b0[1] * b1[1] + dcyy * b1[1] * b1[1]
    dzz = dcxx * b0[2] * b0[2] + dcxy * b0[2] * b1[2] + dcyy * b1[2] * b1[2]
    dxy = (dcxx * 2.0 * b0[0] * b0[1]
           + dcxy * (b0[0] * b1[1] + b0[1] * b1[0])
           + dcyy * 2.0 * b1[0] * b1[1])
    dxz = (dcxx * 2.0 * b0[0] * b0[2]
           + dcxy * (b0[0] * b1[2] + b0[2] * b1[0])
           + dcyy * 2.0 * b1[0] * b1[2])
    dyz = (dcxx * 2.0 * b0[1] * b0[2]
           + dcxy * (b0[1] * b1[2] + b0[2] * b1[1])
           + dcyy * 2.0 * b1[1] * b1[2])

    # Σ·b (for db): S(u)_k = Σ_j Σ[k,j]·u_j
    def sig(u):
        return [xx * u[0] + xy * u[1] + xz * u[2],
                xy * u[0] + yy * u[1] + yz * u[2],
                xz * u[0] + yz * u[1] + zz * u[2]]

    S0, S1 = sig(b0), sig(b1)
    db0 = [2.0 * dcxx * S0[k] + dcxy * S1[k] for k in range(3)]
    db1 = [2.0 * dcyy * S1[k] + dcxy * S0[k] for k in range(3)]

    # b0k = s0·V[0,k] + s1·V[2,k]; b1k = s2·V[1,k] + s3·V[2,k]
    V = f["V"]
    ds0 = db0[0] * V[0] + db0[1] * V[1] + db0[2] * V[2]
    ds1 = db0[0] * V[8] + db0[1] * V[9] + db0[2] * V[10]
    ds2 = db1[0] * V[4] + db1[1] * V[5] + db1[2] * V[6]
    ds3 = db1[0] * V[8] + db1[1] * V[9] + db1[2] * V[10]

    # s0 = fx/tz, s1 = −fx·txc/tz², s2 = fy/tz, s3 = −fy·tyc/tz²
    tz, fx, fy = f["tz"], f["fx"], f["fy"]
    tz2 = tz * tz
    dtxc = -ds1 * fx / tz2
    dtyc = -ds3 * fy / tz2
    dtz = (-ds0 * fx / tz2 - ds2 * fy / tz2
           + ds1 * 2.0 * fx * f["txc"] / (tz2 * tz)
           + ds3 * 2.0 * fy * f["tyc"] / (tz2 * tz))

    # txc = clip(t0/tz, ±limx)·tz (clip gates like lax.clamp's VJP)
    duc = dtxc * tz
    dvc = dtyc * tz
    dtz = dtz + dtxc * f["uc"] + dtyc * f["vc"]
    du = jnp.where((f["u"] >= -f["limx"]) & (f["u"] <= f["limx"]), duc, 0.0)
    dv = jnp.where((f["v"] >= -f["limy"]) & (f["v"] <= f["limy"]), dvc, 0.0)
    dt0 = du / tz
    dt1 = dv / tz
    dtz = dtz - du * f["u"] / tz - dv * f["v"] / tz

    # pix chain: pix = ((ndc+1)·size − 1)·0.5, ndc_i = h_i·w, w = 1/(h3+ε)
    dndc0 = dpx * 0.5 * f["cw"]
    dndc1 = dpy * 0.5 * f["ch"]
    w = f["w"]
    dh0 = dndc0 * w
    dh1 = dndc1 * w
    dh3 = -(dndc0 * f["h0"] + dndc1 * f["h1"]) * w * w

    # xyz through view4 rows 0-2 and full4 rows 0,1,3
    F = f["F"]
    dx = (dt0 * V[0] + dt1 * V[4] + dtz * V[8]
          + dh0 * F[0] + dh1 * F[4] + dh3 * F[12])
    dy = (dt0 * V[1] + dt1 * V[5] + dtz * V[9]
          + dh0 * F[1] + dh1 * F[5] + dh3 * F[13])
    dz = (dt0 * V[2] + dt1 * V[6] + dtz * V[10]
          + dh0 * F[2] + dh1 * F[6] + dh3 * F[14])

    din_ref[:, :] = jnp.concatenate(
        [dx, dy, dz, dxx, dxy, dxz, dyy, dyz, dzz, dopa,
         zero, zero, zero, zero, zero, zero], axis=0)


def _run_fwd(inp, cam, n, W, H, antialiasing, slot_w, win_w, interpret):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n, W, H, antialiasing, slot_w,
                          win_w),
        in_specs=[
            pl.BlockSpec(inp.shape, memory_space=pltpu.VMEM),
            pl.BlockSpec(cam.shape, memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((G_ROWS, LANES), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), memory_space=pltpu.SMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((G_ROWS, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, 8), jnp.float32)),
        interpret=interpret,
    )(inp, cam)


def _run_bwd(inp, cam, dg, n, W, H, antialiasing, slot_w, win_w,
             interpret):
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n, W, H, antialiasing, slot_w,
                          win_w),
        in_specs=[
            pl.BlockSpec(inp.shape, memory_space=pltpu.VMEM),
            pl.BlockSpec(cam.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(dg.shape, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PACK, LANES), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PACK, LANES), jnp.float32),
        interpret=interpret,
    )(inp, cam, dg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def preprocess_pack(inp, cam, n, W, H, antialiasing, slot_w, win_w,
                    interpret):
    """(16, LANES) input pack + (1, 48) camera scalars → (G (24, LANES),
    bbox (1, 8)); differentiable in ``inp`` rows 0-9 (xyz, cov6,
    opacity). ``bbox`` is non-differentiable (callers consume it under
    stop_gradient, as the XLA ``pallas_view_bbox`` does)."""
    return _run_fwd(inp, cam, n, W, H, antialiasing, slot_w, win_w,
                    interpret)


def _pp_fwd(inp, cam, n, W, H, antialiasing, slot_w, win_w, interpret):
    out = _run_fwd(inp, cam, n, W, H, antialiasing, slot_w, win_w,
                   interpret)
    return out, (inp, cam)


def _pp_bwd(n, W, H, antialiasing, slot_w, win_w, interpret, res, cot):
    inp, cam = res
    dg, _ = cot   # bbox cotangent: zero by construction (stop_gradient)
    din = _run_bwd(inp, cam, dg, n, W, H, antialiasing, slot_w, win_w,
                   interpret)
    return din, jnp.zeros_like(cam)


preprocess_pack.defvjp(_pp_fwd, _pp_bwd)


def pack_inputs(xyz, cov6, opacity, B_row, spans):
    """Assemble the (16, LANES) kernel input from per-joint arrays:
    xyz (n,3), cov6 (n,6), opacity (n,) or (n,1), B (n,), spans (n,4)."""
    n = xyz.shape[0]
    rows = jnp.concatenate(
        [xyz.T, cov6.T, opacity.reshape(1, n), B_row.reshape(1, n),
         spans.T], axis=0)                          # (15, n)
    return jnp.pad(rows, ((0, PACK - rows.shape[0]),
                          (0, LANES - n)))


def pack_camera(cam, spec_w, spec_h, window):
    """Assemble the (1, 48) camera scalar pack. ``window`` is the (2,)
    f32 tier origin (zeros when unwindowed)."""
    flat = jnp.concatenate(
        [jnp.ravel(cam.view4), jnp.ravel(cam.full4),
         jnp.stack([cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy,
                    cam.width, cam.height,
                    jnp.asarray(spec_w, jnp.float32),
                    jnp.asarray(spec_h, jnp.float32)]),
         jnp.asarray(window, jnp.float32)])
    return jnp.pad(flat, (0, CAM_SLOTS - flat.shape[0])).reshape(1, -1) \
        .astype(jnp.float32)


def preprocess_pack_view(params, cam, spec_v, profiles, W, H,
                         antialiasing=False, window=None, slot_w=None,
                         win_w=None, interpret=None):
    """Convenience wrapper: params + camera + per-view profiles →
    (G (24, LANES), bbox (5,)). G rows 0-15 are the UNSORTED gauss pack;
    row 16 the argsort key over lanes [:n]."""
    if interpret is None:
        interpret = _interpret_default()
    _, _, B_row, spans = profiles
    win = jnp.zeros((2,), jnp.float32) if window is None else window
    inp = pack_inputs(params.xyz, params.covariance(), params.opacity,
                      B_row, spans)
    camp = pack_camera(cam, spec_v.width[0], spec_v.height[0], win)
    G, bbox = preprocess_pack(inp, camp, params.n_joints, W, H,
                              antialiasing, slot_w, win_w, interpret)
    return G, jax.lax.stop_gradient(bbox[0, :5])
