"""On-chip micro-probe for the combined Pallas raster kernel.

Times the REAL `_run_bwd` kernel (all V views vmapped into one grid, the
trainer's dispatch shape) isolated from the macro-step soup: K launches
ride one `lax.scan` inside one jitted program (the per-launch gauss pack
is perturbed by the step index so XLA cannot hoist or CSE the kernel),
timed through a result fetch, differenced over two scan lengths to cancel
dispatch/fetch constants.

The `--slots` sweep decomposes kernel time into its width-proportional
part (per-slot vector work ∝ slot_w) and the width-independent residue
(pl.when branch overhead, scalar loads, cross-lane reductions, stack
zeroing at fixed count, the program-0 permute dot, per-program grid
overhead) by linear fit — the roofline's missing second equation: the
issue-bound model only covers the proportional part.

Round-4's fwd-vs-combined probe (PERF.md) was a throwaway script; this
makes the harness reproducible.

Usage:
    python -m skelsplat_tpu.tools.kernel_probe                # headline tier
    python -m skelsplat_tpu.tools.kernel_probe --slots 256 384 512
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def _view_inputs(W=1002, H=1000, n_joints=17, scene=1):
    """One synthetic H36M scene's per-view kernel inputs, prepared exactly
    as fused_view_loss_pallas's XLA branch packs them (ops/pallas_raster.py
    fused_view_loss_pallas), stacked over the V=4 views."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_inputs
    from skelsplat_tpu.core import geometry
    from skelsplat_tpu.engine.trainer import init_params_jnp
    from skelsplat_tpu.ops import heatmaps as hm
    from skelsplat_tpu.ops import rasterizer
    from skelsplat_tpu.ops.pallas_raster import (
        LANES, _pad_to, pallas_view_bbox, pallas_view_profiles,
        window_bounds_from_bbox)

    init, gt, p2d, cams_b = _synthetic_inputs(scene + 1, W, H,
                                              n_joints=n_joints)
    camsj = jax.tree.map(jnp.asarray, cams_b)
    params = init_params_jnp(jnp.asarray(init[scene]), "h36m", 3.0, 1.0)
    cov6 = params.covariance()
    spec = hm.heatmap_spec(params.xyz, cov6, jnp.asarray(p2d[scene]),
                           camsj, W, H)
    views = []
    for v in range(p2d.shape[1]):
        cam = jax.tree.map(lambda x: x[v], camsj)
        spec_v = jax.tree.map(lambda x: x[v], spec)
        profiles = pallas_view_profiles(spec_v, W, H)
        p1_lane, p2, B, spans = profiles
        pp = rasterizer.preprocess_gaussians(params.xyz, cov6,
                                             params.opacity, cam, W, H)
        order = jnp.argsort(jnp.where(pp.valid, pp.depth, jnp.inf))
        n = n_joints
        opa = jnp.where(pp.valid, pp.opacity_eff, 0.0)
        rect = jnp.concatenate([pp.rect_min, pp.rect_max],
                               axis=1).astype(jnp.float32)
        ones = jnp.ones((n,), jnp.float32)
        views.append((params, cam, spec_v, profiles, pp, order, opa, rect,
                      ones, B, spans))
    return views, camsj, W, H, n_joints


def probe_tier(slot_w=256, win_h=512, win_w=768, rows=64, W=1002, H=1000,
               n_joints=17, k_long=512, k_short=128, reps=3, dead=False):
    """``dead=True`` zeroes the four culling scalars (splat-rect rows +
    GT row span) in the SAME compiled program, so every (slot, band)
    pair takes both not-taken ``pl.when`` branches: the launch time is
    then the pure scaffolding floor — per-launch fixed cost (program-0
    permute dot, T init, prologues) plus the full per-DEAD-pair cost
    (header scalar loads + two predicates + branch setup) at the
    maximum pair count. active-launch − dead-launch bounds what a
    compacted (active-pairs-only) slot loop could ever recover ON TOP
    of the predicated skips already in place."""
    import jax
    import jax.numpy as jnp

    from skelsplat_tpu.core import geometry
    from skelsplat_tpu.ops.pallas_raster import (
        IDX_GY0, IDX_GY1, IDX_PX, IDX_RY0, IDX_RY1, LANES, PACK, _pad_to,
        _run_bwd, pallas_view_bbox, window_bounds_from_bbox)

    views, camsj, W, H, n = _view_inputs(W, H, n_joints)
    hi = jax.lax.Precision.HIGHEST

    gauss_v, p1_v, p2_v, offs_v, pl_v = [], [], [], [], []
    for (params, cam, spec_v, profiles, pp, order, opa, rect, ones, B,
         spans) in views:
        p1_lane, p2, _, _ = profiles
        bbox = pallas_view_bbox(params, cam, spec_v, W, H,
                                profiles=profiles)
        offs, fits = window_bounds_from_bbox(bbox, W, H, win_h, win_w, rows)
        assert bool(fits), "probe scene must fit the probed tier"
        eff_slot = slot_w if (slot_w and slot_w < win_w) else None
        if eff_slot:
            big = jnp.float32(1e9)
            rx0 = rect[:, 0] * geometry.BLOCK_X
            rx1 = rect[:, 2] * geometry.BLOCK_X
            act_r = rx1 > rx0
            act_g = spans[:, 3] > spans[:, 2]
            lo = jnp.minimum(jnp.where(act_r, rx0, big),
                             jnp.where(act_g, spans[:, 2], big))
            c0 = jnp.clip(jnp.floor(lo / LANES) * LANES - offs[1],
                          0.0, float(win_w - eff_slot))
            c0 = jnp.where(act_r | act_g, c0, 0.0)
        else:
            c0 = jnp.zeros((n,), jnp.float32)
        gauss = jnp.stack(
            [pp.pix[:, 0], pp.pix[:, 1], pp.conic[:, 0], pp.conic[:, 1],
             pp.conic[:, 2], opa, rect[:, 0], rect[:, 1], rect[:, 2],
             rect[:, 3], B, spec_v.width[0] * ones,
             spec_v.height[0] * ones, spans[:, 0], spans[:, 1], c0],
            axis=1)
        iota_n = jnp.arange(n, dtype=order.dtype)
        Pn = (order[:, None] == iota_n[None, :]).astype(jnp.float32)
        gauss_s = jnp.matmul(Pn, gauss, precision=hi)
        lanes = p1_lane.shape[1]
        iota_l = jnp.arange(lanes, dtype=order.dtype)
        PL = (iota_l[:, None] == order[None, :]).astype(jnp.float32)
        gauss_v.append(gauss_s)
        p1_v.append(p1_lane)
        p2_v.append(jnp.matmul(Pn, p2, precision=hi))
        offs_v.append(offs.reshape(1, 2))
        pl_v.append(_pad_to(PL, lanes, axis=1))
    gauss_b = jnp.stack(gauss_v)
    if dead:
        for col in (IDX_RY0, IDX_RY1, IDX_GY0, IDX_GY1):
            gauss_b = gauss_b.at[:, :, col].set(0.0)
    p1_b = jnp.stack(p1_v)
    p2_b = jnp.stack(p2_v)
    offs_b = jnp.stack(offs_v)
    pl_b = jnp.stack(pl_v)
    eff_slot = slot_w if (slot_w and slot_w < win_w) else None

    # the legacy-pack kernel variant (gd/aux/ordf None): the probe's
    # decomposition question (width-proportional vs fixed) is about the
    # compositing passes, which are identical across pack modes
    kern = functools.partial(_run_bwd, gd=None, aux=None, ordf=None,
                             l1=False, interpret=False,
                             slot_w=eff_slot, rows=rows,
                             win_shape=(win_h, win_w))

    def make(k):
        @jax.jit
        def run(gauss_b, p1_b, p2_b, offs_b, pl_b):
            def body(c, i):
                g = gauss_b.at[:, 0, IDX_PX].add(i * 1e-6)
                S, C, dg = jax.vmap(
                    lambda g1, a, b, o, p: kern(g1, p1=a, p2=b, offs=o,
                                                pl_mat=p))(
                        g, p1_b, p2_b, offs_b, pl_b)
                return c + jnp.sum(S) + jnp.sum(dg[:, 0, 0]), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(k, dtype=jnp.float32))
            return c

        return run

    run_long, run_short = make(k_long), make(k_short)
    np.asarray(run_long(gauss_b, p1_b, p2_b, offs_b, pl_b))
    np.asarray(run_short(gauss_b, p1_b, p2_b, offs_b, pl_b))

    def timed(fn):
        t0 = time.perf_counter()
        out = fn(gauss_b, p1_b, p2_b, offs_b, pl_b)
        np.asarray(out)
        return time.perf_counter() - t0

    dts = sorted((timed(run_long) - timed(run_short)) / (k_long - k_short)
                 for _ in range(reps))
    return dts[reps // 2]  # median per-launch seconds (V views per launch)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[256],
                    help="slot widths to probe (multiples of 128; a sweep "
                         "decomposes width-proportional vs fixed time)")
    ap.add_argument("--win", type=int, nargs=2, default=[512, 768])
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--dead", action="store_true",
                    help="zero the culling scalars so EVERY (slot, band) "
                         "pair is predicated off — measures the "
                         "scaffolding floor of the same compiled program")
    args = ap.parse_args(argv)

    results = []
    for sw in args.slots:
        dt = probe_tier(slot_w=sw, win_h=args.win[0], win_w=args.win[1],
                        rows=args.rows, dead=args.dead)
        results.append((sw, dt))
        tag = " [all pairs dead]" if args.dead else ""
        print(f"slot_w {sw}: {dt * 1e6:.1f} us/launch (V=4 views){tag}")
    if len(results) >= 2:
        xs = np.array([r[0] for r in results], np.float64)
        ys = np.array([r[1] for r in results], np.float64) * 1e6
        slope, intercept = np.polyfit(xs, ys, 1)
        print(f"linear fit: {slope * 128:.1f} us per +128 slot columns, "
              f"{intercept:.1f} us width-independent "
              f"({intercept / ys[0] * 100:.0f}% of the slot_w={xs[0]:.0f} "
              f"launch)")


if __name__ == "__main__":
    main()
