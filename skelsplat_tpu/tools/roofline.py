"""Roofline accounting for the fused Pallas raster kernel (VERDICT r4 #3).

Answers "what fraction of the VPU vector-issue bound does the measured
kernel time represent?" with arithmetic that can be re-checked line by
line, instead of the relative profiling PERF.md used through round 4.

Three ingredients:

1. **Static op count** (`PASS1_RENDER_PASSES` etc.): hand-audited vector-op
   passes per kernel body over its (rows, slot_w) block, from reading
   ops/pallas_raster.py. One "pass" = one elementwise VPU op over the
   block = ``rows*slot_w / (8*128)`` vector-register issues.
2. **Activity statistics** (`measure_activity`): how many (slot, band)
   bodies actually fire per macro step. The kernel band-culls per slot
   (``_band_overlaps``), so this depends on where the synthetic bodies
   project — measured here with the bench's own `_synthetic_inputs`
   through the production preprocess/bbox/tier code, at the INITIAL
   params (splats move ≤ a few px over a 500-iter refinement run, so
   init statistics are representative; verified: re-measuring after the
   run moves body counts by < 5%).
3. **Measured VPU issue rate** (`--probe`, TPU only): a Pallas kernel
   whose inner loop has the same dependence shape as the raster kernel's
   slot body — K sequential elementwise steps, each a pass of 16
   independent (8,128) vector registers — timed over enough grid
   programs to swamp launch overhead. This measures the achievable
   issue rate (ALU parallelism included) on THIS chip rather than
   trusting spec-sheet clocks.

Run:
    python -m skelsplat_tpu.tools.roofline            # CPU: activity + math
    python -m skelsplat_tpu.tools.roofline --probe    # TPU: + issue rate

Reference for the kernel being modeled: ops/pallas_raster.py
(_bwd_kernel pass 1/pass 2); measured per-macro kernel time from
PERF.md round 4 (89.8 us for V=4 views, 125 macros/frame).
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

# --- static vector-op pass counts (audited against ops/pallas_raster.py) ---
#
# One entry = one elementwise VPU op over the body's (rows, cw) block.
# exp() is a Mosaic polynomial expansion — counted as EXP_PASSES (the
# dominant uncertainty; 6-10 on TPU, we carry 8).
EXP_PASSES = 8

# pass-1 render body (_bwd_kernel lines 391-420, = _fwd_kernel 279-302):
#   prologue: xs add, tile_x add, xs<W cmp, in_img and                  =  4
#   _slot_alpha: dx, dy, dx2, a*dx2, dy2, c*dy2, add, *-0.5, dxdy,
#     b*dxdy, sub (power)                                               = 11
#     exp                                                               =  8
#     opa*E, min (alpha)                                                =  2
#     tile gates: 4 cmps + 3 ands                                       =  7
#     gate: 2 cmps + 2 ands                                             =  4
#   chain: T load, a_i select, 1-a_i, test mul, ge cmp, live and,
#     a_i*T, contrib select, clip max, clip min                         = 10
#   gt: broadcast mul, +B                                               =  2
#   mask: gt>0, r>0, or, and                                            =  4
#   loss: d sub, d*d (or |d|), select, sum-reduce, mask f32, sum-reduce =  6
#   T update: select ge, select gate, store                             =  3
PASS1_RENDER_PASSES = 4 + 11 + EXP_PASSES + 2 + 7 + 4 + 10 + 2 + 4 + 6 + 3

# pass-1 stack writes inside the render body (combined kernel only):
#   al select+store, Ti store, ghat: derr sign/2d + and + select +
#   store, E store  (gstacks form — the headline tier fits 4 stacks)
PASS1_STACK_PASSES = 2 + 1 + 4 + 1

# pass-1 per-slot stack zeroing (lines 388-389) runs for EVERY slot in
# EVERY program, outside the pl.when: 2 stores.
PASS1_ZERO_PASSES = 2

# GT-only body (lines 422-430): xs add, xs<W, and, gt mul, +B, gt>0,
# and, err, select, sum, f32, sum
GT_ONLY_PASSES = 12

# pass-2 body (lines 437-484, gstacks form):
#   xs add, tile_x add                                                  =  2
#   a_i load, live cmp, T_i load, ghat load, E load, dx, dy             =  7
#   suffix load, 1-a_i, div, T_i*ghat, sub, select (dalpha)             =  6
#   dpower: opa*E mul, mul                                              =  2
#   5 gradient partials: {-a*dx, -b*dy, sub, mul, reduce} x2 (px,py)    = 10
#     conic: dx*dx, *-0.5, mul, reduce; dx*dy, neg-mul, reduce;
#     dy*dy, *-0.5, mul, reduce                                         = 11
#   opacity: dalpha*E, reduce                                           =  2
#   suffix update: a_i*T_i, *ghat, add, store                           =  4
PASS2_PASSES = 2 + 7 + 6 + 2 + 10 + 11 + 2 + 4

# per-program fixed work (full win_w wide, not slot_w):
#   T init store, suffix init store (bwd)          = 2 passes @ win_w
#   _base_geometry: 2 iotas + 2 astype + add, floor+mul x2, in_rows cmp
#                                                  ~ 8 passes @ cw0
PROG_FIXED_WINW_PASSES = 2
PROG_FIXED_CW_PASSES = 8

VREG = 8 * 128  # f32 lanes per vector register


def headline_tier():
    """The H36M auto-cascade tier: (win_h, win_w, slot_w, rows)."""
    return 512, 768, 256, 64


def measure_activity(n_scenes: int = 8, W: int = 1002, H: int = 1000,
                     n_joints: int = 17, seed_offset: int = 0):
    """Count (slot, band) bodies per view at the headline tier, through the
    production preprocess/profiles/bbox code on synthetic H36M scenes."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_inputs
    from skelsplat_tpu.core import geometry
    from skelsplat_tpu.engine.trainer import init_params_jnp
    from skelsplat_tpu.ops import heatmaps as hm
    from skelsplat_tpu.ops import rasterizer
    from skelsplat_tpu.ops.pallas_raster import (
        pallas_view_bbox, pallas_view_profiles, window_bounds_from_bbox)

    win_h, win_w, slot_w, rows = headline_tier()
    n_bands = win_h // rows

    init, gt, p2d, cams_b = _synthetic_inputs(n_scenes, W, H,
                                              n_joints=n_joints)
    camsj = jax.tree.map(jnp.asarray, cams_b)
    render_bodies = []   # per view
    gt_bodies = []
    fits_count = 0
    n_views = p2d.shape[1]
    for s in range(n_scenes):
        params = init_params_jnp(jnp.asarray(init[s]), "h36m", 3.0, 1.0)
        cov6 = params.covariance()
        spec = hm.heatmap_spec(params.xyz, cov6, jnp.asarray(p2d[s]),
                               camsj, W, H)
        for v in range(n_views):
            cam_v = jax.tree.map(lambda x: x[v], camsj)
            spec_v = jax.tree.map(lambda x: x[v], spec)
            profiles = pallas_view_profiles(spec_v, W, H)
            spans = np.asarray(profiles[3])                   # (N,4)
            bbox = pallas_view_bbox(params, cam_v, spec_v, W, H,
                                    profiles=profiles)
            offs, fits = window_bounds_from_bbox(bbox, W, H, win_h, win_w,
                                                 rows)
            fits_count += bool(fits)
            r_off = float(offs[0])
            pp = rasterizer.preprocess_gaussians(
                params.xyz, cov6, params.opacity, cam_v, W, H)
            ry0 = np.asarray(pp.rect_min)[:, 1] * geometry.BLOCK_Y
            ry1 = np.asarray(pp.rect_max)[:, 1] * geometry.BLOCK_Y
            rend = 0
            gto = 0
            for b in range(n_bands):
                y0 = r_off + b * rows
                r_ov = (ry1 > y0) & (ry0 < y0 + rows)
                g_ov = (spans[:, 1] > y0) & (spans[:, 0] < y0 + rows)
                rend += int(r_ov.sum())
                gto += int((~r_ov & g_ov).sum())
            render_bodies.append(rend)
            gt_bodies.append(gto)
    return (float(np.mean(render_bodies)), float(np.mean(gt_bodies)),
            fits_count, n_scenes * n_views, n_bands)


def _probe_issue_rate(k_steps: int = 4096, n_prog: int = 1024,
                      rows: int = 64, cw: int = 256, chains: int = 1,
                      op: str = "fma"):
    """Measured VPU vector-issue rate (vreg ops/second) on the current
    backend: grid of ``n_prog`` sequential programs, each running
    ``k_steps`` dependent FMA passes over a (rows, cw) block — 16
    independent vregs per pass, dependent across passes, the same
    dependence shape as the raster kernel's slot chain.

    Timing discipline for the RPC tunnel (~3 ms/dispatch, ~12 ms/fetch,
    which swamped a first small-probe attempt at 1.57 ms/call): each call
    carries ~10 ms of device work (fori_loop inside the kernel), and the
    rate comes from the DIFFERENCE between a long and a short run of
    back-to-back async dispatches, cancelling the constant dispatch/fetch
    overhead."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    unroll = 64
    assert k_steps % unroll == 0
    import jax.numpy as _jnp

    def _mix(x):
        # one render-body-representative slice: 8 vector ops with the
        # kernel's instruction mix (arith / cmp / bool / select), kept a
        # dependent bounded chain (x stays in [0, ~1])
        d = x - 0.5                       # sub
        p = d * d                         # mul
        q = p * 0.25 + x * 0.5            # mul, mul, add (no fused fma)
        m = (p <= 0.26) & (x >= 1e-3)     # cmp, cmp, and
        return _jnp.where(m, q, x)        # select
    MIX_OPS = 9

    STEP = {
        "fma": lambda x: x * 1.0000001 + 1e-9,
        "mul": lambda x: x * 1.0000001,
        # x stays ~0: exp(~0)*eps-eps keeps the chain dependent & bounded
        "exp": lambda x: _jnp.exp(x) * 1e-7 - 1e-7,
        "mix": _mix,
    }[op]
    ops_per_step = MIX_OPS if op == "mix" else 1

    def kernel(x_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = x_ref[:]

        def body(j, xs):
            # ``chains`` independent dependent-chains, interleaved — the
            # straight-line unroll matches the raster kernel's codegen
            # (no per-step loop overhead); chains > 1 measures how much
            # ILP the VPU can convert into issue rate
            for _ in range(unroll // chains):
                xs = tuple(STEP(x) for x in xs)
            return xs

        xs = jax.lax.fori_loop(
            0, k_steps // unroll, body,
            tuple(acc[:] * (1.0 + 1e-6 * c) for c in range(chains)))
        acc[:] = functools.reduce(lambda a, b: a + b, xs)

        @pl.when(pl.program_id(0) == n_prog - 1)
        def _():
            o_ref[:] = acc[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(n_prog,),
            in_specs=[pl.BlockSpec((rows, cw), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, cw), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cw), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, cw), jnp.float32)],
        )(x)

    x = jnp.ones((rows, cw), jnp.float32)
    np.asarray(run(x))  # compile + warm

    def timed(reps):
        t0 = time.perf_counter()
        out = x
        for _ in range(reps):
            out = run(out)
        np.asarray(out)
        return time.perf_counter() - t0

    short, long_ = 2, 12
    dts = sorted((timed(long_) - timed(short)) / (long_ - short)
                 for _ in range(3))
    dt = dts[1]  # median of 3 differenced estimates
    vregs_per_pass = rows * cw // VREG
    total_vregs = n_prog * k_steps * ops_per_step * vregs_per_pass
    return total_vregs / dt, dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true",
                    help="measure the VPU issue rate on the TPU (otherwise "
                         "use --issue-rate)")
    ap.add_argument("--issue-rate", type=float, default=None,
                    help="vreg ops/second to assume when not probing "
                         "(e.g. 6.2e9 = measured v5e rate)")
    ap.add_argument("--kernel-us", type=float, default=89.8,
                    help="measured per-macro combined-kernel time, V views "
                         "(PERF.md round-4 profile)")
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=8)
    args = ap.parse_args(argv)

    exp_weight = float(EXP_PASSES)
    if args.probe:
        r_mul, _ = _probe_issue_rate(op="mul")
        r_fma, _ = _probe_issue_rate(op="fma")
        r_exp, _ = _probe_issue_rate(op="exp", k_steps=1024)
        r_mix, _ = _probe_issue_rate(op="mix", k_steps=1024)
        print(f"probe (Gvreg-passes/s): mul {r_mul / 1e9:.2f}, "
              f"fma {r_fma / 1e9:.2f}, exp-chain {r_exp / 1e9:.2f}, "
              f"kernel-mix {r_mix / 1e9:.2f}")
        print(f"  -> fma = {r_mul / r_fma:.2f} mul-instructions, "
              f"exp+mul+sub = {r_mul / r_exp:.2f} mul-instructions")
        # express the kernel's op budget in measured units: the static
        # table counts muls/adds/cmps/selects as 1 pass each — the MIX
        # probe measures the sustained rate for exactly that mix — and
        # exp as EXP_PASSES, replaced by its measured weight in mix
        # units (subtracting the probe chain's own mul+sub)
        exp_weight = max(r_mix / r_exp - 2.0, 1.0)
        rate = r_mix
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
        rate = args.issue_rate

    rend, gto, fits, total_views, n_bands = measure_activity(args.scenes)
    win_h, win_w, slot_w, rows = headline_tier()
    n = 17
    vregs_slot = rows * slot_w // VREG       # 16 per pass at (64, 256)
    vregs_winw = rows * win_w // VREG        # 48 per pass at (64, 768)

    p1_render = (PASS1_RENDER_PASSES - EXP_PASSES + exp_weight
                 + PASS1_STACK_PASSES)
    body_vregs = (rend * (p1_render + PASS2_PASSES) + gto * GT_ONLY_PASSES) \
        * vregs_slot
    zero_vregs = n_bands * n * PASS1_ZERO_PASSES * vregs_slot
    fixed_vregs = n_bands * (PROG_FIXED_WINW_PASSES * vregs_winw
                             + PROG_FIXED_CW_PASSES * vregs_slot)
    per_view = body_vregs + zero_vregs + fixed_vregs
    total = per_view * args.views

    print(f"tier {win_h}x{win_w}x{slot_w} rows={rows} "
          f"({n_bands} bands/view), window fits {fits}/{total_views} views")
    print(f"activity/view: {rend:.1f} render bodies, {gto:.1f} GT-only "
          f"bodies (of {n_bands * n} slot-band pairs)")
    print(f"pass counts: render {p1_render:.1f} + pass2 {PASS2_PASSES} "
          f"(exp weight {exp_weight:.1f}), gt-only {GT_ONLY_PASSES}")
    v = args.views
    print(f"vreg issues/macro (V={v}): bodies {body_vregs * v:,.0f} "
          f"+ stack-zero {zero_vregs * v:,} + fixed {fixed_vregs * v:,} "
          f"= {total:,.0f}")
    if rate:
        sol_us = total / rate * 1e6
        frac = sol_us / args.kernel_us
        print(f"vector-issue speed of light: {sol_us:.1f} us/macro at "
              f"{rate / 1e9:.2f} Gvreg/s")
        print(f"measured kernel {args.kernel_us:.1f} us/macro -> "
              f"{frac * 100:.0f}% of the issue bound")
    else:
        print("no issue rate given (--probe on TPU or --issue-rate) — "
              "printed op counts only")


if __name__ == "__main__":
    main()
