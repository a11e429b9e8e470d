"""Pallas TPU kernel: fully-fused splat rasterization + GT heatmap + masked
MSE loss, forward and analytic backward.

This is the TPU-native replacement for the reference's hot path — the CUDA
renderCUDA forward (forward.cu:278-401) and backward (backward.cu:452-638)
plus the per-iteration loss (train.py:140-150) — collapsed into one kernel:

* the image is never materialized: each grid program owns a (ROWS, W)
  pixel block in VMEM, composites all N depth-sorted Gaussians (N ≤ 19, so
  the loop is unrolled — no binning/sorting machinery on-device), evaluates
  the closed-form GT heatmap from precomputed separable profiles, and
  accumulates the masked error sum S and mask count C;
* the grid usually covers only a dynamic WINDOW around the union bbox of
  (splat rects ∪ GT supports) — a static-shape crop selected per macro
  step via a tier cascade with an exact full-frame fallback
  (``pallas_window_bounds`` / the trainer's lax.switch);
* HBM traffic per view is ~N·(H+W+16) floats in and grid·(N·6+2) floats
  out — about 10⁴× less than the reference's per-iteration image traffic;
* the backward kernel recomputes the per-block compositing chain
  (rematerialization — VMEM only) and produces per-Gaussian analytic
  gradients of S w.r.t. screen-space quantities (pixel center, conic,
  opacity), mirroring the α-chain adjoint of backward.cu:452-638: the
  suffix-sum term −Σ_{k>i} contrib_k·ḡ_k /(1−α_i) falls out of a reverse
  unrolled pass.

Gradients w.r.t. 3D parameters come from JAX autodiff of the (tiny, N-sized)
screen-space preprocess around the kernel — the equivalent of the CUDA
computeCov2DCUDA / preprocessCUDA backward stages (backward.cu:147-449),
derived instead of hand-written.

Exactness: tests assert value & gradient equality with ops/fused (the
XLA reference path) to float tolerance, in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skelsplat_tpu.core import geometry
from skelsplat_tpu.ops import heatmaps as hm
from skelsplat_tpu.ops import rasterizer

import os as _os

# pixel rows per grid program: fewer/taller programs trade per-program
# overhead against coarser band culling. Measured (PERF.md): 8 < 16 < 32
# (0.038 vs 0.044 s/frame H36M at 32 vs 16; same ordering on panoptic/op);
# env knob for experiments.
ROWS = int(_os.environ.get("SKELSPLAT_PALLAS_ROWS", "32"))
LANES = 128        # last-dim padding quantum

# Slot scalars reach the kernel one of two ways (SKELSPLAT_PALLAS_PACK):
#  * "xla" (default): the depth-SORTED (N, 16) pack below, with p2
#    pre-permuted by a HIGHEST one-hot matmul.
#  * "kernel" (the round-5 zero-glue experiment — measured
#    neutral-to-slightly-slower on the headline sweep, kept env-gated;
#    PERF.md round 5): UNSORTED per-quantity SMEM refs — gd (6, N)
#    differentiated [pix_x, pix_y, conic a/b/c, opa], aux (N, AUX_COLS)
#    stop-grad [rect4, B, gt_row_lo/hi, col_slice_start] — plus the
#    depth order; program 0 gathers them into a sorted scratch pack
#    (bitwise the HIGHEST one-hot sort matmuls this replaces). The true
#    image (W, H) rides in offs_ref[0, 2:4] there.
# gauss pack layout (N, 16): [pix_x, pix_y, conic_a, conic_b,
#   conic_c, opa, rect_min_x, rect_min_y, rect_max_x, rect_max_y, B,
#   width, height, gt_row_lo, gt_row_hi, col_slice_start]
PACK = 16

# REJECTED (round 4, measured ON CHIP): running the per-macro p1 depth
# permute as a precision=HIGH one-hot matmul on 2^48-prescaled profiles.
# The theory assumed HIGH is a 3-term bf16 split (24 mantissa bits — would
# be exact once prescaling lifts entries out of the subnormal zone); the
# on-chip probe measured max rel error 1.4949e-5 ≈ 2^-16 on prescaled
# NORMAL inputs — HIGH is a 2-term split (16 mantissa bits) on this TPU
# generation and can NEVER reproduce f32's 24-bit mantissa. Exactness of
# the depth permute is a parity invariant (the kernel gt chain must round
# identically), so the permute stays at HIGHEST (6-pass, exact for all
# f32). See PERF.md round-4 rejections.
IDX_PX, IDX_PY, IDX_CA, IDX_CB, IDX_CC, IDX_OPA = 0, 1, 2, 3, 4, 5
IDX_RX0, IDX_RY0, IDX_RX1, IDX_RY1, IDX_B, IDX_W, IDX_H = 6, 7, 8, 9, 10, 11, 12
IDX_GY0, IDX_GY1, IDX_C0 = 13, 14, 15


def _interpret_default():
    return jax.default_backend() != "tpu"


def _lazy_slot_read() -> bool:
    """SKELSPLAT_PALLAS_SLOTREAD — "lazy" (default, ADOPTED round 5):
    read only the 5 culling-test scalars per (slot, band) iteration
    upfront (_read_slot_hdr), defer the remaining pack scalars into the
    pl.when regions (only ~21% of (slot, band) pairs are active at the
    headline tier), and skip the bwd-stack pre-zeroing (dead — pass 2
    reads a slot's stacks only under the same rends[i] predicate that
    guarantees pass 1 overwrote them). "eager" restores the round-4
    form: all PACK scalars upfront + unconditional α/T stack zeroing.
    Bitwise identical (pure load reordering + dead-store removal;
    tests/test_pallas.py::test_lazy_slot_read_variant_bitwise); measured
    0.0162 vs 0.0176 s/frame eager on the headline sweep, interleaved
    A/B×2 — the first slice of the roofline's 51.8 µs width-independent
    scaffolding residue to fall (PERF.md round 5)."""
    return _os.environ.get("SKELSPLAT_PALLAS_SLOTREAD", "lazy") == "lazy"


# The round-4 Pallas EWA-preprocess kernel (SKELSPLAT_PALLAS_PREPROCESS)
# was PRUNED in round 5: it measured perf-neutral (lane-major) or worse
# (sublane-major), and the round-5 zero-glue pack experiment closed the
# whole move-the-pack-into-the-kernel family with measured rejections —
# see PERF.md rounds 4-5 for the numbers and the recorded lessons.


def _base_geometry(y0f, rows, cw):
    """Shared per-program block geometry: ys/tile_y (column-invariant) and
    ZERO-offset xs/tile_x bases. Every slot's absolute coordinates are the
    bases plus its scalar column offset (a multiple of BLOCK_X=16, so
    ``floor((x+K)/16) == floor(x/16) + K/16`` holds bitwise on integers
    < 2^24) — hoisting ~8 vector ops per slot per pass out of the slot
    loop, which is where the kernel's vector-issue time goes."""
    ys = (jnp.float32(y0f) + jax.lax.broadcasted_iota(
        jnp.int32, (rows, cw), 0).astype(jnp.float32))
    xs0 = jax.lax.broadcasted_iota(
        jnp.int32, (rows, cw), 1).astype(jnp.float32)
    tile_y = jnp.floor(ys / geometry.BLOCK_Y)
    tile_x0 = jnp.floor(xs0 / geometry.BLOCK_X)
    return ys, xs0, tile_x0, tile_y


class _Slot:
    """Per-slot SMEM scalars, read once per body.

    Two sources (``_read_slot``): the legacy depth-SORTED (n, PACK) pack
    (``g_ref``), or — the zero-glue default — the UNSORTED per-quantity
    refs plus the depth order (``ord_ref``): the kernel indexes slot rank
    i's joint as ``idx = ord_ref[0, i]`` and reads every scalar at
    ``idx``, which is bitwise the HIGHEST one-hot sort matmuls it
    replaces (each of those was exactly this gather). ``p2i`` is the
    slot's row index into the (possibly unsorted) p2 profile ref."""

    __slots__ = ("px", "py", "ca", "cb", "cc", "opa", "rx0", "ry0",
                 "rx1", "ry1", "B", "gy0", "gy1", "c0", "p2i")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


# unsorted aux pack columns (stop-gradient half of the zero-glue inputs)
AUX_RX0, AUX_RY0, AUX_RX1, AUX_RY1 = 0, 1, 2, 3
AUX_B, AUX_GY0, AUX_GY1, AUX_C0 = 4, 5, 6, 7
AUX_COLS = 8


# sorted SMEM scratch-pack layout (zero-glue path): columns 0-5 are
# IDX_PX..IDX_OPA, then the aux columns in AUX order
SCR_COLS = 6 + AUX_COLS


def _assemble_pack(n, ord_ref, gd_ref, aux_ref, p2_ref, g_scr, p2s_ref):
    """Program 0 gathers the UNSORTED per-quantity inputs into a
    depth-SORTED scratch pack — n·14 scalar SMEM loads plus n p2 row
    copies, ONCE per view — so every slot body reads statically (dynamic
    per-body loads measured +5% on the headline sweep, round 5). The TPU
    grid is sequential and scratch persists across programs (the same
    property the in-kernel p1 permute and SMEM out_ref accumulation
    rely on). The gathers are bitwise the HIGHEST one-hot sort matmuls
    they replace."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        for i in range(n):
            idx = ord_ref[0, i].astype(jnp.int32)
            for j in range(6):
                g_scr[i, j] = gd_ref[j, idx]
            for j in range(AUX_COLS):
                g_scr[i, 6 + j] = aux_ref[idx, j]
            p2s_ref[pl.ds(i, 1), :] = p2_ref[pl.ds(idx, 1), :]


def _read_slot_hdr(i, g_ref, g_scr):
    """The 5 scalars the per-band culling tests need BEFORE the predicated
    regions (band overlaps + the slot column slice): ry0/ry1 (splat rect
    rows, tile units), gy0/gy1 (GT row span), c0 (slot column start).
    The lazy slot-read mode (SKELSPLAT_PALLAS_SLOTREAD) reads only these
    upfront and defers the remaining 10 pack scalars into the pl.when
    regions — only ~21% of (slot, band) pairs are active at the headline
    tier (roofline body-activity replay, PERF.md round 5), so the eager
    form spends most of its per-body scalar SMEM loads on bodies whose
    both predicates are false."""
    if g_scr is not None:
        return _Slot(ry0=g_scr[i, 6 + AUX_RY0], ry1=g_scr[i, 6 + AUX_RY1],
                     gy0=g_scr[i, 6 + AUX_GY0], gy1=g_scr[i, 6 + AUX_GY1],
                     c0=g_scr[i, 6 + AUX_C0], p2i=i)
    return _Slot(ry0=g_ref[i, IDX_RY0], ry1=g_ref[i, IDX_RY1],
                 gy0=g_ref[i, IDX_GY0], gy1=g_ref[i, IDX_GY1],
                 c0=g_ref[i, IDX_C0], p2i=i)


def _read_slot(i, g_ref, g_scr):
    if g_scr is not None:       # zero-glue: the program-0 sorted scratch
        return _Slot(
            px=g_scr[i, 0], py=g_scr[i, 1], ca=g_scr[i, 2],
            cb=g_scr[i, 3], cc=g_scr[i, 4], opa=g_scr[i, 5],
            rx0=g_scr[i, 6 + AUX_RX0], ry0=g_scr[i, 6 + AUX_RY0],
            rx1=g_scr[i, 6 + AUX_RX1], ry1=g_scr[i, 6 + AUX_RY1],
            B=g_scr[i, 6 + AUX_B], gy0=g_scr[i, 6 + AUX_GY0],
            gy1=g_scr[i, 6 + AUX_GY1], c0=g_scr[i, 6 + AUX_C0], p2i=i)
    return _Slot(
        px=g_ref[i, IDX_PX], py=g_ref[i, IDX_PY], ca=g_ref[i, IDX_CA],
        cb=g_ref[i, IDX_CB], cc=g_ref[i, IDX_CC], opa=g_ref[i, IDX_OPA],
        rx0=g_ref[i, IDX_RX0], ry0=g_ref[i, IDX_RY0],
        rx1=g_ref[i, IDX_RX1], ry1=g_ref[i, IDX_RY1],
        B=g_ref[i, IDX_B], gy0=g_ref[i, IDX_GY0],
        gy1=g_ref[i, IDX_GY1], c0=g_ref[i, IDX_C0], p2i=i)


def _slot_alpha(s, ys, xs, tile_x, tile_y):
    """α and gate of sorted slot ``s`` over the block (forward.cu:346-366)."""
    dx = s.px - xs
    dy = s.py - ys
    a, b, c = s.ca, s.cb, s.cc
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    E = jnp.exp(power)
    alpha = jnp.minimum(geometry.ALPHA_MAX, s.opa * E)
    tg = ((tile_x >= s.rx0) & (tile_x < s.rx1)
          & (tile_y >= s.ry0) & (tile_y < s.ry1))
    gate = (power <= 0.0) & (alpha >= geometry.ALPHA_MIN) & tg
    return alpha, gate, E, dx, dy, power


def _band_overlaps(s, y0f, rows):
    """Scalar predicates: does slot ``s``'s splat rect / GT support intersect
    this program's row band [y0, y0+rows)? Tile rects are in tile units."""
    ry0 = s.ry0 * geometry.BLOCK_Y
    ry1 = s.ry1 * geometry.BLOCK_Y
    rend = (ry1 > y0f) & (ry0 < y0f + rows)
    gt = (s.gy1 > y0f) & (s.gy0 < y0f + rows)
    return rend, gt


def _err(d, l1: bool):
    """Per-pixel error term: |d| for the l1 family (l1_gaussian/l1_masked,
    loss_utils.py:103-118), d² for l2_gaussian (loss_utils.py:86-100)."""
    return jnp.abs(d) if l1 else d * d


def _derr(d, l1: bool):
    """∂err/∂render — sign(d) for l1 (the jnp.abs VJP: sign(0)=0), 2d for
    l2 — so the kernel's analytic backward matches the XLA autodiff paths
    bit-for-bit per loss."""
    return jnp.sign(d) if l1 else 2.0 * d


def _p2_row(p2src, s, cols_p2):
    """Slot ``s``'s (1, cw) GT column-profile row — a static sorted-row
    read in both pack modes (the zero-glue path's program 0 gathers the
    unsorted p2 into sorted scratch once, ``_assemble_pack``)."""
    return p2src[s.p2i:s.p2i + 1, cols_p2]


def _slot_cols(s, slot_w, w_pad, p2_w, c_off):
    """Column slices of slot ``s``: ``(cols_T, cols_p2, c0f, cw)``.

    ``cols_T`` indexes the WINDOW-width chain state (T/done/suffix,
    width ``w_pad``); ``cols_p2`` indexes the FULL-width profile rows
    (width ``p2_w`` — the profiles are no longer pre-sliced in XLA, a
    batched dynamic-slice per view cost ~10 µs/macro as an unrolled
    while loop); ``c_off`` is the window's absolute column origin.

    With slot slicing on, both are the 128-aligned per-slot window (pack
    IDX_C0, window-relative, computed host-side to cover the slot's
    render ∪ GT column support). All of a slot's nonzero work lives
    inside its slice, so restricting every vector op to it is exact — it
    just skips columns that would contribute identical zeros."""
    if slot_w is not None and slot_w < w_pad:
        c0f = s.c0
        c0 = pl.multiple_of(c0f.astype(jnp.int32), LANES)
        cols_p2 = pl.ds(pl.multiple_of(c0 + c_off, LANES), slot_w)
        return pl.ds(c0, slot_w), cols_p2, c0f, slot_w
    if p2_w > w_pad:
        # unsliced windowed tier against full-width profiles
        return (slice(None), pl.ds(pl.multiple_of(c_off, LANES), w_pad),
                jnp.float32(0.0), w_pad)
    return slice(None), slice(None), jnp.float32(0.0), w_pad


def _p1_col(p1_ref, p1s_ref, row0, r_off, rows, i):
    """Slot ``i``'s (rows, 1) GT row-profile column for the band at
    ``row0``: from the in-kernel permuted WINDOW scratch (default —
    scratch rows are window-relative, hence ``row0 - r_off``), or from
    the externally permuted FULL p1 (SKELSPLAT_PALLAS_PERMUTE=xla)."""
    if p1s_ref is not None:
        return p1s_ref[pl.ds(row0 - r_off, rows), i:i + 1]
    return p1_ref[pl.ds(row0, rows), i:i + 1]


def _inkernel_permute(p1_ref, pl_ref, p1s_ref, r_off):
    """Program 0 permutes the WINDOW rows of the unpermuted p1 into VMEM
    scratch with ONE one-hot dot at HIGHEST (bitwise the external XLA
    permute row-for-row — each output element is its own row's K=128
    contraction). Later programs reuse the scratch: the TPU grid is
    sequential and scratch persists across programs (the same property
    the SMEM out_ref accumulation relies on)."""
    win_h = p1s_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        p1s_ref[:] = jax.lax.dot_general(
            p1_ref[pl.ds(r_off, win_h), :], pl_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)


def _fwd_kernel(n: int, l1: bool, slot_w, band_exit, inker, inpack, lazy,
                *args):
    """Default pack path: g_ref SMEM (n, PACK), depth-sorted, with p2
    pre-permuted. Zero-glue path (``inpack``, SKELSPLAT_PALLAS_PACK=
    kernel — measured neutral, env-gated): gd_ref SMEM (6, n) UNSORTED
    differentiated scalars [px, py, conic a/b/c, opa], aux_ref SMEM
    (n, AUX_COLS) UNSORTED stop-grad scalars (rect, B, GT row span, slot
    col start), ord_ref SMEM (1, n) f32 depth order — program 0 gathers
    them (and the unsorted p2's rows) into sorted scratch
    (``_assemble_pack``, bitwise the external HIGHEST one-hot sort
    matmuls this replaces) and every body reads statically.

    p1_ref: VMEM (H_pad, 128) FULL lane-per-slot row profiles (each
    program reads its own band — pre-slicing the window in XLA cost an
    unrolled while loop per view under vmap); p2_ref: VMEM (n, W_pad)
    FULL column profiles; offs_ref: SMEM window origin (row, col) in
    absolute pixels (zeros when unwindowed) — (1, 2), or (1, 4) with the
    true image (W, H) appended on the zero-glue path; out_ref: SMEM
    (1, 2). The window extent comes from the T_ref scratch shape:
    (rows, win_w).

    Per-slot row-band culling: a slot whose splat rect misses this band has
    gate ≡ false here (zero α, unchanged T chain) so its compositing work is
    skipped exactly; if its GT support also misses, the slot contributes
    nothing at all. This exploits the extreme sparsity of skeleton splats
    (each Gaussian touches a handful of the ROWS-tall bands).

    ``slot_w``: optional static per-slot column-slice width — every vector
    op for slot i runs over its (ROWS, slot_w) column window instead of the
    full (ROWS, w_pad) block (the dominant cost at Panoptic widths; splats
    are ~100-300 px wide against 1024+ px windows).

    ``band_exit``: measurement probe (SKELSPLAT_PALLAS_BANDEXIT) — skip a
    slot's compositing body when every pixel of its column slice has
    already fired the T_MIN early-out (T ≡ 0). Exact: dead pixels have
    contrib = 0 so the render branch degenerates to the GT-only terms,
    which the fallback branch still pays (a dead slice does NOT cancel the
    slot's gt>0 loss contributions — the reason full-band death essentially
    never pays on skeleton splats). The aliveness test is itself a
    slot-sized reduction, which is the probe's cost.

    ``inker`` (the default; SKELSPLAT_PALLAS_PERMUTE=xla disables) — p1
    arrives UNPERMUTED plus the one-hot lane permutation PL as an extra
    VMEM input; program 0 permutes the window rows into scratch with one
    dot (see _inkernel_permute) and slot reads come from the scratch.
    Bitwise the external permute; trades the external (H_pad, 128) matmul
    op + its HBM round-trip for a window-rows-only in-kernel dot
    (measured 0.0163 vs 0.0168 s/frame on the headline sweep).
    """
    if inpack:
        gd_ref, aux_ref, ord_ref, p1_ref, p2_ref, offs_ref, *rest = args
        g_ref = None
    else:
        g_ref, p1_ref, p2_ref, offs_ref, *rest = args
        gd_ref = aux_ref = ord_ref = None
    pl_ref = rest.pop(0) if inker else None
    out_ref = rest.pop(0)
    T_ref = rest.pop(0)
    if inpack:
        g_scr, p2s_ref = rest.pop(0), rest.pop(0)
        p2src = p2s_ref
    else:
        g_scr, p2src = None, p2_ref
    p1s_ref = rest.pop(0) if inker else None
    rows, w_pad = T_ref.shape
    p2_w = p2src.shape[1]
    r_off = offs_ref[0, 0].astype(jnp.int32)
    c_off = offs_ref[0, 1].astype(jnp.int32)
    row0 = r_off + pl.program_id(0) * rows
    y0f = row0.astype(jnp.float32)
    if inpack:
        _assemble_pack(n, ord_ref, gd_ref, aux_ref, p2_ref, g_scr,
                       p2s_ref)
    if inker:
        _inkernel_permute(p1_ref, pl_ref, p1s_ref, r_off)

    # TPU grid programs run sequentially: the shared SMEM output block is
    # zeroed by the first program and accumulated by all of them.
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    # Chain state lives in VMEM scratch so the per-slot bodies are pure
    # side effects under pl.when (Mosaic cannot handle lax.cond carrying
    # many vector results, but predicated ref mutation is the canonical
    # pattern). The early-out ("done") mask is encoded IN T: a pixel that
    # fires the T_MIN early-out has its T set to 0, and since
    # test = T·(1−α) ≤ T, every later slot sees test = 0 < T_MIN — so
    # live = gate & (test ≥ T_MIN) reproduces the separate done chain
    # exactly while saving its load/update/store per slot and its
    # (rows, win_w) scratch.
    T_ref[:] = jnp.ones((rows, w_pad), jnp.float32)
    cw0 = slot_w if (slot_w is not None and slot_w < w_pad) else w_pad
    ys, xs0, tx0, tile_y = _base_geometry(y0f, rows, cw0)
    img_w = offs_ref[0, 2] if inpack else g_ref[0, IDX_W]
    in_rows = ys < (offs_ref[0, 3] if inpack else g_ref[0, IDX_H])
    for i in range(n):
        s = _read_slot_hdr(i, g_ref, g_scr) if lazy \
            else _read_slot(i, g_ref, g_scr)
        rend_ov, gt_ov = _band_overlaps(s, y0f, rows)
        cols, cols_p2, c0f, cw = _slot_cols(s, slot_w, w_pad, p2_w, c_off)
        if band_exit:
            rend_ov = rend_ov & (jnp.max(T_ref[:, cols]) > 0.0)

        @pl.when(rend_ov)
        def _(i=i, s=s, cols=cols, cols_p2=cols_p2, c0f=c0f):
            if lazy:        # deferred pack read: only active bodies pay it
                s = _read_slot(i, g_ref, g_scr)
            x_off = offs_ref[0, 1] + c0f
            xs = xs0 + x_off
            tile_x = tx0 + x_off * (1.0 / geometry.BLOCK_X)
            in_img = in_rows & (xs < img_w)
            T = T_ref[:, cols]
            alpha, gate, _, _, _, _ = _slot_alpha(s, ys, xs,
                                                  tile_x, tile_y)
            a_i = jnp.where(gate, alpha, 0.0)
            test = T * (1.0 - a_i)
            ge = test >= geometry.T_MIN
            live = gate & ge
            contrib = jnp.where(live, a_i * T, 0.0)
            r = jnp.clip(contrib, 0.0, 1.0)
            gt = (_p1_col(p1_ref, p1s_ref, row0, r_off, rows, i)
                  * _p2_row(p2src, s, cols_p2) + s.B)
            mask = ((gt > 0.0) | (r > 0.0)) & in_img
            d = r - gt
            out_ref[0, 0] += jnp.sum(jnp.where(mask, _err(d, l1), 0.0))
            out_ref[0, 1] += jnp.sum(mask.astype(jnp.float32))
            # gated & below T_MIN → early-out: T := 0 (the done encoding)
            T_ref[:, cols] = jnp.where(
                gate, jnp.where(ge, test, 0.0), T)

        @pl.when(jnp.logical_not(rend_ov) & gt_ov)
        def _(i=i, s=s, cols_p2=cols_p2, c0f=c0f):
            if lazy:        # only B is missing from the header here
                s = _Slot(B=(g_scr[i, 6 + AUX_B] if g_scr is not None
                             else g_ref[i, IDX_B]), p2i=i)
            xs = xs0 + (offs_ref[0, 1] + c0f)
            in_img = in_rows & (xs < img_w)
            gt = (_p1_col(p1_ref, p1s_ref, row0, r_off, rows, i)
                  * _p2_row(p2src, s, cols_p2) + s.B)
            mask = (gt > 0.0) & in_img
            out_ref[0, 0] += jnp.sum(jnp.where(mask, _err(gt, l1), 0.0))
            out_ref[0, 1] += jnp.sum(mask.astype(jnp.float32))


def _bwd_kernel(n: int, l1: bool, slot_w, gstacks: bool, band_exit, inker,
                inpack, lazy, *args):
    """Combined forward+backward: pass 1 runs the band-culled compositing
    chain — emitting the SAME (S, C) accumulation as _fwd_kernel, in the
    same per-slot order, so values are bitwise the forward's — and stores
    per-slot (live-masked α, T before the slot) into VMEM scratch stacks;
    pass 2 walks slots in reverse, accumulating the suffix term and the
    per-slot gradient partials (backward.cu:452-638's α-chain adjoint).
    Skipped slots store zeros, so the suffix passes through them
    untouched. One kernel per grad step replaces the fwd+bwd pair (the
    value_and_grad path never runs _fwd_kernel at all).

    ``gstacks``: stash ∂S/∂render (ghat) and the Gaussian factor E in two
    MORE scratch stacks during pass 1, so pass 2 skips the GT outer
    product, render/mask reconstruction and the α/exp recompute entirely
    — bitwise-neutral (the stored values are exactly what pass 2 would
    recompute: r = clip(α·T) with the live-masked α equals pass 1's
    clip(contrib)). The caller enables it whenever the 4-stack VMEM
    budget holds (``_gstacks_fit``); wide unsliced tiers and the
    full-frame fallback keep the 2-stack recompute form.

    With ``slot_w`` set, every per-slot vector op (both passes, including
    the scratch stacks, sized (n, ROWS, slot_w)) runs over the slot's
    column slice; the T/done/suffix chains stay full-width so cross-slot
    coupling at shared pixels is preserved exactly.

    ``inker``: see _fwd_kernel — PL input after offs, window-permuted p1
    scratch appended after the gstacks.

    ``inpack``: see _fwd_kernel — unsorted per-quantity refs + depth
    order instead of the sorted pack; the gradient block is then
    (1, n*6) in RANK order (offsets 0-5 = IDX_PX..IDX_OPA), unsorted by
    one tiny XLA gather in the VJP wrapper (no adjoint of IT is ever
    taken)."""
    if inpack:
        gd_ref, aux_ref, ord_ref, p1_ref, p2_ref, offs_ref, *rest = args
        g_ref = None
    else:
        g_ref, p1_ref, p2_ref, offs_ref, *rest = args
        gd_ref = aux_ref = ord_ref = None
    pl_ref = rest.pop(0) if inker else None
    out_ref, dg_ref = rest.pop(0), rest.pop(0)
    T_ref, al_ref = rest.pop(0), rest.pop(0)
    Ti_ref, sfx_ref = rest.pop(0), rest.pop(0)
    gh_ref, E_ref = (rest.pop(0), rest.pop(0)) if gstacks \
        else (None, None)
    if inpack:
        g_scr, p2s_ref = rest.pop(0), rest.pop(0)
        p2src = p2s_ref
    else:
        g_scr, p2src = None, p2_ref
    p1s_ref = rest.pop(0) if inker else None
    rows, w_pad = T_ref.shape
    p2_w = p2src.shape[1]
    r_off = offs_ref[0, 0].astype(jnp.int32)
    c_off = offs_ref[0, 1].astype(jnp.int32)
    row0 = r_off + pl.program_id(0) * rows
    y0f = row0.astype(jnp.float32)
    if inpack:
        _assemble_pack(n, ord_ref, gd_ref, aux_ref, p2_ref, g_scr,
                       p2s_ref)
    if inker:
        _inkernel_permute(p1_ref, pl_ref, p1s_ref, r_off)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0
        for j in range(dg_ref.shape[1]):
            dg_ref[0, j] = 0.0

    # early-out mask encoded in T (:= 0 on the T_MIN early-out), exactly
    # as in _fwd_kernel — pass 2 never reads the chain, so only pass 1
    # changes; the live-masked α stack is what carries liveness across.
    T_ref[:] = jnp.ones((rows, w_pad), jnp.float32)
    rends = []
    slots = [(_read_slot_hdr(i, g_ref, g_scr) if lazy
              else _read_slot(i, g_ref, g_scr)) for i in range(n)]
    slot_cols = [_slot_cols(slots[i], slot_w, w_pad, p2_w, c_off)
                 for i in range(n)]
    cw0 = slot_w if (slot_w is not None and slot_w < w_pad) else w_pad
    ys, xs0, tx0, tile_y = _base_geometry(y0f, rows, cw0)
    img_w = offs_ref[0, 2] if inpack else g_ref[0, IDX_W]
    in_rows = ys < (offs_ref[0, 3] if inpack else g_ref[0, IDX_H])
    for i in range(n):
        s = slots[i]
        rend_ov, gt_ov = _band_overlaps(s, y0f, rows)
        cols, cols_p2, c0f, cw = slot_cols[i]
        if band_exit:
            # measurement probe (see _fwd_kernel): a slot whose slice is
            # all early-outed skips compositing AND its pass-2 body (its
            # live mask is empty → exactly zero gradient/suffix terms);
            # the GT-only branch below still pays its gt>0 loss terms.
            rend_ov = rend_ov & (jnp.max(T_ref[:, cols]) > 0.0)
        rends.append(rend_ov)
        if not lazy:
            # dead in the lazy variant: pass 2 reads a slot's stacks only
            # under the SAME rends[i] predicate that guarantees pass 1's
            # region fully overwrote them (the persistence property the
            # gstacks already rely on — gh/E are never pre-zeroed)
            al_ref[i] = jnp.zeros((rows, cw), jnp.float32)
            Ti_ref[i] = jnp.zeros((rows, cw), jnp.float32)

        @pl.when(rend_ov)
        def _(i=i, s=s, cols=cols, cols_p2=cols_p2, c0f=c0f):
            if lazy:        # deferred pack read: only active bodies pay it
                s = _read_slot(i, g_ref, g_scr)
            x_off = offs_ref[0, 1] + c0f
            xs = xs0 + x_off
            tile_x = tx0 + x_off * (1.0 / geometry.BLOCK_X)
            in_img = in_rows & (xs < img_w)
            T = T_ref[:, cols]
            alpha, gate, E, dx, dy, power = _slot_alpha(
                s, ys, xs, tile_x, tile_y)
            a_i = jnp.where(gate, alpha, 0.0)
            test = T * (1.0 - a_i)
            ge = test >= geometry.T_MIN
            live = gate & ge
            contrib = jnp.where(live, a_i * T, 0.0)
            r = jnp.clip(contrib, 0.0, 1.0)
            gt = (_p1_col(p1_ref, p1s_ref, row0, r_off, rows, i)
                  * _p2_row(p2src, s, cols_p2) + s.B)
            mask = ((gt > 0.0) | (r > 0.0)) & in_img
            d = r - gt
            out_ref[0, 0] += jnp.sum(jnp.where(mask, _err(d, l1), 0.0))
            out_ref[0, 1] += jnp.sum(mask.astype(jnp.float32))
            # live-masked α: pass 2 recovers live = (stored α > 0)
            al_ref[i] = jnp.where(live, a_i, 0.0)
            Ti_ref[i] = T
            if gstacks:
                # exactly pass 2's recompute values, stored instead
                gh_ref[i] = jnp.where(mask & live, _derr(d, l1), 0.0)
                E_ref[i] = E
            T_ref[:, cols] = jnp.where(
                gate, jnp.where(ge, test, 0.0), T)

        @pl.when(jnp.logical_not(rend_ov) & gt_ov)
        def _(i=i, s=s, cols_p2=cols_p2, c0f=c0f):
            if lazy:        # only B is missing from the header here
                s = _Slot(B=(g_scr[i, 6 + AUX_B] if g_scr is not None
                             else g_ref[i, IDX_B]), p2i=i)
            xs = xs0 + (offs_ref[0, 1] + c0f)
            in_img = in_rows & (xs < img_w)
            gt = (_p1_col(p1_ref, p1s_ref, row0, r_off, rows, i)
                  * _p2_row(p2src, s, cols_p2) + s.B)
            mask = (gt > 0.0) & in_img
            out_ref[0, 0] += jnp.sum(jnp.where(mask, _err(gt, l1), 0.0))
            out_ref[0, 1] += jnp.sum(mask.astype(jnp.float32))

    # pass 2 (reverse): suffix in scratch; gradients only for band slots
    sfx_ref[:] = jnp.zeros((rows, w_pad), jnp.float32)
    for i in range(n - 1, -1, -1):
        s = slots[i]
        cols, cols_p2, c0f, cw = slot_cols[i]

        @pl.when(rends[i])
        def _(i=i, s=s, cols=cols, cols_p2=cols_p2, c0f=c0f):
            if lazy:        # deferred pack read (second read per active
                s = _read_slot(i, g_ref, g_scr)  # body; still far fewer
            x_off = offs_ref[0, 1] + c0f         # loads than eager-all)
            xs = xs0 + x_off
            tile_x = tx0 + x_off * (1.0 / geometry.BLOCK_X)
            a_i = al_ref[i]
            live = a_i > 0.0
            T_i = Ti_ref[i]
            if gstacks:
                ghat = gh_ref[i]
                E = E_ref[i]
                dx = s.px - xs
                dy = s.py - ys
            else:
                in_img = in_rows & (xs < img_w)
                # recompute ∂S/∂contrib from the stacks: contrib = α·T
                # exactly (α is live-masked, so r and mask match pass 1
                # bit-for-bit)
                r = jnp.clip(a_i * T_i, 0.0, 1.0)
                gt = (_p1_col(p1_ref, p1s_ref, row0, r_off, rows, i)
                      * _p2_row(p2src, s, cols_p2) + s.B)
                mask = ((gt > 0.0) | (r > 0.0)) & in_img
                ghat = jnp.where(mask & live, _derr(r - gt, l1), 0.0)
                # recompute E, dx, dy (cheaper than a third stack when
                # VMEM is tight)
                _, _, E, dx, dy, _ = _slot_alpha(s, ys, xs,
                                                 tile_x, tile_y)
            suffix = sfx_ref[:, cols]
            dalpha = jnp.where(
                live, T_i * ghat - suffix / (1.0 - a_i), 0.0)
            # α = min(0.99, opa·E): the reference backward chains through
            # the clamp unconditionally (backward.cu:619 dL_dG=opa·dL_dα,
            # :635 dL_dopacity=G·dL_dα) — so dα/dpower is the UNCLAMPED
            # product opa·E, with no clamp gate on dalpha.
            dpower = dalpha * (s.opa * E)
            # rank-ordered 6-wide block on the zero-glue path (offsets
            # 0-5 are IDX_PX..IDX_OPA in both layouts; the VJP wrapper
            # unsorts with one gather), PACK-strided on the legacy path
            base = i * (6 if inpack else PACK)
            dg_ref[0, base + IDX_PX] += jnp.sum(
                dpower * (-s.ca * dx - s.cb * dy))
            dg_ref[0, base + IDX_PY] += jnp.sum(
                dpower * (-s.cc * dy - s.cb * dx))
            dg_ref[0, base + IDX_CA] += jnp.sum(dpower * (-0.5 * dx * dx))
            dg_ref[0, base + IDX_CB] += jnp.sum(dpower * (-dx * dy))
            dg_ref[0, base + IDX_CC] += jnp.sum(dpower * (-0.5 * dy * dy))
            dg_ref[0, base + IDX_OPA] += jnp.sum(dalpha * E)
            sfx_ref[:, cols] = suffix + a_i * T_i * ghat


def _pack_specs(gauss, n):
    """in_specs prefix for the two pack modes."""
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    if gauss is not None:
        return [smem((n, PACK))]
    return [smem((6, n)), smem((n, AUX_COLS)), smem((1, n))]


def _run_fwd(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1, interpret,
             slot_w=None, rows=None, win_shape=None):
    """``p1``/``p2`` are the FULL profiles; ``win_shape`` (win_h, win_w)
    bounds the grid and the chain scratch — the kernel reads its own
    window bands/columns (XLA-side window slicing cost an unrolled while
    loop per view under vmap). ``pl_mat`` (LANES, LANES) one-hot lane
    permutation enables the in-kernel window permute (p1 arrives
    UNPERMUTED); None = p1 arrives externally permuted.

    Pack modes: ``gauss`` (n, PACK) depth-sorted with p2 pre-permuted
    (legacy), or ``gd``/``aux``/``ordf`` unsorted + depth order with p2
    unsorted (the zero-glue default — see _fwd_kernel)."""
    inpack = gauss is None
    n = gd.shape[1] if inpack else gauss.shape[0]
    rows = ROWS if rows is None else rows
    win_h, win_w = win_shape if win_shape is not None \
        else (p1.shape[0], p2.shape[1])
    n_prog = win_h // rows
    band_exit = _os.environ.get("SKELSPLAT_PALLAS_BANDEXIT", "") \
        not in ("", "0", "off")
    inker = pl_mat is not None
    lazy = _lazy_slot_read()

    pack_specs = _pack_specs(gauss, n)
    operands = (gauss,) if not inpack else (gd, aux, ordf)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, l1, slot_w, band_exit, inker,
                          inpack, lazy),
        grid=(n_prog,),
        in_specs=pack_specs + [
            pl.BlockSpec(p1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, p2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 if inpack else 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec(pl_mat.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] if inker else []),
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, win_w), jnp.float32),   # T (0 = early-out)
        ] + ([pltpu.SMEM((n, SCR_COLS), jnp.float32),  # sorted pack
              pltpu.VMEM((n, p2.shape[1]), jnp.float32)]  # sorted p2
             if inpack else [])
          + ([pltpu.VMEM((win_h, LANES), jnp.float32)] if inker else []),
        interpret=interpret,
    )(*operands, p1, p2, offs, *((pl_mat,) if inker else ()))
    return out[0, 0], out[0, 1]


VMEM_BUDGET_BYTES = int(13.5 * 2**20)  # of the ~16 MiB scoped limit


def bwd_vmem_bytes(n: int, rows: int, stack_w: int, win_w: int,
                   h_pad: int, w_pad: int, n_stacks: int,
                   inker_h: int = 0) -> int:
    """f32 VMEM bytes of the combined bwd kernel's resident state:
    ``n_stacks`` per-slot (n, rows, stack_w) stacks + 2 (rows, win_w)
    chains (T with the early-out encoded as 0, and the suffix) + the
    FULL resident profiles + the SMEM-ish pack. ``inker_h`` (the window
    height) adds the in-kernel-permute state — the (inker_h, LANES)
    permuted-window scratch plus the (LANES, LANES) PL input — the
    default permute mode, so the trainer sizes with it unconditionally.
    The trainer's tier_rows sizes row bands against the 2-stack form;
    ``_run_bwd`` upgrades to 4 stacks (ghat/E, skipping pass 2's
    recompute) only when this still fits, so the upgrade can never break
    a tier the 2-stack budget admitted. The sorted-p2 scratch of the
    zero-glue pack path (``_assemble_pack``) counts unconditionally
    (2·n·w_pad — conservative for SKELSPLAT_PALLAS_PACK=xla)."""
    return 4 * (n_stacks * n * rows * stack_w + 2 * rows * win_w
                + h_pad * LANES + 2 * n * w_pad + n * PACK
                + inker_h * LANES + (LANES * LANES if inker_h else 0))


def _run_bwd(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1, interpret,
             slot_w=None, rows=None, win_shape=None):
    """Combined forward+backward pass: returns (S, C, dg) — dg is
    (n, PACK) depth-sorted on the legacy pack path, (n, 6) RANK-ordered
    on the zero-glue path (the VJP wrapper unsorts it)."""
    inpack = gauss is None
    n = gd.shape[1] if inpack else gauss.shape[0]
    rows = ROWS if rows is None else rows
    win_h, win_w = win_shape if win_shape is not None \
        else (p1.shape[0], p2.shape[1])
    n_prog = win_h // rows
    stack_w = win_w if (slot_w is None or slot_w >= win_w) else slot_w
    inker = pl_mat is not None
    force = _os.environ.get("SKELSPLAT_PALLAS_GHAT", "")
    gstacks = (bwd_vmem_bytes(n, rows, stack_w, win_w, p1.shape[0],
                              p2.shape[1], 4,
                              win_h if inker else 0) <= VMEM_BUDGET_BYTES
               if force == "" else force not in ("0", "off"))
    stacks = [pltpu.VMEM((n, rows, stack_w), jnp.float32)] \
        * (4 if gstacks else 2)
    band_exit = _os.environ.get("SKELSPLAT_PALLAS_BANDEXIT", "") \
        not in ("", "0", "off")
    lazy = _lazy_slot_read()
    dg_w = n * (6 if inpack else PACK)
    pack_specs = _pack_specs(gauss, n)
    operands = (gauss,) if not inpack else (gd, aux, ordf)
    out, dg = pl.pallas_call(
        functools.partial(_bwd_kernel, n, l1, slot_w, gstacks, band_exit,
                          inker, inpack, lazy),
        grid=(n_prog,),
        in_specs=pack_specs + [
            pl.BlockSpec(p1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, p2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 if inpack else 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec(pl_mat.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] if inker else []),
        out_specs=(
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dg_w), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, dg_w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, win_w), jnp.float32),      # T (0 = early-out)
            stacks[0],                                   # live-α stack
            stacks[1],                                   # T stack
            pltpu.VMEM((rows, win_w), jnp.float32),      # suffix
        ] + ([stacks[2], stacks[3]] if gstacks else [])   # ghat, E
          + ([pltpu.SMEM((n, SCR_COLS), jnp.float32),    # sorted pack
              pltpu.VMEM((n, p2.shape[1]), jnp.float32)]  # sorted p2
             if inpack else [])
          + ([pltpu.VMEM((win_h, LANES), jnp.float32)] if inker else []),
        interpret=interpret,
    )(*operands, p1, p2, offs, *((pl_mat,) if inker else ()))
    return out[0, 0], out[0, 1], dg.reshape(n, 6 if inpack else PACK)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _pallas_S_C(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1, interpret,
                slot_w=None, rows=None, win_shape=None):
    return _run_fwd(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1,
                    interpret, slot_w, rows, win_shape)


def _pallas_fwd(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1, interpret,
                slot_w=None, rows=None, win_shape=None):
    # under value_and_grad the COMBINED kernel produces the loss and the
    # screen-space gradients in one launch — the forward-only kernel never
    # runs on the grad path (the adjoint is the cotangent scale below)
    S, C, dg = _run_bwd(gauss, gd, aux, ordf, p1, p2, offs, pl_mat, l1,
                        interpret, slot_w, rows, win_shape)
    return (S, C), (dg, aux, ordf, p1, p2, offs, pl_mat)


def _pallas_bwd(l1, interpret, slot_w, rows, win_shape, res, cot):
    dg, aux, ordf, p1, p2, offs, pl_mat = res
    gS, _ = cot
    zeros = lambda x: jax.tree.map(jnp.zeros_like, x)
    if ordf is None:
        # legacy pack path: dg is depth-sorted (n, PACK), matching gauss
        return (dg * gS, None, None, None, zeros(p1), zeros(p2),
                zeros(offs), zeros(pl_mat))
    # zero-glue path: dg is RANK-ordered (n, 6); unsort to joint order as
    # ONE one-hot matmul at HIGHEST — dgd[j] = Σ_r [order[r]==j]·dgs[r],
    # bitwise the gather (each output is 1.0·x plus exact zeros). An
    # argsort+take unsort was measured ~4 µs/macro SLOWER on chip (tiny
    # TPU gathers are exactly what the one-hot forms exist to avoid,
    # round-3 lesson re-confirmed round 5).
    n = dg.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.float32)
    Pn = (ordf[0][:, None] == iota_n[None, :]).astype(jnp.float32)
    dgd = jax.lax.dot_general(
        dg * gS, Pn, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)   # (6, n), no transpose
    return (None, dgd, zeros(aux), zeros(ordf), zeros(p1), zeros(p2),
            zeros(offs), zeros(pl_mat))


_pallas_S_C.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# jnp wrapper: preprocess + sort + profile precompute around the kernel
# ---------------------------------------------------------------------------

def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


def _nz_span(prof):
    """First/one-past-last nonzero index per row of ``prof`` (N, L) —
    (0, 0) for all-zero rows."""
    nz = prof > 0.0
    has = jnp.any(nz, axis=1)
    first = jnp.argmax(nz, axis=1)
    last = prof.shape[1] - jnp.argmax(nz[:, ::-1], axis=1)
    return (jnp.where(has, first, 0).astype(jnp.float32),
            jnp.where(has, last, 0).astype(jnp.float32))


def pallas_view_profiles(spec_v, W: int, H: int):
    """Per-scene-constant GT state for one view: lane-major row profiles
    p1' = A·p1 (H_pad, LANES), column profiles p2 (N, W_pad), the affine
    offset B so that gt = p1'·p2 + B, and the per-channel nonzero spans
    (N, 4) = [gy0, gy1, gx0, gx1] of the GT support (row-band culling and
    window-bounds inputs). Computed ONCE per scene (the spec is frozen at
    the initial covariance, train.py:91-92) and reused by every macro
    step."""
    n = spec_v.y0.shape[0]
    H_pad = -(-H // ROWS) * ROWS
    W_pad = -(-W // LANES) * LANES
    ys = jnp.arange(H_pad, dtype=jnp.int32)
    xs = jnp.arange(W_pad, dtype=jnp.int32)
    p1 = hm._profile(ys[None, :], spec_v.y0[:, None], spec_v.sigma1[:, None],
                     spec_v.r1[:, None], spec_v.sum1[:, None],
                     spec_v.height[:, None])            # (N, H_pad)
    p2 = hm._profile(xs[None, :], spec_v.x0[:, None], spec_v.sigma2[:, None],
                     spec_v.r2[:, None], spec_v.sum2[:, None],
                     spec_v.width[:, None])             # (N, W_pad)
    denom = spec_v.mx - spec_v.mn + hm.NORM_EPS
    A = spec_v.amp / denom
    B = -spec_v.mn / denom
    p1 = p1 * A[:, None]
    gy0, gy1 = _nz_span(p1)
    gx0, gx1 = _nz_span(p2)
    spans = jnp.stack([gy0, gy1, gx0, gx1], axis=1)     # (N, 4)
    p1_lane = _pad_to(p1.T, LANES, axis=1)              # (H_pad, LANES)
    return jax.lax.stop_gradient((p1_lane, p2, B, spans))


# losses the Pallas kernel implements (same set as ops/fused.FUSED_LOSSES):
# l2_gaussian uses the squared-error op, the l1 family the absolute error
PALLAS_LOSSES = ("l2_gaussian", "l1_gaussian", "l1_masked")


def pallas_view_bbox(params, cam, spec_v, W: int, H: int,
                     antialiasing: bool = False, profiles=None):
    """Union bbox of (splat rects ∪ GT supports) for one view: (5,) f32
    [lo_y, hi_y, lo_x, hi_x, slot_col_need]. Tier-independent — compute
    ONCE per (view, macro step) and snap to each cascade tier with
    ``window_bounds_from_bbox`` (pure arithmetic), instead of re-running
    the N-sized preprocess per tier. Non-differentiable (stop_gradient) —
    call OUTSIDE value_and_grad."""
    if profiles is None:
        profiles = pallas_view_profiles(spec_v, W, H)
    pp = rasterizer.preprocess_gaussians(
        params.xyz, params.covariance(), params.opacity, cam, W, H,
        antialiasing)
    spans = profiles[3]

    ry0 = pp.rect_min[:, 1].astype(jnp.float32) * geometry.BLOCK_Y
    ry1 = pp.rect_max[:, 1].astype(jnp.float32) * geometry.BLOCK_Y
    rx0 = pp.rect_min[:, 0].astype(jnp.float32) * geometry.BLOCK_X
    rx1 = pp.rect_max[:, 0].astype(jnp.float32) * geometry.BLOCK_X
    act_r = pp.valid & (ry1 > ry0) & (rx1 > rx0)
    act_g = spans[:, 1] > spans[:, 0]
    big = jnp.float32(1e9)
    lo_y = jnp.minimum(jnp.min(jnp.where(act_r, ry0, big)),
                       jnp.min(jnp.where(act_g, spans[:, 0], big)))
    hi_y = jnp.maximum(jnp.max(jnp.where(act_r, ry1, -big)),
                       jnp.max(jnp.where(act_g, spans[:, 1], -big)))
    lo_x = jnp.minimum(jnp.min(jnp.where(act_r, rx0, big)),
                       jnp.min(jnp.where(act_g, spans[:, 2], big)))
    hi_x = jnp.maximum(jnp.max(jnp.where(act_r, rx1, -big)),
                       jnp.max(jnp.where(act_g, spans[:, 3], -big)))
    # per-slot column-slice requirement (5th element): the widest
    # 128-aligned (render ∪ GT) column span over the active slots — a tier
    # with slot_w ≥ this runs every slot's vector ops on a (ROWS, slot_w)
    # slice (kernel slot slicing, _slot_cols)
    lo_s = jnp.minimum(jnp.where(act_r, rx0, big),
                       jnp.where(act_g, spans[:, 2], big))
    hi_s = jnp.maximum(jnp.where(act_r, rx1, -big),
                       jnp.where(act_g, spans[:, 3], -big))
    act = act_r | act_g
    need = jnp.where(act, hi_s - jnp.floor(lo_s / LANES) * LANES, 0.0)
    slot_need = jnp.max(need)
    return jax.lax.stop_gradient(
        jnp.stack([lo_y, hi_y, lo_x, hi_x, slot_need]))


def window_bounds_from_bbox(bbox, W: int, H: int, win_h: int, win_w: int,
                            rows: int | None = None):
    """Snap a ``pallas_view_bbox`` to a (win_h, win_w) window: returns
    (offs (2,) f32 [row, col], fits bool). Pure arithmetic — evaluate for
    every cascade tier from one bbox. ``rows`` is the tier's row-band
    height (the snap quantum; the dynamic slice itself allows any offset,
    so the clip to H_pad−win_h needs no extra alignment)."""
    rows = ROWS if rows is None else rows
    H_pad = -(-H // ROWS) * ROWS
    W_pad = -(-W // LANES) * LANES
    lo_y, hi_y, lo_x, hi_x = bbox[0], bbox[1], bbox[2], bbox[3]
    row_off = jnp.clip(jnp.floor(lo_y / rows) * rows, 0.0,
                       float(H_pad - win_h))
    col_off = jnp.clip(jnp.floor(lo_x / LANES) * LANES, 0.0,
                       float(W_pad - win_w))
    fits = ((lo_y >= row_off) & (hi_y <= row_off + win_h)
            & (lo_x >= col_off) & (hi_x <= col_off + win_w))
    offs = jnp.stack([row_off, col_off]).astype(jnp.float32)
    return offs, fits


def window_bounds_multi(bbox_flat, W: int, H: int, tiers):
    """``window_bounds_from_bbox`` vectorized over a static tier cascade:
    ``bbox_flat`` (M, 5) × ``tiers`` [(win_h, win_w, slot_w|None, rows)]
    → (offs (T, M, 2), fit (T,) all-fit-per-tier) in ONE op chain — the
    per-tier python loop cost ~15 µs/macro of tiny stacked ops on TPU.
    Same arithmetic per tier as the scalar form, including the sliced
    tiers' slot-span condition (bbox[4] ≤ slot_w)."""
    H_pad = -(-H // ROWS) * ROWS
    W_pad = -(-W // LANES) * LANES
    wh = np.asarray([t[0] for t in tiers], np.float32)[:, None]
    ww = np.asarray([t[1] for t in tiers], np.float32)[:, None]
    sw = np.asarray([np.inf if t[2] is None else t[2] for t in tiers],
                    np.float32)[:, None]
    rw = np.asarray([t[3] if len(t) > 3 and t[3] else ROWS for t in tiers],
                    np.float32)[:, None]
    lo_y, hi_y = bbox_flat[None, :, 0], bbox_flat[None, :, 1]
    lo_x, hi_x = bbox_flat[None, :, 2], bbox_flat[None, :, 3]
    row_off = jnp.clip(jnp.floor(lo_y / rw) * rw, 0.0, H_pad - wh)
    col_off = jnp.clip(jnp.floor(lo_x / LANES) * LANES, 0.0, W_pad - ww)
    fits = ((lo_y >= row_off) & (hi_y <= row_off + wh)
            & (lo_x >= col_off) & (hi_x <= col_off + ww)
            & (bbox_flat[None, :, 4] <= sw))
    offs = jnp.stack([row_off, col_off], axis=-1)
    return offs, jnp.all(fits, axis=1)


def pallas_window_bounds(params, cam, spec_v, W: int, H: int,
                         win_h: int, win_w: int,
                         antialiasing: bool = False, profiles=None):
    """Single-tier convenience wrapper: bbox + snap in one call (the
    cascade callers compute the bbox once and snap per tier instead)."""
    bbox = pallas_view_bbox(params, cam, spec_v, W, H, antialiasing,
                            profiles)
    return window_bounds_from_bbox(bbox, W, H, win_h, win_w)


def fused_view_loss_pallas(params, cam, spec_v, W: int, H: int,
                           antialiasing: bool = False,
                           interpret: bool | None = None,
                           profiles=None,
                           loss_function: str = "l2_gaussian",
                           window=None, win_shape=None, slot_w=None,
                           rows=None):
    """Masked heatmap view loss — Pallas-fused twin of fused.fused_view_loss
    for every loss in PALLAS_LOSSES (loss_utils.py:86-118).

    ``profiles``: optional precomputed ``pallas_view_profiles`` output;
    passing it keeps the per-step work to the N-sized preprocess + kernel.

    ``window``/``win_shape``: optional (2,) f32 window origin from
    ``pallas_window_bounds`` + static (win_h, win_w). The kernel then runs
    on the (win_h, win_w) crop only — exact whenever the window covers the
    union bbox (the caller conds on ``fits``); pixel/tile coordinates stay
    absolute, so values match the full kernel to reduction-order ULPs.

    ``slot_w``: optional static per-slot column-slice width (multiple of
    128, requires ``window``): every slot's vector work runs on its own
    (ROWS, slot_w) column window — exact whenever slot_w covers every
    slot's 128-aligned (render ∪ GT) column span (the caller conds on
    ``pallas_view_bbox``'s 5th element).
    """
    if loss_function not in PALLAS_LOSSES:
        raise ValueError(f"pallas kernel does not implement {loss_function!r}")
    if interpret is None:
        interpret = _interpret_default()
    n = params.n_joints
    if profiles is None:
        profiles = pallas_view_profiles(spec_v, W, H)
    p1_lane, p2, B, spans = profiles
    hi = jax.lax.Precision.HIGHEST
    # zero-glue pack (SKELSPLAT_PALLAS_PACK=kernel — MEASURED
    # NEUTRAL-TO-SLIGHTLY-SLOWER, kept env-gated; see PERF.md round 5):
    # ship the preprocess outputs UNSORTED as per-quantity SMEM refs +
    # the depth order; program 0 gathers them into a sorted scratch pack
    # (bitwise the HIGHEST one-hot sort matmuls it replaces). Kills the
    # (N,16) stack, BOTH Pn matmuls (gauss + p2) and the pack's autodiff
    # adjoint — but the removed glue is only ~0.25 µs/op and the
    # in-kernel assembly + the VJP's one-hot unsort cost it back
    # (interleaved A/B: 0.0176-0.0183 vs 0.0175-0.0177 legacy). The
    # env-gated Pallas preprocess kernel produces the legacy pack, so it
    # forces that path too.
    inpack = _os.environ.get("SKELSPLAT_PALLAS_PACK", "xla") == "kernel"
    gd = aux = ordf = None

    cov6 = params.covariance()
    pp = rasterizer.preprocess_gaussians(
        params.xyz, cov6, params.opacity, cam, W, H, antialiasing)

    order = jnp.argsort(jnp.where(pp.valid, pp.depth, jnp.inf))

    # channel-aligned slot data, built as ONE column stack (a chain of
    # .at[].set scatters costs ~10 us/macro of tiny scatter ops on TPU)
    opa = jnp.where(pp.valid, pp.opacity_eff, 0.0)
    rect = jax.lax.stop_gradient(jnp.concatenate(
        [pp.rect_min, pp.rect_max], axis=1).astype(jnp.float32))

    # per-slot 128-aligned column-slice starts (IDX_C0), in UNSORTED
    # joint order (every input is per-joint, so computing before the
    # depth sort is equivalent); only meaningful when slot slicing is
    # active
    if (window is not None and slot_w is not None
            and slot_w < win_shape[1]):
        big = jnp.float32(1e9)
        rx0 = rect[:, 0] * geometry.BLOCK_X
        rx1 = rect[:, 2] * geometry.BLOCK_X
        act_r = rx1 > rx0
        act_g = spans[:, 3] > spans[:, 2]
        lo = jnp.minimum(jnp.where(act_r, rx0, big),
                         jnp.where(act_g, spans[:, 2], big))
        c0 = jnp.clip(jnp.floor(lo / LANES) * LANES - window[1],
                      0.0, float(win_shape[1] - slot_w))
        c0 = jax.lax.stop_gradient(
            jnp.where(act_r | act_g, c0, 0.0))
    else:
        c0 = jnp.zeros((n,), jnp.float32)

    if inpack:
        # GT row support per slot (AUX_GY0/GY1) for the kernel's band
        # culling: gt > 0 requires p1 > 0 (B = −mn/denom ≤ 0), so the
        # nonzero-row span of the profile is a tight conservative
        # bound (pallas_view_profiles)
        gd = jnp.stack([pp.pix[:, 0], pp.pix[:, 1], pp.conic[:, 0],
                        pp.conic[:, 1], pp.conic[:, 2], opa])  # (6, n)
        aux = jax.lax.stop_gradient(jnp.concatenate(
            [rect, B[:, None], spans[:, 0:1], spans[:, 1:2],
             c0[:, None]], axis=1))                           # (n, 8)
        ordf = jax.lax.stop_gradient(
            order.astype(jnp.float32).reshape(1, n))
        gauss_s = None
    else:
        ones = jnp.ones((n,), jnp.float32)
        gauss = jnp.stack(
            [pp.pix[:, 0], pp.pix[:, 1],
             pp.conic[:, 0], pp.conic[:, 1], pp.conic[:, 2], opa,
             rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3],
             B, spec_v.width[0] * ones, spec_v.height[0] * ones,
             # GT row support per slot (see the inpack note above)
             spans[:, 0], spans[:, 1], c0], axis=1)

        # depth-order permutation as one-hot f32 matmuls at HIGHEST
        # precision: bitwise-identical to gathers (each output
        # row/lane is 1.0·x plus exact zeros) but ONE MXU op instead
        # of a gather + its scatter-add VJP — the gathers dominated
        # the per-macro XLA soup on TPU. HIGHEST (6-pass) is
        # mandatory: HIGH is a 2-term bf16 split (16 mantissa bits)
        # on this chip — measured 1.5e-5 rel error, see the rejection
        # note at the top of this file.
        iota_n = jnp.arange(n, dtype=order.dtype)
        Pn = (order[:, None] == iota_n[None, :]).astype(jnp.float32)
        gauss_s = jnp.matmul(Pn, gauss, precision=hi)
    # lane permute of p1: PL[k, i] = 1 iff k == order[i] (lanes ≥ n zero
    # out — the kernel reads lanes < n only)
    lanes = p1_lane.shape[1]
    iota_l = jnp.arange(lanes, dtype=order.dtype)
    PL = (iota_l[:, None] == order[None, :]).astype(jnp.float32)
    PL = jax.lax.stop_gradient(_pad_to(PL, lanes, axis=1))

    eff_rows = ROWS if rows is None else rows
    if window is not None:
        win_h, win_w = win_shape
        if win_h % eff_rows or win_w % LANES:
            # the grid is win_h // rows programs — a misaligned window
            # would silently drop its last partial band
            raise ValueError(f"win_shape {win_shape} must be multiples of "
                             f"(rows={eff_rows}, LANES={LANES})")
        if slot_w is not None and (slot_w % LANES or slot_w <= 0):
            raise ValueError(f"slot_w {slot_w} must be a positive multiple "
                             f"of LANES={LANES}")
        win_off = window
        if slot_w is not None and slot_w >= win_w:
            slot_w = None
        # per-slot column-slice starts (AUX_C0/IDX_C0) were packed before
        # the depth sort above; the covered-span proof is in the trainer's
        # fits test (bbox[4] <= slot_w). The kernel reads its own window
        # bands/columns from the FULL profiles (an XLA-side dynamic
        # slice per view lowered to an unrolled while loop under vmap,
        # ~10 µs/macro; a one-hot permute of the full profile produces
        # bitwise the same rows as permuting the crop).
        kern_shape = (win_h, win_w)
    else:
        win_off = jnp.zeros((2,), jnp.float32)
        slot_w = None
        kern_shape = (p1_lane.shape[0], p2.shape[1])
        if kern_shape[0] % eff_rows:
            raise ValueError(f"kernel height {kern_shape[0]} not a multiple "
                             f"of rows={eff_rows}")
    if inpack:
        # offs also carries the TRUE per-view image size (the clamp
        # bounds for in_img — the legacy pack reads them from its own
        # width/height columns instead, keeping that program unchanged)
        offs = jnp.concatenate(
            [win_off.reshape(2), spec_v.width[0:1], spec_v.height[0:1]]
        ).reshape(1, 4)
    else:
        offs = win_off.reshape(1, 2)

    # p1 depth permute runs IN-KERNEL by default: the kernel permutes its
    # own window rows from the unpermuted p1 + PL with one program-0 dot
    # into VMEM scratch (bitwise the external permute; see
    # _inkernel_permute). Measured on the headline H36M sweep: 0.0163 vs
    # 0.0168 s/frame — the window dot is ~half the FLOPs of permuting the
    # full H_pad profile and skips the permuted profile's HBM round-trip.
    # SKELSPLAT_PALLAS_PERMUTE=xla restores the external XLA permute op.
    if _os.environ.get("SKELSPLAT_PALLAS_PERMUTE", "kernel") == "kernel":
        p1_s, pl_mat = p1_lane, PL
    else:
        p1_s, pl_mat = jnp.matmul(p1_lane, PL, precision=hi), None
    # p2 ships UNSORTED on the zero-glue path — the kernel's
    # dynamic-sublane read through the order IS the permute
    p2_s = p2 if inpack else jnp.matmul(jax.lax.stop_gradient(Pn), p2,
                                        precision=hi)

    S, C = _pallas_S_C(gauss_s, gd, aux, ordf, p1_s, p2_s, offs, pl_mat,
                       loss_function != "l2_gaussian", interpret, slot_w,
                       rows, kern_shape)
    return S / jnp.maximum(C, 1.0)


def make_pallas_view_loss(model, settings, W: int, H: int,
                          antialiasing: bool = False,
                          interpret: bool | None = None):
    """Per-view total loss with the SceneTrainer signature
    (params, cam, spec_v, pose_2d_v)."""
    from skelsplat_tpu import losses as loss_registry

    cons_fn = loss_registry.consistency_losses[settings.consistency_loss]

    def view_loss(params, cam, spec_v, pose_2d_v, profiles=None,
                  window=None, win_shape=None, slot_w=None, rows=None):
        main = fused_view_loss_pallas(params, cam, spec_v, W, H,
                                      antialiasing, interpret,
                                      profiles=profiles,
                                      loss_function=settings.loss_function,
                                      window=window, win_shape=win_shape,
                                      slot_w=slot_w, rows=rows)
        cons = cons_fn(params.xyz, model.scene_type, reduction="mean")
        return main + cons * settings.lambda_consistency

    return view_loss
