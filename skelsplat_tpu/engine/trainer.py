"""Per-scene optimization engine — the TPU-native train loop.

The reference's inner loop (train.py:130-233) renders ONE view per iteration
round-robin and steps Adam every ``accumulation_steps`` (= nviews) iterations
with xyz grad = mean of the per-view grads and scale/rot/opacity grads taken
from the last rendered view only (train.py:175-179, 215-218). Because the
parameters are constant between optimizer steps, one reference "macro step"
is exactly: render ALL V views at the current parameters, combine gradients,
step. That is what this trainer jits: a ``lax.scan`` over iterations/accum
macro steps, each vmapping renderer+loss over the camera axis — the whole
500-iteration scene optimization is a single compiled program with no host
round-trips.

Gradient-fusion semantics are reproduced exactly: xyz steps on the mean
per-view gradient; log_scales/quats/opacity step on view V−1's gradient
alone (the reference overwrites .grad each iteration, so the last view wins).

Early stopping (``opt_early_stopping``) is exact for every (nviews,
accumulation_steps) combination: the per-iteration 8-loss window check of
general_utils.py:467-491 — including windows that straddle macro-step
boundaries — runs against a rolling history carry, and a mid-macro stop
steps with the reference's mixed gradients (fresh rows for the views
visited so far this macro, persistent stale ``accumulated_grads`` rows for
the rest; train.py:121,155,175-182). After a stop fires, parameters freeze
(the reference breaks out of the loop), so the final parameters equal the
stop-time parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from skelsplat_tpu import losses as loss_registry
from skelsplat_tpu.core.cameras import Camera
from skelsplat_tpu.core.gaussians import (EXTREMITY_JOINTS, GaussianParams,
                                          OPACITY_INIT_LOGIT, SkeletonModel)
from skelsplat_tpu.engine.optim import AdamGroups, OptConfig
from skelsplat_tpu.ops import heatmaps as hm
from skelsplat_tpu.ops import rasterizer
from skelsplat_tpu.ops.fused import fused_view_loss_available, make_fused_view_loss
from skelsplat_tpu.ops.pallas_raster import (make_pallas_view_loss,
                                             pallas_view_profiles,
                                             pallas_view_bbox,
                                             window_bounds_multi)

REPEAT_TOL = 1e-6  # OptEarlyStopping repeat_tolerance (general_utils.py:468)


def stop_offset(hist8, cur, k1, tol):
    """First inner-iteration offset m ∈ {1..A} at which OptEarlyStopping's
    8-loss window check (general_utils.py:474-491, window_size=4) fires
    during macro step k1 (1-based), for ANY accumulation length A.

    ``hist8`` carries the 8 most recent per-iteration losses from before
    this macro (+inf-padded at the front while the history is short); ``cur``
    is this macro's A per-view losses in visit order. After appending m of
    them, the reference compares the last 4 losses against the previous 4 —
    which is ``full[m+4:m+8]`` vs ``full[m:m+4]`` of the concatenated
    (8+A,) vector. The reference's len(history) ≥ 8 gate is implied by the
    +inf padding: any window touching a pad entry compares false
    (|inf−x| = inf, |inf−inf| = nan), so no explicit gate is needed — which
    also makes a CROSS-SCENE history carry exact (the reference constructs
    OptEarlyStopping once before the scene loop, train.py:64, so its window
    straddles scene boundaries; seed the next scene's hist8 with this
    scene's final one).

    Returns (stop_now, m_star, new_hist8) with m_star = A when no stop, so
    the gradient-composition indices reduce to the normal macro step;
    new_hist8 = the 8 losses ending at the stop offset (the reference
    breaks its loop there, so later same-macro losses are never recorded),
    which reduces to full[A:] when not stopping.
    """
    A = cur.shape[0]
    full = jnp.concatenate([hist8, cur])
    conds = []
    for m in range(1, A + 1):
        conds.append(
            jnp.all(jnp.abs(full[m:m + 4] - full[m + 4:m + 8]) < tol))
    conds = jnp.stack(conds)
    stop_now = jnp.any(conds)
    m_star = jnp.where(stop_now, jnp.argmax(conds) + 1, A)
    return stop_now, m_star, jax.lax.dynamic_slice(full, (m_star,), (8,))


def _telemetry_norms(pred, pose_3d_gt):
    """The per-macro telemetry norms (train.py:184-205): absolute and
    pelvis-relative per-joint errors. One function so the lean fast paths
    (which evaluate it ONCE on the final params) stay bitwise the full
    history's in-scan rows."""
    err = jnp.linalg.norm(pred - pose_3d_gt, axis=1)
    err_rel = jnp.linalg.norm(
        (pred - pred[0]) - (pose_3d_gt - pose_3d_gt[0]), axis=1)
    return err, err_rel


def compose_macro(adam, V_accum: int, nviews: int, use_stop: bool,
                  general: bool, carry, k, losses_v, grads_v, idxs,
                  pose_3d_gt, spatial_lr_scale, view_fusion: str = "mean",
                  lean: bool = False):
    """One macro step's gradient composition + Adam update + telemetry —
    the exact reference semantics (train.py:155-233), shared by the
    single-chip scan and the multi-chip mesh step (which feeds it
    all-gathered per-view losses/grads so every shard composes
    identically).

    ``carry`` = (params, opt_state, [hist8,] stopped[, acc_gx]);
    ``losses_v``/``grads_v``: the A visited views' losses/grads in visit
    order; ``idxs``: their global view indices. Returns (new_carry, rec)
    with rec = (losses_v, err, err_rel, stop_mark).

    ``view_fusion`` selects the xyz fusion: "mean" is the reference's
    plain mean (train.py:215-218); "confidence_weighted" applies the
    paper's per-view confidence weighting (ops/similarity.py, the
    similarity_utils.py:30-188 pipeline the reference ships but never
    wires in) — additive, off by default for parity.

    ``lean``: skip the per-macro err/err_rel telemetry norms and return
    rec = (losses_v, stop_mark) only — the lean fast paths thread the
    last row through the scan carry and compute the two norms ONCE from
    the final params (bitwise the full history's last row; params are
    frozen after a stop, so the post-scan norm sees the same xyz the
    last in-scan row would). Params/opt/stop math is untouched.
    """
    if view_fusion == "confidence_weighted":
        from skelsplat_tpu.ops.similarity import confidence_weighted_mean
        fuse_xyz = confidence_weighted_mean
    elif view_fusion == "mean":
        fuse_xyz = lambda g: jnp.mean(g, axis=0)
    else:
        raise ValueError(f"unknown view_fusion {view_fusion!r}")
    acc_gx = None
    if general or use_stop:
        carry, acc_gx = carry[:-1], carry[-1]
    if use_stop:
        params, opt_state, hist8, stopped = carry
    else:
        params, opt_state, stopped = carry

    if use_stop:
        # Exact OptEarlyStopping: the per-iteration loss history is the
        # concatenation of the per-macro loss vectors (params constant
        # within a macro step); a mid-macro stop at offset m steps with the
        # reference's mixed gradients: accumulated_grads rows of views
        # visited at offsets < m this macro are fresh, every other row
        # keeps its stale (or zero-init) value (train.py:121,155,175,215 —
        # accumulated_grads is never zeroed).
        stop_now, m_star, hist8_new = stop_offset(
            hist8, losses_v, k + 1, REPEAT_TOL)
        # after a stop the reference exits its loop: no further losses are
        # recorded, so the carried history freezes at its stop-time value
        # (what the next scene's OptEarlyStopping window sees, train.py:64)
        hist8 = jnp.where(stopped, hist8, hist8_new)
        if general:
            # the reference's sequential writes (duplicate visits: LAST
            # fresh one wins; offsets ≥ m_star keep the stale row) as one
            # gather: for each view row, the highest visit offset j < m_star
            # with idxs[j] == row (scales to large accumulation windows
            # where a python loop of .at[].set would bloat the HLO)
            nv = acc_gx.shape[0]
            visits = ((idxs[:, None] == jnp.arange(nv)[None, :])
                      & (jnp.arange(V_accum)[:, None] < m_star))
            j_last = jnp.max(jnp.where(
                visits, jnp.arange(V_accum)[:, None], -1), axis=0)
            acc_gx = jnp.where((j_last >= 0)[:, None, None],
                               grads_v.xyz[jnp.maximum(j_last, 0)], acc_gx)
        else:
            row_new = (jnp.arange(V_accum)[:, None, None] < m_star)
            acc_gx = jnp.where(row_new, grads_v.xyz, acc_gx)
        g_xyz = fuse_xyz(acc_gx)
        oidx = m_star - 1            # == V_accum-1 when not stopping
        grads = GaussianParams(
            xyz=g_xyz,
            log_scales=grads_v.log_scales[oidx],
            quats=grads_v.quats[oidx],
            opacity_logit=grads_v.opacity_logit[oidx],
        )
        iteration = k * V_accum + m_star
    else:
        # view fusion (train.py:175-179, 215-218): mean for xyz, last
        # rendered view for the other groups.
        stop_now = jnp.asarray(False)
        if general:
            acc_gx = acc_gx.at[idxs].set(grads_v.xyz)
            g_xyz = fuse_xyz(acc_gx)
        else:
            g_xyz = fuse_xyz(grads_v.xyz)
        last = V_accum - 1
        grads = GaussianParams(
            xyz=g_xyz,
            log_scales=grads_v.log_scales[last],
            quats=grads_v.quats[last],
            opacity_logit=grads_v.opacity_logit[last],
        )
        iteration = (k + 1) * V_accum

    new_params, new_opt = adam.step(
        params, grads, opt_state, iteration, spatial_lr_scale)

    apply = jnp.logical_not(stopped)
    sel = lambda a, b: jnp.where(apply, a, b)
    params2 = jax.tree.map(sel, new_params, params)
    opt2 = jax.tree.map(sel, new_opt, opt_state)
    stopped2 = stopped | (stop_now & apply)

    # telemetry (train.py:184-205)
    stop_mark = jnp.where(stop_now & apply, iteration, 0)
    if lean:
        rec = (losses_v, stop_mark)
    else:
        err, err_rel = _telemetry_norms(params2.xyz, pose_3d_gt)
        rec = (losses_v, err, err_rel, stop_mark)
    if use_stop:
        new_carry = (params2, opt2, hist8, stopped2)
    else:
        new_carry = (params2, opt2, stopped2)
    if general or use_stop:
        new_carry = new_carry + (acc_gx,)
    return new_carry, rec


def init_macro_carry(params, opt_state, nviews: int, use_stop: bool,
                     general: bool):
    """The scan carry matching compose_macro's layout (train.py:121:
    accumulated_grads starts at zero and persists across macro steps)."""
    acc0 = (jnp.zeros((nviews,) + params.xyz.shape, jnp.float32),) \
        if (general or use_stop) else ()
    if use_stop:
        hist8 = jnp.full((8,), jnp.inf, jnp.float32)
        return (params, opt_state, hist8, jnp.asarray(False)) + acc0
    return (params, opt_state, jnp.asarray(False)) + acc0


def extent_from_centers(centers) -> float:
    """The per-scene spatial LR scale from (V, 3) camera centers: 1.1 × max
    distance from their centroid (getNerfppNorm, dataset_readers.py:482-503
    → scene/__init__.py:85 → create_from_pcd spatial_lr_scale)."""
    centers = np.asarray(centers, dtype=np.float64)
    center = centers.mean(axis=0, keepdims=True)
    diagonal = np.linalg.norm(centers - center, axis=1).max()
    return float(diagonal * 1.1)


def cameras_extent(cameras: Camera) -> float:
    """``extent_from_centers`` of a camera batch's centers."""
    return extent_from_centers(cameras.cam_center)


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Mirror of the ``training`` config group (configs/*.yaml:18-27)."""

    loss_function: str = "l2_gaussian"
    lambda_loss_function: float = 0.05
    consistency_loss: str = "3D_length_consistency"
    lambda_consistency: float = 1e-5
    early_stopping: str = "no_stopping"   # opt_early_stopping | no_stopping
    accumulation_steps: int = 4
    dropout: bool = False
    std_dev_noise: float = 0.0
    quiet: bool = True
    # additive: xyz view-fusion mode — "mean" (reference, train.py:215-218)
    # or "confidence_weighted" (the similarity_utils.py pipeline made live)
    view_fusion: str = "mean"


def init_params_jnp(initial_pose, scene_type: str, scaling: float,
                    scaling_modifier: float) -> GaussianParams:
    """jit-traceable twin of gaussians.init_params (gaussian_model.py:149-200)."""
    pts = jnp.reshape(initial_pose, (-1, 3)).astype(jnp.float32)
    n = pts.shape[0]
    if scaling > 0.0:
        boost = np.ones((n, 3), dtype=np.float32)
        idx = [i for i in EXTREMITY_JOINTS.get(scene_type, []) if i < n]
        boost[idx, :] = scaling_modifier
        scales = jnp.asarray(scaling * boost)
    else:
        scales = pts
    quats = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacity = jnp.full((n, 1), OPACITY_INIT_LOGIT, jnp.float32)
    return GaussianParams(pts, scales, quats, opacity)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MacroHistory:
    """Per-macro-step telemetry (the reference's TB scalars,
    train.py:184-213 & 260-276)."""

    losses: Any        # (K, V) per-view total losses
    error: Any         # (K, N) per-joint absolute error ‖pred−gt‖
    error_rel: Any     # (K, N) root-aligned error
    stopped_at: Any    # scalar int32, iteration of early stop (0 = none)
    hist8: Any = None  # (8,) final rolling loss history (early stopping
    #                    only) — seed the NEXT scene's optimize_scene with it
    #                    to reproduce the reference's cross-scene
    #                    OptEarlyStopping window (train.py:64)


class SceneTrainer:
    """Compiles and runs the full per-scene optimization.

    One instance per static configuration (dataset/model/opt settings +
    image size); ``optimize_scene`` is jit-cached across the scene loop.
    """

    def __init__(self, model: SkeletonModel, opt: OptConfig,
                 settings: TrainSettings, width: int, height: int,
                 antialiasing: bool = False, renderer: str = "auto"):
        import skelsplat_tpu
        skelsplat_tpu.ensure_compile_cache()
        self.model = model
        self.opt = opt
        self.settings = settings
        self.W, self.H = int(width), int(height)
        self.antialiasing = antialiasing
        if settings.accumulation_steps <= 0:
            raise ValueError("accumulation_steps must be positive")
        self.n_macro = opt.iterations // settings.accumulation_steps
        self.adam = AdamGroups(opt)
        if renderer == "auto":
            from skelsplat_tpu.ops.pallas_raster import PALLAS_LOSSES
            if (settings.loss_function in PALLAS_LOSSES
                    and jax.default_backend() == "tpu"):
                renderer = "pallas"
            elif fused_view_loss_available(settings.loss_function,
                                           settings.consistency_loss):
                renderer = "fused"
            else:
                renderer = "dense"
        self.renderer = renderer
        self._pallas_win = self._window_config() if renderer == "pallas" \
            else None
        (self._prepare, self._segment, self._prepare_b, self._segment_b,
         self._run_full, self._run_full_lean,
         self._run_full_b, self._run_full_b_lean,
         self._run_chain, self._run_chain_lean) = self._build_run()

    def _window_config(self):
        """Static window-tier cascade for the windowed Pallas kernel:
        a list of (win_h, win_w, slot_w | None, rows), tightest first, or
        None.

        Each macro step picks the TIGHTEST tier whose window covers every
        view's union bbox of splat rects ∪ GT supports AND (for sliced
        tiers) whose slot_w covers every slot's 128-aligned column span
        (pallas_raster.pallas_view_bbox) via lax.switch, falling back
        through unsliced tiers to the full-frame kernel — exact always,
        and adaptive to how large the skeleton projects.

        ``rows`` is the tier's row-band height: windowed tiers use 64-row
        bands when the backward VJP stacks fit VMEM (halving the grid's
        per-program overhead; the full-frame fallback keeps the module
        default ROWS=32 — its stacks are window-width-sized and blow the
        16 MB scoped-VMEM limit at 64 rows on Panoptic frames, the
        round-3 ROWS=64 rejection in PERF.md).

        ``SKELSPLAT_PALLAS_WINDOW`` overrides: "off" disables,
        "H1xW1[xS1[xR1]],…" sets the cascade (the optional S enables
        per-slot column slicing inside the kernel, the optional R forces
        the tier's row-band height)."""
        import os

        from skelsplat_tpu.ops.pallas_raster import (LANES, ROWS,
                                                     VMEM_BUDGET_BYTES,
                                                     bwd_vmem_bytes)
        H_pad = -(-self.H // ROWS) * ROWS
        W_pad = -(-self.W // LANES) * LANES
        n = self.model.n_joints

        def tier_rows(wh, ww, sw):
            # largest 2^k·ROWS band that divides the window height and
            # keeps the backward kernel's VMEM under budget, sized
            # against the 2-stack (α/T) form — _run_bwd upgrades itself
            # to the 4-stack ghat/E variant only when that ALSO fits, so
            # this choice can never overflow (pallas_raster.bwd_vmem_bytes
            # is the single source of the formula). Budget 13.5 MiB of
            # the 16 MiB scoped limit — the Panoptic unsliced tier at
            # 64 rows (~12.8 MiB) compiles and runs on-chip.
            # 2×ROWS is the measured sweet spot (8 < 16 < 32 < 64 in
            # PERF.md's ladder; beyond that coarser band culling makes
            # sparse splats pay for more dead rows than the saved
            # per-program overhead) — the env override can force more.
            stack_w = sw or ww
            for r in (2 * ROWS, ROWS):
                # inker_h=wh sizes for the default in-kernel p1 permute
                # (conservative when SKELSPLAT_PALLAS_PERMUTE=xla)
                if wh % r == 0 and bwd_vmem_bytes(
                        n, r, stack_w, ww, H_pad, W_pad,
                        2, wh) <= VMEM_BUDGET_BYTES:
                    return r
            return ROWS

        spec = os.environ.get("SKELSPLAT_PALLAS_WINDOW", "auto")
        if spec == "off":
            return None
        if spec == "auto":
            # (win_h, win_w, slot_w) tiers, tightest first — slot_w is the
            # per-slot column-slice width (kernel slot slicing; None =
            # full-width slots). Sized from measured union bboxes / slot
            # spans of the three dataset scales: H36M bodies ≤ ~384×640
            # with slot spans ≤ ~200, OP ≤ ~512×640, Panoptic ≤ ~768×1024
            # with slot spans ≤ ~280.
            # Keep the cascade SHALLOW and SCALE-AWARE: each extra switch
            # branch costs ~10 µs/macro of conditional-dispatch overhead
            # on EVERY macro step, so a tier earns its slot only when this
            # frame scale's bodies actually outgrow the tiers below it
            # (measured live, round 3: H36M 1-tier 0.0223 vs 4-tier
            # 0.0265 s/frame; OP 2-tier 0.0231 vs 1-tier 0.0299 — OP
            # bodies DO outgrow tier 0; Panoptic needs the full cascade,
            # 1-tier 0.113 vs 4-tier 0.0343). The full-frame fallback
            # keeps every choice exact; the env override covers other
            # body-size distributions. Heights are 256-multiples so the
            # 64/128-row bands divide them.
            # Tier-0 width is 768 (not the ~640 the bodies need): the
            # window column origin snaps DOWN to a 128-lane boundary, so
            # a w-wide bbox can need up to w+127 columns — at 640 the
            # straddling frames fell through (to the full frame on the
            # 1-tier cascade: measured 0.048 vs 0.0174 s/frame batch-8;
            # the batched path is worst hit because ONE straddler drags
            # the whole batch). The extra 128 columns only widen the thin
            # (rows, win_w) chain ops — per-slot work stays slot_w-wide.
            # Extremity scaling widens splats: the production OP and
            # h36m-occ configs ship scaling_modifier=1.25, which grows
            # the per-slot column spans past the modifier-1.0 histograms
            # the round-3/4 cascades were sized from (measured round 5,
            # tests/test_cascade_fit.py): OP spans need ≤384 (256 caught
            # only 22/32 — ten scenes fell to the ~5× full-frame
            # fallback on config-faithful runs), H36M-class needs 256
            # except ONE 259-px straddler in 32.
            mod = self.model.scaling_modifier
            if H_pad <= 1024 and W_pad <= 1024:
                # H36M class: bodies fit tier 0; mid tiers are ≥75% of
                # the frame here and pure switch-depth overhead. At
                # modifier 1.25 (h36m-occ) slot 256 still catches 31/32
                # — widening to 384 costs +50% per-body vector work on
                # EVERY scene vs one scene's ~5× fallback (≈ +12% mean),
                # so 256 stays.
                sizes = [(512, 768, 256, None)]
            elif H_pad * W_pad <= 1280 * 768:
                # Occlusion-Person class (wide ~720p frames): ONE tier
                # sized from the init-bbox histogram (bodies ≤ ~587×731,
                # spans ≤ 224 at modifier 1.0, + the ≤63/127 px
                # band/lane straddle → 704×896 catches 32/32; at the
                # config's modifier 1.25 the window dims still catch
                # 32/32 but spans need slot 384). The old
                # (512,768)+(736,1024) pair sent 9/32 scenes to the tall
                # tier, whose 736 height forces 32-row bands (not
                # 64-divisible) — 23 bands per view; the single 64-band
                # tier measured 0.0194 vs 0.0200 s/frame.
                sizes = [(704, 896, 384 if mod > 1.0 else 256, None)]
            else:
                # Panoptic class and larger. NO 512-row tier: the window
                # must cover the GT supports too, which are body-sized
                # and FIXED per scene — Panoptic bodies project ≥~700
                # rows, so a small tier never fits and is pure switch
                # overhead (measured init histogram over 32 synthetic
                # scenes: 0 fit 512, 22 fit 832×1024, 9 need the tall
                # tier, 1 straddled past 960 rows to the full frame at
                # ~5× cost). Tier heights: 832 absorbs the ≤63-row band
                # snap over ~768-row bodies; the tall tier is FULL height
                # (fits by height always). No unsliced safety tier:
                # 0/32 scenes had slot spans >384 and each extra switch
                # branch costs ~7 µs on EVERY macro (2-tier 0.0302 vs
                # 3-tier 0.0328 s/frame measured) — span overflow takes
                # the exact full-frame fallback instead.
                sizes = [(832, 1024, 384, None), (H_pad, 1152, 384, None)]
        else:
            sizes = []
            for item in spec.split(","):
                parts = [int(x) for x in item.lower().split("x")]
                if len(parts) not in (2, 3, 4) \
                        or any(x <= 0 for x in parts[:2]):
                    raise ValueError(
                        f"SKELSPLAT_PALLAS_WINDOW entry {item!r}: expected "
                        "HxW, HxWxSLOT or HxWxSLOTxROWS with positive sizes")
                sw = parts[2] if len(parts) >= 3 and parts[2] > 0 else None
                rw = parts[3] if len(parts) == 4 and parts[3] > 0 else None
                sizes.append((parts[0], parts[1], sw, rw))
        wins = []
        for wh, ww, sw, rw in sizes:
            wh = min(-(-wh // ROWS) * ROWS, H_pad)
            ww = min(-(-ww // LANES) * LANES, W_pad)
            if sw is not None:
                sw = min(-(-sw // LANES) * LANES, ww)
                if sw >= ww:
                    sw = None
            rw = rw or tier_rows(wh, ww, sw)
            if wh % rw:
                rw = ROWS
            if (wh, ww) == (H_pad, W_pad) and sw is None and rw == ROWS:
                continue
            if (wh, ww, sw, rw) not in wins:
                wins.append((wh, ww, sw, rw))
        wins.sort(key=lambda s: (s[0] * s[1], s[2] or s[1]))
        return wins or None

    # ------------------------------------------------------------------
    def _view_loss_dense(self, params, cam, gt_heatmaps_v, pose_2d_v):
        """Loss of one view: render → clamp → registry loss + consistency
        (train.py:140-152)."""
        out = rasterizer.render(
            params, cam, self.W, self.H,
            antialiasing=self.antialiasing)
        # restrict to the view's true image domain (static W/H is the max
        # over views; H36M mixes 1000/1002-wide cameras in one rig)
        ys = jnp.arange(self.H, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(self.W, dtype=jnp.float32)[None, None, :]
        inside = (ys < cam.height) & (xs < cam.width)
        render = jnp.where(inside, out["render"], 0.0)
        loss_fn = loss_registry.losses[self.settings.loss_function]
        main, _ = loss_fn(render, gt_heatmaps_v, pose_2d_v[:, :2],
                          self.settings.lambda_loss_function,
                          reduction="mean",
                          domain=(cam.width, cam.height))
        cons_fn = loss_registry.consistency_losses[
            self.settings.consistency_loss]
        cons = cons_fn(params.xyz, self.model.scene_type, reduction="mean")
        return main + cons * self.settings.lambda_consistency

    # ------------------------------------------------------------------
    def _build_run(self):
        V_accum = self.settings.accumulation_steps
        model = self.model
        use_stop = self.settings.early_stopping == "opt_early_stopping"

        def prepare(initial_pose, poses_2d, cameras: Camera, drop_mask):
            """Per-scene setup: params init + GT-heatmap state from the
            INITIAL covariance, once per scene (train.py:87-92)."""
            params = init_params_jnp(initial_pose, model.scene_type,
                                     model.scaling, model.scaling_modifier)
            cov6_init = params.covariance()
            spec = hm.heatmap_spec(params.xyz, cov6_init, poses_2d,
                                   cameras, self.W, self.H,
                                   drop_mask=drop_mask)
            if self.renderer == "dense":
                view_aux = hm.eval_heatmaps(spec, self.W, self.H)
            elif self.renderer == "pallas":
                # per-scene-constant GT profiles, hoisted out of the scan
                profs = jax.vmap(
                    lambda sv: pallas_view_profiles(sv, self.W, self.H))(spec)
                view_aux = (spec, profs)
            else:
                view_aux = spec
            opt_state = self.adam.init(params)
            nviews = poses_2d.shape[0]
            general = V_accum != nviews
            carry = init_macro_carry(params, opt_state, nviews, use_stop,
                                     general)
            return carry, view_aux

        def make_segment(windows, batched=False, lean=False):
            """``windows``: cascade of (win_h, win_w) shapes, tightest
            first — each macro step switches to the tightest window that
            covers every view's union bbox, else the full-frame kernel.
            None disables windowing.

            ``batched``: leading scene axis on carry/inputs. The window
            switch is hoisted ABOVE the scene/view vmaps in both modes (a
            vmapped cond executes every branch), so the batched path conds
            on all-scenes-all-views-fit per macro step.

            ``lean``: the scan stacks NO per-macro telemetry (the
            err/err_rel norms and the dynamic-update-slice rows were ~2
            µs of every macro step on the device profile); the last
            losses row, last stop mark and the running stop-iteration
            max ride the carry instead, and the caller reconstructs the
            one-row recs (bitwise the full history's last row — see
            compose_macro). Returns (carry, (losses_last, mark_last,
            stop_max)) instead of (carry, recs)."""

            def segment(carry, view_aux, poses_2d, cameras, pose_3d_gt,
                        spatial_lr_scale, k0, n_macro):
                """Run macro steps k0 .. k0+n_macro−1 (n_macro static)."""
                view_ax = 1 if batched else 0
                nviews = poses_2d.shape[view_ax]
                win_shapes = ()
                if self.renderer == "dense":
                    view_loss = lambda p, cam, g, p2: self._view_loss_dense(
                        p, cam, g, p2)
                elif self.renderer == "pallas":
                    pal = make_pallas_view_loss(
                        self.model, self.settings, self.W, self.H,
                        self.antialiasing)
                    view_loss = lambda p, cam, aux, p2: pal(
                        p, cam, aux[0], p2, profiles=aux[1])
                    win_shapes = tuple(windows or ())
                else:
                    fused = make_fused_view_loss(
                        self.model, self.settings, self.W, self.H,
                        self.antialiasing)
                    view_loss = lambda p, cam, s, p2: fused(p, cam, s, p2)

                general = V_accum != nviews

                def vmap_views(f, extra_axes=()):
                    """vmap over views, plus scenes when batched; the
                    params argument maps over scenes only."""
                    g = jax.vmap(f, in_axes=(None, 0, 0, 0) + extra_axes)
                    if batched:
                        g = jax.vmap(g, in_axes=(0, 0, 0, 0)
                                     + tuple(0 for _ in extra_axes))
                    return g

                def per_view_grads(p, idxs=None):
                    cams_k, aux_k, p2_k = cameras, view_aux, poses_2d
                    if idxs is not None:
                        take = lambda x: jnp.take(x, idxs, axis=view_ax)
                        cams_k = jax.tree.map(take, cameras)
                        aux_k = jax.tree.map(take, view_aux)
                        p2_k = take(poses_2d)

                    def full_call(_):
                        f = jax.value_and_grad(view_loss)
                        return vmap_views(f)(p, cams_k, aux_k, p2_k)

                    if not win_shapes:
                        return full_call(None)

                    # ONE bbox per (view, macro); per-tier snap is pure
                    # arithmetic (re-running the preprocess per tier made
                    # cascade depth cost real time)
                    bbox = vmap_views(
                        lambda p_, cam, aux, p2: pallas_view_bbox(
                            p_, cam, aux[0], self.W, self.H,
                            self.antialiasing, profiles=aux[1]))(
                        p, cams_k, aux_k, p2_k)
                    offs_all, fit_all = window_bounds_multi(
                        bbox.reshape(-1, bbox.shape[-1]), self.W, self.H,
                        win_shapes)
                    offs_t = [offs_all[t].reshape(bbox.shape[:-1] + (2,))
                              for t in range(len(win_shapes))]

                    def win_call(t):
                        def call(_):
                            f = jax.value_and_grad(
                                lambda p_, cam, aux, p2, off: pal(
                                    p_, cam, aux[0], p2, profiles=aux[1],
                                    window=off,
                                    win_shape=win_shapes[t][:2],
                                    slot_w=win_shapes[t][2],
                                    rows=win_shapes[t][3]))
                            return vmap_views(f, extra_axes=(0,))(
                                p, cams_k, aux_k, p2_k, offs_t[t])
                        return call

                    # first tier whose window covers all views (and all
                    # scenes when batched); the appended True sentinel
                    # routes "none fit" to the full-frame kernel
                    branch = jnp.argmax(jnp.concatenate(
                        [fit_all, jnp.ones((1,), bool)]))
                    return jax.lax.switch(
                        branch,
                        [win_call(t) for t in range(len(win_shapes))]
                        + [full_call], None)

                def macro_step(carry, k):
                    params = carry[0]
                    if general:
                        # accumulation window ≠ view count: the reference's
                        # round-robin visits views (k·A+j) mod V during
                        # macro k and steps with the PERSISTENT
                        # accumulated_grads rows — unvisited views
                        # contribute their stale (or zero-init) gradients
                        # (train.py:121,136,175,215).
                        idxs = (k * V_accum + jnp.arange(
                            V_accum, dtype=jnp.int32)) % nviews
                        losses_v, grads_v = per_view_grads(params, idxs)
                    else:
                        idxs = jnp.arange(V_accum, dtype=jnp.int32)
                        losses_v, grads_v = per_view_grads(params)
                    cm = lambda c, lv, gv, gt, ext: compose_macro(
                        self.adam, V_accum, nviews, use_stop, general,
                        c, k, lv, gv, idxs, gt, ext,
                        view_fusion=self.settings.view_fusion, lean=lean)
                    if batched:
                        return jax.vmap(cm)(carry, losses_v, grads_v,
                                            pose_3d_gt, spatial_lr_scale)
                    return cm(carry, losses_v, grads_v, pose_3d_gt,
                              spatial_lr_scale)

                if lean:
                    # thread the last row through the carry: no ys, no
                    # per-macro dynamic-update-slice stacking
                    def scan_body(c3, k):
                        carry, _ll, _lm, smax = c3
                        carry, rec = macro_step(carry, k)
                        return (carry, rec[0], rec[1],
                                jnp.maximum(smax, rec[1])), ()

                    lead = (poses_2d.shape[0],) if batched else ()
                    ll0 = jnp.zeros(lead + (V_accum,), jnp.float32)
                    lm0 = jnp.zeros(lead, jnp.int32)
                    c3, _ = jax.lax.scan(
                        scan_body, (carry, ll0, lm0, lm0),
                        k0 + jnp.arange(n_macro))
                    carry, losses_last, mark_last, stop_max = c3
                    return carry, (losses_last, mark_last, stop_max)

                carry, recs = jax.lax.scan(
                    macro_step, carry, k0 + jnp.arange(n_macro))
                if batched:
                    # (K, B, ...) → the (B, K, ...) batch convention
                    recs = jax.tree.map(
                        lambda x: jnp.swapaxes(x, 0, 1), recs)
                return carry, recs

            return segment

        segment = make_segment(self._pallas_win)
        segment_b = make_segment(self._pallas_win, batched=True)
        segment_lean = make_segment(self._pallas_win, lean=True)
        segment_b_lean = make_segment(self._pallas_win, batched=True,
                                      lean=True)
        prepare_b = jax.vmap(prepare)

        def make_run_full(lean: bool):
            """prepare + the whole scan in ONE program — the no-mid-
            checkpoint fast path. Through a remote-device tunnel each
            program dispatch costs an RPC round-trip (~3 ms); fusing the
            two halves removes one boundary per scene (~8% of the
            steady-state sweep). ``hist8`` seeds the cross-scene stopper
            window (pass the +inf default when there is no carry — it
            equals prepare's own init). ``lean`` reduces telemetry to its
            last row, computed WITHOUT per-macro stacking (the lean
            segment threads it through the carry and the err/err_rel
            norms run once on the final params — bitwise the full
            history's last row, see make_segment/compose_macro)."""
            def run_full(initial_pose, poses_2d, cameras, drop_mask,
                         pose_3d_gt, extent, hist8):
                carry, view_aux = prepare(initial_pose, poses_2d, cameras,
                                          drop_mask)
                if use_stop:
                    carry = (carry[0], carry[1], hist8) + carry[3:]
                seg = segment_lean if lean else segment
                carry, recs = seg(carry, view_aux, poses_2d, cameras,
                                  pose_3d_gt, extent,
                                  jnp.asarray(0, jnp.int32),
                                  self.n_macro)
                if lean:
                    losses_last, mark_last, stop_max = recs
                    err, err_rel = _telemetry_norms(carry[0].xyz,
                                                    pose_3d_gt)
                    recs = (losses_last[None], err[None], err_rel[None],
                            mark_last[None])
                    return carry, recs, stop_max
                # reduce stopped_at INSIDE the program: a host-side
                # jnp.max after the dispatch is an extra eager program
                # (= one more RPC round-trip per scene through remote
                # tunnels)
                stop_max = jnp.max(recs[3])
                return carry, recs, stop_max

            return run_full

        run_full = make_run_full(False)

        def make_run_full_b(lean: bool):
            """Batched twin of run_full — ONE dispatch for the whole
            batch, and the same prepare+scan program structure as the
            per-scene fast path (keeping the two paths' XLA fusion
            decisions, and therefore their results, aligned). ``lean``
            reduces telemetry to its last row on-device, exactly like
            the chain's lean mode (the full (B, K, ·) history dominates
            the batched result fetch through remote tunnels)."""
            def run_full_b(initial_b, poses_2d_b, cams_b, drop_b, gt_b,
                           extent_b, hist8_b):
                carry, view_aux = prepare_b(initial_b, poses_2d_b, cams_b,
                                            drop_b)
                if use_stop:
                    carry = (carry[0], carry[1], hist8_b) + carry[3:]
                seg = segment_b_lean if lean else segment_b
                carry, recs = seg(carry, view_aux, poses_2d_b,
                                  cams_b, gt_b, extent_b,
                                  jnp.asarray(0, jnp.int32),
                                  self.n_macro)
                if lean:
                    losses_last, mark_last, stop_b = recs
                    err, err_rel = jax.vmap(_telemetry_norms)(
                        carry[0].xyz, gt_b)
                    recs = (losses_last[:, None], err[:, None],
                            err_rel[:, None], mark_last[:, None])
                    return carry, recs, stop_b
                stop_b = jnp.max(recs[3], axis=1)
                return carry, recs, stop_b

            return run_full_b

        def make_run_chain(lean: bool):
            """G scenes SEQUENTIALLY in ONE program: a lax.scan of
            run_full over the leading scene axis, threading the
            cross-scene OptEarlyStopping window (hist8, train.py:64)
            between scenes exactly like the per-scene dispatch loop —
            unlike the vmapped run_full_b, which starts a fresh window
            per scene. Device time is the same serial sum; what a chain
            saves is the per-scene program-dispatch RPC (~3 ms through
            remote tunnels), and it keeps PER-SCENE window-tier
            selection (the batched path's tier switch needs all scenes
            to fit one tier). Returns stacked (params, recs, stopped_at)
            plus the final hist8 for the next group's seed.

            ``lean``: reduce the per-macro telemetry to its LAST row
            on-device (K=1), via the lean run_full (no per-macro
            err/err_rel or stacking — the row is threaded through the
            scan carry). The driver reads only that row when TB logging
            is off, and the full (K, ·) history dominates the result
            fetch through remote tunnels (~19 KB/scene vs ~0.3: the
            fetch is bandwidth-, not just latency-, bound). Params,
            stopped_at and hist8 are untouched — the last telemetry row
            is bitwise the full variant's."""
            rf = make_run_full(lean)

            def body(h8, xs):
                init_s, p2d_s, cams_s, drop_s, gt_s, ext_s = xs
                carry, recs, stop_max = rf(init_s, p2d_s, cams_s,
                                           drop_s, gt_s, ext_s, h8)
                h8_next = carry[2] if use_stop else h8
                return h8_next, (carry[0], recs, stop_max)

            def run_chain(initial_g, poses_2d_g, cams_g, drop_g, gt_g,
                          extent_g, hist8):
                h8, (params_g, recs_g, stop_g) = jax.lax.scan(
                    body, hist8,
                    (initial_g, poses_2d_g, cams_g, drop_g, gt_g, extent_g))
                return params_g, recs_g, stop_g, h8

            return run_chain

        return (jax.jit(prepare), jax.jit(segment, static_argnums=(7,)),
                jax.jit(prepare_b),
                jax.jit(segment_b, static_argnums=(7,)),
                jax.jit(run_full), jax.jit(make_run_full(True)),
                jax.jit(make_run_full_b(False)),
                jax.jit(make_run_full_b(True)),
                jax.jit(make_run_chain(False)),
                jax.jit(make_run_chain(True)))

    # ------------------------------------------------------------------
    def host_inputs(self, initial_pose, poses_2d, cameras: Camera,
                    pose_3d_gt=None, drop_key=None, drop_mask=None):
        """Host-side input normalization for one scene — everything
        ``optimize_scene`` needs BEFORE the device transfer: dtype
        coercions, noise injection (training.std_dev_noise, train.py:80-84,
        per-scene seed-0 numpy RNG), the dropout mask and the camera
        extent (computed on host — fetching a freshly device-put array
        back costs a full device round-trip through an RPC tunnel).

        Returns the (initial_pose, poses_2d, cameras, pose_3d_gt,
        drop_mask, extent) host tree. Callers sweeping many scenes pass a
        LIST of these through one ``put_trees`` call (one packed H2D RPC
        for the whole group) and hand each element back via
        ``optimize_scene(..., inputs=...)`` — per-scene transfers were
        ~4 ms/scene of exposed host time through the tunnel."""
        initial_pose = np.asarray(initial_pose, dtype=np.float32)
        if self.settings.std_dev_noise > 0.0:
            rng = np.random.default_rng(seed=0)  # reproducible (train.py:82)
            initial_pose = initial_pose + rng.normal(
                0.0, self.settings.std_dev_noise, initial_pose.shape)
            initial_pose = initial_pose.astype(np.float32)
        if pose_3d_gt is None:
            pose_3d_gt = np.zeros_like(initial_pose)
        poses_2d = np.ascontiguousarray(
            np.asarray(poses_2d)[..., :2], dtype=np.float32)
        nviews, n = poses_2d.shape[0], poses_2d.shape[1]
        if self.settings.dropout and drop_mask is not None:
            # host-drawn mask (dropout_masks_torch — bitwise reference draw)
            drop_mask = np.asarray(drop_mask, dtype=bool)
        elif self.settings.dropout and drop_key is not None:
            drop_mask = hm.dropout_masks(drop_key, nviews, n)  # on device
        else:
            drop_mask = np.zeros((nviews, n), dtype=bool)
        extent = np.asarray(cameras_extent(cameras), np.float32)
        cameras = jax.tree.map(
            lambda x: x if isinstance(x, jax.Array) else np.asarray(x),
            cameras)   # device-resident camera leaves stay put
        pose_3d_gt = np.asarray(pose_3d_gt, dtype=np.float32)
        return (initial_pose, poses_2d, cameras, pose_3d_gt, drop_mask,
                extent)

    def _hist8_default(self):
        """The +inf stopper-window init, cached per trainer (an eager
        jnp.full is a device dispatch per call through remote tunnels)."""
        hist8 = getattr(self, "_hist8_inf", None)
        if hist8 is None:
            hist8 = jnp.full((8,), jnp.inf, jnp.float32)
            self._hist8_inf = hist8
        return hist8

    def optimize_scene(self, initial_pose, poses_2d, cameras: Camera = None,
                       pose_3d_gt=None, drop_key=None, drop_mask=None,
                       checkpoint_iterations=(), checkpoint_fn=None,
                       hist8_init=None, inputs=None, lean=False):
        """Run the full optimization for one scene.

        initial_pose (N,3); poses_2d (V,N,2+); cameras batched over V;
        pose_3d_gt (N,3) for telemetry (zeros if absent). Noise injection
        (training.std_dev_noise, train.py:80-84) happens host-side in
        ``host_inputs``, with the reference's per-scene seed-0 numpy RNG.

        ``inputs``: optional pre-transferred ``host_inputs`` tuple (see
        there); when given, the positional data arguments are ignored and
        no per-scene H2D transfer happens — the sweep drivers group many
        scenes' inputs into one packed transfer.

        ``checkpoint_iterations``: inner-iteration numbers (rounded down to
        macro boundaries) at which ``checkpoint_fn(iteration, params)`` is
        invoked with concrete parameters — the debug.save_iterations hook
        (train.py:227-229). The scan is split into jit-cached segments at
        those boundaries, so the default [iterations] case stays one fused
        program.

        ``lean=True`` keeps only the LAST telemetry row (K=1, bitwise the
        full history's final row — the chain/batch variants' knob); it
        applies to the no-mid-checkpoint fast path only (checkpointed runs
        are debug runs that keep the full history).
        """
        from skelsplat_tpu.utils import put_trees

        if inputs is None:
            # everything to the device in ONE packed transfer (leaf-by-leaf
            # device_put costs an RPC dispatch per leaf through remote
            # tunnels)
            inputs = put_trees(self.host_inputs(
                initial_pose, poses_2d, cameras, pose_3d_gt,
                drop_key=drop_key, drop_mask=drop_mask))
        (initial_pose, poses_2d, cameras, pose_3d_gt, drop_mask,
         extent) = inputs

        use_stop = self.settings.early_stopping == "opt_early_stopping"
        accum = self.settings.accumulation_steps
        rounded = sorted({min(max(it // accum, 0), self.n_macro)
                          for it in checkpoint_iterations})
        rounded = [b for b in rounded if b > 0]
        bounds = list(rounded)
        if not bounds or bounds[-1] != self.n_macro:
            bounds.append(self.n_macro)

        if bounds == [self.n_macro]:
            # no mid-run checkpoints: prepare + scan in ONE dispatch (each
            # program boundary costs an RPC round-trip through remote
            # tunnels). The hist8 arg is prepare's own +inf init when no
            # cross-scene window is carried, so results are identical.
            # (+inf default cached per trainer: an eager jnp.full is a
            # device dispatch per scene)
            if use_stop and hist8_init is not None:
                hist8 = jnp.asarray(hist8_init, jnp.float32)
            else:
                hist8 = self._hist8_default()
            run = self._run_full_lean if lean else self._run_full
            carry, recs, stop_max = run(
                initial_pose, poses_2d, cameras, drop_mask, pose_3d_gt,
                extent, hist8)
            if checkpoint_fn is not None and rounded:
                checkpoint_fn(self.n_macro * accum, carry[0])
            losses_k, err_k, err_rel_k, _ = recs
            return carry[0], MacroHistory(
                losses=losses_k, error=err_k, error_rel=err_rel_k,
                stopped_at=stop_max,
                hist8=carry[2] if use_stop else None)
        else:
            carry, view_aux = self._prepare(initial_pose, poses_2d,
                                            cameras, drop_mask)
            if use_stop and hist8_init is not None:
                # cross-scene OptEarlyStopping window: the reference
                # constructs the stopper once before the scene loop
                # (train.py:64), so its 8-loss history straddles scene
                # boundaries — seed it with the previous scene's final
                # history (MacroHistory.hist8)
                carry = (carry[0], carry[1],
                         jnp.asarray(hist8_init, jnp.float32)) + carry[3:]

            all_recs = []
            k0 = 0
            for b in bounds:
                n_seg = b - k0
                if n_seg > 0:
                    carry, recs = self._segment(
                        carry, view_aux, poses_2d, cameras, pose_3d_gt,
                        extent, jnp.asarray(k0, jnp.int32), n_seg)
                    all_recs.append(recs)
                    k0 = b
                if checkpoint_fn is not None and b in rounded:
                    checkpoint_fn(b * accum, carry[0])

        params = carry[0]
        losses_k, err_k, err_rel_k, stop_marks = (
            jnp.concatenate([r[i] for r in all_recs], axis=0)
            for i in range(4))
        history = MacroHistory(
            losses=losses_k, error=err_k, error_rel=err_rel_k,
            stopped_at=jnp.max(stop_marks),
            hist8=carry[2] if use_stop else None)
        return params, history

    # ------------------------------------------------------------------
    def optimize_scene_chain(self, host_inputs_list, hist8_init=None,
                             lean=False):
        """Run G scenes through ONE chained program dispatch.

        ``host_inputs_list``: list of ``host_inputs`` tuples sharing
        (V, N) shapes. The scenes run SEQUENTIALLY on device (lax.scan of
        the per-scene program over the group), threading the cross-scene
        OptEarlyStopping window between them — the per-scene dispatch
        loop's exact semantics (train.py:64), unlike
        ``optimize_scene_batch``'s fresh per-scene windows — while paying
        one program-dispatch RPC and one packed H2D transfer for the
        whole group. Mid-run checkpoint_iterations / per-scene debug
        hooks stay per-scene-path features (callers fall back).

        Returns ``(params_g, history_g)`` with a leading scene axis on
        every leaf; ``history_g.hist8`` is the final stopper window (seed
        the next group's call), ``history_g.stopped_at`` is (G,).

        ``lean=True`` keeps only the LAST telemetry row per scene
        (K=1 on losses/error/error_rel, bitwise the full history's
        final row) — a ~60× smaller result fetch for sweeps that log no
        per-iteration scalars (the driver's TB-off path, bench.py).
        """
        from skelsplat_tpu.utils import put_trees

        use_stop = self.settings.early_stopping == "opt_early_stopping"

        def _stack(*xs):
            if isinstance(xs[0], jax.Array):
                return jnp.stack(xs)
            return np.stack([np.asarray(x) for x in xs])

        stacked = jax.tree.map(_stack, *host_inputs_list)
        (initial_g, poses_2d_g, cams_g, gt_g, drop_g,
         extent_g) = put_trees(stacked)
        if use_stop and hist8_init is not None:
            hist8 = jnp.asarray(hist8_init, jnp.float32)
        else:
            hist8 = self._hist8_default()
        run = self._run_chain_lean if lean else self._run_chain
        params_g, recs_g, stop_g, h8 = run(
            initial_g, poses_2d_g, cams_g, drop_g, gt_g, extent_g, hist8)
        losses_k, err_k, err_rel_k, _ = recs_g
        return params_g, MacroHistory(
            losses=losses_k, error=err_k, error_rel=err_rel_k,
            stopped_at=stop_g, hist8=h8 if use_stop else None)

    # ------------------------------------------------------------------
    def optimize_scene_batch(self, initial_b, poses_2d_b, cameras_b: Camera,
                             pose_3d_gt_b=None, lean=False):
        """Batched twin of optimize_scene: vmaps the whole optimization over
        a leading scene axis on ONE device. Scenes are fully independent
        (SURVEY §2.5), so batching them amortizes the per-macro-step fixed
        costs and hands the fused kernels B× more parallel grid work — the
        throughput path for the 2,181-scene H36M sweep (the per-scene path
        remains the latency/parity reference). All scenes must share
        (V, N, W, H); checkpoints/noise/dropout are per-scene-path features.

        cameras_b: Camera pytree with leading (B, V) axes. Returns
        (params with leading B, MacroHistory with leading B).

        ``lean=True`` keeps only the LAST telemetry row per scene (K=1,
        bitwise the full history's final row) — the batched fetch is
        otherwise dominated by the (B, K, ·) history through remote
        tunnels (same knob as optimize_scene_chain's).
        """
        from skelsplat_tpu.utils import put_trees

        initial_b = np.asarray(initial_b, dtype=np.float32)
        poses_2d_b = np.ascontiguousarray(
            np.asarray(poses_2d_b)[..., :2], dtype=np.float32)
        B, nviews, n = poses_2d_b.shape[:3]
        if pose_3d_gt_b is None:
            pose_3d_gt_b = np.zeros_like(initial_b)
        else:
            pose_3d_gt_b = np.asarray(pose_3d_gt_b, dtype=np.float32)
        cams_np = jax.tree.map(
            lambda x: x if isinstance(x, jax.Array) else np.asarray(x),
            cameras_b)
        # extent on host BEFORE the put (see host_inputs); one host copy of
        # cam_center covers all B scenes
        centers = np.asarray(cams_np.cam_center)
        extent_b = np.asarray(
            [extent_from_centers(centers[b]) for b in range(B)], np.float32)
        drop_b = np.zeros((B, nviews, n), dtype=bool)
        hist8_b = np.full((B, 8), np.inf, np.float32)

        # ONE packed H2D transfer for the whole batch (see host_inputs)
        (initial_b, poses_2d_b, cameras_b, pose_3d_gt_b, extent_b, drop_b,
         hist8_b) = put_trees((initial_b, poses_2d_b, cams_np, pose_3d_gt_b,
                               extent_b, drop_b, hist8_b))
        run = self._run_full_b_lean if lean else self._run_full_b
        carry, recs, stop_b = run(
            initial_b, poses_2d_b, cameras_b, drop_b, pose_3d_gt_b,
            extent_b, hist8_b)
        losses_k, err_k, err_rel_k, _ = recs
        history = MacroHistory(
            losses=losses_k, error=err_k, error_rel=err_rel_k,
            stopped_at=stop_b)
        return carry[0], history
