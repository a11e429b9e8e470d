"""Multi-chip SPMD over a (scenes × views) device mesh.

The reference is strictly single-GPU (SURVEY §2.5): its only cross-device-
like axes are the embarrassingly-parallel scene axis (2,181 independent
H36M frames) and the camera/view axis whose sole collective is the gradient
mean (train.py:215-218). The TPU-native mapping:

* ``scenes`` mesh axis — pure data parallelism; independent frames shard
  across chips/hosts with no communication at all (rides DCN when spanning
  hosts).
* ``views`` mesh axis — model-ish parallelism: each shard renders its slice
  of the cameras (the heavy render+VJP work), then ``all_gather``s the tiny
  per-view loss/gradient summaries over ICI and runs the identical
  single-chip macro composition (``trainer.compose_macro``) — so early
  stopping, general accumulation windows, and the reference's quirky
  mean-xyz / last-view gradient fusion hold on the mesh bit-for-bit.

Every shard then runs the identical Adam update on replicated parameters —
no parameter resharding, ICI traffic per macro step is O(V·N·10) floats.

Built with ``jax.shard_map`` over an explicit ``jax.sharding.Mesh`` so the
same program runs on a real pod slice or on a host-platform CPU mesh
(``--xla_force_host_platform_device_count``) for testing; the driver's
``dryrun_multichip`` uses exactly this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from skelsplat_tpu.engine.trainer import (SceneTrainer, cameras_extent,
                                          compose_macro, init_macro_carry,
                                          init_params_jnp)
from skelsplat_tpu.ops import heatmaps as hm
from skelsplat_tpu.ops.fused import make_fused_view_loss
from skelsplat_tpu.ops.pallas_raster import (make_pallas_view_loss,
                                             pallas_view_profiles)


def choose_mesh(n_devices: int, nviews: int) -> tuple[int, int]:
    """Factor ``n_devices`` into (scenes_axis, views_axis).

    One policy for every call site (driver + __graft_entry__): the views
    axis takes the largest divisor of ``nviews`` that also divides
    ``n_devices`` — full view-parallelism when the counts line up (8 devs ×
    4 views → 2×4), graceful fallback otherwise (6 devs × 4 views → 3×2;
    5 devs → 5×1). scenes_axis · views_axis == n_devices always.
    """
    if n_devices <= 0 or nviews <= 0:
        raise ValueError(f"need positive counts, got {n_devices=} {nviews=}")
    views_axis = max(d for d in range(1, nviews + 1)
                     if nviews % d == 0 and n_devices % d == 0)
    return n_devices // views_axis, views_axis


def make_mesh(n_scenes: int, n_views: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_scenes * n_views > devices.size:
        raise ValueError(f"mesh {n_scenes}x{n_views} needs "
                         f"{n_scenes * n_views} devices, have {devices.size}")
    devices = devices[: n_scenes * n_views].reshape(n_scenes, n_views)
    return Mesh(devices, axis_names=("scenes", "views"))


def batch_scene_records(records, cameras_batches):
    """Stack per-scene arrays into leading-batch pytrees for the scene axis."""
    import jax

    initial = np.stack([np.asarray(r.pose_3d, np.float32) for r in records])
    gt = np.stack([np.asarray(r.pose_3d_gt, np.float32) for r in records])
    p2d = np.stack([np.asarray(r.poses_2d, np.float32)[..., :2]
                    for r in records])
    cams = jax.tree.map(lambda *xs: np.stack(xs), *cameras_batches)
    return initial, gt, p2d, cams


def multichip_train_step(mesh: Mesh, trainer: SceneTrainer):
    """Build a jitted full training macro-step sharded over the mesh.

    Returns ``(prepare, step)``:
      prepare(initial_b, poses_2d_b, cams_b, drop_b) → (carry, view_aux)
      step(carry, view_aux, poses_2d_b, cams_b, extent_b, gt_b, k)
                                                     → (carry, rec)

    Scene-batch leaves shard over "scenes"; the view axis of cameras /
    detections / heatmap state shards over "views". The carry (params,
    optimizer state, early-stop history, accumulated-grad rows) is
    replicated along "views" and sharded along "scenes".

    Semantics are EXACTLY the single-chip trainer's: each view shard runs
    the heavy per-view render+VJP locally, then the tiny per-view loss and
    gradient summaries (O(V·N·10) floats) are ``all_gather``-ed over the
    views axis (ICI) and every shard runs the identical
    ``trainer.compose_macro`` — the same function the single-chip scan
    uses — so early stopping (mid-macro straddle windows, mixed stale
    gradients), general accumulation_steps ≠ nviews round-robin, and the
    mean-xyz/last-view fusion (train.py:155-233) all hold on the mesh
    bit-for-bit. Replicated composition costs nothing: the update is
    O(N·10) flops against a multi-megapixel render stage.
    """
    model = trainer.model
    settings = trainer.settings
    W, H = trainer.W, trainer.H
    adam = trainer.adam
    accum = settings.accumulation_steps
    n_view_shards = mesh.shape["views"]
    use_stop = settings.early_stopping == "opt_early_stopping"
    use_pallas = trainer.renderer == "pallas"

    win_shapes = tuple(trainer._pallas_win or ()) if use_pallas else ()
    if use_pallas:
        _pal = make_pallas_view_loss(model, settings, W, H,
                                     trainer.antialiasing)
        view_loss = lambda p, cam, aux, p2: _pal(p, cam, aux[0], p2,
                                                 profiles=aux[1])
    else:
        _fused = make_fused_view_loss(model, settings, W, H,
                                      trainer.antialiasing)
        view_loss = lambda p, cam, aux, p2: _fused(p, cam, aux, p2)

    # ---- specs ----
    scene_sharded = P("scenes")                 # carry: batch axis only
    view_sharded = P("scenes", "views")         # (B, V, ...) arrays

    def _prepare_local(initial, poses_2d, cams, drop):
        """Per (scene-shard, view-shard) block: carry replicated across the
        view axis; heatmap spec computed for the local views only."""
        def one_scene(init_p, p2d, cam, dm):
            params = init_params_jnp(init_p, model.scene_type, model.scaling,
                                     model.scaling_modifier)
            cov6 = params.covariance()
            spec = hm.heatmap_spec(params.xyz, cov6, p2d, cam, W, H,
                                   drop_mask=dm)
            if use_pallas:
                profs = jax.vmap(
                    lambda sv: pallas_view_profiles(sv, W, H))(spec)
                view_aux = (spec, profs)
            else:
                view_aux = spec
            nviews_g = p2d.shape[0] * n_view_shards
            general = accum != nviews_g
            carry = init_macro_carry(params, adam.init(params), nviews_g,
                                     use_stop, general)
            return carry, view_aux
        return jax.vmap(one_scene)(initial, poses_2d, cams, drop)

    def _step_local(carry, view_aux, poses_2d, cams, extent, gt, k):
        """One macro step on the local (scenes_blk, views_blk) block."""
        nviews_g = poses_2d.shape[1] * n_view_shards
        general = accum != nviews_g
        params_blk = carry[0]

        # ---- phase 1: local per-(scene, view) losses + grads, with the
        # Pallas window switch hoisted above BOTH vmaps (a vmapped cond
        # executes every branch) and OUTSIDE all collectives (devices may
        # pick different tiers; collectives inside diverging branches
        # would mismatch across shards) ----
        def vv(f, extra=0):
            g = jax.vmap(f, in_axes=(None, 0, 0, 0) + (0,) * extra)
            return jax.vmap(g, in_axes=(0, 0, 0, 0) + (0,) * extra)

        def grads_full(_):
            return vv(jax.value_and_grad(view_loss))(
                params_blk, cams, view_aux, poses_2d)

        if win_shapes:
            from skelsplat_tpu.ops.pallas_raster import (
                pallas_view_bbox, window_bounds_multi)
            # ONE bbox per (scene, view); the tier snaps/fits are ONE
            # vectorized chain over the cascade. fit is over the LOCAL
            # shard's views only — shards may pick different tiers for
            # the same macro step, which is safe precisely because the
            # branches contain no collectives (the all_gather sits
            # outside the switch); keep it that way, or a global fit
            # reduction becomes mandatory
            bbox = vv(lambda p, cam, aux, p2: pallas_view_bbox(
                p, cam, aux[0], W, H, trainer.antialiasing,
                profiles=aux[1]))(params_blk, cams, view_aux, poses_2d)
            offs_all, fit_all = window_bounds_multi(
                bbox.reshape(-1, bbox.shape[-1]), W, H, win_shapes)
            offs_t = [offs_all[t].reshape(bbox.shape[:-1] + (2,))
                      for t in range(len(win_shapes))]

            def grads_win(t):
                def call(_):
                    f = jax.value_and_grad(
                        lambda p, cam, aux, p2, off: _pal(
                            p, cam, aux[0], p2, profiles=aux[1],
                            window=off, win_shape=win_shapes[t][:2],
                            slot_w=win_shapes[t][2],
                            rows=win_shapes[t][3]))
                    return vv(f, extra=1)(params_blk, cams, view_aux,
                                          poses_2d, offs_t[t])
                return call

            branch = jnp.argmax(jnp.concatenate(
                [fit_all, jnp.ones((1,), bool)]))
            losses_blk, grads_blk = jax.lax.switch(
                branch,
                [grads_win(t) for t in range(len(win_shapes))]
                + [grads_full], None)
        else:
            losses_blk, grads_blk = grads_full(None)

        # ---- phase 2: gather + compose, per scene ----
        def one_scene(carry, losses_loc, grads_loc, ext, g3d):
            # the only collectives: gather the per-view summaries over the
            # views axis (ICI) so every shard composes identically
            gather = lambda x: jax.lax.all_gather(x, "views", axis=0,
                                                  tiled=True)
            losses_all = gather(losses_loc)            # (V_global,)
            grads_all = jax.tree.map(gather, grads_loc)
            if general:
                # round-robin window (train.py:136): visit views
                # (k·A+j) mod V during macro k, in visit order
                idxs = (k * accum
                        + jnp.arange(accum, dtype=jnp.int32)) % nviews_g
                losses_vis = jnp.take(losses_all, idxs, axis=0)
                grads_vis = jax.tree.map(
                    lambda g: jnp.take(g, idxs, axis=0), grads_all)
            else:
                idxs = jnp.arange(accum, dtype=jnp.int32)
                losses_vis, grads_vis = losses_all, grads_all
            return compose_macro(adam, accum, nviews_g, use_stop, general,
                                 carry, k, losses_vis, grads_vis, idxs,
                                 g3d, ext, view_fusion=settings.view_fusion)

        return jax.vmap(one_scene)(carry, losses_blk, grads_blk, extent, gt)

    prepare_sm = jax.shard_map(
        _prepare_local, mesh=mesh,
        in_specs=(scene_sharded, view_sharded, view_sharded, view_sharded),
        out_specs=(scene_sharded, view_sharded),
        check_vma=False)

    step_sm = jax.shard_map(
        _step_local, mesh=mesh,
        in_specs=(scene_sharded, view_sharded, view_sharded, view_sharded,
                  scene_sharded, scene_sharded, P()),
        out_specs=(scene_sharded, scene_sharded),
        check_vma=False)

    prepare = jax.jit(prepare_sm)
    step = jax.jit(step_sm)

    import functools

    @functools.partial(jax.jit, static_argnums=(7,))
    def run_segment(carry, view_aux, p2d, cams, ext, gt, k0, n_seg):
        def body(c, k):
            return step(c, view_aux, p2d, cams, ext, gt, k)
        return jax.lax.scan(body, carry,
                            k0 + jnp.arange(n_seg, dtype=jnp.int32))

    return prepare, step, run_segment


def multichip_programs(mesh: Mesh, trainer: SceneTrainer):
    """Cached (prepare, step, run_segment) per (trainer, mesh).

    ``jax.jit`` caches on function identity, so rebuilding the closures per
    mesh batch (as multichip_optimize once did) forced a fresh trace —
    real money through a ~10-minute remote-compile tunnel. The cache hangs
    off the trainer (same lifetime as its other compiled programs) and keys
    on the Mesh, which hashes by device assignment + axis names."""
    cache = getattr(trainer, "_multichip_programs", None)
    if cache is None:
        cache = trainer._multichip_programs = {}
    progs = cache.get(mesh)
    if progs is None:
        progs = cache[mesh] = multichip_train_step(mesh, trainer)
    return progs


def multichip_optimize(mesh: Mesh, trainer: SceneTrainer, initial_b,
                       poses_2d_b, cams_b, gt_b=None, drop_b=None,
                       checkpoint_iterations=(), checkpoint_fn=None):
    """Full multi-chip scene optimization: prepare once, then lax.scan the
    sharded macro step over all iterations — one dispatch for the whole
    sharded batch (split into jit-cached segments at checkpoint
    boundaries, like the single-chip path). Scene batch size must equal
    mesh.shape['scenes'] and the view count must split evenly over
    mesh.shape['views'].

    Mirrors optimize_scene's host-side features: seed-0 noise injection
    (train.py:80-84), dropout masks via ``drop_b``, and
    ``checkpoint_fn(iteration, params_b)`` at ``checkpoint_iterations``.

    Returns (params_b, MacroHistory with leading B) — the same telemetry
    contract as optimize_scene_batch."""
    from skelsplat_tpu.engine.trainer import MacroHistory

    initial_b = np.asarray(initial_b, np.float32)
    if trainer.settings.std_dev_noise > 0.0:
        # per-scene seed-0 numpy RNG, exactly optimize_scene's draw
        noised = []
        for b in range(initial_b.shape[0]):
            rng = np.random.default_rng(seed=0)
            noised.append(initial_b[b] + rng.normal(
                0.0, trainer.settings.std_dev_noise, initial_b[b].shape))
        initial_b = np.stack(noised).astype(np.float32)
    initial_b = jnp.asarray(initial_b)
    poses_2d_b = jnp.asarray(np.asarray(poses_2d_b)[..., :2], jnp.float32)
    B, nviews = poses_2d_b.shape[:2]
    if gt_b is None:
        gt_b = jnp.zeros_like(initial_b)
    else:
        gt_b = jnp.asarray(np.asarray(gt_b, np.float32))
    if drop_b is None:
        drop_b = jnp.zeros(poses_2d_b.shape[:3], dtype=bool)
    else:
        drop_b = jnp.asarray(np.asarray(drop_b), dtype=bool)
    cams_b = jax.tree.map(jnp.asarray, cams_b)
    extent_b = jnp.asarray(scene_batch_extents(cams_b))

    prepare, _step, run_segment = multichip_programs(mesh, trainer)
    carry, view_aux = prepare(initial_b, poses_2d_b, cams_b, drop_b)

    accum = trainer.settings.accumulation_steps
    rounded = sorted({min(max(it // accum, 0), trainer.n_macro)
                      for it in checkpoint_iterations})
    rounded = [b for b in rounded if b > 0]
    bounds = list(rounded)
    if not bounds or bounds[-1] != trainer.n_macro:
        bounds.append(trainer.n_macro)

    all_recs = []
    k0 = 0
    for b in bounds:
        n_seg = b - k0
        if n_seg > 0:
            carry, recs = run_segment(carry, view_aux, poses_2d_b, cams_b,
                                      extent_b, gt_b,
                                      jnp.asarray(k0, jnp.int32), n_seg)
            all_recs.append(recs)
            k0 = b
        if checkpoint_fn is not None and b in rounded:
            checkpoint_fn(b * accum, carry[0])

    # recs leaves are (K, B, ...) — transpose to the (B, K, ...) batch
    # convention of optimize_scene_batch
    losses_k, err_k, err_rel_k, stop_marks = (
        jnp.swapaxes(jnp.concatenate([r[i] for r in all_recs], axis=0), 0, 1)
        for i in range(4))
    history = MacroHistory(
        losses=losses_k, error=err_k, error_rel=err_rel_k,
        stopped_at=jnp.max(stop_marks, axis=1))
    return carry[0], history


def scene_batch_extents(cams_b) -> np.ndarray:
    """(B,) per-scene cameras_extent for a stacked camera batch."""
    import jax

    B = np.asarray(cams_b.cam_center).shape[0]
    return np.asarray([
        cameras_extent(jax.tree.map(lambda x: x[b], cams_b))
        for b in range(B)], dtype=np.float32)
