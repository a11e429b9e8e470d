"""Multi-chip SPMD over a (scenes × views) device mesh.

The reference is strictly single-GPU (SURVEY §2.5): its only cross-device-
like axes are the embarrassingly-parallel scene axis (2,181 independent
H36M frames) and the camera/view axis whose sole collective is the gradient
mean (train.py:215-218). The TPU-native mapping:

* ``scenes`` mesh axis — pure data parallelism; independent frames shard
  across chips/hosts with no communication at all (rides DCN when spanning
  hosts).
* ``views`` mesh axis — model-ish parallelism: each shard renders its slice
  of the cameras; the xyz-gradient mean becomes a ``psum`` over ICI, and the
  reference's quirky "scale/rot/opacity step on the LAST view's gradient"
  becomes a masked psum (select the owner shard, broadcast by summation).

Every shard then runs the identical Adam update on replicated parameters —
no parameter resharding, ICI traffic per macro step is O(N·10) floats.

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

from skelsplat_tpu.core.gaussians import GaussianParams
from skelsplat_tpu.engine.trainer import (SceneTrainer, cameras_extent,
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
      prepare(initial_b, poses_2d_b, cams_b)   → sharded (state, aux)
      step(state, aux, poses_2d_b, cams_b, k)  → (state, per-view losses)

    Scene-batch leaves shard over "scenes"; the view axis of cameras /
    detections / heatmap state shards over "views". Parameters and optimizer
    state are replicated along "views" and sharded along "scenes".
    """
    model = trainer.model
    settings = trainer.settings
    W, H = trainer.W, trainer.H
    adam = trainer.adam
    accum = settings.accumulation_steps
    n_view_shards = mesh.shape["views"]
    use_pallas = trainer.renderer == "pallas"

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
    scene_sharded = P("scenes")                 # params/opt: batch axis only
    view_sharded = P("scenes", "views")         # (B, V, ...) arrays

    def _prepare_local(initial, poses_2d, cams):
        """Per (scene-shard, view-shard) block: params replicated across the
        view axis; heatmap spec computed for the local views only."""
        def one_scene(init_p, p2d, cam):
            params = init_params_jnp(init_p, model.scene_type, model.scaling,
                                     model.scaling_modifier)
            cov6 = params.covariance()
            drop = jnp.zeros(p2d.shape[:2], dtype=bool)
            spec = hm.heatmap_spec(params.xyz, cov6, p2d, cam, W, H,
                                   drop_mask=drop)
            if use_pallas:
                profs = jax.vmap(
                    lambda sv: pallas_view_profiles(sv, W, H))(spec)
                return params, adam.init(params), (spec, profs)
            return params, adam.init(params), spec
        return jax.vmap(one_scene)(initial, poses_2d, cams)

    def _step_local(params, opt_state, spec, poses_2d, cams, extent, k):
        """One macro step on the local (scenes_blk, views_blk) block."""
        def one_scene(params, opt_state, spec, p2d, cam, ext):
            f = jax.value_and_grad(view_loss)
            losses_v, grads_v = jax.vmap(f, in_axes=(None, 0, 0, 0))(
                params, cam, spec, p2d)
            v_loc = p2d.shape[0]
            # global mean over views: local sum / V_global, psum'd below
            g_xyz_part = jnp.sum(grads_v.xyz, axis=0)
            # reference semantics: scale/rot/opacity take the LAST global
            # view's gradient (train.py:175-179) — owned by the last shard
            is_last_shard = jax.lax.axis_index("views") == n_view_shards - 1
            sel = jnp.where(is_last_shard, 1.0, 0.0)
            g_other = jax.tree.map(
                lambda g: sel * g[v_loc - 1],
                GaussianParams(grads_v.xyz, grads_v.log_scales,
                               grads_v.quats, grads_v.opacity_logit))
            return losses_v, g_xyz_part, g_other

        losses_v, g_xyz_part, g_other = jax.vmap(one_scene)(
            params, opt_state, spec, poses_2d, cams, extent)

        # ---- the only collectives: over the views axis (ICI) ----
        v_global = jnp.asarray(
            poses_2d.shape[1] * n_view_shards, jnp.float32)
        g_xyz = jax.lax.psum(g_xyz_part, "views") / v_global
        g_other = jax.tree.map(lambda g: jax.lax.psum(g, "views"), g_other)

        grads = GaussianParams(
            xyz=g_xyz, log_scales=g_other.log_scales,
            quats=g_other.quats, opacity_logit=g_other.opacity_logit)
        iteration = (k + 1) * accum
        new_params, new_opt = jax.vmap(
            lambda p, g, s, e: adam.step(p, g, s, iteration, e)
        )(params, grads, opt_state, extent)
        return new_params, new_opt, losses_v

    prepare_sm = jax.shard_map(
        _prepare_local, mesh=mesh,
        in_specs=(scene_sharded, view_sharded, view_sharded),
        out_specs=(scene_sharded, scene_sharded, view_sharded),
        check_vma=False)

    step_sm = jax.shard_map(
        _step_local, mesh=mesh,
        in_specs=(scene_sharded, scene_sharded, view_sharded, view_sharded,
                  view_sharded, scene_sharded, P()),
        out_specs=(scene_sharded, scene_sharded, view_sharded),
        check_vma=False)

    @jax.jit
    def prepare(initial_b, poses_2d_b, cams_b):
        params, opt_state, spec = prepare_sm(initial_b, poses_2d_b, cams_b)
        return params, opt_state, spec

    @jax.jit
    def step(params, opt_state, spec, poses_2d_b, cams_b, extent_b, k):
        return step_sm(params, opt_state, spec, poses_2d_b, cams_b,
                       extent_b, k)

    return prepare, step


def multichip_optimize(mesh: Mesh, trainer: SceneTrainer, initial_b,
                       poses_2d_b, cams_b, gt_b=None):
    """Full multi-chip scene optimization: prepare once, then lax.scan the
    sharded macro step over all iterations — one dispatch for the whole
    sharded batch. Scene batch size must equal mesh.shape['scenes'] and the
    view count must split evenly over mesh.shape['views'].

    Returns (params_b, losses (K, B, V_local·shards?) — per-view losses per
    macro step, gathered)."""
    initial_b = jnp.asarray(np.asarray(initial_b, np.float32))
    poses_2d_b = jnp.asarray(np.asarray(poses_2d_b)[..., :2], jnp.float32)
    cams_b = jax.tree.map(jnp.asarray, cams_b)
    extent_b = jnp.asarray(scene_batch_extents(cams_b))
    prepare, step = multichip_train_step(mesh, trainer)
    params_b, opt_b, spec_b = prepare(initial_b, poses_2d_b, cams_b)

    @jax.jit
    def run(params_b, opt_b, spec_b, poses_2d_b, cams_b, extent_b):
        def body(carry, k):
            params_b, opt_b = carry
            params_b, opt_b, losses = step(params_b, opt_b, spec_b,
                                           poses_2d_b, cams_b, extent_b, k)
            return (params_b, opt_b), losses

        (params_b, opt_b), losses = jax.lax.scan(
            body, (params_b, opt_b),
            jnp.arange(trainer.n_macro, dtype=jnp.int32))
        return params_b, losses

    return run(params_b, opt_b, spec_b, poses_2d_b, cams_b, extent_b)


def scene_batch_extents(cams_b) -> np.ndarray:
    """(B,) per-scene cameras_extent for a stacked camera batch."""
    import jax

    B = np.asarray(cams_b.cam_center).shape[0]
    return np.asarray([
        cameras_extent(jax.tree.map(lambda x: x[b], cams_b))
        for b in range(B)], dtype=np.float32)
