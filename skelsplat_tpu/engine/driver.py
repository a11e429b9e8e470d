"""Training driver — the scene loop orchestration (port of train.py:56-304).

Wires DataLoader records into SceneTrainer runs, writes the reference's
on-disk artifacts (per-scene result PLYs under
``point_cloud/iteration_{it}/{scene}.ply``, ``input.ply``, ``cameras.json``,
debug render/heatmap PNGs), logs per-scene errors (with the S9 bad-calib
zeroing, train.py:193-194) and TensorBoard scalars, and reports the per-frame
optimization wall-clock — the BASELINE north-star metric.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import numpy as np

from skelsplat_tpu.core.gaussians import SkeletonModel, scene_type_of
from skelsplat_tpu.data import cameras_io, ply
from skelsplat_tpu.data.loader import DataLoader, SceneRecord
from skelsplat_tpu.engine.optim import OptConfig
from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings
from skelsplat_tpu import losses as loss_registry
from skelsplat_tpu.utils import fetch_trees

log = logging.getLogger(__name__)

# pipeline.rendering config keys → channel counts (replaces the three
# compiled packages selected in gaussian_renderer/__init__.py:367-371)
RENDERING_CHANNELS = {
    "diff-gaussian-rasterization-h36m": 17,
    "diff-gaussian-rasterization-panoptic": 19,
    "diff-gaussian-rasterization-op": 15,
}

S9_BAD = ["SittingDown 1", "Waiting 1", "Greeting"]


def opt_config_from(opt_group) -> OptConfig:
    return OptConfig(
        iterations=int(opt_group.iterations),
        position_lr_init=float(opt_group.position_lr_init),
        position_lr_final=float(opt_group.position_lr_final),
        position_lr_delay_mult=float(opt_group.position_lr_delay_mult),
        position_lr_max_steps=int(opt_group.position_lr_max_steps),
        feature_lr=float(opt_group.feature_lr),
        opacity_lr=float(opt_group.opacity_lr),
        scaling_lr=float(opt_group.scaling_lr),
        rotation_lr=float(opt_group.rotation_lr),
    )


def train_settings_from(training_group) -> TrainSettings:
    return TrainSettings(
        loss_function=training_group.loss_function,
        lambda_loss_function=float(training_group.lambda_loss_function),
        consistency_loss=training_group.consistency_loss,
        lambda_consistency=float(training_group.lambda_consistency),
        early_stopping=training_group.early_stopping,
        accumulation_steps=int(training_group.accumulation_steps),
        dropout=bool(training_group.dropout),
        std_dev_noise=float(training_group.std_dev_noise),
        quiet=bool(training_group.quiet),
        view_fusion=str(getattr(training_group, "view_fusion", "mean")),
    )


def _parse_scene_name(scene_name: str, data_root: str):
    """train.py:186-191."""
    if "panoptic" in data_root:
        parts = scene_name.split("_")
        return parts[0], parts[1] + "_" + parts[2], parts[-1]
    subject, activity, step = scene_name.split("_")
    return subject, activity, step


def _save_scene_artifacts(output_dir: str, record: SceneRecord):
    """input.ply + sparse/points3D.ply + cameras.json (scene/__init__.py:67-79
    + readXSceneInfo storePly). Overwritten per scene like the reference."""
    xyz = record.pose_3d.reshape(-1, 3)
    rgb = np.ones_like(xyz) * 255
    ply.write_point_ply(os.path.join(output_dir, "sparse", "points3D.ply"),
                        xyz, rgb)
    ply.write_point_ply(os.path.join(output_dir, "input.ply"), xyz, rgb)
    cams = [cameras_io.camera_to_json(i, c)
            for i, c in enumerate(record.cameras)]
    with open(os.path.join(output_dir, "cameras.json"), "w") as f:
        json.dump(cams, f)


def _save_images(trainer: SceneTrainer, params, cameras, output_dir: str,
                 name: str = "render"):
    """Debug PNG dump of per-camera channel-summed renders
    (train.py:279-292). Renders all views in one jitted program and
    reduces/normalizes/quantizes ON DEVICE — fetching raw (C,H,W)
    channels per view costs hundreds of MB through a remote tunnel."""
    import jax.numpy as jnp
    from PIL import Image
    from skelsplat_tpu.ops import rasterizer

    os.makedirs(f"{output_dir}/images", exist_ok=True)
    camsj = jax.tree.map(jnp.asarray, cameras)

    fn = getattr(trainer, "_debug_image_fn", None)
    if fn is None:
        @jax.jit
        def fn(params, cams):
            def one(cam):
                im = rasterizer.render(
                    params, cam, trainer.W, trainer.H)["render"].sum(axis=0)
                lo = im.min()
                rng_ = im.max() - lo
                im = (im - lo) / jnp.where(rng_ > 0, rng_, 1.0)
                return (im * 255).astype(jnp.uint8)
            return jax.vmap(one)(cams)
        trainer._debug_image_fn = fn
    ims = np.asarray(fn(params, camsj))          # (V, H, W) u8, one fetch
    for v in range(ims.shape[0]):
        Image.fromarray(ims[v]).save(f"{output_dir}/images/{name}_{v}.png")


def _save_heatmaps(gt_heatmaps, output_dir: str, name: str = "heatmap"):
    """train.py:294-304. Channel-sum + normalize + quantize on device,
    fetch (V,H,W) u8 once (the raw (V,C,H,W) stack is hundreds of MB)."""
    import jax.numpy as jnp
    from PIL import Image

    os.makedirs(f"{output_dir}/heatmaps", exist_ok=True)
    im_v = jnp.asarray(gt_heatmaps).sum(axis=1)
    lo = im_v.min(axis=(1, 2), keepdims=True)
    rng_ = im_v.max(axis=(1, 2), keepdims=True) - lo
    hm = np.asarray(((im_v - lo) / jnp.where(rng_ > 0, rng_, 1.0)
                     * 255).astype(jnp.uint8))
    for v in range(hm.shape[0]):
        Image.fromarray(hm[v]).save(f"{output_dir}/heatmaps/{name}_{v}.png")


def _log_tb_history(tb_writer, subject, activity, step, losses_k, err_k,
                    err_rel_k, accum):
    """Per-macro TB scalars with the reference's tag names (train.py:260-276)
    — shared by the per-scene, batched and multichip paths."""
    if tb_writer is None:
        return
    tb_string = f"Subject_{subject}_Activity_{activity}/Step_{step}"
    # fetch ONCE: these live on the device, and a per-macro conversion in
    # the loop would cost a device round-trip per scalar (measured: many
    # seconds per scene through an RPC tunnel)
    losses_k = np.asarray(losses_k)
    err_k = np.asarray(err_k)
    err_rel_k = np.asarray(err_rel_k)
    for k in range(losses_k.shape[0]):
        it = (k + 1) * accum
        tb_writer.add_scalar("train_loss_patches/total_loss",
                             float(losses_k[k].mean()), it)
        tb_writer.add_scalar(tb_string + "/absolute_error",
                             float(err_k[k].mean()), it)
        tb_writer.add_scalar(tb_string + "/relative_error",
                             float(err_rel_k[k].mean()), it)


def training(dataset, model_group, opt_group, pipe, debug, training_group,
             dataset_loader: DataLoader, output_dir: str, log=log):
    """Port of train.py:56-244. Returns per-scene summary dicts."""
    if training_group.loss_function not in loss_registry.losses:
        raise SystemExit(f"unknown loss {training_group.loss_function!r}")
    if training_group.consistency_loss not in loss_registry.consistency_losses:
        raise SystemExit(
            f"unknown consistency loss {training_group.consistency_loss!r}")
    if pipe.rendering not in RENDERING_CHANNELS:
        raise SystemExit(f"unknown rendering {pipe.rendering!r}")

    if bool(getattr(pipe, "debug", False)):
        # TPU analogue of the reference's CHECK_CUDA debug mode
        # (auxiliary.h:178-185): fail fast on NaNs from any jitted program.
        jax.config.update("jax_debug_nans", True)

    import skelsplat_tpu
    skelsplat_tpu.ensure_compile_cache()

    # additive knob: +debug.tensorboard=false disables TB logging, which
    # also lets the sweep fetch LEAN telemetry (only the last history row
    # per scene — the (K, ·) history otherwise dominates the result fetch
    # through remote tunnels). The reference logs TB whenever torch
    # tensorboard imports (train.py:247-257) — same default here.
    tb_writer = _prepare_tb(output_dir) \
        if bool(getattr(debug, "tensorboard", True)) else None
    scene_type = scene_type_of(dataset.data_root)
    model = SkeletonModel(
        scene_type, dataset_loader.n_joints,
        scaling=float(model_group.scaling),
        scaling_modifier=float(model_group.scaling_modifier),
        opacity_on=bool(model_group.opacity_on))
    if RENDERING_CHANNELS[pipe.rendering] != dataset_loader.n_joints:
        log.warning("pipeline.rendering %s has %d channels but dataset has "
                    "%d joints", pipe.rendering,
                    RENDERING_CHANNELS[pipe.rendering],
                    dataset_loader.n_joints)

    settings = train_settings_from(training_group)
    opt_cfg = opt_config_from(opt_group)
    save_iterations = list(debug.save_iterations)
    if opt_cfg.iterations not in save_iterations:
        save_iterations.append(opt_cfg.iterations)   # train.py:330

    trainers: dict[tuple, SceneTrainer] = {}
    results = []

    # Same-chip scene batching (throughput mode): an additive config knob —
    # `training.scene_batch=B` vmaps B independent scenes through one
    # program. Falls back to the per-scene path when intermediate
    # save_iterations, dropout, noise or early stopping are requested —
    # the reference's OptEarlyStopping window straddles scene boundaries
    # (train.py:64), which is inherently serial: batched scenes would each
    # start a fresh window and diverge from the per-scene path the parity
    # tests certify.
    scene_batch = int(getattr(training_group, "scene_batch", 1) or 1)
    batchable = (scene_batch > 1 and not settings.dropout
                 and settings.std_dev_noise == 0.0
                 and settings.early_stopping == "no_stopping"
                 and all(it >= opt_cfg.iterations or it <= 0
                         for it in save_iterations))
    if scene_batch > 1 and not batchable:
        log.info("scene_batch>1 requested but dropout/noise/save_iterations/"
                 "early_stopping need the per-scene path; batching disabled")

    log.info(f"Training on {len(dataset_loader)} scenes")
    total_opt_seconds = 0.0

    multichip = bool(getattr(training_group, "multichip", False))
    if multichip and len(jax.devices()) > 1:
        return _training_multichip(dataset, dataset_loader, model, opt_cfg,
                                   settings, pipe, save_iterations,
                                   output_dir, tb_writer, log)
    if batchable:
        return _training_batched(dataset, dataset_loader, model, opt_cfg,
                                 settings, pipe, debug, save_iterations,
                                 scene_batch, output_dir, tb_writer, log)

    # additive resume knob: skip scenes whose final PLY already exists in
    # the run dir (long-sweep restarts; the reference restarts via
    # dataset.start_scene_id windowing only). Early-stopped scenes save
    # under iteration_{stop} instead of the final iteration, so also consult
    # the previous run's summary for their stop iterations.
    skip_existing = bool(getattr(training_group, "skip_existing", False))
    prev_scenes = {}
    if skip_existing:
        try:
            with open(os.path.join(output_dir, "train_summary.json")) as f:
                prev_scenes = {s["scene_name"]: s
                               for s in json.load(f).get("scenes", [])}
        except (OSError, ValueError):
            pass

    def _done_iteration(name):
        prev = prev_scenes.get(name, {})
        return int(prev.get("stopped_at", 0)) or opt_cfg.iterations

    # the reference constructs OptEarlyStopping ONCE before the scene loop
    # (train.py:64), so its 8-loss window straddles scene boundaries — carry
    # the rolling history from scene to scene (skip_existing resumes start
    # it fresh, like a reference restart)
    hist8_carry = None

    # Scene pipelining: scenes are independent, so results are fetched
    # AFTER dispatching later scenes — hiding the device→host latency
    # behind on-device work. Measured through the RPC tunnel, each fetch
    # exposes ~12 ms of wall clock that does NOT overlap device execution
    # even when fully pipelined, so fetches are additionally GROUPED:
    # ``training.fetch_scenes`` results (default 32) are packed into ONE
    # device round-trip, amortizing the per-fetch cost to <1 ms/scene.
    # Re-measured round 4 with the lean carry-threaded program (64 timed
    # frames = two full groups): 0.0179 s/frame at groups of 16, 0.0169
    # at 32, 0.0166 at 64 — the knee moved from 16 to 32 as the device
    # program got faster (fetch cost amortizes over more scenes); 64 buys
    # 2% more for double the result latency, not taken. The fetch of one
    # group overlaps the execution of the next (up to 2×group scenes in
    # flight).
    # training.pipeline_scenes=false restores strictly serial
    # dispatch+fetch. The hist8 early-stop carry stays on-device, so
    # pipelining never forces a sync.
    pipeline = bool(getattr(training_group, "pipeline_scenes", True))
    fetch_group = max(1, int(getattr(training_group, "fetch_scenes", 32)
                             or 1)) if pipeline else 1
    # input transfers are grouped the same way (one packed H2D RPC per
    # fetch_group scenes): per-scene puts exposed ~4 ms of host time each
    # through the tunnel even when pipelined
    put_group = fetch_group
    # Scene CHAINING: when a whole put-group shares one trainer and input
    # shapes, the group runs as ONE program (lax.scan of the per-scene
    # program — optimize_scene_chain), paying one dispatch RPC instead of
    # one per scene. The scan threads the cross-scene hist8 stopper window
    # between scenes, so chained results are bitwise the per-scene loop's
    # (tests/test_engine.py::test_chained_scenes_match_serial) — including
    # under early stopping, which same-chip BATCHING cannot preserve.
    # Falls back per-scene for mid-run save_iterations (per-scene
    # checkpoint segmentation) and debug.save_images (per-scene renders).
    chain = (bool(getattr(training_group, "chain_scenes", True))
             and pipeline and fetch_group > 1
             and not debug.save_images
             and all(it >= opt_cfg.iterations or it <= 0
                     for it in save_iterations))
    in_flight: list = []   # ("scene", job) | ("chain", jobs, params_g, hist_g)
    prep_buf: list = []
    scenes_dispatched = 0
    sweep_t0 = time.perf_counter()

    def _entry_scenes(entry):
        return 1 if entry[0] == "scene" else len(entry[1])

    # the packed group fetch runs on ONE worker thread (double buffering):
    # the ~15 ms fetch RPC of group k overlaps the main thread's
    # host_inputs prep + dispatch of group k+1 — through the tunnel the
    # fetch wall-clock does not overlap device execution on its own
    # (measured round 4: group 64 bought the same ~2% this buys, at
    # double the result latency). Finalization (summary rows, PLY saves,
    # TB) stays on the main thread in dataset order.
    from concurrent.futures import ThreadPoolExecutor
    fetch_pool = ThreadPoolExecutor(1)
    fetch_futs: list = []   # (entries, future) in dispatch order

    def _submit_group(entries):
        fut = fetch_pool.submit(fetch_trees, [
            (e[1][2], e[1][3], e[1][4]) if e[0] == "scene" else (e[2], e[3])
            for e in entries])
        fetch_futs.append((entries, fut))

    def _finalize_fetched(max_pending: int):
        while len(fetch_futs) > max_pending:
            entries, fut = fetch_futs.pop(0)
            _finalize_entries(entries, fut.result())

    def _finalize_entries(entries, fetched):
        from skelsplat_tpu.engine.trainer import MacroHistory
        for e, f in zip(entries, fetched):
            if e[0] == "scene":
                params, history, pending_saves = f
                _finalize(e[1], params, history, pending_saves)
                continue
            params_g, history_g = f   # stacked host trees; slice per scene
            for i, job in enumerate(e[1]):
                params_i = jax.tree.map(lambda x, _i=i: x[_i], params_g)
                hist_i = MacroHistory(
                    losses=history_g.losses[i], error=history_g.error[i],
                    error_rel=history_g.error_rel[i],
                    stopped_at=history_g.stopped_at[i])
                # chained groups take the no-mid-checkpoint fast path: the
                # one save is the final iteration's (stop-aware in
                # _finalize, like the fast path's checkpoint_fn call)
                _finalize(job, params_i, hist_i,
                          [(opt_cfg.iterations, params_i)])

    def _drain(limit):
        """Move the oldest in-flight entries to the fetch thread until at
        most ``limit`` scenes remain dispatched-but-unsubmitted
        (~fetch_group scenes per fetch round-trip), then finalize
        completed fetches on THIS thread — keeping one fetch future
        pending while the sweep is still dispatching (``limit > 0``), none
        once it has ended."""
        nonlocal in_flight
        max_pending = 1 if limit else 0
        while sum(_entry_scenes(e) for e in in_flight) > limit:
            take, count = [], 0
            while in_flight and count < fetch_group:
                take.append(in_flight.pop(0))
                count += _entry_scenes(take[-1])
            _submit_group(take)
            _finalize_fetched(max_pending)
        _finalize_fetched(max_pending)

    def _finalize(job, params, history, pending_saves):
        nonlocal total_opt_seconds
        scene_id, record, _, _, _, saver, t0 = job
        # dispatch→fetch latency of this scene (group members share the
        # fetch timestamp; the summary's mean uses sweep wall clock)
        dt = time.perf_counter() - t0
        total_opt_seconds += dt

        stop_it = int(np.asarray(history.stopped_at))
        for it, prm in pending_saves:
            if stop_it and it >= stop_it:
                # post-stop params are frozen at their stop-time values, so
                # any later checkpoint carries exactly the stop-step state
                saver(stop_it, prm)
                break
            saver(it, prm)

        # per-scene error report (train.py:184-213, 239-242) with the S9
        # bad-calibration zeroing applied to the LOGGED absolute error
        subject, activity, step = _parse_scene_name(record.scene_name,
                                                    dataset.data_root)
        err = np.asarray(history.error)[-1]
        err_rel = np.asarray(history.error_rel)[-1]
        if subject == "S9" and activity in S9_BAD:
            err = np.zeros_like(err)
        log.info(f"Scene {record.scene_name}: "
                 f"abs {err.mean():.2f} rel {err_rel.mean():.2f} "
                 f"({dt:.2f}s)")
        _log_tb_history(tb_writer, subject, activity, step, history.losses,
                        history.error, history.error_rel,
                        settings.accumulation_steps)
        results.append({
            "scene_id": scene_id,
            "scene_name": record.scene_name,
            "abs_error": float(err.mean()),
            "rel_error": float(err_rel.mean()),
            "seconds": dt,
            "stopped_at": stop_it,
        })

    def _dispatch_group():
        """Dispatch the buffered scenes: as ONE chained program when the
        group is homogeneous (see ``chain`` above), else per-scene with the
        inputs still packed into one H2D transfer (the hist8 early-stop
        carry is serial either way)."""
        nonlocal scenes_dispatched, hist8_carry
        if not prep_buf:
            return
        from skelsplat_tpu.utils import put_trees

        tr0, hin0 = prep_buf[0][2], prep_buf[0][3]
        sig = lambda hin: tuple(np.shape(l) for l in jax.tree.leaves(hin))
        if (chain and len(prep_buf) > 1
                and all(p[2] is tr0 and sig(p[3]) == sig(hin0)
                        for p in prep_buf[1:])):
            params_g, history_g = tr0.optimize_scene_chain(
                [p[3] for p in prep_buf], hist8_init=hist8_carry,
                # TB off → only the LAST telemetry row is ever read
                # (_finalize's err[-1]); reduce it on-device so the
                # result fetch ships ~0.3 KB/scene instead of ~19
                lean=tb_writer is None)
            if history_g.hist8 is not None:
                hist8_carry = history_g.hist8   # device array: no sync
            scenes_dispatched += len(prep_buf)
            jobs = [(p[0], p[1], None, None, None, p[6], p[7])
                    for p in prep_buf]
            in_flight.append(("chain", jobs, params_g, history_g))
        else:
            dev_ins = put_trees([p[3] for p in prep_buf])
            for (scene_id, record, trainer, _, cameras, pending_saves,
                 saver, t0), dev_in in zip(prep_buf, dev_ins):
                params, history = trainer.optimize_scene(
                    None, None, inputs=dev_in,
                    checkpoint_iterations=save_iterations,
                    checkpoint_fn=lambda it, prm, _ps=pending_saves:
                        _ps.append((it, prm)),
                    hist8_init=hist8_carry,
                    # TB off → only the last telemetry row is read
                    # (no-op on mid-checkpoint debug runs)
                    lean=tb_writer is None)
                if history.hist8 is not None:
                    hist8_carry = history.hist8   # device array: no sync
                scenes_dispatched += 1
                if debug.save_images:
                    _save_images(trainer, params, cameras, output_dir,
                                 "render")
                in_flight.append(("scene", (scene_id, record, params,
                                            history, pending_saves, saver,
                                            t0)))
        prep_buf.clear()
        _drain(2 * fetch_group - 1 if pipeline else 0)

    for scene_id, record in dataset_loader:
        if skip_existing and os.path.exists(os.path.join(
                output_dir, "point_cloud",
                f"iteration_{_done_iteration(record.scene_name)}",
                f"{record.scene_name}.ply")):
            log.info(f"Scene {record.scene_name}: already done, skipping")
            _dispatch_group()
            _drain(0)   # keep the summary in dataset order
            if settings.dropout:
                # consume this scene's torch global-RNG draw so the masks of
                # the remaining scenes stay bitwise in dataset-order sync
                # with a fresh run (general_utils.py:267-271)
                from skelsplat_tpu.ops.heatmaps import dropout_masks_torch
                p2d = np.asarray(record.poses_2d)
                dropout_masks_torch(p2d.shape[0], p2d.shape[1])
            if record.scene_name in prev_scenes:
                # keep the prior record so the rewritten summary stays whole
                prev = prev_scenes[record.scene_name]
                results.append(prev)
                total_opt_seconds += float(prev.get("seconds", 0.0))
            continue
        cameras = cameras_io.build_camera_batch(record.cameras)
        W = int(np.asarray(cameras.width).max())
        H = int(np.asarray(cameras.height).max())
        nv = len(record.cameras)
        key = (W, H, nv)
        if key not in trainers:
            trainers[key] = SceneTrainer(
                model, opt_cfg, settings, W, H,
                antialiasing=bool(pipe.antialiasing))
        trainer = trainers[key]

        _save_scene_artifacts(output_dir, record)

        if debug.save_images and scenes_dispatched == 0 and not prep_buf:
            # GT heatmap PNG dump for the first scene (train.py:113-114)
            import jax.numpy as jnp
            from skelsplat_tpu.engine.trainer import init_params_jnp
            from skelsplat_tpu.ops import heatmaps as hm_ops
            p0 = init_params_jnp(jnp.asarray(record.pose_3d),
                                 model.scene_type, model.scaling,
                                 model.scaling_modifier)
            spec0 = hm_ops.heatmap_spec(
                p0.xyz, p0.covariance(),
                jnp.asarray(record.poses_2d[..., :2]),
                jax.tree.map(jnp.asarray, cameras), W, H)
            _save_heatmaps(hm_ops.eval_heatmaps(spec0, W, H), output_dir)

        def save_ply_at(iteration, params, _name=record.scene_name):
            path = os.path.join(output_dir, "point_cloud",
                                f"iteration_{iteration}", f"{_name}.ply")
            print(f"Saving iteration {iteration} for scene {_name}")
            ply.write_gaussian_ply(
                path, np.asarray(params.xyz),
                np.asarray(params.log_scales), np.asarray(params.quats),
                np.asarray(params.opacity_logit))

        if settings.dropout:
            # per-scene draw from the torch global RNG, in dataset order —
            # bitwise the reference's sequence (general_utils.py:267-271)
            from skelsplat_tpu.ops.heatmaps import dropout_masks_torch
            dmask = dropout_masks_torch(nv, np.asarray(
                record.poses_2d).shape[1])
        else:
            dmask = None

        # host-side prep now; the device transfer happens grouped at
        # dispatch time (pending_saves buffers checkpoints so early-stopped
        # scenes can be saved under their stop iteration, exactly like
        # train.py:227-233: "iteration in save_iterations or stop" → save,
        # then break — nothing after)
        t0 = time.perf_counter()
        hin = trainer.host_inputs(record.pose_3d, record.poses_2d, cameras,
                                  record.pose_3d_gt, drop_mask=dmask)
        prep_buf.append((scene_id, record, trainer, hin, cameras, [],
                         save_ply_at, t0))
        if len(prep_buf) >= put_group:
            _dispatch_group()

    _dispatch_group()
    _drain(0)
    fetch_pool.shutdown()

    # Mean is WALL CLOCK over the sweep: with pipelining the per-scene
    # dispatch→fetch intervals overlap (scene s's fetch happens after scene
    # s+1 is dispatched), so summing them would double-count host work.
    # Per-scene "seconds" stays the dispatch→fetch latency of that scene.
    sweep_wall = time.perf_counter() - sweep_t0
    n_run = max(scenes_dispatched, 1)
    log.info(f"Training completed. {len(results)} scenes, "
             f"{sweep_wall / n_run:.3f} s/scene mean (wall)")
    with open(os.path.join(output_dir, "train_summary.json"), "w") as f:
        json.dump({"scenes": results,
                   "mean_seconds_per_scene": sweep_wall / n_run,
                   "sweep_wall_seconds": sweep_wall,
                   "sum_scene_latency_seconds": total_opt_seconds,
                   "pipelined_scenes": pipeline}, f,
                  indent=2)
    print("Training completed.")
    return results


def _training_batched(dataset, dataset_loader, model, opt_cfg, settings,
                      pipe, debug, save_iterations, scene_batch, output_dir,
                      tb_writer, log):
    """Throughput scene loop: group same-shape scenes into vmapped batches
    (per-scene results agree with the per-scene path to f32-ulp level —
    bitwise before the fused single-dispatch fast path; see
    tests/test_engine.py::test_batched_scene_trainer_matches_single).
    Per-macro TB curves
    are logged from the batched history, so throughput mode keeps the
    per-scene path's observability.

    Batches are PIPELINED like the per-scene sweep: one batch stays in
    flight, and its packed result fetch (the ~12 ms-exposed tunnel
    round-trip) overlaps the next batch's device execution. Per-scene
    'seconds' therefore overlap; wall_clock_sweep_seconds in the summary
    is the non-overlapping truth."""
    records = [rec for _, rec in dataset_loader]
    results = []
    trainers: dict[tuple, SceneTrainer] = {}
    total = 0.0
    sweep_t0 = time.perf_counter()
    pending = None  # (group, params_b, hist_b, t0)

    def _finalize(group, params_b, hist_b, t0):
        nonlocal total
        params_b, hist_b = fetch_trees(params_b, hist_b)
        dt = time.perf_counter() - t0
        total += dt
        for b, (rec, _) in enumerate(group):
            # early-stopped scenes land in their stop-iteration dir
            # (train.py:227-233); params froze at the stop step.
            stop_b = int(np.asarray(hist_b.stopped_at)[b])
            it_dir = stop_b if stop_b else opt_cfg.iterations
            path = os.path.join(output_dir, "point_cloud",
                                f"iteration_{it_dir}",
                                f"{rec.scene_name}.ply")
            ply.write_gaussian_ply(
                path, np.asarray(params_b.xyz[b]),
                np.asarray(params_b.log_scales[b]),
                np.asarray(params_b.quats[b]),
                np.asarray(params_b.opacity_logit[b]))
            err = np.asarray(hist_b.error)[b, -1]
            err_rel = np.asarray(hist_b.error_rel)[b, -1]
            subject, activity, step = _parse_scene_name(
                rec.scene_name, dataset.data_root)
            if subject == "S9" and activity in S9_BAD:
                err = np.zeros_like(err)
            _log_tb_history(tb_writer, subject, activity, step,
                            np.asarray(hist_b.losses)[b],
                            np.asarray(hist_b.error)[b],
                            np.asarray(hist_b.error_rel)[b],
                            settings.accumulation_steps)
            results.append({
                "scene_id": rec.scene_id,
                "scene_name": rec.scene_name,
                "abs_error": float(err.mean()),
                "rel_error": float(err_rel.mean()),
                "seconds": dt / len(group),
                "stopped_at": int(np.asarray(hist_b.stopped_at)[b]),
            })
        log.info(f"Batch of {len(group)} scenes: {dt:.2f}s "
                 f"({dt / len(group):.3f} s/scene)")

    def shape_key(rec):
        cams = cameras_io.build_camera_batch(rec.cameras)
        W = int(np.asarray(cams.width).max())
        H = int(np.asarray(cams.height).max())
        return (W, H, len(rec.cameras)), cams

    i = 0
    while i < len(records):
        key, cams0 = shape_key(records[i])
        group = [(records[i], cams0)]
        j = i + 1
        while j < len(records) and len(group) < scene_batch:
            k2, c2 = shape_key(records[j])
            if k2 != key:
                break
            group.append((records[j], c2))
            j += 1
        i = j

        W, H, nv = key
        if key not in trainers:
            trainers[key] = SceneTrainer(
                model, opt_cfg, settings, W, H,
                antialiasing=bool(pipe.antialiasing))
        trainer = trainers[key]

        init_b = np.stack([np.asarray(r.pose_3d, np.float32)
                           for r, _ in group])
        gt_b = np.stack([np.asarray(r.pose_3d_gt, np.float32)
                         for r, _ in group])
        p2d_b = np.stack([np.asarray(r.poses_2d, np.float32)[..., :2]
                          for r, _ in group])
        cams_b = jax.tree.map(lambda *xs: np.stack(xs),
                              *[c for _, c in group])

        _save_scene_artifacts(output_dir, group[-1][0])
        t0 = time.perf_counter()
        params_b, hist_b = trainer.optimize_scene_batch(
            init_b, p2d_b, cams_b, gt_b,
            # TB off → only the LAST telemetry row is read; reduce it
            # on-device so the batched fetch ships ~0.3 KB/scene (the
            # (B, K, ·) history otherwise dominates the tunnel fetch)
            lean=tb_writer is None)
        # finalize the PREVIOUS batch now that this one is dispatched:
        # its packed fetch (timing through the fetch — block_until_ready
        # alone can return early on remote tunnels) overlaps this batch's
        # device execution
        if pending is not None:
            _finalize(*pending)
        pending = (group, params_b, hist_b, t0)

    if pending is not None:
        _finalize(*pending)

    n = max(len(results), 1)
    wall = time.perf_counter() - sweep_t0
    log.info(f"Training completed. {len(results)} scenes, "
             f"{wall / n:.3f} s/scene mean (wall)")
    with open(os.path.join(output_dir, "train_summary.json"), "w") as f:
        json.dump({"scenes": results,
                   "mean_seconds_per_scene": total / n,
                   "wall_clock_sweep_seconds": wall,
                   "wall_seconds_per_scene": wall / n}, f, indent=2)
    print("Training completed.")
    return results


def _training_multichip(dataset, dataset_loader, model, opt_cfg, settings,
                        pipe, save_iterations, output_dir, tb_writer, log):
    """Shard batches of scenes over a (scenes × views) device mesh
    (training.multichip=true). Views split over the 'views' axis when
    divisible; scenes over the rest of the devices. Full single-chip
    feature parity: the mesh step runs the shared compose_macro, so early
    stopping, dropout, noise, general accumulation windows, stop-aware
    checkpoint saves and per-macro telemetry all match train.py:155-233."""
    from skelsplat_tpu.parallel import choose_mesh, make_mesh
    from skelsplat_tpu.parallel.mesh import multichip_optimize

    records = [rec for _, rec in dataset_loader]
    n_dev = len(jax.devices())
    nviews = len(records[0].cameras)
    scenes_axis, views_axis = choose_mesh(n_dev, nviews)
    mesh = make_mesh(scenes_axis, views_axis)
    log.info(f"multichip mesh: {dict(mesh.shape)}")
    if settings.early_stopping != "no_stopping":
        # the reference's stopper window straddles scene boundaries
        # (train.py:64) — a serial effect no parallel-scene schedule can
        # reproduce. On the mesh each batch starts a fresh window; stops
        # still fire on within-scene plateaus (the dominant case: the >=8
        # warm-up gate means cross-boundary straddles need an 8-macro-old
        # carry-over, rare in 62-macro scenes).
        log.warning("multichip: %s windows reset per mesh batch (the "
                    "reference's cross-scene stopper state is inherently "
                    "serial; per-scene path keeps it exactly)",
                    settings.early_stopping)

    trainers = {}
    results = []
    total = 0.0
    i = 0
    while i < len(records):
        group = records[i:i + scenes_axis]
        # pad the tail group by repeating the last scene (extras discarded)
        pad = scenes_axis - len(group)
        group_p = group + [group[-1]] * pad
        cams_list = [cameras_io.build_camera_batch(r.cameras)
                     for r in group_p]
        W = int(max(np.asarray(c.width).max() for c in cams_list))
        H = int(max(np.asarray(c.height).max() for c in cams_list))
        key = (W, H, nviews)
        if key not in trainers:
            trainers[key] = SceneTrainer(
                model, opt_cfg, settings, W, H,
                antialiasing=bool(pipe.antialiasing))
        trainer = trainers[key]
        init_b = np.stack([r.pose_3d for r in group_p]).astype(np.float32)
        gt_b = np.stack([r.pose_3d_gt for r in group_p]).astype(np.float32)
        p2d_b = np.stack([np.asarray(r.poses_2d, np.float32)[..., :2]
                          for r in group_p])
        cams_b = jax.tree.map(lambda *xs: np.stack(xs), *cams_list)

        drop_b = None
        if settings.dropout:
            # one torch global-RNG draw per REAL scene, in dataset order
            # (general_utils.py:267-271); pad scenes reuse the last mask so
            # the RNG stays in dataset-order sync
            from skelsplat_tpu.ops.heatmaps import dropout_masks_torch
            masks = [dropout_masks_torch(nviews, p2d_b.shape[2])
                     for _ in group]
            drop_b = np.stack(masks + [masks[-1]] * pad)

        # buffer checkpoints so early-stopped scenes can be saved under
        # their stop iteration (train.py:227-233)
        pending_saves = []
        buffer_ckpt = lambda it, prm: pending_saves.append((it, prm))

        t0 = time.perf_counter()
        params_b, hist_b = multichip_optimize(
            mesh, trainer, init_b, p2d_b, cams_b, gt_b, drop_b=drop_b,
            checkpoint_iterations=save_iterations, checkpoint_fn=buffer_ckpt)
        # fetch ONCE for the whole batch (see _training_batched)
        params_b, hist_b, pending_saves = fetch_trees(
            params_b, hist_b, pending_saves)
        dt = time.perf_counter() - t0
        total += dt

        def save_ply_at(iteration, prm_b, b, name):
            path = os.path.join(output_dir, "point_cloud",
                                f"iteration_{iteration}", f"{name}.ply")
            ply.write_gaussian_ply(
                path, np.asarray(prm_b.xyz[b]),
                np.asarray(prm_b.log_scales[b]),
                np.asarray(prm_b.quats[b]),
                np.asarray(prm_b.opacity_logit[b]))

        for b, rec in enumerate(group):
            stop_b = int(np.asarray(hist_b.stopped_at)[b])
            for it, prm_b in pending_saves:
                if stop_b and it >= stop_b:
                    # post-stop params froze at their stop-time values
                    save_ply_at(stop_b, prm_b, b, rec.scene_name)
                    break
                save_ply_at(it, prm_b, b, rec.scene_name)

            err = np.asarray(hist_b.error)[b, -1]
            err_rel = np.asarray(hist_b.error_rel)[b, -1]
            subject, activity, step = _parse_scene_name(
                rec.scene_name, dataset.data_root)
            if subject == "S9" and activity in S9_BAD:
                err = np.zeros_like(err)
            _log_tb_history(tb_writer, subject, activity, step,
                            np.asarray(hist_b.losses)[b],
                            np.asarray(hist_b.error)[b],
                            np.asarray(hist_b.error_rel)[b],
                            settings.accumulation_steps)
            results.append({
                "scene_id": rec.scene_id, "scene_name": rec.scene_name,
                "abs_error": float(err.mean()),
                "rel_error": float(err_rel.mean()),
                "seconds": dt / len(group),
                "stopped_at": stop_b})
        log.info(f"mesh batch of {len(group)}: {dt:.2f}s")
        i += scenes_axis
    n = max(len(results), 1)
    log.info(f"Training completed. {len(results)} scenes, "
             f"{total / n:.3f} s/scene mean")
    with open(os.path.join(output_dir, "train_summary.json"), "w") as f:
        json.dump({"scenes": results,
                   "mean_seconds_per_scene": total / n}, f, indent=2)
    print("Training completed.")
    return results


def _prepare_tb(output_dir):
    """train.py:247-257."""
    os.makedirs(output_dir, exist_ok=True)
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(output_dir + "/tb")
    except Exception:
        print("Tensorboard not available: not logging progress")
        return None
