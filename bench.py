#!/usr/bin/env python
"""Benchmark: per-frame multi-view optimization wall-clock (BASELINE metric).

Runs the flagship H36M configuration — 17 joints, 4 views at 1000×1002,
500 iterations (125 fused macro steps), l2_gaussian + limb consistency —
on synthetic inputs and reports seconds per frame. Prints ONE JSON line:

    {"metric": "h36m_frame_opt_seconds", "value": ..., "unit": "s/frame",
     "vs_baseline": ...}

``vs_baseline`` is speedup vs REF_SECONDS_PER_FRAME, an estimate of the
reference CUDA pipeline on A100: the repo publishes no numbers
(BASELINE.md), so we budget its 500 sequential rasterizer forward+backward
launches (tile binning + radix sort + 17-channel composite over ~1 Mpx,
plus the python-side loss/optimizer overhead per iteration) at 5 ms/iter
→ 2.5 s/frame. Replace with a measured number when an A100 run exists.

Usage: python bench.py [--frames 4] [--iterations 500] [--small]
"""

import argparse
import json
import sys
import time

import numpy as np

REF_SECONDS_PER_FRAME = 2.5


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64,
                    help="timed frames (after 1 compile/warmup frame) — "
                         "two chained groups of 32, so the steady-state "
                         "fetch/execution overlap is actually exercised")
    ap.add_argument("--iterations", type=int, default=500)
    ap.add_argument("--small", action="store_true",
                    help="256x256 debug size instead of H36M 1000x1002")
    ap.add_argument("--preset", default="h36m",
                    choices=["h36m", "h36m-occ", "panoptic", "op"],
                    help="dataset scale: h36m 1002x1000x17, panoptic "
                         "1920x1080x19, op (occlusion-person) 1280x720x15, "
                         "h36m-occ = h36m frames with the occlusion "
                         "config's scaling_modifier=1.25 plus the dropout "
                         "experiment (+training.dropout=true) live")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure same-chip scene batching at this "
                         "batch size (throughput mode)")
    ap.add_argument("--group", type=int, default=32,
                    help="scenes chained per program dispatch in the sweep "
                         "(the driver's training.fetch_scenes; 32 is the "
                         "measured knee with the lean carry-threaded "
                         "program — 0.0179/0.0169/0.0166 s/frame at "
                         "16/32/64 over 64 timed frames)")
    ap.add_argument("--sync-fetch", action="store_true",
                    help="fetch groups on the dispatch thread (the round-4 "
                         "blocking scheme) instead of the double-buffered "
                         "fetch thread — A/B knob")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed frame "
                         "into DIR (view with tensorboard/xprof)")
    args = ap.parse_args(argv)

    import jax

    from __graft_entry__ import _synthetic_inputs
    from skelsplat_tpu.core.gaussians import SkeletonModel
    from skelsplat_tpu.engine.optim import OptConfig
    from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings

    presets = {
        # (W, H, joints, scene_type, scaling_modifier, dropout) — image
        # sizes per dataset_readers.py; scaling_modifier per
        # configs/*.yaml (op and h36m-occ ship 1.25 — benching them at
        # the default 1.0 hid a 10/32-scene full-frame fallback in the
        # OP cascade, round 5); dropout=True on h36m-occ exercises the
        # occlusion experiment's channel zeroing (train.py:324,
        # general_utils.py:267-282)
        "h36m": (1002, 1000, 17, "h36m", 1.0, False),
        "h36m-occ": (1002, 1000, 17, "h36m", 1.25, True),
        "panoptic": (1920, 1080, 19, "panoptic", 1.0, False),
        "op": (1280, 720, 15, "occlusion-person", 1.25, False),
    }
    W, H, n_joints, scene_type, modifier, dropout = presets[args.preset]
    if args.small:
        W, H = 256, 256

    n = args.frames + 1
    init, gt, p2d, cams_b = _synthetic_inputs(n, W, H, n_joints=n_joints)

    model = SkeletonModel(scene_type, n_joints, scaling=3.0,
                          scaling_modifier=modifier)
    trainer = SceneTrainer(model, OptConfig(iterations=args.iterations),
                           TrainSettings(dropout=dropout), W, H,
                           renderer="auto")

    if dropout:
        # the production sweep's per-scene torch global-RNG draw, in
        # dataset order from the safe_state seed (engine/driver.py)
        import torch

        from skelsplat_tpu.ops.heatmaps import dropout_masks_torch

        torch.manual_seed(0)
        nv = p2d.shape[1]
        dmasks = [dropout_masks_torch(nv, n_joints) for _ in range(n)]
    else:
        dmasks = [None] * n

    times = []
    for s in range(n):
        t0 = time.perf_counter()
        params, hist = trainer.optimize_scene(init[s], p2d[s], cams_b,
                                              gt[s], lean=True,
                                              drop_mask=dmasks[s])
        # fetch the result to the host: on remote-device tunnels
        # block_until_ready alone can return before the work is done, so a
        # benchmark must time through an actual result roundtrip (the sweep
        # driver fetches every pose anyway)
        xyz = np.asarray(params.xyz)
        dt = time.perf_counter() - t0
        assert np.isfinite(xyz).all()
        if s > 0:  # frame 0 pays compilation
            times.append(dt)
        print(f"frame {s}: {dt:.3f}s"
              + ("  (compile+run)" if s == 0 else ""), file=sys.stderr)

    # median: robust to interference spikes on shared/tunneled chips
    latency = float(np.median(times))
    print(f"per-scene latency (dispatch→fetch): {latency:.4f} s/frame",
          file=sys.stderr)

    # steady-state sweep throughput: scenes are independent, so the driver
    # pipelines them by default and CHAINS each group of
    # training.fetch_scenes (default 32) scenes into ONE program dispatch
    # (optimize_scene_chain: lax.scan of the per-scene program — bitwise
    # the per-scene results, tests/test_engine.py) with one packed H2D
    # transfer in and one packed fetch out, the fetch overlapped with the
    # next group's execution (through an RPC tunnel every individual
    # put/dispatch/fetch exposes ~4/3/12 ms that does not overlap device
    # execution). This mirrors the production sweep (engine/driver.py
    # _dispatch_group/_finalize_group), so it is the reported metric.
    # Warm the chain program per group size first (one-off compiles).
    from skelsplat_tpu.utils import fetch_trees

    group = args.group
    gsz = min(group, n - 1)
    tail = (n - 1) % group
    sizes = {gsz} | ({tail} if tail else set())
    for sz in sorted(sizes):
        warm = trainer.optimize_scene_chain(
            [trainer.host_inputs(init[1], p2d[1], cams_b, gt[1],
                                 drop_mask=dmasks[1])
             for _ in range(sz)], lean=True)
    fetch_trees(warm)
    # the group fetch runs on a 1-worker thread (double buffering): the
    # ~15 ms fetch RPC of group k overlaps the MAIN thread's host_inputs
    # prep + dispatch of group k+1 — the production driver's scheme
    # (engine/driver.py _drain). --sync-fetch restores the round-4
    # blocking fetch for A/B.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(1) if not args.sync_fetch else None
    t0 = time.perf_counter()
    fetched, pending, futs = [], [], []
    for g0 in range(1, n, group):
        batch = range(g0, min(g0 + group, n))
        # lean=True: reduce telemetry to its last row on-device — what the
        # production sweep fetches when TB logging is off (the full (K, ·)
        # history is ~19 KB/scene and the tunnel fetch is bandwidth-bound)
        pending.append(trainer.optimize_scene_chain(
            [trainer.host_inputs(init[s], p2d[s], cams_b, gt[s],
                                 drop_mask=dmasks[s])
             for s in batch], lean=True))
        if len(pending) > 1:   # fetch lags one group behind the dispatch
            job = pending.pop(0)
            if pool is None:
                fetched.append(fetch_trees(job))
            else:
                futs.append(pool.submit(fetch_trees, job))
                while len(futs) > 1:
                    fetched.append(futs.pop(0).result())
    fetched += [f.result() for f in futs]
    fetched += [fetch_trees(job) for job in pending]
    if pool is not None:
        pool.shutdown()
    assert all(np.isfinite(pg.xyz).all() for pg, _ in fetched)
    value = (time.perf_counter() - t0) / (n - 1)
    print(f"pipelined sweep: {value:.4f} s/frame "
          f"({args.frames} frames in flight, chained groups of {group})",
          file=sys.stderr)

    if args.profile:
        with jax.profiler.trace(args.profile):
            params, hist = trainer.optimize_scene(init[1], p2d[1], cams_b,
                                                  gt[1], lean=True)
            # fetch, don't block: on remote tunnels block_until_ready can
            # return before the device executes, stopping the trace with
            # NO device events captured (observed live on panoptic)
            np.asarray(params.xyz)
        print(f"trace written to {args.profile}", file=sys.stderr)

    if args.batch > 1:
        B = args.batch
        initb, gtb, p2db, _ = _synthetic_inputs(B, W, H, n_joints=n_joints)
        import numpy as _np
        cams_bb = jax.tree.map(lambda x: _np.stack([_np.asarray(x)] * B),
                               cams_b)
        # warm the compile, then time a PIPELINED 2-batch sweep — the
        # production batched driver keeps one batch in flight (batch k's
        # fetch overlaps batch k+1's execution, engine/driver.py
        # _training_batched), so the steady-state number must too
        pb, hb = trainer.optimize_scene_batch(initb, p2db, cams_bb, gtb,
                                              lean=True)
        # warm the packed-fetch program too (fetch_trees jit-packs per
        # tree structure; compiling it inside the timed loop costs a
        # remote-compile round-trip)
        pb, hb = fetch_trees(pb, hb)
        assert np.isfinite(np.asarray(pb.xyz)).all()
        t0 = time.perf_counter()
        jobs = [trainer.optimize_scene_batch(initb, p2db, cams_bb, gtb,
                                             lean=True)
                for _ in range(2)]
        fetched = [fetch_trees(pb_, hb_) for pb_, hb_ in jobs]
        dt = time.perf_counter() - t0
        assert all(np.isfinite(pb_.xyz).all() for pb_, _ in fetched)
        value = dt / (2 * B)
        print(f"batch {B}: {dt:.3f}s for 2 pipelined batches, "
              f"{value:.4f} s/frame", file=sys.stderr)

    print(json.dumps({
        "metric": f"{args.preset}_frame_opt_seconds",
        "value": round(value, 4),
        "unit": "s/frame",
        "vs_baseline": round(REF_SECONDS_PER_FRAME / value, 3),
    }))


if __name__ == "__main__":
    main()
