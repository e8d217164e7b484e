#!/usr/bin/env python
"""Replay a KITTI odometry sequence through the full SLAM pipeline.

Equivalent of the reference's `roslaunch lis_slam run.launch` + `rosbag play`
(README.md section 5): the native C++ loader prefetches .bin scans while the
TPU runs the per-scan step; trajectory is exported in KITTI format and
evaluated against ground truth when available.

Usage:
    python examples/run_kitti.py --root /data/kitti --sequence 05 \
        --out 05_pred.txt [--preset kitti] [--max-scans N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu must take effect BEFORE importing the pipeline: package import
# builds device constants, which initializes the default (axon TPU)
# backend; jax.config.update("jax_platforms") only applies to the first
# device use. (The JAX_PLATFORMS env var is ignored — the axon plugin
# wins — so jax.config is the only switch.)
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()  # model.trt parity: warm launches skip compiles

from lis_slam_tpu.config import PRESETS
from lis_slam_tpu.io import kitti
from lis_slam_tpu.pipeline import driver, slam, trajectory
from lis_slam_tpu.runtime import native
from lis_slam_tpu.utils.profiling import StageTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sequence", default="05")
    ap.add_argument("--out", default="pred.txt")
    ap.add_argument("--preset", default="kitti", choices=sorted(PRESETS))
    ap.add_argument("--max-scans", type=int, default=0)
    ap.add_argument("--save-map", default="")
    ap.add_argument("--match-source", default="",
                    choices=("", "sharp", "full_ds", "hybrid"),
                    help="matched clouds: hybrid (production default — "
                         "sharp corners + voxel-uniform full surf; fastest "
                         "AND most accurate, docs/PERF.md round 4), sharp "
                         "(feature subsets only), or full_ds (reference-"
                         "faithful currentCloudInit: voxel-DS of the full "
                         "clouds). Empty keeps the preset's value.")
    ap.add_argument("--debug-dir", default="",
                    help="dump descriptor images / loop markers / stage "
                         "clouds (the reference's rviz debug surface)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin wins "
                         "over JAX_PLATFORMS; handled before imports at "
                         "the top of this file)")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]()
    if args.match_source:
        import dataclasses

        cfg = cfg.replace(matching=dataclasses.replace(
            cfg.matching, match_source=args.match_source))
    seq = kitti.KittiSequence(args.root, args.sequence)
    n = len(seq) if not args.max_scans else min(args.max_scans, len(seq))
    print(f"sequence {args.sequence}: {n} scans, native loader: "
          f"{native.available()}")

    files = [os.path.join(seq.velo_dir, seq.files[i]) for i in range(n)]
    loader = native.AsyncScanLoader(
        files, max_points=cfg.sensor.max_raw_points,
        capacity=cfg.runtime.queue_capacity,
        n_threads=cfg.runtime.num_host_threads,
        min_range=cfg.sensor.lidar_min_range,
        max_range=cfg.sensor.lidar_max_range,
    )

    system = slam.SemanticSlam(
        cfg, debug_dir=args.debug_dir or None)
    timer = StageTimer(log_every=100)
    for i, (buf, count) in enumerate(loader):
        with timer.stage("scan"):
            sin = driver.pad_scan(buf[:count], cfg)
            system.process_scan(sin)
        if i + 1 == n:
            break
    loader.close()

    res = system.finish(build_map=bool(args.save_map))
    trajectory.write_kitti(args.out, res.poses)
    print(f"wrote {args.out}: {len(res.poses)} poses, "
          f"{res.n_submaps} submaps, {res.n_loops} loop factors")
    print(timer.summary())

    if args.save_map and res.global_map is not None:
        kitti.write_pcd(args.save_map, res.global_map[:, :3],
                        res.global_map[:, 3])
        print(f"wrote {args.save_map}: {len(res.global_map)} points")

    gt = seq.ground_truth()
    if gt is not None:
        import jax.numpy as jnp

        from lis_slam_tpu.utils import se3

        gt6 = np.asarray(se3.matrix_to_pose(jnp.asarray(gt[:n], jnp.float32)))
        gt_rel = trajectory.relative_to_first(gt6)
        ate = trajectory.ate_rmse(res.poses, gt_rel, align=True)
        rpe_t, rpe_r = trajectory.rpe(res.poses, gt_rel)
        print(f"ATE {ate:.3f} m | RPE {rpe_t:.3f} m / {rpe_r:.3f} deg per frame")


if __name__ == "__main__":
    main()
