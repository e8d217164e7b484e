#!/usr/bin/env python
"""CPU-scale diagnostic for the round-3 full_ds ATE regression.

The round-3 keyframe gate gained the reference's convergence precondition
(odomEstimationNode.cpp:216-228). Hypothesis: in full_ds mode the last-GN-
iteration deltas sit above the (very tight) 0.005 deg / 0.05 cm thresholds
more often, so keyframes stop being inserted, the aged-voxel map decays,
and ATE regresses (0.043 -> 0.109 on the TPU bench). This script replays a
16-beam tiny-config circuit on CPU and reports keyframe COUNT + ATE per
(match_source x gate) variant — the cadence collapse reproduces at small
scale even though absolute ATE doesn't match the HDL-64 bench.

Run: python scripts/ablate_gate_cpu.py [n_scans]
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from lis_slam_tpu.config import (KeyframeConfig, SensorConfig,  # noqa: E402
                                 SlamConfig)
from lis_slam_tpu.io import synthetic  # noqa: E402
from lis_slam_tpu.pipeline import driver, odometry, trajectory  # noqa: E402


def tiny_cfg():
    base = SlamConfig()
    return base.replace(
        sensor=SensorConfig(
            n_scan=16, horizon_scan=900, downsample_rate=1,
            lidar_min_range=1.0, lidar_max_range=80.0,
            max_raw_points=16 * 900,
        ),
        feature=dataclasses.replace(
            base.feature, max_corner_points=1024, max_surf_points=8192,
            max_sharp_corner_points=512, max_sharp_surf_points=1024,
        ),
        matching=dataclasses.replace(
            base.matching, corner_map_capacity=8192, surf_map_capacity=32768,
            hash_table_slots=1 << 14, degeneracy_eigen_threshold=10.0,
        ),
        keyframe=KeyframeConfig(min_distance=0.2, min_yaw=0.2),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    orig = synthetic.hdl64_elevations
    synthetic.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        world = synthetic.make_world(seed=5)
        gt = synthetic.circular_trajectory(n + 1, radius=60.0, speed=8.0)
        base = tiny_cfg()
        sins = []
        for i in range(n):
            s = synthetic.render_scan(world, gt[i], None, n_scan=16,
                                      horizon=900, seed=900 + i,
                                      max_range=90.0)
            sins.append(driver.pad_scan(s.points[s.valid], base))
        gt_rel = trajectory.relative_to_first(gt[:n])

        def run(cfg, name):
            state = odometry.init_state(cfg)
            outs = []
            t0 = time.perf_counter()
            for s in sins:
                state, o = odometry.odom_step(state, s, cfg)
                outs.append(o)
            jax.device_get(outs[-1].pose)
            wall = time.perf_counter() - t0
            poses = np.asarray([np.asarray(o.pose) for o in outs])
            n_kf = int(sum(bool(np.asarray(o.is_keyframe)) for o in outs))
            its = float(np.mean([int(np.asarray(o.iterations))
                                 for o in outs]))
            ate = trajectory.ate_rmse(poses, gt_rel, align=False)
            print(f"{name:34s} kf {n_kf:3d}/{n}  GN-iters {its:5.2f}  "
                  f"ATE {ate:.4f} m  ({wall:.0f} s)", flush=True)

        nogate = dataclasses.replace(base.keyframe, require_convergence=False)
        for src in ("sharp", "full_ds", "hybrid"):
            cfg = base.replace(matching=dataclasses.replace(
                base.matching, match_source=src))
            run(cfg, f"{src} gate-parity")
            run(cfg.replace(keyframe=nogate), f"{src} motion-only gate")
    finally:
        synthetic.hdl64_elevations = orig


if __name__ == "__main__":
    main()
