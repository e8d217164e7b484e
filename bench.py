#!/usr/bin/env python
"""Benchmark: KITTI-HDL-64-style odometry replay throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "scans_per_sec", "value": N, "unit": "scans/s",
     "vs_baseline": N / 10.0}

Baseline: the C++ reference is designed for 10 Hz real-time replay
(scanPeriod = 0.1 s, see BASELINE.md); vs_baseline is the speedup over that
design point. The rebuild target is > 100 scans/s (BASELINE.json).

The sequence is a synthetic HDL-64 city circuit (no KITTI data in this
environment — zero egress); scan shape/density matches the KITTI operating
point (64 x 1800, max range 70 m, downsampleRate 2).
"""

import json
import os
import sys
import time

import numpy as np

# full per-scan pipeline on the real device (do NOT force CPU here)
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.pipeline import driver, odometry, trajectory


def main():
    n_scans = int(os.environ.get("BENCH_SCANS", "60"))
    warmup = 5
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=64 * 1800))

    world = synthetic.make_world(seed=5)
    gt = synthetic.circular_trajectory(n_scans + 1, radius=60.0, speed=8.0)
    scans = [
        synthetic.render_scan(world, gt[i], None, seed=100 + i, noise=0.01)
        for i in range(n_scans)
    ]

    # Pre-pad all scans to device arrays up front (host prep is not the
    # thing being measured; in production the C++ loader does this async).
    padded = [driver.pad_scan(s.points[s.valid], cfg) for s in scans]

    state = odometry.init_state(cfg)
    step = odometry.odom_step

    outs = []
    # warmup (compile + first keyframes)
    for sin in padded[:warmup]:
        state, out = step(state, sin, cfg)
        outs.append(out)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for sin in padded[warmup:]:
        state, out = step(state, sin, cfg)
        outs.append(out)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    sps = (n_scans - warmup) / wall

    poses = np.asarray([np.asarray(o.pose) for o in outs])
    gt_rel = trajectory.relative_to_first(gt[:n_scans])
    ate = trajectory.ate_rmse(poses, gt_rel, align=False)

    result = {
        "metric": "scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),
        "extra": {
            "ate_m": round(float(ate), 4),
            "n_scans": n_scans,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
