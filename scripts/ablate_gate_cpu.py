#!/usr/bin/env python
"""CPU diagnostic for the round-3 full_ds ATE regression.

Reproduces tests/test_odometry_integration.py::test_full_ds_matching_mode
(production HDL-64 config, make_world(seed=5), r=60 circuit, 12 scans) and
sweeps (match_source x keyframe gate), reporting keyframe COUNT, mean GN
iterations, and ATE. The round-3 gate gained the reference's convergence
precondition (odomEstimationNode.cpp:216-228); hypothesis: in full_ds mode
the last-iteration deltas sit above the tight 0.005 deg / 0.05 cm
thresholds more often, keyframes stop, the aged-voxel map decays, ATE
regresses (0.043 -> 0.109 on the TPU bench).

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

from lis_slam_tpu.config import SensorConfig, SlamConfig  # noqa: E402
from lis_slam_tpu.io import synthetic  # noqa: E402
from lis_slam_tpu.pipeline import driver, odometry, trajectory  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    base = SlamConfig().replace(
        sensor=SensorConfig(max_raw_points=64 * 1800))
    world = synthetic.make_world(seed=5)
    gt = synthetic.circular_trajectory(n + 1, radius=60.0, speed=8.0)
    sins = []
    for i in range(n):
        s = synthetic.render_scan(world, gt[i], None, seed=50 + i, noise=0.01)
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
        its = float(np.mean([int(np.asarray(o.iterations)) for o in outs]))
        ate = trajectory.ate_rmse(poses, gt_rel, align=False)
        print(f"{name:30s} kf {n_kf:3d}/{n}  GN-iters {its:5.2f}  "
              f"ATE {ate:.4f} m  ({wall:.0f} s)", flush=True)

    nogate = dataclasses.replace(base.keyframe, require_convergence=False)
    for src in ("full_ds", "sharp", "hybrid"):
        cfg = base.replace(matching=dataclasses.replace(
            base.matching, match_source=src))
        run(cfg, f"{src} gate-parity")
        run(cfg.replace(keyframe=nogate), f"{src} motion-only")


if __name__ == "__main__":
    main()
