#!/usr/bin/env python
"""Experiment: scheduled (unrolled) solver vs while-loop solver on the real
bench replay; also measures bare dispatch overhead. Usage:
  python scripts/exp_sched.py [n_scans]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as pre_ops
from lis_slam_tpu.pipeline import odometry, trajectory


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    warmup = 5
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))

    # dispatch overhead
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(8)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(50):
        x = tiny(x)
    jax.block_until_ready(x)
    print(f"dispatch overhead     : {(time.perf_counter()-t0)/50*1e3:6.2f} ms")

    scans, gt = synthetic_jax.render_sequence_device(n_scans, seed=5)

    @jax.jit
    def prep(pts, val):
        ring, ok = pre_ops.compute_ring(pts, val, cfg.sensor.n_scan)
        keep = ok & (ring % cfg.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        buf = jnp.zeros((P + 1, 4), jnp.float32).at[dest].set(pts)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf, jnp.arange(P) < cnt

    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
    padded = []
    for pts, _lbl, val in scans:
        bp, bv = prep(pts, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
    jax.block_until_ready(padded[-1].points)
    gt_rel = trajectory.relative_to_first(gt[:n_scans])

    def run(step, tag):
        state = odometry.init_state(cfg)
        outs = []
        for s in padded[:warmup]:
            state, o = step(state, s, cfg)
            outs.append(o)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for s in padded[warmup:]:
            state, o = step(state, s, cfg)
            outs.append(o)
        jax.block_until_ready(state)
        wall = time.perf_counter() - t0
        sps = (n_scans - warmup) / wall
        poses = np.asarray([np.asarray(o.pose) for o in outs])
        ate = trajectory.ate_rmse(poses, gt_rel, align=False)
        print(f"{tag:22s}: {sps:6.1f} scans/s  ATE {ate:.3f} m  "
              f"({wall/(n_scans-warmup)*1e3:.2f} ms/scan)")

    run(odometry.odom_step, "while-loop solver")
    run(odometry.odom_step_uniform, "scheduled solver")


if __name__ == "__main__":
    main()
