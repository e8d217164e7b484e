#!/usr/bin/env python
"""Profile the accuracy-mode (full_ds) odometry step and variants on the
real device: total step time + ATE over a short circuit for
  - sharp (production)
  - full_ds (reference-faithful corner+surf DS)
  - hybrid: sharp corners + voxel-DS full surf (candidate single config)
"""
import os
import sys
import time
import dataclasses
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.pipeline import odometry, trajectory
from lis_slam_tpu.ops import pretreatment as _pre


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    P = 65536
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, gt = synthetic_jax.render_sequence_device(n, seed=5)
    zero_imu = dict(
        imu_time=jnp.zeros(base.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((base.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(base.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )

    @jax.jit
    def prep(pts, val):
        ring, ok = _pre.compute_ring(pts, val, base.sensor.n_scan)
        keep = ok & (ring % base.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        buf = jnp.zeros((P + 1, 4), jnp.float32).at[dest].set(pts)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf, jnp.arange(P) < cnt

    padded = []
    for pts, _l, val in scans:
        bp, bv = prep(pts, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
    jax.device_get(padded[-1].points[0])
    gt_rel = trajectory.relative_to_first(gt[:n])

    def run(cfg, name):
        state = odometry.init_state(cfg)
        outs = []
        for s in padded[:5]:
            state, o = odometry.odom_step(state, s, cfg)
            outs.append(o)
        jax.device_get(o.pose)
        t0 = time.perf_counter()
        for s in padded[5:]:
            state, o = odometry.odom_step(state, s, cfg)
            outs.append(o)
        jax.device_get(o.pose)
        sps = (n - 5) / (time.perf_counter() - t0)
        poses = np.asarray([np.asarray(o.pose) for o in outs])
        ate = trajectory.ate_rmse(poses, gt_rel, align=False)
        print(f"{name:34s} {sps:7.2f} scans/s  ATE {ate:.4f} m")

    nogate = dataclasses.replace(base.keyframe, require_convergence=False)
    run(base, "sharp gate-parity")
    run(base.replace(keyframe=nogate), "sharp motion-only gate")
    acc = base.replace(matching=dataclasses.replace(
        base.matching, match_source="full_ds"))
    run(acc, "full_ds gate-parity")
    run(acc.replace(keyframe=nogate), "full_ds motion-only gate")
    hyb = base.replace(matching=dataclasses.replace(
        base.matching, match_source="hybrid"))
    run(hyb, "hybrid gate-parity")
    run(hyb.replace(keyframe=nogate), "hybrid motion-only gate")


if __name__ == "__main__":
    main()
