#!/usr/bin/env python
"""Profile the full SemanticSlam pipeline on the real device: per-stage
wall-clock means (StageTimer) + total throughput. Usage:
    python scripts/profile_slam.py [n_scans]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.pipeline import odometry
from lis_slam_tpu.ops import pretreatment as _pre
import functools


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, gt = synthetic_jax.render_sequence_device(n, seed=5)
    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )

    @functools.partial(jax.jit)
    def prep(pts, lbl, val):
        ring, ok = _pre.compute_ring(pts, val, cfg.sensor.n_scan)
        keep = ok & (ring % cfg.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        row = jnp.concatenate([pts, lbl.astype(jnp.float32)[:, None]], 1)
        buf = jnp.zeros((P + 1, 5), jnp.float32).at[dest].set(row)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf[:, :4], buf[:, 4].astype(jnp.int32), jnp.arange(P) < cnt

    padded, padded_labels = [], []
    for pts, lbl, val in scans:
        bp, bl, bv = prep(pts, lbl, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        padded_labels.append(bl)
    jax.device_get(padded[-1].points[0])
    labels_np = [np.asarray(padded_labels[i])[np.asarray(padded[i].valid)]
                 for i in range(n)]

    from lis_slam_tpu.pipeline import slam as slam_mod

    def run():
        system = slam_mod.SemanticSlam(cfg)
        system.process_scan(padded[0], gt_labels=labels_np[0])
        t0 = time.perf_counter()
        for i in range(1, n):
            system.process_scan(padded[i], gt_labels=labels_np[i],
                                timestamp=i * 0.1)
        system.flush_pipeline()
        jax.device_get(system.state.pose)
        return (n - 1) / (time.perf_counter() - t0), system

    t0 = time.perf_counter()
    sps, system = run()  # warmup (compiles)
    print(f"warmup replay: {time.perf_counter()-t0:.1f}s  ({sps:.2f} sps)")
    sps, system = run()
    print(f"full SLAM: {sps:.2f} scans/s  n_submaps={len(system.collector.submaps)}"
          f" n_kf={len(system.keyframes)} loops={system._n_loop_factors}")
    for k, v in sorted(system.timer.stats.items()):
        print(f"  {k:16s} n={v.count:4d} mean={v.mean_ms:8.2f} ms "
              f"total={v.mean_ms*v.count/1000.0:7.2f} s")


if __name__ == "__main__":
    main()
