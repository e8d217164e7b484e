#!/usr/bin/env python
"""Sweep the deferred-pipeline drain cadence (runtime.drain_every) on the
bench full-SLAM plaza segment, to find where the tunnel-RTT amortization
saturates. The drain stage dominates full-SLAM wall time (r4 bench:
2350 ms of ~3000 ms total over 100 scans); each drain is ONE blocking
device_get, so its cost = un-hidden device compute + one tunnel
round-trip. Larger windows amortize the RTT but delay keyframe
bookkeeping (loop/verify results land whole windows later).

Usage: python scripts/sweep_drain.py [n_scans] [--cpu]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic as _syn
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry
from lis_slam_tpu.pipeline import slam as slam_mod
from lis_slam_tpu.pipeline.trajectory import ate_rmse


def build_scans(cfg, n_sys):
    P = cfg.sensor.max_raw_points

    @jax.jit
    def prep(pts, lbl, val):
        ring, ok = _pre.compute_ring(pts, val, cfg.sensor.n_scan)
        keep = ok & (ring % cfg.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        row = jnp.concatenate([pts, lbl.astype(jnp.float32)[:, None]], 1)
        buf = jnp.zeros((P + 1, 5), jnp.float32).at[dest].set(row)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf[:, :4], buf[:, 4].astype(jnp.int32), jnp.arange(P) < cnt

    rng = np.random.default_rng(9)
    boxes, blabels, poles = [], [], []
    for k in range(14):
        ang = 2 * np.pi * k / 14
        cx, cy = 30.0 * np.cos(ang), 10.0 + 30.0 * np.sin(ang)
        w, d, h = rng.uniform(6, 10), rng.uniform(6, 10), rng.uniform(5, 15)
        boxes.append([cx - w / 2, cy - d / 2, 0, cx + w / 2, cy + d / 2, h])
        blabels.append(_syn.LBL_BUILDING)
    for k in range(24):
        ang = 2 * np.pi * k / 24 + 0.1
        r = rng.uniform(17, 22)
        poles.append([r * np.cos(ang), 10.0 + r * np.sin(ang),
                      rng.uniform(0.1, 0.2), rng.uniform(3, 7)])
    plaza = synthetic_jax.to_device_world(_syn.World(
        boxes=np.asarray(boxes),
        box_labels=np.asarray(blabels, np.int32),
        poles=np.asarray(poles)))
    gt_sys = _syn.circular_trajectory(n_sys + 1, radius=10.0, speed=6.3)
    key = jax.random.PRNGKey(11)
    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
    sys_scans, labels_np = [], []
    for i in range(n_sys):
        key, sub = jax.random.split(key)
        pts, lbl, val = synthetic_jax.render_scan_device(
            plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
        bp, bl, bv = prep(pts, lbl, val)
        sys_scans.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        labels_np.append(np.asarray(bl)[np.asarray(bv)])
    return sys_scans, labels_np, gt_sys


def main():
    n_sys = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=65536))
    sys_scans, labels_np, gt_sys = build_scans(base, n_sys)

    for de in (6, 12, 25, 50):
        cfg = base.replace(runtime=dataclasses.replace(
            base.runtime, drain_every=de))

        def run(tag):
            system = slam_mod.SemanticSlam(cfg)
            system.process_scan(sys_scans[0], gt_labels=labels_np[0])
            t0 = time.perf_counter()
            for i in range(1, n_sys):
                system.process_scan(
                    sys_scans[i], gt_labels=labels_np[i], timestamp=i * 0.1)
            system.flush_pipeline()
            jax.device_get(system.state.pose)
            wall = time.perf_counter() - t0
            sps = (n_sys - 1) / wall
            poses = np.stack(system.scan_poses)
            ate = ate_rmse(poses, gt_sys[:len(poses)])
            print(f"[drain_every={de} {tag}] {sps:.2f} scans/s "
                  f"submaps={len(system.collector.submaps)} "
                  f"loops={system._n_loop_factors + len(system.loops)} "
                  f"ate={ate:.4f}", flush=True)
            if tag == "timed":
                print(system.timer.summary(), flush=True)

        run("warmup")
        run("timed")


if __name__ == "__main__":
    main()
