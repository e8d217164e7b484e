#!/usr/bin/env python
"""Profile the bench.py full-SLAM plaza segment (loop-closing circuit) with
per-stage StageTimer means + per-scan wall times, to localize where the
full-system throughput goes. Usage:
    python scripts/profile_plaza.py [n_scans] [--cpu]
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

import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic as _syn
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry
from lis_slam_tpu.pipeline import slam as slam_mod


def main():
    n_sys = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))

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
    sys_scans, sys_labels = [], []
    for i in range(n_sys):
        key, sub = jax.random.split(key)
        pts, lbl, val = synthetic_jax.render_scan_device(
            plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
        bp, bl, bv = prep(pts, lbl, val)
        sys_scans.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        sys_labels.append(bl)
    labels_np = [np.asarray(sys_labels[i])[np.asarray(sys_scans[i].valid)]
                 for i in range(n_sys)]

    def run_slam(tag):
        system = slam_mod.SemanticSlam(cfg)
        system.process_scan(sys_scans[0], gt_labels=labels_np[0])
        t0 = time.perf_counter()
        per_scan = []
        for i in range(1, n_sys):
            ts = time.perf_counter()
            system.process_scan(
                sys_scans[i], gt_labels=labels_np[i], timestamp=i * 0.1)
            per_scan.append(time.perf_counter() - ts)
        system.flush_pipeline()
        jax.device_get(system.state.pose)
        wall = time.perf_counter() - t0
        sps = (n_sys - 1) / wall
        print(f"[{tag}] {sps:.2f} scans/s  wall={wall:.1f}s  "
              f"submaps={len(system.collector.submaps)} "
              f"loops={system._n_loop_factors + len(system.loops)}")
        print(system.timer.summary())
        ps = np.asarray(per_scan) * 1e3
        worst = np.argsort(ps)[-8:]
        print("  worst scans:", [(int(j) + 1, round(float(ps[j]), 1))
                                 for j in sorted(worst)])
        return system

    run_slam("warmup")
    run_slam("timed")


if __name__ == "__main__":
    main()
