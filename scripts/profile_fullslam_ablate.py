#!/usr/bin/env python
"""Ablate the full-SLAM plaza replay to localize system-level device cost:
  base        — gt labels + loop closure (the bench full_slam section)
  loop-off    — host never dispatches gate/score/verify (same device progs)
  labels-off  — lab_mode="none": kf branch skips semantic build + refine
                (descriptors still computed; submaps geometric)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses
import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic as _syn
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry, slam as slam_mod


def main():
    n_sys = 100
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

    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
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
        boxes=np.asarray(boxes), box_labels=np.asarray(blabels, np.int32),
        poles=np.asarray(poles)))
    lap_speed = 2.0 * np.pi * 10.0 / (n_sys * 0.1)
    gt_sys = _syn.circular_trajectory(n_sys + 1, radius=10.0, speed=lap_speed)
    key = jax.random.PRNGKey(11)
    sys_scans, sys_labels = [], []
    for i in range(n_sys):
        key, sub, _s2 = jax.random.split(key, 3)
        pts, lbl, val = synthetic_jax.render_scan_device(
            plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
        bp, bl, bv = prep(pts, lbl, val)
        sys_scans.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        sys_labels.append(bl)
    labels_np = [np.asarray(sys_labels[i])[np.asarray(sys_scans[i].valid)]
                 for i in range(n_sys)]

    def run(tag, use_cfg, labels):
        def once():
            system = slam_mod.SemanticSlam(use_cfg)
            system.process_scan(
                sys_scans[0],
                gt_labels=labels_np[0] if labels else None)
            t0 = time.perf_counter()
            for i in range(1, n_sys):
                system.process_scan(
                    sys_scans[i],
                    gt_labels=labels_np[i] if labels else None,
                    timestamp=i * 0.1)
            system.flush_pipeline()
            jax.device_get(system.state.pose)
            return (n_sys - 1) / (time.perf_counter() - t0), system

        once()
        sps, system = once()
        kf = len(system.keyframes)
        print(f"[{tag:12s}] {sps:6.2f} scans/s  kf={kf} "
              f"submaps={len(system.collector.submaps)} "
              f"loops={system._n_loop_factors}", flush=True)

    run("base", cfg, True)
    run("loop-off", cfg.replace(
        loop=dataclasses.replace(cfg.loop, enabled=False)), True)
    run("labels-off", cfg, False)


if __name__ == "__main__":
    main()
