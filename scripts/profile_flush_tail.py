#!/usr/bin/env python
"""Break down the endurance termination tail: the round-5 full-bench run
measured ~10.8 s between the last scan's dispatch and flush_pipeline()
returning (1000 scans: laps sum 28.1 s but end_wall 38.9 s). Runs a
3-lap replay, then times every _drain() iteration of the flush with the
pending-queue composition printed per iteration.

Usage: python scripts/profile_flush_tail.py [laps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic as _syn
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry, slam as slam_mod
from lis_slam_tpu.utils import se3_np as _se3np


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    laps = int(pos[0]) if pos else 3
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

    def drift_hook(pose6, idx):
        th = 3e-4 * idx
        c, s = np.cos(th), np.sin(th)
        Td = np.eye(4)
        Td[:2, :2] = [[c, -s], [s, c]]
        return _se3np.matrix_to_pose(Td @ _se3np.pose_to_matrix(pose6))

    # rep 0 = warmup/compile; rep 1 = manual (per-iteration optimize, the
    # pre-fix behavior); rep 2 = flush_pipeline (one deferred final solve)
    for rep in range(3):
        manual = rep == 1
        system = slam_mod.SemanticSlam(cfg, pose_hook=drift_hook)
        n_end = laps * n_sys
        t0 = t_lap = time.perf_counter()
        for k in range(n_end):
            system.process_scan(sys_scans[k % n_sys],
                                gt_labels=labels_np[k % n_sys],
                                timestamp=k * 0.1)
            if (k + 1) % n_sys == 0:
                now = time.perf_counter()
                if rep:
                    print(f"lap {(k + 1) // n_sys}: {now - t_lap:6.2f} s",
                          flush=True)
                t_lap = now
        tf0 = time.perf_counter()
        if manual:
            # pre-round-5-fix behavior: per-iteration optimize dispatch
            # (flush_pipeline now defers to ONE final solve)
            it = 0
            while (system._pending or system._inflight is not None
                   or system._pending_loop or system._pending_verify
                   or system._pending_submap
                   or system._pending_opt is not None
                   or system._pending_bbox or system._to_register):
                comp = (
                    f"pend={len(system._pending)} "
                    f"infl={'y' if system._inflight is not None else 'n'} "
                    f"loop={len(system._pending_loop)} "
                    f"verify={len(system._pending_verify)} "
                    f"sub={len(system._pending_submap)} "
                    f"opt={'y' if system._pending_opt is not None else 'n'} "
                    f"bbox={len(system._pending_bbox)} "
                    f"toreg={len(system._to_register)}")
                t1 = time.perf_counter()
                system._drain()
                dt = time.perf_counter() - t1
                if rep:
                    print(f"  flush it{it:2d} {dt * 1e3:8.1f} ms   {comp}",
                          flush=True)
                it += 1
        else:
            system.flush_pipeline()
        jax.device_get(system.state.pose)
        tend = time.perf_counter()
        if rep:
            mode = "manual(old)" if manual else "flush_pipeline(new)"
            print(f"[{mode}] flush total: {tend - tf0:6.2f} s   "
                  f"run total: {tend - t0:6.2f} s   "
                  f"loops={system._n_loop_factors}", flush=True)
            tfin = time.perf_counter()
            res = system.finish()
            print(f"[{mode}] finish(): {time.perf_counter() - tfin:6.2f} s  "
                  f"submaps={res.n_submaps}", flush=True)


if __name__ == "__main__":
    main()
