#!/usr/bin/env python
"""Diagnose the plaza loop-closure chain: gate hits -> score dispatches ->
accepted candidates -> verify dispatches -> fitness gate -> factors.

Replicates bench.py's full-SLAM section (same world/lap/config so compiled
programs come from the persistent cache) and prints per-stage counters.
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
from lis_slam_tpu.loop import epsc
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry, slam as slam_mod, trajectory


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
        key, sub, sub2 = jax.random.split(key, 3)
        pts, lbl, val = synthetic_jax.render_scan_device(
            plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
        bp, bl, bv = prep(pts, lbl, val)
        sys_scans.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        sys_labels.append(bl)
    labels_np = [np.asarray(sys_labels[i])[np.asarray(sys_scans[i].valid)]
                 for i in range(n_sys)]

    # ---- instrument the loop chain ----
    counters = dict(gate=0, gate_hits=0, score=0, cand=0, verify=0,
                    fit_pass=0, fit_fail=0)
    fits = []

    orig_gate = epsc.LoopDetector.gate

    def gate(self, pose_xyyaw):
        ids = orig_gate(self, pose_xyyaw)
        counters["gate"] += 1
        if len(ids):
            counters["gate_hits"] += 1
            print(f"  gate hit: kf_db_size={len(self.poses)} ids={ids[:8]}")
        return ids

    epsc.LoopDetector.gate = gate

    orig_r2c = epsc.LoopDetector.result_to_candidate

    def r2c(ids, fetched):
        c = orig_r2c(ids, fetched)
        counters["score"] += 1
        print(f"  score consumed: cand={c}")
        if c is not None:
            counters["cand"] += 1
        return c

    epsc.LoopDetector.result_to_candidate = staticmethod(r2c)

    orig_dispatch = slam_mod.SemanticSlam._dispatch_verify

    def dispatch(self, kf_i, cand):
        counters["verify"] += 1
        print(f"  verify dispatch: kf={kf_i} cand={cand}")
        return orig_dispatch(self, kf_i, cand)

    slam_mod.SemanticSlam._dispatch_verify = dispatch

    system = slam_mod.SemanticSlam(cfg)
    system.process_scan(sys_scans[0], gt_labels=labels_np[0])
    t0 = time.perf_counter()
    for i in range(1, n_sys):
        system.process_scan(sys_scans[i], gt_labels=labels_np[i],
                            timestamp=i * 0.1)
    system.flush_pipeline()
    jax.device_get(system.state.pose)
    print(f"replay wall {time.perf_counter() - t0:.1f}s")
    print(f"verified loops pre-finish: {len(system.loops)}")
    res = system.finish()
    gt_rel = trajectory.relative_to_first(gt_sys[:n_sys])
    print(f"counters: {counters}")
    print(f"n_loops(factors)={res.n_loops} submaps={res.n_submaps} "
          f"kf={len(system.keyframes)}")
    print(f"ate={trajectory.ate_rmse(res.poses, gt_rel, align=True):.4f} "
          f"raw={trajectory.ate_rmse(res.raw_poses, gt_rel, align=True):.4f}")


if __name__ == "__main__":
    main()
