#!/usr/bin/env python
"""Device-time breakdown of the fused per-scan program on the plaza scans:
pure slam_step chain (no drains) vs plain odom_step, and the keyframe-branch
cost in isolation. Usage:
    python scripts/profile_fused.py [n_scans] [--cpu]
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


def make_plaza_scans(cfg, n_sys, P):
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
    scans, labels = [], []
    for i in range(n_sys):
        key, sub = jax.random.split(key)
        pts, lbl, val = synthetic_jax.render_scan_device(
            plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
        bp, bl, bv = prep(pts, lbl, val)
        scans.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        labels.append(bl)
    return scans, labels


def main():
    n_sys = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, labels = make_plaza_scans(cfg, n_sys, P)
    jax.device_get(scans[-1].points[0])
    print("valid points/scan:",
          int(jax.device_get(jnp.sum(scans[0].valid))))

    zeros_lab = jnp.zeros(P, jnp.int32)

    # ---- plain odom_step chain ----
    state = odometry.init_state(cfg)
    for s in scans[:5]:
        state, out = odometry.odom_step(state, s, cfg)
    jax.device_get(out.pose)
    t0 = time.perf_counter()
    for s in scans[5:]:
        state, out = odometry.odom_step(state, s, cfg)
    jax.device_get(out.pose)
    dt = time.perf_counter() - t0
    print(f"odom_step:        {1e3 * dt / (n_sys - 5):7.2f} ms/scan "
          f"({(n_sys - 5) / dt:.1f}/s)")

    # ---- fused slam_step chain, gt labels (what full-SLAM dispatches) ----
    def run_fused(tag):
        fst = slam_mod.FusedState(
            odom=odometry.init_state(cfg),
            sem=__import__(
                "lis_slam_tpu.pipeline.semantic_odometry",
                fromlist=["init_state"]).init_state(cfg),
            last_frontend=jnp.zeros(6, jnp.float32),
            last_refined=jnp.zeros(6, jnp.float32),
        )
        outs = None
        for s, l in zip(scans[:5], labels[:5]):
            fst, outs = slam_mod.slam_step(
                fst, s, l, None, cfg, "gt", None, None)
        jax.device_get(outs.pose)
        t0 = time.perf_counter()
        nkf = 0
        for s, l in zip(scans[5:], labels[5:]):
            fst, outs = slam_mod.slam_step(
                fst, s, l, None, cfg, "gt", None, None)
        jax.device_get(outs.pose)
        dt = time.perf_counter() - t0
        kfs = None
        print(f"{tag}: {1e3 * dt / (n_sys - 5):7.2f} ms/scan "
              f"({(n_sys - 5) / dt:.1f}/s)")

    run_fused("slam_step(gt)  ")
    run_fused("slam_step(gt) 2")

    # ---- slam_step with semantics off (lab_mode=none): kf branch still
    # computes descriptors but skips refine/classes ----
    def run_fused_none(tag):
        fst = slam_mod.FusedState(
            odom=odometry.init_state(cfg),
            sem=__import__(
                "lis_slam_tpu.pipeline.semantic_odometry",
                fromlist=["init_state"]).init_state(cfg),
            last_frontend=jnp.zeros(6, jnp.float32),
            last_refined=jnp.zeros(6, jnp.float32),
        )
        outs = None
        for s in scans[:5]:
            fst, outs = slam_mod.slam_step(
                fst, s, zeros_lab, None, cfg, "none", None, None)
        jax.device_get(outs.pose)
        t0 = time.perf_counter()
        for s in scans[5:]:
            fst, outs = slam_mod.slam_step(
                fst, s, zeros_lab, None, cfg, "none", None, None)
        jax.device_get(outs.pose)
        dt = time.perf_counter() - t0
        print(f"{tag}: {1e3 * dt / (n_sys - 5):7.2f} ms/scan "
              f"({(n_sys - 5) / dt:.1f}/s)")

    run_fused_none("slam_step(none)")


if __name__ == "__main__":
    main()
