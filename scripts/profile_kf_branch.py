#!/usr/bin/env python
"""Microbenchmark the keyframe-branch components of the fused SLAM step on
the real device: build_semantic_scan, refine_step, compute_descriptors,
and the front-end step for comparison."""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.pipeline import odometry, semantic_odometry as semo
from lis_slam_tpu.loop import epsc
from lis_slam_tpu.ops import pretreatment as _pre


def timeit(name, fn, n=20, arity=1):
    """fn(i) must VARY its device inputs with i: the tunnel relay serves
    repeated identical executions from a cache, which fakes the timing."""
    fn(0)  # compile
    jax.device_get(jax.tree_util.tree_leaves(fn(0))[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(1 + i)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, gt = synthetic_jax.render_sequence_device(8, seed=5)

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
    sins, labs = [], []
    for pts, lbl, val in scans:
        bp, bl, bv = prep(pts, lbl, val)
        sins.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        labs.append(bl)
    nsc = len(sins)
    scan, labels = sins[0], labs[0]

    # front-end step (for scale)
    state = odometry.init_state(cfg)
    step = functools.partial(odometry.odom_step_nodonate, cfg=cfg)
    for s in sins[:4]:
        state, _ = step(state, s)
    timeit("odom_step (non-kf steady)", lambda i: step(state, sins[i % nsc])[1])

    # build_semantic_scan
    bss = jax.jit(functools.partial(semo.build_semantic_scan, cfg=cfg))
    timeit("build_semantic_scan", lambda i: bss(sins[i % nsc], labs[i % nsc]))
    sscans = [bss(sins[j], labs[j]) for j in range(nsc)]
    sscan = sscans[0]

    # refine_step
    sem = semo.init_state(cfg)
    rs = jax.jit(functools.partial(semo.refine_step, cfg=cfg))
    sem2, _, _ = rs(sem, sscan, jnp.zeros(6))
    timeit("refine_step (warm map)",
           lambda i: rs(sem2, sscans[i % nsc], jnp.zeros(6)))

    # descriptors
    fcs = [odometry.preprocess(s, cfg) for s in sins]
    lab_surf = jnp.zeros(fcs[0].surf_xyz.shape[0], jnp.int32)
    cd = jax.jit(functools.partial(epsc.compute_descriptors, cfg=cfg.loop))

    def run_cd(i):
        fc = fcs[i % nsc]
        return cd(fc.surf_xyz, fc.surf_intensity, lab_surf, fc.surf_mask,
                  fc.sharp_corner_xyz, fc.sharp_corner_mask,
                  fc.sharp_surf_xyz, fc.sharp_surf_mask)

    timeit("compute_descriptors", run_cd)


if __name__ == "__main__":
    main()
