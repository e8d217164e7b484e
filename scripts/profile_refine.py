#!/usr/bin/env python
"""Microbenchmark refine_step under different matched-surf leaves."""
import os
import sys
import time
import functools
import dataclasses

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.pipeline import odometry, semantic_odometry as semo
from lis_slam_tpu.ops import pretreatment as _pre


def timeit(name, fn, n=20):
    fn()
    jax.device_get(jax.tree_util.tree_leaves(fn())[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


def main():
    P = 65536
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, _ = synthetic_jax.render_sequence_device(3, seed=5)

    @jax.jit
    def prep(pts, lbl, val):
        ring, ok = _pre.compute_ring(pts, val, base.sensor.n_scan)
        keep = ok & (ring % base.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        row = jnp.concatenate([pts, lbl.astype(jnp.float32)[:, None]], 1)
        buf = jnp.zeros((P + 1, 5), jnp.float32).at[dest].set(row)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf[:, :4], buf[:, 4].astype(jnp.int32), jnp.arange(P) < cnt

    zero_imu = dict(
        imu_time=jnp.zeros(base.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((base.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(base.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
    bp, bl, bv = prep(*scans[0])
    scan = odometry.ScanInput(points=bp, valid=bv, **zero_imu)

    for leaf, cap in ((0.4, 16384), (0.8, 8192), (1.2, 4096)):
        cfg = base.replace(submap=dataclasses.replace(
            base.submap, refine_surf_leaf=leaf, matched_surf_capacity=cap))
        bss = jax.jit(functools.partial(semo.build_semantic_scan, cfg=cfg))
        sscan = bss(scan, bl)
        nq = int(np.asarray(sscan.surf_mask).sum())
        sem = semo.init_state(cfg)
        rs = jax.jit(functools.partial(semo.refine_step, cfg=cfg))
        sem2, _, _ = rs(sem, sscan, jnp.zeros(6))
        timeit(f"refine leaf={leaf} cap={cap} (nq={nq})",
               lambda: rs(sem2, sscan, jnp.zeros(6)))
        timeit(f"  build leaf={leaf}", lambda: bss(scan, bl))


if __name__ == "__main__":
    main()
