#!/usr/bin/env python
"""scan_to_map GN backend timing: XLA op-by-op vs fused Pallas iteration
kernel, on a realistic HDL-64 state (converged 20-keyframe map, hybrid
matched clouds). Run: python scripts/profile_gn_backend.py [--cpu]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as pre_ops
from lis_slam_tpu.ops import scan_match
from lis_slam_tpu.pipeline import odometry


def timeit(fn, args_list, n=20, warmup=2):
    def sync(out):
        jax.device_get(jax.tree_util.tree_leaves(out)[0])

    for a in args_list[:warmup]:
        sync(fn(*a))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[warmup + (i % (len(args_list) - warmup))])
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    P = 65536
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, _gt = synthetic_jax.render_sequence_device(16, seed=5)

    @jax.jit
    def prep(pts, val):
        ring, ok = pre_ops.compute_ring(pts, val, base.sensor.n_scan)
        keep = ok & (ring % base.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        buf = jnp.zeros((P + 1, 4), jnp.float32).at[dest].set(pts)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf, jnp.arange(P) < cnt

    zero_imu = dict(
        imu_time=jnp.zeros(base.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((base.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(base.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
    padded = []
    for pts, _lbl, val in scans:
        bp, bv = prep(pts, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))

    for backend in ("xla", "pallas"):
        cfg = base.replace(matching=dataclasses.replace(
            base.matching, gn_backend=backend))
        state = odometry.init_state(cfg)
        for s in padded:
            state, out = odometry.odom_step_nodonate(state, s, cfg)
        jax.device_get(out.pose)

        fcs = [odometry.preprocess(s, cfg) for s in padded]

        import functools

        @functools.partial(jax.jit, static_argnames=())
        def s_gn(st, fc, pose, cfg=cfg):
            from lis_slam_tpu.ops import voxel
            ms_xyz, ms_mask, _ = voxel.voxel_downsample(
                fc.surf_xyz, fc.surf_mask, cfg.matching.matched_surf_leaf,
                cfg.matching.matched_surf_capacity)
            return scan_match.scan_to_map(
                pose, fc.sharp_corner_xyz, fc.sharp_corner_mask,
                ms_xyz, ms_mask,
                st.map_corner, st.map_corner_mask,
                st.map_surf, st.map_surf_mask,
                cfg.matching, cfg.matching.max_iterations_frontend)

        args = [(state, fc, state.pose) for fc in fcs]
        ms = timeit(s_gn, args, n=20)
        print(f"[{backend:6s}] scan-to-map GN (hybrid clouds): {ms:7.2f} ms",
              flush=True)

        # full step
        sts, step_args = [state], []
        for s in padded:
            st2, _ = odometry.odom_step_nodonate(sts[-1], s, cfg)
            sts.append(st2)
            step_args.append((st2, s))
        jax.device_get(sts[-1].pose)
        ms = timeit(
            lambda st, s, cfg=cfg: odometry.odom_step_nodonate(st, s, cfg),
            step_args, n=20)
        print(f"[{backend:6s}] full odom_step                : {ms:7.2f} ms "
              f"-> {1000.0 / ms:6.1f} scans/s", flush=True)


if __name__ == "__main__":
    main()
