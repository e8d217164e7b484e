#!/usr/bin/env python
"""Per-stage timing of the odometry step on the real device.

Breaks the 1/scans_per_sec budget into: preprocess (pretreat+project+
features), scan-to-map GN, keyframe merge, and the fused full step.
Run: python scripts/profile_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as pre_ops
from lis_slam_tpu.pipeline import odometry


def _sync(out):
    # block_until_ready does NOT block through the axon tunnel; a small
    # device_get is the reliable sync
    jax.device_get(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, args_list, n=20, warmup=3):
    for a in args_list[:warmup]:
        _sync(fn(*a))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[warmup + (i % (len(args_list) - warmup))])
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, gt = synthetic_jax.render_sequence_device(16, seed=5)

    @jax.jit
    def prep(pts, val):
        ring, ok = pre_ops.compute_ring(pts, val, cfg.sensor.n_scan)
        keep = ok & (ring % cfg.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        buf = jnp.zeros((P + 1, 4), jnp.float32).at[dest].set(pts)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf, jnp.arange(P) < cnt

    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )
    padded = []
    for pts, _lbl, val in scans:
        bp, bv = prep(pts, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
    jax.block_until_ready(padded[-1].points)

    # ---- stage: full preprocess ----
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def preprocess(scan):
        return odometry.preprocess(scan, cfg)

    ms = timeit(lambda s: preprocess(s), [(s,) for s in padded], n=16)
    print(f"preprocess total      : {ms:7.2f} ms")

    # sub-stage: pretreat only
    @jax.jit
    def s_pre(scan):
        return pre_ops.pretreat(scan.points, scan.valid, cfg.sensor)

    ms = timeit(lambda s: s_pre(s), [(s,) for s in padded], n=16)
    print(f"  pretreat            : {ms:7.2f} ms")

    from lis_slam_tpu.ops import features as feat_ops
    from lis_slam_tpu.ops import projection

    pres = [s_pre(s) for s in padded]
    jax.block_until_ready(pres[-1].points)

    @jax.jit
    def s_proj(pre):
        _img, ext = projection.project_and_extract(
            pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time,
            pre.valid, cfg.sensor, want_image=False)
        return ext

    ms = timeit(lambda p: s_proj(p), [(p,) for p in pres], n=16)
    print(f"  project+extract     : {ms:7.2f} ms")

    exts = [s_proj(p) for p in pres]
    jax.block_until_ready(exts[-1].xyz)

    @jax.jit
    def s_feat(ext):
        return feat_ops.extract_features(ext, cfg.feature, greedy=False)

    ms = timeit(lambda e: s_feat(e), [(e,) for e in exts], n=16)
    print(f"  features            : {ms:7.2f} ms")

    # ---- run some real steps to get a converged state ----
    state = odometry.init_state(cfg)
    fcs = [preprocess(s) for s in padded]
    for s in padded:
        state, out = odometry.odom_step_nodonate(state, s, cfg)
    jax.block_until_ready(state)

    # ---- stage: scan-to-map GN on the converged map ----
    from lis_slam_tpu.ops import scan_match

    @jax.jit
    def s_gn(st, fc, pose):
        return scan_match.scan_to_map(
            pose, fc.sharp_corner_xyz, fc.sharp_corner_mask,
            fc.sharp_surf_xyz, fc.sharp_surf_mask,
            st.map_corner, st.map_corner_mask,
            st.map_surf, st.map_surf_mask,
            cfg.matching, cfg.matching.max_iterations_frontend)

    args = [(state, fc, state.pose) for fc in fcs]
    ms = timeit(s_gn, args, n=16)
    print(f"scan-to-map GN        : {ms:7.2f} ms")

    @jax.jit
    def s_gn_sched(st, fc, pose):
        return scan_match.scan_to_map_scheduled(
            pose, fc.sharp_corner_xyz, fc.sharp_corner_mask,
            fc.sharp_surf_xyz, fc.sharp_surf_mask,
            st.map_corner, st.map_corner_mask,
            st.map_surf, st.map_surf_mask,
            cfg.matching, cfg.matching.uniform_iters,
            cfg.matching.uniform_refresh)

    ms = timeit(s_gn_sched, args, n=16)
    print(f"scan-to-map scheduled : {ms:7.2f} ms")

    # ---- stage: keyframe merge ----
    @jax.jit
    def s_merge(st, fc, pose):
        return odometry._insert_keyframe(st, fc, pose, cfg)

    ms = timeit(s_merge, args, n=16)
    print(f"keyframe merge        : {ms:7.2f} ms")

    # ---- fused full step ----
    sts = [state]
    outs_args = []
    for s in padded:
        st2, _ = odometry.odom_step_nodonate(sts[-1], s, cfg)
        sts.append(st2)
        outs_args.append((st2, s))
    jax.block_until_ready(sts[-1].pose)
    ms = timeit(lambda st, s: odometry.odom_step_nodonate(st, s, cfg), outs_args, n=16)
    print(f"full odom_step        : {ms:7.2f} ms -> {1000.0/ms:6.1f} scans/s")


if __name__ == "__main__":
    main()
