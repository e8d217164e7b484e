#!/usr/bin/env python
"""Ablate the vmapped multi-sequence step (bench.py batched segment,
BASELINE config 5) to localize the per-lane cost: 8-lane batched replay
runs ~19.6 ms/lane vs ~9.6 ms single-sequence (r4 bench), i.e. the
cond-free uniform step costs 2x the conditional step. Candidate sinks:
the masked keyframe merge (multi-operand map sort EVERY scan), the
static 3-search kNN schedule, and the hybrid-mode full-surf voxel
downsample.

Usage: python scripts/sweep_batched.py [B] [--cpu]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as pre_ops
from lis_slam_tpu.parallel import batched as pb
from lis_slam_tpu.pipeline import odometry


def main():
    # flags must not reach the positional batch-size parse
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(pos[0]) if pos else 8
    # horizon: VERDICT r4 #8 asks for the cadence/ATE sweep on a >=100-scan
    # circuit (the r4 table used 24 scans; quantized keyframe timing
    # interacts with the aged-voxel window only at longer horizons)
    N = int(pos[1]) if len(pos) > 1 else 24
    P = 65536
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    scans, _gt = synthetic_jax.render_sequence_device(N, seed=5)

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
    stack = lambda sin: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), sin)
    bscans = [stack(s) for s in padded]
    jax.device_get(bscans[-1].points[0, 0])

    def run(tag, cfg, ablate_insert=False):
        saved = odometry._insert_keyframe_masked
        if ablate_insert:
            odometry._insert_keyframe_masked = (
                lambda state, fc, pose, is_kf, c: state)
        try:
            bstates = pb.batched_init_state(cfg, B)
            bstates, bout = pb.batched_odom_step(bstates, bscans[0], cfg)
            jax.device_get(bout.pose[0])
            t0 = time.perf_counter()
            for bs in bscans[1:]:
                bstates, bout = pb.batched_odom_step(bstates, bs, cfg)
            jax.device_get(bout.pose[0])
            wall = time.perf_counter() - t0
            n = len(bscans) - 1
            print(f"[{tag}] {B * n / wall:7.2f} agg scans/s   "
                  f"{wall / n * 1e3:7.2f} ms/step  "
                  f"{wall / n / B * 1e3:6.2f} ms/lane", flush=True)
        finally:
            odometry._insert_keyframe_masked = saved

    m = base.matching
    cfgs = [
        ("default (hybrid, iters8, refresh(2,5))", base, False),
        # host_threads is unused by the device step: it only forces a
        # distinct jit cache key so the monkeypatched insert retraces
        ("no-insert ablation", base.replace(
            runtime=dataclasses.replace(
                base.runtime, num_host_threads=3)), True),
        ("refresh(3,) — 2 kNN searches", base.replace(
            matching=dataclasses.replace(m, uniform_refresh=(3,))), False),
        ("refresh() — 1 kNN search", base.replace(
            matching=dataclasses.replace(m, uniform_refresh=())), False),
        ("sharp (no surf voxel-DS)", base.replace(
            matching=dataclasses.replace(
                m, match_source="sharp", matched_surf_capacity=4096)), False),
        ("iters5 refresh(2,)", base.replace(
            matching=dataclasses.replace(
                m, uniform_iters=5, uniform_refresh=(2,))), False),
    ]
    if "--kf-only" not in sys.argv:
        for tag, cfg, ablate in cfgs:
            run(tag, cfg, ablate)

    # ---- keyframe-merge cadence sweep (RuntimeConfig.batched_kf_every):
    # merge-free steps between host-cadenced merge steps; ATE of lane 0 vs
    # the render trajectory checks the quantized keyframe timing ----
    from lis_slam_tpu.pipeline import trajectory

    gt_rel = trajectory.relative_to_first(np.asarray(_gt[:len(bscans)]))
    sweeps = [] if "--refresh-only" in sys.argv else [
        (K, base) for K in (1, 2, 3, 4)]
    # on top of the merge cadence, fewer static kNN refreshes (each is
    # ~2.1 ms/lane); ATE decides whether the default can drop one
    for refresh in ((3,), (2,)):
        sweeps.append((4, base.replace(matching=dataclasses.replace(
            base.matching, uniform_refresh=refresh))))
    for K, kcfg in sweeps:
        allow = lambda i: i % K == 0
        rtag = getattr(kcfg.matching, "uniform_refresh", None)
        bstates = pb.batched_init_state(kcfg, B)
        dev_poses = []
        for i in range(2):
            bstates, bout = pb.batched_odom_step(
                bstates, bscans[i], kcfg, allow_kf=allow(i))
            dev_poses.append(bout.pose[0])
        jax.device_get(bout.pose[0])
        t0 = time.perf_counter()
        for i in range(2, len(bscans)):
            bstates, bout = pb.batched_odom_step(
                bstates, bscans[i], kcfg, allow_kf=allow(i))
            dev_poses.append(bout.pose[0])
        jax.device_get(bout.pose[0])
        wall = time.perf_counter() - t0
        n = len(bscans) - 2
        poses = np.asarray(jax.device_get(jnp.stack(dev_poses)))
        ate = trajectory.ate_rmse(poses, gt_rel[:len(poses)], align=False)
        print(f"[kf_every={K} refresh={rtag}] "
              f"{B * n / wall:7.2f} agg scans/s   "
              f"{wall / n / B * 1e3:6.2f} ms/lane   ate={ate:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
