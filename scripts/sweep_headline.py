#!/usr/bin/env python
"""Headline-tuning sweep on the real TPU.

Two parts, both env-gated so a run can focus on one:
  SWEEP_KNN=1    micro-bench the Pallas kNN at the surf operating point
                 (queries x map = 2048 x 65536) over k / tile_n / query_block
  SWEEP_MODES=.. comma list of match-source variants to replay on the
                 60-scan headline circuit, "src[:surf_cap[:surf_leaf]]", e.g.
                 "sharp,hybrid:4096,hybrid:2048:1.8,full_ds"

Goal (VERDICT r3 #2): one config with scans_per_sec >= 100 AND
ate_m <= 0.05 on the driver's 60-scan circuit.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.ops import pretreatment as _pre
from lis_slam_tpu.pipeline import odometry, trajectory

P = 65536


def load_circuit(cfg, n_scans):
    scans, gt = synthetic_jax.render_sequence_device(n_scans, seed=5)

    @jax.jit
    def prep(pts, val):
        ring, ok = _pre.compute_ring(pts, val, cfg.sensor.n_scan)
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
    jax.device_get(padded[-1].points[0])
    return padded, gt


def replay(cfg, padded, gt, warmup=5):
    state = odometry.init_state(cfg)
    outs = []
    for sin in padded[:warmup]:
        state, out = odometry.odom_step(state, sin, cfg)
        outs.append(out)
    jax.device_get(out.pose)
    t0 = time.perf_counter()
    for sin in padded[warmup:]:
        state, out = odometry.odom_step(state, sin, cfg)
        outs.append(out)
    jax.device_get(out.pose)
    sps = (len(padded) - warmup) / (time.perf_counter() - t0)
    poses = np.asarray([np.asarray(o.pose) for o in outs])
    gt_rel = trajectory.relative_to_first(gt[: len(padded)])
    ate = float(trajectory.ate_rmse(poses, gt_rel, align=False))
    return sps, ate


def sweep_knn():
    from lis_slam_tpu.ops import pallas_knn

    rng = np.random.default_rng(0)
    # surf-like geometry: queries clustered near origin, map = shell of a
    # city block (morton-ordered as the real map buffer is)
    ref = rng.uniform(-60, 60, (60000, 3)).astype(np.float32)
    ref = np.concatenate([ref, np.zeros((65536 - 60000, 3), np.float32)])
    mask = np.arange(65536) < 60000
    from lis_slam_tpu.ops import voxel as voxel_ops

    refj = jnp.asarray(ref)
    maskj = jnp.asarray(mask)
    key = jnp.where(maskj, voxel_ops._voxel_key_morton(refj, maskj, 1.0),
                    jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    refj = refj[order]
    maskj = maskj[order]
    q = jnp.asarray(rng.uniform(-40, 40, (2048, 3)).astype(np.float32))

    for k in (5, 6, 8, 10):
        for tile_n in (1024, 2048, 4096):
            for qb in (256, 512):
                try:
                    d, i, c = pallas_knn.knn_pallas(
                        q, refj, maskj, k=k, query_block=qb, tile_n=tile_n,
                        max_sq_dist=4.0)
                    jax.device_get(d[0, 0])
                    t0 = time.perf_counter()
                    n = 30
                    for t in range(n):
                        d, i, c = pallas_knn.knn_pallas(
                            q + jnp.float32(t) * 1e-4, refj, maskj, k=k,
                            query_block=qb, tile_n=tile_n, max_sq_dist=4.0)
                    jax.device_get(d[0, 0])
                    ms = (time.perf_counter() - t0) / n * 1e3
                    print(f"knn k={k:2d} tile_n={tile_n:4d} qb={qb:3d}: "
                          f"{ms:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"knn k={k} tile_n={tile_n} qb={qb}: FAIL {e}",
                          flush=True)


def main():
    n_scans = int(os.environ.get("SWEEP_SCANS", "60"))
    base = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))

    if int(os.environ.get("SWEEP_KNN", "0")):
        sweep_knn()

    modes = os.environ.get("SWEEP_MODES", "")
    if modes:
        padded, gt = load_circuit(base, n_scans)
        for spec in modes.split(","):
            spec = spec.strip()
            if not spec:
                continue
            parts = spec.split(":")
            src = parts[0]
            cap = (int(parts[1]) if len(parts) > 1
                   else base.matching.matched_surf_capacity)
            leaf = (float(parts[2]) if len(parts) > 2
                    else base.matching.matched_surf_leaf)
            cfg = base.replace(matching=dataclasses.replace(
                base.matching, match_source=src, matched_surf_capacity=cap,
                matched_surf_leaf=leaf))
            sps, ate = replay(cfg, padded, gt)
            print(f"mode={spec:16s}: {sps:7.2f} scans/s  ate={ate:.4f} m",
                  flush=True)


if __name__ == "__main__":
    main()
