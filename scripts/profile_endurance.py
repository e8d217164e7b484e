#!/usr/bin/env python
"""Device-cost microbench of the programs that GROW with endurance laps:
loop candidate scoring, loop-ICP verification, submap-to-submap
registration (geometric + semantic), pose-graph LM at endurance buckets,
and the fused step's keyframe vs non-keyframe cost.

These all ride the one TPU stream that also runs the 10 Hz per-scan chain
(the reference runs them on separate CPU threads), so their per-call device
cost bounds sustainable full-SLAM throughput.
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
from lis_slam_tpu.loop import epsc
from lis_slam_tpu.pipeline import slam as slam_mod


def timeit(name, fn, n=10):
    fn(0)
    jax.device_get(jax.tree_util.tree_leaves(fn(0))[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(1 + i)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- loop_score_batch at max_candidates ----
    C = cfg.loop.max_candidates
    R, S = cfg.loop.rings, cfg.loop.sectors
    descs = jnp.asarray(rng.random((C, R, S), np.float32))
    sigs = jnp.asarray(rng.random((C, epsc._SIG_SECTORS, 4), np.float32))
    cur_sig = jnp.asarray(rng.random((epsc._SIG_SECTORS, 4), np.float32))
    yaws = jnp.zeros(C, jnp.float32)
    ns = 8192
    clouds = epsc.CloudRefs(
        sem_xyz=jnp.asarray(rng.random((ns, 3), np.float32) * 40 - 20),
        sem_intensity=jnp.ones(ns),
        sem_label=jnp.zeros(ns, jnp.int32),
        sem_valid=jnp.ones(ns, bool),
        corner_xyz=jnp.asarray(rng.random((2048, 3), np.float32) * 40 - 20),
        corner_valid=jnp.ones(2048, bool),
        surf_xyz=jnp.asarray(rng.random((2048, 3), np.float32) * 40 - 20),
        surf_valid=jnp.ones(2048, bool),
    )

    def score(i):
        return epsc.loop_score_batch(
            descs + i * 1e-4, sigs, cur_sig, yaws, clouds, cfg.loop)

    timeit(f"loop_score_batch (C={C})", score)

    # ---- verify ICP: kf surf (8192) vs submap class cloud (5*32768) ----
    kq = 32768  # keyframe surf-cloud capacity (odometry.preprocess output)
    kf_surf = jnp.asarray(rng.random((kq, 3), np.float32) * 40 - 20)
    kf_mask = jnp.ones(kq, bool)
    tgt_n = 5 * cfg.submap.class_capacity
    tgt = jnp.asarray(rng.random((tgt_n, 3), np.float32) * 60 - 30)
    tgt_m = jnp.ones(tgt_n, bool)

    def verify(i):
        r = slam_mod._verify_loop_device(
            kf_surf + i * 1e-4, kf_mask, tgt, tgt_m, jnp.eye(4),
            max_iterations=cfg.loop.icp_max_iterations,
            max_correspond_dist=cfg.loop.verify_max_correspond_dist,
            cell_size=cfg.loop.verify_hash_cell_size,
            table_size=cfg.loop.verify_hash_table_size,
            src_leaf=cfg.loop.verify_source_leaf,
            src_capacity=cfg.loop.verify_source_capacity,
            tgt_leaf=cfg.loop.verify_target_leaf,
            tgt_capacity=cfg.loop.verify_target_capacity,
            refresh_iters=tuple(cfg.loop.verify_refresh_iters))
        return r.transform

    timeit(f"verify ICP (tgt={tgt_n})", verify)

    # ---- submap register (semantic) at class capacity ----
    K = cfg.submap.class_capacity
    cls_xyz = jnp.asarray(rng.random((5, K, 3), np.float32) * 60 - 30)
    cls_m = jnp.ones((5, K), bool)
    cls_w = jnp.ones((5, K), jnp.float32)
    lo = jnp.asarray([-30, -30, -5], jnp.float32)
    hi = jnp.asarray([30, 30, 25], jnp.float32)

    def reg_sem(i):
        return slam_mod._register_submaps_sem(
            cls_xyz + i * 1e-4, cls_m, cls_xyz, cls_m, cls_w,
            jnp.eye(4), lo, hi, cfg)

    timeit("register_submaps_sem", reg_sem)

    # ---- pose-graph LM at endurance bucket (128 nodes / 256 edges) ----
    from lis_slam_tpu.graph import pose_graph as pg_mod

    g = pg_mod.GraphBuilder(cfg.graph, max_nodes=cfg.submap.max_submaps,
                            max_edges=cfg.submap.max_submaps * 4,
                            max_priors=cfg.submap.max_submaps)
    for k in range(100):
        T = np.eye(4)
        T[0, 3] = 0.6 * k
        g.add_node(T)
        if k:
            Z = np.eye(4)
            Z[0, 3] = 0.6
            g.add_odom_edge(k - 1, k, Z)
        if k % 8 == 7:
            g.add_loop_edge(max(0, k - 7), k, np.eye(4), 1.0)

    def lm(i):
        nw, dev = g.optimize_async()
        return dev

    timeit("graph LM optimize (100n/111e bucket)", lm)

    # ---- fused step: kf vs non-kf (real plaza-like scan) ----
    from lis_slam_tpu.io import synthetic_jax
    from lis_slam_tpu.ops import pretreatment as _pre
    from lis_slam_tpu.pipeline import odometry

    scans, _gt = synthetic_jax.render_sequence_device(8, seed=5)

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

    sys_ = slam_mod.SemanticSlam(cfg)
    for j in range(4):
        sys_.process_scan(sins[j], gt_labels=np.asarray(labs[j])[
            np.asarray(sins[j].valid)], timestamp=j * 0.1)
    fstate = sys_.fstate
    lab0 = jnp.zeros(P, jnp.int32)

    def fused(i):
        # slam_step donates fstate: feed it a fresh copy every call
        st = jax.tree_util.tree_map(jnp.copy, fstate)
        _st, out = slam_mod.slam_step(
            st, sins[i % 8], lab0, None, cfg, "gt", None, None)
        return out.pose

    timeit("fused slam_step (steady, mixed kf, +state copy)", fused)


if __name__ == "__main__":
    main()
