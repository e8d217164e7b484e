#!/usr/bin/env python
"""Benchmark: KITTI-HDL-64-style odometry replay throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "scans_per_sec", "value": N, "unit": "scans/s",
     "vs_baseline": N / 10.0}

Baseline: the C++ reference is designed for 10 Hz real-time replay
(scanPeriod = 0.1 s, see BASELINE.md); vs_baseline is the speedup over that
design point. The rebuild target is > 100 scans/s (BASELINE.json).

The sequence is a synthetic HDL-64 city circuit (no KITTI data in this
environment — zero egress); scan shape/density matches the KITTI operating
point (64 x 1800, max range 70 m, downsampleRate 2).
"""

import json
import os
import sys
import time

import numpy as np

# full per-scan pipeline on the real device (do NOT force CPU here)
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

# TensorRT-engine-serialization parity (netTensorRT.cpp:571-586): persist
# compiled executables so warm benches skip the minutes-long tunnel compiles
enable_compilation_cache()

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.io import synthetic_jax
from lis_slam_tpu.pipeline import odometry, trajectory


def main():
    n_scans = int(os.environ.get("BENCH_SCANS", "60"))
    warmup = 5
    # global wall budget: each extra stage compiles its own program (first
    # compile ~2-4 min through the remote relay); skip remaining extras
    # rather than risk the driver's timeout on the ONE required JSON line
    t_start = time.perf_counter()
    # 2600: round 5 added the endurance + endurance-infer sections (~4 min
    # on top of the r4 layout, which fit in 2000)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2600"))

    def budget_left():
        return (time.perf_counter() - t_start) < budget_s
    # The data loader (native C++ in production, device prep here) drops the
    # rows that downsampleRate=2 discards anyway and range-gates, so the
    # timed pipeline sees a 64k-point buffer instead of 115k — same policy
    # as the reference's CPU pretreatment stage.
    P = 65536
    cfg = SlamConfig().replace(sensor=SensorConfig(max_raw_points=P))

    scans, gt = synthetic_jax.render_sequence_device(n_scans, seed=5)
    zero_imu = dict(
        imu_time=jnp.zeros(cfg.imu.max_imu_per_scan),
        imu_gyro=jnp.zeros((cfg.imu.max_imu_per_scan, 3)),
        imu_valid=jnp.zeros(cfg.imu.max_imu_per_scan, bool),
        scan_start=jnp.float32(0.0),
    )

    from lis_slam_tpu.ops import pretreatment as _pre
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def prep(pts, lbl, val):
        ring, ok = _pre.compute_ring(pts, val, cfg.sensor.n_scan)
        keep = ok & (ring % cfg.sensor.downsample_rate == 0)
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep & (pos < P), pos, P)
        row = jnp.concatenate([pts, lbl.astype(jnp.float32)[:, None]], 1)
        buf = jnp.zeros((P + 1, 5), jnp.float32).at[dest].set(row)[:P]
        cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), P)
        return buf[:, :4], buf[:, 4].astype(jnp.int32), jnp.arange(P) < cnt

    import jax as _jax
    padded = []
    padded_labels = []
    for pts, lbl, val in scans:
        bp, bl, bv = prep(pts, lbl, val)
        padded.append(odometry.ScanInput(points=bp, valid=bv, **zero_imu))
        padded_labels.append(bl)
    # NOTE (axon): jax.block_until_ready does NOT reliably block on the
    # tunneled TPU backend — execution (and even remote compilation) is
    # fully async and only a D2H materialization synchronizes. Every timed
    # region below therefore ends with a small device_get, never a bare
    # block_until_ready.
    _jax.device_get(padded[-1].points[0])

    state = odometry.init_state(cfg)
    step = odometry.odom_step

    outs = []
    # warmup (compile + first keyframes); device_get SYNCS (see note above)
    for sin in padded[:warmup]:
        state, out = step(state, sin, cfg)
        outs.append(out)
    jax.device_get(out.pose)

    t0 = time.perf_counter()
    for sin in padded[warmup:]:
        state, out = step(state, sin, cfg)
        outs.append(out)
    jax.device_get(out.pose)  # data-dependent on the whole chain
    wall = time.perf_counter() - t0
    sps = (n_scans - warmup) / wall

    poses = np.asarray([np.asarray(o.pose) for o in outs])
    gt_rel = trajectory.relative_to_first(gt[:n_scans])
    ate = trajectory.ate_rmse(poses, gt_rel, align=False)
    # relative pose error over the headline segment (drift per step — the
    # KITTI-style companion to ATE)
    rpe_t, rpe_r = trajectory.rpe(poses, gt_rel)

    # ---- config 4 FIRST among the extras: full SemanticSlam (keyframe-rate
    # semantic refinement inside the fused per-scan program + async loop
    # closure + pose graph + submap closes). This is full-SYSTEM throughput
    # including host orchestration — the reference's five concurrent nodes
    # run at 10 Hz; the round-3 target is >= 30 scans/s. ----
    # The full-SLAM segment runs its OWN sequence: a REVISITING circuit
    # (radius 10 m closes after ~100 scans at 6.3 m/s) around a plaza ringed
    # by buildings+poles, so loop closure and graph correction actually
    # fire — the headline's 60-scan arc of the r=60 circuit never revisits
    # (48 m of a 377 m circumference).
    n_sys = min(int(os.environ.get("BENCH_SYS_SCANS", "100")), 100)
    lio_sps = slam_sps = 0.0
    slam_n_loops = slam_n_submaps = 0
    slam_ate = slam_raw_ate = lio_slam_ate = -1.0
    slam_stage_ms: dict = {}
    slam_err = ""
    try:
        if not budget_left():
            raise TimeoutError("bench budget exhausted")
        from lis_slam_tpu.io import synthetic as _syn
        from lis_slam_tpu.pipeline import slam as slam_mod

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
        # EXACTLY periodic lap: speed chosen so n_sys scans close the
        # circle bit-exactly (2*pi*r / (n*T)) — the endurance replay below
        # tiles this lap seamlessly for multi-lap revisits
        lap_speed = 2.0 * np.pi * 10.0 / (n_sys * 0.1)
        gt_sys = _syn.circular_trajectory(n_sys + 1, radius=10.0,
                                          speed=lap_speed)
        key = jax.random.PRNGKey(11)
        # two independently-noised renders of the SAME lap: revisits in the
        # endurance replay must not see bitwise-identical scans (real loop
        # closure never does)
        sys_scans, sys_labels, sys_scans2 = [], [], []
        for i in range(n_sys):
            key, sub, sub2 = jax.random.split(key, 3)
            pts, lbl, val = synthetic_jax.render_scan_device(
                plaza, jnp.asarray(gt_sys[i], jnp.float32), sub)
            bp, bl, bv = prep(pts, lbl, val)
            sys_scans.append(odometry.ScanInput(points=bp, valid=bv,
                                                **zero_imu))
            sys_labels.append(bl)
            pts2, _l2, val2 = synthetic_jax.render_scan_device(
                plaza, jnp.asarray(gt_sys[i], jnp.float32), sub2)
            bp2, _bl2, bv2 = prep(pts2, _l2, val2)
            sys_scans2.append(odometry.ScanInput(points=bp2, valid=bv2,
                                                 **zero_imu))
        labels_np = [np.asarray(sys_labels[i])[np.asarray(sys_scans[i].valid)]
                     for i in range(n_sys)]
        gt_sys_rel = trajectory.relative_to_first(gt_sys[:n_sys])

        # the replay runs 40 scans PAST the exactly-periodic lap closure
        # (re-entering the lap on the second noise render) so revisits
        # genuinely happen inside this section: at exactly one lap the
        # travel/inflation candidate gate (loopDetection :736-740) is
        # MARGINAL by construction (nearest-keyframe phase offset ~0.7 m vs
        # 0.01 * circumference = 0.63 m), and round 5 measured a short
        # extension land every revisit on the reject side — zero loop
        # factors, and the verify-ICP program left cold for the endurance
        # section below
        n_replay = n_sys + 40
        gt_replay = np.concatenate([gt_sys[:n_sys], gt_sys[:40]])
        gt_replay_rel = trajectory.relative_to_first(gt_replay)

        # Odometry-drift injection (the pose_hook seam, same as
        # test_loop_closure_corrects_injected_drift): the synthetic world's
        # front-end odometry is near-perfect (raw ATE ~1 cm over a lap), so
        # without this the graph correction has nothing measurable to fix
        # and `corrected <= raw` is decided by registration noise. A slowly
        # growing yaw error about the world origin (~0.19 deg/s) emulates
        # the ~0.3%-of-travel drift real LOAM odometry accrues — inside the
        # reference's own candidate gate (1% of travel), so loop closure
        # must both DETECT and CORRECT it, and raw-vs-corrected ATE now
        # measures correctPoses doing its job
        # (subMapOptmizationNode.cpp:4346-4385).
        from lis_slam_tpu.utils import se3_np as _se3np

        def drift_hook(pose6, idx):
            th = 3e-4 * idx
            c, s = np.cos(th), np.sin(th)
            Td = np.eye(4)
            Td[:2, :2] = [[c, -s], [s, c]]
            return _se3np.matrix_to_pose(Td @ _se3np.pose_to_matrix(pose6))

        def run_slam():
            system = slam_mod.SemanticSlam(cfg, pose_hook=drift_hook)
            system.process_scan(sys_scans[0], gt_labels=labels_np[0])
            t0 = time.perf_counter()
            for i in range(1, n_replay):
                j = i % n_sys
                s = sys_scans[j] if i < n_sys else sys_scans2[j]
                system.process_scan(
                    s, gt_labels=labels_np[j], timestamp=i * 0.1)
            system.flush_pipeline()  # all deferred drains/loops consumed
            jax.device_get(system.state.pose)
            return (n_replay - 1) / (time.perf_counter() - t0), system

        run_slam()  # warmup replay: compiles every stage incl. loop/submap
        slam_sps, system = run_slam()
        # --- accuracy of the SYSTEM output (VERDICT r4 missing #2): the
        # corrected trajectory after finish() (loop factors + final
        # optimize + correctPoses propagation) vs the odometry-only raw
        # one. A broken correctPoses equivalent now moves a recorded
        # number: corrected must be <= raw. Aligned ATE (standard TUM
        # practice; the anchor-gauge note in docs/PERF.md). ---
        res_sys = system.finish()
        slam_ate = trajectory.ate_rmse(res_sys.poses, gt_replay_rel,
                                       align=True)
        slam_raw_ate = trajectory.ate_rmse(res_sys.raw_poses, gt_replay_rel,
                                           align=True)
        slam_n_submaps = res_sys.n_submaps
        slam_n_loops = res_sys.n_loops + len(system.loops)
        # per-stage wall-clock breakdown (total ms over the run, host view):
        # where each full-SLAM millisecond goes — the reference logs the
        # same running averages per node (e.g. subMapOptmizationNode.cpp:
        # 730-736)
        slam_stage_ms = {
            k: round(v["mean_ms"] * v["count"], 1)
            for k, v in system.timer.report().items()
        }
    except Exception as e:  # pragma: no cover
        slam_err += f"slam: {e}; "

    # ---- ENDURANCE: sequence-scale multi-lap full SLAM (VERDICT r4 top
    # item — the reference's normal operating mode is a full KITTI
    # sequence, thousands of scans with dozens of loop closures;
    # README.md sections 5-6, capacity policies odomEstimationNode.cpp:
    # 591-593, subMap.h:1103-1122). Tiles the exactly-periodic plaza lap
    # (alternating the two noise renders so revisits never see identical
    # scans) and reuses the full-SLAM section's compiled programs: same
    # config, zero extra compile. Reports sustained throughput, loop
    # factors after dedup, per-lap ATE (must stay flat — the whole point
    # of loop closure), keyframe-cloud eviction, and memory. ----
    end_sps = end_ate = end_raw_ate = 0.0
    end_steady_sps = end_flush_s = 0.0
    end_scans = int(os.environ.get("BENCH_ENDURANCE_SCANS", "1000"))
    end_n_run = 0
    end_loops = end_submaps = end_kf = end_kf_released = 0
    end_lap_ate: list = []
    end_lap_walls: list = []
    end_host_mb = end_dev_mb = 0.0
    try:
        if not budget_left():
            raise TimeoutError("bench budget exhausted")
        if not slam_sps:
            raise RuntimeError("slam baseline failed, skipping endurance")
        if end_scans > 0:
            laps = max(1, int(np.ceil(end_scans / n_sys)))
            n_end = laps * n_sys
            # pre-warm the pose-graph LM programs for every node/edge
            # bucket the growing multi-lap graph will cross (padding is
            # power-of-2 bucketed; a mid-run compile through the remote
            # relay stalls ~30-60 s and would corrupt the sustained-
            # throughput number — the full-SLAM warmup above only reaches
            # the smallest bucket). Replays the real growth pattern:
            # odom chain + ~1 loop edge per lap's worth of nodes.
            from lis_slam_tpu.graph import pose_graph as pg_mod

            wg = pg_mod.GraphBuilder(
                cfg.graph, max_nodes=cfg.submap.max_submaps,
                max_edges=cfg.submap.max_submaps * 4,
                max_priors=cfg.submap.max_submaps)
            est_nodes = min(cfg.submap.max_submaps - 1,
                            8 * (n_end // n_sys) + 8)
            # The LM program compiles per (node-bucket, edge-bucket) shape
            # pair. A growth REPLAY only warms the pairs its own edge/node
            # ratio crosses — and the real ratio varies with how many loop
            # factors dedup lets through (r5 runs measured 2.2 and 2.7
            # edges/node; a replay warmed at ratio 2.0 still stalled ~16 s
            # and ~11 s on (32,128)/(64,256) compiles mid-lap). Enumerate
            # the pairs any monotone growth with 1 <= edges/node <= 4 can
            # touch instead: eb in {nb, 2nb, 4nb}, both capped at the
            # buckets of the expected final graph.
            node_cap = wg._bucket(est_nodes, wg.max_nodes)
            edge_cap = wg._bucket(min(4 * est_nodes, wg.max_edges),
                                  wg.max_edges)
            nb = 8
            pairs = []
            while nb <= node_cap:
                # nb//2 too: right after a node-bucket crossing the edge
                # count (>= nodes-1) can still sit in the previous bucket
                for eb in (max(8, nb // 2), nb, 2 * nb, 4 * nb):
                    if eb <= edge_cap and (nb, eb) not in pairs:
                        pairs.append((nb, eb))
                nb *= 2
            for (nb, eb) in pairs:
                wg2 = pg_mod.GraphBuilder(
                    cfg.graph, max_nodes=cfg.submap.max_submaps,
                    max_edges=cfg.submap.max_submaps * 4,
                    max_priors=cfg.submap.max_submaps)
                for k in range(nb):
                    wg2.add_node(np.eye(4))
                for k in range(eb):
                    i = k % (nb - 1)
                    wg2.add_odom_edge(i, i + 1, np.eye(4))
                nw, dev = wg2.optimize_async()
                wg2.consume_optimized(nw, np.asarray(dev))

            # pre-warm the loop-verify ICP program: whether the 1.4-lap
            # full-SLAM section above dispatched a verify depends on
            # keyframe phase luck at the candidate gate; a cold verify
            # compile through the remote relay mid-endurance is a ~40 s
            # lap stall (round-5 first run, lap 3)
            _vr = slam_mod._verify_loop_device(
                jnp.zeros((32768, 3)), jnp.zeros(32768, bool),
                jnp.zeros((5 * cfg.submap.class_capacity, 3)),
                jnp.zeros(5 * cfg.submap.class_capacity, bool),
                jnp.eye(4), cfg.loop.icp_max_iterations,
                cfg.loop.verify_max_correspond_dist,
                cfg.loop.verify_hash_cell_size,
                cfg.loop.verify_hash_table_size,
                cfg.loop.verify_source_leaf,
                cfg.loop.verify_source_capacity,
                cfg.loop.verify_target_leaf,
                cfg.loop.verify_target_capacity,
                tuple(cfg.loop.verify_refresh_iters))
            jax.device_get(_vr.fitness)

            system = slam_mod.SemanticSlam(cfg, pose_hook=drift_hook)
            lap_walls = []
            t0 = t_lap = time.perf_counter()
            for k in range(n_end):
                i = k % n_sys
                s = (sys_scans if (k // n_sys) % 2 == 0 else sys_scans2)[i]
                system.process_scan(s, gt_labels=labels_np[i],
                                    timestamp=k * 0.1)
                if (k + 1) % n_sys == 0:
                    # host-side lap mark: dispatch runs ahead of the
                    # device, but the windowed drains sync often enough
                    # that a sustained stall would show here
                    now = time.perf_counter()
                    lap_walls.append(now - t_lap)
                    t_lap = now
            t_fl = time.perf_counter()
            system.flush_pipeline()
            jax.device_get(system.state.pose)
            end_flush_s = time.perf_counter() - t_fl
            end_wall = time.perf_counter() - t0
            end_sps = n_end / end_wall
            # sustained rate = median lap rate (excludes the one-off
            # termination flush; the total-including-flush rate is end_sps)
            end_steady_sps = n_sys / float(np.median(lap_walls))
            end_n_run = n_end
            end_lap_walls = [round(float(w), 2) for w in lap_walls]
            res_end = system.finish()
            gt_tiled = np.tile(gt_sys_rel, (laps, 1))
            end_ate = trajectory.ate_rmse(res_end.poses, gt_tiled,
                                          align=True)
            end_raw_ate = trajectory.ate_rmse(res_end.raw_poses, gt_tiled,
                                              align=True)
            # per-lap ATE on the globally-aligned corrected trajectory:
            # flat across laps = loop closure is holding drift down
            e = res_end.poses[:, 3:6].astype(np.float64)
            g = gt_tiled[:, 3:6].astype(np.float64)
            R, t = trajectory.align_umeyama(e, g)
            e = e @ R.T + t
            per = np.sqrt(np.mean(np.sum((e - g) ** 2, axis=1).reshape(
                laps, n_sys), axis=1))
            end_lap_ate = [round(float(x), 4) for x in per]
            end_loops = res_end.n_loops
            end_submaps = res_end.n_submaps
            end_kf = len(system.keyframes)
            end_kf_released = sum(
                1 for kf in system.keyframes if kf.released)
            import resource

            end_host_mb = resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1024.0
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                end_dev_mb = stats.get("bytes_in_use", 0) / 1e6
            except Exception:
                end_dev_mb = -1.0
    except Exception as e:  # pragma: no cover
        slam_err += f"endurance: {e}; "

    # ---- LIO full SLAM: the SAME plaza replay with the IMU stream fused
    # inside the per-scan program (preintegrated guess + gyro deskew +
    # covariance-weighted bias updates; IMUPreintegration,
    # subMapOptmizationNode.cpp:2007-2219). Synthetic IMU consistent with
    # the circuit: yaw rate omega, centripetal accel v*omega, gravity —
    # pre-rotated by extRot^T so imuConverter recovers the lidar frame. ----
    lio_slam_sps = 0.0
    lio_slam_resets = -1
    try:
        if not int(os.environ.get("BENCH_LIO", "1")):
            raise TimeoutError("lio sections disabled (BENCH_LIO=0)")
        if not budget_left():
            raise TimeoutError("bench budget exhausted")
        if not slam_sps:
            raise RuntimeError("slam baseline failed, skipping lio_slam")
        import dataclasses as _dcl

        lcfg2 = cfg.replace(imu=_dcl.replace(cfg.imu, use_imu=True))
        omega, speed = lap_speed / 10.0, lap_speed
        R_ext = np.asarray(lcfg2.imu.extrinsic_rot, np.float64)
        g_l = np.array([0.0, 0.0, omega])
        a_l = np.array([0.0, speed * omega, lcfg2.imu.gravity])
        imu_g1 = np.tile((R_ext.T @ g_l)[None, :], (12, 1)).astype(np.float32)
        imu_a1 = np.tile((R_ext.T @ a_l)[None, :], (12, 1)).astype(np.float32)
        imu_t0 = np.arange(12, dtype=np.float32) * 0.01

        def run_lio_slam():
            system = slam_mod.SemanticSlam(lcfg2)
            system.process_scan(
                sys_scans[0], gt_labels=labels_np[0],
                imu_time=imu_t0, imu_gyro=imu_g1, imu_accel=imu_a1)
            t0 = time.perf_counter()
            for i in range(1, n_sys):
                system.process_scan(
                    sys_scans[i], gt_labels=labels_np[i], timestamp=i * 0.1,
                    imu_time=imu_t0 + i * 0.1, imu_gyro=imu_g1,
                    imu_accel=imu_a1)
            system.flush_pipeline()
            jax.device_get(system.state.pose)
            return (n_sys - 1) / (time.perf_counter() - t0), system

        run_lio_slam()  # warmup/compile
        lio_slam_sps, lio_sys2 = run_lio_slam()
        lio_slam_resets = lio_sys2.n_imu_resets
        # system-output accuracy of the LIO-fused pipeline (aligned ATE;
        # the sequence starts mid-motion, see docs/PERF.md anchor-gauge
        # note) — r4 recorded throughput/resets but no accuracy
        res_lio = lio_sys2.finish()
        lio_slam_ate = trajectory.ate_rmse(res_lio.poses, gt_sys_rel,
                                           align=True)
    except Exception as e:  # pragma: no cover
        slam_err += f"lio_slam: {e}; "

    # ---- batched multi-sequence replay (config 5): aggregate throughput
    # via the cond-free uniform step (odom_step_uniform). On ONE chip the
    # step is VPU-bound, so the aggregate tops out near the single-sequence
    # rate; the multi-chip sharded path (parallel/batched.make_sharded_step,
    # validated by dryrun_multichip) scales it across ICI. ----
    from lis_slam_tpu.parallel import batched as pb

    B = int(os.environ.get("BENCH_BATCH", "8"))
    sps_batched = 0.0
    if B > 0 and budget_left():
        n_b = min(24, n_scans)
        kf_every = max(1, cfg.runtime.batched_kf_every)
        allow = lambda i: i % kf_every == 0
        bstates = pb.batched_init_state(cfg, B)
        stack = lambda sin: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), sin)
        bscans = [stack(s) for s in padded[:n_b]]
        # warmup compiles BOTH step programs (merge / merge-free)
        for i in range(min(2, n_b)):
            bstates, bout = pb.batched_odom_step(
                bstates, bscans[i], cfg, allow_kf=allow(i))
        jax.device_get(bout.pose)
        tb = time.perf_counter()
        for i in range(2, n_b):
            bstates, bout = pb.batched_odom_step(
                bstates, bscans[i], cfg, allow_kf=allow(i))
        jax.device_get(bout.pose)
        wall_b = time.perf_counter() - tb
        sps_batched = B * (n_b - 2) / wall_b

    # ---- config 2: LIO (IMU preintegration + fusion) ----
    try:
        if not int(os.environ.get("BENCH_LIO", "1")):
            raise TimeoutError("lio sections disabled (BENCH_LIO=0)")
        if not budget_left():
            raise TimeoutError("bench budget exhausted")
        from lis_slam_tpu.pipeline import lio as lio_mod

        import dataclasses as _dc

        n_lio = min(25, n_scans)
        lcfg = cfg.replace(imu=_dc.replace(cfg.imu, use_imu=True))
        lio_sys = lio_mod.LioOdometry(lcfg)
        imu_t = np.arange(12) * 0.01
        imu_g = np.zeros((12, 3), np.float32)
        imu_a = np.tile(np.array([[0.0, 0.0, 9.80511]], np.float32), (12, 1))
        host_scans = [np.asarray(padded[i].points)[np.asarray(padded[i].valid)]
                      for i in range(n_lio)]
        n_warm = 3  # covers prestep + both poststep variants' compiles
        for i in range(n_warm):
            p = lio_sys.process_scan(
                host_scans[i], imu_t + i * 0.1, imu_g, imu_a, i * 0.1)
        jax.device_get(p)
        t0 = time.perf_counter()
        for i in range(n_warm, n_lio):
            p = lio_sys.process_scan(
                host_scans[i], imu_t + i * 0.1, imu_g, imu_a, i * 0.1)
        jax.device_get(p)
        lio_sps = (n_lio - n_warm) / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - bench resilience
        slam_err += f"lio: {e}; "

    # ---- full-size darknet53 RangeNet++ (the RELEASED architecture:
    # blocks 1,2,8,8,4 / widths 64..1024) at the reference's operating
    # point 64 x 2048 x 5 batch-1 (netTensorRT.cpp:309-440, net.cpp:89-91).
    # Random-initialized weights measure the same compute as the released
    # checkpoint (zero egress blocks the weights, not the FLOPs). ----
    dk_ms = 0.0
    dk_params_m = 0.0
    slam_infer_sps = slam_infer_end_sps = 0.0
    try:
        if not int(os.environ.get("BENCH_DARKNET", "1")):
            raise TimeoutError("darknet section disabled (BENCH_DARKNET=0)")
        if not budget_left():
            raise TimeoutError("bench budget exhausted")
        import dataclasses as _dc3

        from lis_slam_tpu.models import rangenet

        sem_cfg = _dc3.replace(cfg.semantic, enabled=True)
        dk_model = rangenet.create_model(sem_cfg)
        img = jnp.zeros((1, sem_cfg.model_input_h, sem_cfg.model_input_w,
                         sem_cfg.model_input_c), jnp.float32)
        dk_vars = jax.jit(lambda: dk_model.init(
            jax.random.PRNGKey(0), img, train=False))()
        dk_params_m = round(sum(
            x.size for x in jax.tree_util.tree_leaves(dk_vars)) / 1e6, 1)

        @jax.jit
        def dk_fwd(v, x):
            return dk_model.apply(v, x, train=False)

        o = dk_fwd(dk_vars, img)
        jax.device_get(o[0, 0, 0])  # sync (see axon note above)
        n_inf = 20
        # vary the input so the relay cannot serve a cached result — but
        # MATERIALIZE the variants before timing: building `img + k*eps`
        # inside the loop times 20 tunnel add-dispatches, not the forward
        # pass (round-5 first run: 50.6 ms/inference vs the true 7.6)
        imgs = [(img + jnp.float32(k) * 1e-3) for k in range(n_inf)]
        jax.device_get(imgs[-1][0, 0, 0])
        t0 = time.perf_counter()
        for k in range(n_inf):
            o = dk_fwd(dk_vars, imgs[k])
        jax.device_get(o[0, 0, 0])
        dk_ms = (time.perf_counter() - t0) / n_inf * 1e3

        # ---- full SLAM with ON-DEVICE full-size inference at keyframe
        # rate (lab_mode="infer": RangeNet runs INSIDE the fused per-scan
        # program's keyframe branch; semanticFusionNode.cpp:139-170) ----
        if budget_left() and slam_sps:
            scfg = cfg.replace(semantic=sem_cfg)
            n_inf_scans = min(40, n_sys)

            def run_slam_infer():
                system = slam_mod.SemanticSlam(scfg, rangenet_params=dk_vars)
                system.process_scan(sys_scans[0])
                t0 = time.perf_counter()
                for i in range(1, n_inf_scans):
                    system.process_scan(sys_scans[i], timestamp=i * 0.1)
                system.flush_pipeline()
                jax.device_get(system.state.pose)
                return (n_inf_scans - 1) / (time.perf_counter() - t0)

            run_slam_infer()  # warmup/compile
            slam_infer_sps = run_slam_infer()

            # stretch (VERDICT r4 next #9): endurance WITH keyframe-rate
            # on-device inference — multi-lap replay in lab_mode="infer"
            # proves inference does not destabilize long-run throughput or
            # the loop pipeline
            if budget_left() and int(os.environ.get(
                    "BENCH_ENDURANCE_INFER_LAPS", "3")) > 0:
                laps_i = int(os.environ.get("BENCH_ENDURANCE_INFER_LAPS",
                                            "3"))
                system = slam_mod.SemanticSlam(scfg, rangenet_params=dk_vars)
                t0 = time.perf_counter()
                for k in range(laps_i * n_sys):
                    i = k % n_sys
                    s = (sys_scans if (k // n_sys) % 2 == 0
                         else sys_scans2)[i]
                    system.process_scan(s, timestamp=k * 0.1)
                system.flush_pipeline()
                jax.device_get(system.state.pose)
                slam_infer_end_sps = (laps_i * n_sys) / (
                    time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover
        slam_err += f"darknet53: {e}; "

    # ---- accuracy mode: reference-faithful voxel-uniform matched clouds
    # (match_source="full_ds") — trades ~40% throughput for ~2.5x lower
    # ATE (see docs/PERF.md). Reported as an extra; the headline number
    # stays the production "sharp" mode. ----
    acc_sps = acc_ate = 0.0
    if int(os.environ.get("BENCH_ACCURACY", "1")) and budget_left():
        import dataclasses as _dc2

        acfg = cfg.replace(matching=_dc2.replace(
            cfg.matching, match_source="full_ds"))
        n_a = min(25, n_scans)
        astate = odometry.init_state(acfg)
        aouts = []
        for sin in padded[:5]:
            astate, o = odometry.odom_step(astate, sin, acfg)
            aouts.append(o)
        jax.device_get(o.pose)
        t0 = time.perf_counter()
        for sin in padded[5:n_a]:
            astate, o = odometry.odom_step(astate, sin, acfg)
            aouts.append(o)
        jax.device_get(o.pose)
        acc_sps = (n_a - 5) / (time.perf_counter() - t0)
        aposes = np.asarray([np.asarray(o.pose) for o in aouts])
        acc_ate = float(trajectory.ate_rmse(
            aposes, gt_rel[:n_a], align=False))

    result = {
        "metric": "scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),
        "extra": {
            "ate_m": round(float(ate), 4),
            "rpe_t_m": round(float(rpe_t), 4),
            "rpe_r_deg": round(float(rpe_r), 4),
            "accuracy_mode_scans_per_sec": round(acc_sps, 2),
            "accuracy_mode_ate_m": round(acc_ate, 4),
            "n_scans": n_scans,
            "batched_scans_per_sec": round(sps_batched, 2),
            "batch": B,
            "lio_scans_per_sec": round(lio_sps, 2),
            "full_slam_scans_per_sec": round(slam_sps, 2),
            "full_slam_submaps": slam_n_submaps,
            "full_slam_loop_factors": slam_n_loops,
            "full_slam_ate_m": round(float(slam_ate), 4),
            "full_slam_raw_ate_m": round(float(slam_raw_ate), 4),
            "full_slam_stage_total_ms": slam_stage_ms,
            "endurance_scans": end_n_run,
            "endurance_scans_per_sec": round(end_sps, 2),
            "endurance_steady_scans_per_sec": round(end_steady_sps, 2),
            "endurance_flush_s": round(end_flush_s, 2),
            "endurance_loop_factors": end_loops,
            "endurance_submaps": end_submaps,
            "endurance_keyframes": end_kf,
            "endurance_keyframes_released": end_kf_released,
            "endurance_ate_m": round(float(end_ate), 4),
            "endurance_raw_ate_m": round(float(end_raw_ate), 4),
            "endurance_per_lap_ate_m": end_lap_ate,
            "endurance_per_lap_wall_s": end_lap_walls,
            "endurance_peak_host_mb": round(end_host_mb, 1),
            "endurance_device_mb_in_use": round(end_dev_mb, 1),
            "lio_full_slam_scans_per_sec": round(lio_slam_sps, 2),
            "lio_full_slam_imu_resets": lio_slam_resets,
            "lio_full_slam_ate_m": round(float(lio_slam_ate), 4),
            "darknet53_ms_per_inference": round(dk_ms, 2),
            "darknet53_params_m": dk_params_m,
            "full_slam_infer_scans_per_sec": round(slam_infer_sps, 2),
            "endurance_infer_scans_per_sec": round(slam_infer_end_sps, 2),
            "sys_scans": n_sys,
            "device": str(jax.devices()[0]),
            **({"sys_err": slam_err} if slam_err else {}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
