"""Full semantic SLAM pipeline: odometry + semantics + submaps + loop
closure + global pose graph.

This is the TPU-native equivalent of the reference's five-node ROS graph
(SURVEY.md section 1) collapsed into one host-orchestrated system:

 - front-end per-scan odometry  -> pipeline/odometry.py (jitted step)
 - semantic inference/fusion    -> models/rangenet.py + semantic/fusion.py
   (semanticFusionNode)
 - keyframe -> submap grouping  -> mapping/submap.py (makeSubMapThread,
   saveSubMap, judge_new_submap)
 - loop closure                 -> loop/epsc.py descriptors + ICP
   verification (loopClosureThread, detectLoopClosureForSubMap)
 - global optimization          -> graph/pose_graph.py (replaces iSAM2;
   addOdomFactor/addLoopFactor/correctPoses)
 - trajectory / map export      -> pipeline/trajectory.py (transformFusion)

The host loop plays the role of the ROS executors: the hot per-scan path is
one device program; keyframe-rate and submap-rate work run as lower-rate
host-driven jitted calls, mirroring the reference's thread structure
(SURVEY.md section 2 parallelism table).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..graph import pose_graph
from ..loop import epsc
from ..mapping import submap as sm
from ..ops import icp as icp_ops
from ..ops import knn, scan_match
from ..semantic import fusion
from ..utils import profiling, se3, se3_np
from . import odometry, semantic_odometry as semo, trajectory


@functools.partial(jax.jit, static_argnames=("cfg", "with_labels"))
def _keyframe_device_work(scan, lab_raw, guess, sem_state, cfg,
                          with_labels: bool):
    """ALL keyframe-rate device work in ONE program: feature re-extraction,
    semantic scan assembly, semantic-weighted refinement against the sliding
    local map (SubMapOdometryNode stage 1), per-feature label lookup, and
    EPSC-family descriptors. The host then performs ONE readback — every
    separate eager dispatch + sync costs 5-50 ms on a tunneled TPU."""
    fc = odometry.preprocess(scan, cfg)
    if with_labels:
        sscan = semo.build_semantic_scan(scan, lab_raw, cfg)
        new_sem_state, refined, _gn = semo.refine_step(
            sem_state, sscan, guess, cfg)
        h = knn.build_hash(scan.points[:, :3], scan.valid, cell_size=1.0,
                           table_size=1 << 15)
        _, idx = knn.knn_hash(fc.surf_xyz, h, k=1)
        lab_surf = lab_raw[idx[:, 0]].astype(jnp.int32)
    else:
        new_sem_state = sem_state
        refined = guess
        lab_surf = jnp.zeros(fc.surf_xyz.shape[0], jnp.int32)
    desc = epsc.compute_descriptors(
        fc.surf_xyz, fc.surf_intensity, lab_surf, fc.surf_mask,
        fc.sharp_corner_xyz, fc.sharp_corner_mask,
        fc.sharp_surf_xyz, fc.sharp_surf_mask, cfg.loop,
    )
    return fc, new_sem_state, refined, desc, lab_surf


@dataclass
class SlamResult:
    poses: np.ndarray  # (N, 6) corrected per-scan trajectory
    raw_poses: np.ndarray  # (N, 6) odometry-only trajectory
    keyframe_ids: np.ndarray  # scan index of each keyframe
    n_submaps: int
    n_loops: int
    global_map: np.ndarray | None = None  # (M, 4) xyz + label
    stage_ms: dict | None = None  # per-stage mean wall-clock (StageTimer)


class SemanticSlam:
    """Host-orchestrated full pipeline (config 4 of BASELINE.json)."""

    def __init__(self, cfg: SlamConfig, rangenet_params=None,
                 pose_hook=None, debug_dir: str | None = None):
        """`pose_hook(pose6, scan_idx) -> pose6`: optional transform applied
        to the front-end pose before the back-end consumes it — the seam for
        replaying with degraded odometry (drift-injection tests, external
        odometry sources).

        `debug_dir`: when set, dump the reference's rviz debug surface as
        files — per-keyframe descriptor images, loop-constraint markers,
        stage clouds (viz/debug.py)."""
        self.cfg = cfg
        self.pose_hook = pose_hook
        self.debug = None
        if debug_dir is not None:
            from ..viz.debug import DebugDumper

            self.debug = DebugDumper(debug_dir)
        self.state = odometry.init_state(cfg)
        self.loop_detector = epsc.LoopDetector(cfg.loop)
        self.collector = sm.SubMapCollector(cfg.submap)
        self.graph = pose_graph.GraphBuilder(
            cfg.graph, max_nodes=cfg.submap.max_submaps,
            max_edges=cfg.submap.max_submaps * 4,
            max_priors=cfg.submap.max_submaps,
        )
        # --- semantic inference (semanticFusionNode): when semantics are
        # enabled, run RangeNet on every keyframe. Weights come from
        # `rangenet_params` (e.g. a training run) or, by default, the
        # in-repo synthetic checkpoint (semantic/weights.py). ---
        self.model = None
        self.model_vars = rangenet_params
        self.infer = None
        if cfg.semantic.enabled:
            from ..models import rangenet
            from ..semantic import inference as sem_inf

            if rangenet_params is not None:
                self.model = rangenet.create_model(cfg.semantic)
                self.infer = lambda pts, val: sem_inf.infer_scan_labels(
                    self.model, self.model_vars, pts, val, cfg)
            else:
                try:
                    wrapped = sem_inf.SemanticInference(cfg)
                    self.model = wrapped.model
                    self.model_vars = wrapped.variables
                    self.infer = wrapped
                except FileNotFoundError:
                    pass  # no checkpoint shipped/available: labels must be fed

        # per-stage wall-clock averages (the reference's "Average ... time"
        # logs; VERDICT round-1: graph timing was unrecorded)
        self.timer = profiling.StageTimer()
        self.scan_poses: list[np.ndarray] = []  # per-scan odometry pose6
        self._gps_queue: list[tuple] = []  # (t, pos, cov) awaiting a submap
        self._scan_time = 0.0
        self.keyframes: list[sm.Keyframe] = []
        self.kf_scan_ids: list[int] = []
        self.loops: list[tuple[int, int, np.ndarray, float]] = []  # kf i,j
        self._scan_idx = 0
        # back-end semantic submap odometry (stage 1 refinement) state;
        # engaged whenever per-point labels are available
        self.sem_state = semo.init_state(cfg)
        self._last_refined: np.ndarray | None = None
        self._last_frontend: np.ndarray | None = None

    # ------------------------------------------------------------------
    def process_scan(self, scan: odometry.ScanInput,
                     gt_labels: np.ndarray | None = None,
                     timestamp: float | None = None) -> np.ndarray:
        """Feed one scan; returns the current odometry pose6.

        `timestamp`: scan header time in seconds (defaults to
        scan_idx * scan_period), used for GPS time-matching.

        Labels for the semantic stages come from `gt_labels` when provided
        (synthetic ground truth / an external segmentation stream), else
        from on-device RangeNet inference at keyframe rate
        (semanticFusionNode.cpp:139-170)."""
        self._scan_time = (timestamp if timestamp is not None
                           else self._scan_idx * self.cfg.sensor.scan_period)
        with self.timer.stage("odom_step"):
            self.state, out = odometry.odom_step(self.state, scan, self.cfg)
        # ONE host readback for both values (each blocking D2H costs ~50 ms
        # on a tunneled TPU)
        pose6, is_kf = jax.device_get((out.pose, out.is_keyframe))
        if self.pose_hook is not None:
            pose6 = np.asarray(self.pose_hook(pose6, self._scan_idx))
        self.scan_poses.append(pose6)
        if bool(is_kf):
            lab_raw = None
            if gt_labels is not None:
                # gt labels cover the VALID raw points in order; pad_scan /
                # the bench loaders produce prefix-valid buffers
                buf = np.zeros(self.cfg.sensor.max_raw_points, np.int32)
                buf[: min(len(gt_labels), len(buf))] = np.asarray(
                    gt_labels)[: len(buf)]
                lab_raw = jnp.asarray(buf)
            elif self.infer is not None:
                lab_raw, _sem = self.infer(scan.points, scan.valid)
                lab_raw = lab_raw.astype(jnp.int32)  # device, no readback
            with self.timer.stage("keyframe"):
                self._on_keyframe(scan, pose6, lab_raw)
        self._scan_idx += 1
        return pose6

    # ------------------------------------------------------------------
    def _on_keyframe(self, scan, pose6, lab_raw):
        """`lab_raw`: learning-class id per RAW point (padded; ground truth
        or RangeNet inference, see process_scan), or None for
        geometric-only operation."""
        cfg = self.cfg
        with_labels = lab_raw is not None

        # seed for the stage-1 refinement (SubMapOdometryNode): carry the
        # front-end's increment on top of the refined trajectory (the
        # reference seeds from its own odometry stream). Host-side numpy —
        # no device dispatch.
        guess = pose6
        if (with_labels and self._last_refined is not None
                and self._last_frontend is not None):
            T_inc = (se3_np.pose_to_matrix(pose6)
                     @ np.linalg.inv(se3_np.pose_to_matrix(self._last_frontend)))
            guess = se3_np.matrix_to_pose(
                T_inc @ se3_np.pose_to_matrix(self._last_refined))

        # --- ALL device work in one jitted program ---
        fc, new_sem_state, refined, desc, lab_surf = _keyframe_device_work(
            scan,
            lab_raw if with_labels else jnp.zeros(
                cfg.sensor.max_raw_points, jnp.int32),
            jnp.asarray(guess, jnp.float32),
            self.sem_state, cfg, with_labels,
        )
        if with_labels:
            self.sem_state = new_sem_state
            self._last_frontend = pose6
            # ONE readback: refined pose + the signature the host-side loop
            # detector database needs
            pose6, sig_np = jax.device_get((refined, desc.signature))
            self._last_refined = pose6
        else:
            sig_np = np.asarray(desc.signature)

        T = se3_np.pose_to_matrix(pose6)

        corner = fc.sharp_corner_xyz
        surf = fc.surf_xyz

        kf = sm.Keyframe(
            index=len(self.keyframes),
            pose_init=T,
            pose_opt=T.copy(),
            timestamp=self._scan_time,
            clouds=sm.ClassClouds(
                xyz=jnp.zeros((5, 8, 3)), mask=jnp.zeros((5, 8), bool)
            ),
            corner_xyz=fc.corner_xyz, corner_mask=fc.corner_mask,
            surf_xyz=fc.surf_xyz, surf_mask=fc.surf_mask,
        )
        self.keyframes.append(kf)
        self.kf_scan_ids.append(self._scan_idx)

        # --- loop detection at keyframe rate (loopClosureThread);
        # `desc` came out of the fused keyframe device program ---
        if cfg.loop.enabled:
            def recompute(R2, t2):
                T2 = np.eye(4, dtype=np.float32)
                T2[:2, :2] = R2
                T2[:2, 3] = t2
                T2j = jnp.asarray(T2)
                return epsc.compute_descriptors(
                    se3.transform_points(T2j, surf), fc.surf_intensity,
                    lab_surf, fc.surf_mask,
                    se3.transform_points(T2j, corner), fc.sharp_corner_mask,
                    se3.transform_points(T2j, fc.sharp_surf_xyz),
                    fc.sharp_surf_mask,
                    cfg.loop,
                )

            if self.debug is not None:
                self.debug.dump_descriptor(
                    kf.index, cfg.loop.descriptor.value,
                    np.asarray(self.loop_detector._select(desc)))
            rpy = pose6[:3]
            cands = self.loop_detector.add_and_detect(
                desc, np.array([pose6[3], pose6[4], rpy[2]]), recompute,
                signature_np=sig_np,
            )
            for c in cands:
                with self.timer.stage("loop_verify"):
                    self._verify_loop(kf, c)

        # --- submap grouping ---
        finished = self.collector.add_keyframe(kf)
        if finished is not None:
            with self.timer.stage("submap_close"):
                self._on_submap(finished)

    # ------------------------------------------------------------------
    def _verify_loop(self, kf: sm.Keyframe, cand: epsc.LoopCandidate):
        """detectLoopClosureForSubMap (subMapOptmizationNode.cpp:2739-2916):
        ICP of the current keyframe cloud against the candidate keyframe's
        submap cloud, seeded with the descriptor transform; gate on
        fitness."""
        cfg = self.cfg
        match_kf = self.keyframes[cand.matched_id]
        if match_kf.submap_id < 0 or match_kf.submap_id >= len(
                self.collector.submaps):
            return
        target = self.collector.submaps[match_kf.submap_id]
        # initial guess: candidate kf pose composed with descriptor transform
        T_init = match_kf.pose_init @ cand.transform
        th = knn.build_hash(
            target.surf_xyz, target.surf_mask, cell_size=1.0,
            table_size=1 << 15,
        )
        res = icp_ops.icp(
            kf.surf_xyz, kf.surf_mask, target.surf_xyz, th,
            jnp.asarray(T_init.astype(np.float32)),
            max_correspond_dist=2.0,
            max_iterations=cfg.loop.icp_max_iterations,
            point_to_plane=True,
        )
        fit = float(res.fitness)
        if fit < cfg.loop.history_fitness_score:
            T_kf_world = np.asarray(res.transform)
            self.loops.append(
                (kf.index, cand.matched_id, T_kf_world, fit)
            )
            if self.debug is not None:
                self.debug.add_loop_edge(
                    kf.index, cand.matched_id, kf.pose_init[:3, 3],
                    match_kf.pose_init[:3, 3], fit)

    # ------------------------------------------------------------------
    def _register_submaps(self, prev: sm.SubMap, cur: sm.SubMap) -> np.ndarray:
        """Submap-to-submap LOAM registration (extractSubMapCloud +
        subMap2SubMapOptimization, subMapOptmizationNode.cpp:3976-4081,
        4485-4540): refine the relative transform between consecutive
        submaps inside their bbox intersection (<=30 iterations). Returns
        the refined measurement z = T_prev^-1 @ T_cur_refined."""
        cfg = self.cfg
        # bbox intersection crop (reference crops both clouds)
        if prev.bbox is None or cur.bbox is None:
            return np.linalg.inv(prev.pose_init) @ cur.pose_init
        lo = np.maximum(prev.bbox[0], cur.bbox[0]) - 2.0
        hi = np.minimum(prev.bbox[1], cur.bbox[1]) + 2.0
        if np.any(lo >= hi):
            return np.linalg.inv(prev.pose_init) @ cur.pose_init
        lo_j, hi_j = jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)
        pc_mask = sm.bbox_mask(prev.corner_xyz, prev.corner_mask, lo_j, hi_j)
        ps_mask = sm.bbox_mask(prev.surf_xyz, prev.surf_mask, lo_j, hi_j)
        cc_mask = sm.bbox_mask(cur.corner_xyz, cur.corner_mask, lo_j, hi_j)
        cs_mask = sm.bbox_mask(cur.surf_xyz, cur.surf_mask, lo_j, hi_j)

        # express current submap's points in its own frame; optimize its pose
        T_cur = jnp.asarray(cur.pose_init.astype(np.float32))
        Ti = se3.transform_inverse(T_cur)
        cur_c_local = se3.transform_points(Ti, cur.corner_xyz)
        cur_s_local = se3.transform_points(Ti, cur.surf_xyz)
        pose0 = se3.matrix_to_pose(T_cur)
        gn = scan_match.scan_to_map(
            pose0, cur_c_local, cc_mask, cur_s_local, cs_mask,
            prev.corner_xyz, pc_mask, prev.surf_xyz, ps_mask,
            cfg.matching, cfg.matching.max_iterations_submap2submap,
        )
        refined = np.asarray(se3.pose_to_matrix(gn.pose))
        # sanity: reject refinements that jump too far from the odometry
        delta = np.linalg.inv(cur.pose_init) @ refined
        if np.linalg.norm(delta[:3, 3]) > 2.0:
            refined = cur.pose_init
        return np.linalg.inv(prev.pose_init) @ refined

    # ------------------------------------------------------------------
    def _on_submap(self, finished: sm.SubMap):
        """addOdomFactor per new submap + any pending loop factors +
        optimize + correctPoses."""
        gb = self.graph
        idx = gb.add_node(finished.pose_init)
        assert idx == finished.index
        self._drain_gps()  # fixes whose interval this submap now covers
        if idx > 0:
            prev = self.collector.submaps[idx - 1]
            z = self._register_submaps(prev, finished)
            gb.add_odom_edge(idx - 1, idx, z)
        # loop factors whose submaps both exist now
        new_loops = []
        added = False
        for (kf_i, kf_j, T_kf_world, fit) in self.loops:
            si = self.keyframes[kf_i].submap_id
            sj = self.keyframes[kf_j].submap_id
            if si < 0 or sj < 0:
                new_loops.append((kf_i, kf_j, T_kf_world, fit))
                continue
            # relative submap measurement via the ICP-verified keyframe pose
            sub_i = self.collector.submaps[si]
            sub_j = self.collector.submaps[sj]
            T_si = (
                T_kf_world
                @ np.linalg.inv(self.keyframes[kf_i].pose_init)
                @ sub_i.pose_init
            )
            z = np.linalg.inv(sub_j.pose_init) @ T_si
            gb.add_loop_edge(sj, si, z, scale=1.0 / max(fit, 1e-2))
            added = True
        self.loops = new_loops
        if added or idx % 5 == 0:
            with self.timer.stage("graph_optimize"):
                opt = gb.optimize()
            for k, s in enumerate(self.collector.submaps):
                s.pose_opt = opt[k]

    # ------------------------------------------------------------------
    def add_gps(self, position_xyz: np.ndarray, cov_xyz: np.ndarray,
                timestamp: float | None = None):
        """Ingest a GPS fix (addGPSFactor, subMapOptmizationNode.cpp:4217-
        4301): gated on covariance. With a `timestamp`, the fix is buffered
        and attached to the submap whose keyframe interval contains it (the
        reference time-matches fixes to keyframes within 0.2 s,
        :4230-4243); without one it attaches to the most recent submap
        (degraded legacy behavior). Elevation is de-weighted by the caller
        passing a large z covariance (useGpsElevation=false)."""
        cfg = self.cfg
        if float(np.max(cov_xyz[:2])) > cfg.graph.gps_cov_threshold:
            return False
        if timestamp is not None:
            self._gps_queue.append(
                (float(timestamp), np.asarray(position_xyz, np.float64),
                 np.asarray(cov_xyz, np.float64)))
            self._drain_gps()
            return True
        if not self.collector.submaps:
            return False
        node = self.collector.submaps[-1].index
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = position_xyz
        self.graph.add_gps_prior(node, T, np.sqrt(np.maximum(cov_xyz, 1e-6)))
        return True

    def _drain_gps(self):
        """Attach buffered fixes to the submap containing their timestamp.

        The graph node is the submap base pose, so the fix (which measures
        the position at the matched KEYFRAME's time) is pulled back through
        the keyframe's relative pose within the submap."""
        if not self.collector.submaps:
            return
        remaining = []
        for (t, pos, cov) in self._gps_queue:
            matched = None
            for s in self.collector.submaps:
                ts = [self.keyframes[k].timestamp for k in s.kf_indices]
                if ts and min(ts) - 0.1 <= t <= max(ts) + 0.1:
                    j = int(np.argmin(np.abs(np.asarray(ts) - t)))
                    matched = (s, s.kf_rel_poses[j])
                    break
            if matched is None:
                last_kf_t = (self.keyframes[-1].timestamp
                             if self.keyframes else -np.inf)
                if t > last_kf_t:
                    remaining.append((t, pos, cov))  # future submap
                continue
            s, rel = matched
            # implied submap-base position: p_gps - R_submap @ rel_t
            R = s.pose_init[:3, :3]
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = pos - R @ rel[:3, 3]
            self.graph.add_gps_prior(
                s.index, T, np.sqrt(np.maximum(cov, 1e-6)))
        self._gps_queue = remaining

    # ------------------------------------------------------------------
    def finish(self, build_map: bool = False) -> SlamResult:
        """finishMap service equivalent: flush the last submap, final
        optimization, trajectory correction (transformFusion)."""
        tail = self.collector.flush()
        if tail is not None:
            self._on_submap(tail)
        if self.collector.submaps:
            opt = self.graph.optimize()
            for k, s in enumerate(self.collector.submaps):
                s.pose_opt = opt[k]

        raw = np.asarray(self.scan_poses)
        corrected = raw.copy()
        # correct keyframe poses through their submap; propagate to scans
        kf_corr = {}
        for kf in self.keyframes:
            if kf.submap_id >= 0:
                s = self.collector.submaps[kf.submap_id]
                rel = np.linalg.inv(s.pose_init) @ kf.pose_init
                kf_corr[kf.index] = s.pose_opt @ rel
        # per-scan: apply the correction of the most recent keyframe
        T_all = np.asarray(
            se3.pose_to_matrix(jnp.asarray(raw, dtype=jnp.float32)))
        kf_ptr = -1
        delta = np.eye(4)
        for i in range(len(raw)):
            while (kf_ptr + 1 < len(self.kf_scan_ids)
                   and self.kf_scan_ids[kf_ptr + 1] <= i):
                kf_ptr += 1
                kf = self.keyframes[kf_ptr]
                if kf.index in kf_corr:
                    delta = kf_corr[kf.index] @ np.linalg.inv(kf.pose_init)
            T_corr = delta @ T_all[i]
            corrected[i] = np.asarray(
                se3.matrix_to_pose(jnp.asarray(T_corr, dtype=jnp.float32)))

        global_map = None
        if build_map and self.collector.submaps:
            pts = []
            for s in self.collector.submaps:
                m = np.asarray(s.surf_mask)
                p = np.asarray(s.surf_xyz)[m]
                rel = s.pose_opt @ np.linalg.inv(s.pose_init)
                p = p @ rel[:3, :3].T + rel[:3, 3]
                pts.append(np.concatenate(
                    [p, np.zeros((len(p), 1), np.float32)], 1))
            global_map = np.concatenate(pts) if pts else None

        if self.debug is not None:
            self.debug.flush_loop_markers()
            if global_map is not None:
                self.debug.dump_cloud(
                    "global_map", global_map[:, :3],
                    global_map[:, 3].astype(np.int32))

        return SlamResult(
            poses=corrected,
            raw_poses=raw,
            keyframe_ids=np.asarray(self.kf_scan_ids),
            n_submaps=len(self.collector.submaps),
            n_loops=len(
                [e for e in self.graph.edges if abs(e[0] - e[1]) > 1]),
            global_map=global_map,
            stage_ms={k: v.mean_ms for k, v in self.timer.stats.items()},
        )

    # ------------------------------------------------------------------
    def save_trajectory(self, path: str):
        """KITTI-format export (transformFusion :5079-5179)."""
        res = self.finish()
        trajectory.write_kitti(path, res.poses)
        return res
