"""Full semantic SLAM pipeline: odometry + semantics + submaps + loop
closure + global pose graph.

This is the TPU-native equivalent of the reference's five-node ROS graph
(SURVEY.md section 1) collapsed into ONE fused per-scan device program plus
a host pipeline that never blocks on the device at scan rate:

 - front-end per-scan odometry   -> pipeline/odometry.py
 - semantic inference/fusion     -> models/rangenet.py + semantic/fusion.py
   (semanticFusionNode), run INSIDE the per-scan program under lax.cond at
   keyframe rate
 - stage-1 semantic refinement   -> pipeline/semantic_odometry.py
   (SubMapOdometryNode), same cond branch
 - EPSC descriptors              -> loop/epsc.py, same cond branch
 - keyframe -> submap grouping   -> mapping/submap.py (makeSubMapThread)
 - loop closure                  -> loop/epsc.py batched candidate scoring
   + ICP verification (loopClosureThread), dispatched asynchronously and
   consumed one drain cycle later — the reference's 2 Hz loop thread has
   the same latency structure
 - global optimization           -> graph/pose_graph.py (replaces iSAM2)
 - trajectory / map export       -> pipeline/trajectory.py (transformFusion)

Host<->device discipline (the round-2 bottleneck): the per-scan hot path is
ONE async dispatch; results (pose, keyframe flag, refined pose) are packed
on-device and fetched in batches of `cfg.runtime.drain_every` scans with a
single blocking transfer (a D2H sync costs ~50 ms on a tunneled TPU, so
per-scan syncs cap the whole system at ~20 scans/s no matter how fast the
device is). Keyframe-rate work (loop scoring, ICP verification) is
dispatched when a drain reveals a keyframe and its results are fetched at
the NEXT drain — mirroring the reference's concurrent thread structure
(module_loam.launch:4-10, loopClosureThread subMapOptmizationNode.cpp:
2328-2492) instead of its pub/sub transport.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..graph import pose_graph
from ..loop import epsc
from ..mapping import submap as sm
from ..ops import icp as icp_ops
from ..ops import knn, scan_match, voxel
from ..utils import profiling, se3, se3_np
from . import odometry, semantic_odometry as semo, trajectory


class FusedState(NamedTuple):
    """Device state threaded through the fused per-scan program."""

    odom: odometry.OdomState
    sem: semo.SemanticOdomState
    # front-end / refined poses at the last keyframe, for the stage-1
    # initial-guess composition (the reference seeds the back-end from its
    # own odometry stream, subMapOptmizationNode.cpp:896-1032)
    last_frontend: jnp.ndarray  # (6,)
    last_refined: jnp.ndarray  # (6,)


class StepOut(NamedTuple):
    """Per-scan outputs. Scalars are fetched in drain batches; the cloud
    payloads stay on device as references (only keyframes keep them)."""

    pose: jnp.ndarray  # (6,) front-end pose
    refined: jnp.ndarray  # (6,) stage-1 refined pose (== pose w/o labels)
    is_keyframe: jnp.ndarray  # () bool
    converged: jnp.ndarray  # () bool
    degenerate: jnp.ndarray  # () bool
    # feature clouds (sensor frame) — computed every scan by the front end
    corner_xyz: jnp.ndarray
    corner_mask: jnp.ndarray
    surf_xyz: jnp.ndarray
    surf_mask: jnp.ndarray
    surf_intensity: jnp.ndarray
    sharp_corner_xyz: jnp.ndarray
    sharp_corner_mask: jnp.ndarray
    sharp_surf_xyz: jnp.ndarray
    sharp_surf_mask: jnp.ndarray
    # keyframe-rate payloads (zeros on non-keyframe scans)
    lab_surf: jnp.ndarray  # (Sk,) learning-class per surf feature
    class_xyz: jnp.ndarray  # (5, Qk, 3) per-category keyframe clouds
    class_mask: jnp.ndarray  # (5, Qk)
    desc_sel: jnp.ndarray  # (R, S) selected loop descriptor
    signature: jnp.ndarray  # (360, 4)


@functools.partial(
    jax.jit, static_argnames=("cfg", "lab_mode", "model", "infer_cfg"),
    donate_argnames=("fstate",))
def slam_step(fstate: FusedState, scan: odometry.ScanInput,
              lab_raw: jnp.ndarray, model_vars, cfg: SlamConfig,
              lab_mode: str, model=None, infer_cfg=None):
    """ONE device program per scan: front-end odometry every scan, plus —
    under `lax.cond(is_keyframe, ...)`, so non-keyframe scans pay nothing —
    semantic labeling (`lab_mode`: "gt" uses lab_raw, "infer" runs RangeNet
    on-device, "none" disables semantics), stage-1 semantic-weighted
    refinement, per-category keyframe clouds, and EPSC descriptors.

    The host never needs to know is_keyframe at dispatch time; it learns it
    from the batched drain afterwards."""
    odom2, out, fc, ext = odometry._odom_step_impl(
        fstate.odom, scan, cfg, uniform=False)
    with_sem = lab_mode != "none"
    qk = cfg.submap.keyframe_class_capacity
    R, S = cfg.loop.rings, cfg.loop.sectors

    def kf_branch(op):
        sem, _lf, _lr = op
        if lab_mode == "infer":
            from ..semantic import inference as sem_inf

            lab, _img = sem_inf.infer_scan_labels(
                model, model_vars, scan.points, scan.valid, infer_cfg)
            lab = lab.astype(jnp.int32)
        else:
            lab = lab_raw
        if with_sem:
            # reuse the front end's projection: ext.src gathers the labels
            # onto the compacted grid (no second pretreat/project pass)
            sscan = semo.semantic_scan_from_ext(ext, lab, cfg)
            T_inc = (se3.pose_to_matrix(out.pose)
                     @ se3.transform_inverse(se3.pose_to_matrix(_lf)))
            guess = se3.matrix_to_pose(T_inc @ se3.pose_to_matrix(_lr))
            guess = jnp.where(sem.kf_count == 0, out.pose, guess)
            new_sem, refined, _gn = semo.refine_step(sem, sscan, guess, cfg)
            # surf features carry their raw-point index (FeatureClouds.
            # surf_src), so the per-feature label is a direct gather —
            # replaces the round-2 hash-build + kNN lookup (~56 ms/kf)
            lab_surf = jnp.where(
                fc.surf_src >= 0,
                lab[jnp.clip(fc.surf_src, 0, lab.shape[0] - 1)], 0,
            ).astype(jnp.int32)
            class_xyz, class_mask = sscan.class_xyz, sscan.class_mask
        else:
            new_sem, refined = sem, out.pose
            lab_surf = jnp.zeros(fc.surf_xyz.shape[0], jnp.int32)
            class_xyz = jnp.zeros((5, qk, 3))
            class_mask = jnp.zeros((5, qk), bool)
        desc = epsc.compute_descriptors(
            fc.surf_xyz, fc.surf_intensity, lab_surf, fc.surf_mask,
            fc.sharp_corner_xyz, fc.sharp_corner_mask,
            fc.sharp_surf_xyz, fc.sharp_surf_mask, cfg.loop,
        )
        return (new_sem, out.pose, refined, lab_surf, class_xyz, class_mask,
                epsc.select_descriptor(desc, cfg.loop.descriptor),
                desc.signature)

    def skip_branch(op):
        sem, lf, lr = op
        return (sem, lf, lr,
                jnp.zeros(fc.surf_xyz.shape[0], jnp.int32),
                jnp.zeros((5, qk, 3)), jnp.zeros((5, qk), bool),
                jnp.zeros((R, S)), jnp.zeros((epsc._SIG_SECTORS, 4)))

    (sem2, lf2, lr2, lab_surf, class_xyz, class_mask, desc_sel,
     signature) = jax.lax.cond(
        out.is_keyframe, kf_branch, skip_branch,
        (fstate.sem, fstate.last_frontend, fstate.last_refined))

    new_state = FusedState(
        odom=odom2, sem=sem2, last_frontend=lf2, last_refined=lr2)
    step_out = StepOut(
        pose=out.pose,
        refined=jnp.where(out.is_keyframe, lr2, out.pose),
        is_keyframe=out.is_keyframe,
        converged=out.converged, degenerate=out.degenerate,
        corner_xyz=fc.corner_xyz, corner_mask=fc.corner_mask,
        surf_xyz=fc.surf_xyz, surf_mask=fc.surf_mask,
        surf_intensity=fc.surf_intensity,
        sharp_corner_xyz=fc.sharp_corner_xyz,
        sharp_corner_mask=fc.sharp_corner_mask,
        sharp_surf_xyz=fc.sharp_surf_xyz,
        sharp_surf_mask=fc.sharp_surf_mask,
        lab_surf=lab_surf, class_xyz=class_xyz, class_mask=class_mask,
        desc_sel=desc_sel, signature=signature,
    )
    return new_state, step_out


@jax.jit
def _pack_scalars(poses, refineds, kfs, convs, degens):
    """Stack the drain scalars into ONE array so the batched readback is a
    single D2H transfer: (K, 15) = pose6 | refined6 | is_kf, conv, degen."""
    flags = jnp.stack(
        [jnp.stack(kfs), jnp.stack(convs), jnp.stack(degens)], axis=1)
    return jnp.concatenate(
        [jnp.stack(poses), jnp.stack(refineds),
         flags.astype(jnp.float32)], axis=1)


@dataclass
class SlamResult:
    poses: np.ndarray  # (N, 6) corrected per-scan trajectory
    raw_poses: np.ndarray  # (N, 6) odometry-only trajectory
    keyframe_ids: np.ndarray  # scan index of each keyframe
    n_submaps: int
    n_loops: int
    global_map: np.ndarray | None = None  # (M, 4) xyz + category label
    stage_ms: dict | None = None  # per-stage mean wall-clock (StageTimer)


class _PendingScan(NamedTuple):
    idx: int
    timestamp: float
    out: StepOut


class SemanticSlam:
    """Host-orchestrated full pipeline (config 4 of BASELINE.json)."""

    def __init__(self, cfg: SlamConfig, rangenet_params=None,
                 pose_hook=None, debug_dir: str | None = None):
        """`pose_hook(pose6, scan_idx) -> pose6`: optional transform applied
        to the front-end pose before the back-end consumes it — the seam for
        replaying with degraded odometry (drift-injection tests, external
        odometry sources). Applied at drain time; the device-side stage-1
        refinement sees the clean odometry stream, and the hook's delta is
        composed onto the refined pose so keyframes/submaps/loops all carry
        the injected error exactly as before.

        `debug_dir`: when set, dump the reference's rviz debug surface as
        files — per-keyframe descriptor images, loop-constraint markers,
        stage clouds (viz/debug.py)."""
        self.cfg = cfg
        self.pose_hook = pose_hook
        self.debug = None
        if debug_dir is not None:
            from ..viz.debug import DebugDumper

            self.debug = DebugDumper(debug_dir)
        self.fstate = FusedState(
            odom=odometry.init_state(cfg),
            sem=semo.init_state(cfg),
            last_frontend=jnp.zeros(6, jnp.float32),
            last_refined=jnp.zeros(6, jnp.float32),
        )
        self.loop_detector = epsc.LoopDetector(cfg.loop)
        self.collector = sm.SubMapCollector(cfg.submap)
        self.graph = pose_graph.GraphBuilder(
            cfg.graph, max_nodes=cfg.submap.max_submaps,
            max_edges=cfg.submap.max_submaps * 4,
            max_priors=cfg.submap.max_submaps,
        )
        # --- semantic inference (semanticFusionNode): when semantics are
        # enabled, RangeNet runs inside the fused step's keyframe branch.
        # Weights come from `rangenet_params` (e.g. a training run) or, by
        # default, the in-repo synthetic checkpoint (semantic/weights.py).
        self.model = None
        self.model_vars = rangenet_params
        self._infer_cfg = None
        if cfg.semantic.enabled:
            from ..models import rangenet
            from ..semantic import inference as sem_inf

            if rangenet_params is not None:
                self.model = rangenet.create_model(cfg.semantic)
                self._infer_cfg = cfg
            else:
                try:
                    wrapped = sem_inf.SemanticInference(cfg)
                    self.model = wrapped.model
                    self.model_vars = wrapped.variables
                    self._infer_cfg = wrapped.cfg
                except FileNotFoundError:
                    pass  # no checkpoint shipped/available: labels must be fed

        # per-stage wall-clock averages (the reference's "Average ... time"
        # logs)
        self.timer = profiling.StageTimer()
        self.scan_poses: list[np.ndarray] = []  # per-scan odometry pose6
        self._gps_queue: list[tuple] = []  # (t, pos, cov) awaiting a submap
        self._gps_dropped = 0  # fixes discarded without a matching keyframe
        self.keyframes: list[sm.Keyframe] = []
        self.kf_scan_ids: list[int] = []
        self.loops: list[tuple[int, int, np.ndarray, float]] = []  # kf i,j
        self._n_loop_factors = 0  # actual loop factors added to the graph
        self._scan_idx = 0
        self._zeros_lab = jnp.zeros(cfg.sensor.max_raw_points, jnp.int32)
        # ---- deferred pipeline queues ----
        self._pending: list[_PendingScan] = []
        self._pending_loop: list[tuple[int, np.ndarray, tuple]] = []
        self._pending_verify: list[tuple[int, int, object]] = []
        # submap-to-submap registrations dispatched at close, consumed at
        # the next drain: (prev_idx, idx, prev_init, cur_init, fallback_z,
        # device gn pose | None)
        self._pending_submap: list[tuple] = []
        # one in-flight graph optimize: (n_nodes, device nodes)
        self._pending_opt: tuple[int, object] | None = None
        # submap bboxes awaiting the batched readback: (submap, device bbox)
        self._pending_bbox: list[tuple] = []
        # registrations waiting for both submaps' bboxes: (prev_idx, idx)
        self._to_register: list[tuple[int, int]] = []

    # -- compatibility accessors (bench/tests/checkpoint address the odom /
    # semantic device states directly) --
    @property
    def state(self) -> odometry.OdomState:
        return self.fstate.odom

    @state.setter
    def state(self, v):
        self.fstate = self.fstate._replace(odom=v)

    @property
    def sem_state(self) -> semo.SemanticOdomState:
        return self.fstate.sem

    @sem_state.setter
    def sem_state(self, v):
        self.fstate = self.fstate._replace(sem=v)

    # ------------------------------------------------------------------
    def process_scan(self, scan: odometry.ScanInput,
                     gt_labels: np.ndarray | None = None,
                     timestamp: float | None = None) -> jnp.ndarray:
        """Feed one scan; returns the (device-resident) odometry pose6 —
        materialize with np.asarray if needed on the host.

        `timestamp`: scan header time in seconds (defaults to
        scan_idx * scan_period), used for GPS time-matching.

        Labels for the semantic stages come from `gt_labels` when provided
        (synthetic ground truth / an external segmentation stream), else
        from on-device RangeNet inference at keyframe rate
        (semanticFusionNode.cpp:139-170)."""
        t = (timestamp if timestamp is not None
             else self._scan_idx * self.cfg.sensor.scan_period)
        if gt_labels is not None:
            buf = np.zeros(self.cfg.sensor.max_raw_points, np.int32)
            buf[: min(len(gt_labels), len(buf))] = np.asarray(
                gt_labels)[: len(buf)]
            lab_raw = jnp.asarray(buf)
            lab_mode = "gt"
        elif self.model is not None and self.model_vars is not None:
            lab_raw = self._zeros_lab
            lab_mode = "infer"
        else:
            lab_raw = self._zeros_lab
            lab_mode = "none"
        if lab_mode != "none":
            self.collector.merge_classes = True
        with self.timer.stage("odom_step"):
            self.fstate, out = slam_step(
                self.fstate, scan, lab_raw,
                self.model_vars if lab_mode == "infer" else None,
                self.cfg, lab_mode,
                self.model if lab_mode == "infer" else None,
                self._infer_cfg if lab_mode == "infer" else None)
        self._pending.append(_PendingScan(self._scan_idx, t, out))
        self._scan_idx += 1
        if len(self._pending) >= max(1, self.cfg.runtime.drain_every):
            with self.timer.stage("drain"):
                self._drain()
        return out.pose

    # ------------------------------------------------------------------
    def _drain(self):
        """Fetch all pending results with ONE blocking transfer, then run
        the host-side bookkeeping: per-scan poses, keyframe registration,
        loop-candidate dispatch, loop/verify result consumption, submap
        grouping."""
        pend = self._pending
        self._pending = []
        loop_pend = self._pending_loop
        self._pending_loop = []
        verify_pend = self._pending_verify
        self._pending_verify = []
        sub_pend = self._pending_submap
        self._pending_submap = []
        opt_pend = self._pending_opt
        self._pending_opt = None
        bbox_pend = self._pending_bbox
        self._pending_bbox = []

        fetch = [None, None, None, None, None, None]
        if pend:
            fetch[0] = _pack_scalars(
                [p.out.pose for p in pend],
                [p.out.refined for p in pend],
                [p.out.is_keyframe for p in pend],
                [p.out.converged for p in pend],
                [p.out.degenerate for p in pend])
        if loop_pend:
            fetch[1] = [res for (_kf, _ids, res) in loop_pend]
        if verify_pend:
            fetch[2] = [(r.transform, r.fitness)
                        for (_kf, _cand, r) in verify_pend]
        if sub_pend:
            fetch[3] = [dev for (*_rest, dev) in sub_pend]
        if opt_pend is not None:
            fetch[4] = opt_pend[1]
        if bbox_pend:
            fetch[5] = [dev for (_s, dev) in bbox_pend]
        (scalars, loop_res, verify_res, sub_res,
         opt_res, bbox_res) = jax.device_get(tuple(fetch))

        # ---- install submap bboxes, then dispatch registrations whose
        # submaps both have one ----
        if bbox_pend:
            for (s, _dev), b in zip(bbox_pend, bbox_res):
                s.install_bbox(np.asarray(b))
        if self._to_register:
            ready, waiting = [], []
            for (i, j) in self._to_register:
                if (self.collector.submaps[i].bbox_dev is None
                        and self.collector.submaps[j].bbox_dev is None):
                    ready.append((i, j))
                else:
                    waiting.append((i, j))
            self._to_register = waiting
            for (i, j) in ready:
                prev = self.collector.submaps[i]
                cur = self.collector.submaps[j]
                fallback = np.linalg.inv(prev.pose_init) @ cur.pose_init
                with self.timer.stage("submap_register"):
                    dev = self._register_submaps_dispatch(prev, cur)
                self._pending_submap.append(
                    (i, j, prev.pose_init.copy(), cur.pose_init.copy(),
                     fallback, dev))

        # ---- install the optimized node poses (dispatched last drain) ----
        if opt_pend is not None:
            opt = self.graph.consume_optimized(opt_pend[0], opt_res)
            for k in range(min(len(opt), len(self.collector.submaps))):
                self.collector.submaps[k].pose_opt = opt[k]

        # ---- consume submap-to-submap registrations -> odom factors ----
        any_factor = False
        if sub_pend:
            for (i, j, prev_init, cur_init, fallback, _dev), fetched in zip(
                    sub_pend, sub_res):
                if fetched is None:
                    z = fallback
                else:
                    refined = np.asarray(fetched, np.float64)
                    delta = np.linalg.inv(cur_init) @ refined
                    # reject refinements that jump too far from odometry
                    if np.linalg.norm(delta[:3, 3]) > 2.0:
                        z = fallback
                    else:
                        z = np.linalg.inv(prev_init) @ refined
                self.graph.add_odom_edge(i, j, z)
                any_factor = any_factor or (j % 5 == 0)

        # ---- consume verified loops (dispatched 2 drains ago) ----
        if verify_pend:
            for (kf_i, cand_id, _r), (T_np, fit) in zip(
                    verify_pend, verify_res):
                fit = float(fit)
                if fit < self.cfg.loop.history_fitness_score:
                    self.loops.append(
                        (kf_i, cand_id, np.asarray(T_np), fit))
                    if self.debug is not None:
                        self.debug.add_loop_edge(
                            kf_i, cand_id,
                            self.keyframes[kf_i].pose_init[:3, 3],
                            self.keyframes[cand_id].pose_init[:3, 3], fit)

        # ---- consume loop-candidate scores (dispatched last drain),
        # dispatch ICP verification for accepted candidates ----
        if loop_pend:
            for (kf_i, ids, _res), fetched in zip(loop_pend, loop_res):
                cand = epsc.LoopDetector.result_to_candidate(ids, fetched)
                if cand is not None:
                    self._dispatch_verify(kf_i, cand)

        # ---- per-scan bookkeeping ----
        for row, p in zip(
                scalars if pend else [], pend):
            pose6 = np.asarray(row[:6])
            refined6 = np.asarray(row[6:12])
            is_kf, conv, _deg = bool(row[12] > 0.5), bool(
                row[13] > 0.5), bool(row[14] > 0.5)
            if self.pose_hook is not None:
                hooked = np.asarray(self.pose_hook(pose6, p.idx),
                                    dtype=pose6.dtype)
                delta = (se3_np.pose_to_matrix(hooked)
                         @ np.linalg.inv(se3_np.pose_to_matrix(pose6)))
                pose6 = hooked
                refined6 = se3_np.matrix_to_pose(
                    delta @ se3_np.pose_to_matrix(refined6))
            self.scan_poses.append(pose6)
            if is_kf:
                with self.timer.stage("keyframe"):
                    self._on_keyframe(p, pose6, refined6)

        # ---- loop factors + (async) global optimize: dispatched here,
        # installed at the NEXT drain (the reference's 1 Hz
        # subMapOptmizationThread has the same off-critical-path latency) ----
        if self._flush_loop_factors() or any_factor:
            with self.timer.stage("graph_optimize"):
                self._pending_opt = self.graph.optimize_async()

    # ------------------------------------------------------------------
    def _on_keyframe(self, p: _PendingScan, pose6: np.ndarray,
                     refined6: np.ndarray):
        """Host-side keyframe registration (the device-side work already ran
        inside the fused step): keyframe store, loop-candidate dispatch,
        submap grouping."""
        cfg = self.cfg
        out = p.out
        with self.timer.stage("kf_store"):
            T = se3_np.pose_to_matrix(refined6)

            kf = sm.Keyframe(
                index=len(self.keyframes),
                pose_init=T,
                pose_opt=T.copy(),
                timestamp=p.timestamp,
                clouds=sm.ClassClouds(xyz=out.class_xyz, mask=out.class_mask),
                corner_xyz=out.corner_xyz, corner_mask=out.corner_mask,
                surf_xyz=out.surf_xyz, surf_mask=out.surf_mask,
            )
            self.keyframes.append(kf)
            self.kf_scan_ids.append(p.idx)

        # --- loop detection at keyframe rate (loopClosureThread): gate on
        # host poses, score all candidates in ONE async device call ---
        if cfg.loop.enabled:
            pose_xyyaw = np.array([refined6[3], refined6[4], refined6[2]])
            if self.debug is not None:
                self.debug.dump_descriptor(
                    kf.index, cfg.loop.descriptor.value,
                    np.asarray(out.desc_sel))
            with self.timer.stage("loop_score"):
                ids = self.loop_detector.gate(pose_xyyaw)
                if len(ids):
                    clouds = epsc.CloudRefs(
                        sem_xyz=out.surf_xyz,
                        sem_intensity=out.surf_intensity,
                        sem_label=out.lab_surf, sem_valid=out.surf_mask,
                        corner_xyz=out.sharp_corner_xyz,
                        corner_valid=out.sharp_corner_mask,
                        surf_xyz=out.sharp_surf_xyz,
                        surf_valid=out.sharp_surf_mask,
                    )
                    res = self.loop_detector.score_async(
                        ids, out.signature, clouds, pose_xyyaw)
                    self._pending_loop.append((kf.index, ids, res))
                self.loop_detector.append(
                    out.desc_sel, out.signature, pose_xyyaw)

        # --- submap grouping ---
        with self.timer.stage("kf_collect"):
            finished = self.collector.add_keyframe(kf)
        if finished is not None:
            with self.timer.stage("submap_close"):
                self._on_submap(finished)

    # ------------------------------------------------------------------
    def _dispatch_verify(self, kf_index: int, cand: epsc.LoopCandidate):
        """detectLoopClosureForSubMap (subMapOptmizationNode.cpp:2739-2916):
        ICP of the keyframe cloud against the candidate keyframe's submap
        cloud, seeded with the descriptor transform; dispatched async, the
        fitness gate is applied when the result drains."""
        cfg = self.cfg
        kf = self.keyframes[kf_index]
        match_kf = self.keyframes[cand.matched_id]
        if match_kf.submap_id < 0 or match_kf.submap_id >= len(
                self.collector.submaps):
            return
        target = self.collector.submaps[match_kf.submap_id]
        T_init = match_kf.pose_init @ cand.transform
        with self.timer.stage("loop_verify"):
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
        self._pending_verify.append((kf_index, cand.matched_id, res))

    # ------------------------------------------------------------------
    def _register_submaps_dispatch(self, prev: sm.SubMap, cur: sm.SubMap):
        """Submap-to-submap LOAM registration (extractSubMapCloud +
        subMap2SubMapOptimization, subMapOptmizationNode.cpp:3976-4081,
        4485-4540): refine the relative transform between consecutive
        submaps inside their bbox intersection (<=30 iterations).

        Dispatch-only: returns the DEVICE pose6 of the refined current
        submap pose (or None when the bboxes don't intersect); the odom
        factor z = T_prev^-1 @ T_cur_refined is formed when the result is
        fetched at the next drain."""
        cfg = self.cfg
        # bbox intersection crop (reference crops both clouds)
        pb, cb = prev.get_bbox(), cur.get_bbox()
        if pb is None or cb is None:
            return None
        lo = np.maximum(pb[0], cb[0]) - 2.0
        hi = np.minimum(pb[1], cb[1]) + 2.0
        if np.any(lo >= hi):
            return None
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
        return se3.pose_to_matrix(gn.pose)

    # ------------------------------------------------------------------
    def _on_submap(self, finished: sm.SubMap):
        """Submap close: add the graph node, dispatch the submap-to-submap
        registration asynchronously (consumed + optimized at the next
        drain — addOdomFactor/saveSubMapAndFactor equivalent)."""
        gb = self.graph
        idx = gb.add_node(finished.pose_init)
        assert idx == finished.index
        self._pending_bbox.append((finished, finished.bbox_dev))
        self._drain_gps()  # fixes whose interval this submap now covers
        if idx > 0:
            # registration waits for both bboxes (batched readback), then
            # dispatches; its factor lands one further drain later
            self._to_register.append((idx - 1, idx))

    def _flush_loop_factors(self) -> bool:
        """Add pending verified loops whose submaps both exist; returns
        whether any factor was added (addLoopFactor :4304-4342)."""
        gb = self.graph
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
            self._n_loop_factors += 1
            added = True
        self.loops = new_loops
        return added

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
        """Attach buffered fixes to the submap containing their timestamp
        (reference time-matches within 0.2 s, :4230-4243).

        The graph node is the submap base pose, so the fix (which measures
        the position at the matched KEYFRAME's time) is pulled back through
        the keyframe's relative pose within the submap. Fixes that fall in
        a gap between submap intervals attach to the globally nearest
        keyframe if within tolerance; otherwise they are counted in
        `_gps_dropped` instead of vanishing silently."""
        if not self.collector.submaps:
            return
        tol = 0.2
        # globally nearest submap-assigned keyframe per fix (the reference
        # time-matches fixes to keyframes within 0.2 s, :4230-4243)
        kt, ks, kr = [], [], []
        for s in self.collector.submaps:
            for k, rel in zip(s.kf_indices, s.kf_rel_poses):
                kt.append(self.keyframes[k].timestamp)
                ks.append(s)
                kr.append(rel)
        kt_np = np.asarray(kt)
        remaining = []
        # fixes newer than the last CLOSED submap's coverage stay queued:
        # their keyframe exists but its submap hasn't been cut yet
        closed_until = kt_np.max() if len(kt_np) else -np.inf
        for (t, pos, cov) in self._gps_queue:
            j = int(np.argmin(np.abs(kt_np - t)))
            if abs(kt_np[j] - t) > tol:
                if t > closed_until:
                    remaining.append((t, pos, cov))  # open/future submap
                else:
                    self._gps_dropped += 1
                continue
            s, rel = ks[j], kr[j]
            # implied submap-base position: p_gps - R_submap @ rel_t
            R = s.pose_init[:3, :3]
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = pos - R @ rel[:3, 3]
            self.graph.add_gps_prior(
                s.index, T, np.sqrt(np.maximum(cov, 1e-6)))
        self._gps_queue = remaining

    # ------------------------------------------------------------------
    def flush_pipeline(self):
        """Drain every deferred stage (pending scans, loop scores, ICP
        verifications, submap registrations, graph solves) to a quiescent
        state."""
        while (self._pending or self._pending_loop or self._pending_verify
               or self._pending_submap or self._pending_opt is not None
               or self._pending_bbox or self._to_register):
            self._drain()

    def finish(self, build_map: bool = False) -> SlamResult:
        """finishMap service equivalent: flush the pipeline + last submap,
        final optimization, trajectory correction (transformFusion)."""
        self.flush_pipeline()
        tail = self.collector.flush()
        if tail is not None:
            self._on_submap(tail)
            self.flush_pipeline()  # consume the tail's registration factor
        self._flush_loop_factors()
        if self.collector.submaps:
            opt = self.graph.optimize()
            for k, s in enumerate(self.collector.submaps):
                s.pose_opt = opt[k]

        raw = np.asarray(self.scan_poses, dtype=np.float64).reshape(-1, 6)
        corrected = raw.copy()
        # correct keyframe poses through their submap; propagate to scans
        kf_corr = {}
        for kf in self.keyframes:
            if kf.submap_id >= 0:
                s = self.collector.submaps[kf.submap_id]
                rel = np.linalg.inv(s.pose_init) @ kf.pose_init
                kf_corr[kf.index] = s.pose_opt @ rel
        # per-scan: apply the correction of the most recent keyframe
        if len(raw):
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
                        delta = kf_corr[kf.index] @ np.linalg.inv(
                            kf.pose_init)
                T_corr = delta @ T_all[i]
                corrected[i] = np.asarray(
                    se3.matrix_to_pose(jnp.asarray(T_corr, jnp.float32)))

        global_map = None
        if build_map and self.collector.submaps:
            global_map = self.build_global_map()

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
            n_loops=self._n_loop_factors,
            global_map=global_map,
            stage_ms={k: v.mean_ms for k, v in self.timer.stats.items()},
        )

    # ------------------------------------------------------------------
    def build_global_map(self) -> np.ndarray | None:
        """LABELED global map export (visualizeGlobalMapThread's
        laserCloudMapColor, subMapOptmizationNode.cpp:3472-3574): per-submap
        per-category clouds in the OPTIMIZED frame, label column = category
        using-label id (labels.CATEGORY_IDS); geometric surf points that the
        semantic clouds don't cover are appended with label 0."""
        from .. import labels as L

        pts = []
        for s in self.collector.submaps:
            rel = s.pose_opt @ np.linalg.inv(s.pose_init)
            sub_pts = []
            if s.class_xyz is not None:
                cx = np.asarray(s.class_xyz)
                cm = np.asarray(s.class_mask)
                for k in range(cx.shape[0]):
                    p = cx[k][cm[k]]
                    if not len(p):
                        continue
                    p = p @ rel[:3, :3].T + rel[:3, 3]
                    lab = np.full((len(p), 1), float(L.CATEGORY_IDS[k]),
                                  np.float32)
                    sub_pts.append(np.concatenate([p, lab], 1))
            if not sub_pts:  # geometric-only submap: surf cloud, label 0
                m = np.asarray(s.surf_mask)
                p = np.asarray(s.surf_xyz)[m]
                p = p @ rel[:3, :3].T + rel[:3, 3]
                sub_pts.append(np.concatenate(
                    [p, np.zeros((len(p), 1), np.float32)], 1))
            pts.extend(sub_pts)
        return np.concatenate(pts) if pts else None

    # ------------------------------------------------------------------
    def save_trajectory(self, path: str):
        """KITTI-format export (transformFusion :5079-5179)."""
        res = self.finish()
        trajectory.write_kitti(path, res.poses)
        return res
