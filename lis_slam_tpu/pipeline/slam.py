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

from .. import labels as L
from ..config import SlamConfig
from ..graph import pose_graph
from ..imu import preintegration as pi
from ..loop import epsc
from ..mapping import submap as sm
from ..ops import icp as icp_ops
from ..ops import knn, scan_match, voxel
from ..utils import profiling, se3, se3_np
from . import odometry, semantic_odometry as semo, trajectory

# Mean residual weight per super-category, w-bar = mean(2 - label_sorce)
# over the category's learning classes. LEGACY FALLBACK ONLY: since round 5
# the per-point weights ride the submap class merge (SubMap.class_w) and
# stage 3 weights per point exactly like stages 1-2 (subMapOptmizationNode.
# cpp:4556-4966); these means are used only for submaps restored from
# pre-round-5 checkpoints that carry no weight payload.
_CAT_WEIGHT = tuple(
    float(np.mean(L.RESIDUAL_WEIGHT[L.LEARNING_TO_CATEGORY == k]))
    for k in range(len(L.CATEGORY_IDS))
)
# dense category indices in CATEGORY_IDS order
_DYN, _GND, _BLD, _POLE, _OUT = range(5)


class FusedState(NamedTuple):
    """Device state threaded through the fused per-scan program."""

    odom: odometry.OdomState
    sem: semo.SemanticOdomState
    # front-end / refined poses at the last keyframe, for the stage-1
    # initial-guess composition (the reference seeds the back-end from its
    # own odometry stream, subMapOptmizationNode.cpp:896-1032)
    last_frontend: jnp.ndarray  # (6,)
    last_refined: jnp.ndarray  # (6,)
    # --- IMU fusion state (cfg.imu.use_imu): the reference runs IMU
    # preintegration factors INSIDE the back-end node that builds submaps
    # (IMUPreintegration, subMapOptmizationNode.cpp:2007-2219) and feeds the
    # fused odometry back to deskew (:3440-3462, consumed at
    # laserProcessingNode.cpp:41-45); here the whole chain — preintegrate,
    # predict-as-initial-guess, two-window bias/velocity MAP update, sticky
    # failure latch — lives inside the ONE fused per-scan program. ---
    imu: pi.ImuState | None = None
    prev_pre: pi.PreintegratedImu | None = None  # interval [i-2, i-1]
    imu_pose0: jnp.ndarray | None = None  # (6,) pose at prev window start
    imu_v0: jnp.ndarray | None = None  # (3,) velocity estimate at pose0
    imu_have_prev: jnp.ndarray | None = None  # () bool: prev_pre is live
    imu_fail: jnp.ndarray | None = None  # () bool sticky failure latch
    # raw PREVIOUS scan's IMU window (lidar frame): preintegrated at the
    # NEXT step, clipped to the actual inter-scan interval — the window
    # delivered with a scan covers its sweep+slack, but the delta that
    # predicts the next pose must span exactly [t_{i-1}, t_i] (the
    # reference integrates between consecutive odometry stamps,
    # subMapOptmizationNode.cpp:2096-2118)
    prev_imu_time: jnp.ndarray | None = None  # (M,)
    prev_imu_gyro: jnp.ndarray | None = None  # (M, 3) lidar frame
    prev_imu_accel: jnp.ndarray | None = None  # (M, 3) lidar frame
    prev_imu_valid: jnp.ndarray | None = None  # (M,)
    prev_scan_start: jnp.ndarray | None = None  # ()


class StepOut(NamedTuple):
    """Per-scan outputs. Scalars are fetched in drain batches; the cloud
    payloads stay on device as references (only keyframes keep them)."""

    pose: jnp.ndarray  # (6,) front-end pose
    refined: jnp.ndarray  # (6,) stage-1 refined pose (== pose w/o labels)
    is_keyframe: jnp.ndarray  # () bool
    converged: jnp.ndarray  # () bool
    degenerate: jnp.ndarray  # () bool
    imu_fail: jnp.ndarray  # () bool sticky IMU failure latch (use_imu)
    # () bool: the preintegration window for THIS step clipped to an empty
    # interval (pre.count == 0). With IMU data supplied every scan this
    # staying True means the caller's imu_time clock and the scan_start
    # clock disagree and the LIO chain is inert — surfaced as a host
    # warning at drain time instead of failing silently.
    imu_win_empty: jnp.ndarray
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
    class_w: jnp.ndarray  # (5, Qk) per-point residual weights
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
    from the batched drain afterwards.

    When cfg.imu.use_imu, the IMU fusion chain runs INSIDE this same
    program (the reference fuses IMU factors inside the node that builds
    submaps, subMapOptmizationNode.cpp:2007-2219, and feeds the fused
    odometry back to deskew :3440-3462): preintegrate the scan's window at
    the current biases -> predicted pose becomes the initial guess (and the
    lidar-frame gyro stream deskews) -> after the scan-to-map solve, the
    covariance-weighted two-window bias/velocity MAP update + sticky
    failure latch."""
    use_lio = cfg.imu.use_imu and fstate.imu is not None
    prev_pose_scan = fstate.odom.pose  # previous scan's pose (pose1)
    pre = window_ok = not_first = None
    if use_lio:
        # normalize the accel window to max_imu_per_scan rows at trace
        # time: ScanInput.imu_accel's default is sized for the default
        # config (64), so a caller with a larger max_imu_per_scan who
        # leaves it unset would otherwise crash preintegrate's lax.scan
        # with a leading-dimension mismatch next step
        m_imu = cfg.imu.max_imu_per_scan
        if scan.imu_accel.shape[0] != m_imu:
            k = min(scan.imu_accel.shape[0], m_imu)
            ia = jnp.zeros((m_imu, 3), jnp.float32).at[:, 2].set(
                cfg.imu.gravity)
            scan = scan._replace(imu_accel=ia.at[:k].set(scan.imu_accel[:k]))
        g_l, a_l = pi.imu_to_lidar(scan.imu_gyro, scan.imu_accel, cfg.imu)
        # preintegrate the PREVIOUS scan's window CLIPPED to the actual
        # inter-scan interval [t_{i-1}, t_i]: the delta that moves the nav
        # state from pose_{i-1} to pose_i (the reference integrates between
        # consecutive odometry stamps, subMapOptmizationNode.cpp:2096-2118)
        pre = pi.preintegrate(
            fstate.prev_imu_time, fstate.prev_imu_gyro,
            fstate.prev_imu_accel, fstate.prev_imu_valid,
            fstate.imu.bg, fstate.imu.ba, cfg.imu,
            t0=fstate.prev_scan_start, t1=scan.scan_start)
        pred = pi.predict(fstate.imu, pre, cfg.imu.gravity)
        guess = jnp.concatenate(
            [se3.rot_to_euler(pred.R), pred.p]).astype(jnp.float32)
        window_ok = pre.count >= 1
        not_first = fstate.odom.frame_idx > 0
        scan = scan._replace(
            imu_gyro=g_l,  # lidar-frame rates for the deskew integration
            # positional deskew from the PREDICTED scan-start velocity (the
            # findPosition term, zeroed in the reference for slow
            # platforms): body-frame v at scan start; gated to zero until
            # the velocity estimate is live (first update done)
            deskew_vel=jnp.where(
                fstate.imu_have_prev & window_ok,
                (pred.R.T @ pred.v).astype(jnp.float32),
                jnp.zeros(3, jnp.float32)),
            init_guess=guess,
            init_guess_valid=scan.init_guess_valid
            | (window_ok & not_first),
        )
    odom2, out, fc, ext = odometry._odom_step_impl(
        fstate.odom, scan, cfg, uniform=False)

    # ---- IMU post-step: bias/velocity MAP update anchored on the new pose
    # (velocity_bias_update2's two-window coupling — consecutive iSAM2
    # ImuFactors share the velocity variable) + failure detection ----
    imu_fields = {}
    imu_fail_out = jnp.bool_(False)
    imu_win_empty = jnp.bool_(False)
    if use_lio:
        imu_win_empty = ~window_ok
        do_update = not_first & window_ok

        def _upd(op):
            imu, prev_pre, pose0, v0, have_prev = op

            def two(_):
                return pi.velocity_bias_update2(
                    imu, prev_pre, pre, pose0, prev_pose_scan, out.pose,
                    v0, cfg.imu)

            def one(_):
                st = pi.velocity_bias_update(
                    imu, pre, prev_pose_scan, out.pose, cfg.imu)
                # st.v is the window-mean velocity — the best available
                # seed for the next two-window solve's v0_est
                return st, st.v

            return jax.lax.cond(have_prev, two, one, None)

        def _anchor(op):
            imu, *_ = op
            st = imu._replace(
                R=se3.euler_to_rot(out.pose[:3]), p=out.pose[3:])
            return st, jnp.zeros(3)

        new_imu, v1 = jax.lax.cond(
            do_update, _upd, _anchor,
            (fstate.imu, fstate.prev_pre, fstate.imu_pose0, fstate.imu_v0,
             fstate.imu_have_prev))
        fail = pi.failure_detection(new_imu.v, new_imu.bg, new_imu.ba)
        imu_fail_out = fstate.imu_fail | (do_update & fail)
        imu_fields = dict(
            imu=new_imu,
            prev_pre=pre,
            imu_pose0=prev_pose_scan,
            imu_v0=v1,
            imu_have_prev=do_update,
            imu_fail=imu_fail_out,
            # stash the raw current window (lidar frame) — preintegrated at
            # the next step, clipped to the realized inter-scan interval
            prev_imu_time=scan.imu_time,
            prev_imu_gyro=g_l,
            prev_imu_accel=a_l,
            prev_imu_valid=scan.imu_valid,
            prev_scan_start=jnp.asarray(scan.scan_start, jnp.float32),
        )
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
            class_w = sscan.class_w
        else:
            new_sem, refined = sem, out.pose
            lab_surf = jnp.zeros(fc.surf_xyz.shape[0], jnp.int32)
            class_xyz = jnp.zeros((5, qk, 3))
            class_mask = jnp.zeros((5, qk), bool)
            class_w = jnp.ones((5, qk))
        desc = epsc.compute_descriptors(
            fc.surf_xyz, fc.surf_intensity, lab_surf, fc.surf_mask,
            fc.sharp_corner_xyz, fc.sharp_corner_mask,
            fc.sharp_surf_xyz, fc.sharp_surf_mask, cfg.loop,
        )
        return (new_sem, out.pose, refined, lab_surf, class_xyz, class_mask,
                class_w,
                epsc.select_descriptor(desc, cfg.loop.descriptor),
                desc.signature)

    def skip_branch(op):
        sem, lf, lr = op
        return (sem, lf, lr,
                jnp.zeros(fc.surf_xyz.shape[0], jnp.int32),
                jnp.zeros((5, qk, 3)), jnp.zeros((5, qk), bool),
                jnp.ones((5, qk)),
                jnp.zeros((R, S)), jnp.zeros((epsc._SIG_SECTORS, 4)))

    (sem2, lf2, lr2, lab_surf, class_xyz, class_mask, class_w, desc_sel,
     signature) = jax.lax.cond(
        out.is_keyframe, kf_branch, skip_branch,
        (fstate.sem, fstate.last_frontend, fstate.last_refined))

    new_state = FusedState(
        odom=odom2, sem=sem2, last_frontend=lf2, last_refined=lr2,
        **imu_fields)
    step_out = StepOut(
        pose=out.pose,
        refined=jnp.where(out.is_keyframe, lr2, out.pose),
        is_keyframe=out.is_keyframe,
        converged=out.converged, degenerate=out.degenerate,
        imu_fail=imu_fail_out, imu_win_empty=imu_win_empty,
        corner_xyz=fc.corner_xyz, corner_mask=fc.corner_mask,
        surf_xyz=fc.surf_xyz, surf_mask=fc.surf_mask,
        surf_intensity=fc.surf_intensity,
        sharp_corner_xyz=fc.sharp_corner_xyz,
        sharp_corner_mask=fc.sharp_corner_mask,
        sharp_surf_xyz=fc.sharp_surf_xyz,
        sharp_surf_mask=fc.sharp_surf_mask,
        lab_surf=lab_surf, class_xyz=class_xyz, class_mask=class_mask,
        class_w=class_w, desc_sel=desc_sel, signature=signature,
    )
    return new_state, step_out


@jax.jit
def _pack_scalars(poses, refineds, kfs, convs, degens, fails, win_empties):
    """Stack the drain scalars into ONE array so the batched readback is a
    single D2H transfer: (K, 17) = pose6 | refined6 | is_kf, conv, degen,
    imu_fail, imu_win_empty."""
    flags = jnp.stack(
        [jnp.stack(kfs), jnp.stack(convs), jnp.stack(degens),
         jnp.stack(fails), jnp.stack(win_empties)], axis=1)
    return jnp.concatenate(
        [jnp.stack(poses), jnp.stack(refineds),
         flags.astype(jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _imu_reset(fstate: FusedState, cfg: SlamConfig) -> FusedState:
    """resetParams equivalent (failureDetection -> reinitialize,
    subMapOptmizationNode.cpp:2153-2156, 2222-2238): re-anchor the nav
    state at the current lidar pose with fresh biases/priors."""
    pose = fstate.odom.pose
    imu = pi.init_imu_state(cfg.imu)._replace(
        R=se3.euler_to_rot(pose[:3]), p=pose[3:])
    return fstate._replace(
        imu=imu, imu_have_prev=jnp.bool_(False), imu_fail=jnp.bool_(False))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _register_submaps_geo(prev_corner, prev_corner_mask, prev_surf,
                          prev_surf_mask, cur_corner, cur_corner_mask,
                          cur_surf, cur_surf_mask, T_cur, lo, hi, cfg):
    """Geometric submap-to-submap registration as ONE device program
    (extractSubMapCloud + subMap2SubMapOptimization, subMapOptmizationNode.
    cpp:3976-4081, 4485-4540). The round-3 host-side version dispatched the
    same math op-by-op (no jit) — ~5.3 s/call of eager round-trips on the
    tunneled TPU; this wrapper is one async dispatch."""
    pc_mask = sm.bbox_mask(prev_corner, prev_corner_mask, lo, hi)
    ps_mask = sm.bbox_mask(prev_surf, prev_surf_mask, lo, hi)
    cc_mask = sm.bbox_mask(cur_corner, cur_corner_mask, lo, hi)
    cs_mask = sm.bbox_mask(cur_surf, cur_surf_mask, lo, hi)
    Ti = se3.transform_inverse(T_cur)
    # matched-source downsample (the reference matches the voxel-DS submap
    # cloud, not the raw merge) — also compacts the query buffers from
    # submap capacity (64k/128k) to the matched capacities
    c_src, c_m, _ = voxel.voxel_downsample(
        se3.transform_points(Ti, cur_corner), cc_mask,
        cfg.voxel.submap_corner_leaf, cfg.submap.matched_corner_capacity)
    s_src, s_m, _ = voxel.voxel_downsample(
        se3.transform_points(Ti, cur_surf), cs_mask,
        cfg.submap.refine_surf_leaf, cfg.submap.matched_surf_capacity)
    gn = scan_match.scan_to_map(
        se3.matrix_to_pose(T_cur), c_src, c_m, s_src, s_m,
        prev_corner, pc_mask, prev_surf, ps_mask,
        cfg.matching, cfg.matching.max_iterations_submap2submap,
    )
    return se3.pose_to_matrix(gn.pose)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _register_submaps_sem(prev_class_xyz, prev_class_mask, cur_class_xyz,
                          cur_class_mask, cur_class_w, T_cur, lo, hi, cfg):
    """Semantic-weighted submap-to-submap registration (the reference's
    THIRD LOAM copy, subMapOptmizationNode.cpp:4556-4966): corner features =
    pole class, surf = dynamic+ground+building, residuals weighted PER
    POINT by w = 2 - LabelSorce[learning class] (:4556-4966) carried
    through the submap class merge (round 4 approximated these with
    category means). One device program per call."""
    # target: previous submap's per-class clouds, bbox-cropped
    t_corner = prev_class_xyz[_POLE]
    t_corner_m = sm.bbox_mask(t_corner, prev_class_mask[_POLE], lo, hi)
    t_surf = jnp.concatenate(
        [prev_class_xyz[_DYN], prev_class_xyz[_GND], prev_class_xyz[_BLD]], 0)
    t_surf_m = sm.bbox_mask(
        t_surf,
        jnp.concatenate([prev_class_mask[_DYN], prev_class_mask[_GND],
                         prev_class_mask[_BLD]], 0),
        lo, hi)
    # re-morton the concatenated target so the kNN kernel's tile AABBs stay
    # spatially compact (each class buffer is only sorted within itself)
    t_surf, t_surf_m, _ = scan_match._morton_sort_queries(
        t_surf, t_surf_m, None)

    # source: current submap's class clouds in its own frame + per-point
    # weights riding the downsample
    Ti = se3.transform_inverse(T_cur)
    cc_mask = sm.bbox_mask(cur_class_xyz[_POLE], cur_class_mask[_POLE],
                           lo, hi)
    c_src0 = se3.transform_points(Ti, cur_class_xyz[_POLE])
    c_w0 = cur_class_w[_POLE].astype(jnp.float32)
    s_all = jnp.concatenate(
        [cur_class_xyz[_DYN], cur_class_xyz[_GND], cur_class_xyz[_BLD]], 0)
    cs_mask = sm.bbox_mask(
        s_all,
        jnp.concatenate([cur_class_mask[_DYN], cur_class_mask[_GND],
                         cur_class_mask[_BLD]], 0),
        lo, hi)
    s_src0 = se3.transform_points(Ti, s_all)
    s_w0 = jnp.concatenate([
        cur_class_w[_DYN], cur_class_w[_GND], cur_class_w[_BLD],
    ]).astype(jnp.float32)
    c_src, c_m, _, c_w = voxel.voxel_downsample(
        c_src0, cc_mask, cfg.voxel.submap_corner_leaf,
        cfg.submap.matched_corner_capacity, payloads=(c_w0,))
    s_src, s_m, _, s_w = voxel.voxel_downsample(
        s_src0, cs_mask, cfg.submap.refine_surf_leaf,
        cfg.submap.matched_surf_capacity, payloads=(s_w0,))
    gn = scan_match.scan_to_map(
        se3.matrix_to_pose(T_cur), c_src, c_m, s_src, s_m,
        t_corner, t_corner_m, t_surf, t_surf_m,
        cfg.matching, cfg.matching.max_iterations_submap2submap,
        corner_sem_weight=c_w, surf_sem_weight=s_w,
    )
    return se3.pose_to_matrix(gn.pose)


@functools.partial(jax.jit, static_argnames=(
    "max_iterations", "max_correspond_dist", "cell_size", "table_size",
    "src_leaf", "src_capacity", "tgt_leaf", "tgt_capacity", "refresh_iters"))
def _verify_loop_device(kf_surf, kf_mask, tgt_xyz, tgt_mask, T_init,
                        max_iterations, max_correspond_dist, cell_size,
                        table_size, src_leaf, src_capacity, tgt_leaf,
                        tgt_capacity, refresh_iters):
    """Loop ICP verification as ONE device program: voxel-compact both
    clouds, hash build + seeded point-to-plane ICP
    (detectLoopClosureForSubMap, subMapOptmizationNode.cpp:2739-2916; ICP
    params cfg.loop.verify_*). `tgt_xyz` is the submap's merged SEMANTIC
    cloud when semantics flow (the reference verifies against the submap's
    merged labeled clouds, :2838-2842 / subMap.h:269-277 — which are the
    per-class voxel-DOWNSAMPLED variants, so the compaction below is
    parity, not an approximation). The downsample also compacts the
    capacity-padded submap buffer (5 x class_capacity slots, mostly masked)
    to `tgt_capacity` real rows — at padded size this one call was 433 ms
    on-device and dominated multi-lap endurance replay (docs/PERF.md r5)."""
    src_c, src_m, _ = voxel.voxel_downsample(
        kf_surf, kf_mask, src_leaf, src_capacity)
    tgt_c, tgt_m, _ = voxel.voxel_downsample(
        tgt_xyz, tgt_mask, tgt_leaf, tgt_capacity)
    th = knn.build_hash(tgt_c, tgt_m, cell_size=cell_size,
                        table_size=table_size)
    return icp_ops.icp(
        src_c, src_m, tgt_c, th, T_init,
        max_correspond_dist=max_correspond_dist,
        max_iterations=max_iterations,
        point_to_plane=True,
        refresh_iters=refresh_iters,
    )


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
    imu_supplied: bool = False  # caller passed an IMU window this scan


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
        imu_fields = {}
        if cfg.imu.use_imu:
            m = cfg.imu.max_imu_per_scan
            zero_pre = pi.preintegrate(
                jnp.zeros(m), jnp.zeros((m, 3)), jnp.zeros((m, 3)),
                jnp.zeros(m, bool), jnp.zeros(3), jnp.zeros(3), cfg.imu)
            imu_fields = dict(
                imu=pi.init_imu_state(cfg.imu),
                prev_pre=zero_pre,
                imu_pose0=jnp.zeros(6, jnp.float32),
                imu_v0=jnp.zeros(3, jnp.float32),
                imu_have_prev=jnp.bool_(False),
                imu_fail=jnp.bool_(False),
                prev_imu_time=jnp.zeros(m, jnp.float32),
                prev_imu_gyro=jnp.zeros((m, 3), jnp.float32),
                prev_imu_accel=jnp.zeros((m, 3), jnp.float32),
                prev_imu_valid=jnp.zeros(m, bool),
                prev_scan_start=jnp.float32(0.0),
            )
        self.fstate = FusedState(
            odom=odometry.init_state(cfg),
            sem=semo.init_state(cfg),
            last_frontend=jnp.zeros(6, jnp.float32),
            last_refined=jnp.zeros(6, jnp.float32),
            **imu_fields,
        )
        self.n_imu_resets = 0
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
        # incremental (timestamp, submap, rel_pose) index for GPS matching,
        # appended at submap close (sorted by construction) + its cached
        # numpy timestamp view for searchsorted
        self._kf_time_index: list[tuple] = []
        self._kf_times_np: np.ndarray | None = None
        self._indexed_submaps = 0  # prefix of submaps already in the index
        self._released_submaps = 0  # prefix of submaps w/ released kf clouds
        self.loops: list[tuple[int, int, np.ndarray, float]] = []  # kf i,j
        self._n_loop_factors = 0  # actual loop factors added to the graph
        # submap pairs that already hold a loop factor (or have one in
        # flight): the reference dedups candidate loops against existing
        # pairs BEFORE verification (subMapOptmizationNode.cpp:2431-2476)
        self._loop_pairs: set[tuple[int, int]] = set()
        # KEYFRAME pairs with an ICP verification in flight: dedups
        # duplicate dispatches within the verify latency window (a rejected
        # verify releases its entry so the pair can be retried later).
        # Keyed on keyframe ids — stable across submap closes — and mapped
        # to submap pairs at check time: a submap-pair key computed at
        # dispatch goes stale when the open submap closes before the drain
        self._verify_inflight: set[tuple[int, int]] = set()
        self._scan_idx = 0
        self._imu_inert_scans = 0  # consecutive supplied-but-empty windows
        self._zeros_lab = jnp.zeros(cfg.sensor.max_raw_points, jnp.int32)
        # ---- deferred pipeline queues ----
        # snapshotted window awaiting its (delayed) blocking readback:
        # (pend, packed, loop_pend, verify_pend, sub_pend, opt_pend,
        #  bbox_pend) — see _drain
        self._inflight: tuple | None = None
        self._factors_dirty = False  # odom factors added since last optimize
        self._defer_opt = False  # terminal flush: collapse optimizes to one
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
                     timestamp: float | None = None,
                     imu_time: np.ndarray | None = None,
                     imu_gyro: np.ndarray | None = None,
                     imu_accel: np.ndarray | None = None,
                     imu_rpy: np.ndarray | None = None) -> jnp.ndarray:
        """Feed one scan; returns the (device-resident) odometry pose6 —
        materialize with np.asarray if needed on the host.

        `timestamp`: scan header time in seconds (defaults to
        scan_idx * scan_period), used for GPS time-matching.

        Labels for the semantic stages come from `gt_labels` when provided
        (synthetic ground truth / an external segmentation stream), else
        from on-device RangeNet inference at keyframe rate
        (semanticFusionNode.cpp:139-170).

        With cfg.imu.use_imu, pass the scan's IMU window
        (`imu_time/imu_gyro/imu_accel`, raw IMU frame, absolute seconds;
        optional `imu_rpy` orientation at scan start): the fused step then
        runs the full LIO chain — preintegrated initial guess, gyro deskew,
        two-window bias/velocity update, failure latch — inside the same
        device program (IMUPreintegration, subMapOptmizationNode.cpp:
        2007-2219 + odometry/fusion feedback :3440-3462)."""
        imu_supplied = (self.cfg.imu.use_imu and imu_time is not None
                        and len(imu_time) > 0)
        if timestamp is not None:
            t = timestamp
        elif imu_supplied:
            # the preintegration window is clipped to
            # [prev_scan_start, scan_start]: deriving scan_start from the
            # synthetic scan_idx * scan_period clock while imu_time uses a
            # different (e.g. absolute) clock collapses the window to an
            # empty interval and silently disables the whole LIO chain —
            # so without an explicit timestamp the scan stamp must come
            # from the SAME clock as the IMU window
            t = float(imu_time[0])
        else:
            t = self._scan_idx * self.cfg.sensor.scan_period
        if imu_supplied:
            from . import driver as _driver

            it, ig, ia, iv = _driver.pad_imu_window(
                self.cfg, imu_time, imu_gyro, imu_accel)
            extra = dict(
                imu_time=jnp.asarray(it), imu_gyro=jnp.asarray(ig),
                imu_accel=jnp.asarray(ia),
                imu_valid=jnp.asarray(iv),
                # the preintegration window is CLIPPED to
                # [prev_scan_start, scan_start] inside slam_step; when the
                # IMU window arrives through these kwargs the scan-start
                # stamp must advance with it, or the clipped window
                # collapses to [0, 0] and the whole LIO chain is silently
                # inert (window_ok never holds)
                scan_start=jnp.float32(t),
            )
            if imu_rpy is not None:
                rpy = pi.remap_imu_orientation(imu_rpy, self.cfg.imu)
                extra["imu_rpy"] = jnp.asarray(rpy, jnp.float32)
                extra["imu_rpy_valid"] = jnp.bool_(True)
            scan = scan._replace(**extra)
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
        self._pending.append(
            _PendingScan(self._scan_idx, t, out, imu_supplied))
        self._scan_idx += 1
        if len(self._pending) >= max(1, self.cfg.runtime.drain_every):
            with self.timer.stage("drain"):
                self._drain()
        return out.pose

    # ------------------------------------------------------------------
    def _drain(self):
        """Snapshot the current window's device handles (the per-scan
        scalar pack is dispatched here, async), then fetch and consume the
        PREVIOUS window's results with ONE blocking transfer.

        The one-window delay is the round-5 change that removed the 76%
        drain stall of round 4: a same-window readback blocks the host on
        the window's whole device compute chain (the pack depends on the
        last scan's step), while window N-1's chain has had all of window
        N's dispatch time to finish — by consume time the get is a pure
        ~25 ms tunnel transfer and the device pipeline never runs dry.
        Loop scores / ICP verifies / submap registrations / graph solves
        already had this latency structure (the reference's concurrent
        2 Hz loop + 1 Hz optimize threads are off the 10 Hz path the same
        way, subMapOptmizationNode.cpp:3798-3886); now the per-scan
        scalars do too. Keyframe bookkeeping therefore lags dispatch by up
        to 2*drain_every scans — including the IMU failure-latch reset
        (see RuntimeConfig.drain_every)."""
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

        packed = None
        if pend:
            packed = _pack_scalars(
                [p.out.pose for p in pend],
                [p.out.refined for p in pend],
                [p.out.is_keyframe for p in pend],
                [p.out.converged for p in pend],
                [p.out.degenerate for p in pend],
                [p.out.imu_fail for p in pend],
                [p.out.imu_win_empty for p in pend])
        cur = (pend, packed, loop_pend, verify_pend, sub_pend, opt_pend,
               bbox_pend)
        if not (pend or loop_pend or verify_pend or sub_pend
                or opt_pend is not None or bbox_pend):
            cur = None
        prev, self._inflight = self._inflight, cur
        if prev is not None:
            self._consume(*prev)
        # dispatch submap registrations whose bboxes are now both known
        # (installed by this or an earlier consume) — lives here, not in
        # _consume, so queued registrations still dispatch when no window
        # is in flight (flush_pipeline termination)
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
                prev_s = self.collector.submaps[i]
                cur_s = self.collector.submaps[j]
                fallback = np.linalg.inv(prev_s.pose_init) @ cur_s.pose_init
                with self.timer.stage("submap_register"):
                    dev = self._register_submaps_dispatch(prev_s, cur_s)
                self._pending_submap.append(
                    (i, j, prev_s.pose_init.copy(), cur_s.pose_init.copy(),
                     fallback, dev))
        # ---- loop factors + (async) global optimize: dispatched here,
        # installed when its window is consumed (the reference's 1 Hz
        # subMapOptmizationThread has the same off-critical-path latency).
        # Runs every _drain — not inside _consume — so verified loops
        # still flush when no window is in flight. During a terminal
        # flush (_defer_opt) the dispatch is suppressed: factors land
        # one-per-iteration there, and re-solving the full graph after
        # each would serialize several large-bucket LM programs on the
        # device for results nothing reads — flush_pipeline runs ONE
        # solve at the end instead (the reference's explicit final
        # optimization on finishMap does the same collapsing). ----
        if self._flush_loop_factors() or self._factors_dirty:
            if self._defer_opt:
                self._factors_dirty = True
            else:
                self._factors_dirty = False
                with self.timer.stage("graph_optimize"):
                    self._pending_opt = self.graph.optimize_async()

    def _consume(self, pend, packed, loop_pend, verify_pend, sub_pend,
                 opt_pend, bbox_pend):
        """Blocking fetch + host bookkeeping for one snapshotted window:
        per-scan poses, keyframe registration, loop-candidate dispatch,
        loop/verify result consumption, submap grouping."""
        fetch = [None, None, None, None, None, None]
        fetch[0] = packed
        if loop_pend:
            fetch[1] = [res for (_kf, _ids, res) in loop_pend]
        if verify_pend:
            fetch[2] = [(r.transform, r.fitness)
                        for (_kf, _cand, _key, r) in verify_pend]
        if sub_pend:
            fetch[3] = [dev for (*_rest, dev) in sub_pend]
        if opt_pend is not None:
            fetch[4] = opt_pend[1]
        if bbox_pend:
            fetch[5] = [dev for (_s, dev) in bbox_pend]
        (scalars, loop_res, verify_res, sub_res,
         opt_res, bbox_res) = jax.device_get(tuple(fetch))

        # ---- install submap bboxes (consumed by the registration
        # dispatch back in _drain) ----
        if bbox_pend:
            for (s, _dev), b in zip(bbox_pend, bbox_res):
                s.install_bbox(np.asarray(b))

        # ---- install the optimized node poses (dispatched last drain) ----
        if opt_pend is not None:
            opt = self.graph.consume_optimized(opt_pend[0], opt_res)
            for k in range(min(len(opt), len(self.collector.submaps))):
                self.collector.submaps[k].pose_opt = opt[k]

        # ---- consume submap-to-submap registrations -> odom factors ----
        # Every new factor triggers a (async) global optimize below — the
        # reference updates iSAM2 on every saveSubMapAndFactor
        # (subMapOptmizationNode.cpp:4084-4185); there is no skip cadence.
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
                    # (cfg.submap.register_jump_reject_m)
                    if (np.linalg.norm(delta[:3, 3])
                            > self.cfg.submap.register_jump_reject_m):
                        z = fallback
                    else:
                        z = np.linalg.inv(prev_init) @ refined
                self.graph.add_odom_edge(i, j, z)
                any_factor = True

        # ---- consume verified loops (dispatched 2 drains ago) ----
        if verify_pend:
            for (kf_i, cand_id, kf_pair, _r), (T_np, fit) in zip(
                    verify_pend, verify_res):
                self._verify_inflight.discard(kf_pair)
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
        imu_failed = False
        for row, p in zip(
                scalars if pend else [], pend):
            pose6 = np.asarray(row[:6])
            refined6 = np.asarray(row[6:12])
            is_kf, conv, _deg = bool(row[12] > 0.5), bool(
                row[13] > 0.5), bool(row[14] > 0.5)
            imu_failed = imu_failed or bool(row[15] > 0.5)
            # inert-LIO diagnostic: IMU data supplied but the clipped
            # preintegration window came back empty — a clock mismatch
            # between imu_time and the scan timestamps leaves the whole
            # fusion chain silently disabled (window_ok never holds)
            if p.imu_supplied and bool(row[16] > 0.5) and p.idx > 0:
                self._imu_inert_scans += 1
                if self._imu_inert_scans == 3:
                    import warnings

                    warnings.warn(
                        "IMU windows supplied but the preintegration "
                        "window clipped empty on 3 consecutive scans: "
                        "imu_time and the scan `timestamp` clocks likely "
                        "disagree; LIO fusion is inert.",
                        RuntimeWarning, stacklevel=2)
            elif p.imu_supplied:
                self._imu_inert_scans = 0
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

        # ---- IMU failure reset (the sticky latch caught a divergence on
        # some scan of this drain window): resetParams equivalent, one
        # async dispatch, no sync (failureDetection,
        # subMapOptmizationNode.cpp:2222-2238) ----
        if imu_failed and self.cfg.imu.use_imu:
            self.fstate = _imu_reset(self.fstate, self.cfg)
            self.n_imu_resets += 1

        # new odom factors this consume -> the optimize dispatch back in
        # _drain fires even when no loop flushed
        self._factors_dirty = self._factors_dirty or any_factor

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
                clouds=sm.ClassClouds(xyz=out.class_xyz, mask=out.class_mask,
                                      w=out.class_w),
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
    def _loop_pair_key(self, kf_i: int, kf_j: int) -> tuple[int, int]:
        """Submap-pair dedup key. A keyframe whose submap hasn't closed yet
        belongs to the OPEN submap (= next index): collector._cur_kfs holds
        it, so its eventual submap_id is len(submaps)."""
        si = self.keyframes[kf_i].submap_id
        sj = self.keyframes[kf_j].submap_id
        if si < 0:
            si = len(self.collector.submaps)
        if sj < 0:
            sj = len(self.collector.submaps)
        return (min(si, sj), max(si, sj))

    def _dispatch_verify(self, kf_index: int, cand: epsc.LoopCandidate):
        """detectLoopClosureForSubMap (subMapOptmizationNode.cpp:2739-2916):
        ICP of the keyframe cloud against the candidate keyframe's submap
        cloud, seeded with the descriptor transform; dispatched async (ONE
        jitted program), the fitness gate is applied when the result drains.

        Candidates whose submap pair already holds a loop factor are skipped
        (the reference dedups against existing pairs before verification,
        :2431-2476). The target is the submap's merged SEMANTIC cloud when
        semantics flow (the reference verifies against the merged labeled
        cloud, subMap.h:435-664), else its surf cloud."""
        cfg = self.cfg
        kf = self.keyframes[kf_index]
        match_kf = self.keyframes[cand.matched_id]
        if match_kf.submap_id < 0 or match_kf.submap_id >= len(
                self.collector.submaps):
            return
        if kf.released:  # source clouds evicted (can't happen for a
            return  # just-created keyframe; guards replay-from-checkpoint)
        key = self._loop_pair_key(kf_index, cand.matched_id)
        if key in self._loop_pairs:
            return
        # recompute in-flight pairs' submap keys NOW (stable vs submap
        # closes between their dispatch and drain); the in-flight set is a
        # handful of entries at most, the scan is free
        if any(self._loop_pair_key(a, b) == key
               for (a, b) in self._verify_inflight):
            return
        kf_pair = (min(kf_index, cand.matched_id),
                   max(kf_index, cand.matched_id))
        self._verify_inflight.add(kf_pair)
        target = self.collector.submaps[match_kf.submap_id]
        T_init = match_kf.pose_init @ cand.transform
        with self.timer.stage("loop_verify"):
            if target.class_xyz is not None:
                tgt_xyz = target.class_xyz.reshape(-1, 3)
                tgt_mask = target.class_mask.reshape(-1)
            else:
                tgt_xyz, tgt_mask = target.surf_xyz, target.surf_mask
            res = _verify_loop_device(
                kf.surf_xyz, kf.surf_mask, tgt_xyz, tgt_mask,
                jnp.asarray(T_init.astype(np.float32)),
                cfg.loop.icp_max_iterations,
                cfg.loop.verify_max_correspond_dist,
                cfg.loop.verify_hash_cell_size,
                cfg.loop.verify_hash_table_size,
                cfg.loop.verify_source_leaf,
                cfg.loop.verify_source_capacity,
                cfg.loop.verify_target_leaf,
                cfg.loop.verify_target_capacity,
                tuple(cfg.loop.verify_refresh_iters),
            )
        self._pending_verify.append((kf_index, cand.matched_id, kf_pair, res))

    # ------------------------------------------------------------------
    def _register_submaps_dispatch(self, prev: sm.SubMap, cur: sm.SubMap):
        """Submap-to-submap LOAM registration (extractSubMapCloud +
        subMap2SubMapOptimization, subMapOptmizationNode.cpp:3976-4081,
        4485-4540): refine the relative transform between consecutive
        submaps inside their bbox intersection (<=30 iterations).

        Dispatch-only: ONE jitted device program (semantic-weighted when
        both submaps carry class clouds, geometric otherwise); returns the
        DEVICE refined pose matrix (or None when the bboxes don't
        intersect). The odom factor z = T_prev^-1 @ T_cur_refined is formed
        when the result is fetched at the next drain."""
        cfg = self.cfg
        # bbox intersection crop (reference crops both clouds)
        pb, cb = prev.get_bbox(), cur.get_bbox()
        if pb is None or cb is None:
            return None
        lo = np.maximum(pb[0], cb[0]) - cfg.submap.bbox_margin_m
        hi = np.minimum(pb[1], cb[1]) + cfg.submap.bbox_margin_m
        if np.any(lo >= hi):
            return None
        lo_j, hi_j = jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)
        T_cur = jnp.asarray(cur.pose_init.astype(np.float32))
        if prev.class_xyz is not None and cur.class_xyz is not None:
            cur_w = cur.class_w
            if cur_w is None:  # legacy checkpoints: category-mean weights
                cur_w = jnp.broadcast_to(
                    jnp.asarray(_CAT_WEIGHT, jnp.float32)[:, None],
                    cur.class_mask.shape)
            return _register_submaps_sem(
                prev.class_xyz, prev.class_mask, cur.class_xyz,
                cur.class_mask, cur_w, T_cur, lo_j, hi_j, cfg)
        return _register_submaps_geo(
            prev.corner_xyz, prev.corner_mask, prev.surf_xyz, prev.surf_mask,
            cur.corner_xyz, cur.corner_mask, cur.surf_xyz, cur.surf_mask,
            T_cur, lo_j, hi_j, cfg)

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
        # endurance policy: free the device clouds of keyframes whose
        # submap closed release_after_submaps ago — nothing reads them
        # again (the submap merge consumed them at ITS close; loop
        # verification sources only recent keyframes and targets the
        # SUBMAP's merged clouds). Matches the reference's container
        # eviction (odomEstimationNode.cpp:591-593).
        n_keep = self.cfg.submap.release_after_submaps
        if n_keep > 0:
            upto = len(self.collector.submaps) - n_keep
            while self._released_submaps < upto:
                for k in self.collector.submaps[
                        self._released_submaps].kf_indices:
                    self.keyframes[k].release_clouds()
                self._released_submaps += 1

    def _flush_loop_factors(self) -> bool:
        """Add pending verified loops whose submaps both exist; returns
        whether any factor was added (addLoopFactor :4304-4342). At most ONE
        factor per submap pair (the reference's loop dedup,
        subMapOptmizationNode.cpp:2431-2476)."""
        gb = self.graph
        new_loops = []
        added = False
        for (kf_i, kf_j, T_kf_world, fit) in self.loops:
            si = self.keyframes[kf_i].submap_id
            sj = self.keyframes[kf_j].submap_id
            if si < 0 or sj < 0:
                new_loops.append((kf_i, kf_j, T_kf_world, fit))
                continue
            pair = (min(si, sj), max(si, sj))
            if pair in self._loop_pairs:
                continue
            self._loop_pairs.add(pair)
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
        `_gps_dropped` instead of vanishing silently.

        The keyframe-timestamp index is INCREMENTAL (appended at submap
        close, cached as a sorted array): the round-4 version rebuilt it
        over ALL submaps on every call — O(N^2) host bookkeeping on a
        city-length run."""
        # catch the index up to the closed submaps (submaps close in time
        # order, so appends keep it sorted)
        while self._indexed_submaps < len(self.collector.submaps):
            s = self.collector.submaps[self._indexed_submaps]
            for k, rel in zip(s.kf_indices, s.kf_rel_poses):
                self._kf_time_index.append(
                    (self.keyframes[k].timestamp, s, rel))
            self._indexed_submaps += 1
            self._kf_times_np = None  # invalidate the searchsorted cache
        if not self._kf_time_index:
            return
        tol = 0.2
        if self._kf_times_np is None:
            self._kf_times_np = np.asarray(
                [e[0] for e in self._kf_time_index])
        kt_np = self._kf_times_np
        remaining = []
        # fixes newer than the last CLOSED submap's coverage stay queued:
        # their keyframe exists but its submap hasn't been cut yet
        closed_until = kt_np[-1]
        for (t, pos, cov) in self._gps_queue:
            # nearest keyframe time via bisection (index is sorted)
            j = int(np.searchsorted(kt_np, t))
            if j >= len(kt_np) or (
                    j > 0 and t - kt_np[j - 1] < kt_np[j] - t):
                j -= 1
            if abs(kt_np[j] - t) > tol:
                if t > closed_until:
                    remaining.append((t, pos, cov))  # open/future submap
                else:
                    self._gps_dropped += 1
                continue
            _t, s, rel = self._kf_time_index[j]
            # implied submap-base position: p_gps - R_submap @ rel_t
            R = s.pose_init[:3, :3]
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = pos - R @ rel[:3, 3]
            self.graph.add_gps_prior(
                s.index, T, np.sqrt(np.maximum(cov, 1e-6)))
        self._gps_queue = remaining

    # ------------------------------------------------------------------
    def predict_imu_rate(self, imu_time: np.ndarray, imu_gyro: np.ndarray,
                         imu_accel: np.ndarray) -> jnp.ndarray:
        """IMU-rate odometry from the FULL pipeline (the reference
        back-end publishes odometry/imu per IMU sample from imuHandler,
        subMapOptmizationNode.cpp:429-511): world pose6 at every sample of
        the given window, propagated from the fused step's current nav
        state (lidar-anchored, bias-corrected inside slam_step) — a
        high-rate pose stream for consumers (controllers, viz) between
        the scan-rate updates of process_scan. One device call; returns a
        DEVICE (M, 6) array (np.asarray to materialize).

        Note the nav state advances inside the async per-scan program, so
        the prediction base is the most recently DISPATCHED scan — the
        same freshness the reference's imuHandler gets from its odometry
        callback."""
        assert self.cfg.imu.use_imu and self.fstate.imu is not None, (
            "predict_imu_rate requires cfg.imu.use_imu")
        from . import driver as _driver

        it, ig, ia, iv = _driver.pad_imu_window(
            self.cfg, imu_time, imu_gyro, imu_accel)
        k = int(iv.sum())
        ig_l, ia_l = pi.imu_to_lidar(
            jnp.asarray(ig), jnp.asarray(ia), self.cfg.imu)
        Rs, _vs, ps = pi.predict_path(
            jnp.asarray(it), ig_l, ia_l, jnp.asarray(iv),
            self.fstate.imu, self.cfg.imu)
        return se3.matrix_to_pose(se3.make_transform(Rs, ps))[:k]

    # ------------------------------------------------------------------
    def flush_pipeline(self):
        """Drain every deferred stage (pending scans, the in-flight
        snapshotted window, loop scores, ICP verifications, submap
        registrations, graph solves) to a quiescent state.

        Loop/odom factors landing during the flush are accumulated and
        solved ONCE at the end rather than re-dispatching a full-graph
        LM per drain iteration (each verified loop consumed in its own
        iteration used to trigger its own large-bucket solve, serialized
        on the one device stream — termination cost that grew with graph
        size; the reference's finishMap runs one explicit final
        optimization the same way, subMapOptmizationNode.cpp:4346-4385)."""
        import os as _os
        import time as _time

        dbg = _os.environ.get("LIS_FLUSH_DEBUG")
        self._defer_opt = True
        try:
            while (self._pending or self._inflight is not None
                   or self._pending_loop or self._pending_verify
                   or self._pending_submap or self._pending_opt is not None
                   or self._pending_bbox or self._to_register):
                if dbg:
                    import sys as _sys

                    comp = (f"pend={len(self._pending)} "
                            f"infl={self._inflight is not None:d} "
                            f"loop={len(self._pending_loop)} "
                            f"verify={len(self._pending_verify)} "
                            f"sub={len(self._pending_submap)} "
                            f"opt={self._pending_opt is not None:d} "
                            f"bbox={len(self._pending_bbox)} "
                            f"toreg={len(self._to_register)}")
                    _t1 = _time.perf_counter()
                    self._drain()
                    print(f"[flush] {1e3 * (_time.perf_counter() - _t1):8.1f}"
                          f" ms  {comp}", file=_sys.stderr, flush=True)
                else:
                    self._drain()
        finally:
            self._defer_opt = False
        if self._factors_dirty:
            self._factors_dirty = False
            _t1 = _time.perf_counter()
            with self.timer.stage("graph_optimize"):
                nw, dev = self.graph.optimize_async()
            opt = self.graph.consume_optimized(
                nw, np.asarray(jax.device_get(dev)))
            for k in range(min(len(opt), len(self.collector.submaps))):
                self.collector.submaps[k].pose_opt = opt[k]
            if dbg:
                import sys as _sys

                print(f"[flush] final solve "
                      f"{1e3 * (_time.perf_counter() - _t1):8.1f} ms "
                      f"({len(self.graph.nodes)} nodes, "
                      f"{len(self.graph.edges)} edges)",
                      file=_sys.stderr, flush=True)

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
        # per-scan: apply the correction of the most recent keyframe.
        # Pure numpy (se3_np): the loop runs once per SCAN, and an eager
        # device op here costs a tunnel dispatch each — on a 1,000-scan
        # endurance run the old jnp round-trips made finish() take ~20 s
        # for trajectory correction alone (round-5 profile_flush_tail).
        if len(raw):
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
                T_corr = delta @ se3_np.pose_to_matrix(raw[i])
                corrected[i] = se3_np.matrix_to_pose(T_corr)

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
