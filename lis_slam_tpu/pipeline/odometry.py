"""Front-end odometry pipeline: one jitted per-scan step.

TPU-native rebuild of `src/node/odomEstimationNode.cpp` (multi-frame-target
mode, USING_MULTI_FRAME_TARGET :10,:185-207): the per-scan callback chain

    updateInitialGuess -> currentCloudInit -> scan2SubMapOptimization
    -> transformUpdate -> saveKeyFrames (+ sliding 20-keyframe target map)

becomes a single `odom_step(state, scan) -> (state, odom_out)` jitted
function over fixed-shape buffers. The ROS pub/sub seams disappear; the
host driver (driver.py) just streams padded scan arrays in and poses out.

State layout (all fixed capacity, mask-padded):
 - sliding keyframe window: K slots of voxel-downsampled world-frame corner /
   surf clouds (ring buffer, reference keeps last 20,
   odomEstimationNode.cpp:452-467),
 - merged target map + voxel-hash NN structures, rebuilt on keyframe insert
   (reference rebuilds its map + KD-trees whenever the window changes),
 - pose, previous pose, and the constant-velocity increment for the initial
   guess cascade (:297-419; IMU branches live in the LIO pipeline).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import deskew as deskew_ops
from ..ops import features as feat_ops
from ..ops import pretreatment, projection, scan_match, voxel
from ..utils import se3


class OdomState(NamedTuple):
    pose: jnp.ndarray  # (6,)
    prev_pose: jnp.ndarray  # (6,)
    incr: jnp.ndarray  # (4, 4) constant-velocity increment
    frame_idx: jnp.ndarray  # () int32

    kf_poses: jnp.ndarray  # (K, 6)
    kf_count: jnp.ndarray  # () int32 total keyframes ever
    kf_head: jnp.ndarray  # () int32 ring-buffer slot for next insert
    last_kf_pose: jnp.ndarray  # (6,)

    map_corner: jnp.ndarray  # (Mc, 3)
    map_corner_age: jnp.ndarray  # (Mc,) keyframe index of last observation
    map_corner_mask: jnp.ndarray
    map_surf: jnp.ndarray  # (Ms, 3)
    map_surf_age: jnp.ndarray
    map_surf_mask: jnp.ndarray


class OdomOutput(NamedTuple):
    pose: jnp.ndarray  # (6,) optimized pose for this scan
    is_keyframe: jnp.ndarray  # () bool
    converged: jnp.ndarray  # () bool
    degenerate: jnp.ndarray  # () bool
    n_valid: jnp.ndarray  # () int32 solver correspondences
    iterations: jnp.ndarray  # () int32


def init_state(cfg: SlamConfig) -> OdomState:
    K = cfg.keyframe.window_size
    mc = cfg.matching.corner_map_capacity
    ms = cfg.matching.surf_map_capacity
    # NOTE: every field gets its OWN buffer (no shared zero6): the step
    # donates its state argument, and donating the same underlying buffer
    # through two fields is a runtime error ("donate the same buffer twice")
    return OdomState(
        pose=jnp.zeros(6, jnp.float32),
        prev_pose=jnp.zeros(6, jnp.float32),
        incr=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.int32(0),
        kf_poses=jnp.zeros((K, 6), jnp.float32),
        kf_count=jnp.int32(0),
        kf_head=jnp.int32(0),
        last_kf_pose=jnp.zeros(6, jnp.float32),
        map_corner=jnp.zeros((mc, 3), jnp.float32),
        map_corner_age=jnp.full((mc,), -(10**9), jnp.int32),
        map_corner_mask=jnp.zeros(mc, bool),
        map_surf=jnp.zeros((ms, 3), jnp.float32),
        map_surf_age=jnp.full((ms,), -(10**9), jnp.int32),
        map_surf_mask=jnp.zeros(ms, bool),
    )


class ScanInput(NamedTuple):
    """Host-fed raw scan (padded)."""

    points: jnp.ndarray  # (P, 4) xyzi
    valid: jnp.ndarray  # (P,)
    imu_time: jnp.ndarray  # (M,) absolute seconds (or zeros)
    imu_gyro: jnp.ndarray  # (M, 3)
    imu_valid: jnp.ndarray  # (M,)
    scan_start: jnp.ndarray  # () absolute seconds
    # accelerometer window — consumed by the fused LIO-SLAM step
    # (pipeline/slam.py slam_step when cfg.imu.use_imu); the default shape
    # matches the default ImuConfig.max_imu_per_scan=64
    imu_accel: jnp.ndarray = jnp.zeros((64, 3))  # (M, 3)
    # body-frame velocity at scan start for POSITIONAL deskew on the gyro
    # path (the findPosition term the reference zeroes,
    # laserProcessing.cpp:402-425); filled by the LIO chains from the
    # nav-state velocity, zeros = rotation-only (reference behavior)
    deskew_vel: jnp.ndarray = jnp.zeros(3)  # (3,)
    # optional external initial guess (IMU preintegration / fusion odometry;
    # updateInitialGuess cascade, odomEstimationNode.cpp:297-419)
    init_guess: jnp.ndarray = jnp.zeros(6)  # (6,)
    init_guess_valid: jnp.ndarray = jnp.bool_(False)
    # IMU orientation at scan start for roll/pitch slerp fusion
    # (transformUpdate, odomEstimationNode.cpp:976-1006)
    imu_rpy: jnp.ndarray = jnp.zeros(3)
    imu_rpy_valid: jnp.ndarray = jnp.bool_(False)
    # body velocity + angular rate at scan time for the dataPretreat
    # alternate front-end (distortionAdjust.cpp:412-480) — used when
    # cfg.imu.deskew_mode == "velocity"
    vel: jnp.ndarray = jnp.zeros(3)
    ang_rate: jnp.ndarray = jnp.zeros(3)
    vel_valid: jnp.ndarray = jnp.bool_(False)


def preprocess(scan: ScanInput, cfg: SlamConfig, return_ext: bool = False):
    """Pretreatment -> deskew -> projection -> extraction -> features.

    Deskew source follows cfg.imu.deskew_mode: "gyro" (laserProcessing
    IMU-rotation path) when use_imu, "velocity" (the dataPretreat
    constant-velocity alternate front-end, dataPretreatNode.cpp:184-253),
    or none.

    With return_ext=True also returns the compacted ExtractedCloud (whose
    `src` column lets per-raw-point payloads — semantic labels — gather
    onto the grid without a second projection pass)."""
    pre = pretreatment.pretreat(scan.points, scan.valid, cfg.sensor)
    if cfg.imu.deskew_mode == "velocity":
        from ..ops import velocity_deskew as vd

        pts = vd.velocity_deskew(
            pre.points[:, :3], pre.rel_time, scan.ang_rate, scan.vel,
            pre.valid & scan.vel_valid,
        )
    elif cfg.imu.use_imu:
        info = deskew_ops.integrate_gyro(
            scan.imu_time, scan.imu_gyro, scan.imu_valid, scan.scan_start
        )
        pts = deskew_ops.deskew_points(
            pre.points[:, :3], pre.rel_time, info, pre.valid,
            vel_body=scan.deskew_vel,
        )
    else:
        pts = pre.points[:, :3]
    _img, ext = projection.project_and_extract(
        pts, pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg.sensor,
        want_image=False,
    )
    fc = feat_ops.extract_features(
        ext, cfg.feature, greedy=cfg.feature.greedy_selection)
    return (fc, ext) if return_ext else fc


def _insert_keyframe(state: OdomState, fc: feat_ops.FeatureClouds,
                     pose: jnp.ndarray, cfg: SlamConfig) -> OdomState:
    """Merge the current feature clouds into the sliding-window map.

    One incremental aged-voxel merge per class replaces the reference's
    full window rebuild (same window semantics — see voxel_merge_aged);
    then the NN hashes are rebuilt over the updated buffers."""
    K = cfg.keyframe.window_size
    T = se3.pose_to_matrix(pose)
    corner_w = se3.transform_points(T, fc.corner_xyz)
    surf_w = se3.transform_points(T, fc.surf_xyz)
    head = state.kf_head
    kf_poses = state.kf_poses.at[head].set(pose)

    map_c, age_c, mask_c = voxel.voxel_merge_aged(
        corner_w, fc.corner_mask,
        state.map_corner, state.map_corner_age, state.map_corner_mask,
        state.kf_count, K, cfg.voxel.mapping_corner_leaf,
        cfg.matching.corner_map_capacity, anchor=cfg.voxel.map_anchor,
    )
    map_s, age_s, mask_s = voxel.voxel_merge_aged(
        surf_w, fc.surf_mask,
        state.map_surf, state.map_surf_age, state.map_surf_mask,
        state.kf_count, K, cfg.voxel.mapping_surf_leaf,
        cfg.matching.surf_map_capacity, anchor=cfg.voxel.map_anchor,
    )
    return state._replace(
        kf_poses=kf_poses,
        kf_count=state.kf_count + 1,
        kf_head=(head + 1) % K,
        last_kf_pose=pose,
        map_corner=map_c, map_corner_age=age_c, map_corner_mask=mask_c,
        map_surf=map_s, map_surf_age=age_s, map_surf_mask=mask_s,
    )


def _keyframe_gate(pose: jnp.ndarray, last_kf_pose: jnp.ndarray,
                   kf_count: jnp.ndarray, gn, cfg: SlamConfig) -> jnp.ndarray:
    """saveKeyFrames gate (odomEstimationNode.cpp:216-228): the solver must
    have converged this scan (`if (deltaR < 0.005 || deltaT < 0.05)` on the
    last LM step), then keyframe on the first frames (keyFrameId <= 5) or on
    per-axis motion of the relative transform since the last keyframe
    (calculateTranslation -> transformCurFrame2PriFrame |yaw|/|x|/|y|)."""
    T_last = se3.pose_to_matrix(last_kf_pose)
    T_cur = se3.pose_to_matrix(pose)
    rel = se3.matrix_to_pose(se3.transform_inverse(T_last) @ T_cur)
    motion = (
        (jnp.abs(rel[2]) >= cfg.keyframe.min_yaw)
        | (jnp.abs(rel[3]) >= cfg.keyframe.min_distance)
        | (jnp.abs(rel[4]) >= cfg.keyframe.min_distance)
    )
    conv = (
        (gn.delta_r < cfg.matching.converge_delta_r_deg)
        | (gn.delta_t < cfg.matching.converge_delta_t_cm)
    )
    if not cfg.keyframe.require_convergence:
        conv = jnp.bool_(True)
    # bootstrap_frames=5 reproduces the reference's `keyFrameId <= 5`
    # unconditional early keyframes; the default 0 keyframes only the very
    # first frame (see KeyframeConfig.bootstrap_frames for the measured
    # rationale)
    return conv & ((kf_count <= cfg.keyframe.bootstrap_frames) | motion)


def _insert_keyframe_masked(state: OdomState, fc: feat_ops.FeatureClouds,
                            pose: jnp.ndarray, is_kf: jnp.ndarray,
                            cfg: SlamConfig) -> OdomState:
    """Cond-free keyframe insert: always runs the merge, but masks the new
    cloud out when is_kf is False (map, ages, and bookkeeping then come out
    bit-identical to the skip branch). Used by the batched multi-sequence
    step — under vmap, lax.cond executes both branches, so the conditional
    variant pays the merge anyway and diverges per sequence."""
    fc = fc._replace(
        corner_mask=fc.corner_mask & is_kf,
        surf_mask=fc.surf_mask & is_kf,
    )
    inserted = _insert_keyframe(state, fc, pose, cfg)
    # scalar bookkeeping must not advance on non-keyframes
    return inserted._replace(
        kf_poses=jnp.where(is_kf, inserted.kf_poses, state.kf_poses),
        kf_count=jnp.where(is_kf, inserted.kf_count, state.kf_count),
        kf_head=jnp.where(is_kf, inserted.kf_head, state.kf_head),
        last_kf_pose=jnp.where(is_kf, inserted.last_kf_pose,
                               state.last_kf_pose),
        # the merge with an empty new cloud still re-sorts/compacts the map
        # (same content, possibly refreshed order) — safe either way, but
        # keep ages/masks from the merge so expiry stays consistent
    )


def _odom_step_impl(state: OdomState, scan: ScanInput, cfg: SlamConfig,
                    uniform: bool, allow_kf: bool = True
                    ) -> tuple[OdomState, OdomOutput]:
    """Process one scan end-to-end (preprocess + match + map update).

    uniform=True uses the cond-free masked keyframe insert (for vmapped
    multi-sequence batching, where lax.cond would run both branches and
    diverge per sequence). allow_kf=False (uniform only) compiles the step
    WITHOUT the keyframe merge — the batched replay driver alternates the
    two programs on a host-side cadence (RuntimeConfig.batched_kf_every)."""
    fc, ext = preprocess(scan, cfg, return_ext=True)

    # ---- initial guess cascade (updateInitialGuess :297-419):
    # external (IMU preintegration) guess > constant velocity > hold ----
    T_prev = se3.pose_to_matrix(state.pose)
    guess_T = T_prev @ state.incr
    guess = se3.matrix_to_pose(guess_T)
    guess = jnp.where(scan.init_guess_valid, scan.init_guess, guess)
    first = state.kf_count == 0
    # first frame: IMU roll/pitch if available (reference seeds attitude)
    first_guess = jnp.where(
        scan.imu_rpy_valid,
        jnp.concatenate([scan.imu_rpy[:2], state.pose[2:]]),
        state.pose,
    )
    guess = jnp.where(first, first_guess, guess)

    # ---- scan-to-map optimization (:596-626) ----
    # matched clouds: the sharp feature subsets (fast production default)
    # or, reference-faithfully, voxel-DS of the FULL corner/surf clouds
    # (currentCloudInit :260-281)
    if cfg.matching.match_source == "full_ds":
        mc_xyz, mc_mask, _ = voxel.voxel_downsample(
            fc.corner_xyz, fc.corner_mask, cfg.matching.matched_corner_leaf,
            cfg.matching.matched_corner_capacity)
        ms_xyz, ms_mask, _ = voxel.voxel_downsample(
            fc.surf_xyz, fc.surf_mask, cfg.matching.matched_surf_leaf,
            cfg.matching.matched_surf_capacity)
    elif cfg.matching.match_source == "hybrid":
        # sharp corner subset (rotation constraint comes from few strong
        # edges) + voxel-UNIFORM downsample of the FULL surf cloud (the
        # measured source of full_ds's accuracy — spatial coverage, see
        # docs/PERF.md "coverage beats count"): full_ds accuracy at near
        # sharp-mode speed
        mc_xyz, mc_mask = fc.sharp_corner_xyz, fc.sharp_corner_mask
        ms_xyz, ms_mask, _ = voxel.voxel_downsample(
            fc.surf_xyz, fc.surf_mask, cfg.matching.matched_surf_leaf,
            cfg.matching.matched_surf_capacity)
    else:
        mc_xyz, mc_mask = fc.sharp_corner_xyz, fc.sharp_corner_mask
        ms_xyz, ms_mask = fc.sharp_surf_xyz, fc.sharp_surf_mask
    if uniform:
        # cond-free static-schedule solver: under vmap the drift-triggered
        # cache refresh of scan_to_map double-executes every iteration
        gn = scan_match.scan_to_map_scheduled(
            guess,
            mc_xyz, mc_mask,
            ms_xyz, ms_mask,
            state.map_corner, state.map_corner_mask,
            state.map_surf, state.map_surf_mask,
            cfg.matching, cfg.matching.uniform_iters,
            cfg.matching.uniform_refresh,
        )
    else:
        gn = scan_match.scan_to_map(
            guess,
            mc_xyz, mc_mask,
            ms_xyz, ms_mask,
            state.map_corner, state.map_corner_mask,
            state.map_surf, state.map_surf_mask,
            cfg.matching, cfg.matching.max_iterations_frontend,
        )
    pose = jnp.where(first, guess, gn.pose)

    # IMU roll/pitch slerp fusion (transformUpdate :979-1001): blend the
    # optimized roll/pitch toward the IMU attitude with weight imuRPYWeight
    do_slerp = scan.imu_rpy_valid & (jnp.abs(scan.imu_rpy[1]) < 1.4)
    w_imu = cfg.imu.rpy_weight
    q_roll = se3.quat_slerp(
        se3.euler_to_quat(jnp.array([1.0, 0.0, 0.0]) * pose[0]),
        se3.euler_to_quat(jnp.array([1.0, 0.0, 0.0]) * scan.imu_rpy[0]),
        w_imu,
    )
    q_pitch = se3.quat_slerp(
        se3.euler_to_quat(jnp.array([0.0, 1.0, 0.0]) * pose[1]),
        se3.euler_to_quat(jnp.array([0.0, 1.0, 0.0]) * scan.imu_rpy[1]),
        w_imu,
    )
    roll_f = se3.quat_to_euler(q_roll)[0]
    pitch_f = se3.quat_to_euler(q_pitch)[1]
    pose = pose.at[0].set(jnp.where(do_slerp, roll_f, pose[0]))
    pose = pose.at[1].set(jnp.where(do_slerp, pitch_f, pose[1]))

    # constraintTransformation clamps (transformUpdate :976-1006)
    pose = pose.at[0].set(
        se3.constrain_angle(pose[0], cfg.runtime.rotation_tolerance))
    pose = pose.at[1].set(
        se3.constrain_angle(pose[1], cfg.runtime.rotation_tolerance))
    pose = pose.at[5].set(se3.constrain_angle(pose[5], cfg.runtime.z_tolerance))

    # ---- keyframe insert + map rebuild (saveKeyFrames) ----
    is_kf = _keyframe_gate(pose, state.last_kf_pose, state.kf_count, gn, cfg)
    if uniform and not allow_kf:
        # merge-free step for the host-cadenced batched replay: the masked
        # aged-voxel merge is ~47% of the vmapped per-lane cost (it runs
        # every scan because lanes diverge — docs/PERF.md round 4), so the
        # batched driver only compiles the merge into every Kth step. The
        # gate is NOT consumed here: last_kf_pose stays put, the motion
        # keeps accumulating, and the keyframe fires at the next allowed
        # step (quantized keyframe timing, same map semantics).
        is_kf = jnp.zeros_like(is_kf)
    elif uniform:
        state = _insert_keyframe_masked(state, fc, pose, is_kf, cfg)
    else:
        state = jax.lax.cond(
            is_kf,
            lambda s: _insert_keyframe(s, fc, pose, cfg),
            lambda s: s,
            state,
        )

    # ---- velocity model update ----
    T_new = se3.pose_to_matrix(pose)
    incr = se3.transform_inverse(T_prev) @ T_new
    incr = jnp.where(first, jnp.eye(4, dtype=incr.dtype), incr)
    state = state._replace(
        pose=pose,
        prev_pose=state.pose,
        incr=incr,
        frame_idx=state.frame_idx + 1,
    )
    out = OdomOutput(
        pose=pose,
        is_keyframe=is_kf,
        converged=gn.converged,
        degenerate=gn.degenerate,
        n_valid=gn.n_valid,
        iterations=gn.it,
    )
    return state, out, fc, ext


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("state",))
def odom_step(state: OdomState, scan: ScanInput,
              cfg: SlamConfig) -> tuple[OdomState, OdomOutput]:
    """Single-sequence per-scan step (keyframe insert under lax.cond).

    `state` is DONATED: the multi-MB sliding-map buffers are updated in
    place instead of copied every scan. Callers must thread the returned
    state (`state, out = odom_step(state, ...)`) and never reuse the old
    one; use `odom_step_nodonate` for replay-from-a-saved-state patterns."""
    state, out, _fc, _ext = _odom_step_impl(state, scan, cfg, uniform=False)
    return state, out


@functools.partial(jax.jit, static_argnames=("cfg",))
def odom_step_nodonate(state: OdomState, scan: ScanInput,
                       cfg: SlamConfig) -> tuple[OdomState, OdomOutput]:
    """odom_step without input donation (state stays valid after the call —
    for harnesses that re-run a step from the same state)."""
    state, out, _fc, _ext = _odom_step_impl(state, scan, cfg, uniform=False)
    return state, out


@functools.partial(jax.jit, static_argnames=("cfg", "allow_kf"),
                   donate_argnames=("state",))
def odom_step_uniform(state: OdomState, scan: ScanInput, cfg: SlamConfig,
                      allow_kf: bool = True
                      ) -> tuple[OdomState, OdomOutput]:
    """Cond-free per-scan step for vmapped multi-sequence replay (state
    donated, see odom_step). allow_kf=False compiles out the keyframe
    merge (see _odom_step_impl)."""
    state, out, _fc, _ext = _odom_step_impl(
        state, scan, cfg, uniform=True, allow_kf=allow_kf)
    return state, out
