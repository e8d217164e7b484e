"""IMU preintegration on-manifold (Forster et al.), as a lax.scan.

Rebuild of the reference's GTSAM-based IMU handling
(`IMUPreintegration`, subMapOptmizationNode.cpp:2007-2219):
 - `gtsam::PreintegratedImuMeasurements` -> `preintegrate` below: delta
   rotation/velocity/position with bias Jacobians and covariance propagated
   over a fixed-size padded IMU window,
 - predicted state for the next scan's initial guess (`imuHandler` :429-511),
 - `failureDetection` (:2222-2238): velocity/bias magnitude gates,
 - bias update via the preintegrated Jacobians instead of iSAM2 relin.

The noise model matches the reference's params (imuAccNoise/imuGyrNoise/
imuAccBiasN/imuGyrBiasN, config/params.yaml:82-87).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ImuConfig
from ..utils import se3


class PreintegratedImu(NamedTuple):
    """Delta state between two scan times, in the first frame's body frame."""

    delta_R: jnp.ndarray  # (3, 3)
    delta_v: jnp.ndarray  # (3,)
    delta_p: jnp.ndarray  # (3,)
    delta_t: jnp.ndarray  # ()
    # bias Jacobians (first order, Forster eq. 44)
    dR_dbg: jnp.ndarray  # (3, 3)
    dv_dbg: jnp.ndarray  # (3, 3)
    dv_dba: jnp.ndarray  # (3, 3)
    dp_dbg: jnp.ndarray  # (3, 3)
    dp_dba: jnp.ndarray  # (3, 3)
    cov: jnp.ndarray  # (9, 9) [theta, v, p] covariance
    count: jnp.ndarray  # () int32 integrated samples


class ImuState(NamedTuple):
    """Propagated navigation state (world frame).

    `P_bias` is the running [bg, ba] marginal covariance — the stand-in for
    the iSAM2 bias marginal the reference carries across keys
    (subMapOptmizationNode.cpp:2007-2219): it starts at the bias prior
    (priorBiasNoise's role), inflates by the bias random walk between
    updates (noiseModelBetweenBias, :2129), and contracts as window
    residual information accumulates."""

    R: jnp.ndarray  # (3, 3)
    v: jnp.ndarray  # (3,)
    p: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,) gyro bias
    ba: jnp.ndarray  # (3,) accel bias
    P_bias: jnp.ndarray = jnp.eye(6) * 0.1**2  # (6, 6) [bg, ba] covariance


def init_imu_state(cfg: ImuConfig) -> ImuState:
    """Fresh nav state with the configured bias prior."""
    return ImuState(
        R=jnp.eye(3), v=jnp.zeros(3), p=jnp.zeros(3),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
        P_bias=jnp.eye(6) * cfg.bias_prior_sigma**2,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def preintegrate(
    imu_time: jnp.ndarray,  # (M,) seconds
    gyro: jnp.ndarray,  # (M, 3)
    accel: jnp.ndarray,  # (M, 3)
    valid: jnp.ndarray,  # (M,)
    bg: jnp.ndarray,  # (3,) gyro bias estimate
    ba: jnp.ndarray,  # (3,) accel bias estimate
    cfg: ImuConfig,
    t0: jnp.ndarray | None = None,  # () clip window start (optional)
    t1: jnp.ndarray | None = None,  # () clip window end (optional)
) -> PreintegratedImu:
    """Integrate the window with bias-corrected measurements.

    With `t0`/`t1`, integration is CLIPPED to [t0, t1]: sample times are
    clamped to the interval, so segments outside contribute zero dt and
    boundary segments are truncated. This matters because the delivered
    window covers the sweep plus slack, while the delta consumed by
    predict/velocity_bias_update must span EXACTLY the pose-pair interval
    (the reference integrates between consecutive lidar odometry stamps,
    subMapOptmizationNode.cpp:2096-2118 `imuTime < currentCorrectionTime`);
    an unclipped 0.11 s window against 0.10 s pose spacing biases the
    velocity estimate 10% low.
    """
    m = imu_time.shape[0]
    t = imu_time
    if t0 is not None:
        t = jnp.maximum(t, t0)
    if t1 is not None:
        t = jnp.minimum(t, t1)
    prev_t = jnp.concatenate([t[:1], t[:-1]])
    dt = jnp.where(valid, t - prev_t, 0.0)
    idx = jnp.arange(m)
    first = jnp.argmax(valid)
    dt = jnp.where(idx == first, 0.0, dt)
    dt = jnp.clip(dt, 0.0, 0.1)

    sg2 = cfg.gyr_noise**2
    sa2 = cfg.acc_noise**2

    def step(carry, inp):
        pre = carry
        w, a, dti = inp
        w = w - bg
        a = a - ba
        dR_inc = se3.so3_exp(w * dti)
        a_rot = pre.delta_R @ a
        # state update (mid-point free, Euler forward as in gtsam's default)
        new_p = pre.delta_p + pre.delta_v * dti + 0.5 * a_rot * dti * dti
        new_v = pre.delta_v + a_rot * dti
        new_R = pre.delta_R @ dR_inc
        # bias jacobians
        Jr = _right_jacobian(w * dti)
        a_hat = se3.hat(a)
        new_dR_dbg = dR_inc.T @ pre.dR_dbg - Jr * dti
        new_dv_dba = pre.dv_dba - pre.delta_R * dti
        new_dv_dbg = pre.dv_dbg - (pre.delta_R @ a_hat) @ pre.dR_dbg * dti
        new_dp_dba = pre.dp_dba + pre.dv_dba * dti - 0.5 * pre.delta_R * dti * dti
        new_dp_dbg = (
            pre.dp_dbg + pre.dv_dbg * dti
            - 0.5 * (pre.delta_R @ a_hat) @ pre.dR_dbg * dti * dti
        )
        # covariance propagation (theta, v, p)
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dR_inc.T)
        A = A.at[3:6, 0:3].set(-(pre.delta_R @ a_hat) * dti)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 0:3].set(-0.5 * (pre.delta_R @ a_hat) * dti * dti)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dti)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dti)
        B = B.at[3:6, 3:6].set(pre.delta_R * dti)
        B = B.at[6:9, 3:6].set(0.5 * pre.delta_R * dti * dti)
        # continuous->discrete: Q_d = Q_c / dt (noise densities from
        # params.yaml are continuous; B already carries the dt factors, so
        # B (Q_c/dt) B^T ~ sigma^2 * dt — the random-walk growth rate)
        Q = jnp.diag(
            jnp.concatenate([jnp.full(3, sg2), jnp.full(3, sa2)])
        ) / jnp.maximum(dti, 1e-4)
        new_cov = A @ pre.cov @ A.T + B @ Q @ B.T
        integrate = dti > 0
        out = PreintegratedImu(
            delta_R=jnp.where(integrate, new_R, pre.delta_R),
            delta_v=jnp.where(integrate, new_v, pre.delta_v),
            delta_p=jnp.where(integrate, new_p, pre.delta_p),
            delta_t=pre.delta_t + dti,
            dR_dbg=jnp.where(integrate, new_dR_dbg, pre.dR_dbg),
            dv_dbg=jnp.where(integrate, new_dv_dbg, pre.dv_dbg),
            dv_dba=jnp.where(integrate, new_dv_dba, pre.dv_dba),
            dp_dbg=jnp.where(integrate, new_dp_dbg, pre.dp_dbg),
            dp_dba=jnp.where(integrate, new_dp_dba, pre.dp_dba),
            cov=jnp.where(integrate, new_cov, pre.cov),
            count=pre.count + integrate.astype(jnp.int32),
        )
        return out, None

    init = PreintegratedImu(
        delta_R=jnp.eye(3),
        delta_v=jnp.zeros(3),
        delta_p=jnp.zeros(3),
        delta_t=jnp.float32(0.0),
        dR_dbg=jnp.zeros((3, 3)),
        dv_dbg=jnp.zeros((3, 3)),
        dv_dba=jnp.zeros((3, 3)),
        dp_dbg=jnp.zeros((3, 3)),
        dp_dba=jnp.zeros((3, 3)),
        cov=jnp.zeros((9, 9)),
        count=jnp.int32(0),
    )
    out, _ = jax.lax.scan(step, init, (gyro, accel, dt))
    return out


def _right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian Jr(phi)."""
    theta2 = jnp.sum(phi * phi)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = se3.hat(phi)
    small = theta2 < 1e-12
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-24),
    )
    return jnp.eye(3) - a * W + b * (W @ W)


@functools.partial(jax.jit, static_argnames=("gravity",))
def predict(state: ImuState, pre: PreintegratedImu, gravity: float) -> ImuState:
    """Propagate the nav state through a preintegrated delta
    (gtsam ImuFactor predict; used for the next scan's initial guess)."""
    g = jnp.array([0.0, 0.0, -gravity])
    dt = pre.delta_t
    new_p = state.p + state.v * dt + 0.5 * g * dt * dt + state.R @ pre.delta_p
    new_v = state.v + g * dt + state.R @ pre.delta_v
    new_R = state.R @ pre.delta_R
    return ImuState(R=new_R, v=new_v, p=new_p, bg=state.bg, ba=state.ba,
                    P_bias=state.P_bias)


def correct_delta(pre: PreintegratedImu, dbg: jnp.ndarray, dba: jnp.ndarray):
    """First-order bias correction of the preintegrated deltas."""
    dR = pre.delta_R @ se3.so3_exp(pre.dR_dbg @ dbg)
    dv = pre.delta_v + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp = pre.delta_p + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    return dR, dv, dp


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict_path(
    imu_time: jnp.ndarray,  # (M,) seconds
    gyro: jnp.ndarray,  # (M, 3)
    accel: jnp.ndarray,  # (M, 3)
    valid: jnp.ndarray,  # (M,)
    state: ImuState,  # last optimized nav state (world frame)
    cfg: ImuConfig,
):
    """IMU-rate odometry prediction: the world-frame pose at EVERY sample
    of the window, propagated from the last optimized nav state with the
    current bias estimates — the reference publishes this 200 Hz stream
    from imuHandler for downstream consumers (odometry/imu,
    subMapOptmizationNode.cpp:429-511). Returns (R (M,3,3), v (M,3),
    p (M,3)); invalid samples repeat the previous pose.

    The end-of-window prediction equals predict(state, preintegrate(...))
    up to first-order bias terms (both integrate the same Euler-forward
    chain; pinned by test)."""
    m = imu_time.shape[0]
    prev_t = jnp.concatenate([imu_time[:1], imu_time[:-1]])
    dt = jnp.where(valid, imu_time - prev_t, 0.0)
    idx = jnp.arange(m)
    first = jnp.argmax(valid)
    dt = jnp.where(idx == first, 0.0, dt)
    dt = jnp.clip(dt, 0.0, 0.1)
    g = jnp.array([0.0, 0.0, -cfg.gravity])

    def step(carry, inp):
        R, v, p = carry
        w, a, dti = inp
        w = w - state.bg
        a = a - state.ba
        a_w = R @ a + g
        new_p = p + v * dti + 0.5 * a_w * dti * dti
        new_v = v + a_w * dti
        new_R = R @ se3.so3_exp(w * dti)
        upd = dti > 0
        out = (jnp.where(upd, new_R, R), jnp.where(upd, new_v, v),
               jnp.where(upd, new_p, p))
        return out, out

    _, (Rs, vs, ps) = jax.lax.scan(
        step, (state.R, state.v, state.p), (gyro, accel, dt))
    return Rs, vs, ps


def imu_to_lidar(gyro: jnp.ndarray, accel: jnp.ndarray, cfg: ImuConfig):
    """Rotate raw IMU measurements into the lidar frame (imuConverter,
    reference utility.h:482-517: acc/gyr left-multiplied by extRot)."""
    R = jnp.asarray(cfg.extrinsic_rot, jnp.float32)
    return gyro @ R.T, accel @ R.T


def gps_vel_to_lidar(linear, angular, cfg: ImuConfig):
    """Rotate a GPS velocity twist into the lidar frame (gpsVelConverter,
    utility.h:519-540: linear AND angular velocity left-multiplied by
    extRot). Numpy in/out — this runs at the GPS message rate on the host,
    feeding the dataPretreat velocity front-end (dataPretreatNode.cpp:
    91-109, useGPSVel=true)."""
    import numpy as np

    R = np.asarray(cfg.extrinsic_rot, np.float64)
    return (R @ np.asarray(linear, np.float64),
            R @ np.asarray(angular, np.float64))


def remap_imu_orientation(rpy, cfg: ImuConfig):
    """imuConverter's orientation remap (utility.h:500-508): the absolute
    IMU orientation is POST-multiplied by the extrinsicRPY quaternion
    (q_final = q_from * extQRPY), separately from the extRot rate rotation.
    Numpy in, numpy out (host-rate path — one 3x3 product per scan)."""
    import numpy as np

    def euler_to_rot_np(r):
        cr, sr = np.cos(r[0]), np.sin(r[0])
        cp, sp = np.cos(r[1]), np.sin(r[1])
        cy, sy = np.cos(r[2]), np.sin(r[2])
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        return Rz @ Ry @ Rx

    R_out = euler_to_rot_np(np.asarray(rpy, np.float64)) @ np.asarray(
        cfg.extrinsic_rpy, np.float64)
    pitch = -np.arcsin(np.clip(R_out[2, 0], -1.0, 1.0))
    roll = np.arctan2(R_out[2, 1], R_out[2, 2])
    yaw = np.arctan2(R_out[1, 0], R_out[0, 0])
    return np.array([roll, pitch, yaw], np.float64)


def failure_detection(velocity: jnp.ndarray, bg: jnp.ndarray,
                      ba: jnp.ndarray) -> jnp.ndarray:
    """Reference failureDetection (subMapOptmizationNode.cpp:2222-2238):
    reset when |v| > 30 m/s or |bias| > 1.0."""
    return (
        (jnp.linalg.norm(velocity) > 30.0)
        | (jnp.linalg.norm(ba) > 1.0)
        | (jnp.linalg.norm(bg) > 1.0)
    )


def _whiten(S: jnp.ndarray, Jb: jnp.ndarray, rb: jnp.ndarray):
    """Whiten a 3-residual block by its covariance: L^-1 J, L^-1 r."""
    from jax.scipy.linalg import solve_triangular

    L = jnp.linalg.cholesky(S + 1e-12 * jnp.eye(3))
    return (solve_triangular(L, Jb, lower=True),
            solve_triangular(L, rb, lower=True))


@functools.partial(jax.jit, static_argnames=("cfg",))
def velocity_bias_update2(
    state: ImuState,
    pre1: PreintegratedImu,  # window pose0 -> pose1
    pre2: PreintegratedImu,  # window pose1 -> pose2
    pose0: jnp.ndarray,  # (6,) lidar-optimized poses
    pose1: jnp.ndarray,
    pose2: jnp.ndarray,
    v0_est: jnp.ndarray,  # (3,) velocity estimate at pose0
    cfg: ImuConfig,
):
    """TWO-window joint (bg, ba, v) MAP solve from three lidar-anchored
    poses, covariance-weighted.

    A single window cannot separate an accel bias from a start-velocity
    error (both shift delta_p; the bias by -0.5 dt^2, the velocity by dt) —
    the reference's iSAM2 separates them because consecutive ImuFactors
    share the velocity variable (subMapOptmizationNode.cpp:2007-2219). This
    is that same two-factor coupling in closed form: 12 residuals (2x
    rotation, 2x position) over 9 unknowns [dbg, dba, dv0].

    Weighting is principled, not tuned: each residual block is whitened by
    its covariance — the propagated 9x9 preintegration covariance plus the
    pose-anchor noise (correctionNoise's role) — and the unknowns carry a
    prior [state.P_bias inflated by the bias random walk
    (noiseModelBetweenBias, :2129); a loose v0 prior (priorVelNoise's
    role)]. The posterior bias marginal is written back to P_bias, so
    information accumulates across window pairs exactly like consecutive
    iSAM2 updates. The only remaining clamps are wide FINAL-SAFETY bounds
    (far inside the failure-detection gate at 1.0), not tuning.

    Returns (new ImuState anchored at pose2 with the propagated current
    velocity, v1) — v1 is the corrected velocity at pose1, which becomes
    the next call's `v0_est` when the window pair slides by one.
    """
    g = jnp.array([0.0, 0.0, -cfg.gravity])
    R0 = se3.euler_to_rot(pose0[:3])
    R1 = se3.euler_to_rot(pose1[:3])
    R2 = se3.euler_to_rot(pose2[:3])
    p0, p1, p2 = pose0[3:], pose1[3:], pose2[3:]
    dt1 = jnp.maximum(pre1.delta_t, 1e-3)
    dt2 = jnp.maximum(pre2.delta_t, 1e-3)

    rR1 = se3.so3_log(pre1.delta_R.T @ (R0.T @ R1))
    rR2 = se3.so3_log(pre2.delta_R.T @ (R1.T @ R2))
    rp1 = R0.T @ (p1 - p0 - v0_est * dt1 - 0.5 * g * dt1 * dt1) - pre1.delta_p
    v1_est = v0_est + g * dt1 + R0 @ pre1.delta_v
    rp2 = R1.T @ (p2 - p1 - v1_est * dt2 - 0.5 * g * dt2 * dt2) - pre2.delta_p

    R1tR0 = R1.T @ R0
    Z = jnp.zeros((3, 3))
    I3 = jnp.eye(3)
    # unknown ordering: [dbg, dba, dv0]; Jacobian rows per residual block
    J_R1 = jnp.concatenate([pre1.dR_dbg, Z, Z], 1)
    J_R2 = jnp.concatenate([pre2.dR_dbg, Z, Z], 1)
    J_p1 = jnp.concatenate([pre1.dp_dbg, pre1.dp_dba, R0.T * dt1], 1)
    J_p2 = jnp.concatenate([
        pre2.dp_dbg + R1tR0 @ pre1.dv_dbg * dt2,
        pre2.dp_dba + R1tR0 @ pre1.dv_dba * dt2,
        R1.T * dt2], 1)

    # residual covariances: preintegration blocks [theta 0:3, v 3:6, p 6:9]
    # + the two pose anchors each residual touches; rp2 additionally
    # inherits window-1's velocity error propagated over dt2
    s_rot2 = 2.0 * cfg.pose_anchor_rot_sigma**2
    s_pos2 = 2.0 * cfg.pose_anchor_pos_sigma**2
    S_R1 = pre1.cov[0:3, 0:3] + s_rot2 * I3
    S_R2 = pre2.cov[0:3, 0:3] + s_rot2 * I3
    S_p1 = pre1.cov[6:9, 6:9] + s_pos2 * I3
    S_p2 = (pre2.cov[6:9, 6:9] + s_pos2 * I3
            + dt2 * dt2 * (R1tR0 @ pre1.cov[3:6, 3:6] @ R1tR0.T))

    JR1, rR1w = _whiten(S_R1, J_R1, rR1)
    JR2, rR2w = _whiten(S_R2, J_R2, rR2)
    Jp1, rp1w = _whiten(S_p1, J_p1, rp1)
    Jp2, rp2w = _whiten(S_p2, J_p2, rp2)
    Jw = jnp.concatenate([JR1, JR2, Jp1, Jp2], 0)  # (12, 9)
    rw = jnp.concatenate([rR1w, rR2w, rp1w, rp2w])

    # prior information: random-walk-inflated bias marginal + loose v0
    P_b = state.P_bias + jnp.diag(jnp.concatenate([
        jnp.full(3, cfg.gyr_bias_noise**2),
        jnp.full(3, cfg.acc_bias_noise**2)])) * (dt1 + dt2)
    Lam = jnp.zeros((9, 9))
    Lam = Lam.at[:6, :6].set(jnp.linalg.inv(P_b))
    Lam = Lam.at[6:, 6:].set(I3 / cfg.v0_prior_sigma**2)

    H = Jw.T @ Jw + Lam
    delta = jnp.linalg.solve(H, Jw.T @ rw)
    # wide FINAL-SAFETY clamps only (failure gate is |bias| > 1.0)
    dbg = jnp.clip(delta[0:3], -0.1, 0.1)
    dba = jnp.clip(delta[3:6], -0.2, 0.2)
    dv0 = delta[6:9]
    # posterior bias marginal — but NOT when a clamp saturated: a truncated
    # step is not the MAP step, and contracting the marginal as if it were
    # would make the prior overconfident exactly when the estimate is
    # furthest from converged. Keep the random-walk-inflated prior instead.
    clamped = (jnp.any(jnp.abs(delta[0:3]) > 0.1)
               | jnp.any(jnp.abs(delta[3:6]) > 0.2))
    P_post = jnp.where(clamped, P_b, jnp.linalg.inv(H)[:6, :6])

    bg_new = state.bg + dbg
    ba_new = state.ba + dba
    # propagate the corrected velocity to pose2
    v0 = v0_est + dv0
    v1 = v0 + g * dt1 + R0 @ (
        pre1.delta_v + pre1.dv_dbg @ dbg + pre1.dv_dba @ dba)
    v2 = v1 + g * dt2 + R1 @ (
        pre2.delta_v + pre2.dv_dbg @ dbg + pre2.dv_dba @ dba)
    return ImuState(R=R2, v=v2, p=p2, bg=bg_new, ba=ba_new,
                    P_bias=P_post), v1


@functools.partial(jax.jit, static_argnames=("cfg",))
def velocity_bias_update(
    state: ImuState,
    pre: PreintegratedImu,
    pose_prev: jnp.ndarray,  # (6,) lidar-optimized pose at window start
    pose_new: jnp.ndarray,  # (6,) lidar-optimized pose at window end
    cfg: ImuConfig,
) -> ImuState:
    """Closed-form velocity + covariance-weighted gyro-bias refresh from the
    lidar pose pair — the TPU-native stand-in for the reference's per-key
    iSAM2 update (the graph there only ever couples consecutive states, so
    the information-form solution collapses to this residual correction).

    Accel bias is NOT observable from one window (indistinguishable from a
    start-velocity error); the steady-state LIO path estimates it jointly
    over two windows (velocity_bias_update2). The gyro-bias step is the MAP
    update: rotation residual whitened by its covariance (preintegration
    theta block + anchor noise) against the running P_bias marginal —
    no hand gain.
    """
    R0 = se3.euler_to_rot(pose_prev[:3])
    p0 = pose_prev[3:]
    p1 = pose_new[3:]
    g = jnp.array([0.0, 0.0, -cfg.gravity])
    dt = jnp.maximum(pre.delta_t, 1e-3)
    # velocity consistent with observed displacement and preintegrated delta
    v_new = (p1 - p0 - 0.5 * g * dt * dt - R0 @ pre.delta_p) / dt
    # gyro bias from rotation residual: R0 dR(b) ~ R1
    R1 = se3.euler_to_rot(pose_new[:3])
    dR_obs = R0.T @ R1
    rot_res = se3.so3_log(pre.delta_R.T @ dR_obs)
    I3 = jnp.eye(3)
    S_R = pre.cov[0:3, 0:3] + 2.0 * cfg.pose_anchor_rot_sigma**2 * I3
    Jw, rw = _whiten(S_R, pre.dR_dbg, rot_res)
    P_bg = state.P_bias[:3, :3] + cfg.gyr_bias_noise**2 * dt * I3
    H = Jw.T @ Jw + jnp.linalg.inv(P_bg)
    dbg_raw = jnp.linalg.solve(H, Jw.T @ rw)
    dbg = jnp.clip(dbg_raw, -0.1, 0.1)
    bg_new = state.bg + dbg
    # same clamp rule as velocity_bias_update2: a truncated step must not
    # contract the marginal as if the full MAP step was applied
    bg_marg = jnp.where(jnp.any(jnp.abs(dbg_raw) > 0.1),
                        P_bg, jnp.linalg.inv(H))
    # This one-window update estimates the gyro bias alone, so replace the
    # bg marginal AND drop the stale bg-ba cross blocks: shrinking the
    # marginal while keeping old cross terms can push the implied
    # correlation past 1 and leave P_bias indefinite, which would turn the
    # next two-window solve's inv(P_bias) prior into an anti-prior.
    zero = jnp.zeros((3, 3))
    P_bias = (state.P_bias.at[:3, :3].set(bg_marg)
              .at[:3, 3:].set(zero).at[3:, :3].set(zero))
    return ImuState(
        R=R1, v=v_new, p=p1, bg=bg_new, ba=state.ba, P_bias=P_bias,
    )
