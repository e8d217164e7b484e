"""Tightly-coupled LiDAR-inertial odometry driver (params_lio config 2).

Rebuild of the reference's `IMUPreintegration` integration pattern
(subMapOptmizationNode.cpp:2007-2219 + imuHandler :429-511): the host
maintains the navigation state (R, v, p, biases), preintegrates the IMU
between scans for the initial guess fed into the jitted odometry step,
refreshes velocity/bias from the lidar-optimized pose pair after each scan,
and applies the reference's failure detection (velocity/bias divergence ->
reset, :2222-2238).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

import functools

import jax

from ..config import SlamConfig
from ..imu import preintegration as pi
from ..utils import se3
from . import odometry


@functools.partial(jax.jit, static_argnames=("cfg",))
def _lio_prestep(cur_gyro, cur_accel, prev_time, prev_gyro_l, prev_accel_l,
                 prev_valid, prev_start, cur_start, imu_state, cfg):
    """ONE device program for the pre-odometry IMU chain: extrinsic
    rotation of the current window (for deskew), preintegration of the
    PREVIOUS window clipped to the realized inter-scan interval
    [prev_start, cur_start] (the delta that moves the nav state from
    pose_{i-1} to pose_i; the reference integrates between consecutive
    odometry stamps, subMapOptmizationNode.cpp:2096-2118), state
    prediction, and initial-guess assembly. (Eager op-by-op dispatch costs
    ~5-10 ms per op through a tunneled TPU.)"""
    g_j, a_j = pi.imu_to_lidar(cur_gyro, cur_accel, cfg.imu)
    pre = pi.preintegrate(
        prev_time, prev_gyro_l, prev_accel_l, prev_valid,
        imu_state.bg, imu_state.ba, cfg.imu, t0=prev_start, t1=cur_start)
    pred = pi.predict(imu_state, pre, cfg.imu.gravity)
    guess = jnp.concatenate(
        [se3.rot_to_euler(pred.R), pred.p]).astype(jnp.float32)
    # predicted body-frame velocity at scan start for the positional deskew
    # term (the findPosition term the reference zeroes for slow platforms)
    vel_body = (pred.R.T @ pred.v).astype(jnp.float32)
    return pre, guess, g_j, a_j, vel_body, pre.count >= 1


@functools.partial(jax.jit, static_argnames=("cfg",))
def _lio_poststep2(imu_state, pre1, pre2, pose0, pose1, pose2, v0_est,
                   fail_acc, cfg):
    """Two-window bias/velocity solve + sticky failure latch in one device
    program (the steady-state path: separates accel bias from velocity the
    way consecutive iSAM2 ImuFactors do)."""
    new_state, v1 = pi.velocity_bias_update2(
        imu_state, pre1, pre2, pose0, pose1, pose2, v0_est, cfg.imu)
    fail = pi.failure_detection(new_state.v, new_state.bg, new_state.ba)
    return new_state, v1, fail_acc | fail


@functools.partial(jax.jit, static_argnames=("cfg",))
def _lio_poststep(imu_state, pre, last_pose6, pose6, fail_acc, cfg):
    """Bias/velocity refresh + STICKY failure flag in one device program.

    The accumulator makes the sampled host-side check lossless: a divergence
    on any scan of the window stays latched until the host reads and resets
    it (the reference runs failureDetection on every update,
    subMapOptmizationNode.cpp:2153-2156)."""
    new_state = pi.velocity_bias_update(
        imu_state, pre, last_pose6, pose6, cfg.imu)
    fail = pi.failure_detection(new_state.v, new_state.bg, new_state.ba)
    return new_state, fail_acc | fail


@dataclass
class LioDiagnostics:
    n_resets: int = 0
    n_scans: int = 0


class LioOdometry:
    """Host loop: IMU windows + jitted odometry step."""

    def __init__(self, cfg: SlamConfig):
        assert cfg.imu.use_imu, "LIO requires imu.use_imu=True"
        self.cfg = cfg
        self.state = odometry.init_state(cfg)
        self.imu_state = pi.init_imu_state(cfg.imu)
        self.diag = LioDiagnostics()
        self._last_pose6: np.ndarray | None = None
        self._fail_acc = jnp.bool_(False)  # sticky device-side failure latch
        # sliding window pair for the two-window bias solve
        self._prev_pre = None  # preintegration of the previous window
        self._prev_pose6 = None  # pose at that window's start (pose0)
        self._v0 = jnp.zeros(3)  # velocity estimate at pose0
        # raw previous scan's IMU window (lidar frame) + its scan_start:
        # preintegrated at the NEXT scan, clipped to the realized
        # inter-scan interval
        self._prev_win = None  # (time, gyro_l, accel_l, valid, scan_start)

    def predict_imu_rate(self, imu_time: np.ndarray, imu_gyro: np.ndarray,
                         imu_accel: np.ndarray) -> jnp.ndarray:
        """IMU-rate odometry (the reference's odometry/imu stream published
        per IMU sample from imuHandler, subMapOptmizationNode.cpp:429-511):
        world pose6 at every sample of the given window, propagated from
        the current optimized nav state with the current bias estimates.
        One device call, returns a DEVICE (M, 6) array — downstream
        consumers (controllers, viz) get ~IMU-rate poses between the
        scan-rate updates of process_scan."""
        from . import driver

        it, ig, ia, iv = driver.pad_imu_window(
            self.cfg, imu_time, imu_gyro, imu_accel)
        k = int(iv.sum())
        ig_l, ia_l = pi.imu_to_lidar(
            jnp.asarray(ig), jnp.asarray(ia), self.cfg.imu)
        Rs, _vs, ps = pi.predict_path(
            jnp.asarray(it), ig_l, ia_l, jnp.asarray(iv), self.imu_state,
            self.cfg.imu)
        return se3.matrix_to_pose(se3.make_transform(Rs, ps))[:k]

    def _reset_imu(self):
        """resetParams equivalent: re-anchor at the current lidar pose."""
        pose = np.asarray(self.state.pose)
        self.imu_state = pi.init_imu_state(self.cfg.imu)._replace(
            R=se3.euler_to_rot(jnp.asarray(pose[:3])),
            p=jnp.asarray(pose[3:]),
        )
        self._prev_pre = None
        self._prev_pose6 = None
        self._v0 = jnp.zeros(3)
        self.diag.n_resets += 1

    def process_scan(
        self,
        points: np.ndarray,  # (P, 4) raw scan
        imu_time: np.ndarray,  # (M,) absolute seconds covering the gap+sweep
        imu_gyro: np.ndarray,  # (M, 3)
        imu_accel: np.ndarray,  # (M, 3)
        scan_start: float,
        imu_rpy: np.ndarray | None = None,  # (3,) orientation at scan start
        failure_check_every: int = 10,
    ) -> jnp.ndarray:
        """Returns the pose6 as a DEVICE array: the whole IMU+odometry chain
        stays on-device with zero per-scan host readbacks (a blocking D2H
        sync costs ~50 ms through a tunneled TPU; the reference's node graph
        likewise never blocks its odometry thread on consumers). Failure
        detection — the only host branch — runs every `failure_check_every`
        scans. Call np.asarray on the result to materialize it."""
        cfg = self.cfg
        from . import driver

        # --- pad the IMU window host-side (numpy, cheap), ONE prestep jit ---
        it, ig, ia, iv = driver.pad_imu_window(
            cfg, imu_time, imu_gyro, imu_accel)
        k = int(iv.sum())

        pre = guess = g_buf = a_buf = vel_body = win_ok = None
        it_j, iv_j = jnp.asarray(it), jnp.asarray(iv)
        if k >= 2 and self._prev_win is not None:
            pre, guess, g_buf, a_buf, vel_body, win_ok = _lio_prestep(
                jnp.asarray(ig), jnp.asarray(ia), *self._prev_win,
                jnp.float32(scan_start), self.imu_state, cfg)
        elif k >= 2:
            g_buf, a_buf = pi.imu_to_lidar(
                jnp.asarray(ig), jnp.asarray(ia), cfg.imu)

        sin = driver.pad_scan(points, cfg, scan_start=scan_start)
        extra = {}
        if g_buf is not None:
            extra["imu_time"] = it_j
            extra["imu_gyro"] = g_buf
            extra["imu_valid"] = iv_j
        if guess is not None and self._last_pose6 is not None:
            extra["init_guess"] = guess
            extra["init_guess_valid"] = win_ok
            # positional deskew only once the velocity estimate is live
            # (after the first bias/velocity refresh)
            if self._prev_pre is not None and vel_body is not None:
                extra["deskew_vel"] = vel_body
        if imu_rpy is not None:
            # absolute-orientation remap (imuConverter extRPY path,
            # utility.h:500-508) — distinct from the extRot rate rotation
            rpy = pi.remap_imu_orientation(imu_rpy, cfg.imu)
            extra["imu_rpy"] = jnp.asarray(rpy, jnp.float32)
            extra["imu_rpy_valid"] = jnp.bool_(True)
        if extra:
            sin = sin._replace(**extra)

        self.state, out = odometry.odom_step(self.state, sin, cfg)
        pose6 = out.pose  # device array; no readback

        # --- velocity/bias refresh from the lidar pose anchors ---
        if pre is not None and self._last_pose6 is not None:
            last6 = jnp.asarray(self._last_pose6, jnp.float32)
            if self._prev_pre is not None:
                # steady state: two-window joint (bg, ba, v) solve
                (self.imu_state, self._v0,
                 self._fail_acc) = _lio_poststep2(
                    self.imu_state, self._prev_pre, pre,
                    self._prev_pose6, last6, pose6, self._v0,
                    self._fail_acc, cfg)
            else:
                # first window after (re)init: single-window refresh
                self.imu_state, self._fail_acc = _lio_poststep(
                    self.imu_state, pre, last6, pose6,
                    self._fail_acc, cfg)
                self._v0 = self.imu_state.v
            self._prev_pre = pre
            self._prev_pose6 = last6
            # sampled host readback of the STICKY latch: one D2H sync per
            # failure_check_every scans, but no divergence event is dropped
            if self.diag.n_scans % failure_check_every == 0:
                if bool(self._fail_acc):
                    self._reset_imu()
                self._fail_acc = jnp.bool_(False)
        else:
            self.imu_state = self.imu_state._replace(
                R=se3.euler_to_rot(pose6[:3]),
                p=pose6[3:],
            )
        # stash this scan's window (lidar frame) for the next prestep
        if g_buf is not None:
            self._prev_win = (it_j, g_buf, a_buf, iv_j,
                              jnp.float32(scan_start))
        else:
            self._prev_win = None
        self._last_pose6 = pose6
        self.diag.n_scans += 1
        return pose6
