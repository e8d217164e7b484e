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

from ..config import SlamConfig
from ..imu import preintegration as pi
from ..utils import se3
from . import odometry


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
        self.imu_state = pi.ImuState(
            R=jnp.eye(3), v=jnp.zeros(3), p=jnp.zeros(3),
            bg=jnp.zeros(3), ba=jnp.zeros(3),
        )
        self.diag = LioDiagnostics()
        self._last_pose6: np.ndarray | None = None

    def _reset_imu(self):
        """resetParams equivalent: re-anchor at the current lidar pose."""
        pose = np.asarray(self.state.pose)
        self.imu_state = pi.ImuState(
            R=se3.euler_to_rot(jnp.asarray(pose[:3])),
            v=jnp.zeros(3), p=jnp.asarray(pose[3:]),
            bg=jnp.zeros(3), ba=jnp.zeros(3),
        )
        self.diag.n_resets += 1

    def process_scan(
        self,
        points: np.ndarray,  # (P, 4) raw scan
        imu_time: np.ndarray,  # (M,) absolute seconds covering the gap+sweep
        imu_gyro: np.ndarray,  # (M, 3)
        imu_accel: np.ndarray,  # (M, 3)
        scan_start: float,
        imu_rpy: np.ndarray | None = None,  # (3,) orientation at scan start
    ) -> np.ndarray:
        cfg = self.cfg
        from . import driver

        # rotate raw IMU into the lidar frame (imuConverter, utility.h:482-517)
        if len(imu_time):
            g_j, a_j = pi.imu_to_lidar(
                jnp.asarray(imu_gyro, jnp.float32),
                jnp.asarray(imu_accel, jnp.float32), cfg.imu)
            imu_gyro = np.asarray(g_j)
            imu_accel = np.asarray(a_j)

        # --- preintegrate the inter-scan window for the initial guess ---
        init_guess = None
        if self._last_pose6 is not None and len(imu_time) >= 2:
            pre = pi.preintegrate(
                jnp.asarray(imu_time, jnp.float32),
                jnp.asarray(imu_gyro, jnp.float32),
                jnp.asarray(imu_accel, jnp.float32),
                jnp.ones(len(imu_time), bool),
                self.imu_state.bg, self.imu_state.ba, cfg.imu,
            )
            pred = pi.predict(self.imu_state, pre, cfg.imu.gravity)
            rpy = se3.rot_to_euler(pred.R)
            init_guess = np.concatenate(
                [np.asarray(rpy), np.asarray(pred.p)]).astype(np.float32)
        else:
            pre = None

        sin = driver.pad_scan(
            points, cfg,
            imu_time=imu_time, imu_gyro=imu_gyro, scan_start=scan_start,
        )
        extra = {}
        if init_guess is not None:
            extra["init_guess"] = jnp.asarray(init_guess)
            extra["init_guess_valid"] = jnp.bool_(True)
        if imu_rpy is not None:
            extra["imu_rpy"] = jnp.asarray(imu_rpy, jnp.float32)
            extra["imu_rpy_valid"] = jnp.bool_(True)
        if extra:
            sin = sin._replace(**extra)

        self.state, out = odometry.odom_step(self.state, sin, cfg)
        pose6 = np.asarray(out.pose)

        # --- velocity/bias refresh from the lidar pose pair ---
        if pre is not None and self._last_pose6 is not None:
            self.imu_state = pi.velocity_bias_update(
                self.imu_state, pre,
                jnp.asarray(self._last_pose6, jnp.float32),
                jnp.asarray(pose6, jnp.float32),
                cfg.imu.gravity,
            )
            if bool(pi.failure_detection(
                    self.imu_state.v, self.imu_state.bg, self.imu_state.ba)):
                self._reset_imu()
        else:
            self.imu_state = self.imu_state._replace(
                R=se3.euler_to_rot(jnp.asarray(pose6[:3])),
                p=jnp.asarray(pose6[3:]),
            )
        self._last_pose6 = pose6
        self.diag.n_scans += 1
        return pose6
