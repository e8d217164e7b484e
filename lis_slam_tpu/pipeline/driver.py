"""Host-side replay driver: streams scans through the jitted pipeline.

Replaces the reference's ROS node + rosbag-play runtime (launch/run.launch,
module_loam.launch): a plain Python loop that feeds padded scan arrays to
`odom_step` and collects poses. Per-stage wall-clock counters replace the
reference's std::chrono running averages (laserPretreatmentNode.cpp:226-234
and friends).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from . import odometry


@dataclass
class ReplayResult:
    poses: np.ndarray  # (N, 6)
    keyframes: np.ndarray  # (N,) bool
    n_valid: np.ndarray  # (N,)
    iterations: np.ndarray  # (N,)
    scans_per_sec: float
    wall_s: float
    stage_ms: dict = field(default_factory=dict)


def pad_imu_window(cfg: SlamConfig, imu_time: np.ndarray,
                   imu_gyro: np.ndarray, imu_accel: np.ndarray | None):
    """Zero-pad an IMU window to cfg.imu.max_imu_per_scan rows (numpy,
    host-side). Padded accel slots carry neutral gravity so downstream
    math over masked-but-touched lanes stays benign; a gyro-only caller
    (imu_accel=None) gets the same gravity-neutral rows for the VALID
    slots too (specific force that integrates to zero acceleration —
    constant velocity), NOT zeros, which would preintegrate free fall and
    bias the predicted velocity by ~g*dt per window. The ONE shared
    implementation — LioOdometry, SemanticSlam.process_scan, pad_scan, and
    predict_imu_rate all consume it (hand-rolled copies drifted before
    this existed).

    Returns (time (m,), gyro (m,3), accel (m,3), valid (m,) bool)."""
    m = cfg.imu.max_imu_per_scan
    k = min(len(imu_time), m)
    it = np.zeros(m, np.float32)
    ig = np.zeros((m, 3), np.float32)
    ia = np.zeros((m, 3), np.float32)
    ia[:, 2] = cfg.imu.gravity
    it[:k] = imu_time[:k]
    ig[:k] = imu_gyro[:k]
    if imu_accel is not None:
        ia[:k] = imu_accel[:k]
    return it, ig, ia, np.arange(m) < k


def pad_scan(points_xyzi: np.ndarray, cfg: SlamConfig,
             imu_time: np.ndarray | None = None,
             imu_gyro: np.ndarray | None = None,
             imu_accel: np.ndarray | None = None,
             scan_start: float = 0.0,
             velocity: np.ndarray | None = None,
             angular_rate: np.ndarray | None = None) -> odometry.ScanInput:
    """Pad a raw (P, 4) host cloud to the fixed scan buffer.

    The IMU window is padded through pad_imu_window so gyro-only callers
    get gravity-neutral accel rows (zeros would preintegrate free fall).

    `velocity`/`angular_rate`: body-frame ego motion at scan time for the
    dataPretreat front-end (cfg.imu.deskew_mode == "velocity")."""
    p = cfg.sensor.max_raw_points
    m = cfg.imu.max_imu_per_scan
    pts = np.zeros((p, 4), np.float32)
    val = np.zeros((p,), bool)
    n = min(len(points_xyzi), p)
    pts[:n] = points_xyzi[:n]
    val[:n] = True
    if imu_time is not None and len(imu_time):
        it, ig, ia, iv = pad_imu_window(cfg, imu_time, imu_gyro, imu_accel)
    else:
        it = np.zeros((m,), np.float32)
        ig = np.zeros((m, 3), np.float32)
        ia = np.zeros((m, 3), np.float32)
        ia[:, 2] = cfg.imu.gravity
        iv = np.zeros((m,), bool)
    has_vel = velocity is not None
    return odometry.ScanInput(
        points=jnp.asarray(pts),
        valid=jnp.asarray(val),
        imu_time=jnp.asarray(it),
        imu_gyro=jnp.asarray(ig),
        imu_valid=jnp.asarray(iv),
        scan_start=jnp.float32(scan_start),
        imu_accel=jnp.asarray(ia),
        vel=jnp.asarray(np.asarray(velocity, np.float32) if has_vel
                        else np.zeros(3, np.float32)),
        ang_rate=jnp.asarray(
            np.asarray(angular_rate, np.float32)
            if angular_rate is not None else np.zeros(3, np.float32)),
        vel_valid=jnp.bool_(has_vel),
    )


class VelocityStream:
    """Host-side ego-velocity buffer for the dataPretreat velocity
    front-end — the rebuild of dataPretreatNode's vel queue + the
    `VelocityData::SyncData` linear interpolation (distortionAdjust.cpp:
    4-98). Feed it GPS velocity twists (already rotated into the lidar
    frame via `imu.preintegration.gps_vel_to_lidar`, the gpsVelConverter
    equivalent) or fusion-odometry twists (useGPSVel=false path,
    dataPretreatNode.cpp:111-134); `at(t)` returns the interpolated
    (linear, angular) pair to pass to `pad_scan(velocity=...,
    angular_rate=...)`."""

    def __init__(self, max_len: int = 4096):
        self._t: list[float] = []
        self._lin: list[np.ndarray] = []
        self._ang: list[np.ndarray] = []
        self._max = max_len

    def push(self, t: float, linear, angular) -> None:
        self._t.append(float(t))
        self._lin.append(np.asarray(linear, np.float64))
        self._ang.append(np.asarray(angular, np.float64))
        if len(self._t) > self._max:  # drop-oldest, reference deque policy
            del self._t[0], self._lin[0], self._ang[0]

    def at(self, t: float):
        """Interpolated (linear (3,), angular (3,)) at time t, or None if
        the stream does not bracket t (SyncData returns false — the
        reference then skips velocity compensation for that scan)."""
        if len(self._t) < 2 or not (self._t[0] <= t <= self._t[-1]):
            return None
        hi = int(np.searchsorted(np.asarray(self._t), t, side="right"))
        hi = min(max(hi, 1), len(self._t) - 1)
        lo = hi - 1
        denom = self._t[hi] - self._t[lo]
        w = (t - self._t[lo]) / denom if denom > 1e-9 else 0.0
        lin = self._lin[lo] + w * (self._lin[hi] - self._lin[lo])
        ang = self._ang[lo] + w * (self._ang[hi] - self._ang[lo])
        return lin, ang


def replay_odometry(scans, cfg: SlamConfig, warmup: int = 0,
                    donate: bool = True) -> ReplayResult:
    """Run the front-end odometry over an iterable of host scans.

    Each scan is either a SyntheticScan-like object (``.points``, ``.valid``,
    optional ``.gyro/.imu_time``) or a raw (P, 4) numpy array.
    """
    state = odometry.init_state(cfg)
    poses, kfs, nvs, its = [], [], [], []
    t0 = None
    step = odometry.odom_step
    for i, scan in enumerate(scans):
        if hasattr(scan, "points"):
            arr = scan.points[scan.valid] if scan.points.shape[0] else scan.points
            use_imu = cfg.imu.use_imu and getattr(scan, "gyro", None) is not None
            sin = pad_scan(
                arr, cfg,
                imu_time=scan.imu_time if use_imu else None,
                imu_gyro=scan.gyro if use_imu else None,
                scan_start=0.0,
            )
        else:
            sin = pad_scan(np.asarray(scan), cfg)
        state, out = step(state, sin, cfg)
        if i + 1 == warmup:
            # axon: only a D2H materialization synchronizes (block_until_
            # ready can return before the async remote execution finishes)
            jax.device_get(out.pose)
            t0 = time.perf_counter()
        poses.append(np.asarray(out.pose))
        kfs.append(bool(out.is_keyframe))
        nvs.append(int(out.n_valid))
        its.append(int(out.iterations))
    jax.device_get(out.pose)
    wall = time.perf_counter() - (t0 if t0 is not None else time.perf_counter())
    n_timed = len(poses) - warmup if t0 is not None else 0
    return ReplayResult(
        poses=np.asarray(poses),
        keyframes=np.asarray(kfs),
        n_valid=np.asarray(nvs),
        iterations=np.asarray(its),
        scans_per_sec=(n_timed / wall) if n_timed and wall > 0 else 0.0,
        wall_s=wall,
    )
