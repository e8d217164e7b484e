"""IMU-rotation motion deskew.

Rebuild of reference `src/core/laserProcessing.cpp`:
 - `imuDeskewInfo` (:211-266): integrate raw gyro rates over the scan window
   into per-axis angle curves (the reference integrates x/y/z angles
   independently, NOT on SO(3) — reproduced faithfully here),
 - `findRotation` (:368-400): linear interpolation of the angle curves at each
   point's timestamp,
 - `deskewPoint` (:427-462): rotate every point into the scan-start frame via
   transBt = T_start^-1 * T(t).

Everything is fixed-shape: the IMU window is a padded (M,) buffer with a
validity mask; interpolation is a vectorized searchsorted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import se3


class DeskewInfo(NamedTuple):
    """Per-scan rotation curves integrated from gyro (padded to M samples)."""

    times: jnp.ndarray  # (M,) seconds, relative to scan start
    rot_xyz: jnp.ndarray  # (M, 3) integrated angles at each sample
    count: jnp.ndarray  # () int32, number of valid samples
    available: jnp.ndarray  # () bool — imuAvailable flag


def integrate_gyro(
    imu_time: jnp.ndarray,  # (M,) absolute seconds, padded
    imu_gyro: jnp.ndarray,  # (M, 3) rad/s in lidar frame, padded
    imu_valid: jnp.ndarray,  # (M,) bool
    scan_start: jnp.ndarray,  # () absolute seconds
) -> DeskewInfo:
    """Cumulative per-axis angle integration (imuDeskewInfo).

    The first valid sample anchors angle 0; subsequent samples accumulate
    rate * dt. Padding samples repeat the last valid value so interpolation
    saturates (matching findRotation's clamp-to-end behavior).
    """
    m = imu_time.shape[0]
    t_rel = imu_time - scan_start
    # forward-fill: dt between consecutive valid samples
    prev_t = jnp.concatenate([t_rel[:1], t_rel[:-1]])
    dt = jnp.where(imu_valid, t_rel - prev_t, 0.0)
    # first valid sample has dt forced to 0 (anchor)
    idx = jnp.arange(m)
    first_idx = jnp.argmax(imu_valid)  # first True (0 if none)
    dt = jnp.where(idx == first_idx, 0.0, dt)
    incr = jnp.where(imu_valid[:, None], imu_gyro * dt[:, None], 0.0)
    rot = jnp.cumsum(incr, axis=0)
    count = jnp.sum(imu_valid.astype(jnp.int32))
    # times for padding slots: clamp to +inf so searchsorted never lands there
    t_query = jnp.where(imu_valid, t_rel, jnp.inf)
    available = count >= 2
    return DeskewInfo(
        times=t_query.astype(jnp.float32),
        rot_xyz=rot.astype(jnp.float32),
        count=count,
        available=available,
    )


def rotation_at(info: DeskewInfo, t: jnp.ndarray) -> jnp.ndarray:
    """(N,) point times -> (N, 3) interpolated angles (findRotation).

    Outside the sampled window the curve saturates at the endpoint values
    (reference clamps: `pointTime > imuTime[imuPointerFront]` case).
    """
    hi = jnp.searchsorted(info.times, t, side="right")
    last = jnp.maximum(info.count - 1, 0)
    hi = jnp.clip(hi, 1, last)
    lo = hi - 1
    t_lo = info.times[lo]
    t_hi = info.times[hi]
    denom = jnp.maximum(t_hi - t_lo, 1e-9)
    w = jnp.clip((t - t_lo) / denom, 0.0, 1.0)
    return info.rot_xyz[lo] + w[:, None] * (info.rot_xyz[hi] - info.rot_xyz[lo])


def deskew_points(
    points: jnp.ndarray,  # (N, 3)
    t: jnp.ndarray,  # (N,) seconds from scan start
    info: DeskewInfo,
    valid: jnp.ndarray,  # (N,) bool
    vel_body: jnp.ndarray | None = None,  # (3,) m/s, scan-start body frame
) -> jnp.ndarray:
    """Rotate points into the scan-start frame (deskewPoint).

    T(t) = getTransformation(0,0,0, rotX(t), rotY(t), rotZ(t));
    p' = (T(t0)^-1 @ T(t)) p, where t0 is the first projected point's time.

    `vel_body` adds the positional term the reference disables
    (findPosition, laserProcessing.cpp:402-425 — zeroed there for slow
    platforms): p' += v_body * t. At speed v the translation distortion is
    v * scan_period per sweep (0.6 m at 6 m/s) — LARGER than the rotational
    term for nearby points, so the LIO path feeds the nav-state velocity
    here. Rotation-only (vel_body=None / zeros) reproduces the reference.
    """
    rpy = rotation_at(info, t)  # (N, 3)
    # anchor: rotation at the earliest valid point time
    t0 = jnp.min(jnp.where(valid, t, jnp.inf))
    rpy0 = rotation_at(info, t0[None])[0]
    R = se3.euler_to_rot(rpy)
    R0 = se3.euler_to_rot(rpy0)
    # R_bt = R0^T @ R(t) ; p' = R_bt @ p (+ v_body (t - t0))
    Rbt = jnp.einsum("ji,njk->nik", R0, R)
    out = jnp.einsum("nij,nj->ni", Rbt, points)
    if vel_body is not None:
        out = out + vel_body[None, :] * (t - t0)[:, None]
    use = valid & info.available
    return jnp.where(use[:, None], out, points)
