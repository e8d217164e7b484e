"""Velocity-based motion compensation (alternate front-end path).

Rebuild of `src/core/distortionAdjust.cpp` (the dataPretreat front-end,
reference components #7/#8):
 - `VelocityData::SyncData` / `IMUData::SyncData` (:4-178): linear
   interpolation of velocity / angular-rate streams to the scan timestamp,
 - `DistortionAdjust::AdjustCloud` + `UpdateMatrix` (:412-480):
   constant-velocity per-point compensation — rotate each point by
   angular_rate * t and translate by velocity * t back into the scan-start
   frame.

Used by the `data_pretreat` pipeline variant when IMU orientation
integration is unavailable but ego-velocity is (e.g. GPS velocity on the
KITTI raw configs, params.yaml useGPSVel).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import se3


def sync_to_time(stream_t: jnp.ndarray, stream_v: jnp.ndarray,
                 valid: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of a (M, D) stream at time t (SyncData)."""
    tq = jnp.where(valid, stream_t, jnp.inf)
    hi = jnp.clip(jnp.searchsorted(tq, t, side="right"),
                  1, jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - 1, 1))
    lo = hi - 1
    t0, t1 = tq[lo], tq[hi]
    w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    return stream_v[lo] + w * (stream_v[hi] - stream_v[lo])


def velocity_deskew(
    points: jnp.ndarray,  # (N, 3) sensor frame, measured at their fire time
    rel_time: jnp.ndarray,  # (N,) seconds from scan start
    angular_rate: jnp.ndarray,  # (3,) rad/s at scan time (body frame)
    velocity: jnp.ndarray,  # (3,) m/s at scan time (body frame)
    valid: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Constant-velocity compensation to the scan-start frame
    (AdjustCloud/UpdateMatrix): p' = R(w*t) p + v*t.

    The reference centers time on the scan middle (adjusts by -scan_period/2
    first); here times are already relative to scan start, matching the rest
    of this pipeline.
    """
    angles = rel_time[:, None] * angular_rate[None, :]  # (N, 3)
    R = se3.euler_to_rot(angles)  # per-point small rotation
    trans = rel_time[:, None] * velocity[None, :]
    out = jnp.einsum("nij,nj->ni", R, points) + trans
    return jnp.where(valid[:, None], out, points)
