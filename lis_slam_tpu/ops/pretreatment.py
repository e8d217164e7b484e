"""Laser pretreatment: ring id + relative-time synthesis, range gating.

TPU-native rebuild of reference `src/core/laserPretreatment.cpp:4-160`
(`LaserPretreatment::Pretreatment`): instead of a sequential loop with
`halfPassed` state, everything is a fixed-shape masked array op over the
padded raw cloud.

Inputs are padded buffers: `points` (P, 4) [x, y, z, intensity] with a
validity mask. Invalid points (padding, NaN) keep mask=False throughout.

Deviation from the reference (documented): the sequential azimuth unwrap
carries a `halfPassed` flag to disambiguate noisy orientations near the sweep
wrap; the vectorized version uses `mod(ori - start, 2*pi)` which differs only
for a handful of boundary points per sweep (validated in tests against a
faithful numpy replica of the sequential algorithm).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SensorConfig


class PretreatedCloud(NamedTuple):
    """Pretreated scan: padded point buffer + per-point ring/time."""

    points: jnp.ndarray  # (P, 4) x, y, z, intensity
    ring: jnp.ndarray  # (P,) int32
    rel_time: jnp.ndarray  # (P,) float32, seconds from scan start
    valid: jnp.ndarray  # (P,) bool


def compute_ring(points: jnp.ndarray, valid: jnp.ndarray, n_scan: int):
    """Per-point ring id from elevation angle.

    Per-sensor formulas for 16/32/64-beam Velodyne
    (laserPretreatment.cpp:33-60).
    Returns (ring int32, valid bool) — valid is ANDed with ring-range checks.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    horiz = jnp.sqrt(x * x + y * y)
    angle = jnp.arctan2(z, jnp.maximum(horiz, 1e-12)) * (180.0 / jnp.pi)

    if n_scan == 16:
        ring = jnp.floor((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n_scan - 1)
    elif n_scan == 32:
        ring = jnp.floor((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n_scan - 1)
    elif n_scan == 64:
        # HDL-64: upper block (angle >= -8.83deg) at 1/3 deg spacing from +2,
        # lower block at 1/2 deg spacing; rows > 50 are outliers.
        upper = jnp.floor((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        lower = n_scan // 2 + jnp.floor((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        ring = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring <= 50)
    else:
        raise ValueError(f"unsupported N_SCAN={n_scan}")
    return jnp.where(valid, ring, -1), valid & ok


def compute_rel_time(
    points: jnp.ndarray, valid: jnp.ndarray, scan_period: float
) -> jnp.ndarray:
    """Relative time in [0, scan_period] from azimuth sweep fraction.

    Vectorized equivalent of the startOri/endOri unwrap
    (laserPretreatment.cpp:17-20, 62-76).
    """
    ori = -jnp.arctan2(points[..., 1], points[..., 0])
    # first/last valid point orientation
    idx = jnp.arange(ori.shape[0])
    big = jnp.where(valid, idx, ori.shape[0] + 1)
    small = jnp.where(valid, idx, -1)
    first = jnp.argmin(big)
    last = jnp.argmax(small)
    start_ori = ori[first]
    end_ori = ori[last] + 2.0 * jnp.pi
    span = end_ori - start_ori
    # reference clamps span into (pi, 3*pi)
    span = jnp.where(span > 3.0 * jnp.pi, span - 2.0 * jnp.pi, span)
    span = jnp.where(span < jnp.pi, span + 2.0 * jnp.pi, span)
    delta = jnp.mod(ori - start_ori, 2.0 * jnp.pi)
    rel = jnp.clip(delta / span, 0.0, 1.0)
    return jnp.where(valid, rel * scan_period, 0.0).astype(jnp.float32)


def pretreat(
    points: jnp.ndarray, valid: jnp.ndarray, cfg: SensorConfig
) -> PretreatedCloud:
    """Full pretreatment: NaN/range gate + ring + relative time.

    Mirrors LaserPretreatment::Pretreatment + removeClosedPointCloud
    (laserPretreatment.h:25-54).
    """
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    rng = jnp.linalg.norm(points[..., :3], axis=-1)
    in_range = (rng >= cfg.lidar_min_range) & (rng <= cfg.lidar_max_range) & (rng > 1e-3)
    valid = valid & finite & in_range
    ring, valid = compute_ring(points, valid, cfg.n_scan)
    rel_time = compute_rel_time(points, valid, cfg.scan_period)
    pts = jnp.where(valid[..., None], points, 0.0)
    return PretreatedCloud(points=pts, ring=ring, rel_time=rel_time, valid=valid)
