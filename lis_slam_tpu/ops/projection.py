"""Range-image projection and per-ring compaction.

Rebuild of reference `src/core/laserProcessing.cpp`:
 - `projectPointCloud` (:467-510): project the (deskewed) cloud onto the
   N_SCAN x Horizon_SCAN range image; row = ring (with downsampleRate row
   skip), col = azimuth bin.
 - `cloudExtraction` (:515-539): flatten valid pixels row-major with per-ring
   start/end indices. Here the "extracted cloud" is a fixed-shape per-row
   compaction: each row's valid pixels are packed to the front of a
   (N_SCAN, H) buffer, preserving column order, with a per-row count.

Deviation (documented): on pixel collisions the reference keeps the FIRST
point in buffer order; we keep the NEAREST (min range), which is
deterministic under parallel scatter and at least as good for matching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SensorConfig

_INVALID_RANGE = jnp.float32(1e9)


class RangeImage(NamedTuple):
    """Projected scan on the fixed (N_SCAN, H) grid."""

    rng: jnp.ndarray  # (N, H) float32 range; _INVALID_RANGE where empty
    xyz: jnp.ndarray  # (N, H, 3) deskewed points
    intensity: jnp.ndarray  # (N, H)
    time: jnp.ndarray  # (N, H) per-point relative time
    mask: jnp.ndarray  # (N, H) bool


class ExtractedCloud(NamedTuple):
    """Per-row compacted valid pixels (cloudExtraction equivalent)."""

    rng: jnp.ndarray  # (N, H) compacted ranges
    xyz: jnp.ndarray  # (N, H, 3)
    intensity: jnp.ndarray  # (N, H)
    col: jnp.ndarray  # (N, H) original column index (pointColInd)
    count: jnp.ndarray  # (N,) valid count per row
    mask: jnp.ndarray  # (N, H) bool, True for compacted slots < count


def project(
    points: jnp.ndarray,  # (P, 3) deskewed xyz
    intensity: jnp.ndarray,  # (P,)
    ring: jnp.ndarray,  # (P,) int32
    rel_time: jnp.ndarray,  # (P,)
    valid: jnp.ndarray,  # (P,) bool
    cfg: SensorConfig,
) -> RangeImage:
    """Scatter points into the range image, nearest-range-wins."""
    n, h = cfg.n_scan, cfg.horizon_scan
    x, y = points[:, 0], points[:, 1]
    rng = jnp.linalg.norm(points, axis=-1)
    ok = valid & (rng >= cfg.lidar_min_range) & (rng <= cfg.lidar_max_range)
    ok = ok & (ring >= 0) & (ring < n)
    if cfg.downsample_rate > 1:
        ok = ok & (ring % cfg.downsample_rate == 0)

    ang_res = 360.0 / h
    horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + h // 2
    col = jnp.where(col >= h, col - h, col)
    ok = ok & (col >= 0) & (col < h)

    flat = ring * h + col
    flat = jnp.where(ok, flat, n * h)  # dump invalid into a spill slot
    rng_masked = jnp.where(ok, rng, _INVALID_RANGE)

    # pass 1: min range per pixel
    best = jnp.full((n * h + 1,), _INVALID_RANGE, dtype=jnp.float32)
    best = best.at[flat].min(rng_masked)
    # pass 2: winners scatter their payload (ties: arbitrary but consistent)
    is_winner = ok & (rng_masked <= best[flat])
    flat_w = jnp.where(is_winner, flat, n * h)

    def scatter(payload, init):
        buf = jnp.full((n * h + 1,) + payload.shape[1:], init, dtype=payload.dtype)
        return buf.at[flat_w].set(payload)[: n * h]

    xyz_img = scatter(points, 0.0).reshape(n, h, 3)
    int_img = scatter(intensity, 0.0).reshape(n, h)
    time_img = scatter(rel_time, 0.0).reshape(n, h)
    rng_img = best[: n * h].reshape(n, h)
    mask = rng_img < _INVALID_RANGE * 0.5
    return RangeImage(rng=rng_img, xyz=xyz_img, intensity=int_img, time=time_img, mask=mask)


def extract(img: RangeImage) -> ExtractedCloud:
    """Per-row stable compaction of valid pixels (cloudExtraction)."""
    n, h = img.rng.shape
    valid = img.mask

    # stable order: valid pixels keep column order, pushed to the front
    def compact_row(v, r, xyz, inten):
        pos = jnp.cumsum(v) - 1  # destination for each valid pixel
        dest = jnp.where(v, pos, h)  # spill
        cols = jnp.arange(h, dtype=jnp.int32)

        def scat(payload, init):
            buf = jnp.full((h + 1,) + payload.shape[1:], init, dtype=payload.dtype)
            return buf.at[dest].set(payload)[:h]

        return (
            scat(r, _INVALID_RANGE),
            scat(xyz, 0.0),
            scat(inten, 0.0),
            scat(cols, -1),
            jnp.sum(v.astype(jnp.int32)),
        )

    rng_c, xyz_c, int_c, col_c, count = jax.vmap(compact_row)(
        valid, img.rng, img.xyz, img.intensity
    )
    slot = jnp.arange(h)[None, :]
    mask = slot < count[:, None]
    return ExtractedCloud(
        rng=rng_c, xyz=xyz_c, intensity=int_c, col=col_c, count=count, mask=mask
    )
