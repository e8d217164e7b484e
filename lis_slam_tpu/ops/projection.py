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

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SensorConfig

_INVALID_RANGE = np.float32(1e9)  # numpy: inlined at trace (see ops/voxel.py)


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
    # raw-point index of each compacted slot (-1 padded): lets any
    # per-raw-point payload (e.g. semantic labels) be gathered onto the
    # grid without a second projection pass. Populated by the fused
    # project_and_extract path; -1 everywhere from extract().
    src: jnp.ndarray | None = None  # (N, H) int32


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
    # pass 2: winners scatter their payload in ONE packed op (ties: arbitrary
    # but consistent) — separate scatters per channel cost ~3x on TPU
    is_winner = ok & (rng_masked <= best[flat])
    flat_w = jnp.where(is_winner, flat, n * h)
    payload = jnp.concatenate(
        [points, intensity[:, None], rel_time[:, None]], axis=1
    )  # (P, 5)
    img = jnp.zeros((n * h + 1, 5), jnp.float32).at[flat_w].set(payload)[: n * h]
    xyz_img = img[:, :3].reshape(n, h, 3)
    int_img = img[:, 3].reshape(n, h)
    time_img = img[:, 4].reshape(n, h)
    rng_img = best[: n * h].reshape(n, h)
    mask = rng_img < _INVALID_RANGE * 0.5
    return RangeImage(rng=rng_img, xyz=xyz_img, intensity=int_img, time=time_img, mask=mask)


def project_and_extract(
    points: jnp.ndarray,  # (P, 3) deskewed xyz
    intensity: jnp.ndarray,
    ring: jnp.ndarray,
    rel_time: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: SensorConfig,
    want_image: bool = True,
) -> tuple[RangeImage | None, ExtractedCloud]:
    """Fused projection + extraction via ONE sort (production path).

    TPU scatters with colliding indices are slow; instead, points are sorted
    by a packed (pixel, quantized-range) key so the first entry per pixel is
    the nearest-range winner AND winners come out in row-major pixel order —
    exactly the cloudExtraction compaction order. Two unique-index scatters
    then materialize the grid image and the per-row compacted cloud.

    Equivalent to project() + extract() up to range quantization (~4 mm
    winner ties); validated against the reference pair in tests.
    """
    n, h = cfg.n_scan, cfg.horizon_scan
    p_cap = points.shape[0]
    x, y = points[:, 0], points[:, 1]
    rng = jnp.linalg.norm(points, axis=-1)
    ok = valid & (rng >= cfg.lidar_min_range) & (rng <= cfg.lidar_max_range)
    ok &= (ring >= 0) & (ring < n)
    if cfg.downsample_rate > 1:
        ok = ok & (ring % cfg.downsample_rate == 0)
    ang_res = 360.0 / h
    horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + h // 2
    col = jnp.where(col >= h, col - h, col)
    ok = ok & (col >= 0) & (col < h)

    pix = ring * h + col
    rq = jnp.clip(rng * (16383.0 / max(cfg.lidar_max_range, 1e-3)),
                  0, 16382).astype(jnp.int32)
    key = jnp.where(ok, pix * 16384 + rq, jnp.int32(2**31 - 1))

    # payload rides INSIDE the sorting network (multi-operand lax.sort) —
    # a separate argsort+gather costs an extra ~3 ms of random access.
    # src (the raw-point index, exact in f32 for P < 2^24) rides along so
    # per-raw-point payloads (semantic labels) can be gathered onto the
    # compacted grid later without re-projecting.
    src_f = jnp.arange(p_cap, dtype=jnp.float32)
    cols_payload = (
        rng, points[:, 0], points[:, 1], points[:, 2], intensity, rel_time,
        src_f,
    )
    sorted1 = jax.lax.sort((key,) + cols_payload, num_keys=1)
    ks = sorted1[0]
    kpix = ks // 16384
    first = jnp.concatenate([jnp.ones(1, bool), kpix[1:] != kpix[:-1]])
    first = first & (ks != 2**31 - 1)
    wp = jnp.stack(sorted1[1:], axis=1)  # (P, 7) rng,x,y,z,int,time,src

    # winners are already in row-major pixel order within sorted1; their
    # per-row compaction slot is their global winner rank minus the row's
    # first winner rank — ONE unique-index scatter replaces the second
    # (9-operand) sort of the round-1 implementation
    win_row = jnp.where(first, kpix // h, n)
    counts = jnp.sum(
        (win_row[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]),
        axis=0,
    ).astype(jnp.int32)  # (n,) winners per row
    row_start = jnp.cumsum(counts) - counts  # exclusive prefix
    wrank = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot = wrank - row_start[jnp.clip(win_row, 0, n - 1)]
    cdest = jnp.where(first & (slot < h), win_row * h + slot, n * h)
    col_f = (kpix % h).astype(jnp.float32)
    payload = jnp.concatenate([wp, col_f[:, None]], axis=1)  # (P, 8)
    comp = jnp.zeros((n * h + 1, 8), jnp.float32).at[cdest].set(
        payload, unique_indices=True)[: n * h].reshape(n, h, 8)
    count = counts
    mask = jnp.arange(h)[None, :] < count[:, None]

    # grid image: one more unique-index scatter (skippable — the LOAM front
    # end only needs the compacted cloud; semantics need the image)
    img = None
    if want_image:
        gdest = jnp.where(first, kpix, n * h)
        grid = jnp.zeros((n * h + 1, 8), jnp.float32).at[gdest].set(
            payload, unique_indices=True)[: n * h]
        rng_img = jnp.where(grid[:, 0] > 0, grid[:, 0], _INVALID_RANGE)
        img = RangeImage(
            rng=rng_img.reshape(n, h),
            xyz=grid[:, 1:4].reshape(n, h, 3),
            intensity=grid[:, 4].reshape(n, h),
            time=grid[:, 5].reshape(n, h),
            mask=(grid[:, 0] > 0).reshape(n, h),
        )
    ext = ExtractedCloud(
        rng=jnp.where(mask, comp[..., 0], _INVALID_RANGE),
        xyz=comp[..., 1:4],
        intensity=comp[..., 4],
        col=jnp.where(mask, comp[..., 7].astype(jnp.int32), -1),
        count=count,
        mask=mask,
        src=jnp.where(mask, comp[..., 6].astype(jnp.int32), -1),
    )
    return img, ext


def extract(img: RangeImage) -> ExtractedCloud:
    """Per-row stable compaction of valid pixels (cloudExtraction).

    One packed global scatter: destination = row * H + (per-row running
    count), preserving column order within each row.
    """
    n, h = img.rng.shape
    valid = img.mask
    pos = jnp.cumsum(valid, axis=1) - 1  # per-row destination
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    dest = jnp.where(valid, rows * h + pos, n * h).reshape(-1)
    payload = jnp.concatenate(
        [
            img.rng[..., None],
            img.xyz,
            img.intensity[..., None],
            cols[..., None].astype(jnp.float32),
        ],
        axis=-1,
    ).reshape(-1, 6)
    buf = jnp.full((n * h + 1, 6), 0.0, jnp.float32).at[dest].set(payload)[: n * h]
    buf = buf.reshape(n, h, 6)
    count = jnp.sum(valid.astype(jnp.int32), axis=1)
    slot = jnp.arange(h)[None, :]
    mask = slot < count[:, None]
    rng_c = jnp.where(mask, buf[..., 0], _INVALID_RANGE)
    col_c = jnp.where(mask, buf[..., 5].astype(jnp.int32), -1)
    return ExtractedCloud(
        rng=rng_c,
        xyz=buf[..., 1:4],
        intensity=buf[..., 4],
        col=col_c,
        count=count,
        mask=mask,
        src=jnp.full((n, h), -1, jnp.int32),  # raw indices unknown here
    )
