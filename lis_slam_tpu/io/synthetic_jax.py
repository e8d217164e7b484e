"""On-device (JAX) synthetic scan renderer — same world model as
synthetic.py but jitted, so benchmark sequences render in milliseconds on
TPU instead of ~10 s/scan in numpy. Validated against the numpy renderer in
tests (same geometry, same labels)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import synthetic
from ..utils import se3


class JaxWorld(NamedTuple):
    boxes: jnp.ndarray  # (B, 6)
    box_labels: jnp.ndarray  # (B,)
    poles: jnp.ndarray  # (Q, 4)


def to_device_world(world: synthetic.World) -> JaxWorld:
    return JaxWorld(
        boxes=jnp.asarray(world.boxes, dtype=jnp.float32),
        box_labels=jnp.asarray(world.box_labels),
        poles=jnp.asarray(world.poles, dtype=jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("n_scan", "horizon", "max_range"))
def render_scan_device(
    world: JaxWorld,
    pose6: jnp.ndarray,  # (6,)
    noise_key: jnp.ndarray,
    n_scan: int = 64,
    horizon: int = 1800,
    max_range: float = 120.0,
    noise: float = 0.01,
):
    """Raycast one undistorted sweep from pose6. Returns (points (P,4),
    labels (P,), valid (P,)) in sensor frame, beam order ring-major."""
    elev = jnp.deg2rad(jnp.asarray(synthetic.hdl64_elevations(), jnp.float32))
    az = jnp.linspace(0.0, 2 * jnp.pi, horizon, endpoint=False)
    el_all = jnp.repeat(elev, horizon)  # (P,)
    az_all = jnp.tile(az, n_scan)
    cos_e = jnp.cos(el_all)
    dirs_sensor = jnp.stack(
        [cos_e * jnp.cos(-az_all), cos_e * jnp.sin(-az_all), jnp.sin(el_all)],
        axis=1,
    )
    R = se3.euler_to_rot(pose6[:3])
    origin = pose6[3:]
    d = dirs_sensor @ R.T  # (P, 3) world-frame directions

    t_best = jnp.full(d.shape[0], jnp.inf)
    label = jnp.zeros(d.shape[0], jnp.int32)

    # ground plane z=0
    dz = d[:, 2]
    t_g = (0.0 - origin[2]) / jnp.where(jnp.abs(dz) > 1e-6, dz, -1e-6)
    hit_g = (dz < -1e-6) & (t_g > 0.5) & (t_g < max_range)
    t_best = jnp.where(hit_g, t_g, t_best)
    label = jnp.where(hit_g, synthetic.LBL_ROAD, label)

    # boxes (slab method)
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)  # (P, 3)
    lo = world.boxes[:, None, 0:3]  # (B, 1, 3)
    hi = world.boxes[:, None, 3:6]
    o = origin[None, None, :]
    t1 = (lo - o) * inv[None, :, :]
    t2 = (hi - o) * inv[None, :, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=2)  # (B, P)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=2)
    hit = (tmax >= tmin) & (tmax > 0) & (tmin > 0.5) & (tmin < max_range)
    t_box = jnp.where(hit, tmin, jnp.inf)
    bi = jnp.argmin(t_box, axis=0)
    t_bmin = jnp.min(t_box, axis=0)
    closer = t_bmin < t_best
    t_best = jnp.where(closer, t_bmin, t_best)
    label = jnp.where(closer, world.box_labels[bi], label)

    # poles (cylinders)
    cx = world.poles[:, 0][:, None]
    cy = world.poles[:, 1][:, None]
    r = world.poles[:, 2][:, None]
    h = world.poles[:, 3][:, None]
    fx = origin[0] - cx
    fy = origin[1] - cy
    dx = d[None, :, 0]
    dy = d[None, :, 1]
    a = dx * dx + dy * dy
    b = 2 * (fx * dx + fy * dy)
    c = fx * fx + fy * fy - r * r
    disc = b * b - 4 * a * c
    tq = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * jnp.maximum(a, 1e-12))
    zhit = origin[2] + tq * d[None, :, 2]
    hitp = (disc > 0) & (tq > 0.5) & (tq < max_range) & (zhit > 0) & (zhit < h)
    t_p = jnp.where(hitp, tq, jnp.inf)
    pi_ = jnp.argmin(t_p, axis=0)
    t_pmin = jnp.min(t_p, axis=0)
    closer = t_pmin < t_best
    t_best = jnp.where(closer, t_pmin, t_best)
    label = jnp.where(closer, synthetic.LBL_POLE, label)

    valid = jnp.isfinite(t_best)
    t_hit = jnp.where(valid, t_best, 0.0)
    pts_world = origin[None, :] + d * t_hit[:, None]
    pts_sensor = (pts_world - origin[None, :]) @ R  # R^T applied from right
    k1, k2 = jax.random.split(noise_key)
    pts_sensor = pts_sensor + noise * jax.random.normal(k1, pts_sensor.shape)
    intensity = jnp.where(label == synthetic.LBL_POLE, 0.8, 0.3) + \
        jax.random.uniform(k2, (pts_sensor.shape[0],)) * 0.2
    points = jnp.concatenate([pts_sensor, intensity[:, None]], axis=1)
    points = jnp.where(valid[:, None], points, 0.0)
    return points, jnp.where(valid, label, 0), valid


def render_sequence_device(n_scans: int, seed: int = 5, radius: float = 60.0,
                           speed: float = 8.0):
    """Render an undistorted bench sequence on-device. Returns
    (list of (P,4) arrays (device), gt poses (n+1, 6) numpy)."""
    world = to_device_world(synthetic.make_world(seed))
    gt = synthetic.circular_trajectory(n_scans + 1, radius=radius, speed=speed)
    key = jax.random.PRNGKey(seed)
    scans = []
    for i in range(n_scans):
        key, sub = jax.random.split(key)
        pts, lbl, val = render_scan_device(
            world, jnp.asarray(gt[i], dtype=jnp.float32), sub
        )
        scans.append((pts, lbl, val))
    return scans, gt
