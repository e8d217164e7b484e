"""Per-scan semantic inference: raw cloud -> per-point learning-class labels.

This is the semanticFusionNode's inference path
(src/node/semanticFusionNode.cpp:139-170 -> rangenetAPI.cpp:17-127 ->
netTensorRT.cpp:309-440) rebuilt as one jitted device program: spherical
projection (shared with the SLAM front end), RangeNet forward pass, argmax,
and unprojection back to the raw points by (ring, col) pixel lookup —
replacing the reference's depth-sorted doProjection + per-point
unprojection (netTensorRT.cpp:143-300, 404-428).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import pretreatment, projection
from . import fusion


@functools.partial(jax.jit, static_argnames=("cfg", "model"))
def infer_scan_labels(model, variables, points: jnp.ndarray,
                      valid: jnp.ndarray, cfg: SlamConfig):
    """points (P, 4) raw padded scan -> (labels (P,), sem: SemanticImage).

    Labels are learning-class ids per RAW point (0 = unlabeled/invalid),
    looked up from the net's per-pixel argmax at each point's projected
    (ring, col) pixel — every point in a pixel shares the winner's label,
    which is exactly the reference's unprojection behavior for points that
    survive its depth sort."""
    n, h = cfg.sensor.n_scan, cfg.sensor.horizon_scan
    pre = pretreatment.pretreat(points, valid, cfg.sensor)
    img, _ext = projection.project_and_extract(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time,
        pre.valid, cfg.sensor, want_image=True,
    )
    sem = fusion.infer_labels(
        model, variables, img.rng, img.xyz, img.intensity, img.mask,
        cfg.semantic,
    )
    # unproject: label of each raw point = its pixel's label
    x, y = pre.points[:, 0], pre.points[:, 1]
    ang_res = 360.0 / h
    horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + h // 2
    col = jnp.where(col >= h, col - h, col)
    ok = pre.valid & (pre.ring >= 0) & (pre.ring < n) & (col >= 0) & (col < h)
    pix = jnp.where(ok, pre.ring * h + col, 0)
    lab = jnp.where(ok, sem.labels.reshape(-1)[pix], 0)
    return lab, sem


class SemanticInference:
    """Host-side wrapper holding (model, variables); loads the in-repo
    synthetic checkpoint by default (semantic/weights.py)."""

    def __init__(self, cfg: SlamConfig, checkpoint: str | None = None):
        from ..models import rangenet
        from . import weights as W

        sem_cfg, variables = W.load_checkpoint(checkpoint)
        # architecture comes from the checkpoint; sensor grid from the
        # pipeline config
        self.cfg = cfg.replace(semantic=sem_cfg)
        self.model = rangenet.create_model(sem_cfg)
        self.variables = variables

    def __call__(self, scan_points, scan_valid):
        return infer_scan_labels(
            self.model, self.variables, scan_points, scan_valid, self.cfg)
