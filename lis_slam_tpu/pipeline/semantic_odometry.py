"""Back-end semantic submap odometry (reference stage 1, SubMapOdometryNode).

Rebuild of `subMapOptmizationNode.cpp` sections 597-1967:
 - `keyframeInit` (:757-854): per-class keyframe clouds (here: class masks on
   the projected grid, per-class fixed-capacity compaction + voxel
   downsample),
 - `currentCloudInit` (:856-893): corner features = pole class, surf
   features = dynamic + building + ground classes,
 - `extractSlidingCloud` (:1369-1432): sliding local map, bbox-cropped
   +-local_map_radius around the current pose (here: the aged-voxel window
   plays the same role, with expiry by keyframe age),
 - `scan2SubMapOptimization` (:1509-1541): semantic-weighted LOAM solve
   (<=20 iterations), weights w = 2 - LabelSorce[label] per point,
 - map-based dynamic removal (subMap.h:1065-1100) before dynamic-class
   points enter the local map.

This is a second jitted per-keyframe step, refining the front-end pose —
exactly the reference's two-stage odometry structure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import labels as L
from ..config import SlamConfig
from ..ops import icp as icp_ops
from ..ops import knn, pretreatment, projection, scan_match, voxel
from ..semantic import fusion
from ..utils import se3
from . import odometry


class SemanticOdomState(NamedTuple):
    """Sliding semantic local map (localMap_t equivalent)."""

    pose: jnp.ndarray  # (6,) refined pose
    kf_count: jnp.ndarray  # () int32

    corner_pts: jnp.ndarray  # (Mc, 3) pole-class map
    corner_age: jnp.ndarray
    corner_mask: jnp.ndarray
    surf_pts: jnp.ndarray  # (Ms, 3) ground/building/dynamic map
    surf_w: jnp.ndarray  # (Ms,) per-point semantic weight
    surf_age: jnp.ndarray
    surf_mask: jnp.ndarray
    dyn_pts: jnp.ndarray  # dynamic-class map for removal gating
    dyn_age: jnp.ndarray
    dyn_mask: jnp.ndarray


class SemanticScan(NamedTuple):
    """Per-keyframe semantic feature clouds (sensor frame)."""

    corner_xyz: jnp.ndarray  # (Qc, 3) pole class
    corner_w: jnp.ndarray  # (Qc,)
    corner_mask: jnp.ndarray
    surf_xyz: jnp.ndarray  # (Qs, 3) ground+building+dynamic
    surf_w: jnp.ndarray
    surf_mask: jnp.ndarray
    surf_is_dynamic: jnp.ndarray  # (Qs,) dynamic-class flag
    # per-category keyframe clouds (keyframe_t's 5 semantic class clouds,
    # subMap.h:237-428, voxel-downsampled as keyframeInit :807-821 does);
    # category order follows labels.CATEGORY_IDS
    class_xyz: jnp.ndarray  # (5, Qk, 3)
    class_mask: jnp.ndarray  # (5, Qk)


def _caps(cfg: SlamConfig):
    return (
        cfg.submap.corner_capacity // 8,  # per-scan pole points
        cfg.feature.max_surf_points,  # per-scan surf points
    )


def init_state(cfg: SlamConfig) -> SemanticOdomState:
    mc = cfg.submap.corner_capacity
    ms = cfg.submap.surf_capacity
    md = cfg.submap.corner_capacity
    return SemanticOdomState(
        pose=jnp.zeros(6),
        kf_count=jnp.int32(0),
        corner_pts=jnp.zeros((mc, 3)),
        corner_age=jnp.full((mc,), -(10**9), jnp.int32),
        corner_mask=jnp.zeros(mc, bool),
        surf_pts=jnp.zeros((ms, 3)),
        surf_w=jnp.ones((ms,)),
        surf_age=jnp.full((ms,), -(10**9), jnp.int32),
        surf_mask=jnp.zeros(ms, bool),
        dyn_pts=jnp.zeros((md, 3)),
        dyn_age=jnp.full((md,), -(10**9), jnp.int32),
        dyn_mask=jnp.zeros(md, bool),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_semantic_scan(scan: odometry.ScanInput, labels: jnp.ndarray,
                        cfg: SlamConfig) -> SemanticScan:
    """keyframeInit + currentCloudInit: project, attach labels, split into
    the two back-end feature sets with per-point weights.

    `labels` are per-raw-point learning-class ids (from RangeNet's argmax on
    the projected image, or ground truth in tests)."""
    qc, qs = _caps(cfg)
    pre = pretreatment.pretreat(scan.points, scan.valid, cfg.sensor)
    img = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time,
        pre.valid, cfg.sensor,
    )
    # label image: scatter labels with the same winner policy as project
    # (approximate: nearest raw point by re-projection is overkill; the
    # label of ANY point in the pixel is representative)
    n, h = img.rng.shape
    x, y = pre.points[:, 0], pre.points[:, 1]
    rngs = jnp.linalg.norm(pre.points[:, :3], axis=-1)
    ang_res = 360.0 / h
    horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + h // 2
    col = jnp.where(col >= h, col - h, col)
    ok = pre.valid & (pre.ring >= 0) & (pre.ring < n) & (col >= 0) & (col < h)
    if cfg.sensor.downsample_rate > 1:
        ok = ok & (pre.ring % cfg.sensor.downsample_rate == 0)
    flat = jnp.where(ok, pre.ring * h + col, n * h)
    lab_img = jnp.zeros((n * h + 1,), jnp.int32).at[flat].max(labels)
    lab_img = lab_img[: n * h].reshape(n, h)
    sem = fusion.label_images(lab_img, img.mask)

    cat = sem.category
    w = sem.weight
    pole_idx = int(np.where(L.CATEGORY_IDS == L.CAT_POLE)[0][0])
    dyn_idx = int(np.where(L.CATEGORY_IDS == L.CAT_DYNAMIC)[0][0])
    ground_idx = int(np.where(L.CATEGORY_IDS == L.CAT_GROUND)[0][0])
    building_idx = int(np.where(L.CATEGORY_IDS == L.CAT_BUILDING)[0][0])

    corner_sel = (cat == pole_idx) & img.mask
    surf_sel = (
        (cat == ground_idx) | (cat == building_idx) | (cat == dyn_idx)
    ) & img.mask
    dyn_sel = (cat == dyn_idx) & img.mask

    def compact(sel, payload_w, extra, capacity):
        flatm = sel.reshape(-1)
        xyz = img.xyz.reshape(-1, 3)
        pw = payload_w.reshape(-1)
        ex = extra.reshape(-1)
        pos = jnp.cumsum(flatm) - 1
        dest = jnp.where(flatm & (pos < capacity), pos, capacity)
        buf = jnp.zeros((capacity + 1, 3)).at[dest].set(xyz)[:capacity]
        wbuf = jnp.ones((capacity + 1,)).at[dest].set(pw)[:capacity]
        ebuf = jnp.zeros((capacity + 1,), ex.dtype).at[dest].set(ex)[:capacity]
        cnt = jnp.minimum(jnp.sum(flatm.astype(jnp.int32)), capacity)
        return buf, wbuf, ebuf, jnp.arange(capacity) < cnt

    c_xyz, c_w, _, c_mask = compact(corner_sel, w, w, qc)
    s_xyz, s_w, s_dyn, s_mask = compact(
        surf_sel, w, dyn_sel.astype(jnp.float32), qs)

    # --- per-category keyframe clouds (keyframe_t semantic clouds +
    # per-class voxel downsample, subMapOptmizationNode.cpp:807-821) ---
    qk = cfg.submap.keyframe_class_capacity
    class_bufs, class_masks = [], []
    for k in range(len(L.CATEGORY_IDS)):
        sel = (cat == k) & img.mask
        xyz_k, _w, _e, m_k = compact(sel, w, w, qk)
        leaf = (cfg.voxel.submap_corner_leaf if k == pole_idx
                else cfg.voxel.submap_surf_leaf)
        xyz_k, m_k, _n = voxel.voxel_downsample(xyz_k, m_k, leaf, qk)
        class_bufs.append(xyz_k)
        class_masks.append(m_k)

    return SemanticScan(
        corner_xyz=c_xyz, corner_w=c_w, corner_mask=c_mask,
        surf_xyz=s_xyz, surf_w=s_w, surf_mask=s_mask,
        surf_is_dynamic=s_dyn > 0.5,
        class_xyz=jnp.stack(class_bufs),
        class_mask=jnp.stack(class_masks),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine_step(state: SemanticOdomState, sscan: SemanticScan,
                pose_guess: jnp.ndarray, cfg: SlamConfig):
    """Semantic-weighted scan-to-local-map refinement + map update."""
    first = state.kf_count == 0
    gn = scan_match.scan_to_map(
        pose_guess,
        sscan.corner_xyz, sscan.corner_mask,
        sscan.surf_xyz, sscan.surf_mask,
        state.corner_pts, state.corner_mask,
        state.surf_pts, state.surf_mask,
        cfg.matching, cfg.matching.max_iterations_submap,
        corner_sem_weight=sscan.corner_w,
        surf_sem_weight=sscan.surf_w,
    )
    pose = jnp.where(first, pose_guess, gn.pose)

    # --- ICP fallback (icpAlignment / scan2SubMapOptimizationICP,
    # subMapOptmizationNode.cpp:1435-1507): when the semantic-weighted GN
    # solve is degenerate or fails to converge, re-align the current surf
    # cloud against the local map by point-to-plane ICP; on a fitness score
    # <= 3.0 the reference accepts yaw/x/y only (:1482-1487). Runs under
    # lax.cond so the well-conditioned common case never pays for it. ---
    if cfg.matching.icp_fallback:
        def run_fallback(pose_in):
            h = knn.build_hash(state.surf_pts, state.surf_mask,
                               cell_size=1.0, table_size=1 << 14)
            res = icp_ops.icp(
                sscan.surf_xyz, sscan.surf_mask, state.surf_pts, h,
                se3.pose_to_matrix(pose_in),
                max_correspond_dist=1.0, max_iterations=30,
                point_to_plane=True)
            p = se3.matrix_to_pose(res.transform)
            # the reference gates on fitness alone (:1482) — a degenerate
            # scene may never meet the step-size convergence test because
            # the unobservable direction keeps sliding
            ok = (res.fitness <= 3.0) & jnp.all(jnp.isfinite(p))
            out = pose_in.at[2].set(p[2]).at[3].set(p[3]).at[4].set(p[4])
            return jnp.where(ok, out, pose_in)

        need = (~first) & (gn.degenerate | ~gn.converged)
        pose = jax.lax.cond(need, run_fallback, lambda p: p, pose)

    # --- update the semantic local map ---
    T = se3.pose_to_matrix(pose)
    c_w = se3.transform_points(T, sscan.corner_xyz)
    s_w_pts = se3.transform_points(T, sscan.surf_xyz)

    # map-based dynamic removal: dynamic-class candidates must pass the
    # distance gates against the existing dynamic map
    from ..mapping import submap as sm

    dyn_keep = sm.dynamic_removal_mask(
        s_w_pts, sscan.surf_mask & sscan.surf_is_dynamic,
        state.dyn_pts, state.dyn_mask,
        pose[3:], jnp.float32(cfg.submap.dynamic_removal_radius),
        jnp.float32(cfg.submap.dynamic_near),
        jnp.float32(cfg.submap.dynamic_min),
        jnp.float32(cfg.submap.dynamic_max),
    )
    surf_insert = sscan.surf_mask & (~sscan.surf_is_dynamic | dyn_keep)

    K = cfg.keyframe.window_size
    corner_pts, corner_age, corner_mask = voxel.voxel_merge_aged(
        c_w, sscan.corner_mask, state.corner_pts, state.corner_age,
        state.corner_mask, state.kf_count, K,
        cfg.voxel.submap_corner_leaf, state.corner_pts.shape[0],
    )
    surf_pts, surf_age, surf_mask = voxel.voxel_merge_aged(
        s_w_pts, surf_insert, state.surf_pts, state.surf_age,
        state.surf_mask, state.kf_count, K,
        cfg.voxel.submap_surf_leaf, state.surf_pts.shape[0],
    )
    dyn_pts, dyn_age, dyn_mask = voxel.voxel_merge_aged(
        s_w_pts, sscan.surf_mask & sscan.surf_is_dynamic & dyn_keep,
        state.dyn_pts, state.dyn_age, state.dyn_mask, state.kf_count, K,
        cfg.voxel.submap_surf_leaf, state.dyn_pts.shape[0],
    )
    # NOTE: per-point weights for map points default to 1.0 — the reference
    # weights only the CURRENT scan's points, which sscan.*_w covers.
    new_state = SemanticOdomState(
        pose=pose,
        kf_count=state.kf_count + 1,
        corner_pts=corner_pts, corner_age=corner_age, corner_mask=corner_mask,
        surf_pts=surf_pts, surf_w=state.surf_w, surf_age=surf_age,
        surf_mask=surf_mask,
        dyn_pts=dyn_pts, dyn_age=dyn_age, dyn_mask=dyn_mask,
    )
    return new_state, pose, gn
