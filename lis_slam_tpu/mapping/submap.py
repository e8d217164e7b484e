"""Keyframe / SubMap / LocalMap data model + SubMapManager algorithms.

TPU-native rebuild of `src/include/subMap.h`:
 - `keyframe_t` (:237-428) -> `Keyframe`: per-class clouds + poses,
 - `submap_t` (:435-664) -> `SubMap`: merged per-class clouds, member
   keyframe poses, bbox,
 - `localMap_t` (:669-777) -> `LocalMap`: sliding-window per-class map with
   bbox crop,
 - `SubMapManager` (:781-1265) algorithms:
     * `judge_new_submap` (:1103-1122): cut on translation / rotation /
       frame count,
     * `bbx_filter` (:1125-1156): axis-aligned box mask,
     * `map_scan_feature_pts_distance_removal` (:1065-1100): map-based
       dynamic point removal via 1-NN distance gates,
     * random / fixed-count / voxel downsampling (:1161-1249) — the voxel
       path lives in ops/voxel.py; random/fixed here.

Clouds are fixed-capacity padded buffers with masks; per-class organization
follows the 5 super-categories of labels.py (+ LOAM corner/surf).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SubMapConfig
from ..ops import knn


class ClassClouds(NamedTuple):
    """One padded cloud per super-category (dynamic/ground/building/pole/
    outlier) — the semantic_info payload (msg/semantic_info.msg)."""

    xyz: jnp.ndarray  # (5, C, 3)
    mask: jnp.ndarray  # (5, C)


@dataclass
class Keyframe:
    """keyframe_t equivalent (host-held, arrays on device)."""

    index: int
    pose_init: np.ndarray  # (4, 4) odometry pose
    pose_opt: np.ndarray  # (4, 4) optimized pose
    clouds: ClassClouds  # per-category clouds (sensor frame)
    corner_xyz: jnp.ndarray  # LOAM edge cloud (sensor frame)
    corner_mask: jnp.ndarray
    surf_xyz: jnp.ndarray
    surf_mask: jnp.ndarray
    submap_id: int = -1
    timestamp: float = 0.0  # scan time (keyframe_t keeps the header stamp)


@dataclass
class SubMap:
    """submap_t equivalent: merged world-frame clouds + bookkeeping."""

    index: int
    pose_init: np.ndarray  # (4, 4) pose of first member keyframe
    pose_opt: np.ndarray
    corner_xyz: jnp.ndarray  # merged edge features (world frame)
    corner_mask: jnp.ndarray
    surf_xyz: jnp.ndarray  # merged planar features
    surf_mask: jnp.ndarray
    kf_indices: list = field(default_factory=list)
    kf_rel_poses: list = field(default_factory=list)  # T_submap^-1 @ T_kf
    bbox: np.ndarray | None = None  # (2, 3) min/max
    # merged per-category semantic clouds (submap_t carries 5 class clouds,
    # subMap.h:435-664), world frame; None when semantics are off
    class_xyz: jnp.ndarray | None = None  # (5, C, 3)
    class_mask: jnp.ndarray | None = None  # (5, C)

    def recompute_bbox(self):
        pts = np.asarray(self.surf_xyz)[np.asarray(self.surf_mask)]
        if len(pts):
            self.bbox = np.stack([pts.min(0), pts.max(0)])
        return self.bbox


def judge_new_submap(accu_tran: float, accu_rot: float, accu_frame: int,
                     cfg: SubMapConfig) -> bool:
    """Cut criterion (subMap.h:1103-1122; params subMapTraMax/YawMax/
    FramesSize). accu_rot in radians here (config yaw_max is radians)."""
    return (
        accu_tran > cfg.translation_max
        or accu_rot > cfg.yaw_max
        or accu_frame > cfg.frames_size
    )


def bbox_mask(points: jnp.ndarray, mask: jnp.ndarray, bb_min: jnp.ndarray,
              bb_max: jnp.ndarray, delete_box: bool = False) -> jnp.ndarray:
    """Axis-aligned box filter (bbx_filter): True = keep."""
    inside = jnp.all((points > bb_min) & (points < bb_max), axis=-1)
    keep = ~inside if delete_box else inside
    return mask & keep


@functools.partial(jax.jit, static_argnames=())
def dynamic_removal_mask(
    feature_pts: jnp.ndarray,  # (N, 3) candidate points (world frame)
    feature_mask: jnp.ndarray,
    map_pts: jnp.ndarray,  # (M, 3) existing dynamic-class map
    map_mask: jnp.ndarray,  # (M,)
    center: jnp.ndarray,  # (3,) current sensor position
    center_radius: jnp.ndarray,  # () only test points within this radius
    near_thre: jnp.ndarray,  # () keep if NN-dist > near (de-densify)
    min_thre: jnp.ndarray,  # () ... and < min  (consistent static evidence)
    max_thre: jnp.ndarray,  # () or NN-dist > max (brand-new structure)
) -> jnp.ndarray:
    """map_scan_feature_pts_distance_removal (subMap.h:1065-1100): keep a
    candidate dynamic-class point iff its 1-NN distance to the existing
    dynamic map is in (near, min) U (max, inf); points outside
    center_radius are always kept. Returns the filtered mask."""
    from ..ops import pallas_knn

    d2center = jnp.sum((feature_pts[:, :2] - center[None, :2]) ** 2, axis=-1)
    outside = d2center > center_radius * center_radius
    d, _i, _n = pallas_knn.knn(feature_pts, map_pts, map_mask, k=1)
    d1 = d[:, 0]
    keep_inner = ((d1 > near_thre**2) & (d1 < min_thre**2)) | (d1 > max_thre**2)
    # an empty map comes back as +inf -> the "new structure" branch keeps
    # the candidate, matching the KD-tree's far-distance case
    return feature_mask & (outside | keep_inner)


def random_downsample_mask(mask: jnp.ndarray, keep_ratio: float,
                           key: jnp.ndarray) -> jnp.ndarray:
    """random_downsample (subMap.h:1161-1197)."""
    u = jax.random.uniform(key, mask.shape)
    return mask & (u < keep_ratio)


def fixed_count_downsample_mask(mask: jnp.ndarray, target: int,
                                key: jnp.ndarray) -> jnp.ndarray:
    """Fixed-number downsample (subMap.h:1199-1230): keep ~target points,
    uniformly at random among the valid ones."""
    n = jnp.sum(mask.astype(jnp.int32))
    ratio = jnp.minimum(1.0, target / jnp.maximum(n, 1))
    u = jax.random.uniform(key, mask.shape)
    return mask & (u < ratio)


class SubMapCollector:
    """Host-side accumulation of keyframes into submaps (makeSubMapThread's
    submap bookkeeping, subMapOptmizationNode.cpp:672-718 + saveSubMap
    :1134-1143)."""

    def __init__(self, cfg: SubMapConfig):
        self.cfg = cfg
        self.submaps: list[SubMap] = []
        self.accu_tran = 0.0
        self.accu_rot = 0.0
        self.accu_frame = 0
        self._cur_kfs: list[Keyframe] = []
        self._last_pose: np.ndarray | None = None
        # merge per-category clouds on close (set by the pipeline when
        # per-point labels are flowing; keyframe ClassClouds are zeros
        # otherwise and merging them would be wasted device work)
        self.merge_classes = False

    def add_keyframe(self, kf: Keyframe) -> SubMap | None:
        """Returns a finished SubMap when the cut criterion fires."""
        if self._last_pose is not None:
            rel = np.linalg.inv(self._last_pose) @ kf.pose_init
            self.accu_tran += float(np.linalg.norm(rel[:3, 3]))
            self.accu_rot += abs(
                float(np.arctan2(rel[1, 0], rel[0, 0]))
            )
        self._last_pose = kf.pose_init.copy()
        self._cur_kfs.append(kf)
        self.accu_frame += 1

        if judge_new_submap(self.accu_tran, self.accu_rot, self.accu_frame,
                            self.cfg):
            self.accu_tran = 0.0
            self.accu_rot = 0.0
            self.accu_frame = 0
            return self._finish()
        return None

    def flush(self) -> SubMap | None:
        """finishMap service equivalent: close the trailing submap."""
        if self._cur_kfs:
            return self._finish()
        return None

    def _finish(self) -> SubMap:
        kfs = self._cur_kfs
        self._cur_kfs = []
        base = kfs[0].pose_init
        base_inv = np.linalg.inv(base)

        from ..ops import voxel as _voxel
        from ..utils import se3 as _se3

        # pad the member count to a FIXED size so every submap close reuses
        # one compiled program per cloud type (a varying concat length would
        # recompile per distinct keyframe count — ~30-60 s each through the
        # TPU remote-compile relay)
        n_pad = self.cfg.frames_size + 1

        def merge(xyz_list, mask_list, capacity, leaf):
            pts = []
            for kf, xyz, m in zip(kfs, xyz_list, mask_list):
                T = jnp.asarray(kf.pose_init, dtype=jnp.float32)
                pts.append((_se3.transform_points(T, xyz), m))
            per = pts[0][0].shape[0]
            for _ in range(len(kfs), n_pad):
                pts.append((jnp.zeros((per, 3), jnp.float32),
                            jnp.zeros((per,), bool)))
            allp = jnp.concatenate([p for p, _ in pts[:n_pad]])
            allm = jnp.concatenate([m for _, m in pts[:n_pad]])
            out, om, _ = _voxel.voxel_downsample(allp, allm, leaf, capacity)
            return out, om

        # submap voxel leaves (params.yaml subMapCornerLeafSize/subMapSurfLeafSize)
        corner, corner_m = merge(
            [kf.corner_xyz for kf in kfs], [kf.corner_mask for kf in kfs],
            self.cfg.corner_capacity, 0.2,
        )
        surf, surf_m = merge(
            [kf.surf_xyz for kf in kfs], [kf.surf_mask for kf in kfs],
            self.cfg.surf_capacity, 0.4,
        )
        # per-category clouds (submap_t's 5 merged class clouds,
        # subMap.h:435-664): transform each keyframe's ClassClouds to world,
        # concat, voxel-compact per class
        class_xyz = class_mask = None
        if self.merge_classes:
            per_class_pts, per_class_m = [], []
            for kf in kfs:
                T = jnp.asarray(kf.pose_init, dtype=jnp.float32)
                per_class_pts.append(jax.vmap(
                    lambda p: _se3.transform_points(T, p))(kf.clouds.xyz))
                per_class_m.append(kf.clouds.mask)
            qk = per_class_pts[0].shape[1]
            for _ in range(len(kfs), n_pad):
                per_class_pts.append(jnp.zeros((5, qk, 3), jnp.float32))
                per_class_m.append(jnp.zeros((5, qk), bool))
            allp = jnp.concatenate(per_class_pts[:n_pad], axis=1)
            allm = jnp.concatenate(per_class_m[:n_pad], axis=1)
            ds = jax.vmap(
                lambda p, m: _voxel.voxel_downsample(
                    p, m, 0.4, self.cfg.class_capacity))(allp, allm)
            class_xyz, class_mask = ds[0], ds[1]
        sm = SubMap(
            index=len(self.submaps),
            pose_init=base,
            pose_opt=base.copy(),
            corner_xyz=corner, corner_mask=corner_m,
            surf_xyz=surf, surf_mask=surf_m,
            kf_indices=[kf.index for kf in kfs],
            kf_rel_poses=[base_inv @ kf.pose_init for kf in kfs],
            class_xyz=class_xyz, class_mask=class_mask,
        )
        for kf in kfs:
            kf.submap_id = sm.index
        sm.recompute_bbox()
        self.submaps.append(sm)
        return sm
