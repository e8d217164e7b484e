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
    # per-point residual weight 2 - LabelSorce[learning class]; None on
    # label-free paths (stage-3 then falls back to category means)
    w: jnp.ndarray | None = None  # (5, C)


@dataclass
class Keyframe:
    """keyframe_t equivalent (host-held, arrays on device).

    Cloud fields become None once `release_clouds` fires (endurance
    policy, cfg.submap.release_after_submaps): after a keyframe's submap
    has closed and the loop-verify latency window has passed, nothing
    reads them again — on a KITTI-length run they would otherwise pin
    ~1 MB of dead device memory per keyframe (the reference evicts its
    map containers the same way, odomEstimationNode.cpp:591-593)."""

    index: int
    pose_init: np.ndarray  # (4, 4) odometry pose
    pose_opt: np.ndarray  # (4, 4) optimized pose
    clouds: ClassClouds | None  # per-category clouds (sensor frame)
    corner_xyz: jnp.ndarray | None  # LOAM edge cloud (sensor frame)
    corner_mask: jnp.ndarray | None
    surf_xyz: jnp.ndarray | None
    surf_mask: jnp.ndarray | None
    submap_id: int = -1
    timestamp: float = 0.0  # scan time (keyframe_t keeps the header stamp)

    @property
    def released(self) -> bool:
        return self.surf_xyz is None

    def release_clouds(self) -> None:
        """Free the device cloud buffers; poses/timestamps/ids stay."""
        self.clouds = None
        self.corner_xyz = self.corner_mask = None
        self.surf_xyz = self.surf_mask = None


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
    bbox: np.ndarray | None = None  # (2, 3) min/max (host, materialized)
    # device-side bbox computed at close time WITHOUT syncing (an
    # np.asarray on the just-merged cloud blocks the host on the whole
    # merge chain — measured ~600 ms on the tunneled TPU; the SLAM drain
    # fetches this in its batched readback instead)
    bbox_dev: jnp.ndarray | None = None  # (2, 3)
    # merged per-category semantic clouds (submap_t carries 5 class clouds,
    # subMap.h:435-664), world frame; None when semantics are off
    class_xyz: jnp.ndarray | None = None  # (5, C, 3)
    class_mask: jnp.ndarray | None = None  # (5, C)
    class_w: jnp.ndarray | None = None  # (5, C) per-point residual weight

    def get_bbox(self) -> np.ndarray | None:
        """Host bbox; materializes bbox_dev on first use (blocking) if the
        drain hasn't already installed it."""
        if self.bbox is None and self.bbox_dev is not None:
            self.install_bbox(np.asarray(self.bbox_dev))
        return self.bbox

    def install_bbox(self, b: np.ndarray):
        self.bbox = b if np.all(np.isfinite(b)) else None
        self.bbox_dev = None

    def recompute_bbox(self):
        pts = np.asarray(self.surf_xyz)[np.asarray(self.surf_mask)]
        if len(pts):
            self.bbox = np.stack([pts.min(0), pts.max(0)])
        return self.bbox


@jax.jit
def masked_bbox(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(2, 3) min/max of masked points; +-inf rows when empty."""
    big = jnp.where(mask[:, None], pts, jnp.inf)
    small = jnp.where(mask[:, None], pts, -jnp.inf)
    return jnp.stack([jnp.min(big, axis=0), jnp.max(small, axis=0)])


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


@functools.partial(jax.jit, static_argnames=("leaf", "capacity"))
def _merge_stacked(poses, xyz, mask, leaf, capacity):
    """(K,4,4), (K,P,3), (K,P) -> world-frame voxel-unique (capacity,3)."""
    from ..ops import voxel as _voxel
    from ..utils import se3 as _se3

    world = jax.vmap(_se3.transform_points)(poses, xyz)
    out, om, _ = _voxel.voxel_downsample(
        world.reshape(-1, 3), mask.reshape(-1), leaf, capacity)
    return out, om


@functools.partial(jax.jit, static_argnames=("leaf", "capacity"))
def _merge_stacked_classes(poses, xyz, mask, w, leaf, capacity):
    """(K,5,Q,3), (K,5,Q), (K,5,Q) -> per-class world-frame voxel-unique
    (5,C,3) + mask + per-point weights (riding the downsample's payload
    lane — the stage-3 registration weights per point,
    subMapOptmizationNode.cpp:4556-4966)."""
    from ..ops import voxel as _voxel
    from ..utils import se3 as _se3

    world = jax.vmap(
        lambda T, cls: jax.vmap(lambda p: _se3.transform_points(T, p))(cls)
    )(poses, xyz)  # (K, 5, Q, 3)
    allp = jnp.moveaxis(world, 1, 0).reshape(xyz.shape[1], -1, 3)
    allm = jnp.moveaxis(mask, 1, 0).reshape(mask.shape[1], -1)
    allw = jnp.moveaxis(w, 1, 0).reshape(w.shape[1], -1)
    out, om, _, ow = jax.vmap(
        lambda p, m, pw: _voxel.voxel_downsample(
            p, m, leaf, capacity, payloads=(pw,)))(allp, allm, allw)
    return out, om, ow


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

        # pad the member count to a FIXED bucket size so submap closes reuse
        # a small set of compiled programs (a varying concat length would
        # recompile per distinct keyframe count — ~30-60 s each through the
        # TPU remote-compile relay). Buckets instead of one max-size pad:
        # closes cut by yaw/translation typically hold far fewer than
        # frames_size members, and the merge sorts scale with the concat.
        n_pad = self.cfg.frames_size + 1
        for b in (4, 8, 12, 16):
            if len(kfs) <= b < n_pad:
                n_pad = b
                break

        # ONE stacked device program per cloud type: stacking host-side then
        # transforming under vmap inside a single jitted call keeps the
        # dispatch count flat (~6 ops) — the previous per-keyframe
        # transform_points loop issued ~70 ops per close, and the tunnel's
        # bounded in-flight window turned that into ~0.5 s of host blocking
        # (backpressure, not compute).
        poses = jnp.asarray(np.stack(
            [kf.pose_init for kf in kfs]
            + [np.eye(4, dtype=np.float32)] * (n_pad - len(kfs))
        ).astype(np.float32))

        def stack(get_xyz, get_mask, shape):
            xs = [get_xyz(kf) for kf in kfs]
            ms = [get_mask(kf) for kf in kfs]
            pad = n_pad - len(kfs)
            if pad:
                xs += [jnp.zeros(shape, jnp.float32)] * pad
                ms += [jnp.zeros(shape[:-1], bool)] * pad
            return jnp.stack(xs), jnp.stack(ms)

        # submap voxel leaves (params.yaml subMapCornerLeafSize/subMapSurfLeafSize)
        cx, cm = stack(lambda kf: kf.corner_xyz, lambda kf: kf.corner_mask,
                       kfs[0].corner_xyz.shape)
        corner, corner_m = _merge_stacked(
            poses, cx, cm, 0.2, self.cfg.corner_capacity)
        sx, smk = stack(lambda kf: kf.surf_xyz, lambda kf: kf.surf_mask,
                        kfs[0].surf_xyz.shape)
        surf, surf_m = _merge_stacked(
            poses, sx, smk, 0.4, self.cfg.surf_capacity)
        # per-category clouds (submap_t's 5 merged class clouds,
        # subMap.h:435-664): transform each keyframe's ClassClouds to world,
        # concat, voxel-compact per class; per-point weights ride along
        class_xyz = class_mask = class_w = None
        if self.merge_classes:
            kx, km = stack(lambda kf: kf.clouds.xyz, lambda kf: kf.clouds.mask,
                           kfs[0].clouds.xyz.shape)
            wshape = kfs[0].clouds.xyz.shape[:-1]
            kw = jnp.stack(
                [kf.clouds.w if kf.clouds.w is not None
                 else jnp.ones(wshape) for kf in kfs]
                + [jnp.ones(wshape)] * (n_pad - len(kfs)))
            class_xyz, class_mask, class_w = _merge_stacked_classes(
                poses, kx, km, kw, 0.4, self.cfg.class_capacity)
        sm = SubMap(
            index=len(self.submaps),
            pose_init=base,
            pose_opt=base.copy(),
            corner_xyz=corner, corner_mask=corner_m,
            surf_xyz=surf, surf_mask=surf_m,
            kf_indices=[kf.index for kf in kfs],
            kf_rel_poses=[base_inv @ kf.pose_init for kf in kfs],
            class_xyz=class_xyz, class_mask=class_mask, class_w=class_w,
        )
        for kf in kfs:
            kf.submap_id = sm.index
        sm.bbox_dev = masked_bbox(sm.surf_xyz, sm.surf_mask)
        self.submaps.append(sm)
        return sm
