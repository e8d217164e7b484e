"""Scan-to-map matching: LOAM point-to-line / point-to-plane Gauss-Newton.

TPU-native rebuild of the reference hot loop (3 copies in the reference):
 - `cornerOptimization` (odomEstimationNode.cpp:633-747): 5-NN in the corner
   map -> 3x3 covariance eigendecomposition -> line check (l1 > 3*l2) ->
   point-to-line residual with direction coefficients,
 - `surfOptimization` (:749-827): 5-NN -> plane fit (A x = -1) -> planarity
   check (all residents within 0.2) -> point-to-plane residual,
 - `combineOptimizationCoeffs` + `LMOptimization` (:829-974): stack weighted
   Jacobian rows, solve the 6x6 normal equations, degeneracy clamp by
   eigenvalue threshold, convergence on deltaR < 0.005 deg / deltaT < 0.05 cm,
 - semantic weighting w = 2 - LabelSorce[label] multiplied into the
   coefficients (subMapOptmizationNode.cpp:1671-1676,1795-1800).

Differences from the reference, by design (documented):
 - The Jacobian d(residual)/d(roll,pitch,yaw) is the exact analytic
   derivative of R = Rz Ry Rx in the lidar frame, instead of the reference's
   axis-permuted "camera convention" approximation inherited from LOAM. The
   residuals are identical, so both iterations share fixed points; the exact
   Jacobian converges at least as fast.
 - All points are processed in fixed-shape masked batches; the per-point
   OpenMP loop becomes one fused vectorized pass.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MatchingConfig
from ..utils import lin, se3


class Correspondences(NamedTuple):
    """Weighted residual rows: n . p_world + offset = residual."""

    coeff: jnp.ndarray  # (M, 3) weighted direction/normal (s * w * n)
    residual: jnp.ndarray  # (M,) weighted signed distance (s * w * dist)
    valid: jnp.ndarray  # (M,) bool


def corner_correspondences(
    pts_world: jnp.ndarray,  # (Q, 3) current corner points in map frame
    mask: jnp.ndarray,  # (Q,)
    near: jnp.ndarray,  # (Q, 5, 3) the 5 nearest map points
    nn_sqd: jnp.ndarray,  # (Q, 5) ascending
    cfg: MatchingConfig,
    sem_weight: jnp.ndarray | None = None,  # (Q,)
) -> Correspondences:
    """Point-to-line residuals via 5-point covariance eigen-analysis."""
    gate = mask & (nn_sqd[:, 4] < cfg.nn_max_sq_dist)

    center = jnp.mean(near, axis=1)  # (Q, 3)
    diff = near - center[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", diff, diff) / 5.0
    evals = lin.eigvalsh3(cov)
    is_line = evals[:, 2] > cfg.eigen_ratio_line * evals[:, 1]
    direction = lin.principal_eigvec3(cov, evals)  # (Q, 3) unit line direction

    # Reference builds two virtual points at center +- 0.1 * direction and
    # evaluates the triangle-area distance formula; algebraically the
    # residual is |(p - c) x u| and the coefficient vector is the unit
    # gradient of that distance.
    p = pts_world
    pc = p - center
    cx = jnp.cross(pc, direction)  # (Q, 3)
    dist = jnp.linalg.norm(cx, axis=-1)  # point-to-line distance (= ld2)
    # gradient of dist wrt p: (u x (p-c) x u scaled) -> cross(direction, cx)/dist
    grad = jnp.cross(direction, cx) / jnp.maximum(dist, 1e-12)[:, None]
    # reference sign convention: coefficients are the descent direction of
    # the POSITIVE distance; residual is the distance itself
    s = 1.0 - cfg.residual_damping * jnp.abs(dist)
    w = jnp.ones_like(s) if sem_weight is None else sem_weight
    ok = gate & is_line & (s > cfg.min_residual_weight)
    return Correspondences(
        coeff=(s * w)[:, None] * grad,
        residual=s * w * dist,
        valid=ok,
    )


def surf_correspondences(
    pts_world: jnp.ndarray,
    mask: jnp.ndarray,
    near: jnp.ndarray,  # (Q, 5, 3)
    nn_sqd: jnp.ndarray,
    cfg: MatchingConfig,
    sem_weight: jnp.ndarray | None = None,
) -> Correspondences:
    """Point-to-plane residuals via 5-point least-squares plane fit."""
    gate = mask & (nn_sqd[:, 4] < cfg.nn_max_sq_dist)

    n, d = lin.solve_plane_lsq(near)  # unit normal, offset
    # planarity: every support point within tolerance of the plane
    plane_res = jnp.abs(jnp.einsum("qkj,qj->qk", near, n) + d[:, None])
    plane_ok = jnp.all(plane_res <= cfg.plane_fit_tolerance, axis=1)

    pd2 = jnp.einsum("qj,qj->q", pts_world, n) + d  # signed distance
    # reference: s = 1 - 0.9 |pd2| / sqrt(|p_world|)   (map-frame norm,
    # faithful to LIO-SAM/odomEstimationNode.cpp:809)
    range_damp = jnp.sqrt(
        jnp.sqrt(jnp.sum(pts_world * pts_world, axis=-1) + 1e-12)
    )
    s = 1.0 - cfg.residual_damping * jnp.abs(pd2) / jnp.maximum(range_damp, 1e-6)
    w = jnp.ones_like(s) if sem_weight is None else sem_weight
    ok = gate & plane_ok & (s > cfg.min_residual_weight)
    return Correspondences(
        coeff=(s * w)[:, None] * n,
        residual=s * w * pd2,
        valid=ok,
    )


def _rotation_jacobian_mats(rpy: jnp.ndarray):
    """d(Rz Ry Rx)/d{roll,pitch,yaw} as three 3x3 matrices."""
    roll, pitch, yaw = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    Rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    dRx = jnp.array([[0, 0, 0], [0, -sr, -cr], [0, cr, -sr]])
    dRy = jnp.array([[-sp, 0, cp], [0, 0, 0], [-cp, 0, -sp]])
    dRz = jnp.array([[-sy, -cy, 0], [cy, -sy, 0], [0, 0, 0]])
    M_roll = Rz @ Ry @ dRx
    M_pitch = Rz @ dRy @ Rx
    M_yaw = dRz @ Ry @ Rx
    return M_roll, M_pitch, M_yaw


class GNState(NamedTuple):
    pose: jnp.ndarray  # (6,) [roll,pitch,yaw,x,y,z]
    proj: jnp.ndarray  # (6, 6) degeneracy projection matrix
    degenerate: jnp.ndarray  # () bool
    converged: jnp.ndarray  # () bool
    n_valid: jnp.ndarray  # () int32
    it: jnp.ndarray  # () int32
    # last-step update magnitudes (deltaR in degrees, deltaT in cm) — the
    # reference's keyframe gate preconditions on these
    # (odomEstimationNode.cpp:216 `if (deltaR < 0.005 || deltaT < 0.05)`)
    delta_r: jnp.ndarray = jnp.float32(0.0)
    delta_t: jnp.ndarray = jnp.float32(0.0)


def gauss_newton_update(
    pose: jnp.ndarray,
    pts_sensor: jnp.ndarray,  # (M, 3) stacked corner+surf sensor-frame points
    coeff: jnp.ndarray,  # (M, 3)
    residual: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,  # (M,)
    it: jnp.ndarray,
    proj_prev: jnp.ndarray,
    degen_prev: jnp.ndarray,
    cfg: MatchingConfig,
):
    """One LMOptimization step. Returns (new_pose, proj, degenerate,
    converged, n_valid)."""
    M_roll, M_pitch, M_yaw = _rotation_jacobian_mats(pose[:3])
    vm = valid[:, None]
    p = jnp.where(vm, pts_sensor, 0.0)
    c = jnp.where(vm, coeff, 0.0)
    r = jnp.where(valid, residual, 0.0)

    j_roll = jnp.einsum("mj,jk,mk->m", c, M_roll, p)
    j_pitch = jnp.einsum("mj,jk,mk->m", c, M_pitch, p)
    j_yaw = jnp.einsum("mj,jk,mk->m", c, M_yaw, p)
    J = jnp.concatenate([
        j_roll[:, None], j_pitch[:, None], j_yaw[:, None], c
    ], axis=1)  # (M, 6)

    H = J.T @ J
    g = J.T @ (-r)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return gn_solve_from_hg(pose, H, g, n_valid, cfg)


def gn_solve_from_hg(
    pose: jnp.ndarray,
    H: jnp.ndarray,  # (6, 6) normal equations
    g: jnp.ndarray,  # (6,)
    n_valid: jnp.ndarray,  # () int32
    cfg: MatchingConfig,
):
    """Solve + degeneracy clamp + convergence test on prebuilt normal
    equations — shared by the XLA correspondence path above and the fused
    Pallas accumulation kernel (ops/pallas_gn.py), which builds H/g
    on-chip."""
    x = lin.solve6_spd(H + 1e-9 * jnp.eye(6), g)

    # Degeneracy analysis. The reference computes this once at iterCount==0
    # (an eigendecomposition was expensive on CPU); with the unrolled Jacobi
    # eigh it is nearly free, so we recompute every iteration — identical
    # behavior in structurally degenerate scenes, and the clamp releases as
    # correspondences accumulate during early iterations.
    evals, evecs = lin.jacobi_eigh6(H)  # ascending, columns are vecs
    keep = (evals >= cfg.degeneracy_eigen_threshold).astype(H.dtype)
    proj = evecs @ jnp.diag(keep) @ evecs.T
    degenerate = jnp.any(keep < 0.5)
    x = jnp.where(degenerate, proj @ x, x)

    enough = n_valid >= cfg.min_valid_points
    x = jnp.where(enough, x, jnp.zeros(6))
    new_pose = pose + x

    delta_r = jnp.rad2deg(jnp.linalg.norm(x[:3]))
    delta_t = 100.0 * jnp.linalg.norm(x[3:])
    converged = (
        (delta_r < cfg.converge_delta_r_deg) & (delta_t < cfg.converge_delta_t_cm)
    ) | ~enough
    return new_pose, proj, degenerate, converged, n_valid, delta_r, delta_t


_BIGD = np.float32(3e38)  # numpy: inlined at trace (see ops/voxel.py note)


def _rerank_neighbors(pts_world, cand_pts, cand_valid, k):
    """Re-rank cached candidate neighbors by current distance; return the
    5 nearest as (sq_dists (Q,5) ascending, slot indices (Q,5))."""
    diff = cand_pts - pts_world[:, None, :]
    d = jnp.sum(diff * diff, axis=-1)
    d = jnp.where(cand_valid, d, _BIGD)
    neg, sel = jax.lax.top_k(-d, k)
    return -neg, sel


def _morton_sort_queries(pts, mask, weight):
    """Sort a padded query cloud spatially; weights ride along."""
    from . import voxel as voxel_ops

    key = jnp.where(
        mask, voxel_ops._voxel_key_morton(pts, mask, 1.0),
        jnp.uint32(0xFFFFFFFF))
    w = jnp.ones(pts.shape[0]) if weight is None else weight
    out = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2], mask.astype(jnp.float32), w),
        num_keys=1,
    )
    new_pts = jnp.stack(out[1:4], axis=1)
    return new_pts, out[4] > 0.5, (None if weight is None else out[5])


def _iteration_update(state, corner_pts, corner_mask, c_cand, c_ok,
                      surf_pts, surf_mask, s_cand, s_ok,
                      corner_sem_weight, surf_sem_weight, cfg, cache_k):
    """One GN iteration body on cached candidates, dispatched by
    cfg.gn_backend: "pallas" fuses re-rank + correspondence fits + the
    J^T J reduction into one on-chip kernel per cloud (ops/pallas_gn.py);
    "xla" is the reference op-by-op path. Both share gn_solve_from_hg."""
    if getattr(cfg, "gn_backend", "xla") == "pallas":
        from . import pallas_gn

        H, g, n_valid = pallas_gn.gn_iteration_hg(
            state.pose, corner_pts, corner_mask, c_cand, c_ok,
            surf_pts, surf_mask, s_cand, s_ok,
            corner_sem_weight, surf_sem_weight, cfg, cache_k)
        return gn_solve_from_hg(state.pose, H, g, n_valid, cfg)

    T = se3.pose_to_matrix(state.pose)
    cw = se3.transform_points(T, corner_pts)
    sw = se3.transform_points(T, surf_pts)
    cd, csel = _rerank_neighbors(cw, c_cand, c_ok, 5)
    sd, ssel = _rerank_neighbors(sw, s_cand, s_ok, 5)
    c_near = jnp.take_along_axis(c_cand, csel[..., None], axis=1)
    s_near = jnp.take_along_axis(s_cand, ssel[..., None], axis=1)
    cc = corner_correspondences(
        cw, corner_mask, c_near, cd, cfg, corner_sem_weight
    )
    sc = surf_correspondences(
        sw, surf_mask, s_near, sd, cfg, surf_sem_weight
    )
    pts = jnp.concatenate([corner_pts, surf_pts], axis=0)
    coeff = jnp.concatenate([cc.coeff, sc.coeff], axis=0)
    res = jnp.concatenate([cc.residual, sc.residual], axis=0)
    val = jnp.concatenate([cc.valid, sc.valid], axis=0)
    return gauss_newton_update(
        state.pose, pts, coeff, res, val, state.it, state.proj,
        state.degenerate, cfg,
    )


def scan_to_map(
    pose0: jnp.ndarray,  # (6,) initial guess
    corner_pts: jnp.ndarray,  # (Qc, 3) sensor frame
    corner_mask: jnp.ndarray,
    surf_pts: jnp.ndarray,  # (Qs, 3)
    surf_mask: jnp.ndarray,
    corner_map: jnp.ndarray,  # (Nc, 3) morton-ordered map buffer
    corner_map_mask: jnp.ndarray,
    surf_map: jnp.ndarray,  # (Ns, 3)
    surf_map_mask: jnp.ndarray,
    cfg: MatchingConfig,
    max_iterations: int,
    corner_sem_weight: jnp.ndarray | None = None,
    surf_sem_weight: jnp.ndarray | None = None,
    cache_k: int | None = None,
    cache_refresh_dist: float | None = None,
    cache_refresh_rot: float | None = None,
) -> GNState:
    """Full scan-to-map optimization (scan2SubMapOptimization rebuild).

    Neighbor search runs on the fused Pallas exact-kNN kernel
    (ops/pallas_knn.py) over the morton-ordered map buffers; query clouds
    are morton-sorted once here so the kernel's tile-skipping bounds bite
    (the GN reductions are order-invariant).

    Correspondence caching (documented deviation from the reference's
    per-iteration KD-tree queries): the cache_k nearest candidates are
    fetched once and re-ranked by current distance each GN iteration; the
    cache refreshes when the pose drifts beyond cache_refresh_* from where
    it was built, so large perturbations converge like a full re-search
    (tests cover both regimes).
    """
    from . import pallas_knn

    if cache_k is None:
        cache_k = cfg.nn_cache_k
    if cache_refresh_dist is None:
        cache_refresh_dist = cfg.nn_cache_refresh_dist
    if cache_refresh_rot is None:
        cache_refresh_rot = cfg.nn_cache_refresh_rot
    corner_pts, corner_mask, corner_sem_weight = _morton_sort_queries(
        corner_pts, corner_mask, corner_sem_weight)
    surf_pts, surf_mask, surf_sem_weight = _morton_sort_queries(
        surf_pts, surf_mask, surf_sem_weight)

    def search(pose):
        T = se3.pose_to_matrix(pose)
        cw = se3.transform_points(T, corner_pts)
        sw = se3.transform_points(T, surf_pts)
        cd_, _ci, c_cand = pallas_knn.knn(
            cw, corner_map, corner_map_mask, k=cache_k, max_sq_dist=4.0)
        sd_, _si, s_cand = pallas_knn.knn(
            sw, surf_map, surf_map_mask, k=cache_k, max_sq_dist=4.0)
        # kernel caps the search at 4.0 (candidates beyond the cache margin
        # are discarded below anyway) so far map tiles skip entirely
        c_ok = cd_ < 4.0
        s_ok = sd_ < 4.0
        return c_cand, c_ok, s_cand, s_ok, pose

    cache0 = search(pose0)

    def cond(carry):
        state, _cache = carry
        return (state.it < max_iterations) & ~state.converged

    def body(carry):
        state, cache = carry
        _, _, _, _, cache_pose = cache
        moved = (
            jnp.linalg.norm(state.pose[3:] - cache_pose[3:]) > cache_refresh_dist
        ) | (jnp.linalg.norm(state.pose[:3] - cache_pose[:3]) > cache_refresh_rot)
        cache = jax.lax.cond(moved, lambda: search(state.pose), lambda: cache)
        c_cand, c_ok, s_cand, s_ok, _ = cache

        new_pose, proj, degen, conv, n_valid, d_r, d_t = _iteration_update(
            state, corner_pts, corner_mask, c_cand, c_ok,
            surf_pts, surf_mask, s_cand, s_ok,
            corner_sem_weight, surf_sem_weight, cfg, cache_k)
        return (
            GNState(
                pose=new_pose, proj=proj, degenerate=degen, converged=conv,
                n_valid=n_valid, it=state.it + 1, delta_r=d_r, delta_t=d_t,
            ),
            cache,
        )

    init = GNState(
        pose=pose0,
        proj=jnp.eye(6),
        degenerate=jnp.bool_(False),
        converged=jnp.bool_(False),
        n_valid=jnp.int32(0),
        it=jnp.int32(0),
        delta_r=jnp.float32(0.0),
        delta_t=jnp.float32(0.0),
    )
    out, _ = jax.lax.while_loop(cond, body, (init, cache0))
    return out


def scan_to_map_scheduled(
    pose0: jnp.ndarray,
    corner_pts: jnp.ndarray,
    corner_mask: jnp.ndarray,
    surf_pts: jnp.ndarray,
    surf_mask: jnp.ndarray,
    corner_map: jnp.ndarray,
    corner_map_mask: jnp.ndarray,
    surf_map: jnp.ndarray,
    surf_map_mask: jnp.ndarray,
    cfg: MatchingConfig,
    n_iters: int,
    refresh_iters: tuple[int, ...] = (2, 5),
    corner_sem_weight: jnp.ndarray | None = None,
    surf_sem_weight: jnp.ndarray | None = None,
    cache_k: int | None = None,
) -> GNState:
    """Cond-free scan-to-map optimization with a STATIC refresh schedule.

    Same math as scan_to_map, but control flow is fully static: an unrolled
    `n_iters`-iteration loop with neighbor-cache refreshes at the python-level
    iterations in `refresh_iters` (plus the initial search), and masked
    updates after convergence in place of the while-loop early exit. This is
    the variant for vmapped multi-sequence replay: under vmap, `lax.cond`
    executes both branches, so the drift-triggered refresh of scan_to_map
    degrades to a full kNN search on EVERY GN iteration for every sequence —
    the static schedule pays exactly len(refresh_iters)+1 searches total.
    """
    from . import pallas_knn

    if cache_k is None:
        cache_k = cfg.nn_cache_k
    corner_pts, corner_mask, corner_sem_weight = _morton_sort_queries(
        corner_pts, corner_mask, corner_sem_weight)
    surf_pts, surf_mask, surf_sem_weight = _morton_sort_queries(
        surf_pts, surf_mask, surf_sem_weight)

    def search(pose):
        T = se3.pose_to_matrix(pose)
        cw = se3.transform_points(T, corner_pts)
        sw = se3.transform_points(T, surf_pts)
        cd_, _ci, c_cand = pallas_knn.knn(
            cw, corner_map, corner_map_mask, k=cache_k, max_sq_dist=4.0)
        sd_, _si, s_cand = pallas_knn.knn(
            sw, surf_map, surf_map_mask, k=cache_k, max_sq_dist=4.0)
        c_ok = cd_ < 4.0
        s_ok = sd_ < 4.0
        return c_cand, c_ok, s_cand, s_ok

    state = GNState(
        pose=pose0,
        proj=jnp.eye(6),
        degenerate=jnp.bool_(False),
        converged=jnp.bool_(False),
        n_valid=jnp.int32(0),
        it=jnp.int32(0),
        delta_r=jnp.float32(0.0),
        delta_t=jnp.float32(0.0),
    )
    cache = search(pose0)
    for i in range(n_iters):
        if i in refresh_iters:
            cache = search(state.pose)
        c_cand, c_ok, s_cand, s_ok = cache
        # NOTE: this variant runs under vmap (batched replay), where a
        # Pallas call cannot batch — parallel/batched.py forces
        # gn_backend="xla" on the config it hands to the vmapped step
        new_pose, proj, degen, conv, n_valid, d_r, d_t = _iteration_update(
            state, corner_pts, corner_mask, c_cand, c_ok,
            surf_pts, surf_mask, s_cand, s_ok,
            corner_sem_weight, surf_sem_weight, cfg, cache_k)
        active = ~state.converged
        state = GNState(
            pose=jnp.where(active, new_pose, state.pose),
            proj=jnp.where(active, proj, state.proj),
            degenerate=jnp.where(active, degen, state.degenerate),
            converged=state.converged | conv,
            n_valid=jnp.where(active, n_valid, state.n_valid),
            it=state.it + active.astype(jnp.int32),
            delta_r=jnp.where(active, d_r, state.delta_r),
            delta_t=jnp.where(active, d_t, state.delta_t),
        )
    return state
