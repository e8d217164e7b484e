"""Fused Pallas GN-iteration kernel vs the XLA op-by-op path.

The kernel (ops/pallas_gn.py) must reproduce the XLA iteration body —
candidate re-rank, 5-NN selection, closed-form line/plane fits, gates,
and the weighted J^T J / J^T r reduction — to f32 accumulation noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig
from lis_slam_tpu.ops import pallas_gn, pallas_knn, scan_match
from lis_slam_tpu.utils import se3


def _line_world(rng, n_lines=24, pts_per=24):
    """Vertical pole-like lines (corner map). Dense enough along z that a
    query's 5th-NN stays inside the 1.0 m^2 nn_max_sq_dist gate."""
    pts = []
    for _ in range(n_lines):
        x, y = rng.uniform(-20, 20, 2)
        z = np.linspace(0, 4, pts_per)
        p = np.stack([np.full(pts_per, x), np.full(pts_per, y), z], 1)
        pts.append(p + rng.normal(0, 0.01, p.shape))
    return np.concatenate(pts).astype(np.float32)


def _plane_world(rng, n=3000):
    """Ground plane + two walls (surf map)."""
    g = np.stack([rng.uniform(-25, 25, n), rng.uniform(-25, 25, n),
                  np.zeros(n)], 1)
    w1 = np.stack([rng.uniform(-25, 25, n // 2),
                   np.full(n // 2, 10.0), rng.uniform(0, 6, n // 2)], 1)
    w2 = np.stack([np.full(n // 2, -12.0),
                   rng.uniform(-25, 25, n // 2), rng.uniform(0, 6, n // 2)], 1)
    pts = np.concatenate([g, w1, w2]).astype(np.float32)
    return pts + rng.normal(0, 0.005, pts.shape).astype(np.float32)


def _xla_hg(pose, pts, mask, cand, ok, w, cfg, mode):
    """The XLA iteration body up to (H, g, n_valid) — mirrors
    scan_match._iteration_update's xla branch for ONE cloud."""
    T = se3.pose_to_matrix(pose)
    pw = se3.transform_points(T, pts)
    d, sel = scan_match._rerank_neighbors(pw, cand, ok, 5)
    near = jnp.take_along_axis(cand, sel[..., None], axis=1)
    if mode == "corner":
        cc = scan_match.corner_correspondences(pw, mask, near, d, cfg, w)
    else:
        cc = scan_match.surf_correspondences(pw, mask, near, d, cfg, w)
    M_roll, M_pitch, M_yaw = scan_match._rotation_jacobian_mats(pose[:3])
    vm = cc.valid[:, None]
    p = jnp.where(vm, pts, 0.0)
    c = jnp.where(vm, cc.coeff, 0.0)
    r = jnp.where(cc.valid, cc.residual, 0.0)
    j_roll = jnp.einsum("mj,jk,mk->m", c, M_roll, p)
    j_pitch = jnp.einsum("mj,jk,mk->m", c, M_pitch, p)
    j_yaw = jnp.einsum("mj,jk,mk->m", c, M_yaw, p)
    J = jnp.concatenate(
        [j_roll[:, None], j_pitch[:, None], j_yaw[:, None], c], axis=1)
    return J.T @ J, J.T @ (-r), jnp.sum(cc.valid.astype(jnp.int32))


def _case(mode, seed=0):
    rng = np.random.default_rng(seed)
    cfg = SlamConfig().matching
    map_pts = (_line_world(rng) if mode == "corner"
               else _plane_world(rng))
    m = jnp.asarray(map_pts)
    m_mask = jnp.ones(m.shape[0], bool)
    # queries: map points re-observed from a perturbed pose, plus padding
    q_n = 512
    idx = rng.integers(0, len(map_pts), q_n)
    pose = jnp.asarray([0.02, -0.01, 0.05, 0.3, -0.2, 0.04], jnp.float32)
    T_inv = se3.transform_inverse(se3.pose_to_matrix(pose))
    q_world = map_pts[idx] + rng.normal(0, 0.02, (q_n, 3))
    q_sensor = np.asarray(
        se3.transform_points(T_inv, jnp.asarray(q_world, jnp.float32)))
    mask = rng.uniform(size=q_n) > 0.1
    w = rng.uniform(0.5, 1.5, q_n).astype(np.float32)
    k = cfg.nn_cache_k
    pw = se3.transform_points(
        se3.pose_to_matrix(pose), jnp.asarray(q_sensor))
    d, _i, cand = pallas_knn.knn(pw, m, m_mask, k=k, max_sq_dist=4.0)
    ok = d < 4.0
    return (cfg, pose, jnp.asarray(q_sensor), jnp.asarray(mask), cand, ok,
            jnp.asarray(w), k)


@pytest.mark.parametrize("mode", ["corner", "surf"])
def test_partials_match_xla(mode):
    cfg, pose, pts, mask, cand, ok, w, k = _case(mode, seed=3)
    H_ref, g_ref, nv_ref = _xla_hg(pose, pts, mask, cand, ok, w, cfg, mode)
    H, g, nv = pallas_gn.gn_partials(
        pts, mask, cand, ok, w, pallas_gn.pack_scalars(pose, cfg, mode),
        mode, k, interpret=True)
    assert int(nv_ref) > 100  # the case must actually exercise the math
    assert int(nv) == int(nv_ref)
    scale = float(jnp.max(jnp.abs(H_ref))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(H) / scale, np.asarray(H_ref) / scale, atol=2e-4)
    gscale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(g) / gscale, np.asarray(g_ref) / gscale, atol=2e-4)


def test_scan_to_map_backends_agree():
    """Full solve: the pallas backend must land on the same pose as the
    xla backend (identical caches and schedule, same math)."""
    import dataclasses

    rng = np.random.default_rng(7)
    corner_map = _line_world(rng)
    surf_map = _plane_world(rng)
    cfg = SlamConfig().matching
    # queries: subsets of the maps observed from an offset pose
    pose_true = jnp.asarray([0.01, -0.02, 0.08, 0.5, -0.3, 0.05],
                            jnp.float32)
    T_inv = se3.transform_inverse(se3.pose_to_matrix(pose_true))

    def sensor_cloud(world_pts, n):
        sel = world_pts[rng.integers(0, len(world_pts), n)]
        s = np.asarray(se3.transform_points(
            T_inv, jnp.asarray(sel, jnp.float32)))
        return jnp.asarray(s), jnp.ones(n, bool)

    c_pts, c_mask = sensor_cloud(corner_map, 256)
    s_pts, s_mask = sensor_cloud(surf_map, 512)
    guess = pose_true + jnp.asarray([0.004, 0.003, -0.01, 0.1, -0.06, 0.02])

    outs = {}
    for backend in ("xla", "pallas"):
        c = dataclasses.replace(cfg, gn_backend=backend)
        outs[backend] = scan_match.scan_to_map(
            guess, c_pts, c_mask, s_pts, s_mask,
            jnp.asarray(corner_map), jnp.ones(len(corner_map), bool),
            jnp.asarray(surf_map), jnp.ones(len(surf_map), bool),
            c, 15)
    p_x = np.asarray(outs["xla"].pose)
    p_p = np.asarray(outs["pallas"].pose)
    np.testing.assert_allclose(p_p, p_x, atol=2e-3)
    # both must actually converge near the true pose
    np.testing.assert_allclose(p_p, np.asarray(pose_true), atol=2e-2)
    assert bool(outs["pallas"].converged)
