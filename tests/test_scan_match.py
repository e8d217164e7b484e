"""Scan-to-map Gauss-Newton solver tests: pose recovery on synthetic geometry."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from lis_slam_tpu.config import MatchingConfig
from lis_slam_tpu.ops import knn, scan_match
from lis_slam_tpu.utils import se3, lin


def make_structured_map(rng):
    """Surf map: three orthogonal planes; corner map: vertical pole lines."""
    g = np.linspace(-20, 20, 90)
    xy = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    ground = np.concatenate([xy, np.zeros((len(xy), 1))], 1)
    gz = np.linspace(0, 10, 40)
    xw = np.stack(np.meshgrid(g, gz), -1).reshape(-1, 2)
    wall_y = np.stack([xw[:, 0], np.full(len(xw), 20.0), xw[:, 1]], 1)
    wall_x = np.stack([np.full(len(xw), -20.0), xw[:, 0], xw[:, 1]], 1)
    surf = np.concatenate([ground, wall_y, wall_x]).astype(np.float32)
    surf += rng.normal(0, 0.01, surf.shape).astype(np.float32)

    poles = []
    for px, py in rng.uniform(-18, 18, (25, 2)):
        z = np.linspace(0, 6, 40)
        poles.append(np.stack([np.full(40, px), np.full(40, py), z], 1))
    corner = np.concatenate(poles).astype(np.float32)
    corner += rng.normal(0, 0.01, corner.shape).astype(np.float32)
    return corner, surf


def subsample_scan(corner_map, surf_map, true_pose, rng, n_c=256, n_s=1024):
    """Scan = subset of map points expressed in the sensor frame of true_pose."""
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("xyz", true_pose[:3]).as_matrix()
    T[:3, 3] = true_pose[3:]
    Ti = np.linalg.inv(T)
    cs = corner_map[rng.choice(len(corner_map), n_c, replace=False)]
    ss = surf_map[rng.choice(len(surf_map), n_s, replace=False)]
    to_sensor = lambda p: p @ Ti[:3, :3].T + Ti[:3, 3]
    return to_sensor(cs).astype(np.float32), to_sensor(ss).astype(np.float32)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    corner_map, surf_map = make_structured_map(rng)
    true_pose = np.array([0.02, -0.015, 0.35, 1.5, -2.0, 0.3], dtype=np.float32)
    scan_c, scan_s = subsample_scan(corner_map, surf_map, true_pose, rng)
    return corner_map, surf_map, true_pose, scan_c, scan_s


def _hashes(corner_map, surf_map):
    # map masks (name kept for test-diff brevity; hashes were replaced by
    # the morton-ordered Pallas search)
    return jnp.ones(len(corner_map), bool), jnp.ones(len(surf_map), bool)


def test_recover_pose_from_perturbation(problem):
    corner_map, surf_map, true_pose, scan_c, scan_s = problem
    ch, sh = _hashes(corner_map, surf_map)
    guess = true_pose + np.array([0.02, -0.02, 0.05, 0.4, -0.3, 0.2], np.float32)
    cfg = MatchingConfig()
    out = scan_match.scan_to_map(
        jnp.asarray(guess),
        jnp.asarray(scan_c), jnp.ones(len(scan_c), bool),
        jnp.asarray(scan_s), jnp.ones(len(scan_s), bool),
        jnp.asarray(corner_map), ch, jnp.asarray(surf_map), sh,
        cfg, max_iterations=15,
    )
    pose = np.asarray(out.pose)
    assert int(out.n_valid) > 500
    np.testing.assert_allclose(pose[:3], true_pose[:3], atol=2e-3)
    np.testing.assert_allclose(pose[3:], true_pose[3:], atol=2e-2)


def test_already_at_optimum_stays(problem):
    corner_map, surf_map, true_pose, scan_c, scan_s = problem
    ch, sh = _hashes(corner_map, surf_map)
    cfg = MatchingConfig()
    out = scan_match.scan_to_map(
        jnp.asarray(true_pose),
        jnp.asarray(scan_c), jnp.ones(len(scan_c), bool),
        jnp.asarray(scan_s), jnp.ones(len(scan_s), bool),
        jnp.asarray(corner_map), ch, jnp.asarray(surf_map), sh,
        cfg, max_iterations=15,
    )
    np.testing.assert_allclose(np.asarray(out.pose), true_pose, atol=5e-3)
    # the (very tight: 0.5 mm / 0.005 deg) convergence gate may or may not
    # trip at the 0.01 m map-noise floor; the pose must stay put regardless


@pytest.mark.slow  # compiles a third scan_to_map shape (~22 s CPU)
def test_too_few_points_no_update(problem):
    corner_map, surf_map, true_pose, scan_c, scan_s = problem
    ch, sh = _hashes(corner_map, surf_map)
    cfg = MatchingConfig()
    guess = true_pose + 0.1
    out = scan_match.scan_to_map(
        jnp.asarray(guess),
        jnp.asarray(scan_c[:8]), jnp.ones(8, bool),
        jnp.asarray(scan_s[:8]), jnp.ones(8, bool),
        jnp.asarray(corner_map), ch, jnp.asarray(surf_map), sh,
        cfg, max_iterations=15,
    )
    # < min_valid_points: solver must leave the pose untouched
    np.testing.assert_allclose(np.asarray(out.pose), guess, atol=1e-6)


@pytest.mark.slow  # compiles a second scan_to_map variant (~25 s CPU)
def test_semantic_weighting_changes_solution(problem):
    """With weights zeroing out half the surf points, the solution should
    still converge (sanity for the semantic-weighted path)."""
    corner_map, surf_map, true_pose, scan_c, scan_s = problem
    ch, sh = _hashes(corner_map, surf_map)
    cfg = MatchingConfig()
    guess = true_pose + np.array([0.01, 0.01, -0.02, 0.2, 0.1, -0.1], np.float32)
    w_s = jnp.asarray(np.where(np.arange(len(scan_s)) % 2 == 0, 1.5, 0.5),
                      dtype=jnp.float32)
    out = scan_match.scan_to_map(
        jnp.asarray(guess),
        jnp.asarray(scan_c), jnp.ones(len(scan_c), bool),
        jnp.asarray(scan_s), jnp.ones(len(scan_s), bool),
        jnp.asarray(corner_map), ch, jnp.asarray(surf_map), sh,
        cfg, max_iterations=15,
        corner_sem_weight=jnp.ones(len(scan_c)),
        surf_sem_weight=w_s,
    )
    np.testing.assert_allclose(np.asarray(out.pose)[3:], true_pose[3:], atol=6e-2)


def test_corner_line_fit_math():
    """Unit check of the closed-form eigen path against numpy."""
    rng = np.random.default_rng(5)
    pts = np.zeros((64, 5, 3), dtype=np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.uniform(-1, 1, (64, 5, 1)).astype(np.float32)
    pts = d[:, None, :] * t + rng.normal(0, 0.01, (64, 5, 3)).astype(np.float32)
    center = pts.mean(1, keepdims=True)
    cov = np.einsum("qki,qkj->qij", pts - center, pts - center) / 5.0
    evals = np.asarray(lin.eigvalsh3(jnp.asarray(cov)))
    evecs = np.asarray(lin.principal_eigvec3(jnp.asarray(cov), jnp.asarray(evals)))
    ref_vals = np.linalg.eigvalsh(cov)
    np.testing.assert_allclose(evals, ref_vals, atol=3e-4)  # f32 analytic
    # principal direction parallel to the generating direction
    dots = np.abs(np.sum(evecs * d, axis=1))
    assert (dots > 0.99).all()
