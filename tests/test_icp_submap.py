"""Tests for the registration toolbox and submap manager."""

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import SubMapConfig
from lis_slam_tpu.mapping import submap as sm
from lis_slam_tpu.ops import icp, knn
from lis_slam_tpu.utils import se3


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    # structured target: two walls + ground, dense enough for stable NN
    g = rng.uniform(-10, 10, (3000, 2))
    ground = np.column_stack([g, np.zeros(3000)])
    w1 = np.column_stack([rng.uniform(-10, 10, 2000), np.full(2000, 10.0),
                          ])[:, [0, 2, 1]] if False else None
    wx = rng.uniform(-10, 10, 2000)
    wz = rng.uniform(0, 5, 2000)
    wall1 = np.column_stack([wx, np.full(2000, 10.0), wz])
    wall2 = np.column_stack([np.full(2000, -10.0), wx, wz])
    tgt = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    tgt += rng.normal(0, 0.005, tgt.shape).astype(np.float32)
    return tgt


def _transform(pts, pose6):
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(pose6, dtype=jnp.float32)))
    return (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32), T


@pytest.mark.parametrize("method", ["icp", "gicp"])
def test_icp_recovers_transform(cloud, method):
    rng = np.random.default_rng(1)
    true_pose = np.array([0.01, -0.02, 0.08, 0.3, -0.4, 0.1], np.float32)
    src = cloud[rng.choice(len(cloud), 2000, replace=False)]
    # source = target points moved by inverse of true transform
    T_true = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    src_moved = (src - T_true[:3, 3]) @ T_true[:3, :3]
    h = knn.build_hash(jnp.asarray(cloud), jnp.ones(len(cloud), bool),
                       cell_size=1.0, table_size=1 << 14)
    align = icp.select_registration_method(method)
    res = align(jnp.asarray(src_moved.astype(np.float32)),
                jnp.ones(len(src), bool), jnp.asarray(cloud), h,
                jnp.eye(4), max_iterations=30)
    T_est = np.asarray(res.transform)
    assert int(res.n_inliers) > 1000
    np.testing.assert_allclose(T_est[:3, 3], T_true[:3, 3], atol=0.05)
    np.testing.assert_allclose(T_est[:3, :3], T_true[:3, :3], atol=0.02)
    assert float(res.fitness) < 0.01


def test_icp_refresh_schedule_matches_full_refresh(cloud):
    """`refresh_iters` (cached correspondences between scheduled hash
    searches — the verify-ICP cost fix, cfg.loop.verify_refresh_iters)
    recovers the same transform as the per-iteration search."""
    rng = np.random.default_rng(3)
    true_pose = np.array([0.01, -0.02, 0.06, 0.25, -0.3, 0.08], np.float32)
    src = cloud[rng.choice(len(cloud), 2000, replace=False)]
    T_true = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    src_moved = (src - T_true[:3, 3]) @ T_true[:3, :3]
    h = knn.build_hash(jnp.asarray(cloud), jnp.ones(len(cloud), bool),
                       cell_size=1.0, table_size=1 << 14)
    kw = dict(max_iterations=30, point_to_plane=True,
              max_correspond_dist=1.0)
    full = icp.icp(jnp.asarray(src_moved.astype(np.float32)),
                   jnp.ones(len(src), bool), jnp.asarray(cloud), h,
                   jnp.eye(4), **kw)
    sched = icp.icp(jnp.asarray(src_moved.astype(np.float32)),
                    jnp.ones(len(src), bool), jnp.asarray(cloud), h,
                    jnp.eye(4), refresh_iters=(0, 4, 10, 18), **kw)
    T_f, T_s = np.asarray(full.transform), np.asarray(sched.transform)
    assert int(sched.n_inliers) > 1000
    # both recover the truth; scheduled vs full agree to correspondence noise
    np.testing.assert_allclose(T_s[:3, 3], T_true[:3, 3], atol=0.05)
    np.testing.assert_allclose(T_s[:3, :3], T_true[:3, :3], atol=0.02)
    np.testing.assert_allclose(T_s, T_f, atol=0.02)
    # the early-exit guard keeps iterating until the LAST refresh has run
    assert int(sched.iterations) > 18


def test_fitness_score(cloud):
    h = knn.build_hash(jnp.asarray(cloud), jnp.ones(len(cloud), bool),
                       cell_size=1.0, table_size=1 << 14)
    f_id = float(icp.fitness_score(jnp.asarray(cloud[:500]),
                                   jnp.ones(500, bool), h, jnp.eye(4)))
    T_off = np.eye(4, dtype=np.float32)
    T_off[0, 3] = 0.5
    f_off = float(icp.fitness_score(jnp.asarray(cloud[:500]),
                                    jnp.ones(500, bool), h,
                                    jnp.asarray(T_off)))
    assert f_id < 1e-4
    assert f_off > f_id


def test_ndt_alignment(cloud):
    rng = np.random.default_rng(2)
    grid = icp.build_ndt(jnp.asarray(cloud), jnp.ones(len(cloud), bool),
                         resolution=2.0)
    true_pose = np.array([0.0, 0.0, 0.04, 0.2, -0.3, 0.05], np.float32)
    T_true = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    src = cloud[rng.choice(len(cloud), 1500, replace=False)]
    src_moved = (src - T_true[:3, 3]) @ T_true[:3, :3]
    res = icp.ndt_align(jnp.asarray(src_moved.astype(np.float32)),
                        jnp.ones(len(src), bool), grid, jnp.eye(4))
    T_est = np.asarray(res.transform)
    np.testing.assert_allclose(T_est[:3, 3], T_true[:3, 3], atol=0.15)


# ------------------------------ submap -------------------------------------


def test_judge_new_submap():
    cfg = SubMapConfig()
    assert not sm.judge_new_submap(10.0, 0.1, 5, cfg)
    assert sm.judge_new_submap(cfg.translation_max + 1, 0.0, 0, cfg)
    assert sm.judge_new_submap(0.0, cfg.yaw_max + 0.1, 0, cfg)
    assert sm.judge_new_submap(0.0, 0.0, cfg.frames_size + 1, cfg)


def test_bbox_mask():
    pts = jnp.asarray([[0, 0, 0], [5, 5, 5], [20, 0, 0]], dtype=jnp.float32)
    mask = jnp.ones(3, bool)
    bbmin = jnp.asarray([-1.0, -1.0, -1.0])
    bbmax = jnp.asarray([10.0, 10.0, 10.0])
    keep = np.asarray(sm.bbox_mask(pts, mask, bbmin, bbmax))
    np.testing.assert_array_equal(keep, [True, True, False])
    drop = np.asarray(sm.bbox_mask(pts, mask, bbmin, bbmax, delete_box=True))
    np.testing.assert_array_equal(drop, [False, False, True])


def test_dynamic_removal():
    """Candidate points near existing map (< min) kept only in (near, min);
    far-from-map points (> max) kept as new structure."""
    rng = np.random.default_rng(3)
    map_pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    # candidates: [on top of a map point (d~0), 0.5 m away, far away]
    cand = np.stack([
        map_pts[0] + 0.001,
        map_pts[1] + np.array([0.5, 0, 0], np.float32),
        np.array([100.0, 100.0, 0.0], np.float32),
    ])
    keep = np.asarray(sm.dynamic_removal_mask(
        jnp.asarray(cand), jnp.ones(3, bool),
        jnp.asarray(map_pts), jnp.ones(2000, bool),
        jnp.zeros(3), jnp.float32(200.0),
        jnp.float32(0.1), jnp.float32(1.0), jnp.float32(10.0),
    ))
    # d~0 -> dropped (too close, redundancy); 0.5 in (0.1, 1.0) -> kept;
    # far (> max) -> kept as new structure
    np.testing.assert_array_equal(keep, [False, True, True])


def test_submap_collector_cut_and_merge():
    cfg = SubMapConfig(frames_size=3, translation_max=1000.0, yaw_max=100.0)
    coll = sm.SubMapCollector(cfg)
    rng = np.random.default_rng(4)

    def kf(i, x):
        pose = np.eye(4)
        pose[0, 3] = x
        pts = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
        cc = sm.ClassClouds(xyz=jnp.zeros((5, 8, 3)), mask=jnp.zeros((5, 8), bool))
        return sm.Keyframe(
            index=i, pose_init=pose, pose_opt=pose.copy(), clouds=cc,
            corner_xyz=jnp.asarray(pts[:64]), corner_mask=jnp.ones(64, bool),
            surf_xyz=jnp.asarray(pts), surf_mask=jnp.ones(256, bool),
        )

    outs = []
    for i in range(9):
        res = coll.add_keyframe(kf(i, float(i)))
        outs.append(res)
    finished = [o for o in outs if o is not None]
    assert len(finished) == 2  # frames_size=3 -> cut at frames 4 and 8
    s0 = finished[0]
    assert s0.kf_indices == [0, 1, 2, 3]
    # bbox is computed on device at close (no host sync); get_bbox
    # materializes it for direct-collector callers
    assert s0.get_bbox() is not None
    assert int(np.asarray(s0.surf_mask).sum()) > 100
    # flush closes the trailing partial submap
    tail = coll.flush()
    assert tail is not None and len(tail.kf_indices) == 1
