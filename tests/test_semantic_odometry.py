"""Back-end semantic submap odometry tests (config 3 path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.io import synthetic
from lis_slam_tpu.pipeline import driver, odometry, semantic_odometry, trajectory
from tests.test_slam_pipeline import tiny_cfg


@pytest.fixture(scope="module")
def seq16():
    import lis_slam_tpu.io.synthetic as syn

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        rng = np.random.default_rng(9)
        boxes, labels = [], []
        for k in range(14):
            ang = 2 * np.pi * k / 14
            cx, cy = 26.0 * np.cos(ang), 10.0 + 26.0 * np.sin(ang)
            w, d, h = rng.uniform(5, 9), rng.uniform(5, 9), rng.uniform(5, 14)
            boxes.append([cx - w / 2, cy - d / 2, 0, cx + w / 2, cy + d / 2, h])
            labels.append(synthetic.LBL_BUILDING)
        poles = [[r * np.cos(a), 10.0 + r * np.sin(a), 0.15, 5.0]
                 for a, r in zip(np.linspace(0, 2 * np.pi, 24),
                                 rng.uniform(15, 20, 24))]
        world = synthetic.World(
            boxes=np.asarray(boxes), box_labels=np.asarray(labels, np.int32),
            poles=np.asarray(poles))
        n = 30
        gt = synthetic.circular_trajectory(n + 1, radius=10.0, speed=6.3)
        scans = [
            synthetic.render_scan(world, gt[i], None, n_scan=16, horizon=900,
                                  seed=500 + i, noise=0.01, max_range=90.0)
            for i in range(n)
        ]
    finally:
        syn.hdl64_elevations = orig
    return scans, gt


def test_build_semantic_scan_splits_classes(seq16):
    scans, gt = seq16
    cfg = tiny_cfg()
    s = scans[0]
    sin = driver.pad_scan(s.points[s.valid], cfg)
    lab = np.zeros(cfg.sensor.max_raw_points, np.int32)
    lab[: s.valid.sum()] = s.labels[s.valid]
    ss = semantic_odometry.build_semantic_scan(sin, jnp.asarray(lab), cfg)
    n_corner = int(np.asarray(ss.corner_mask).sum())
    n_surf = int(np.asarray(ss.surf_mask).sum())
    assert n_corner > 20  # poles visible
    # surf matched cloud is voxel-downsampled at refine_surf_leaf now
    # (keyframeInit's *DS clouds, subMapOptmizationNode.cpp:807-893), so
    # the bound is on voxel-uniform coverage, not raw cardinality
    assert n_surf > 1000  # ground + buildings
    # pole points should be far from ground plane normals: check weights
    w = np.asarray(ss.corner_w)[np.asarray(ss.corner_mask)]
    np.testing.assert_allclose(w, 0.5, atol=1e-5)  # w = 2 - 1.5 for pole
    dyn = np.asarray(ss.surf_is_dynamic)[np.asarray(ss.surf_mask)]
    assert dyn.mean() < 0.3  # scene has only parked cars (few/no dynamics)


@pytest.mark.slow
def test_semantic_refinement_tracks(seq16):
    """Back-end semantic odometry alone (seeded by constant velocity) should
    track the circuit."""
    scans, gt = seq16
    cfg = tiny_cfg()
    state = semantic_odometry.init_state(cfg)
    pose = np.zeros(6, np.float32)
    prev = np.zeros(6, np.float32)
    poses = []
    for i, s in enumerate(scans):
        sin = driver.pad_scan(s.points[s.valid], cfg)
        lab = np.zeros(cfg.sensor.max_raw_points, np.int32)
        lab[: s.valid.sum()] = s.labels[s.valid]
        ss = semantic_odometry.build_semantic_scan(sin, jnp.asarray(lab), cfg)
        guess = jnp.asarray(pose + (pose - prev))
        state, new_pose, gn = semantic_odometry.refine_step(
            state, ss, guess, cfg)
        prev = pose
        pose = np.asarray(new_pose)
        poses.append(pose)
    poses = np.asarray(poses)
    gt_rel = trajectory.relative_to_first(gt[: len(scans)])
    ate = trajectory.ate_rmse(poses, gt_rel, align=False)
    assert ate < 2.0, f"semantic back-end ATE {ate:.3f}"  # standalone (unseeded) smoke bound
