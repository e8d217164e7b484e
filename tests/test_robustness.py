"""Runtime robustness edge cases: empty/short runs, repeated finish,
pipeline state after a flush. The reference leans on ROS respawn for
robustness (module_loam.launch:5-9); a library must instead behave at the
API boundary."""

import dataclasses

import numpy as np
import pytest

from lis_slam_tpu.config import (
    SlamConfig, SensorConfig, KeyframeConfig,
)
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.pipeline import driver, slam


def micro_cfg():
    base = SlamConfig()
    return base.replace(
        sensor=SensorConfig(
            n_scan=16, horizon_scan=360, downsample_rate=1,
            lidar_min_range=1.0, lidar_max_range=80.0,
            max_raw_points=16 * 360,
        ),
        feature=dataclasses.replace(
            base.feature, max_corner_points=512, max_surf_points=2048,
            max_sharp_corner_points=256, max_sharp_surf_points=512,
        ),
        matching=dataclasses.replace(
            base.matching, corner_map_capacity=4096, surf_map_capacity=8192,
            hash_table_slots=1 << 12, degeneracy_eigen_threshold=10.0,
        ),
        submap=dataclasses.replace(
            base.submap, corner_capacity=4096, surf_capacity=8192,
            local_corner_capacity=4096, local_surf_capacity=8192,
            max_submaps=16,
        ),
        keyframe=KeyframeConfig(min_distance=0.2, min_yaw=0.2),
    )


@pytest.fixture(scope="module")
def tiny_scans():
    import lis_slam_tpu.io.synthetic as syn

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        world = synthetic.make_world(seed=3)
        gt = synthetic.circular_trajectory(7, radius=30.0, speed=4.0)
        scans = [
            synthetic.render_scan(world, gt[i], None, n_scan=16, horizon=360,
                                  seed=70 + i, noise=0.01)
            for i in range(6)
        ]
    finally:
        syn.hdl64_elevations = orig
    return scans


def test_finish_with_zero_scans():
    system = slam.SemanticSlam(micro_cfg())
    res = system.finish(build_map=True)
    assert res.poses.shape == (0, 6)
    assert res.raw_poses.shape == (0, 6)
    assert res.n_submaps == 0 and res.n_loops == 0
    assert res.global_map is None


@pytest.mark.slow  # compiles the full fused SLAM step (~50 s on the CPU harness)
def test_finish_fewer_scans_than_drain_batch(tiny_scans):
    """drain_every default (>3): a 3-scan run never triggers a scheduled
    drain — finish() must flush the pending batch itself."""
    cfg = micro_cfg()
    assert cfg.runtime.drain_every > 3
    system = slam.SemanticSlam(cfg)
    for s in tiny_scans[:3]:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    res = system.finish()
    assert res.poses.shape == (3, 6)
    assert np.all(np.isfinite(res.poses))


def test_finish_is_idempotent(tiny_scans):
    cfg = micro_cfg()
    system = slam.SemanticSlam(cfg)
    for s in tiny_scans:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    r1 = system.finish()
    r2 = system.finish()
    np.testing.assert_allclose(r2.raw_poses, r1.raw_poses)
    assert r2.n_submaps == r1.n_submaps
    assert r2.poses.shape == r1.poses.shape


def test_process_after_finish_continues(tiny_scans):
    """finish() is the finishMap service, not a destructor: feeding more
    scans afterwards must keep extending the trajectory."""
    cfg = micro_cfg()
    system = slam.SemanticSlam(cfg)
    for s in tiny_scans[:4]:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    system.finish()
    for s in tiny_scans[4:]:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    res = system.finish()
    assert res.poses.shape == (len(tiny_scans), 6)
    assert np.all(np.isfinite(res.poses))


def test_all_points_invalid_scan(tiny_scans):
    """A dropout scan (all points range-gated away) must not crash or
    produce NaNs — the solver skips on min_valid_points."""
    cfg = micro_cfg()
    system = slam.SemanticSlam(cfg)
    for s in tiny_scans[:2]:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    system.process_scan(driver.pad_scan(
        np.zeros((0, 4), np.float32), cfg))  # empty cloud
    for s in tiny_scans[2:4]:
        system.process_scan(driver.pad_scan(s.points[s.valid], cfg))
    res = system.finish()
    assert res.poses.shape == (5, 6)
    assert np.all(np.isfinite(res.poses))
