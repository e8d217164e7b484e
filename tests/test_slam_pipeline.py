"""Full-pipeline integration: odometry + keyframes + submaps + loop closure
+ pose graph on a small synthetic loop circuit (16-beam config for CPU
speed)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import (
    SlamConfig, SensorConfig, MatchingConfig, SubMapConfig, FeatureConfig,
    KeyframeConfig,
)
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.pipeline import driver, odometry, slam, trajectory


def tiny_cfg():
    base = SlamConfig()
    return base.replace(
        sensor=SensorConfig(
            n_scan=16, horizon_scan=900, downsample_rate=1,
            lidar_min_range=1.0, lidar_max_range=80.0,
            max_raw_points=16 * 900,
        ),
        feature=dataclasses.replace(
            base.feature, max_corner_points=1024, max_surf_points=8192,
            max_sharp_corner_points=512, max_sharp_surf_points=1024,
        ),
        matching=dataclasses.replace(
            base.matching, corner_map_capacity=8192, surf_map_capacity=32768,
            hash_table_slots=1 << 14,
            # the reference's eigenvalue gate (100) is calibrated for HDL-64
            # correspondence counts; a 16-beam scan has ~8x fewer rows
            degeneracy_eigen_threshold=10.0,
        ),
        submap=dataclasses.replace(
            base.submap, translation_max=8.0, frames_size=12,
            corner_capacity=8192, surf_capacity=16384, max_submaps=64,
        ),
        # params_lio keyframe gating (0.2 m) so the sparse 16-beam map
        # densifies fast enough to track
        keyframe=KeyframeConfig(min_distance=0.2, min_yaw=0.2),
    )


def render_tiny(world, pose, seed):
    return synthetic.render_scan(
        world, pose, None, n_scan=16, horizon=900, seed=seed, noise=0.01,
        max_range=90.0,
    )


@pytest.fixture(scope="module")
def sequence():
    # 16-beam renders use the HDL-64 elevation table's first 16 rows; the
    # ring formula for 16-beam expects +-15 deg at 2 deg spacing, so
    # elevations won't match rings exactly — instead give the generator the
    # real VLP-16 pattern by monkeypatching.
    import lis_slam_tpu.io.synthetic as syn

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        # hand-built world: buildings ringing a clear plaza so the r=10
        # circuit never clips geometry
        rng = np.random.default_rng(9)
        boxes, labels = [], []
        for k in range(14):
            ang = 2 * np.pi * k / 14
            cx = 26.0 * np.cos(ang)
            cy = 10.0 + 26.0 * np.sin(ang)
            w, d, h = rng.uniform(5, 9), rng.uniform(5, 9), rng.uniform(5, 14)
            boxes.append([cx - w / 2, cy - d / 2, 0, cx + w / 2, cy + d / 2, h])
            labels.append(synthetic.LBL_BUILDING)
        poles = []
        for k in range(24):
            ang = 2 * np.pi * k / 24 + 0.1
            r = rng.uniform(15, 20)
            poles.append([r * np.cos(ang), 10.0 + r * np.sin(ang),
                          rng.uniform(0.1, 0.2), rng.uniform(3, 7)])
        world = synthetic.World(
            boxes=np.asarray(boxes), box_labels=np.asarray(labels, np.int32),
            poles=np.asarray(poles),
        )
        n = 100
        gt = synthetic.circular_trajectory(n + 1, radius=10.0, speed=6.3)
        scans = [render_tiny(world, gt[i], 200 + i) for i in range(n)]
    finally:
        syn.hdl64_elevations = orig
    return scans, gt


@pytest.mark.slow
def test_full_slam_pipeline(sequence):
    scans, gt = sequence
    cfg = tiny_cfg()
    system = slam.SemanticSlam(cfg)
    for s in scans:
        sin = driver.pad_scan(s.points[s.valid], cfg)
        system.process_scan(sin, gt_labels=s.labels[s.valid])
    res = system.finish(build_map=True)

    n = len(scans)
    assert res.poses.shape == (n, 6)
    assert len(system.keyframes) > 10
    assert res.n_submaps >= 3
    gt_rel = trajectory.relative_to_first(gt[:n])
    ate_raw = trajectory.ate_rmse(res.raw_poses, gt_rel, align=False)
    ate_corr = trajectory.ate_rmse(res.poses, gt_rel, align=False)
    # the circuit is ~63 m; odometry should already be decent, the graph
    # must not make it worse
    assert ate_raw < 1.0, f"odometry ATE {ate_raw:.3f}"
    assert ate_corr < max(1.0, ate_raw * 1.2), (
        f"corrected ATE {ate_corr:.3f} vs raw {ate_raw:.3f}")
    assert res.global_map is not None and len(res.global_map) > 1000


@pytest.mark.slow
def test_multilap_soak_bounded_state(sequence):
    """Long-sequence soak (SURVEY aux row "long-sequence windowing"): two
    laps of the circuit (200 scans; the 100-scan circle closes, so lap 2
    replays the same ground-truth poses). Error must stay flat across laps
    (the aged-voxel window + loop closures prevent unbounded drift), all
    fixed-capacity structures must respect their caps, and deferred-work
    queues must drain."""
    scans, gt = sequence
    cfg = tiny_cfg()
    system = slam.SemanticSlam(cfg)
    n = len(scans)
    laps = 2
    for lap in range(laps):
        for i, s in enumerate(scans):
            sin = driver.pad_scan(s.points[s.valid], cfg)
            system.process_scan(sin, gt_labels=s.labels[s.valid],
                                timestamp=(lap * n + i) * 0.1)
    res = system.finish()

    # the gt circuit is periodic (100 scans ~ one lap), so tile it
    gt_rel = trajectory.relative_to_first(gt[:n])
    gt_tiled = np.tile(gt_rel, (laps, 1))
    per_lap = [
        trajectory.ate_rmse(res.poses[k * n:(k + 1) * n],
                            gt_tiled[k * n:(k + 1) * n], align=False)
        for k in range(laps)
    ]
    assert per_lap[-1] < 1.0, f"lap ATEs {per_lap}"
    # flat across laps: the last lap must not be much worse than the first
    assert per_lap[-1] < per_lap[0] + 0.5, f"drift grows per lap: {per_lap}"
    # capacity respect: submaps and loop DB within their configured caps
    assert res.n_submaps <= cfg.submap.max_submaps
    assert len(system.loop_detector.poses) <= 4096
    # deferred queues drained by finish()
    assert not system._gps_queue
    assert res.poses.shape == (laps * n, 6)


@pytest.mark.slow
def test_trajectory_export(sequence, tmp_path):
    scans, gt = sequence
    cfg = tiny_cfg()
    system = slam.SemanticSlam(cfg)
    for s in scans[:12]:
        sin = driver.pad_scan(s.points[s.valid], cfg)
        system.process_scan(sin)
    p = tmp_path / "pred.txt"
    system.save_trajectory(str(p))
    rows = np.loadtxt(p)
    assert rows.shape == (12, 12)


@pytest.mark.slow
def test_loop_closure_corrects_injected_drift(sequence):
    """End-to-end loop-closure proof (VERDICT round-1 item 6): replay the
    circuit with progressively drifting odometry (pose_hook seam); the
    pipeline must DETECT at least one loop and the graph correction must
    recover most of the injected error (corrected ATE < 0.7x raw)."""
    scans, gt = sequence
    cfg = tiny_cfg()
    cfg = cfg.replace(
        loop=dataclasses.replace(
            cfg.loop,
            # the reference gates candidates at 1% of travel
            # (INFLATION_COVARIANCE, epscGeneration.h:9-11); the injected
            # drift is ~3% of travel, so widen the gate accordingly
            inflation_covariance=0.08,
        ),
    )

    from lis_slam_tpu.golden import replica as _rep

    def drift_hook(pose6, idx):
        # growing yaw error about the world origin: ~0.0015 rad/scan
        th = 0.0015 * idx
        c, s = np.cos(th), np.sin(th)
        Td = np.eye(4)
        Td[:2, :2] = [[c, -s], [s, c]]
        return _rep.matrix_to_pose(Td @ _rep.pose_to_matrix(pose6))

    system = slam.SemanticSlam(cfg, pose_hook=drift_hook)
    for s in scans:
        sin = driver.pad_scan(s.points[s.valid], cfg)
        system.process_scan(sin, gt_labels=s.labels[s.valid])
    res = system.finish()

    n = len(scans)
    gt_rel = trajectory.relative_to_first(gt[:n])
    ate_raw = trajectory.ate_rmse(res.raw_poses, gt_rel, align=False)
    ate_corr = trajectory.ate_rmse(res.poses, gt_rel, align=False)
    assert ate_raw > 0.5, f"drift injection too weak: raw ATE {ate_raw:.3f}"
    assert res.n_loops > 0, "no loop closure detected on a revisited circuit"
    assert ate_corr < 0.7 * ate_raw, (
        f"correction too weak: corrected {ate_corr:.3f} vs raw {ate_raw:.3f}"
    )
