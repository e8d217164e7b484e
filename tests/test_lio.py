"""LIO pipeline test: distorted scans + IMU vs the lidar-only path."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig, SensorConfig, ImuConfig
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.ops import velocity_deskew
from lis_slam_tpu.pipeline import lio, trajectory
from tests.test_slam_pipeline import tiny_cfg


def lio_tiny_cfg():
    base = tiny_cfg()
    return base.replace(
        imu=dataclasses.replace(ImuConfig(), use_imu=True, max_imu_per_scan=64),
    )


def test_velocity_deskew_constant_motion():
    """Points fired later in the sweep from a translating sensor map back to
    the start frame."""
    v = np.array([2.0, 0.0, 0.0], np.float32)
    pts = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]], np.float32)
    t = np.array([0.0, 0.05], np.float32)
    out = velocity_deskew.velocity_deskew(
        jnp.asarray(pts), jnp.asarray(t), jnp.zeros(3), jnp.asarray(v),
        jnp.ones(2, bool))
    np.testing.assert_allclose(np.asarray(out)[0], pts[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], pts[1] + v * 0.05, atol=1e-5)


def test_sync_to_time():
    t = jnp.asarray([0.0, 1.0, 2.0, 0.0])
    v = jnp.asarray([[0.0], [10.0], [20.0], [0.0]])
    valid = jnp.asarray([True, True, True, False])
    out = velocity_deskew.sync_to_time(t, v, valid, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(out), [5.0], atol=1e-5)


def test_gps_vel_converter_and_stream():
    """gpsVelConverter parity (utility.h:519-540): GPS velocity twists
    rotate into the lidar frame by extRot (linear AND angular), then the
    host VelocityStream interpolates to scan time (VelocityData::SyncData,
    dataPretreatNode.cpp:91-109)."""
    import dataclasses

    from lis_slam_tpu.config import ImuConfig
    from lis_slam_tpu.imu import preintegration as pre
    from lis_slam_tpu.pipeline import driver

    # extRot: 90 deg about z — x_gps maps to y_lidar
    Rz = ((0.0, -1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    cfg = dataclasses.replace(ImuConfig(), extrinsic_rot=Rz)
    lin, ang = pre.gps_vel_to_lidar([1.0, 0.0, 0.0], [0.0, 2.0, 0.0], cfg)
    np.testing.assert_allclose(lin, [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(ang, [-2.0, 0.0, 0.0], atol=1e-12)

    vs = driver.VelocityStream()
    assert vs.at(0.5) is None  # empty / unbracketed -> SyncData false
    for k in range(3):
        l, a = pre.gps_vel_to_lidar([float(k), 0.0, 0.0],
                                    [0.0, 0.0, float(2 * k)], cfg)
        vs.push(k * 1.0, l, a)
    assert vs.at(-0.1) is None and vs.at(2.1) is None
    lin_t, ang_t = vs.at(0.5)
    np.testing.assert_allclose(lin_t, [0.0, 0.5, 0.0], atol=1e-12)
    np.testing.assert_allclose(ang_t, [0.0, 0.0, 1.0], atol=1e-12)
    # feeds pad_scan's velocity front-end fields
    sin = driver.pad_scan(np.zeros((4, 4), np.float32), tiny_cfg(),
                          velocity=lin_t, angular_rate=ang_t)
    assert bool(sin.vel_valid)
    np.testing.assert_allclose(np.asarray(sin.vel), lin_t, atol=1e-6)


@pytest.mark.slow
def test_lio_tracks_with_distorted_scans():
    """Motion-distorted 16-beam scans + IMU gyro: the LIO driver (deskew +
    preintegrated guess) must keep ATE bounded."""
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
        n = 40
        gt = synthetic.circular_trajectory(n + 1, radius=10.0, speed=6.3)
        cfg = lio_tiny_cfg()
        system = lio.LioOdometry(cfg)
        poses = []
        for i in range(n):
            s = synthetic.render_scan(
                world, gt[i], gt[i + 1], n_scan=16, horizon=900,
                seed=300 + i, noise=0.01, max_range=90.0)
            pose = system.process_scan(
                s.points[s.valid],
                imu_time=s.imu_time + i * 0.1,
                imu_gyro=s.gyro,
                imu_accel=s.accel,
                scan_start=i * 0.1,
            )
            poses.append(pose)
        poses = np.asarray(poses)
        gt_rel = trajectory.relative_to_first(gt[:n])
        ate = trajectory.ate_rmse(poses, gt_rel, align=False)
        assert ate < 1.5, f"LIO ATE {ate:.3f}"
        assert system.diag.n_resets == 0
    finally:
        syn.hdl64_elevations = orig


@pytest.mark.slow
def test_data_pretreat_velocity_frontend():
    """Component #8 (dataPretreatNode): the velocity-deskew alternate
    front-end, wired end-to-end. Motion-distorted scans + an ego-velocity
    stream (no IMU orientation): odometry with velocity deskew must beat
    the same pipeline with deskew disabled."""
    import lis_slam_tpu.io.synthetic as syn
    from scipy.spatial.transform import Rotation

    from lis_slam_tpu.pipeline import driver, odometry

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        rng = np.random.default_rng(9)
        boxes, labels = [], []
        for k in range(14):
            ang = 2 * np.pi * k / 14
            cx, cy = 26.0 * np.cos(ang), 10.0 + 26.0 * np.sin(ang)
            w, d, h = rng.uniform(5, 9), rng.uniform(5, 9), rng.uniform(5, 14)
            boxes.append([cx - w / 2, cy - d / 2, 0,
                          cx + w / 2, cy + d / 2, h])
            labels.append(synthetic.LBL_BUILDING)
        poles = [[r * np.cos(a), 10.0 + r * np.sin(a), 0.15, 5.0]
                 for a, r in zip(np.linspace(0, 2 * np.pi, 24, endpoint=False),
                                 rng.uniform(15, 20, 24))]
        world = synthetic.World(
            boxes=np.asarray(boxes), box_labels=np.asarray(labels, np.int32),
            poles=np.asarray(poles))
        n = 16
        # fast circuit so distortion is significant (~0.9 m per sweep)
        gt = synthetic.circular_trajectory(n + 1, radius=10.0, speed=9.0)
        scans = [synthetic.render_scan(world, gt[i], gt[i + 1], n_scan=16,
                                       horizon=900, seed=800 + i,
                                       max_range=90.0) for i in range(n)]

        def run(mode):
            cfg = tiny_cfg()
            cfg = cfg.replace(
                imu=dataclasses.replace(
                    ImuConfig(), use_imu=False, deskew_mode=mode),
                # scans here carry residual motion distortion even after
                # velocity deskew: refresh-on-reobservation map anchoring
                # is required (first-anchoring locks in whichever scan's
                # distortion saw a voxel first; see VoxelConfig.map_anchor)
                voxel=dataclasses.replace(
                    cfg.voxel, map_anchor="newest"))
            state = odometry.init_state(cfg)
            poses = []
            for i, s in enumerate(scans):
                # body-frame ego motion from consecutive gt poses (the
                # dataPretreat node syncs a GPS-velocity stream the same way)
                R0 = Rotation.from_euler("xyz", gt[i][:3]).as_matrix()
                vel = R0.T @ (gt[i + 1][3:] - gt[i][3:]) / 0.1
                sin = driver.pad_scan(
                    s.points[s.valid], cfg,
                    velocity=vel, angular_rate=s.gyro[0])
                state, out = odometry.odom_step(state, sin, cfg)
                poses.append(np.asarray(out.pose))
            gt_rel = trajectory.relative_to_first(gt[:n])
            return trajectory.ate_rmse(np.asarray(poses), gt_rel, align=False)

        ate_vel = run("velocity")
        ate_none = run("none")
        assert ate_vel < 0.35, f"velocity front-end ATE {ate_vel:.3f}"
        assert ate_vel < 0.8 * ate_none, (
            f"deskew did not help: {ate_vel:.3f} vs {ate_none:.3f}")
    finally:
        syn.hdl64_elevations = orig
