"""Navsat module tests: datum transform, 15-state EKF fusion, and the
odometry/navsat -> addGPSFactor edge into SemanticSlam
(module_navsat.launch + params.yaml:176-239 equivalents)."""

import numpy as np

from lis_slam_tpu.pipeline import navsat


def test_navsat_transform_datum_and_scale():
    """lat/lon deltas around a datum must map to metric ENU: 1e-5 deg of
    latitude is ~1.11 m everywhere; longitude scales by cos(lat)."""
    tr = navsat.NavsatTransform(zero_altitude=False)
    p0 = tr.to_local(48.0, 11.0, 500.0)  # sets the datum
    np.testing.assert_allclose(p0, [0, 0, 0], atol=1e-9)
    p_north = tr.to_local(48.0 + 1e-5, 11.0, 500.0)
    assert abs(p_north[1] - 1.11) < 0.02 and abs(p_north[0]) < 1e-6
    p_east = tr.to_local(48.0, 11.0 + 1e-5, 510.0)
    expect_e = 1.113 * np.cos(np.deg2rad(48.0))
    assert abs(p_east[0] - expect_e) < 0.02
    assert abs(p_east[2] - 10.0) < 1e-9  # altitude preserved

    # zero_altitude: true (the reference's setting) flattens z
    tr2 = navsat.NavsatTransform(zero_altitude=True)
    tr2.set_datum(48.0, 11.0, 500.0)
    assert tr2.to_local(48.0, 11.0, 999.0)[2] == 0.0

    # yaw_offset rotates ENU into the local frame
    tr3 = navsat.NavsatTransform(yaw_offset=np.pi / 2, zero_altitude=True)
    tr3.set_datum(48.0, 11.0)
    p = tr3.to_local(48.0, 11.0 + 1e-4)  # pure east
    assert p[1] > 10.0 * np.cos(np.deg2rad(48.0)) * 0.99  # east -> +y
    assert abs(p[0]) < 0.05


def test_gps_ekf_smooths_noisy_fixes():
    """EKF (IMU at 100 Hz: rpy + yaw rate + body accel; GPS at 1 Hz with
    sigma=2 m noise) must track a circular trajectory with LOWER position
    RMSE than the raw fixes — the whole point of ekf_gps."""
    rng = np.random.default_rng(3)
    radius, speed = 40.0, 8.0
    omega = speed / radius
    ekf = navsat.GpsEkf()
    dt_imu, dt_gps = 0.01, 1.0
    T = 60.0
    sigma_gps = 2.0
    errs_ekf, errs_gps = [], []
    t = 0.0
    while t < T:
        yaw = omega * t
        pos = np.array([radius * np.sin(yaw), radius * (1 - np.cos(yaw)), 0])
        rpy = np.array([0.0, 0.0, yaw])
        # body accel: centripetal w x v (gravity already removed)
        a_body = np.array([0.0, speed * omega, 0.0])
        ekf.update_imu(t, rpy + rng.normal(0, 0.005, 3), omega,
                       a_body + rng.normal(0, 0.05, 3))
        if abs(t % dt_gps) < dt_imu / 2 and t > 0:
            fix = pos + rng.normal(0, sigma_gps, 3)
            ekf.update_gps(t, fix, np.full(3, sigma_gps ** 2))
            errs_gps.append(np.linalg.norm(fix[:2] - pos[:2]))
            errs_ekf.append(np.linalg.norm(ekf.position[:2] - pos[:2]))
        t += dt_imu
    rmse_ekf = float(np.sqrt(np.mean(np.square(errs_ekf[5:]))))
    rmse_gps = float(np.sqrt(np.mean(np.square(errs_gps[5:]))))
    assert rmse_ekf < 0.7 * rmse_gps, (rmse_ekf, rmse_gps)
    # orientation tracked (wrapped)
    err_yaw = abs((ekf.rpy[2] - omega * ekf.t + np.pi) % (2 * np.pi) - np.pi)
    assert err_yaw < 0.05


def test_navsat_pipeline_feeds_slam_gps_queue():
    """The full stack: fixes -> local frame -> EKF -> add_gps ingestion
    (odometryHandler -> addGPSFactor, subMapOptmizationNode.cpp:4217-4301).
    Samples must land in the SemanticSlam GPS queue with finite covs."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_slam_pipeline import tiny_cfg
    from lis_slam_tpu.pipeline import slam

    pipe = navsat.NavsatPipeline()
    lat0, lon0 = 48.0, 11.0
    for k in range(5):
        t = k * 0.1
        pipe.on_imu(t, np.zeros(3), 0.0, np.zeros(3))
        pipe.on_fix(t, lat0 + k * 1e-6, lon0, 0.0, np.full(3, 1.0))
    assert len(pipe.stream) == 5
    system = slam.SemanticSlam(tiny_cfg())
    pipe.feed_slam(system)
    assert not pipe.stream  # consumed
    assert len(system._gps_queue) == 5
    for (_t, pos, cov) in system._gps_queue:
        assert np.all(np.isfinite(pos)) and np.all(cov > 0)
