"""IMU preintegration golden tests vs numpy integration."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from lis_slam_tpu.config import ImuConfig
from lis_slam_tpu.imu import preintegration as pi


def numpy_preintegrate(times, gyro, accel, bg, ba):
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    for i in range(1, len(times)):
        dt = times[i] - times[i - 1]
        w = gyro[i] - bg
        a = accel[i] - ba
        p = p + v * dt + 0.5 * (R @ a) * dt * dt
        v = v + (R @ a) * dt
        R = R @ Rotation.from_rotvec(w * dt).as_matrix()
    return R, v, p


@pytest.fixture
def window():
    r = np.random.default_rng(2)
    m = 32
    times = np.linspace(0.0, 0.31, m).astype(np.float32)
    gyro = (0.3 * np.sin(np.linspace(0, 3, m))[:, None] *
            np.array([[1.0, -0.5, 0.8]])).astype(np.float32)
    accel = (np.array([[0.5, -0.2, 9.9]]) +
             0.1 * r.normal(size=(m, 3))).astype(np.float32)
    return times, gyro, accel


def test_preintegration_matches_numpy(window):
    times, gyro, accel = window
    bg = np.array([0.01, -0.02, 0.005], np.float32)
    ba = np.array([0.05, 0.02, -0.03], np.float32)
    cfg = ImuConfig()
    pre = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel),
        jnp.ones(len(times), bool), jnp.asarray(bg), jnp.asarray(ba), cfg,
    )
    R_ref, v_ref, p_ref = numpy_preintegrate(
        times.astype(np.float64), gyro.astype(np.float64),
        accel.astype(np.float64), bg, ba)
    np.testing.assert_allclose(np.asarray(pre.delta_R), R_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pre.delta_v), v_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pre.delta_p), p_ref, atol=1e-3)
    assert np.isclose(float(pre.delta_t), times[-1] - times[0], atol=1e-5)
    assert int(pre.count) == len(times) - 1
    # covariance is PSD and grows with time
    cov = np.asarray(pre.cov)
    assert np.linalg.eigvalsh(cov).min() > -1e-10


def test_bias_jacobian_first_order(window):
    """Perturbing the bias and re-integrating should match the first-order
    correction via the stored Jacobians."""
    times, gyro, accel = window
    cfg = ImuConfig()
    zero = jnp.zeros(3)
    pre0 = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel),
        jnp.ones(len(times), bool), zero, zero, cfg,
    )
    dbg = np.array([0.004, -0.003, 0.002], np.float32)
    dba = np.array([0.02, 0.01, -0.015], np.float32)
    pre1 = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel),
        jnp.ones(len(times), bool), jnp.asarray(dbg), jnp.asarray(dba), cfg,
    )
    # first-order correction of pre0 to the new bias: note sign — the
    # Jacobians are d(delta)/d(bias)
    dR, dv, dp = pi.correct_delta(pre0, jnp.asarray(dbg), jnp.asarray(dba))
    np.testing.assert_allclose(np.asarray(dR), np.asarray(pre1.delta_R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(pre1.delta_v), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(pre1.delta_p), atol=2e-3)


def test_predict_gravity_only():
    """Free fall: no IMU rotation/accel signal except gravity cancellation."""
    m = 8
    times = np.linspace(0, 0.07, m).astype(np.float32)
    gyro = np.zeros((m, 3), np.float32)
    accel = np.zeros((m, 3), np.float32)  # accelerometer reads 0 in free fall
    cfg = ImuConfig()
    pre = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel),
        jnp.ones(m, bool), jnp.zeros(3), jnp.zeros(3), cfg,
    )
    st = pi.ImuState(R=jnp.eye(3), v=jnp.zeros(3), p=jnp.zeros(3),
                     bg=jnp.zeros(3), ba=jnp.zeros(3))
    out = pi.predict(st, pre, cfg.gravity)
    dt = float(pre.delta_t)
    np.testing.assert_allclose(
        np.asarray(out.p), [0, 0, -0.5 * cfg.gravity * dt * dt], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.v), [0, 0, -cfg.gravity * dt],
                               atol=1e-5)


def test_failure_detection():
    assert not bool(pi.failure_detection(jnp.zeros(3), jnp.zeros(3), jnp.zeros(3)))
    assert bool(pi.failure_detection(jnp.asarray([40.0, 0, 0]), jnp.zeros(3),
                                     jnp.zeros(3)))
    assert bool(pi.failure_detection(jnp.zeros(3), jnp.asarray([1.2, 0, 0]),
                                     jnp.zeros(3)))


def test_velocity_bias_update_consistency():
    """If the lidar poses agree exactly with the preintegrated delta, the
    velocity estimate should equal the true initial velocity."""
    m = 16
    times = np.linspace(0, 0.15, m).astype(np.float32)
    gyro = np.zeros((m, 3), np.float32)
    g = 9.80511
    accel = np.tile(np.array([[1.0, 0.0, g]], np.float32), (m, 1))
    cfg = ImuConfig()
    pre = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel),
        jnp.ones(m, bool), jnp.zeros(3), jnp.zeros(3), cfg,
    )
    dt = float(pre.delta_t)
    v0 = np.array([2.0, 0.0, 0.0])
    # true motion: p1 = v0 t + 0.5 (a_world) t^2 with a_world = [1,0,0]
    p1 = v0 * dt + 0.5 * np.array([1.0, 0, 0]) * dt * dt
    pose_prev = jnp.zeros(6)
    pose_new = jnp.asarray(np.concatenate([[0, 0, 0], p1]), dtype=jnp.float32)
    st = pi.ImuState(R=jnp.eye(3), v=jnp.zeros(3), p=jnp.zeros(3),
                     bg=jnp.zeros(3), ba=jnp.zeros(3))
    out = pi.velocity_bias_update(st, pre, pose_prev, pose_new, cfg)
    np.testing.assert_allclose(np.asarray(out.v), v0, atol=2e-2)


def test_imu_to_lidar_extrinsics():
    """Rotating rates by the extrinsic must match R @ v per sample."""
    cfg = ImuConfig()
    R = np.asarray(cfg.extrinsic_rot)
    g = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    a = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    g2, a2 = pi.imu_to_lidar(jnp.asarray(g), jnp.asarray(a), cfg)
    np.testing.assert_allclose(np.asarray(g2), g @ R.T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), a @ R.T, atol=1e-6)


@pytest.mark.slow
def test_closed_form_bias_refresh_vs_batch_solve():
    """Quantify the documented iSAM2 deviation (VERDICT round-1 item 10):
    on a long noisy run with a constant true gyro bias, the per-window
    closed-form refresh (pipeline/lio.py) must converge to the same bias a
    BATCH preintegration-factor least-squares solve recovers, and its
    remaining error must be within 2x of the batch optimum."""
    from lis_slam_tpu.utils import se3

    rng = np.random.default_rng(4)
    # anchor sigma = the 0.002 rad noise actually injected below: the
    # whitened MAP update is given the TRUE measurement covariances
    cfg = ImuConfig(use_imu=True, pose_anchor_rot_sigma=0.002)
    bg_true = np.array([0.02, -0.015, 0.01])
    n_windows = 200
    hz, per_win = 100.0, 10

    # trajectory: smooth varying angular velocity + accelerations
    def omega(t):
        return np.array([0.3 * np.sin(0.5 * t), 0.2 * np.cos(0.3 * t),
                         0.4 * np.sin(0.2 * t + 1.0)])

    R = np.eye(3)
    t_abs = 0.0
    Rs = [R.copy()]
    win_data = []
    for w in range(n_windows):
        times, gyros, accels = [], [], []
        for k in range(per_win + 1):
            times.append(t_abs + k / hz)
            wv = omega(t_abs + k / hz)
            gyros.append(wv + bg_true + rng.normal(0, 1e-3, 3))
            accels.append(np.array([0, 0, 9.80511]) + rng.normal(0, 1e-2, 3))
        # integrate true rotation over the window
        Rw = R.copy()
        for k in range(1, per_win + 1):
            Rw = Rw @ Rotation.from_rotvec(
                omega(times[k - 1]) / hz).as_matrix()
        R = Rw
        t_abs += per_win / hz
        Rs.append(R.copy())
        win_data.append((np.asarray(times), np.asarray(gyros),
                         np.asarray(accels)))

    # noisy "lidar" orientations (0.002 rad)
    Rs_meas = [
        Rot.as_matrix() for Rot in
        (Rotation.from_matrix(Rm) * Rotation.from_rotvec(
            rng.normal(0, 0.002, 3)) for Rm in Rs)
    ]

    # ---- preintegrate all windows at zero bias ----
    pres = []
    for (times, gyros, accels) in win_data:
        pres.append(pi.preintegrate(
            jnp.asarray(times, jnp.float32), jnp.asarray(gyros, jnp.float32),
            jnp.asarray(accels, jnp.float32), jnp.ones(len(times), bool),
            jnp.zeros(3), jnp.zeros(3), cfg))

    # ---- batch LSQ for the (constant) gyro bias over ALL windows ----
    JT_J = np.zeros((3, 3))
    JT_r = np.zeros(3)
    for w, pre in enumerate(pres):
        dR_obs = Rs_meas[w].T @ Rs_meas[w + 1]
        res = np.asarray(se3.so3_log(jnp.asarray(
            np.asarray(pre.delta_R).T @ dR_obs, dtype=jnp.float32)))
        J = np.asarray(pre.dR_dbg)  # d(log residual)/d(bias), first order
        JT_J += J.T @ J
        JT_r += J.T @ res
    bg_batch = np.linalg.solve(JT_J + 1e-9 * np.eye(3), JT_r)

    # ---- closed-form per-window refresh (the production path) ----
    state = pi.ImuState(R=jnp.asarray(Rs_meas[0], jnp.float32),
                        v=jnp.zeros(3), p=jnp.zeros(3),
                        bg=jnp.zeros(3), ba=jnp.zeros(3))
    for w, pre in enumerate(pres):
        # re-preintegrate at the current bias estimate (what LIO does)
        times, gyros, accels = win_data[w]
        pre_b = pi.preintegrate(
            jnp.asarray(times, jnp.float32), jnp.asarray(gyros, jnp.float32),
            jnp.asarray(accels, jnp.float32), jnp.ones(len(times), bool),
            state.bg, state.ba, cfg)
        pose_prev = np.concatenate([
            Rotation.from_matrix(Rs_meas[w]).as_euler("xyz"), np.zeros(3)])
        pose_new = np.concatenate([
            Rotation.from_matrix(Rs_meas[w + 1]).as_euler("xyz"), np.zeros(3)])
        state = pi.velocity_bias_update(
            state, pre_b, jnp.asarray(pose_prev, jnp.float32),
            jnp.asarray(pose_new, jnp.float32), cfg)
    bg_closed = np.asarray(state.bg)

    err_batch = np.linalg.norm(bg_batch - bg_true)
    err_closed = np.linalg.norm(bg_closed - bg_true)
    # batch solve must itself be good (sanity of the harness)
    assert err_batch < 0.004, f"batch bias err {err_batch:.4f}"
    # closed-form refresh converges to the same answer, bounded deviation
    assert err_closed < 2.0 * err_batch + 0.004, (
        f"closed-form {bg_closed} vs batch {bg_batch} vs true {bg_true}"
    )


def test_predict_path_imu_rate(window):
    """predict_path (the IMU-rate odometry/imu stream equivalent) must (a)
    end where predict(state, preintegrate(...)) ends at zero bias, and (b)
    emit a pose per sample with monotone elapsed propagation."""
    times, gyro, accel = window
    cfg = ImuConfig(use_imu=True)
    m = len(times)
    valid = jnp.ones(m, bool)
    rng = np.random.default_rng(7)
    R0 = Rotation.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
    state = pi.ImuState(
        R=jnp.asarray(R0, jnp.float32),
        v=jnp.asarray([0.4, -0.1, 0.0], jnp.float32),
        p=jnp.asarray([1.0, 2.0, 0.5], jnp.float32),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
    )
    Rs, vs, ps = pi.predict_path(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel), valid,
        state, cfg)
    assert Rs.shape == (m, 3, 3) and ps.shape == (m, 3)
    pre = pi.preintegrate(
        jnp.asarray(times), jnp.asarray(gyro), jnp.asarray(accel), valid,
        state.bg, state.ba, cfg)
    end = pi.predict(state, pre, cfg.gravity)
    np.testing.assert_allclose(np.asarray(Rs[-1]), np.asarray(end.R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ps[-1]), np.asarray(end.p),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(vs[-1]), np.asarray(end.v),
                               atol=1e-3)
    # first sample carries the initial state (dt forced to 0 there)
    np.testing.assert_allclose(np.asarray(Rs[0]), R0, atol=1e-5)


def test_lio_predict_imu_rate_api():
    """LioOdometry.predict_imu_rate: (M, 6) device poses, finite, starting
    at the current nav state."""
    import dataclasses

    from lis_slam_tpu.config import SlamConfig, SensorConfig
    from lis_slam_tpu.pipeline import lio as lio_mod

    base = SlamConfig()
    cfg = base.replace(
        sensor=SensorConfig(n_scan=16, horizon_scan=360, downsample_rate=1,
                            max_raw_points=16 * 360),
        imu=dataclasses.replace(base.imu, use_imu=True),
    )
    sys_ = lio_mod.LioOdometry(cfg)
    t = np.arange(12, dtype=np.float32) * 0.01
    g = np.tile(np.array([[0.0, 0.0, 0.3]], np.float32), (12, 1))
    a = np.tile(np.array([[0.0, 0.0, 9.80511]], np.float32), (12, 1))
    poses = np.asarray(sys_.predict_imu_rate(t, g, a))
    assert poses.shape == (12, 6)
    assert np.all(np.isfinite(poses))
    np.testing.assert_allclose(poses[0], np.zeros(6), atol=1e-5)
    # yaw integrates the gyro (extrinsic rotation is ~identity for KITTI)
    assert poses[-1][2] > 0.02
