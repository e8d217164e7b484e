"""Round-5 feature tests: keyframe cloud eviction, incremental GPS index,
advisor fixes (pad_scan accel neutrality, clamped bias-update marginals,
inert-LIO diagnostics), and the delayed drain readback."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import ImuConfig, SlamConfig
from lis_slam_tpu.imu import preintegration as pi
from lis_slam_tpu.mapping import submap as sm
from lis_slam_tpu.pipeline import driver, slam

from test_slam_pipeline import tiny_cfg


# ---------------------------------------------------------------------------
# advisor fix: pad_scan IMU accel neutrality (driver.py)
# ---------------------------------------------------------------------------


def test_pad_scan_gyro_only_accel_is_gravity_neutral():
    """A gyro-only pad_scan window must carry gravity-neutral accel rows,
    not zeros (zeros preintegrate free fall: ~g*dt velocity bias/window)."""
    cfg = SlamConfig()
    pts = np.zeros((10, 4), np.float32)
    it = np.arange(8, dtype=np.float32) * 0.01
    ig = np.full((8, 3), 0.1, np.float32)
    sin = driver.pad_scan(pts, cfg, imu_time=it, imu_gyro=ig)
    ia = np.asarray(sin.imu_accel)
    assert np.allclose(ia[:8, 2], cfg.imu.gravity)
    assert np.allclose(ia[:8, :2], 0.0)
    # consistency with pad_imu_window (the two entry points must agree)
    _t, _g, ia2, _v = driver.pad_imu_window(cfg, it, ig, None)
    assert np.allclose(ia, ia2)


def test_pad_scan_routes_explicit_accel():
    cfg = SlamConfig()
    pts = np.zeros((10, 4), np.float32)
    it = np.arange(4, dtype=np.float32) * 0.01
    ig = np.zeros((4, 3), np.float32)
    ia = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (4, 1))
    sin = driver.pad_scan(pts, cfg, imu_time=it, imu_gyro=ig, imu_accel=ia)
    assert np.allclose(np.asarray(sin.imu_accel)[:4], ia)
    # padded rows stay gravity-neutral
    assert np.allclose(np.asarray(sin.imu_accel)[4:, 2], cfg.imu.gravity)


# ---------------------------------------------------------------------------
# advisor fix: clamped bias updates must not contract the marginal
# ---------------------------------------------------------------------------


def _make_pre(cfg_imu, gyro=0.0, accel_z=None, n=12):
    t = jnp.arange(n, dtype=jnp.float32) * 0.01
    g = jnp.full((n, 3), gyro, jnp.float32)
    az = cfg_imu.gravity if accel_z is None else accel_z
    a = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(az)
    v = jnp.ones(n, bool)
    return pi.preintegrate(t, g, a, v, jnp.zeros(3), jnp.zeros(3), cfg_imu)


def test_clamped_two_window_update_keeps_prior_marginal():
    """When the MAP step saturates the final-safety clamps, P_bias must NOT
    contract as if the full step was applied (overconfident prior)."""
    cfg_imu = ImuConfig(use_imu=True)
    pre = _make_pre(cfg_imu)
    state = pi.init_imu_state(cfg_imu)
    # absurd pose jump -> huge position residual -> clamped dba
    pose0 = jnp.zeros(6)
    pose1 = jnp.zeros(6).at[3].set(50.0)
    pose2 = jnp.zeros(6).at[3].set(200.0)
    new, _v1 = pi.velocity_bias_update2(
        state, pre, pre, pose0, pose1, pose2, jnp.zeros(3), cfg_imu)
    # the step clamped (|dba| at the 0.2 bound)
    assert float(jnp.max(jnp.abs(new.ba))) >= 0.2 - 1e-6
    # marginal did not contract below the random-walk-inflated prior
    assert float(jnp.trace(new.P_bias)) >= float(
        jnp.trace(state.P_bias)) * 0.999

    # nominal case: consistent poses -> unclamped -> marginal contracts
    dp = np.asarray(pre.delta_p)
    g = np.array([0, 0, -cfg_imu.gravity])
    dt = float(pre.delta_t)
    p1 = dp + 0.5 * g * dt * dt
    p2 = p1 + np.asarray(pre.delta_v) * dt + dp + 1.5 * g * dt * dt
    nom, _ = pi.velocity_bias_update2(
        state, pre, pre, jnp.zeros(6),
        jnp.concatenate([jnp.zeros(3), jnp.asarray(p1, jnp.float32)]),
        jnp.concatenate([jnp.zeros(3), jnp.asarray(p2, jnp.float32)]),
        jnp.zeros(3), cfg_imu)
    assert float(jnp.max(jnp.abs(nom.ba))) < 0.2 - 1e-6
    assert float(jnp.trace(nom.P_bias)) < float(jnp.trace(state.P_bias))


# ---------------------------------------------------------------------------
# keyframe cloud eviction at submap close (endurance policy)
# ---------------------------------------------------------------------------


def _fab_kf(i, t=0.0):
    T = np.eye(4)
    T[0, 3] = i * 1.0
    return sm.Keyframe(
        index=i, pose_init=T, pose_opt=T.copy(), timestamp=t,
        clouds=sm.ClassClouds(jnp.zeros((5, 4, 3)), jnp.zeros((5, 4), bool)),
        corner_xyz=jnp.zeros((8, 3)), corner_mask=jnp.zeros(8, bool),
        surf_xyz=jnp.zeros((8, 3)), surf_mask=jnp.zeros(8, bool),
    )


def _close_submaps(system, n_submaps, kf_per=3):
    """Drive keyframes through the collector + _on_submap like _on_keyframe
    does, cutting a submap every kf_per keyframes."""
    cfg_sub = system.cfg.submap
    idx = len(system.keyframes)
    for s in range(n_submaps):
        for k in range(kf_per):
            kf = _fab_kf(idx, t=idx * 0.1)
            system.keyframes.append(kf)
            system.collector._cur_kfs.append(kf)
            idx += 1
        finished = system.collector._finish()
        system._on_submap(finished)


def test_keyframe_clouds_released_after_submap_close():
    cfg = tiny_cfg()
    assert cfg.submap.release_after_submaps == 2
    system = slam.SemanticSlam(cfg)
    _close_submaps(system, 4)
    # submaps 0 and 1 are > 2 closes old -> their keyframes released;
    # submaps 2, 3 retained
    for s_idx, s in enumerate(system.collector.submaps):
        for k in s.kf_indices:
            kf = system.keyframes[k]
            if s_idx < 2:
                assert kf.released and kf.surf_xyz is None \
                    and kf.clouds is None
            else:
                assert not kf.released and kf.surf_xyz is not None
    # poses/timestamps survive eviction (loop gating + GPS index need them)
    assert system.keyframes[0].pose_init[0, 3] == 0.0
    assert system.keyframes[0].timestamp == 0.0


def test_release_disabled_when_zero():
    cfg = tiny_cfg().replace(submap=dataclasses.replace(
        tiny_cfg().submap, release_after_submaps=0))
    system = slam.SemanticSlam(cfg)
    _close_submaps(system, 4)
    assert all(not kf.released for kf in system.keyframes)


def test_gps_index_is_incremental():
    """The keyframe-timestamp index extends per close instead of a full
    rebuild per call (round-4 O(N^2) host bookkeeping)."""
    cfg = tiny_cfg()
    system = slam.SemanticSlam(cfg)
    _close_submaps(system, 2)
    assert system._indexed_submaps == 2
    n0 = len(system._kf_time_index)
    assert n0 == sum(len(s.kf_indices) for s in system.collector.submaps)
    # a fix matching a closed keyframe attaches through the index
    ok = system.add_gps(np.array([1.0, 0, 0]), np.full(3, 0.01),
                        timestamp=0.1)
    assert ok and len(system.graph.priors) >= 1
    _close_submaps(system, 1)
    assert system._indexed_submaps == 3
    assert len(system._kf_time_index) > n0


# ---------------------------------------------------------------------------
# inert-LIO diagnostic (advisor medium finding)
# ---------------------------------------------------------------------------


def _fab_stepout(win_empty):
    z6 = jnp.zeros(6)
    f = jnp.bool_(False)
    z = jnp.zeros(1)
    return slam.StepOut(
        pose=z6, refined=z6, is_keyframe=f, converged=jnp.bool_(True),
        degenerate=f, imu_fail=f, imu_win_empty=jnp.bool_(win_empty),
        corner_xyz=z, corner_mask=z, surf_xyz=z, surf_mask=z,
        surf_intensity=z, sharp_corner_xyz=z, sharp_corner_mask=z,
        sharp_surf_xyz=z, sharp_surf_mask=z, lab_surf=z, class_xyz=z,
        class_mask=z, class_w=z, desc_sel=z, signature=z)


def test_inert_imu_window_warns():
    """IMU supplied but the clipped preintegration window empty on 3+
    consecutive scans -> RuntimeWarning (clock-mismatch diagnostic)."""
    cfg = tiny_cfg().replace(
        imu=dataclasses.replace(ImuConfig(), use_imu=True))
    system = slam.SemanticSlam(cfg)
    for i in range(1, 4):
        system._pending.append(
            slam._PendingScan(i, i * 0.1, _fab_stepout(True), True))
    with pytest.warns(RuntimeWarning, match="clipped empty"):
        system._drain()
        system.flush_pipeline()
    # healthy windows reset the counter and stay silent
    system2 = slam.SemanticSlam(cfg)
    import warnings

    for i in range(1, 4):
        system2._pending.append(
            slam._PendingScan(i, i * 0.1, _fab_stepout(False), True))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        system2._drain()
        system2.flush_pipeline()


# ---------------------------------------------------------------------------
# per-point stage-3 semantic weights (VERDICT r4 weak #7 / next #5)
# ---------------------------------------------------------------------------


def test_class_merge_threads_per_point_weights():
    """_merge_stacked_classes must carry each point's residual weight
    through the voxel merge (payload lane): every merged point's weight
    equals the weight its source point carried."""
    rng = np.random.default_rng(3)
    K, Q, C = 2, 64, 256
    xyz = rng.uniform(-20, 20, (K, 5, Q, 3)).astype(np.float32)
    mask = rng.uniform(size=(K, 5, Q)) < 0.8
    # weight = deterministic function of the coordinates so the check is
    # order-independent
    wf = lambda p: 0.5 + (np.abs(p[..., 0]) % 1.3)
    w = wf(xyz).astype(np.float32)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4))
    out, om, ow = sm._merge_stacked_classes(
        jnp.asarray(poses), jnp.asarray(xyz), jnp.asarray(mask),
        jnp.asarray(w), 0.01, C)
    out, om, ow = np.asarray(out), np.asarray(om), np.asarray(ow)
    assert om.any()
    np.testing.assert_allclose(ow[om], wf(out[om]), atol=1e-5)


@pytest.mark.slow
def test_stage3_per_point_weights_match_replica():
    """End-to-end stage 3: _register_submaps_sem consuming MERGED class
    clouds with heterogeneous per-point weights must agree with
    replica.scan_to_submap_semantic on the same weighted points
    (subMapOptmizationNode.cpp:4556-4966 — per-point w, not category
    means)."""
    from lis_slam_tpu.golden import replica
    from lis_slam_tpu.pipeline import slam as slam_mod
    from lis_slam_tpu.config import SlamConfig
    from test_golden_replica import _structured_scene

    rng = np.random.default_rng(21)
    map_c, map_s = _structured_scene(rng)
    true_pose = np.array([0.003, -0.004, 0.018, 0.25, -0.15, 0.04])
    Ti = np.linalg.inv(replica.pose_to_matrix(true_pose))
    cur_c = replica.transform_points(Ti, map_c[rng.choice(
        len(map_c), 250, replace=False)])
    cur_s = replica.transform_points(Ti, map_s[rng.choice(
        len(map_s), 1200, replace=False)])
    wf = lambda p: (0.6 + (np.abs(p[:, 0] + p[:, 1]) % 0.9)).astype(
        np.float32)

    cfg = SlamConfig()
    import dataclasses as _dc

    # tiny source leaves: the in-register voxel downsample must be a
    # no-op (modulo order) so the replica sees the identical point set
    cfg = cfg.replace(
        submap=_dc.replace(cfg.submap, refine_surf_leaf=0.01,
                           keyframe_class_capacity=2048,
                           class_capacity=8192),
        voxel=_dc.replace(cfg.voxel, submap_corner_leaf=0.01),
        sensor=_dc.replace(cfg.sensor, max_raw_points=4096),
    )

    # keyframe class clouds: split cur clouds over two keyframes, weights
    # per point; merge via the real submap path
    def kf_cls(pts_c, pts_s):
        Q = cfg.submap.keyframe_class_capacity
        xyz = np.zeros((5, Q, 3), np.float32)
        msk = np.zeros((5, Q), bool)
        w = np.ones((5, Q), np.float32)
        for cat, pts in ((slam_mod._POLE, pts_c), (slam_mod._GND, pts_s)):
            n = min(len(pts), Q)
            xyz[cat, :n] = pts[:n]
            msk[cat, :n] = True
            w[cat, :n] = wf(pts[:n])
        return xyz, msk, w

    h1 = kf_cls(cur_c[::2], cur_s[::2])
    h2 = kf_cls(cur_c[1::2], cur_s[1::2])
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4))
    mx, mm, mw = sm._merge_stacked_classes(
        jnp.asarray(poses),
        jnp.asarray(np.stack([h1[0], h2[0]])),
        jnp.asarray(np.stack([h1[1], h2[1]])),
        jnp.asarray(np.stack([h1[2], h2[2]])),
        0.01, cfg.submap.class_capacity)

    # previous (target) submap = the world-frame map clouds
    C = cfg.submap.class_capacity
    pxyz = np.zeros((5, C, 3), np.float32)
    pmsk = np.zeros((5, C), bool)
    pxyz[slam_mod._POLE, : len(map_c)] = map_c
    pmsk[slam_mod._POLE, : len(map_c)] = True
    pxyz[slam_mod._GND, : len(map_s)] = map_s
    pmsk[slam_mod._GND, : len(map_s)] = True

    lo = jnp.asarray(np.full(3, -100.0), jnp.float32)
    hi = jnp.asarray(np.full(3, 100.0), jnp.float32)
    T_ref = slam_mod._register_submaps_sem(
        jnp.asarray(pxyz), jnp.asarray(pmsk), mx, mm, mw,
        jnp.asarray(np.eye(4, dtype=np.float32)), lo, hi, cfg)
    tpu_pose = np.asarray(
        replica.matrix_to_pose(np.asarray(T_ref, np.float64)))

    rep_pose = replica.scan_to_submap_semantic(
        np.zeros(6), cur_c, wf(cur_c), cur_s, wf(cur_s), map_c, map_s,
        cfg, max_iter=cfg.matching.max_iterations_submap2submap)

    np.testing.assert_allclose(rep_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, rep_pose, atol=1e-2)
