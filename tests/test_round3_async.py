"""Round-3 regression tests: LM pose-graph solver, GPS fix queueing,
payload-carrying voxel ops, stacked submap merge, deferred (async) drain
structure of the SLAM pipeline."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import GraphConfig, SubMapConfig
from lis_slam_tpu.graph import pose_graph as pg
from lis_slam_tpu.mapping import submap as sm
from lis_slam_tpu.ops import voxel


def _yawT(th, t):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(th), np.sin(th)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = t
    return T


def test_lm_converges_where_gn_oscillated():
    """Round-3 GPS regression: strong position-only priors conflicting with
    a drifted odometry chain made fixed-damping GN oscillate (errors GREW
    with iteration count). LM must be monotone: more iterations => node
    positions at least as close to the priors."""
    cfg = dataclasses.replace(
        GraphConfig(), odom_rot_sigma=1e-2, odom_trans_sigma=1e-1)
    true = [_yawT(0.4 * k, [10 * np.sin(0.4 * k),
                            10 * (1 - np.cos(0.4 * k)), 0]) for k in range(5)]
    drift = [_yawT(0.05 * k, [0, 0, 0]) @ true[k] for k in range(5)]

    def solve(iters):
        gb = pg.GraphBuilder(cfg, 16, 64, 32)
        for k in range(5):
            gb.add_node(drift[k])
            if k:
                gb.add_odom_edge(
                    k - 1, k, np.linalg.inv(drift[k - 1]) @ drift[k])
            gb.add_gps_prior(k, true[k], np.full(3, 0.1))
        opt = gb.optimize(iterations=iters)
        return np.mean([np.linalg.norm(opt[k][:3, 3] - true[k][:3, 3])
                        for k in range(5)])

    e20, e100 = solve(20), solve(100)
    assert e100 <= e20 + 1e-4, f"not monotone: {e20:.4f} -> {e100:.4f}"
    assert e100 < 0.35, f"LM failed to approach GPS priors: {e100:.3f}"


def test_graph_bucket_padding_matches_full_padding():
    """Power-of-two node padding must not change the solution."""
    cfg = GraphConfig()

    def build(max_nodes):
        rng = np.random.default_rng(3)
        gb = pg.GraphBuilder(cfg, max_nodes, 64, 32)
        prev = np.eye(4, dtype=np.float32)
        for k in range(6):
            T = _yawT(0.2 * k, [2.0 * k, 0.1 * k, 0])
            gb.add_node(T)
            if k:
                z = np.linalg.inv(prev) @ T
                # perturb the measurement so the solve is nontrivial
                z = z @ _yawT(0.01 * rng.standard_normal(), [0.02, 0, 0])
                gb.add_odom_edge(k - 1, k, z)
            prev = T
        return gb.optimize()

    a = build(8)     # bucket == 8 (snug)
    b = build(256)   # bucket still 8 via power-of-two, but cap plumbed
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_voxel_downsample_payloads_aligned():
    """Payload columns must come out aligned with their representative
    points (riding the same sorting networks)."""
    rng = np.random.default_rng(0)
    n = 500
    pts = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    w = np.arange(n, dtype=np.float32)
    mask = np.ones(n, bool)
    out, om, k, ow = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 512,
        payloads=(jnp.asarray(w),))
    out, om, ow = np.asarray(out), np.asarray(om), np.asarray(ow)
    # every kept point must be an original point and carry ITS payload
    for i in np.nonzero(om)[0][:50]:
        j = int(np.argmin(np.linalg.norm(pts - out[i], axis=1)))
        assert np.linalg.norm(pts[j] - out[i]) < 1e-6
        assert ow[i] == w[j]


def test_voxel_merge_aged_flag_rides_sort():
    """The dynamic-class flag payload must follow its point through the
    aged merge (fold-the-dyn-map-into-surf change)."""
    new_pts = jnp.asarray([[0.0, 0, 0], [5, 0, 0], [0, 5, 0]])
    new_mask = jnp.ones(3, bool)
    new_flag = jnp.asarray([True, False, True])
    C = 16
    map_pts = jnp.zeros((C, 3))
    map_age = jnp.full((C,), -(10**9), jnp.int32)
    map_mask = jnp.zeros(C, bool)
    map_flag = jnp.zeros(C, bool)
    pts, age, mask, flag = voxel.voxel_merge_aged(
        new_pts, new_mask, map_pts, map_age, map_mask,
        jnp.int32(0), 10, 0.5, C, new_flag=new_flag, map_flag=map_flag)
    pts, mask, flag = np.asarray(pts), np.asarray(mask), np.asarray(flag)
    got = {}
    for i in np.nonzero(mask)[0]:
        got[tuple(np.round(pts[i]).astype(int))] = bool(flag[i])
    assert got == {(0, 0, 0): True, (5, 0, 0): False, (0, 5, 0): True}


def test_voxel_merge_aged_anchor_semantics():
    """Re-observing a voxel: "first" keeps the anchored map position and
    refreshes only the age; "newest" replaces the position. The flag
    payload follows the anchored point in both modes."""
    C = 16
    map_pts = jnp.zeros((C, 3)).at[0].set(jnp.asarray([1.0, 0.0, 0.0]))
    map_age = jnp.full((C,), -(10**9), jnp.int32).at[0].set(3)
    map_mask = jnp.zeros(C, bool).at[0].set(True)
    # new observation of the SAME voxel (leaf 2.0), offset position
    new_pts = jnp.asarray([[1.3, 0.2, 0.0]])
    for anchor, want_x, want_flag in (("first", 1.0, False),
                                      ("newest", 1.3, True)):
        pts, age, mask, flag = voxel.voxel_merge_aged(
            new_pts, jnp.ones(1, bool), map_pts, map_age, map_mask,
            jnp.int32(7), 10, 2.0, C, anchor=anchor,
            new_flag=jnp.ones(1, bool), map_flag=jnp.zeros(C, bool))
        i = int(np.nonzero(np.asarray(mask))[0][0])
        assert int(np.sum(np.asarray(mask))) == 1
        assert abs(float(pts[i, 0]) - want_x) < 1e-6, anchor
        assert int(age[i]) == 7, f"{anchor}: age must refresh"
        assert bool(flag[i]) == want_flag, anchor


def _mk_kf(i, x, rng):
    pose = np.eye(4)
    pose[0, 3] = x
    pts = rng.uniform(-5, 5, (128, 3)).astype(np.float32)
    cls = rng.uniform(-5, 5, (5, 16, 3)).astype(np.float32)
    return sm.Keyframe(
        index=i, pose_init=pose, pose_opt=pose.copy(),
        clouds=sm.ClassClouds(xyz=jnp.asarray(cls),
                              mask=jnp.ones((5, 16), bool)),
        corner_xyz=jnp.asarray(pts[:32]), corner_mask=jnp.ones(32, bool),
        surf_xyz=jnp.asarray(pts), surf_mask=jnp.ones(128, bool),
    )


def test_stacked_submap_merge_world_frame_and_classes():
    """The one-program stacked merge must place member clouds at their
    keyframe poses (world frame) and fill per-class submap clouds."""
    cfg = SubMapConfig(frames_size=3, translation_max=1e9, yaw_max=1e9)
    coll = sm.SubMapCollector(cfg)
    coll.merge_classes = True
    rng = np.random.default_rng(7)
    finished = None
    for i in range(4):
        res = coll.add_keyframe(_mk_kf(i, 10.0 * i, rng))
        finished = res or finished
    assert finished is not None
    surf = np.asarray(finished.surf_xyz)[np.asarray(finished.surf_mask)]
    # keyframe 3 sits at x=30: its points must appear near there
    assert surf[:, 0].max() > 24.0
    assert finished.class_xyz is not None
    assert bool(np.asarray(finished.class_mask).any())
    # bbox is device-deferred; get_bbox materializes
    assert finished.bbox is None
    bb = finished.get_bbox()
    assert bb is not None and bb.shape == (2, 3)
    assert bb[1][0] > 24.0


def test_submap_bucket_padding_compiles_small():
    """A 2-member close must pad to the 4-bucket, not frames_size+1."""
    cfg = SubMapConfig(frames_size=20, translation_max=1e9, yaw_max=1e9)
    coll = sm.SubMapCollector(cfg)
    rng = np.random.default_rng(1)
    for i in range(2):
        coll.add_keyframe(_mk_kf(i, float(i), rng))
    tail = coll.flush()
    assert tail is not None and len(tail.kf_indices) == 2
    assert int(np.asarray(tail.surf_mask).sum()) > 0


def test_gps_fix_in_open_submap_waits_not_dropped():
    """A fix timestamped inside the current (un-cut) submap must stay
    queued until that submap closes — round 3 found these silently
    dropped (5 of 12 fixes in the GPS drift test)."""
    from lis_slam_tpu.pipeline import slam as slam_mod
    from tests.test_slam_pipeline import tiny_cfg

    cfg = tiny_cfg()
    system = slam_mod.SemanticSlam(cfg)

    # fabricate keyframes/submaps directly (no device replay needed)
    def add_kf(i, t, with_submap):
        T = np.eye(4)
        T[0, 3] = i * 1.0
        kf = sm.Keyframe(
            index=i, pose_init=T, pose_opt=T.copy(), timestamp=t,
            clouds=sm.ClassClouds(jnp.zeros((5, 4, 3)),
                                  jnp.zeros((5, 4), bool)),
            corner_xyz=jnp.zeros((8, 3)), corner_mask=jnp.zeros(8, bool),
            surf_xyz=jnp.zeros((8, 3)), surf_mask=jnp.zeros(8, bool),
            submap_id=0 if with_submap else -1,
        )
        system.keyframes.append(kf)
        return kf

    k0 = add_kf(0, 0.0, True)
    k1 = add_kf(1, 0.5, True)
    sub = sm.SubMap(
        index=0, pose_init=np.eye(4), pose_opt=np.eye(4),
        corner_xyz=jnp.zeros((8, 3)), corner_mask=jnp.zeros(8, bool),
        surf_xyz=jnp.zeros((8, 3)), surf_mask=jnp.zeros(8, bool),
        kf_indices=[0, 1], kf_rel_poses=[np.eye(4), k1.pose_init],
    )
    system.collector.submaps.append(sub)
    system.graph.add_node(np.eye(4))
    # keyframe at t=2.0 exists but is NOT in any submap yet
    add_kf(2, 2.0, False)

    ok = system.add_gps(np.array([2.0, 0, 0]), np.full(3, 0.01),
                        timestamp=2.0)
    assert ok
    assert system._gps_dropped == 0
    assert len(system._gps_queue) == 1  # waiting for the open submap
    # a fix matching the CLOSED submap attaches immediately
    system.add_gps(np.array([0.5, 0, 0]), np.full(3, 0.01), timestamp=0.5)
    assert len(system.graph.priors) >= 2  # anchor + attached fix
    assert system._gps_dropped == 0
