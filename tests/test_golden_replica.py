"""Golden validation vs the numpy reference replica (SURVEY §7 hard part 4).

The replica (`lis_slam_tpu.golden.replica`) reimplements the reference
front-end's exact math — first-wins projection, greedy feature selection
with the reference's quirks, camera-convention LM Jacobian, iterCount==0
degeneracy projection, PCL-centroid voxel maps — in plain numpy/scipy.
These tests pin the TPU pipeline to it, the honest stand-in for the
"ATE within 1% of the C++ reference on KITTI 00/05" north star while this
environment has no KITTI data.
"""

import numpy as np
import pytest

from lis_slam_tpu.config import SlamConfig, SensorConfig
from lis_slam_tpu.golden import replica
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.pipeline import driver, trajectory


@pytest.fixture(scope="module")
def hdl64_cfg():
    return SlamConfig().replace(sensor=SensorConfig(max_raw_points=64 * 1800))


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(seed=5)


def test_replica_se3_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pose = rng.uniform(-1, 1, 6)
        T = replica.pose_to_matrix(pose)
        back = replica.matrix_to_pose(T)
        np.testing.assert_allclose(back, pose, atol=1e-9)


def test_replica_matches_repo_se3(hdl64_cfg):
    """The replica's pcl::getTransformation convention must equal the
    pipeline's se3.pose_to_matrix (both claim Rz Ry Rx)."""
    from lis_slam_tpu.utils import se3

    rng = np.random.default_rng(1)
    pose = rng.uniform(-1, 1, 6)
    np.testing.assert_allclose(
        np.asarray(se3.pose_to_matrix(pose.astype(np.float32))),
        replica.pose_to_matrix(pose),
        atol=1e-5,
    )


def test_replica_camera_jacobian_descends():
    """lm_step's camera-convention update must reduce the point-to-plane
    objective it linearizes (sanity on the axis permutation)."""
    rng = np.random.default_rng(2)
    # enough correspondences that H's translation-block eigenvalues (~n/3)
    # clear the reference's degeneracy threshold of 100
    n = 2000
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pts = rng.uniform(-10, 10, (n, 3))
    true_pose = np.array([0.01, -0.02, 0.03, 0.1, -0.2, 0.05])
    T = replica.pose_to_matrix(true_pose)
    # planes passing through the transformed points: residual at true pose = 0
    d = -np.einsum("ij,ij->i", normals, replica.transform_points(T, pts))

    def objective(pose):
        w = replica.transform_points(replica.pose_to_matrix(pose), pts)
        return np.sum((np.einsum("ij,ij->i", normals, w) + d) ** 2)

    pose = np.zeros(6)
    state = {"degenerate": False, "matP": np.eye(6), "deltaR": 1e9, "deltaT": 1e9}
    for it in range(8):
        w = replica.transform_points(replica.pose_to_matrix(pose), pts)
        res = np.einsum("ij,ij->i", normals, w) + d
        pose, conv = replica.lm_step(pose, pts, normals, res, it, state, SlamConfig())
        if conv:
            break
    assert objective(pose) < 1e-4 * objective(np.zeros(6))
    np.testing.assert_allclose(pose, true_pose, atol=5e-3)


@pytest.mark.slow  # compiles the greedy per-sector replica (~90 s on the CPU harness)
def test_replica_features_agree_with_greedy_path(hdl64_cfg, world):
    """Replica greedy corners vs the pipeline's greedy=True selection on the
    same scan: the two faithful implementations must pick essentially the
    same corner set (tie-order differences only)."""
    import jax.numpy as jnp

    from lis_slam_tpu.ops import features as feat_ops
    from lis_slam_tpu.ops import pretreatment, projection

    gt = synthetic.circular_trajectory(2, radius=60.0, speed=8.0)
    scan = synthetic.render_scan(world, gt[0], None, seed=77, noise=0.01)
    cfg = hdl64_cfg

    ext = replica.project_and_extract(
        scan.points[:, :3].astype(np.float64), scan.valid, cfg)
    corner_np, surf_np = replica.extract_features(ext, cfg)

    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), cfg.sensor)
    _img, extj = projection.project_and_extract(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time,
        pre.valid, cfg.sensor, want_image=False)
    fc = feat_ops.extract_features(extj, cfg.feature, greedy=True)
    corner_j = np.asarray(fc.corner_xyz)[np.asarray(fc.corner_mask)]

    # counts in the same ballpark and >70% of replica corners matched by a
    # greedy-path corner within 3 cm (projection winner ties + float32 move
    # individual picks around)
    assert len(corner_np) > 50
    assert 0.5 < len(corner_j) / max(len(corner_np), 1) < 2.0
    from scipy.spatial import cKDTree

    d, _ = cKDTree(corner_j).query(corner_np, k=1)
    assert (d < 0.03).mean() > 0.7, f"corner overlap {(d < 0.03).mean():.2f}"


@pytest.mark.slow
def test_pipeline_within_1pct_ate_of_replica(hdl64_cfg, world):
    """North-star stand-in: TPU pipeline trajectory vs the reference-replica
    trajectory must stay within 1% of distance travelled."""
    n = 30
    cfg = hdl64_cfg
    gt = synthetic.circular_trajectory(n + 1, radius=60.0, speed=8.0)
    scans = [
        synthetic.render_scan(world, gt[i], None, seed=50 + i, noise=0.01)
        for i in range(n)
    ]
    odo = replica.ReferenceReplicaOdometry(cfg)
    rep = np.stack([
        odo.process(s.points[:, :3].astype(np.float64), s.valid)
        for s in scans
    ])
    res = driver.replay_odometry(scans, cfg)
    tpu = np.asarray(res.poses)

    gt_rel = trajectory.relative_to_first(gt[:n])
    travel = np.sum(np.linalg.norm(np.diff(gt_rel[:, 3:], axis=0), axis=1))
    div = trajectory.ate_rmse(tpu, rep, align=False)
    ate_tpu = trajectory.ate_rmse(tpu, gt_rel, align=False)
    ate_rep = trajectory.ate_rmse(rep, gt_rel, align=False)
    assert div < 0.01 * travel, (
        f"divergence {div:.3f} m > 1% of {travel:.1f} m "
        f"(ATE tpu {ate_tpu:.3f}, replica {ate_rep:.3f})"
    )
    # and the pipeline must be at least as accurate as the replica (+20%)
    assert ate_tpu < 1.2 * ate_rep + 0.02


# ---------------------------------------------------------------------------
# back-end golden pins (VERDICT round-2 missing #3): the semantic-weighted
# stage-1 refinement and the submap-to-submap registration solved by the TPU
# path must agree with the reference-math numpy replica on identical inputs.
# ---------------------------------------------------------------------------


def _structured_scene(rng, n_line_pts=600, n_plane_pts=4000):
    """World-frame map with line structure (poles) for the corner solver and
    plane structure (ground + walls) for the surf solver."""
    poles = []
    for _ in range(40):
        x, y = rng.uniform(-25, 25, 2)
        z = rng.uniform(0, 5, n_line_pts // 40)
        poles.append(np.stack([np.full_like(z, x) + rng.normal(0, 0.01, z.shape),
                               np.full_like(z, y) + rng.normal(0, 0.01, z.shape),
                               z], 1))
    corners = np.concatenate(poles).astype(np.float64)
    n3 = n_plane_pts // 3
    # density matters: the solver gates on the 5th-NN sq-dist < 1.0, so the
    # ground patch must keep 5-NN spacing well under 1 m
    ground = np.stack([rng.uniform(-14, 14, n3), rng.uniform(-14, 14, n3),
                       rng.normal(0, 0.01, n3)], 1)
    wall1 = np.stack([rng.uniform(-30, 30, n3),
                      np.full(n3, 12.0) + rng.normal(0, 0.01, n3),
                      rng.uniform(0, 6, n3)], 1)
    wall2 = np.stack([np.full(n3, -14.0) + rng.normal(0, 0.01, n3),
                      rng.uniform(-30, 30, n3), rng.uniform(0, 6, n3)], 1)
    surfs = np.concatenate([ground, wall1, wall2]).astype(np.float64)
    return corners, surfs


def _pad(arr, cap):
    import jax.numpy as jnp

    out = np.zeros((cap, arr.shape[1]), np.float32)
    out[: len(arr)] = arr
    return jnp.asarray(out), jnp.asarray(np.arange(cap) < len(arr))


@pytest.mark.slow
def test_backend_semantic_refine_matches_replica(hdl64_cfg):
    """Semantic-weighted scan-to-submap solve (scan2SubMapOptimization,
    subMapOptmizationNode.cpp:1509-1967): jitted solver vs numpy replica on
    identical weighted inputs — both must recover the true pose and agree."""
    import jax.numpy as jnp

    from lis_slam_tpu.ops import scan_match

    rng = np.random.default_rng(11)
    map_c, map_s = _structured_scene(rng)
    true_pose = np.array([0.004, -0.006, 0.02, 0.3, -0.2, 0.05])
    T = replica.pose_to_matrix(true_pose)
    Ti = np.linalg.inv(T)
    # current scan = subsample of the map pulled back into the sensor frame
    c_idx = rng.choice(len(map_c), 250, replace=False)
    s_idx = rng.choice(len(map_s), 1200, replace=False)
    cur_c = replica.transform_points(Ti, map_c[c_idx])
    cur_s = replica.transform_points(Ti, map_s[s_idx])
    w_c = rng.uniform(0.5, 1.5, len(cur_c))
    w_s = rng.uniform(0.5, 1.5, len(cur_s))

    cfg = hdl64_cfg
    pose0 = np.zeros(6)
    rep_pose = replica.scan_to_submap_semantic(
        pose0, cur_c, w_c, cur_s, w_s, map_c, map_s, cfg, max_iter=20)

    cj, cm = _pad(cur_c, 512)
    sj, sm = _pad(cur_s, 2048)
    mcj, mcm = _pad(map_c, 1024)
    msj, msm = _pad(map_s, 8192)
    wcj = jnp.zeros(512).at[: len(w_c)].set(jnp.asarray(w_c, jnp.float32))
    wsj = jnp.zeros(2048).at[: len(w_s)].set(jnp.asarray(w_s, jnp.float32))
    gn = scan_match.scan_to_map(
        jnp.zeros(6, jnp.float32), cj, cm, sj, sm, mcj, mcm, msj, msm,
        cfg.matching, 20, corner_sem_weight=wcj, surf_sem_weight=wsj)
    tpu_pose = np.asarray(gn.pose, np.float64)

    np.testing.assert_allclose(rep_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, rep_pose, atol=1e-2)


@pytest.mark.slow
def test_submap_registration_matches_replica(hdl64_cfg):
    """Submap-to-submap registration (subMap2SubMapOptimization,
    :4485-4540): jitted solver vs the 30-iteration replica."""
    import jax.numpy as jnp

    from lis_slam_tpu.ops import scan_match

    rng = np.random.default_rng(13)
    map_c, map_s = _structured_scene(rng)
    true_pose = np.array([0.002, 0.003, -0.015, -0.25, 0.15, 0.02])
    Ti = np.linalg.inv(replica.pose_to_matrix(true_pose))
    c_idx = rng.choice(len(map_c), 300, replace=False)
    s_idx = rng.choice(len(map_s), 1500, replace=False)
    cur_c = replica.transform_points(Ti, map_c[c_idx])
    cur_s = replica.transform_points(Ti, map_s[s_idx])

    cfg = hdl64_cfg
    rep_pose = replica.submap_to_submap(
        np.zeros(6), cur_c, cur_s, map_c, map_s, cfg, max_iter=30)

    cj, cm = _pad(cur_c, 512)
    sj, sm = _pad(cur_s, 2048)
    mcj, mcm = _pad(map_c, 1024)
    msj, msm = _pad(map_s, 8192)
    gn = scan_match.scan_to_map(
        jnp.zeros(6, jnp.float32), cj, cm, sj, sm, mcj, mcm, msj, msm,
        cfg.matching, cfg.matching.max_iterations_submap2submap)
    tpu_pose = np.asarray(gn.pose, np.float64)

    np.testing.assert_allclose(rep_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, true_pose, atol=8e-3)
    np.testing.assert_allclose(tpu_pose, rep_pose, atol=1e-2)


def test_pipeline_vs_replica_smoke_16beam():
    """Fast-tier variant of the north-star parity claim (VERDICT r4 next
    #4): the HDL-64 test above is the full claim but needs ~10 min of CPU
    compile, so the fast tier pins the SAME pipeline-vs-replica divergence
    bound on a 16-beam / 12-scan configuration that compiles in seconds.
    Uses match_source="full_ds" — the reference-faithful matched-cloud
    mode, i.e. exactly what the replica implements.

    Bound calibration: on SPARSE 16-beam scans the fp32-hash NN and the
    replica's float64 cKDTree pick measurably different 5-NN sets, which
    first-observation-anchored maps then freeze in — a CONSTANT ~0.11 m
    offset appears at the first solved scan and stays flat (measured;
    insensitive to nn_cache_k=12/tight refresh AND to greedy_selection,
    so it is correspondence noise, not an algorithmic gap — both
    trajectories' own gt-ATE is larger, ~0.16/0.18). The smoke therefore
    pins (a) an absolute divergence ceiling, (b) NON-ACCUMULATION per
    step, and (c) accuracy parity; the 1%-of-travel relative claim lives
    in the dense HDL-64 test above where correspondence noise is small."""
    import dataclasses

    import lis_slam_tpu.io.synthetic as syn
    from test_slam_pipeline import tiny_cfg, render_tiny

    cfg = tiny_cfg().replace(matching=dataclasses.replace(
        tiny_cfg().matching, match_source="full_ds"))
    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        world = synthetic.make_world(seed=7)
        n = 12
        gt = synthetic.circular_trajectory(n + 1, radius=60.0, speed=8.0)
        scans = [render_tiny(world, gt[i], 700 + i) for i in range(n)]
    finally:
        syn.hdl64_elevations = orig
    odo = replica.ReferenceReplicaOdometry(cfg)
    rep = np.stack([
        odo.process(s.points[:, :3].astype(np.float64), s.valid)
        for s in scans
    ])
    res = driver.replay_odometry(scans, cfg)
    tpu = np.asarray(res.poses)

    gt_rel = trajectory.relative_to_first(gt[:n])
    div = trajectory.ate_rmse(tpu, rep, align=False)
    ate_tpu = trajectory.ate_rmse(tpu, gt_rel, align=False)
    ate_rep = trajectory.ate_rmse(rep, gt_rel, align=False)
    per_step = np.linalg.norm(tpu[:, 3:] - rep[:, 3:], axis=1)
    # (a) absolute ceiling (measured 0.11 constant offset, see docstring)
    assert div < 0.15, (
        f"divergence {div:.3f} m "
        f"(ATE tpu {ate_tpu:.3f}, replica {ate_rep:.3f})")
    # (b) the offset must not ACCUMULATE across the replay
    assert float(per_step.max()) < 0.2, f"per-step max {per_step.max():.3f}"
    # (c) accuracy parity with the replica
    assert ate_tpu < 1.2 * ate_rep + 0.02
