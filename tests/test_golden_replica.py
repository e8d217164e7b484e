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
