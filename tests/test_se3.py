"""Golden tests for SE(3)/SO(3) against scipy and the PCL Euler convention."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

import jax
import jax.numpy as jnp

from lis_slam_tpu.utils import se3


def random_rpy(rng, n=64):
    return rng.uniform(-1.4, 1.4, size=(n, 3)).astype(np.float32)


def test_euler_to_rot_matches_pcl_convention(rng):
    """pcl::getTransformation uses R = Rz(yaw) Ry(pitch) Rx(roll)."""
    rpy = random_rpy(rng)
    R = np.asarray(se3.euler_to_rot(jnp.asarray(rpy)))
    # scipy: extrinsic xyz == intrinsic ZYX == Rz@Ry@Rx
    R_ref = Rotation.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_euler_roundtrip(rng):
    rpy = random_rpy(rng)
    R = se3.euler_to_rot(jnp.asarray(rpy))
    back = np.asarray(se3.rot_to_euler(R))
    np.testing.assert_allclose(back, rpy, atol=1e-5)


def test_pose_matrix_roundtrip(rng):
    pose = np.concatenate(
        [random_rpy(rng), rng.uniform(-50, 50, size=(64, 3)).astype(np.float32)], axis=1
    )
    T = se3.pose_to_matrix(jnp.asarray(pose))
    back = np.asarray(se3.matrix_to_pose(T))
    np.testing.assert_allclose(back, pose, atol=1e-4)


def test_transform_inverse(rng):
    pose = np.concatenate(
        [random_rpy(rng), rng.uniform(-50, 50, size=(64, 3)).astype(np.float32)], axis=1
    )
    T = se3.pose_to_matrix(jnp.asarray(pose))
    TI = se3.transform_inverse(T)
    prod = np.asarray(T @ TI)
    # f32 with +-50 m translations: absolute error ~|t|*eps
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    # keep |w| < pi so log returns the same branch
    w = rng.uniform(-1.0, 1.0, size=(128, 3)).astype(np.float32)
    w = (w / np.linalg.norm(w, axis=1, keepdims=True)) * rng.uniform(
        0.01, 3.0, size=(128, 1)
    ).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
    w_back = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(se3.so3_log(R))))


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-1.0, 1.0, size=(128, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)


def test_quat_roundtrips(rng):
    rpy = random_rpy(rng)
    q = se3.euler_to_quat(jnp.asarray(rpy))
    # scipy uses [x,y,z,w]
    q_ref = Rotation.from_euler("xyz", rpy).as_quat()
    q_ref = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=1)
    sign = np.sign(np.sum(np.asarray(q) * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q) * sign, q_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3.quat_to_euler(q)), rpy, atol=1e-5)
    R = se3.quat_to_rot(q)
    np.testing.assert_allclose(
        np.asarray(R), Rotation.from_euler("xyz", rpy).as_matrix(), atol=1e-5
    )
    q_back = np.asarray(se3.rot_to_quat(R))
    sign = np.sign(np.sum(q_back * np.asarray(q), axis=1, keepdims=True))
    np.testing.assert_allclose(q_back * sign, np.asarray(q), atol=1e-4)


def test_quat_slerp_matches_scipy(rng):
    rpy = random_rpy(rng, 2)
    r = Rotation.from_euler("xyz", rpy)
    q = se3.euler_to_quat(jnp.asarray(rpy))
    for t in [0.0, 0.1, 0.5, 0.9, 1.0]:
        ours = np.asarray(se3.quat_slerp(q[0], q[1], t))
        ref = Slerp([0, 1], r)([t]).as_quat()[0]
        ref = np.array([ref[3], ref[0], ref[1], ref[2]])
        sign = np.sign(np.dot(ours, ref))
        np.testing.assert_allclose(ours * sign, ref, atol=1e-5)


def test_transform_points(rng):
    pose = np.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0], dtype=np.float32)
    pts = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    T = se3.pose_to_matrix(jnp.asarray(pose))
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    R_ref = Rotation.from_euler("xyz", pose[:3]).as_matrix()
    ref = pts @ R_ref.T + pose[3:]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_jit_and_vmap_compat():
    f = jax.jit(jax.vmap(se3.pose_to_matrix))
    poses = jnp.zeros((4, 6))
    out = f(poses)
    assert out.shape == (4, 4, 4)
