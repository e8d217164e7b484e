"""SO(3)/SE(3) utilities for the TPU-native SLAM engine.

Conventions follow the reference system (LIS-SLAM), which represents poses as
``[roll, pitch, yaw, x, y, z]`` and materializes them with
``pcl::getTransformation(x, y, z, roll, pitch, yaw)`` — i.e. the rotation is
``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (intrinsic ZYX / extrinsic XYZ Euler).
See reference ``src/core/common.cpp:49-109`` (``trans2Affine3f`` /
``trans2PointTypePose``) for the pose<->array conversions this mirrors.

All functions are pure jnp, fully batched (leading dims broadcast), and safe
under jit/vmap. Float32 throughout — geometry needs the precision; bf16 is
reserved for the neural nets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Euler <-> rotation matrix (PCL convention: R = Rz(yaw) Ry(pitch) Rx(roll))
# ----------------------------------------------------------------------------


def euler_to_rot(rpy: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [roll, pitch, yaw] -> (..., 3, 3) rotation matrix.

    Matches pcl::getTransformation's rotation block (used throughout the
    reference, e.g. odomEstimationNode.cpp trans2Affine3f).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) [roll, pitch, yaw], inverse of euler_to_rot.

    Equivalent to pcl::getTranslationAndEulerAngles /
    Eigen eulerAngles decomposition used by the reference.
    """
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ----------------------------------------------------------------------------
# Pose arrays: [roll, pitch, yaw, x, y, z]  (reference transformTobeMapped)
# ----------------------------------------------------------------------------


def pose_to_matrix(pose6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [roll,pitch,yaw,x,y,z] -> (..., 4, 4) homogeneous transform."""
    R = euler_to_rot(pose6[..., :3])
    t = pose6[..., 3:6]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) [roll,pitch,yaw,x,y,z]."""
    rpy = rot_to_euler(T[..., :3, :3])
    return jnp.concatenate([rpy, T[..., :3, 3]], axis=-1)


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3), (...,3) -> (...,4,4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse of (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return make_transform(Rt, ti)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4,4) (or batched) transform to (..., N, 3) points.

    TPU-native replacement for the OpenMP transformPointCloud loops at
    reference src/core/common.cpp:113-238 — one fused matmul+add.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def apply_rotation(R: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...nj->...ni", R, pts)


# ----------------------------------------------------------------------------
# so(3)/SO(3) exp/log  (replaces vendored Sophus, reference src/sophus/)
# ----------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix (Sophus::SO3::hat)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, (..., 3) axis-angle -> (..., 3, 3).

    Taylor-guarded near theta=0 so gradients stay finite.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) axis-angle. Safe for theta in [0, pi)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    small = theta < 1e-6
    # w = theta/(2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.maximum(sin_theta, 1e-12))
    )
    w = scale[..., None] * vee(R - jnp.swapaxes(R, -1, -2))
    return w


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist [rho(3), w(3)] -> (..., 4, 4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_transform(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist [rho, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    half = theta / 2.0
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-12)) / jnp.maximum(theta2, 1e-24),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot_term[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: float | jnp.ndarray) -> jnp.ndarray:
    """Slerp between (..., 4) [w,x,y,z] quaternions (tf::Quaternion::slerp)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def euler_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [roll,pitch,yaw] -> (..., 4) [w,x,y,z] (tf setRPY convention)."""
    half = rpy * 0.5
    cr, sr = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cp, sp = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cy, sy = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [w,x,y,z] -> (..., 3) [roll,pitch,yaw]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [w,x,y,z] -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-24), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) [w,x,y,z], branch-free Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best by largest pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def constrain_angle(value: jnp.ndarray, limit: float) -> jnp.ndarray:
    """Clamp to [-limit, limit] (reference common.cpp:286-302
    constraintTransformation; applied with rotation_tollerance/z_tollerance)."""
    return jnp.clip(value, -limit, limit)
