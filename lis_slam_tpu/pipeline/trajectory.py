"""Trajectory export and metrics (KITTI format, ATE/RPE).

Rebuild of the reference's `transformFusion` trajectory writer
(subMapOptmizationNode.cpp:5079-5179): poses as 3x4 row-major KITTI lines,
normalized to the first pose. Metrics (ATE RMSE, RPE) replace the empty
`script/eval.py` with a real evaluator.
"""

from __future__ import annotations

import numpy as np

from ..utils import se3
import jax.numpy as jnp


def poses_to_kitti(poses6: np.ndarray) -> np.ndarray:
    """(N, 6) [roll,pitch,yaw,x,y,z] -> (N, 12) KITTI rows, first-pose
    normalized (T_rel = T0^-1 @ T_i)."""
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(poses6, dtype=jnp.float32)))
    T0_inv = np.linalg.inv(T[0])
    rel = np.einsum("ij,njk->nik", T0_inv, T)
    return rel[:, :3, :].reshape(len(poses6), 12)


def write_kitti(path: str, poses6: np.ndarray) -> None:
    rows = poses_to_kitti(poses6)
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(f"{v:.9e}" for v in r) + "\n")


def _to_mats(poses6: np.ndarray) -> np.ndarray:
    return np.asarray(se3.pose_to_matrix(jnp.asarray(poses6, dtype=jnp.float32)))


def relative_to_first(poses6: np.ndarray) -> np.ndarray:
    """Re-express a trajectory relative to its first pose (odometry starts at
    identity, ground truth usually doesn't)."""
    T = _to_mats(np.asarray(poses6))
    rel = np.einsum("ij,njk->nik", np.linalg.inv(T[0]), T)
    return np.asarray(
        se3.matrix_to_pose(jnp.asarray(rel, dtype=jnp.float32))
    )


def align_umeyama(est: np.ndarray, gt: np.ndarray):
    """SE(3) alignment (no scale) of est trajectory onto gt (N, 3) each."""
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    E = est - mu_e
    G = gt - mu_g
    U, _, Vt = np.linalg.svd(E.T @ G)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = (U @ S @ Vt).T
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est6: np.ndarray, gt6: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE over positions, optional SE3 align)."""
    e = np.asarray(est6)[:, 3:6].astype(np.float64)
    g = np.asarray(gt6)[:, 3:6].astype(np.float64)
    assert e.shape == g.shape
    if align:
        R, t = align_umeyama(e, g)
        e = e @ R.T + t
    return float(np.sqrt(np.mean(np.sum((e - g) ** 2, axis=1))))


def rpe(est6: np.ndarray, gt6: np.ndarray, delta: int = 1):
    """Relative pose error: per-step translational drift (m) and rotational
    drift (deg), RMSE over the sequence."""
    Te = _to_mats(np.asarray(est6))
    Tg = _to_mats(np.asarray(gt6))
    dts, drs = [], []
    for i in range(len(Te) - delta):
        de = np.linalg.inv(Te[i]) @ Te[i + delta]
        dg = np.linalg.inv(Tg[i]) @ Tg[i + delta]
        err = np.linalg.inv(dg) @ de
        dts.append(np.linalg.norm(err[:3, 3]))
        c = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
        drs.append(np.degrees(np.arccos(c)))
    return float(np.sqrt(np.mean(np.square(dts)))), float(
        np.sqrt(np.mean(np.square(drs)))
    )
