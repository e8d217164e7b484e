"""Small-matrix linear algebra, batched and TPU-friendly.

Replaces the per-point cv::eigen / Eigen solves in the reference hot loop
(odomEstimationNode.cpp:633-827) with closed-form batched ops — no LAPACK
calls inside the per-point vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3), ascending. Analytic
    (trigonometric) method — Smith's algorithm, stable for PSD covariances."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    det = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = det / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def principal_eigvec3(A: jnp.ndarray, evals: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the LARGEST eigenvalue of symmetric (...,3,3).

    Uses the spectral projector (A - l2 I)(A - l3 I): every nonzero column is
    parallel to v1. Robust when l1 is separated from l2 — exactly the regime
    the corner line-check (l1 > 3*l2) accepts.
    """
    l_lo, l_mid, l_hi = evals[..., 0], evals[..., 1], evals[..., 2]
    eye = jnp.eye(3, dtype=A.dtype)
    P = (A - l_mid[..., None, None] * eye) @ (A - l_lo[..., None, None] * eye)
    norms = jnp.linalg.norm(P, axis=-2)  # column norms (..., 3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, col[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3) via adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A_ = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A_ + b * B_ + c * C_
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            jnp.stack([A_, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B_, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C_, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve6_spd(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = g for SPD 6x6 via 3x3-block Schur complement.

    jnp.linalg.solve lowers to a scalar LU loop that costs milliseconds on
    TPU; this closed form is a handful of fused VPU ops.
    H = [[A, B], [B^T, C]];  S = C - B^T A^-1 B
    x2 = S^-1 (g2 - B^T A^-1 g1);  x1 = A^-1 (g1 - B x2)
    """
    A = H[:3, :3]
    B = H[:3, 3:]
    C = H[3:, 3:]
    g1, g2 = g[:3], g[3:]
    Ai = inv3(A)
    BtAi = B.T @ Ai
    S = C - BtAi @ B
    Si = inv3(S)
    x2 = Si @ (g2 - BtAi @ g1)
    x1 = Ai @ (g1 - B @ x2)
    return jnp.concatenate([x1, x2])


def jacobi_eigh6(H: jnp.ndarray, sweeps: int = 6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric 6x6 by cyclic Jacobi rotations,
    fully unrolled (sweeps * 15 Givens rotations of cheap VPU ops).

    Returns (eigenvalues ascending, eigenvectors as columns) like
    jnp.linalg.eigh, which costs ~8 ms on TPU for a single 6x6; this runs in
    microseconds at f32 accuracy (validated in tests).
    """
    n = 6
    A = H
    V = jnp.eye(n, dtype=H.dtype)
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]
    for _ in range(sweeps):
        for p, q in pairs:
            apq = A[p, q]
            app = A[p, p]
            aqq = A[q, q]
            # Givens angle: theta = 0.5*atan2(2 apq, app - aqq)
            theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq + 1e-30)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # rotate rows/cols p,q of A and columns of V
            rp = A[p, :]
            rq = A[q, :]
            A = A.at[p, :].set(c * rp + s * rq)
            A = A.at[q, :].set(-s * rp + c * rq)
            cp = A[:, p]
            cq = A[:, q]
            A = A.at[:, p].set(c * cp + s * cq)
            A = A.at[:, q].set(-s * cp + c * cq)
            vp = V[:, p]
            vq = V[:, q]
            V = V.at[:, p].set(c * vp + s * vq)
            V = V.at[:, q].set(-s * vp + c * vq)
    evals = jnp.diagonal(A)
    order = jnp.argsort(evals)
    return evals[order], V[:, order]


def smallest_eigvec3(A: jnp.ndarray, evals: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the SMALLEST eigenvalue of symmetric (...,3,3)
    via the spectral projector (A - l_hi I)(A - l_mid I)."""
    l_lo, l_mid, l_hi = evals[..., 0], evals[..., 1], evals[..., 2]
    eye = jnp.eye(3, dtype=A.dtype)
    P = (A - l_hi[..., None, None] * eye) @ (A - l_mid[..., None, None] * eye)
    norms = jnp.linalg.norm(P, axis=-2)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, col[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def solve_plane_lsq(pts5: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fit plane n.x + d = 0 through (..., k, 3) points.

    The reference solves A x = -1 by QR (surfOptimization,
    odomEstimationNode.cpp:783) — a parametrization that is singular for
    planes through the origin. Here the fit is the robust total-least-squares
    version: n = smallest-eigenvalue direction of the point covariance,
    d = -n . centroid. For valid (planeValid-passing) planes the two agree
    to within noise; this one never overflows.

    Returns (unit normal (...,3), offset d (...,)).
    """
    c = jnp.mean(pts5, axis=-2)
    diff = pts5 - c[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", diff, diff)
    evals = eigvalsh3(cov)
    n = smallest_eigvec3(cov, evals)
    d = -jnp.einsum("...i,...i->...", n, c)
    return n, d
