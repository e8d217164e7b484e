"""Pallas TPU kernel: fused Gauss-Newton correspondence accumulation.

One GN iteration of the LOAM scan-to-map solver (cornerOptimization /
surfOptimization / combineOptimizationCoeffs, odomEstimationNode.cpp:
633-974) spends its time in a chain of small XLA ops: transform points,
`lax.top_k` re-rank of the cached kNN candidates, `take_along_axis`
gathers, per-point eigen/plane fits, and the (M, 6) Jacobian reduction.
Each op round-trips (Q, k)-shaped intermediates through HBM and the sort
/ gather ops fuse poorly — profiled at ~1 ms per iteration on a v5e for
~4k queries, ~2/3 of the whole odometry step (scripts/profile_step.py).

This kernel fuses the ENTIRE iteration body into one VMEM-resident pass
per query block:

  world-transform -> candidate re-rank (unrolled iterated-min 5-of-k
  selection, no sort) -> correspondence fit (closed-form 3x3 eigen line
  fit for corners / TLS plane fit for surfs, mirroring utils/lin.py)
  -> residual damping + validity gates -> weighted J rows -> per-block
  partial H (6x6 upper triangle), g (6,) and valid count.

The (Q, 5, 3) neighbor tensors, top_k sort, and gathers never exist;
per-iteration HBM traffic drops to one read of the query/candidate
buffers plus a (n_blocks, 64) partial write. The 6x6 solve, degeneracy
clamp, and convergence test stay in XLA (`scan_match.gn_solve_from_hg`).

Numerical parity: same math as scan_match.corner_correspondences /
surf_correspondences to f32 rounding (different accumulation order);
pinned by tests/test_pallas_gn.py against the XLA path.

Layouts: queries (4, Qp) = [x, y, z, mask] and candidates (3k, Qp) =
[x_0..x_{k-1}, y_0.., z_0..] transposed so the short axis sits on
sublanes (same rationale as ops/pallas_knn.py). Scalars (pose rotation,
Jacobian matrices, gates) ride in one (1, 64) SMEM row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3e38  # plain float: jnp constants cannot be captured by the kernel

# scalar row layout (SMEM (1, 64) f32)
_SC_R = 0  # [0:9] rotation row-major
_SC_T = 9  # [9:12] translation
_SC_MR = 12  # [12:21] dR/droll
_SC_MP = 21  # [21:30] dR/dpitch
_SC_MY = 30  # [30:39] dR/dyaw
_SC_MAXSQ = 39  # nn_max_sq_dist
_SC_DAMP = 40  # residual_damping
_SC_MINW = 41  # min_residual_weight
_SC_GATE = 42  # eigen_ratio_line (corner) / plane_fit_tolerance (surf)

# output row layout ((1, 64) per grid block)
# [0:21] H upper triangle row-major, [21:27] g, [27] n_valid


def _gn_kernel(sc_ref, pq_ref, cand_ref, ok_ref, w_ref, out_ref,
               *, k: int, mode: str):
    f32 = jnp.float32
    px = pq_ref[0:1, :]
    py = pq_ref[1:2, :]
    pz = pq_ref[2:3, :]
    qmask = pq_ref[3:4, :]  # 1/0

    R = [sc_ref[0, _SC_R + i] for i in range(9)]
    tx, ty, tz = (sc_ref[0, _SC_T], sc_ref[0, _SC_T + 1],
                  sc_ref[0, _SC_T + 2])
    wx = R[0] * px + R[1] * py + R[2] * pz + tx
    wy = R[3] * px + R[4] * py + R[5] * pz + ty
    wz = R[6] * px + R[7] * py + R[8] * pz + tz

    # ---- candidate re-rank: exact sq-distances at the CURRENT pose ----
    cxs = [cand_ref[j:j + 1, :] for j in range(k)]
    cys = [cand_ref[k + j:k + j + 1, :] for j in range(k)]
    czs = [cand_ref[2 * k + j:2 * k + j + 1, :] for j in range(k)]
    ds = []
    for j in range(k):
        dj = ((cxs[j] - wx) ** 2 + (cys[j] - wy) ** 2 + (czs[j] - wz) ** 2)
        ds.append(jnp.where(ok_ref[j:j + 1, :] > 0.5, dj, _INF))

    # ---- iterated-min selection of the 5 nearest (coords + distance) ----
    sel_x, sel_y, sel_z = [], [], []
    d5 = None
    for _ in range(5):
        m = ds[0]
        for j in range(1, k):
            m = jnp.minimum(m, ds[j])
        taken = jnp.zeros_like(m)
        xs = jnp.zeros_like(m)
        ys = jnp.zeros_like(m)
        zs = jnp.zeros_like(m)
        for j in range(k):
            eq = (ds[j] <= m).astype(f32)
            pick = eq * (1.0 - taken)
            taken = taken + pick
            xs = xs + pick * cxs[j]
            ys = ys + pick * cys[j]
            zs = zs + pick * czs[j]
            ds[j] = jnp.where(pick > 0.5, _INF, ds[j])
        sel_x.append(xs)
        sel_y.append(ys)
        sel_z.append(zs)
        d5 = m  # after the loop: the 5th-smallest distance
    gate = qmask * (d5 < sc_ref[0, _SC_MAXSQ]).astype(f32)

    # ---- 5-point centroid + covariance (6 unique entries) ----
    cx_m = (sel_x[0] + sel_x[1] + sel_x[2] + sel_x[3] + sel_x[4]) * 0.2
    cy_m = (sel_y[0] + sel_y[1] + sel_y[2] + sel_y[3] + sel_y[4]) * 0.2
    cz_m = (sel_z[0] + sel_z[1] + sel_z[2] + sel_z[3] + sel_z[4]) * 0.2
    a00 = a01 = a02 = a11 = a12 = a22 = 0.0
    dxs, dys, dzs = [], [], []
    for i in range(5):
        dx = sel_x[i] - cx_m
        dy = sel_y[i] - cy_m
        dz = sel_z[i] - cz_m
        dxs.append(dx)
        dys.append(dy)
        dzs.append(dz)
        a00 = a00 + dx * dx
        a01 = a01 + dx * dy
        a02 = a02 + dx * dz
        a11 = a11 + dy * dy
        a12 = a12 + dy * dz
        a22 = a22 + dz * dz
    if mode == "corner":
        # reference divides the corner covariance by 5
        # (odomEstimationNode.cpp:668); the surf TLS fit uses the raw sum
        # (utils/lin.solve_plane_lsq) — the normal is scale-invariant
        a00, a01, a02 = a00 * 0.2, a01 * 0.2, a02 * 0.2
        a11, a12, a22 = a11 * 0.2, a12 * 0.2, a22 * 0.2

    # ---- closed-form symmetric 3x3 eigenvalues (utils/lin.eigvalsh3) ----
    q3 = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q3, a11 - q3, a22 - q3
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    pp = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    det = (b00 * (b11 * b22 - a12 * a12)
           - a01 * (a01 * b22 - a12 * a02)
           + a02 * (a01 * a12 - b11 * a02))
    rr = jnp.clip(det / (2.0 * pp * pp * pp), -1.0, 1.0)
    phi = jnp.arccos(rr) / 3.0
    e_hi = q3 + 2.0 * pp * jnp.cos(phi)
    e_lo = q3 + 2.0 * pp * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q3 - e_hi - e_lo

    def eigvec_from_projector(s1, s2):
        """Nonzero column of (A - s1 I)(A - s2 I), first-max column like
        jnp.argmax (utils/lin.principal_eigvec3 / smallest_eigvec3)."""
        b_00, b_11, b_22 = a00 - s1, a11 - s1, a22 - s1
        c_00, c_11, c_22 = a00 - s2, a11 - s2, a22 - s2
        # P = B @ C with B/C symmetric (off-diagonals = a01, a02, a12)
        p00 = b_00 * c_00 + a01 * a01 + a02 * a02
        p10 = a01 * c_00 + b_11 * a01 + a12 * a02
        p20 = a02 * c_00 + a12 * a01 + b_22 * a02
        p01 = b_00 * a01 + a01 * c_11 + a02 * a12
        p11 = a01 * a01 + b_11 * c_11 + a12 * a12
        p21 = a02 * a01 + a12 * c_11 + b_22 * a12
        p02 = b_00 * a02 + a01 * a12 + a02 * c_22
        p12 = a01 * a02 + b_11 * a12 + a12 * c_22
        p22 = a02 * a02 + a12 * a12 + b_22 * c_22
        n0 = jnp.sqrt(p00 * p00 + p10 * p10 + p20 * p20)
        n1 = jnp.sqrt(p01 * p01 + p11 * p11 + p21 * p21)
        n2 = jnp.sqrt(p02 * p02 + p12 * p12 + p22 * p22)
        pick0 = ((n0 >= n1) & (n0 >= n2)).astype(f32)
        pick1 = (1.0 - pick0) * (n1 >= n2).astype(f32)
        pick2 = 1.0 - pick0 - pick1
        vx = pick0 * p00 + pick1 * p01 + pick2 * p02
        vy = pick0 * p10 + pick1 * p11 + pick2 * p12
        vz = pick0 * p20 + pick1 * p21 + pick2 * p22
        inv_n = 1.0 / jnp.maximum(
            jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-20)
        return vx * inv_n, vy * inv_n, vz * inv_n

    damping = sc_ref[0, _SC_DAMP]
    min_w = sc_ref[0, _SC_MINW]
    gate_p = sc_ref[0, _SC_GATE]

    if mode == "corner":
        # line direction = principal eigenvector; residual = point-to-line
        ux, uy, uz = eigvec_from_projector(e_mid, e_lo)
        is_line = (e_hi > gate_p * e_mid).astype(f32)
        pcx, pcy, pcz = wx - cx_m, wy - cy_m, wz - cz_m
        # cxv = pc x u
        cvx = pcy * uz - pcz * uy
        cvy = pcz * ux - pcx * uz
        cvz = pcx * uy - pcy * ux
        dist = jnp.sqrt(cvx * cvx + cvy * cvy + cvz * cvz)
        inv_d = 1.0 / jnp.maximum(dist, 1e-12)
        # grad = (u x cxv) / dist
        nx = (uy * cvz - uz * cvy) * inv_d
        ny = (uz * cvx - ux * cvz) * inv_d
        nz = (ux * cvy - uy * cvx) * inv_d
        s = 1.0 - damping * jnp.abs(dist)
        resid0 = dist
        okf = gate * is_line * (s > min_w).astype(f32)
    else:
        # TLS plane fit: normal = smallest eigenvector, d = -n . centroid
        nx, ny, nz = eigvec_from_projector(e_hi, e_mid)
        d_off = -(nx * cx_m + ny * cy_m + nz * cz_m)
        plane_ok = jnp.ones_like(gate)
        for i in range(5):
            res_i = jnp.abs(
                nx * sel_x[i] + ny * sel_y[i] + nz * sel_z[i] + d_off)
            plane_ok = plane_ok * (res_i <= gate_p).astype(f32)
        pd2 = nx * wx + ny * wy + nz * wz + d_off
        range_damp = jnp.sqrt(jnp.sqrt(wx * wx + wy * wy + wz * wz + 1e-12))
        s = 1.0 - damping * jnp.abs(pd2) / jnp.maximum(range_damp, 1e-6)
        resid0 = pd2
        okf = gate * plane_ok * (s > min_w).astype(f32)

    w = w_ref[0:1, :]
    sw = s * w * okf
    cfx, cfy, cfz = sw * nx, sw * ny, sw * nz  # weighted coefficients
    r = sw * resid0  # weighted residual

    # ---- Jacobian rotation columns: coeff . (dR/dangle @ p_sensor) ----
    def rot_col(base):
        m = [sc_ref[0, base + i] for i in range(9)]
        mx = m[0] * px + m[1] * py + m[2] * pz
        my = m[3] * px + m[4] * py + m[5] * pz
        mz = m[6] * px + m[7] * py + m[8] * pz
        return cfx * mx + cfy * my + cfz * mz

    J = [rot_col(_SC_MR), rot_col(_SC_MP), rot_col(_SC_MY), cfx, cfy, cfz]

    vals = []
    for a in range(6):
        for b in range(a, 6):
            vals.append(jnp.sum(J[a] * J[b]))
    for a in range(6):
        vals.append(jnp.sum(J[a] * (-r)))
    vals.append(jnp.sum(okf))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    outv = jnp.zeros((1, 64), f32)
    for idx, v in enumerate(vals):
        outv = outv + jnp.where(lane == idx, v, 0.0)
    out_ref[:] = outv


@functools.partial(
    jax.jit, static_argnames=("k", "mode", "query_block", "interpret"))
def gn_partials(
    pts: jnp.ndarray,  # (Q, 3) sensor-frame query points
    mask: jnp.ndarray,  # (Q,) bool
    cand: jnp.ndarray,  # (Q, k, 3) cached candidate coords (map frame)
    cand_ok: jnp.ndarray,  # (Q, k) bool
    weight: jnp.ndarray,  # (Q,) per-query semantic weight
    scalars: jnp.ndarray,  # (64,) f32, see _SC_* layout
    mode: str,
    k: int,
    query_block: int = 256,
    interpret: bool = False,
):
    """One fused GN accumulation pass. Returns (H (6,6), g (6,),
    n_valid () f32)."""
    q_n = pts.shape[0]
    padq = (-q_n) % query_block
    if padq:
        pts = jnp.concatenate([pts, jnp.zeros((padq, 3), pts.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((padq,), bool)])
        cand = jnp.concatenate(
            [cand, jnp.zeros((padq, k, 3), cand.dtype)])
        cand_ok = jnp.concatenate(
            [cand_ok, jnp.zeros((padq, k), bool)])
        weight = jnp.concatenate([weight, jnp.zeros((padq,), weight.dtype)])
    qp = pts.shape[0]
    n_blocks = qp // query_block

    pq = jnp.concatenate(
        [pts.T.astype(jnp.float32),
         mask.astype(jnp.float32)[None, :]], axis=0)  # (4, Qp)
    # (Q, k, 3) -> (3, k, Q) -> (3k, Q): rows [x_j | y_j | z_j]
    cand_t = jnp.transpose(cand.astype(jnp.float32), (2, 1, 0)).reshape(
        3 * k, qp)
    ok_t = cand_ok.astype(jnp.float32).T  # (k, Qp)
    w_t = weight.astype(jnp.float32)[None, :]  # (1, Qp)

    partials = pl.pallas_call(
        functools.partial(_gn_kernel, k=k, mode=mode),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 64), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, query_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * k, query_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, query_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, query_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 64), jnp.float32),
        interpret=interpret,
    )(scalars.reshape(1, 64), pq, cand_t, ok_t, w_t)

    vec = jnp.sum(partials, axis=0)  # (64,)
    iu = jnp.triu_indices(6)
    H = jnp.zeros((6, 6)).at[iu].set(vec[:21])
    H = H + jnp.triu(H, 1).T
    g = vec[21:27]
    return H, g, vec[27]


def pack_scalars(pose: jnp.ndarray, cfg, mode: str) -> jnp.ndarray:
    """Build the (64,) scalar row for `gn_partials` from the current pose
    and the MatchingConfig gates."""
    from . import scan_match
    from ..utils import se3

    R = se3.euler_to_rot(pose[:3])
    M_roll, M_pitch, M_yaw = scan_match._rotation_jacobian_mats(pose[:3])
    gate = (cfg.eigen_ratio_line if mode == "corner"
            else cfg.plane_fit_tolerance)
    return jnp.concatenate([
        R.reshape(-1), pose[3:],
        M_roll.reshape(-1), M_pitch.reshape(-1), M_yaw.reshape(-1),
        jnp.array([cfg.nn_max_sq_dist, cfg.residual_damping,
                   cfg.min_residual_weight, gate], jnp.float32),
        jnp.zeros(21, jnp.float32),
    ]).astype(jnp.float32)


def gn_iteration_hg(pose, corner_pts, corner_mask, c_cand, c_ok,
                    surf_pts, surf_mask, s_cand, s_ok,
                    corner_w, surf_w, cfg, k: int):
    """Full fused H/g build for one GN iteration (corner + surf clouds).
    Dispatches the Pallas kernel on TPU, interpret mode elsewhere."""
    interpret = jax.default_backend() != "tpu"
    ones_c = (jnp.ones(corner_pts.shape[0])
              if corner_w is None else corner_w)
    ones_s = jnp.ones(surf_pts.shape[0]) if surf_w is None else surf_w
    Hc, gc, nc = gn_partials(
        corner_pts, corner_mask, c_cand, c_ok, ones_c,
        pack_scalars(pose, cfg, "corner"), "corner", k,
        interpret=interpret)
    Hs, gs, ns = gn_partials(
        surf_pts, surf_mask, s_cand, s_ok, ones_s,
        pack_scalars(pose, cfg, "surf"), "surf", k,
        interpret=interpret)
    return Hc + Hs, gc + gs, (nc + ns).astype(jnp.int32)
