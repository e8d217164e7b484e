"""Sparse Gauss-Newton pose-graph optimization on SE(3).

TPU-native replacement for the reference's GTSAM/iSAM2 back-end
(subMapOptmizationNode.cpp: addOdomFactor :4189-4214, addGPSFactor
:4217-4301, addLoopFactor :4304-4342, isam->update in saveSubMapAndFactor
:4084-4185, correctPoses :4346-4385). Instead of incremental smoothing, the
full graph over submap nodes is (re-)solved by damped Gauss-Newton with
dense normal equations — at reference scale (<= ~256 submaps on KITTI 00,
so H is <= 1536 x 1536) one dense solve per update is cheap on TPU and
exactly minimizes the same factor objective. Past that scale,
`optimize_cg` solves the SAME objective matrix-free (block-Jacobi
preconditioned CG over the sparse block Hessian, O(E) per sweep);
GraphConfig.solver="auto" switches between them by padded node count.

Parametrization: nodes as 4x4 matrices, right-perturbation
X <- X exp(delta); between-factor residual r = log(Z^-1 X_i^-1 X_j) with the
standard small-residual Jacobians J_i = -Ad(X_j^-1 X_i), J_j = I.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GraphConfig
from ..utils import se3


class PoseGraph(NamedTuple):
    """Fixed-capacity graph arrays (padded)."""

    nodes: jnp.ndarray  # (N, 4, 4) current estimates
    node_mask: jnp.ndarray  # (N,)
    # between factors: edge k constrains (i -> j) with measurement Z
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_z: jnp.ndarray  # (E, 4, 4)
    edge_weight: jnp.ndarray  # (E, 6) per-axis sqrt information
    edge_mask: jnp.ndarray  # (E,)
    # robust (Cauchy/GNC) kernel flag: loop-closure edges are suspect
    # (a false loop that survives the ICP fitness gate would corrupt the
    # whole graph under a quadratic cost); odometry edges stay quadratic
    edge_robust: jnp.ndarray  # (E,)
    # unary priors (GPS / anchor): node -> measured pose
    prior_idx: jnp.ndarray  # (P,) int32
    prior_z: jnp.ndarray  # (P, 4, 4)
    prior_weight: jnp.ndarray  # (P, 6)
    prior_mask: jnp.ndarray  # (P,)


def empty_graph(max_nodes: int, max_edges: int, max_priors: int) -> PoseGraph:
    eye = jnp.broadcast_to(jnp.eye(4), (max_nodes, 4, 4))
    return PoseGraph(
        nodes=eye,
        node_mask=jnp.zeros(max_nodes, bool),
        edge_i=jnp.zeros(max_edges, jnp.int32),
        edge_j=jnp.zeros(max_edges, jnp.int32),
        edge_z=jnp.broadcast_to(jnp.eye(4), (max_edges, 4, 4)),
        edge_weight=jnp.ones((max_edges, 6)),
        edge_mask=jnp.zeros(max_edges, bool),
        edge_robust=jnp.zeros(max_edges, bool),
        prior_idx=jnp.zeros(max_priors, jnp.int32),
        prior_z=jnp.broadcast_to(jnp.eye(4), (max_priors, 4, 4)),
        prior_weight=jnp.ones((max_priors, 6)),
        prior_mask=jnp.zeros(max_priors, bool),
    )


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for twist order [rho, w]: (..., 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = se3.hat(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _residuals_and_blocks(graph: PoseGraph):
    """Between-factor residuals (E, 6) + Jacobian blocks (E, 6, 6) x2."""
    Xi = graph.nodes[graph.edge_i]
    Xj = graph.nodes[graph.edge_j]
    rel = se3.transform_inverse(Xi) @ Xj
    err_T = se3.transform_inverse(graph.edge_z) @ rel
    r = se3.se3_log(err_T)  # (E, 6)
    Jj = jnp.broadcast_to(jnp.eye(6), r.shape[:1] + (6, 6))
    Ji = -adjoint(se3.transform_inverse(rel))
    w = graph.edge_weight
    return r * w, Ji * w[:, :, None], Jj * w[:, :, None]


def _prior_residuals(graph: PoseGraph):
    Xp = graph.nodes[graph.prior_idx]
    err_T = se3.transform_inverse(graph.prior_z) @ Xp
    r = se3.se3_log(err_T)
    J = jnp.broadcast_to(jnp.eye(6), r.shape[:1] + (6, 6))
    w = graph.prior_weight
    return r * w, J * w[:, :, None]


def _masked_residuals(graph: PoseGraph, nodes):
    g = graph._replace(nodes=nodes)
    r_e, Ji, Jj = _residuals_and_blocks(g)
    r_p, Jp = _prior_residuals(g)
    em = g.edge_mask.astype(nodes.dtype)
    pm = g.prior_mask.astype(nodes.dtype)
    r_e = r_e * em[:, None]
    Ji = Ji * em[:, None, None]
    Jj = Jj * em[:, None, None]
    r_p = r_p * pm[:, None]
    Jp = Jp * pm[:, None, None]
    return r_e, Ji, Jj, r_p, Jp


def _cost(graph: PoseGraph, nodes):
    r_e, _Ji, _Jj, r_p, _Jp = _masked_residuals(graph, nodes)
    return jnp.sum(r_e * r_e) + jnp.sum(r_p * r_p)


def _robust_scale(r_e, robust, c):
    """IRLS sqrt-weight of the Cauchy kernel rho(e2) = c^2 log(1 + e2/c^2)
    over the whitened per-edge squared norm: w = rho'(e2) = 1/(1 + e2/c^2).
    Quadratic edges (robust=False) keep weight 1."""
    e2 = jnp.sum(r_e * r_e, axis=1)
    w = 1.0 / (1.0 + e2 / (c * c))
    return jnp.where(robust, jnp.sqrt(w), 1.0)


def _robust_cost(graph: PoseGraph, nodes, c):
    """Total cost with the Cauchy kernel on robust-flagged edges (the LM
    accept/reject must compare the SAME objective the IRLS step descends)."""
    r_e, _Ji, _Jj, r_p, _Jp = _masked_residuals(graph, nodes)
    e2 = jnp.sum(r_e * r_e, axis=1)
    ce = jnp.where(graph.edge_robust, c * c * jnp.log1p(e2 / (c * c)), e2)
    return jnp.sum(ce) + jnp.sum(r_p * r_p)


def _gnc_c(it, c_final, c_start):
    """Graduated non-convexity schedule: the kernel scale starts huge (the
    cost is then effectively quadratic, so a drifted-but-consistent loop can
    still pull the chain together) and halves per LM sweep down to c_final
    (where a residual inconsistent with the converged graph is cut). This is
    the standard fix for robust kernels' chicken-and-egg problem: at the
    drifted initialization TRUE loops also carry huge residuals."""
    return jnp.maximum(c_final, c_start * jnp.power(0.5, it))


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize(graph: PoseGraph, damping: float = 1e-6,
             iterations: int = 20, robust_c: float = 3.0,
             gnc_start_c: float = 1e3) -> PoseGraph:
    """Levenberg-Marquardt over the whole graph; returns graph with updated
    nodes. Adaptive damping with step acceptance: pure Gauss-Newton with a
    fixed tiny damping OSCILLATES when strong unary priors (GPS) conflict
    with the odometry chain (the round-3 GPS-drift regression: node
    estimates diverged after ~5 sweeps); LM's reject-and-raise-lambda makes
    every sweep monotone in cost. GTSAM's iSAM2 wraps the same factors in a
    trust-region (Dogleg) solver for the same reason.

    Early exit: the sweep loop stops once an ACCEPTED step moves every node
    by < 1e-6 — but never before the GNC anneal has reached its final c
    (exiting mid-anneal would leave robust loops effectively quadratic).
    The pipeline re-optimizes the warm-started graph at every new factor
    (saveSubMapAndFactor parity), where convergence typically needs a
    handful of sweeps, not the `iterations` worst case — and each sweep is
    a dense (6N)^2 solve sharing the device stream with the 10 Hz scan
    chain."""
    n = graph.nodes.shape[0]
    # sweeps to anneal c_start -> robust_c (halving per sweep), + slack at
    # the final c (robust_c/gnc_start_c are traced: keep this in jnp)
    min_sweeps = jnp.minimum(
        iterations,
        jnp.ceil(jnp.log2(jnp.maximum(gnc_start_c / robust_c, 1.0))
                 ).astype(jnp.int32) + 3)

    def cond(carry):
        _nodes, _lam, it, conv = carry
        return (it < iterations) & ~conv

    def body(carry):
        nodes, lam, it, _conv = carry
        c = _gnc_c(it, robust_c, gnc_start_c)
        r_e, Ji, Jj, r_p, Jp = _masked_residuals(graph, nodes)
        e2 = jnp.sum(r_e * r_e, axis=1)
        cost = jnp.sum(jnp.where(
            graph.edge_robust, c * c * jnp.log1p(e2 / (c * c)), e2)
        ) + jnp.sum(r_p * r_p)
        s = _robust_scale(r_e, graph.edge_robust, c)
        r_e = r_e * s[:, None]
        Ji = Ji * s[:, None, None]
        Jj = Jj * s[:, None, None]

        # assemble H (6N, 6N) and b (6N,) by block scatter-add
        H = jnp.zeros((n, n, 6, 6))
        b = jnp.zeros((n, 6))
        ii, jj = graph.edge_i, graph.edge_j
        H = H.at[ii, ii].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[jj, jj].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[ii, jj].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[jj, ii].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
        b = b.at[ii].add(jnp.einsum("eki,ek->ei", Ji, r_e))
        b = b.at[jj].add(jnp.einsum("eki,ek->ei", Jj, r_e))
        pi = graph.prior_idx
        H = H.at[pi, pi].add(jnp.einsum("eki,ekj->eij", Jp, Jp))
        b = b.at[pi].add(jnp.einsum("eki,ek->ei", Jp, r_p))

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        bd = b.reshape(6 * n)
        # gauge fixing for inactive nodes + LM damping (scaled by the
        # diagonal so lambda is unit-free)
        diag = jnp.diagonal(Hd)
        active = jnp.repeat(graph.node_mask, 6).astype(nodes.dtype)
        Hd = Hd + jnp.diag(
            damping + lam * (diag + 1.0) + (1.0 - active) * 1e6 + 1e-8)
        delta = -jnp.linalg.solve(Hd, bd).reshape(n, 6)
        delta = delta * graph.node_mask[:, None]
        cand = nodes @ se3.se3_exp(delta)
        new_cost = _robust_cost(graph, cand, c)
        accept = new_cost < cost
        nodes = jnp.where(accept, cand, nodes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), lam * 4.0)
        # a tiny PROPOSED step means converged whether accepted or not: if
        # rejected, the quadratic model can't improve cost at this point
        # either (accept is strict `<`, so an exactly-converged graph would
        # otherwise never set it and always pay all `iterations` sweeps)
        conv = (jnp.max(jnp.abs(delta)) < 1e-6) & (it + 1 >= min_sweeps)
        return nodes, lam, it + 1, conv

    nodes, _lam, _it, _conv = jax.lax.while_loop(
        cond, body,
        (graph.nodes, jnp.asarray(1e-4, graph.nodes.dtype), jnp.int32(0),
         jnp.bool_(False)))
    return graph._replace(nodes=nodes)


@functools.partial(jax.jit, static_argnames=("iterations", "cg_iters"))
def optimize_cg(graph: PoseGraph, damping: float = 1e-6,
                iterations: int = 20, cg_iters: int = 96,
                robust_c: float = 3.0, gnc_start_c: float = 1e3
                ) -> PoseGraph:
    """Matrix-free LM: the same factor objective and accept/reject outer
    loop as `optimize`, but each normal-equation solve is block-Jacobi-
    preconditioned conjugate gradients over the SPARSE Hessian — H is never
    materialized. Per LM sweep the cost is O(E) 6x6-block matvecs
    (gather + einsum + segment scatter-add, all TPU-friendly) instead of
    the dense (6N)^3 factorization, so the graph can grow past the ~256
    submaps where the dense path is economical (city-scale runs; the
    reference leans on iSAM2's incremental smoothing for the same reason,
    subMapOptmizationNode.cpp:4084-4185). Inexact inner solves are safe:
    a rejected step raises lambda, which both re-centers the trust region
    and improves CG's conditioning (block-Jacobi absorbs the lam*diag
    term exactly)."""
    from ..utils import lin

    n = graph.nodes.shape[0]
    ii, jj, pi = graph.edge_i, graph.edge_j, graph.prior_idx

    def body(it, carry):
        nodes, lam = carry
        c = _gnc_c(it, robust_c, gnc_start_c)
        r_e, Ji, Jj, r_p, Jp = _masked_residuals(graph, nodes)
        e2 = jnp.sum(r_e * r_e, axis=1)
        cost = jnp.sum(jnp.where(
            graph.edge_robust, c * c * jnp.log1p(e2 / (c * c)), e2)
        ) + jnp.sum(r_p * r_p)
        s = _robust_scale(r_e, graph.edge_robust, c)
        r_e = r_e * s[:, None]
        Ji = Ji * s[:, None, None]
        Jj = Jj * s[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        Hpp = jnp.einsum("eki,ekj->eij", Jp, Jp)
        b = jnp.zeros((n, 6))
        b = b.at[ii].add(jnp.einsum("eki,ek->ei", Ji, r_e))
        b = b.at[jj].add(jnp.einsum("eki,ek->ei", Jj, r_e))
        b = b.at[pi].add(jnp.einsum("eki,ek->ei", Jp, r_p))
        # diagonal blocks (for the preconditioner) + the same damping /
        # gauge-fix diagonal the dense path adds
        D = jnp.zeros((n, 6, 6)).at[ii].add(Hii).at[jj].add(Hjj)
        D = D.at[pi].add(Hpp)
        diag_vec = jnp.diagonal(D, axis1=1, axis2=2)
        active = graph.node_mask.astype(nodes.dtype)[:, None]
        dvec = (damping + lam * (diag_vec + 1.0)
                + (1.0 - active) * 1e6 + 1e-8)
        Dd = D + jax.vmap(jnp.diag)(dvec)

        def matvec(x):
            y = dvec * x
            xi, xj = x[ii], x[jj]
            y = y.at[ii].add(jnp.einsum("eij,ej->ei", Hii, xi)
                             + jnp.einsum("eij,ej->ei", Hij, xj))
            y = y.at[jj].add(jnp.einsum("eij,ej->ei", Hjj, xj)
                             + jnp.einsum("eji,ej->ei", Hij, xi))
            return y.at[pi].add(jnp.einsum("eij,ej->ei", Hpp, x[pi]))

        prec = jax.vmap(lin.solve6_spd)

        # PCG for H delta = -b (x0 = 0)
        r0 = -b
        z0 = prec(Dd, r0)
        rz0 = jnp.sum(r0 * z0)

        def cg_body(_, c):
            x, r, p, rz = c
            live = rz > 1e-20  # freeze converged solves (avoid 0/0)
            Ap = matvec(p)
            alpha = jnp.where(
                live, rz / jnp.maximum(jnp.sum(p * Ap), 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(Dd, r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(live, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            return x, r, z + beta * p, rz_new

        delta, _r, _p, _rz = jax.lax.fori_loop(
            0, cg_iters, cg_body, (jnp.zeros((n, 6)), r0, z0, rz0))
        delta = delta * graph.node_mask[:, None]
        cand = nodes @ se3.se3_exp(delta)
        new_cost = _robust_cost(graph, cand, c)
        accept = new_cost < cost
        nodes = jnp.where(accept, cand, nodes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), lam * 4.0)
        return nodes, lam

    nodes, _lam = jax.lax.fori_loop(
        0, iterations, body,
        (graph.nodes, jnp.asarray(1e-4, graph.nodes.dtype)))
    return graph._replace(nodes=nodes)


class GraphBuilder:
    """Host-side incremental graph construction (replaces the iSAM2 update
    call pattern: add node + odom factor per submap, loop factors from the
    loop thread, optional GPS priors)."""

    def __init__(self, cfg: GraphConfig, max_nodes: int = 256,
                 max_edges: int = 1024, max_priors: int = 256):
        self.cfg = cfg
        self.max_nodes = max_nodes
        self.max_edges = max_edges
        self.max_priors = max_priors
        self.nodes: list[np.ndarray] = []
        self.edges: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self.priors: list[tuple[int, np.ndarray, np.ndarray]] = []

    def add_node(self, T_init: np.ndarray) -> int:
        idx = len(self.nodes)
        self.nodes.append(np.asarray(T_init, np.float32))
        if idx == 0:
            w = 1.0 / self.cfg.prior_sigma
            self.priors.append((0, self.nodes[0], np.full(6, w, np.float32)))
        return idx

    def add_odom_edge(self, i: int, j: int, z: np.ndarray):
        w = np.concatenate([
            np.full(3, 1.0 / self.cfg.odom_trans_sigma),
            np.full(3, 1.0 / self.cfg.odom_rot_sigma),
        ]).astype(np.float32)
        self.edges.append((i, j, np.asarray(z, np.float32), w, False))

    def add_loop_edge(self, i: int, j: int, z: np.ndarray,
                      scale: float = 1.0):
        """Loop edges carry the GNC-Cauchy robust kernel when
        cfg.robust_loops: a false loop that survives the ICP fitness gate
        must not corrupt the graph (the reference's iSAM2 has no robust
        kernels — its only defense is that same gate)."""
        w = np.concatenate([
            np.full(3, 1.0 / (self.cfg.loop_trans_sigma / max(scale, 1e-3))),
            np.full(3, 1.0 / (self.cfg.loop_rot_sigma / max(scale, 1e-3))),
        ]).astype(np.float32)
        self.edges.append((i, j, np.asarray(z, np.float32), w,
                           bool(self.cfg.robust_loops)))

    def add_gps_prior(self, i: int, T: np.ndarray, sigma_xyz: np.ndarray):
        w = np.concatenate([
            1.0 / np.maximum(sigma_xyz, 1e-3), np.zeros(3)
        ]).astype(np.float32)
        self.priors.append((i, np.asarray(T, np.float32), w))

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        """Smallest power-of-two >= n (min 8), clamped to cap: the dense
        (6N, 6N) LM solve scales cubically with the node padding, so padding
        a 5-node graph to max_nodes=256 costs ~300 ms/solve for nothing.
        Each bucket compiles once."""
        b = 8
        while b < n:
            b *= 2
        return min(b, cap)

    def to_device(self) -> PoseGraph:
        n = len(self.nodes)
        e = len(self.edges)
        p = len(self.priors)
        assert n <= self.max_nodes and e <= self.max_edges and p <= self.max_priors
        pn = self._bucket(n, self.max_nodes)
        pe = self._bucket(e, self.max_edges)
        pp = self._bucket(p, self.max_priors)
        nodes = np.broadcast_to(np.eye(4, dtype=np.float32),
                                (pn, 4, 4)).copy()
        nodes[:n] = np.stack(self.nodes) if n else nodes[:0]
        node_mask = np.zeros(pn, bool)
        node_mask[:n] = True
        ei = np.zeros(pe, np.int32)
        ej = np.zeros(pe, np.int32)
        ez = np.broadcast_to(np.eye(4, dtype=np.float32),
                             (pe, 4, 4)).copy()
        ew = np.ones((pe, 6), np.float32)
        em = np.zeros(pe, bool)
        er = np.zeros(pe, bool)
        for k, (i, j, z, w, robust) in enumerate(self.edges):
            ei[k], ej[k], ez[k], ew[k], em[k], er[k] = i, j, z, w, True, robust
        pidx = np.zeros(pp, np.int32)
        pz = np.broadcast_to(np.eye(4, dtype=np.float32),
                             (pp, 4, 4)).copy()
        pw = np.ones((pp, 6), np.float32)
        pmask = np.zeros(pp, bool)
        for k, (i, z, w) in enumerate(self.priors):
            pidx[k], pz[k], pw[k], pmask[k] = i, z, w, True
        return PoseGraph(
            nodes=jnp.asarray(nodes), node_mask=jnp.asarray(node_mask),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_z=jnp.asarray(ez), edge_weight=jnp.asarray(ew),
            edge_mask=jnp.asarray(em), edge_robust=jnp.asarray(er),
            prior_idx=jnp.asarray(pidx), prior_z=jnp.asarray(pz),
            prior_weight=jnp.asarray(pw), prior_mask=jnp.asarray(pmask),
        )

    def optimize(self, iterations: int | None = None) -> np.ndarray:
        """Solve and return optimized node poses (n, 4, 4) (blocking)."""
        n, nodes_dev = self.optimize_async(iterations)
        return self.consume_optimized(n, np.asarray(nodes_dev))

    def optimize_async(self, iterations: int | None = None):
        """Dispatch the LM solve WITHOUT syncing; returns (n_nodes, device
        nodes array). Pair with `consume_optimized` after a later batched
        readback — the SLAM pipeline defers the sync to its next drain so a
        submap close never blocks the scan loop (the reference's
        subMapOptmizationThread runs at 1 Hz off the critical path for the
        same reason, subMapOptmizationNode.cpp:3798-3886)."""
        g = self.to_device()
        pn = g.nodes.shape[0]
        use_cg = self.cfg.solver == "cg" or (
            self.cfg.solver == "auto" and pn > self.cfg.dense_max_nodes)
        if use_cg:
            out = optimize_cg(g, damping=self.cfg.damping,
                              iterations=iterations or
                              self.cfg.max_iterations,
                              cg_iters=self.cfg.cg_iters,
                              robust_c=self.cfg.robust_c,
                              gnc_start_c=self.cfg.gnc_start_c)
        else:
            out = optimize(g, damping=self.cfg.damping,
                           iterations=iterations or self.cfg.max_iterations,
                           robust_c=self.cfg.robust_c,
                           gnc_start_c=self.cfg.gnc_start_c)
        return len(self.nodes), out.nodes

    def consume_optimized(self, n: int, nodes_np: np.ndarray) -> np.ndarray:
        """Install a fetched optimize_async result as the new estimates for
        the first `n` nodes (nodes added after the dispatch keep theirs)."""
        opt = np.asarray(nodes_np[:n])
        for i in range(n):
            self.nodes[i] = opt[i]
        return opt


def correct_keyframe_poses(kf_T: np.ndarray, kf_submap: np.ndarray,
                           submap_init_T: np.ndarray,
                           submap_opt_T: np.ndarray) -> np.ndarray:
    """correctPoses / transformFusion (:4346-4385, :5079-5179): keyframe pose
    = submap_opt o (submap_init^-1 o kf_init)."""
    rel = np.einsum(
        "nij,njk->nik", np.linalg.inv(submap_init_T[kf_submap]), kf_T)
    return np.einsum("nij,njk->nik", submap_opt_T[kf_submap], rel)
