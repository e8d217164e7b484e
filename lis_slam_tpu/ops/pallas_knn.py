"""Pallas TPU kernel: fused brute-force k-nearest-neighbor.

The XLA formulation of exact k-NN (chunked |q|^2+|r|^2-2qr + top_k) streams
the (Q, N) distance matrix through HBM (~12 ms at 2048 x 131k on v5e). This
kernel keeps everything on-chip: the reference cloud lives in VMEM, each
grid step processes one query block, distance tiles are produced on the MXU
and consumed immediately by an in-register iterated-min top-k — the Q x N
matrix never exists.

Tile skipping (two levels, both exact):
 1. AABB precheck: per-tile axis-aligned bounds are precomputed outside the
    kernel (the map is morton-ordered — see ops.voxel.voxel_merge_aged — so
    tiles are spatially compact); a tile whose box cannot contain any point
    closer than the block's worst current k-th best skips the MXU matmul
    entirely.
 2. min-distance check: a surviving tile whose computed min distance still
    cannot improve any query skips the k extraction passes.
 3. `max_sq_dist` caps the search radius: callers that discard candidates
    beyond a gate (scan_match gates at 4.0 m^2) pass it so the k-th-best
    bound starts tight and far tiles always skip — neighbors beyond the cap
    come back with index -1.

The kernel also emits the winner coordinates via one-hot MXU matmuls, so
callers get (dists, indices, neighbor xyz) without a post-kernel gather —
XLA random-row gathers cost ~0.5 ms per 10k rows on TPU.

Layout note: point buffers are stored TRANSPOSED, (4, N) = [x, y, z, |r|^2],
so the short axis sits on the 8-sublane dimension. An (N, 3) block would pad
the 3-wide lane dimension to 128 and blow the VMEM budget 42x.

Exactness matches scipy cKDTree (tests, incl. on-device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3e38  # plain float: jnp constants cannot be captured by pallas kernels


def _knn_kernel(q_ref, ref_ref, aabb_ref, out_d_ref, out_i_ref, out_c_ref,
                *, k: int, tile_n: int, n_total: int, init_d: float):
    """One query block vs the whole reference cloud.

    q_ref: (4, QB) VMEM [x, y, z, |q|^2 rows]; ref_ref: (4, N) VMEM
    [x, y, z, |r|^2 (+inf for masked)]; aabb_ref: (8, n_tiles) VMEM
    [lox loy loz pad hix hiy hiz pad]; outputs (QB, k) d/i and (QB, 3k)
    neighbor coords laid out [x0..xk, y0..yk, z0..zk].
    """
    q = q_ref[0:3, :]  # (3, QB)
    qn = q_ref[3:4, :]  # (1, QB)
    qb = q.shape[1]
    n_tiles = n_total // tile_n

    # query block bounds (padding replicates a real query, so min/max are
    # true bounds)
    q_lo = jnp.min(q, axis=1)  # (3,)
    q_hi = jnp.max(q, axis=1)

    def extract(j, st):
        d_, rt, base, bd, bi, bc = st
        m = jnp.min(d_, axis=1)  # (QB,)
        am = jnp.argmin(d_, axis=1)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, d_.shape, 1) == am[:, None]
        )
        d_ = jnp.where(onehot, _INF, d_)
        idx = am.astype(jnp.int32) + base
        # winner coordinates via one-hot matmul (no vector gather on TPU)
        coords = jax.lax.dot_general(
            onehot.astype(jnp.float32), rt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (QB, 3)
        # bd is sorted ascending (invariant): `worse` is a suffix mask and
        # doubles as the shift mask. Mask plumbing in f32 — Mosaic cannot
        # concatenate i1 vectors.
        worse = (bd > m[:, None]).astype(jnp.float32)  # (QB, k)
        if k == 1:
            prev_worse = jnp.zeros((qb, 1), jnp.float32)
        else:
            prev_worse = jnp.concatenate(
                [jnp.zeros((qb, 1), jnp.float32), worse[:, :-1]], axis=1)
        pos = worse * (1.0 - prev_worse)  # first worse slot
        if k == 1:  # zero-width slices are not Mosaic-legal
            shifted_bd = jnp.full((qb, 1), -_INF, jnp.float32)
            shifted_bi = jnp.zeros((qb, 1), jnp.int32)
        else:
            shifted_bd = jnp.concatenate(
                [jnp.full((qb, 1), -_INF, jnp.float32), bd[:, :-1]], axis=1)
            shifted_bi = jnp.concatenate(
                [jnp.zeros((qb, 1), jnp.int32), bi[:, :-1]], axis=1)
        new_bd = jnp.where(worse > 0.5, shifted_bd, bd)
        new_bi = jnp.where(worse > 0.5, shifted_bi, bi)
        new_bd = jnp.where(pos > 0.5, m[:, None], new_bd)
        new_bi = jnp.where(pos > 0.5, idx[:, None], new_bi)
        # coords: same shift/insert per axis, bc is (QB, 3k) blocked by axis
        worse3 = jnp.concatenate([worse, worse, worse], axis=1)
        pos3 = jnp.concatenate([pos, pos, pos], axis=1)
        if k == 1:
            shifted_bc = jnp.zeros((qb, 3), jnp.float32)
        else:
            shifted_bc = jnp.concatenate(
                [
                    jnp.zeros((qb, 1), jnp.float32), bc[:, : k - 1],
                    jnp.zeros((qb, 1), jnp.float32), bc[:, k: 2 * k - 1],
                    jnp.zeros((qb, 1), jnp.float32), bc[:, 2 * k: 3 * k - 1],
                ],
                axis=1,
            )
        cvals = jnp.concatenate(
            [
                jnp.broadcast_to(coords[:, 0:1], (qb, k)),
                jnp.broadcast_to(coords[:, 1:2], (qb, k)),
                jnp.broadcast_to(coords[:, 2:3], (qb, k)),
            ],
            axis=1,
        )
        new_bc = jnp.where(worse3 > 0.5, shifted_bc, bc)
        new_bc = jnp.where(pos3 > 0.5, cvals, new_bc)
        return d_, rt, base, new_bd, new_bi, new_bc

    def compute_tile(t, carry):
        best_d, best_i, best_c = carry
        rt = ref_ref[0:3, pl.ds(t * tile_n, tile_n)]  # (3, TN)
        rn = ref_ref[3:4, pl.ds(t * tile_n, tile_n)]  # (1, TN)
        cross = jax.lax.dot_general(
            q, rt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = qn.T + rn - 2.0 * cross  # (QB, TN)
        base = t * tile_n

        # second-level check: skip the extraction passes when no distance in
        # this tile can improve any query's current k-th best
        could_improve = jnp.min(d) < jnp.max(best_d[:, k - 1])

        def work(args):
            d_, bd, bi, bc = args
            out = jax.lax.fori_loop(
                0, k, extract, (d_, rt, base, bd, bi, bc))
            return out[3], out[4], out[5]

        def skip(args):
            _d, bd, bi, bc = args
            return bd, bi, bc

        return jax.lax.cond(
            could_improve, work, skip, (d, best_d, best_i, best_c))

    qlo_x, qlo_y, qlo_z = q_lo[0], q_lo[1], q_lo[2]
    qhi_x, qhi_y, qhi_z = q_hi[0], q_hi[1], q_hi[2]

    def tile_body(t, carry):
        best_d, _bi, _bc = carry
        # first-level check: AABB lower bound vs the block's worst k-th
        # best. The AABB table lives in SMEM: scalar loads with a dynamic
        # tile index (vector-lane dynamic slicing is not Mosaic-legal).
        gx = jnp.maximum(
            jnp.maximum(aabb_ref[0, t] - qhi_x, qlo_x - aabb_ref[4, t]), 0.0)
        gy = jnp.maximum(
            jnp.maximum(aabb_ref[1, t] - qhi_y, qlo_y - aabb_ref[5, t]), 0.0)
        gz = jnp.maximum(
            jnp.maximum(aabb_ref[2, t] - qhi_z, qlo_z - aabb_ref[6, t]), 0.0)
        lb = gx * gx + gy * gy + gz * gz
        worst = jnp.max(best_d[:, k - 1])
        return jax.lax.cond(
            lb < worst, lambda c: compute_tile(t, c), lambda c: c, carry)

    init = (
        jnp.full((qb, k), init_d, jnp.float32),
        jnp.full((qb, k), -1, jnp.int32),
        jnp.zeros((qb, 3 * k), jnp.float32),
    )
    best_d, best_i, best_c = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    out_d_ref[:] = best_d
    out_i_ref[:] = best_i
    out_c_ref[:] = best_c


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_block", "tile_n", "interpret", "max_sq_dist"),
)
def knn_pallas(
    query: jnp.ndarray,  # (Q, 3) f32
    ref: jnp.ndarray,  # (N, 3) f32
    ref_mask: jnp.ndarray,  # (N,)
    k: int = 5,
    query_block: int = 256,
    tile_n: int = 2048,
    interpret: bool = False,
    max_sq_dist: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact k-NN. Returns (sq_dists (Q,k) ascending, indices (Q,k),
    neighbor coords (Q,k,3)). With `max_sq_dist`, neighbors beyond that
    radius are not searched for: their slots return d=inf, index=-1.

    Index -1 is the universal "unfilled slot" sentinel — it also appears
    WITHOUT max_sq_dist when the reference cloud has fewer than k valid
    points; callers gathering by index must check the distance (or index
    >= 0) first."""
    q_n, n = query.shape[0], ref.shape[0]
    padq = (-q_n) % query_block
    if padq:
        # pad by replicating the first query: far-away pad points would pin
        # every block's worst-kth-best at ~1e12 and defeat tile skipping
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[0:1], (padq, 3))])
    padn = (-n) % tile_n
    if padn:
        ref = jnp.concatenate([ref, jnp.zeros((padn, 3), ref.dtype)])
        ref_mask = jnp.concatenate([ref_mask, jnp.zeros((padn,), bool)])
    n_tot = ref.shape[0]
    n_tiles = n_tot // tile_n
    # transposed packed buffers: rows x,y,z,|.|^2
    qt = jnp.concatenate(
        [query.T, jnp.sum(query * query, axis=1)[None, :]], axis=0)
    rn = jnp.where(ref_mask, jnp.sum(ref * ref, axis=1), _INF)
    rt = jnp.concatenate([ref.T, rn[None, :]], axis=0)

    # per-tile AABBs (masked points excluded; empty tiles -> [inf, -inf]
    # so their lower-bound distance is +inf and they always skip)
    r3 = ref.reshape(n_tiles, tile_n, 3)
    m3 = ref_mask.reshape(n_tiles, tile_n, 1)
    lo = jnp.min(jnp.where(m3, r3, _INF), axis=1)  # (n_tiles, 3)
    hi = jnp.max(jnp.where(m3, r3, -_INF), axis=1)
    pad_row = jnp.zeros((n_tiles, 1), jnp.float32)
    aabb = jnp.concatenate([lo, pad_row, hi, pad_row], axis=1).T  # (8, T)

    init_d = float(max_sq_dist) if max_sq_dist is not None else _INF

    grid = (query.shape[0] // query_block,)
    out_d, out_i, out_c = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tile_n=tile_n, n_total=n_tot,
                          init_d=init_d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, query_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_tiles), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((query_block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_block, 3 * k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((query.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((query.shape[0], k), jnp.int32),
            jax.ShapeDtypeStruct((query.shape[0], 3 * k), jnp.float32),
        ),
        interpret=interpret,
    )(qt, rt, aabb)
    out_d = out_d[:q_n]
    out_i = out_i[:q_n]
    near = jnp.stack(
        [out_c[:q_n, 0:k], out_c[:q_n, k:2 * k], out_c[:q_n, 2 * k:3 * k]],
        axis=2,
    )  # (Q, k, 3)
    # exact distances for the winners (matmul form loses ~1e-3 to
    # cancellation, same fix as ops.knn.knn_bruteforce); unfilled slots
    # (index -1: nothing within max_sq_dist) -> inf
    filled = out_i >= 0
    diff = near - query[:q_n, None, :]
    d_exact = jnp.where(filled, jnp.sum(diff * diff, axis=-1), _INF)
    order = jnp.argsort(d_exact, axis=1)
    return (
        jnp.take_along_axis(d_exact, order, axis=1),
        jnp.take_along_axis(out_i, order, axis=1),
        jnp.take_along_axis(near, order[..., None], axis=1),
    )


def knn(query, ref, ref_mask, k: int = 5, query_block: int = 256,
        tile_n: int = 2048, max_sq_dist: float | None = None):
    """Backend-dispatching exact k-NN: the Pallas kernel on TPU, interpret
    mode elsewhere (CPU tests). For best performance `ref` should be
    morton-ordered (voxel_merge_aged output is) — correctness holds for any
    order. Returns (sq_dists, indices, neighbor_xyz)."""
    interpret = jax.default_backend() != "tpu"
    return knn_pallas(query, ref, ref_mask, k=k, query_block=query_block,
                      tile_n=tile_n, interpret=interpret,
                      max_sq_dist=max_sq_dist)
