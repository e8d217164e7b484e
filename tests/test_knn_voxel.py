"""Tests for kNN (vs scipy cKDTree) and voxel downsampling (vs numpy golden)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax
import jax.numpy as jnp

from lis_slam_tpu.ops import knn, voxel


@pytest.fixture(scope="module")
def clouds(rng=None):
    r = np.random.default_rng(7)
    sparse = r.uniform(-40, 40, size=(8000, 3)).astype(np.float32)
    # plant dense clusters so the 5-within-1.0m correspondence gate triggers
    centers = r.uniform(-40, 40, size=(1500, 3)).astype(np.float32)
    clustered = (
        centers[:, None, :] + r.normal(0, 0.25, (1500, 8, 3))
    ).reshape(-1, 3).astype(np.float32)
    ref = np.concatenate([sparse, clustered])
    q = centers[:500] + r.normal(0, 0.1, (500, 3)).astype(np.float32)
    return q.astype(np.float32), ref


def test_knn_bruteforce_exact(clouds):
    q, ref = clouds
    mask = np.ones(len(ref), bool)
    d, i = knn.knn_bruteforce(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask), k=5)
    tree = cKDTree(ref)
    dref, iref = tree.query(q, k=5)
    np.testing.assert_allclose(np.asarray(d), dref**2, rtol=1e-3, atol=1e-4)
    # indices may differ on ties; compare distances instead plus exact match rate
    match = (np.asarray(i) == iref).mean()
    assert match > 0.99


def test_knn_bruteforce_respects_mask(clouds):
    q, ref = clouds
    mask = np.zeros(len(ref), bool)
    mask[: len(ref) // 2] = True
    d, i = knn.knn_bruteforce(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask), k=5)
    assert int(np.asarray(i).max()) < len(ref) // 2
    tree = cKDTree(ref[mask])
    dref, _ = tree.query(q, k=5)
    np.testing.assert_allclose(np.asarray(d), dref**2, rtol=1e-3, atol=1e-4)


def test_knn_hash_parity_within_gate(clouds):
    """Within the 1.0 sq-dist correspondence gate, the hash search must agree
    with exact brute force."""
    q, ref = clouds
    mask = np.ones(len(ref), bool)
    db, ib = knn.knn_bruteforce(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask), k=5)
    hmap = knn.build_hash(jnp.asarray(ref), jnp.asarray(mask), cell_size=1.0,
                          table_size=1 << 15)
    dh, ih = knn.knn_hash(jnp.asarray(q), hmap, k=5, bucket_cap=32)
    db, dh = np.asarray(db), np.asarray(dh)
    # queries whose exact 5th NN is within the gate
    gated = db[:, 4] < 1.0
    agree = np.isclose(dh[gated], db[gated], rtol=1e-3, atol=1e-4).all(axis=1)
    assert agree.mean() > 0.995, f"hash/bruteforce agreement {agree.mean():.4f}"


def test_knn_hash_indices_point_to_original_buffer(clouds):
    q, ref = clouds
    mask = np.ones(len(ref), bool)
    hmap = knn.build_hash(jnp.asarray(ref), jnp.asarray(mask), cell_size=1.0)
    dh, ih = knn.knn_hash(jnp.asarray(q[:50]), hmap, k=5)
    dh, ih = np.asarray(dh), np.asarray(ih)
    ok = np.isfinite(dh) & (dh < 1e30)
    # re-computing the distance from the original buffer must agree
    d2 = ((q[:50, None, :] - ref[ih]) ** 2).sum(-1)
    np.testing.assert_allclose(d2[ok], dh[ok], rtol=1e-3, atol=1e-4)


def golden_voxel(points, leaf):
    cells = np.floor(points / leaf).astype(np.int64)
    out = {}
    for p, c in zip(points, map(tuple, cells)):
        out.setdefault(c, []).append(p)
    return {c: np.mean(v, axis=0) for c, v in out.items()}


def test_voxel_downsample_matches_golden():
    r = np.random.default_rng(3)
    pts = r.uniform(-5, 5, (3000, 3)).astype(np.float32)
    mask = np.ones(3000, bool)
    mask[2500:] = False
    out, omask, n = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), leaf=0.5, capacity=4096,
        centroid=True,
    )
    golden = golden_voxel(pts[:2500].astype(np.float64), 0.5)
    out = np.asarray(out)[np.asarray(omask)]
    assert int(n) == len(golden)
    assert len(out) == len(golden)
    gold_set = np.asarray(sorted(map(tuple, np.round(list(golden.values()), 4))))
    out_set = np.asarray(sorted(map(tuple, np.round(out, 4))))
    np.testing.assert_allclose(out_set, gold_set, atol=2e-3)


def test_voxel_downsample_capacity_clamp():
    r = np.random.default_rng(4)
    pts = r.uniform(-50, 50, (5000, 3)).astype(np.float32)
    out, omask, n = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.ones(5000, bool), leaf=0.1, capacity=256
    )
    assert int(np.asarray(omask).sum()) <= 256
    assert int(n) == 256


def test_compact_masked():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    mask = np.array([1, 0, 1, 1, 0, 0, 1, 0, 0, 1], bool)
    out, om = voxel.compact_masked(jnp.asarray(pts), jnp.asarray(mask), 8)
    assert int(np.asarray(om).sum()) == 5
    np.testing.assert_array_equal(np.asarray(out)[:5], pts[mask])


def test_voxel_downsample_first_point_default():
    r = np.random.default_rng(9)
    pts = r.uniform(-5, 5, (4000, 3)).astype(np.float32)
    mask = np.ones(4000, bool)
    out, omask, n = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), leaf=0.5, capacity=4096
    )
    out = np.asarray(out)[np.asarray(omask)]
    golden = golden_voxel(pts.astype(np.float64), 0.5)
    assert int(n) == len(golden) == len(out)
    # every representative is an actual input point
    inset = {tuple(np.round(p, 5)) for p in pts}
    assert all(tuple(np.round(p, 5)) in inset for p in out)
    # one representative per occupied voxel
    cells = {tuple(c) for c in np.floor(out / 0.5).astype(np.int64)}
    assert len(cells) == len(out)


def test_no_executable_cache_collision_after_ndt():
    """Regression (round-2 VERDICT weak #6): module-level jnp scalar
    constants (e.g. the old `_SENTINEL = jnp.uint32(...)`) are device
    buffers that get LIFTED as executable parameters when closed over in a
    jitted function; the runtime arg-passing path could then disagree with
    the lifting decision after unrelated programs (icp.build_ndt) populated
    the cache — "Execution supplied 2 buffers but compiled program expected
    4". With numpy-scalar constants the constants inline as literals and
    this exact call order must work."""
    import numpy as np

    from lis_slam_tpu.ops import icp

    rng = np.random.default_rng(0)
    g = rng.uniform(-10, 10, (3000, 2))
    ground = np.column_stack([g, np.zeros(3000)])
    wx = rng.uniform(-10, 10, 2000)
    wz = rng.uniform(0, 5, 2000)
    wall1 = np.column_stack([wx, np.full(2000, 10.0), wz])
    wall2 = np.column_stack([np.full(2000, -10.0), wx, wz])
    tgt = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    grid = icp.build_ndt(jnp.asarray(tgt), jnp.ones(len(tgt), bool),
                         resolution=2.0)
    jax.block_until_ready(grid.mean)
    allp = jnp.asarray(rng.uniform(-5, 5, (256, 3)).astype(np.float32))
    out, om, _ = voxel.voxel_downsample(allp, jnp.ones(256, bool), 0.2, 8192)
    jax.block_until_ready(out)
    allp2 = jnp.asarray(rng.uniform(-5, 5, (1024, 3)).astype(np.float32))
    out2, om2, _ = voxel.voxel_downsample(
        allp2, jnp.ones(1024, bool), 0.4, 16384)
    jax.block_until_ready(out2)
    assert int(np.asarray(om).sum()) > 0 and int(np.asarray(om2).sum()) > 0
