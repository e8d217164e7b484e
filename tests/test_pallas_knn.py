"""Pallas fused k-NN kernel: exactness vs scipy cKDTree (interpret mode)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from lis_slam_tpu.ops import pallas_knn


@pytest.fixture(scope="module")
def clouds():
    r = np.random.default_rng(11)
    ref = r.uniform(-30, 30, (4096, 3)).astype(np.float32)
    q = r.uniform(-30, 30, (512, 3)).astype(np.float32)
    return q, ref


def test_pallas_knn_exact(clouds):
    q, ref = clouds
    d, i, near = pallas_knn.knn_pallas(
        jnp.asarray(q), jnp.asarray(ref), jnp.ones(len(ref), bool),
        k=5, query_block=128, tile_n=512, interpret=True,
    )
    tree = cKDTree(ref)
    dref, iref = tree.query(q, k=5)
    np.testing.assert_allclose(np.asarray(d), dref**2, rtol=1e-3, atol=1e-4)
    assert (np.asarray(i) == iref).mean() > 0.99  # ties may reorder
    # neighbor coords match the indexed reference points
    np.testing.assert_allclose(np.asarray(near), ref[np.asarray(i)], atol=1e-5)


def test_pallas_knn_respects_mask(clouds):
    q, ref = clouds
    mask = np.zeros(len(ref), bool)
    mask[:2048] = True
    d, i, _ = pallas_knn.knn_pallas(
        jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask),
        k=5, query_block=128, tile_n=512, interpret=True,
    )
    assert int(np.asarray(i).max()) < 2048
    tree = cKDTree(ref[:2048])
    dref, _ = tree.query(q, k=5)
    np.testing.assert_allclose(np.asarray(d), dref**2, rtol=1e-3, atol=1e-4)


def test_pallas_knn_unaligned_sizes(clouds):
    """Query/ref counts not divisible by the block sizes are padded."""
    q, ref = clouds
    d, i, _ = pallas_knn.knn_pallas(
        jnp.asarray(q[:300]), jnp.asarray(ref[:3000]),
        jnp.ones(3000, bool), k=3, query_block=128, tile_n=512,
        interpret=True,
    )
    assert d.shape == (300, 3)
    tree = cKDTree(ref[:3000])
    dref, _ = tree.query(q[:300], k=3)
    np.testing.assert_allclose(np.asarray(d), dref**2, rtol=1e-3, atol=1e-4)
