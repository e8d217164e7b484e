"""End-to-end semantic inference path: projected scan -> RangeNet -> labels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lis_slam_tpu.config import SemanticConfig, SensorConfig
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.models import rangenet
from lis_slam_tpu.ops import pretreatment, projection
from lis_slam_tpu.semantic import fusion


def test_infer_labels_on_projected_scan():
    """Random-weight net (no released weights in this env): the full
    projection -> normalize -> forward -> argmax -> category path must run
    under jit with correct shapes and masking."""
    world = synthetic.make_world(seed=2)
    scan = synthetic.render_scan(world, np.array([0, 0, 0.1, 2.0, 1.0, 1.8]),
                                 seed=3)
    scfg = SensorConfig(max_raw_points=64 * 1800, downsample_rate=1)
    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), scfg)
    img = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time,
        pre.valid, scfg)

    mcfg = SemanticConfig(model_input_h=64, model_input_w=1800)
    model, variables = rangenet.init_params(jax.random.PRNGKey(0), mcfg,
                                            input_w=1800)
    infer = jax.jit(lambda r, x, i, m: fusion.infer_labels(
        model, variables, r, x, i, m, mcfg))
    sem = infer(img.rng, img.xyz, img.intensity, img.mask)
    lab = np.asarray(sem.labels)
    cat = np.asarray(sem.category)
    mask = np.asarray(img.mask)
    assert lab.shape == mask.shape
    assert (lab[mask] >= 0).all() and (lab[mask] < 20).all()
    assert (cat[~mask] == -1).all()
    w = np.asarray(sem.weight)
    assert np.isfinite(w).all()
    assert (np.asarray(sem.probs_max)[mask] > 0).all()


def test_category_mask_and_rgb():
    lab = jnp.asarray([[9, 13, 18]], dtype=jnp.int32)
    mask = jnp.ones((1, 3), bool)
    sem = fusion.label_images(lab, mask)
    ground = np.asarray(fusion.category_mask(sem, 1))
    np.testing.assert_array_equal(ground, [[True, False, False]])
    rgb = fusion.labels_to_rgb(np.asarray(lab))
    assert rgb.shape == (1, 3, 3)
    assert rgb.dtype == np.uint8
