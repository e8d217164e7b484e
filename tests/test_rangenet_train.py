"""RangeNet model, semantic fusion, training step, and sharding tests.

The whole file is slow-tier: even the forward-only tests compile
multi-block convnets on the CPU harness (~7 min for the file), which
blows the <5 min fast-tier budget (VERDICT r3 #8)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from lis_slam_tpu import labels as L
from lis_slam_tpu.config import SemanticConfig
from lis_slam_tpu.models import rangenet
from lis_slam_tpu.semantic import fusion
from lis_slam_tpu.train import seg_train
from lis_slam_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def small_cfg():
    return SemanticConfig(model_input_h=64, model_input_w=128)


def test_rangenet_shapes(small_cfg):
    model, variables = rangenet.init_params(jax.random.PRNGKey(0), small_cfg,
                                            input_w=128)
    x = jnp.zeros((2, 64, 128, 5))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 128, 20)
    assert out.dtype == jnp.float32  # head in f32 even with bf16 body


def test_rangenet_width_only_downsampling(small_cfg):
    """Encoder must keep all 64 rows (strides only in width)."""
    model = rangenet.Darknet53Encoder()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 5)))
    enc, skips = model.apply(variables, jnp.zeros((1, 64, 128, 5)))
    assert enc.shape[1] == 64  # height preserved
    assert enc.shape[2] == 128 // 32  # OS-32 in width


def test_normalization(small_cfg):
    img = jnp.asarray(np.tile(np.asarray(small_cfg.img_means, np.float32),
                              (4, 8, 1)))
    out = rangenet.normalize_input(img, small_cfg)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_label_images_category_and_weight():
    lab = jnp.asarray([[1, 9, 13, 18, 15, 0]], dtype=jnp.int32)
    mask = jnp.asarray([[True, True, True, True, True, False]])
    sem = fusion.label_images(lab, mask)
    cat = np.asarray(sem.category)[0]
    # car->dynamic(0), road->ground(1), building(2), pole(3), vegetation->outlier(4)
    assert list(cat[:5]) == [0, 1, 2, 3, 4]
    assert cat[5] == -1
    w = np.asarray(sem.weight)[0]
    np.testing.assert_allclose(w[:5], 2.0 - L.LABEL_SCORE[[1, 9, 13, 18, 15]])
    assert w[5] == 1.0


def test_train_step_reduces_loss(small_cfg):
    key = jax.random.PRNGKey(0)
    model, tx, state = seg_train.create_train_state(key, small_cfg, lr=3e-3,
                                                    input_w=128)
    step = jax.jit(seg_train.make_train_step(model, tx))
    r = np.random.default_rng(0)
    images = jnp.asarray(r.normal(size=(2, 64, 128, 5)), jnp.float32)
    labels = jnp.asarray(r.integers(0, 20, (2, 64, 128)), jnp.int32)
    mask = jnp.ones((2, 64, 128), bool)
    losses = []
    for _ in range(5):
        state, metrics = step(state, images, labels, mask)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a fixed batch


def test_sharded_train_step_runs_on_mesh(small_cfg):
    mesh = pmesh.make_mesh(8, model_parallel=2)
    key = jax.random.PRNGKey(1)
    model, tx, state = seg_train.create_train_state(key, small_cfg, input_w=128)
    jitted, shard_state, batch_sh = seg_train.make_sharded_train_step(
        model, tx, mesh)
    state = shard_state(state)
    images = jax.device_put(jnp.zeros((4, 64, 128, 5)), batch_sh)
    labels = jax.device_put(jnp.zeros((4, 64, 128), jnp.int32), batch_sh)
    mask = jax.device_put(jnp.ones((4, 64, 128), bool), batch_sh)
    state, metrics = jitted(state, images, labels, mask)
    assert np.isfinite(float(metrics["loss"]))
    # params actually sharded over the model axis
    from jax.sharding import PartitionSpec as P
    specs = [
        x.sharding.spec for x in jax.tree_util.tree_leaves(state.params)
        if hasattr(x, "sharding") and x.ndim == 4 and x.shape[-1] >= 64
    ]
    assert any(s == P(None, None, None, "model") for s in specs)


def test_spatial_width_sharded_train_step(small_cfg):
    """dp x tp x sp mesh: the image WIDTH axis is sharded over 'space' and
    the convolutions still train (XLA inserts the halo exchanges)."""
    from jax.sharding import PartitionSpec as P

    mesh = pmesh.make_mesh(8, model_parallel=2, spatial_parallel=2)
    assert mesh.shape == {"data": 2, "model": 2, "space": 2}
    key = jax.random.PRNGKey(2)
    model, tx, state = seg_train.create_train_state(key, small_cfg,
                                                    input_w=128)
    jitted, shard_state, _ = seg_train.make_sharded_train_step(
        model, tx, mesh)
    state = shard_state(state)
    images = jax.device_put(jnp.zeros((2, 64, 128, 5)),
                            pmesh.shard_images(mesh))
    labels = jax.device_put(jnp.zeros((2, 64, 128), jnp.int32),
                            pmesh.shard_planes(mesh))
    mask = jax.device_put(jnp.ones((2, 64, 128), bool),
                          pmesh.shard_planes(mesh))
    assert images.sharding.spec == P("data", None, "space", None)
    state, metrics = jitted(state, images, labels, mask)
    assert np.isfinite(float(metrics["loss"]))
