"""RangeNet semantic-segmentation training step (optax), mesh-sharded.

The reference ships only a pretrained TensorRT engine (no training code);
this module closes that gap TPU-natively: masked cross-entropy over the
spherical range image, Adam, bf16 compute / f32 params, dp ('data') x tp
('model') sharding via NamedSharding annotations — XLA GSPMD places the
gradient all-reduce on ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import SemanticConfig
from ..models import rangenet


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_train_state(key, cfg: SemanticConfig, lr: float = 1e-3,
                       input_w: int | None = None):
    model, variables = rangenet.init_params(key, cfg, input_w=input_w)
    tx = optax.adam(lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, tx, TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def loss_fn(model, params, batch_stats, images, labels, mask):
    """Masked softmax cross-entropy (+ batch-stats update)."""
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images, train=True, mutable=["batch_stats"],
    )
    logp = jax.nn.log_softmax(out, axis=-1)
    onehot = jax.nn.one_hot(labels, out.shape[-1], dtype=logp.dtype)
    ce = -jnp.sum(onehot * logp, axis=-1)
    ce = jnp.where(mask, ce, 0.0)
    loss = jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1)
    return loss, mutated["batch_stats"]


def make_train_step(model, tx):
    """Returns train_step(state, images, labels, mask) -> (state, metrics)."""

    def train_step(state: TrainState, images, labels, mask):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, state.batch_stats, images, labels, mask),
            has_aux=True,
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        ), metrics

    return train_step


def make_sharded_train_step(model, tx, mesh):
    """jit the train step with dp x tp shardings over the mesh. For
    additional spatial/width sharding (a 'space' mesh axis), annotate the
    image/label/mask inputs with parallel.mesh.shard_images/shard_planes at
    the call site — the jitted step propagates whatever input shardings it
    receives and XLA inserts the conv halo exchanges."""
    from ..parallel import mesh as pmesh

    batch_sh = pmesh.shard_batch(mesh)
    repl = pmesh.replicated(mesh)
    step = make_train_step(model, tx)

    def sharding_tree(state: TrainState):
        p_sh = pmesh.shard_params_tp(state.params, mesh)
        bs_sh = jax.tree_util.tree_map(lambda _: repl, state.batch_stats)
        opt_sh = jax.tree_util.tree_map(lambda _: repl, state.opt_state)
        return TrainState(params=p_sh, batch_stats=bs_sh, opt_state=opt_sh,
                          step=repl)

    def shard_state(state: TrainState):
        sh = sharding_tree(state)
        return jax.tree_util.tree_map(jax.device_put, state, sh)

    jitted = jax.jit(step)

    return jitted, shard_state, batch_sh
