"""Device-mesh utilities: multi-chip sharding for training and batched
multi-sequence SLAM replay.

The reference's "distribution" is five ROS processes on one host
(SURVEY.md section 2); the TPU-native equivalents are:
 - batched multi-sequence replay: vmap the per-scan step over sequences and
   shard the sequence axis over the 'data' mesh axis (BASELINE.json
   config 5),
 - RangeNet training: data parallelism over 'data', tensor (channel)
   parallelism over 'model' — XLA GSPMD inserts the all-reduces/all-gathers
   over ICI from the NamedSharding annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """2-D mesh (data, model). model_parallel must divide the device count."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh):
    """Batch arrays: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh):
    """Channel-parallel parameter sharding: conv kernels (kh, kw, cin, cout)
    split on cout over 'model' where divisible; everything else replicated.
    XLA turns the sharded convs into per-shard convs + collectives."""
    tp = mesh.shape["model"]

    def spec_for(path, x):
        if x.ndim == 4 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp * 8:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if x.ndim == 1 and x.shape[0] % tp == 0 and x.shape[0] >= tp * 8:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_sharding(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
