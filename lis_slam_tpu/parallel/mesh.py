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


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              spatial_parallel: int = 1) -> Mesh:
    """Mesh over (data, model[, space]). model_parallel * spatial_parallel
    must divide the device count.

    'space' shards the image WIDTH axis (sequence-parallel for a conv net:
    XLA GSPMD turns spatially-sharded convolutions into per-shard convs +
    halo exchanges over ICI) — RangeNet's 64x2048 spherical input is wide,
    so width sharding parallelizes a SINGLE scan's inference/training
    across chips, on top of dp over images and tp over channels."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    assert n % (model_parallel * spatial_parallel) == 0, (
        n, model_parallel, spatial_parallel)
    if spatial_parallel > 1:
        arr = np.asarray(devs).reshape(
            n // (model_parallel * spatial_parallel), model_parallel,
            spatial_parallel)
        return Mesh(arr, axis_names=("data", "model", "space"))
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh):
    """Batch arrays: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_images(mesh: Mesh):
    """(B, H, W, C) images: batch over 'data', width over 'space' when the
    mesh has a spatial axis (the conv halo exchanges are XLA-inserted)."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "space", None))
    return NamedSharding(mesh, P("data"))


def shard_planes(mesh: Mesh):
    """(B, H, W) label/mask planes: companion to shard_images."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "space"))
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
