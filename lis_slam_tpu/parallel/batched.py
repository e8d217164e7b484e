"""Batched multi-sequence odometry replay (BASELINE.json config 5).

The reference processes one rosbag at a time; on TPU the per-scan step is a
pure function of (state, scan), so B sequences replay simultaneously by
vmapping the whole step over a leading sequence axis and sharding that axis
over the device mesh ('data'). On one chip this batches the MXU/VPU work;
on a pod slice XLA shards it across ICI with zero code change.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..pipeline import odometry


def batched_init_state(cfg: SlamConfig, batch: int) -> odometry.OdomState:
    one = odometry.init_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one
    )


@functools.partial(jax.jit, static_argnames=("cfg", "allow_kf"),
                   donate_argnums=(0,))
def batched_odom_step(states, scans, cfg: SlamConfig, allow_kf: bool = True):
    """vmapped per-scan step over the leading sequence axis.

    Uses the cond-free (uniform) step variant: under vmap, lax.cond runs
    both branches, so the conditional single-sequence step would pay the
    keyframe map merge every scan AND a kNN search every GN iteration. The
    uniform variant (masked keyframe insert + static-refresh-schedule
    solver) makes both costs explicit and fixed. Per-sequence results are
    exactly equal to the single-sequence `odom_step_uniform` (and within
    solver noise of `odom_step`, see test_uniform_step_matches_cond_step).

    allow_kf=False compiles the step WITHOUT the masked keyframe merge —
    the merge is ~47% of the vmapped per-lane cost because lanes diverge
    and every scan pays it. The replay driver calls the merge-free program
    between merge steps (host cadence, RuntimeConfig.batched_kf_every);
    keyframe timing quantizes to the cadence, map semantics unchanged."""
    if getattr(cfg.matching, "gn_backend", "xla") != "xla":
        # a Pallas call cannot batch under vmap: the vmapped replay always
        # runs the XLA iteration body (the cond-free schedule already
        # amortizes what the fused kernel saves on the per-scan path)
        import dataclasses

        cfg = cfg.replace(
            matching=dataclasses.replace(cfg.matching, gn_backend="xla"))
    return jax.vmap(
        lambda s, sc: odometry.odom_step_uniform(
            s, sc, cfg, allow_kf=allow_kf))(states, scans)


def make_sharded_step(cfg: SlamConfig, mesh: Mesh):
    """Shard the sequence axis over the mesh's 'data' axis (flattened)."""
    seq_sharding = NamedSharding(mesh, P("data"))

    def shard(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
            ),
            tree,
        )

    step = jax.jit(
        lambda states, scans, allow_kf=True: batched_odom_step(
            states, scans, cfg, allow_kf=allow_kf),
        donate_argnums=(0,), static_argnames=("allow_kf",),
    )
    return step, shard, seq_sharding


def replay_batched(sequences, cfg: SlamConfig, mesh: Mesh | None = None):
    """sequences: list of lists of ScanInput (equal length). Returns poses
    (B, N, 6). Keyframe merges run on the host cadence
    cfg.runtime.batched_kf_every (1 = every scan, exactly the uniform
    step; scan 0 always merges so the map is seeded)."""
    batch = len(sequences)
    n = min(len(s) for s in sequences)
    kf_every = max(1, cfg.runtime.batched_kf_every)
    states = batched_init_state(cfg, batch)
    if mesh is not None:
        step, shard, _ = make_sharded_step(cfg, mesh)
        states = shard(states)
    else:
        step = lambda st, sc, allow_kf=True: batched_odom_step(
            st, sc, cfg, allow_kf=allow_kf)
        shard = lambda x: x
    poses = []
    for i in range(n):
        scans = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[sequences[b][i] for b in range(batch)]
        )
        if mesh is not None:
            scans = shard(scans)
        states, outs = step(states, scans, allow_kf=(i % kf_every == 0))
        poses.append(outs.pose)
    return np.asarray(jnp.stack(poses, axis=1))
