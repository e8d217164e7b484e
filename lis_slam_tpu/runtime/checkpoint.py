"""Checkpoint / resume for the SLAM engine.

The reference has NO mid-run persistence (SURVEY.md section 5: end-of-run
artifacts only). This module closes that gap: the whole jitted odometry
state (a pytree of fixed-shape arrays) plus the host-side back-end
bookkeeping serialize to one .npz, so a replay can stop and resume
bit-exactly — and the end-of-run artifacts (PCD map, KITTI trajectory)
match the reference's savePCD / saveTrajectory outputs.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from ..pipeline import odometry


def _flatten_state(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def save_odom_state(path: str, state: odometry.OdomState, extra: dict | None = None):
    arrs = _flatten_state(state)
    meta = {"n_leaves": len(arrs)}
    if extra:
        meta["extra"] = extra
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrs)


def load_odom_state(path: str, template: odometry.OdomState) -> tuple:
    """Returns (state, extra). `template` provides the pytree structure
    (from odometry.init_state with the same config)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    assert meta["n_leaves"] == len(leaves), "config/capacity mismatch"
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state, meta.get("extra", {})
