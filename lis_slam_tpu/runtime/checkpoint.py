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


def save_slam(path: str, system) -> None:
    """Full-system checkpoint for pipeline.slam.SemanticSlam: odometry +
    semantic-odometry device state, per-scan poses, keyframe store, submap
    store, pose graph, loop-detector database. The reference supports no
    mid-run persistence at all; this enables stop/resume of long replays."""
    system.flush_pipeline()  # quiesce deferred loop/verify/drain queues

    arrs: dict[str, np.ndarray] = {}
    meta: dict = {"version": 3}

    for tag, tree in (("odom", system.state), ("sem", system.sem_state)):
        leaves, _ = jax.tree_util.tree_flatten(tree)
        meta[f"n_{tag}"] = len(leaves)
        for i, x in enumerate(leaves):
            arrs[f"{tag}_{i}"] = np.asarray(x)

    arrs["scan_poses"] = np.asarray(system.scan_poses).reshape(-1, 6)
    arrs["kf_scan_ids"] = np.asarray(system.kf_scan_ids, np.int64)
    meta["scan_idx"] = system._scan_idx
    meta["n_loop_factors"] = system._n_loop_factors
    # submap pairs already holding a loop factor — without this the
    # post-resume dedup starts empty and a revisit can add a duplicate
    # factor between an already-linked pair
    meta["loop_pairs"] = sorted([list(p) for p in system._loop_pairs])
    meta["merge_classes"] = bool(system.collector.merge_classes)
    arrs["last_refined"] = np.asarray(system.fstate.last_refined)
    arrs["last_frontend"] = np.asarray(system.fstate.last_frontend)

    # buffered GPS fixes not yet drained into a submap
    meta["n_gps"] = len(system._gps_queue)
    for k, (t, pos, cov) in enumerate(system._gps_queue):
        arrs[f"gps{k}"] = np.concatenate([[t], pos, cov])

    # keyframes (cloud buffers absent for released keyframes — the
    # endurance eviction policy, mapping/submap.Keyframe.release_clouds)
    meta["n_kf"] = len(system.keyframes)
    for k, kf in enumerate(system.keyframes):
        arrs[f"kf{k}_pose_init"] = kf.pose_init
        arrs[f"kf{k}_pose_opt"] = kf.pose_opt
        if not kf.released:
            arrs[f"kf{k}_corner"] = np.asarray(kf.corner_xyz)
            arrs[f"kf{k}_corner_m"] = np.asarray(kf.corner_mask)
            arrs[f"kf{k}_surf"] = np.asarray(kf.surf_xyz)
            arrs[f"kf{k}_surf_m"] = np.asarray(kf.surf_mask)
            arrs[f"kf{k}_cls"] = np.asarray(kf.clouds.xyz)
            arrs[f"kf{k}_cls_m"] = np.asarray(kf.clouds.mask)
            if kf.clouds.w is not None:
                arrs[f"kf{k}_cls_w"] = np.asarray(kf.clouds.w)
        arrs[f"kf{k}_t"] = np.float64(kf.timestamp)
        arrs[f"kf{k}_sid"] = np.int64(kf.submap_id)

    # submaps
    meta["n_sm"] = len(system.collector.submaps)
    for k, sm_ in enumerate(system.collector.submaps):
        arrs[f"sm{k}_pose_init"] = sm_.pose_init
        arrs[f"sm{k}_pose_opt"] = sm_.pose_opt
        arrs[f"sm{k}_corner"] = np.asarray(sm_.corner_xyz)
        arrs[f"sm{k}_corner_m"] = np.asarray(sm_.corner_mask)
        arrs[f"sm{k}_surf"] = np.asarray(sm_.surf_xyz)
        arrs[f"sm{k}_surf_m"] = np.asarray(sm_.surf_mask)
        if sm_.class_xyz is not None:
            arrs[f"sm{k}_cls"] = np.asarray(sm_.class_xyz)
            arrs[f"sm{k}_cls_m"] = np.asarray(sm_.class_mask)
            if sm_.class_w is not None:
                arrs[f"sm{k}_cls_w"] = np.asarray(sm_.class_w)
        arrs[f"sm{k}_kf_idx"] = np.asarray(sm_.kf_indices, np.int64)
        arrs[f"sm{k}_kf_rel"] = np.asarray(sm_.kf_rel_poses).reshape(-1, 4, 4)
    # collector accumulators + open keyframe indices
    meta["col"] = {
        "accu_tran": system.collector.accu_tran,
        "accu_rot": system.collector.accu_rot,
        "accu_frame": system.collector.accu_frame,
        "open_kfs": [kf.index for kf in system.collector._cur_kfs],
    }

    # pose graph (host lists)
    gb = system.graph
    meta["n_nodes"] = len(gb.nodes)
    meta["n_edges"] = len(gb.edges)
    meta["n_priors"] = len(gb.priors)
    for k, n_ in enumerate(gb.nodes):
        arrs[f"gn{k}"] = n_
    for k, (i, j, z, w, robust) in enumerate(gb.edges):
        arrs[f"ge{k}_z"] = z
        arrs[f"ge{k}_w"] = w
        arrs[f"ge{k}_ij"] = np.asarray([i, j], np.int64)
        arrs[f"ge{k}_r"] = np.bool_(robust)
    for k, (i, z, w) in enumerate(gb.priors):
        arrs[f"gp{k}_z"] = z
        arrs[f"gp{k}_w"] = w
        arrs[f"gp{k}_i"] = np.int64(i)

    # loop detector database (selected descriptor + signature per keyframe)
    ld = system.loop_detector
    meta["n_ld"] = len(ld.poses)
    if ld.poses:
        arrs["ld_poses"] = np.asarray(ld.poses)
        arrs["ld_travel"] = np.asarray(ld.travel)
        # entries past the max_keyframes storage cap are None (payload
        # evicted); persist a mask and only the stored payloads
        stored = np.array([d is not None for d in ld.descs], dtype=bool)
        arrs["ld_stored"] = stored
        if stored.any():
            arrs["ld_sigs"] = np.stack(
                [np.asarray(s) for s in ld.sigs if s is not None])
            arrs["ld_descs"] = np.stack(
                [np.asarray(d) for d in ld.descs if d is not None])
    # pending verified loops
    meta["n_loops"] = len(system.loops)
    for k, (i, j, T, fit) in enumerate(system.loops):
        arrs[f"lp{k}_T"] = T
        arrs[f"lp{k}_ijf"] = np.asarray([i, j, fit])

    np.savez_compressed(path, __meta__=json.dumps(meta), **arrs)


def load_slam(path: str, system) -> None:
    """Restore into a freshly constructed SemanticSlam (same config)."""
    from ..mapping import submap as _sm

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))

    for tag, tree, setter in (
        ("odom", system.state, "state"),
        ("sem", system.sem_state, "sem_state"),
    ):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        assert meta[f"n_{tag}"] == len(leaves), "config mismatch"
        new = [jnp.asarray(data[f"{tag}_{i}"]) for i in range(len(leaves))]
        setattr(system, setter, jax.tree_util.tree_unflatten(treedef, new))

    system.scan_poses = [p for p in data["scan_poses"]]
    system.kf_scan_ids = list(data["kf_scan_ids"])
    system._scan_idx = int(meta["scan_idx"])
    system._n_loop_factors = int(meta.get("n_loop_factors", 0))
    system._loop_pairs = {tuple(p) for p in meta.get("loop_pairs", [])}
    system.collector.merge_classes = bool(meta.get("merge_classes", False))
    system.fstate = system.fstate._replace(
        last_refined=jnp.asarray(data["last_refined"]),
        last_frontend=jnp.asarray(data["last_frontend"]),
    )
    system._gps_queue = []
    for k in range(meta.get("n_gps", 0)):
        row = data[f"gps{k}"]
        system._gps_queue.append(
            (float(row[0]), row[1:4].copy(), row[4:7].copy()))

    system.keyframes = []
    for k in range(meta["n_kf"]):
        released = f"kf{k}_surf" not in data
        kf = _sm.Keyframe(
            index=k,
            pose_init=data[f"kf{k}_pose_init"],
            pose_opt=data[f"kf{k}_pose_opt"],
            clouds=None if released else _sm.ClassClouds(
                xyz=jnp.asarray(data[f"kf{k}_cls"]),
                mask=jnp.asarray(data[f"kf{k}_cls_m"]),
                w=(jnp.asarray(data[f"kf{k}_cls_w"])
                   if f"kf{k}_cls_w" in data else None)),
            corner_xyz=None if released else jnp.asarray(
                data[f"kf{k}_corner"]),
            corner_mask=None if released else jnp.asarray(
                data[f"kf{k}_corner_m"]),
            surf_xyz=None if released else jnp.asarray(data[f"kf{k}_surf"]),
            surf_mask=None if released else jnp.asarray(
                data[f"kf{k}_surf_m"]),
            timestamp=float(data[f"kf{k}_t"]),
            submap_id=int(data[f"kf{k}_sid"]),
        )
        system.keyframes.append(kf)

    system.collector.submaps = []
    for k in range(meta["n_sm"]):
        sm_ = _sm.SubMap(
            index=k,
            pose_init=data[f"sm{k}_pose_init"],
            pose_opt=data[f"sm{k}_pose_opt"],
            corner_xyz=jnp.asarray(data[f"sm{k}_corner"]),
            corner_mask=jnp.asarray(data[f"sm{k}_corner_m"]),
            surf_xyz=jnp.asarray(data[f"sm{k}_surf"]),
            surf_mask=jnp.asarray(data[f"sm{k}_surf_m"]),
            kf_indices=list(data[f"sm{k}_kf_idx"]),
            kf_rel_poses=[T for T in data[f"sm{k}_kf_rel"]],
            class_xyz=(jnp.asarray(data[f"sm{k}_cls"])
                       if f"sm{k}_cls" in data else None),
            class_mask=(jnp.asarray(data[f"sm{k}_cls_m"])
                        if f"sm{k}_cls_m" in data else None),
            class_w=(jnp.asarray(data[f"sm{k}_cls_w"])
                     if f"sm{k}_cls_w" in data else None),
        )
        sm_.recompute_bbox()
        system.collector.submaps.append(sm_)
    # the GPS time index and eviction watermark are derived state: reset
    # them and let the lazy catch-up in _drain_gps / _on_submap rebuild
    # from the restored submaps (release is idempotent, so pre-eviction
    # checkpoints get evicted on resume too)
    system._kf_time_index = []
    system._kf_times_np = None
    system._indexed_submaps = 0
    system._released_submaps = 0
    col = meta["col"]
    system.collector.accu_tran = col["accu_tran"]
    system.collector.accu_rot = col["accu_rot"]
    system.collector.accu_frame = col["accu_frame"]
    system.collector._cur_kfs = [
        system.keyframes[i] for i in col["open_kfs"]]
    if system.keyframes:
        system.collector._last_pose = system.keyframes[-1].pose_init.copy()

    gb = system.graph
    gb.nodes = [data[f"gn{k}"] for k in range(meta["n_nodes"])]
    gb.edges = []
    # the first node's anchor prior is re-added by add_node on fresh builds;
    # here we restore the exact saved lists instead
    gb.priors = []
    for k in range(meta["n_edges"]):
        ij = data[f"ge{k}_ij"]
        robust = (bool(data[f"ge{k}_r"])
                  if f"ge{k}_r" in data else False)  # legacy: quadratic
        gb.edges.append((int(ij[0]), int(ij[1]),
                         data[f"ge{k}_z"], data[f"ge{k}_w"], robust))
    for k in range(meta["n_priors"]):
        gb.priors.append((int(data[f"gp{k}_i"]),
                          data[f"gp{k}_z"], data[f"gp{k}_w"]))

    ld = system.loop_detector
    ld.descs, ld.sigs, ld.poses, ld.travel = [], [], [], []
    ld._n_stored = 0
    if meta["n_ld"]:
        ld.poses = [p for p in data["ld_poses"]]
        ld.travel = list(data["ld_travel"])
        if "ld_stored" in data:  # current format (payload-cap aware)
            stored = data["ld_stored"]
            sigs = iter(data["ld_sigs"]) if stored.any() else iter(())
            descs = iter(data["ld_descs"]) if stored.any() else iter(())
            ld.sigs = [jnp.asarray(next(sigs)) if s else None for s in stored]
            ld.descs = [jnp.asarray(next(descs)) if s else None
                        for s in stored]
            ld._n_stored = int(stored.sum())
        else:  # legacy checkpoints: everything stored
            ld.sigs = [jnp.asarray(s) for s in data["ld_sigs"]]
            ld.descs = [jnp.asarray(d) for d in data["ld_descs"]]
            ld._n_stored = len(ld.descs)
    system.loops = []
    for k in range(meta["n_loops"]):
        ijf = data[f"lp{k}_ijf"]
        system.loops.append(
            (int(ijf[0]), int(ijf[1]), data[f"lp{k}_T"], float(ijf[2])))
