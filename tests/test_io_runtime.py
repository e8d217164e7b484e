"""Tests for KITTI IO, PCD export, native runtime, and checkpointing."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.io import kitti
from lis_slam_tpu.runtime import checkpoint, native


@pytest.fixture
def fake_kitti(tmp_path):
    """Fabricate a mini KITTI sequence directory."""
    rng = np.random.default_rng(0)
    seq = tmp_path / "sequences" / "00"
    velo = seq / "velodyne"
    velo.mkdir(parents=True)
    scans = []
    for i in range(4):
        pts = rng.uniform(-30, 30, (1000, 4)).astype(np.float32)
        pts.tofile(velo / f"{i:06d}.bin")
        scans.append(pts)
    np.savetxt(seq / "times.txt", np.arange(4) * 0.1)
    with open(seq / "calib.txt", "w") as f:
        tr = np.eye(4)[:3].reshape(-1)
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr) + "\n")
    poses = np.tile(np.eye(4)[:3], (4, 1, 1))
    for i in range(4):
        poses[i, 0, 3] = i * 1.0
    (tmp_path / "poses").mkdir()
    np.savetxt(tmp_path / "poses" / "00.txt", poses.reshape(4, 12))
    return tmp_path, scans


def test_kitti_sequence_reader(fake_kitti):
    root, scans = fake_kitti
    seq = kitti.KittiSequence(str(root), "00")
    assert len(seq) == 4
    np.testing.assert_array_equal(seq.scan(2), scans[2])
    gt = seq.ground_truth()
    assert gt.shape == (4, 4, 4)
    np.testing.assert_allclose(gt[3, 0, 3], 3.0)
    assert len(list(iter(seq))) == 4


def test_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(1).uniform(-5, 5, (50, 3)).astype(np.float32)
    labels = np.arange(50) % 20
    p = tmp_path / "map.pcd"
    kitti.write_pcd(str(p), pts, labels)
    back = kitti.read_pcd(str(p))
    np.testing.assert_allclose(back[:, :3], pts, atol=1e-3)
    np.testing.assert_array_equal(back[:, 3].astype(int), labels)


def test_native_available():
    assert native.available(), "native runtime must build in this image"


def test_native_read_and_filter(fake_kitti):
    root, scans = fake_kitti
    path = str(root / "sequences" / "00" / "velodyne" / "000000.bin")
    pts = native.read_bin(path, 2000)
    np.testing.assert_array_equal(pts, scans[0])
    filt = native.range_filter(scans[0].copy(), 5.0, 40.0)
    r = np.linalg.norm(filt[:, :3], axis=1)
    assert (r >= 5.0 - 1e-3).all() and (r <= 40.0 + 1e-3).all()
    # matches numpy fallback semantics
    r_all = np.linalg.norm(scans[0][:, :3], axis=1)
    expect = ((r_all >= 5.0) & (r_all <= 40.0)).sum()
    assert len(filt) == expect


def test_native_voxel_filter():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
    out = native.voxel_filter(pts, 0.5)
    cells = {tuple(c) for c in np.floor(out / 0.5).astype(np.int64)}
    assert len(cells) == len(out)  # one point per voxel
    all_cells = {tuple(c) for c in np.floor(pts / 0.5).astype(np.int64)}
    assert len(out) == len(all_cells)  # every occupied voxel kept


def test_async_loader_ordered(fake_kitti):
    root, scans = fake_kitti
    velo = root / "sequences" / "00" / "velodyne"
    files = sorted(str(velo / f) for f in os.listdir(velo))
    loader = native.AsyncScanLoader(files, max_points=2000, capacity=2,
                                    n_threads=2)
    got = list(loader)
    loader.close()
    assert len(got) == 4
    for i, (buf, n) in enumerate(got):
        assert n == 1000
        np.testing.assert_array_equal(buf[:n], scans[i])


def test_checkpoint_roundtrip(tmp_path):
    from lis_slam_tpu.config import SlamConfig, SensorConfig
    from lis_slam_tpu.pipeline import odometry

    cfg = SlamConfig().replace(
        sensor=SensorConfig(n_scan=16, horizon_scan=400, max_raw_points=6400))
    state = odometry.init_state(cfg)
    state = state._replace(pose=jnp.asarray([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]),
                           frame_idx=jnp.int32(42))
    p = tmp_path / "ckpt.npz"
    checkpoint.save_odom_state(str(p), state, extra={"scan": 42})
    template = odometry.init_state(cfg)
    loaded, extra = checkpoint.load_odom_state(str(p), template)
    np.testing.assert_allclose(np.asarray(loaded.pose),
                               [0.1, 0.2, 0.3, 1.0, 2.0, 3.0])
    assert int(loaded.frame_idx) == 42
    assert extra == {"scan": 42}
    # structure identical
    import jax

    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(template))


@pytest.mark.slow
def test_full_slam_checkpoint_resume(tmp_path):
    """Full-system checkpoint: a resumed SemanticSlam must continue to the
    same final trajectory as an uninterrupted run (the reference has no
    mid-run persistence at all)."""
    import dataclasses

    import lis_slam_tpu.io.synthetic as syn
    from lis_slam_tpu.io import synthetic
    from lis_slam_tpu.pipeline import driver as drv, slam
    from lis_slam_tpu.runtime import checkpoint as ckpt
    from tests.test_slam_pipeline import tiny_cfg

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        rng = np.random.default_rng(9)
        boxes, labels = [], []
        for k in range(14):
            ang = 2 * np.pi * k / 14
            cx, cy = 26.0 * np.cos(ang), 10.0 + 26.0 * np.sin(ang)
            w, d, h = rng.uniform(5, 9), rng.uniform(5, 9), rng.uniform(5, 14)
            boxes.append([cx - w / 2, cy - d / 2, 0,
                          cx + w / 2, cy + d / 2, h])
            labels.append(synthetic.LBL_BUILDING)
        poles = [[r * np.cos(a), 10.0 + r * np.sin(a), 0.15, 5.0]
                 for a, r in zip(np.linspace(0, 2 * np.pi, 24, endpoint=False),
                                 rng.uniform(15, 20, 24))]
        world = synthetic.World(
            boxes=np.asarray(boxes), box_labels=np.asarray(labels, np.int32),
            poles=np.asarray(poles))
        n = 30
        gt = synthetic.circular_trajectory(n + 1, radius=10.0, speed=6.3)
        scans = [synthetic.render_scan(world, gt[i], None, n_scan=16,
                                       horizon=900, seed=600 + i,
                                       max_range=90.0) for i in range(n)]
        cfg = tiny_cfg()
        sins = [drv.pad_scan(s.points[s.valid], cfg) for s in scans]
        labs = [s.labels[s.valid] for s in scans]

        # uninterrupted run
        a = slam.SemanticSlam(cfg)
        for i in range(n):
            a.process_scan(sins[i], gt_labels=labs[i], timestamp=i * 0.1)
        res_a = a.finish()

        # interrupted at scan 15 + resumed
        b1 = slam.SemanticSlam(cfg)
        for i in range(15):
            b1.process_scan(sins[i], gt_labels=labs[i], timestamp=i * 0.1)
        p = str(tmp_path / "slam_ckpt.npz")
        ckpt.save_slam(p, b1)
        del b1
        b2 = slam.SemanticSlam(cfg)
        ckpt.load_slam(p, b2)
        for i in range(15, n):
            b2.process_scan(sins[i], gt_labels=labs[i], timestamp=i * 0.1)
        res_b = b2.finish()

        assert res_b.poses.shape == res_a.poses.shape
        # device state restores bit-exactly; host float bookkeeping may
        # differ at rounding level through the remaining solves
        np.testing.assert_allclose(res_b.raw_poses, res_a.raw_poses,
                                   atol=1e-4)
        np.testing.assert_allclose(res_b.poses, res_a.poses, atol=5e-3)
        assert res_b.n_submaps == res_a.n_submaps
    finally:
        syn.hdl64_elevations = orig
