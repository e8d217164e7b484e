"""Debug observability artifacts (rviz-surface equivalent, viz/debug.py)."""

import json
import os

import numpy as np
import pytest

from lis_slam_tpu.viz import debug as dbg


def test_pgm_roundtrip(tmp_path):
    img = np.arange(20 * 80, dtype=np.float32).reshape(20, 80)
    p = tmp_path / "desc.pgm"
    dbg.write_pgm(str(p), img)
    back = dbg.read_pgm(str(p))
    assert back.shape == (20, 80)
    assert back[0, 0] == 0 and back[-1, -1] == 255
    # monotone scaling preserved
    assert (np.diff(back.astype(int).reshape(-1)) >= 0).all()


def test_dumper_artifacts(tmp_path):
    d = dbg.DebugDumper(str(tmp_path / "dbg"))
    d.dump_descriptor(3, "fepsc", np.random.default_rng(0).random((20, 80)))
    d.add_loop_edge(10, 2, np.array([1.0, 2.0, 0.0]),
                    np.array([1.5, 2.5, 0.0]), 0.3)
    d.flush_loop_markers()
    d.dump_cloud("stage_corner", np.zeros((5, 3), np.float32))

    files = os.listdir(d.dir)
    assert "kf00003_fepsc.pgm" in files
    assert "loop_edges.json" in files and "loop_markers.ply" in files
    assert "stage_corner.pcd" in files
    edges = json.load(open(os.path.join(d.dir, "loop_edges.json")))
    assert edges[0]["kf_i"] == 10 and edges[0]["fitness"] == 0.3
    ply = open(os.path.join(d.dir, "loop_markers.ply")).read()
    assert "element vertex 2" in ply and "element edge 1" in ply


@pytest.mark.slow
def test_slam_pipeline_writes_debug(tmp_path):
    """SemanticSlam(debug_dir=...) drops descriptor images at keyframes.

    Slow-tier: compiles the full fused SLAM step on the CPU harness."""
    import lis_slam_tpu.io.synthetic as syn
    from lis_slam_tpu.io import synthetic
    from lis_slam_tpu.pipeline import driver, slam
    from tests.test_slam_pipeline import tiny_cfg

    orig = syn.hdl64_elevations
    syn.hdl64_elevations = lambda: np.linspace(15.0, -15.0, 16)
    try:
        world = synthetic.World(
            boxes=np.asarray([[-30, -5, 0, -20, 5, 8], [20, -5, 0, 30, 5, 8],
                              [-5, 15, 0, 5, 25, 10]]),
            box_labels=np.asarray([synthetic.LBL_BUILDING] * 3, np.int32),
            poles=np.asarray([[10 * np.cos(a), 10 * np.sin(a), 0.15, 5.0]
                              for a in np.linspace(0, 2 * np.pi, 12)]))
        gt = synthetic.circular_trajectory(7, radius=4.0, speed=3.0)
        cfg = tiny_cfg()
        system = slam.SemanticSlam(cfg, debug_dir=str(tmp_path / "dd"))
        for i in range(6):
            s = synthetic.render_scan(world, gt[i], None, n_scan=16,
                                      horizon=900, seed=300 + i,
                                      max_range=90.0)
            system.process_scan(driver.pad_scan(s.points[s.valid], cfg),
                                gt_labels=s.labels[s.valid])
        system.finish()
    finally:
        syn.hdl64_elevations = orig
    files = os.listdir(tmp_path / "dd")
    assert any(f.endswith(".pgm") for f in files), files
    assert "loop_edges.json" in files
