"""Golden + property tests for pretreatment, projection, deskew, features."""

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import SensorConfig, FeatureConfig
from lis_slam_tpu.io import synthetic
from lis_slam_tpu.ops import pretreatment, projection, deskew, features


@pytest.fixture(scope="module")
def scan():
    world = synthetic.make_world(seed=3)
    pose = np.array([0.0, 0.0, 0.3, 5.0, 2.0, 1.8])
    return synthetic.render_scan(world, pose, seed=1)


@pytest.fixture(scope="module")
def cfg():
    return SensorConfig(max_raw_points=64 * 1800)


# ------------------------- pretreatment ------------------------------------


def golden_ring_hdl64(points):
    """Faithful numpy replica of laserPretreatment.cpp:49-56."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    angle = np.degrees(np.arctan(z / np.sqrt(x * x + y * y)))
    ring = np.where(
        angle >= -8.83,
        ((2 - angle) * 3.0 + 0.5).astype(np.int32),
        32 + ((-8.83 - angle) * 2.0 + 0.5).astype(np.int32),
    )
    ok = (angle <= 2) & (angle >= -24.33) & (ring >= 0) & (ring <= 50)
    return ring, ok


def golden_rel_time(points, valid, scan_period=0.1):
    """Faithful replica of the sequential halfPassed unwrap
    (laserPretreatment.cpp:17-20, 62-76)."""
    pts = points[valid]
    n = len(pts)
    start = -np.arctan2(pts[0, 1], pts[0, 0])
    end = -np.arctan2(pts[-1, 1], pts[-1, 0]) + 2 * np.pi
    if end - start > 3 * np.pi:
        end -= 2 * np.pi
    elif end - start < np.pi:
        end += 2 * np.pi
    half_passed = False
    out = np.zeros(n)
    for i in range(n):
        ori = -np.arctan2(pts[i, 1], pts[i, 0])
        if not half_passed:
            if ori < start - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end + np.pi / 2:
                ori -= 2 * np.pi
        out[i] = scan_period * (ori - start) / (end - start)
    return out


def test_ring_formula_matches_reference(scan, cfg):
    pts = jnp.asarray(scan.points)
    valid = jnp.asarray(scan.valid)
    ring, ok = pretreatment.compute_ring(pts, valid, 64)
    g_ring, g_ok = golden_ring_hdl64(scan.points[scan.valid])
    ours_ring = np.asarray(ring)[scan.valid]
    ours_ok = np.asarray(ok)[scan.valid]
    np.testing.assert_array_equal(ours_ok, g_ok)
    np.testing.assert_array_equal(ours_ring[g_ok], g_ring[g_ok])


def test_ring_matches_synthetic_ground_truth(scan, cfg):
    """The synthetic generator fires beams at exact HDL-64 elevations, so the
    recovered ring must equal the generator's ring index (where valid)."""
    pts = jnp.asarray(scan.points)
    valid = jnp.asarray(scan.valid)
    ring, ok = pretreatment.compute_ring(pts, valid, 64)
    gt_ring = np.repeat(np.arange(64), 1800)
    ours = np.asarray(ring)
    okn = np.asarray(ok)
    agree = (ours == gt_ring)[okn]
    assert agree.mean() > 0.97  # noise flips a few boundary beams


def test_rel_time_matches_sequential_golden(scan, cfg):
    # The sequential reference algorithm assumes a time-ordered sweep; sort
    # the synthetic cloud by true firing time first (the vectorized op is
    # order-independent).
    order = np.argsort(scan.times, kind="stable")
    pts = scan.points[order]
    val = scan.valid[order]
    pre = pretreatment.pretreat(jnp.asarray(pts), jnp.asarray(val), cfg)
    valid = np.asarray(pre.valid)
    ours = np.asarray(pre.rel_time)[valid]
    golden = golden_rel_time(pts.astype(np.float64), valid)
    frac_close = (np.abs(ours - golden) < 2e-3).mean()
    assert frac_close > 0.99, f"only {frac_close:.3f} match"


# ------------------------- projection --------------------------------------


def test_projection_roundtrip(scan, cfg):
    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), cfg
    )
    img = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg
    )
    rng_img = np.asarray(img.rng)
    mask = np.asarray(img.mask)
    xyz = np.asarray(img.xyz)
    # every masked pixel stores a point whose range matches the image
    r = np.linalg.norm(xyz[mask], axis=-1)
    np.testing.assert_allclose(r, rng_img[mask], rtol=1e-4, atol=1e-3)
    # downsample_rate=2: odd rows empty
    assert not mask[1::2].any()
    assert mask[0::2].sum() > 10000


def test_projection_nearest_wins(cfg):
    # two points in the same pixel: keep the nearer
    pts = jnp.asarray([[10.0, 0.0, 0.0], [5.0, 0.0, 0.001]], dtype=jnp.float32)
    inten = jnp.asarray([1.0, 2.0])
    ring = jnp.asarray([0, 0], dtype=jnp.int32)
    t = jnp.asarray([0.0, 0.0])
    valid = jnp.asarray([True, True])
    img = projection.project(pts, inten, ring, t, valid, cfg)
    mask = np.asarray(img.mask)
    assert mask.sum() == 1
    ij = np.argwhere(mask)[0]
    assert np.isclose(np.asarray(img.rng)[ij[0], ij[1]], 5.0, atol=1e-3)
    assert np.asarray(img.intensity)[ij[0], ij[1]] == 2.0


def test_extraction_compacts_in_order(scan, cfg):
    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), cfg
    )
    img = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg
    )
    ext = projection.extract(img)
    count = np.asarray(ext.count)
    mask = np.asarray(img.mask)
    np.testing.assert_array_equal(count, mask.sum(axis=1))
    cols = np.asarray(ext.col)
    for i in [0, 2, 30]:
        c = cols[i, : count[i]]
        assert (np.diff(c) > 0).all()  # strictly ascending column order
        # compacted ranges equal image ranges at those columns
        np.testing.assert_allclose(
            np.asarray(ext.rng)[i, : count[i]],
            np.asarray(img.rng)[i][c],
            rtol=1e-6,
        )


# ------------------------- deskew ------------------------------------------


def test_deskew_constant_rate():
    """Constant yaw rate: a point measured at time t in the rotated frame maps
    back to the scan-start frame by R(t)."""
    rate = np.array([0.0, 0.0, 0.5])  # rad/s yaw
    m = 16
    t_imu = np.linspace(0.0, 0.12, m)
    info = deskew.integrate_gyro(
        jnp.asarray(t_imu, dtype=jnp.float32),
        jnp.asarray(np.tile(rate, (m, 1)), dtype=jnp.float32),
        jnp.ones(m, dtype=bool),
        jnp.float32(0.0),
    )
    assert bool(info.available)
    # analytic: rotation angle at t = rate*t
    t_pts = np.array([0.0, 0.04, 0.08], dtype=np.float32)
    got = np.asarray(deskew.rotation_at(info, jnp.asarray(t_pts)))
    np.testing.assert_allclose(got[:, 2], rate[2] * t_pts, atol=1e-5)

    # a fixed world point seen from the rotating sensor
    p_world = np.array([10.0, 0.0, 0.0])
    from scipy.spatial.transform import Rotation

    pts_meas = []
    for t in t_pts:
        R = Rotation.from_euler("z", rate[2] * t).as_matrix()
        pts_meas.append(R.T @ p_world)  # sensor-frame measurement
    pts_meas = np.asarray(pts_meas, dtype=np.float32)
    out = np.asarray(
        deskew.deskew_points(
            jnp.asarray(pts_meas), jnp.asarray(t_pts), info, jnp.ones(3, dtype=bool)
        )
    )
    np.testing.assert_allclose(out, np.tile(p_world, (3, 1)), atol=1e-3)


def test_deskew_unavailable_passthrough():
    info = deskew.integrate_gyro(
        jnp.zeros(4), jnp.zeros((4, 3)), jnp.zeros(4, dtype=bool), jnp.float32(0.0)
    )
    pts = jnp.asarray(np.random.randn(5, 3), dtype=jnp.float32)
    out = deskew.deskew_points(pts, jnp.zeros(5), info, jnp.ones(5, dtype=bool))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pts))


# ------------------------- features ----------------------------------------


@pytest.fixture(scope="module")
def extracted(scan, cfg):
    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), cfg
    )
    img = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg
    )
    return projection.extract(img)


def test_feature_extraction_properties(extracted):
    fcfg = FeatureConfig()
    fc = features.extract_features(extracted, fcfg)
    n_corner = int(np.asarray(fc.corner_mask).sum())
    n_sharp = int(np.asarray(fc.sharp_corner_mask).sum())
    n_surf = int(np.asarray(fc.surf_mask).sum())
    n_ssurf = int(np.asarray(fc.sharp_surf_mask).sum())
    # a city scene must yield plenty of both feature kinds
    assert n_corner > 50
    assert n_sharp > 30
    assert n_surf > 3000
    assert n_ssurf > 300
    assert n_sharp <= n_corner
    # sharp corners are a subset of corners (as point sets)
    c = np.asarray(fc.corner_xyz)[np.asarray(fc.corner_mask)]
    s = np.asarray(fc.sharp_corner_xyz)[np.asarray(fc.sharp_corner_mask)]
    cset = {tuple(np.round(p, 4)) for p in c}
    assert all(tuple(np.round(p, 4)) in cset for p in s)
    # corners and surfs are disjoint
    su = np.asarray(fc.surf_xyz)[np.asarray(fc.surf_mask)]
    sset = {tuple(np.round(p, 4)) for p in su}
    assert not (cset & sset)


def test_corner_on_step_edge():
    """A synthetic row with a range step must yield a corner at the edge."""
    h = 64
    n = 64
    rng_row = np.full((n, h), 1e9, dtype=np.float32)
    xyz = np.zeros((n, h, 3), dtype=np.float32)
    count = np.zeros(n, dtype=np.int32)
    col = np.tile(np.arange(h, dtype=np.int32), (n, 1))
    # row 0: flat range 10 then jumps ramping far wall at 20 with a slope
    r = np.concatenate([np.full(32, 10.0), np.full(32, 20.0)]).astype(np.float32)
    # add tiny slope so far wall isn't "occluded" marking the near side only
    rng_row[0] = r
    count[0] = h
    xyz[0, :, 0] = r  # fake geometry along x
    ext = projection.ExtractedCloud(
        rng=jnp.asarray(rng_row),
        xyz=jnp.asarray(xyz),
        intensity=jnp.zeros((n, h)),
        col=jnp.asarray(col),
        count=jnp.asarray(count),
        mask=jnp.asarray(np.arange(h)[None, :] < count[:, None]),
    )
    fcfg = FeatureConfig(sectors_per_ring=2)
    curv, picked, valid = features.curvature_and_occlusion(ext, fcfg)
    curv = np.asarray(curv)[0]
    # curvature peaks adjacent to the step at index 31/32
    assert curv[28:36].max() > fcfg.edge_threshold
    # the step's near side is occlusion-masked (depth2 - depth1 > 0.3)
    assert np.asarray(picked)[0, 32:38].all()


def test_fused_project_extract_matches_pair(scan, cfg):
    """project_and_extract == project() + extract() up to ~4 mm range-tie
    winner differences."""
    pre = pretreatment.pretreat(
        jnp.asarray(scan.points), jnp.asarray(scan.valid), cfg
    )
    img_a = projection.project(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg
    )
    ext_a = projection.extract(img_a)
    img_b, ext_b = projection.project_and_extract(
        pre.points[:, :3], pre.points[:, 3], pre.ring, pre.rel_time, pre.valid, cfg
    )
    ma, mb = np.asarray(img_a.mask), np.asarray(img_b.mask)
    np.testing.assert_array_equal(ma, mb)
    ra, rb = np.asarray(img_a.rng), np.asarray(img_b.rng)
    assert np.abs(ra[ma] - rb[ma]).max() < 0.02  # winner ties within 4 mm buckets
    np.testing.assert_array_equal(np.asarray(ext_a.count), np.asarray(ext_b.count))
    np.testing.assert_array_equal(np.asarray(ext_a.col), np.asarray(ext_b.col))
    assert np.abs(np.asarray(ext_a.rng)[np.asarray(ext_a.mask)]
                  - np.asarray(ext_b.rng)[np.asarray(ext_b.mask)]).max() < 0.02
