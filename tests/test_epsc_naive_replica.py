"""Naive per-point replica of the EPSC descriptor family.

The production `loop/epsc.compute_descriptors` builds all six descriptor
grids (SC/ISC/EPSC/SEPSC/SSC/FEPSC, epscGeneration.cpp:403-607) in one
fused scatter pass.  This module recomputes every grid with plain Python
loops over the points — the direct transcription of the reference's
per-point accumulation — and requires exact equality, pinning the scatter
tricks (cell clipping to a dump slot, priority-major SSC packing, count
saturation) against the obviously-correct form.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lis_slam_tpu.config import LoopClosureConfig
from lis_slam_tpu.labels import SSC_ORDER, USING_LABEL_MAP
from lis_slam_tpu.loop import epsc


def _naive_bins(xy, cfg):
    """Reference binning (epscGeneration.cpp:403-445): ring by radial
    distance, sector by azimuth, matching float32 arithmetic."""
    x, y = np.float32(xy[0]), np.float32(xy[1])
    d = np.float32(np.sqrt(x * x + y * y))
    ring_step = np.float32((cfg.max_dis - cfg.min_dis) / cfg.rings)
    sector_step = np.float32(2.0 * np.pi / cfg.sectors)
    ring = int(np.floor(np.float32(d - np.float32(cfg.min_dis)) / ring_step))
    ang = np.float32(np.pi + np.arctan2(y, x))
    sector = int(np.floor(ang / sector_step))
    ok = (cfg.min_dis <= d < cfg.max_dis and 0 <= ring < cfg.rings
          and 0 <= sector < cfg.sectors)
    return ring, sector, ok


def _naive_descriptors(sem_xyz, sem_int, sem_lab, sem_val,
                       c_xyz, c_val, s_xyz, s_val, cfg):
    R, S = cfg.rings, cfg.sectors
    sc = np.zeros((R, S))
    isc = np.zeros((R, S))
    esc = np.zeros((R, S))
    psc = np.zeros((R, S))
    psc2 = np.zeros((R, S))
    esc2 = np.zeros((R, S))
    ssc_packed = np.zeros((R, S), np.int64)

    for p, inten, lab, val in zip(sem_xyz, sem_int, sem_lab, sem_val):
        if not val:
            continue
        r, s, ok = _naive_bins(p[:2], cfg)
        if not ok:
            continue
        zq = np.floor(100.0 * np.float32(
            np.float32(p[2]) + np.float32(cfg.lidar_height)) / 8.0)
        sc[r, s] = max(sc[r, s], zq)
        iq = np.floor(255.0 * min(max(float(inten), 0.0), 1.0))
        isc[r, s] = max(isc[r, s], iq)
        ulab = USING_LABEL_MAP[min(max(int(lab), 0), 19)]
        if ulab in (40, 50):
            psc2[r, s] += 1
        if ulab == 81:
            esc2[r, s] += 1
        order = SSC_ORDER[min(max(int(lab), 0), 19)]
        if order > 0:
            ssc_packed[r, s] = max(ssc_packed[r, s], order * 256 + int(lab))
    sc = np.maximum(sc, 0.0)

    for p, val in zip(c_xyz, c_val):
        if val:
            r, s, ok = _naive_bins(p[:2], cfg)
            if ok:
                esc[r, s] += 1
    for p, val in zip(s_xyz, s_val):
        if val:
            r, s, ok = _naive_bins(p[:2], cfg)
            if ok:
                psc[r, s] += 1

    epsc_g = np.minimum(
        np.floor(100.0 * np.minimum(psc, 255.0)
                 / (1.0 + np.minimum(esc, 255.0))), 255.0)
    sepsc = np.minimum(
        np.floor(100.0 * np.minimum(psc2, 255.0)
                 / (1.0 + np.minimum(esc2, 255.0))), 255.0)
    ssc = (ssc_packed % 256).astype(np.float64)
    fepsc = np.floor(sepsc * 0.4 + epsc_g * 0.6)
    return sc, isc, epsc_g, sepsc, ssc, fepsc


def _naive_signature(sem_xyz, sem_lab, sem_val):
    n = epsc._SIG_SECTORS
    count = np.zeros(n)
    members = [[] for _ in range(n)]
    step = np.float32(2.0 * np.pi / n)
    for p, lab, val in zip(sem_xyz, sem_lab, sem_val):
        if not val or int(lab) not in epsc._SIG_CLASSES:
            continue
        x, y = np.float32(p[0]), np.float32(p[1])
        d = np.float32(np.sqrt(x * x + y * y))
        if d <= 1e-2:
            continue
        sec = int(np.floor(np.float32(np.pi + np.arctan2(y, x)) / step))
        if not (0 <= sec < n):
            continue
        count[sec] += 1
        members[sec].append((float(x), float(y), float(lab)))
    return count, members


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(42)
    P, Qc, Qs = 2000, 400, 900
    sem_xyz = rng.uniform(-70, 70, (P, 3)).astype(np.float32)
    sem_xyz[:, 2] = rng.uniform(-2, 12, P).astype(np.float32)
    sem_int = rng.uniform(-0.2, 1.4, P).astype(np.float32)  # tests clipping
    sem_lab = rng.integers(0, 20, P).astype(np.int32)
    sem_val = rng.random(P) > 0.1
    c_xyz = rng.uniform(-70, 70, (Qc, 3)).astype(np.float32)
    c_val = rng.random(Qc) > 0.1
    s_xyz = rng.uniform(-70, 70, (Qs, 3)).astype(np.float32)
    s_val = rng.random(Qs) > 0.1
    return sem_xyz, sem_int, sem_lab, sem_val, c_xyz, c_val, s_xyz, s_val


def test_descriptor_grids_match_naive_loops(cloud):
    cfg = LoopClosureConfig()
    sem_xyz, sem_int, sem_lab, sem_val, c_xyz, c_val, s_xyz, s_val = cloud
    d = epsc.compute_descriptors(
        jnp.asarray(sem_xyz), jnp.asarray(sem_int), jnp.asarray(sem_lab),
        jnp.asarray(sem_val), jnp.asarray(c_xyz), jnp.asarray(c_val),
        jnp.asarray(s_xyz), jnp.asarray(s_val), cfg)
    sc, isc, epsc_g, sepsc, ssc, fepsc = _naive_descriptors(
        sem_xyz, sem_int, sem_lab, sem_val, c_xyz, c_val, s_xyz, s_val, cfg)

    np.testing.assert_array_equal(np.asarray(d.sc), sc)
    np.testing.assert_array_equal(np.asarray(d.isc), isc)
    np.testing.assert_array_equal(np.asarray(d.epsc), epsc_g)
    np.testing.assert_array_equal(np.asarray(d.sepsc), sepsc)
    np.testing.assert_array_equal(np.asarray(d.ssc), ssc)
    np.testing.assert_array_equal(np.asarray(d.fepsc), fepsc)
    # the grids must actually be populated (not trivially-equal zeros)
    assert np.count_nonzero(sc) > 50
    assert np.count_nonzero(epsc_g) > 50
    assert np.count_nonzero(ssc) > 20


def test_signature_matches_naive_loops(cloud):
    cfg = LoopClosureConfig()
    sem_xyz, sem_int, sem_lab, sem_val, c_xyz, c_val, s_xyz, s_val = cloud
    d = epsc.compute_descriptors(
        jnp.asarray(sem_xyz), jnp.asarray(sem_int), jnp.asarray(sem_lab),
        jnp.asarray(sem_val), jnp.asarray(c_xyz), jnp.asarray(c_val),
        jnp.asarray(s_xyz), jnp.asarray(s_val), cfg)
    sig = np.asarray(d.signature)
    count, members = _naive_signature(sem_xyz, sem_lab, sem_val)
    np.testing.assert_array_equal(sig[:, 0], count)
    assert count.sum() > 100
    # the (x, y, label) sample is scatter-order-defined when a sector holds
    # several structural points; require it to be ONE of that sector's
    # points (the reference keeps an arbitrary representative too)
    for sec in range(epsc._SIG_SECTORS):
        if count[sec] == 0:
            assert sig[sec, 1] == 0 and sig[sec, 2] == 0 and sig[sec, 3] == 0
            continue
        got = (round(float(sig[sec, 1]), 4), round(float(sig[sec, 2]), 4),
               float(sig[sec, 3]))
        cands = {(round(x, 4), round(y, 4), l) for (x, y, l) in members[sec]}
        assert got in cands, f"sector {sec}: {got} not in {cands}"
