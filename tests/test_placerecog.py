"""Scan-context place recognition: descriptor equivariance, retrieval,
appearance-driven loop closure (the reference's unbuilt 'M2DP' future work)."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.placerecog import (
    find_candidates_appearance,
    ring_key,
    sc_alignment,
    sc_distance,
    scan_context,
)
from radarslampy_tpu.sim import fakedata as fd

CFG = SlamConfig()


def _scan(rng, pose, world=None):
    if world is None:
        world = fd.make_world(rng, n_landmarks=800, extent_m=150.0)
    pts, refl = world
    return np.asarray(
        fd.render_polar_scan(pts, refl, np.asarray(pose), CFG, rng=rng, noise=0.02)
    ), world


def test_descriptor_rotation_equivariance(rng):
    scan, _ = _scan(rng, [0.0, 0.0, 0.0])
    d0 = scan_context(jnp.asarray(scan), CFG)
    A, S = CFG.num_azimuths, CFG.sc_sectors
    rows_per_sector = A // S
    q = 7  # shift by 7 sectors
    rolled = np.roll(scan, q * rows_per_sector, axis=0)
    d1 = scan_context(jnp.asarray(rolled), CFG)
    np.testing.assert_allclose(np.asarray(d1), np.roll(np.asarray(d0), q, axis=1))
    # ring key is rotation invariant
    np.testing.assert_allclose(
        np.asarray(ring_key(d0)), np.asarray(ring_key(d1)), rtol=1e-6
    )
    sim, k, rot = sc_alignment(d0, d1)
    assert float(sim) > 0.99
    assert int(k) == q
    truth = q * 2 * np.pi / S
    truth = (truth + np.pi) % (2 * np.pi) - np.pi
    assert abs(float(rot) - truth) < 1e-6


def test_distance_separates_places(rng):
    scan_a, world = _scan(rng, [0.0, 0.0, 0.0])
    # same place, rotated 90 deg, re-rendered (new speckle)
    scan_a2, _ = _scan(rng, [0.0, 0.0, np.pi / 2], world)
    # 60 m away in the same world
    scan_b, _ = _scan(rng, [60.0, 20.0, 0.4], world)

    da = scan_context(jnp.asarray(scan_a), CFG)
    da2 = scan_context(jnp.asarray(scan_a2), CFG)
    db = scan_context(jnp.asarray(scan_b), CFG)

    same = float(sc_distance(da, da2))
    diff = float(sc_distance(da, db))
    assert same < 0.25, same
    assert diff > same + 0.1, (same, diff)
    # alignment recovers the 90-degree revisit rotation
    _, _, rot = sc_alignment(da, da2)
    assert abs(abs(float(rot)) - np.pi / 2) < 2 * (2 * np.pi / CFG.sc_sectors)


def test_find_candidates_appearance(rng):
    """Keyframe 25 revisits keyframe 2's location rotated; retrieval must find
    the pair (2, 25) and hand back a usable rotation initialiser."""
    world = fd.make_world(rng, n_landmarks=800, extent_m=300.0)
    M_cap = 32
    poses = [np.array([15.0 * t, 8.0 * np.sin(0.4 * t), 0.1 * t]) for t in range(26)]
    poses[25] = np.array([poses[2][0], poses[2][1], poses[2][2] + 1.3])

    descs = np.zeros((M_cap, CFG.sc_rings, CFG.sc_sectors), np.float32)
    for t, p in enumerate(poses):
        scan, _ = _scan(rng, p, world)
        descs[t] = np.asarray(scan_context(jnp.asarray(scan), CFG))

    cands = find_candidates_appearance(
        jnp.asarray(descs), jnp.int32(len(poses)), max_candidates=4,
        min_index_gap=10, max_distance=0.35,
    )
    found = {
        (int(i), int(j))
        for i, j, v in zip(cands.i, cands.j, cands.valid) if bool(v)
    }
    assert (2, 25) in found, (found, np.asarray(cands.distance))
    at = [(int(i), int(j)) for i, j in zip(cands.i, cands.j)].index((2, 25))
    rot = float(cands.rot_init[at])
    # true revisit rotation is +1.3 rad; initialiser within 2 sector widths
    assert abs(rot - 1.3) < 2 * (2 * np.pi / CFG.sc_sectors), rot


def test_slam_step_fills_descriptors(rng, small_cfg):
    """The fused pipeline writes a scan-context descriptor for every keyframe."""
    import dataclasses

    import jax

    from radarslampy_tpu.models import frontend

    cfg = dataclasses.replace(small_cfg, kf_trans_threshold_m=0.5)
    maps = frontend.build_frame_maps(cfg)
    world = fd.make_world(rng, n_landmarks=1500, extent_m=120.0)
    poses = [np.array([2.0 * t, 0.0, 0.02 * t]) for t in range(4)]
    scans = [
        jnp.asarray(fd.render_polar_scan(world[0], world[1], p, cfg, rng=rng,
                                         noise=0.02))
        for p in poses
    ]
    state = jax.jit(
        lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg)
    )(scans[0], maps)
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg))
    for sc in scans[1:]:
        state, out = step(state, sc, maps)
    n_kf = int(state.map.cursor)
    assert n_kf >= 2
    d = np.asarray(state.map.descriptors)
    for k in range(n_kf):
        assert d[k].max() > 0.0, k  # written, not left at init zeros
    assert not d[n_kf:].any()


# ---------------------------------------------------------------------------- #
# M2DP (2-D adaptation)                                                         #
# ---------------------------------------------------------------------------- #


def _cloud(rng, n=120):
    pts = rng.normal(0, 20, (n, 2)).astype(np.float32)
    # make it anisotropic so PCA alignment is well-defined
    pts[:, 0] *= 2.5
    mask = np.ones(n, bool)
    return pts, mask


def test_m2dp_rotation_invariance(rng):
    from radarslampy_tpu.models.placerecog import m2dp_descriptor

    pts, mask = _cloud(rng)
    r0 = m2dp_descriptor(jnp.asarray(pts), jnp.asarray(mask))
    th = 1.1
    c, s = np.cos(th), np.sin(th)
    rot = pts @ np.array([[c, s], [-s, c]], np.float32)
    r1 = m2dp_descriptor(jnp.asarray(rot), jnp.asarray(mask))
    # descriptor invariant under rotation
    np.testing.assert_allclose(np.asarray(r0.desc), np.asarray(r1.desc),
                               atol=2e-2)
    # alignment angle tracks the rotation (sensor-frame principal axis)
    d = float(r1.angle - r0.angle)
    d = (d + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(d) - th) < 0.05 or abs(abs(d) - abs(np.pi - th)) < 0.05


def test_m2dp_retrieval_finds_revisit(rng):
    from radarslampy_tpu.models.placerecog import (
        find_candidates_m2dp, m2dp_descriptor)

    # 30 distinct scenes; scene 25 is scene 2 revisited with noise + rotation
    descs, angles = [], []
    clouds = [_cloud(rng)[0] for _ in range(30)]
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    clouds[25] = (clouds[2] + rng.normal(0, 0.3, clouds[2].shape).astype(
        np.float32)) @ np.array([[c, s], [-s, c]], np.float32)
    for pts in clouds:
        r = m2dp_descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool))
        descs.append(np.asarray(r.desc))
        angles.append(float(r.angle))
    out = find_candidates_m2dp(
        jnp.asarray(np.stack(descs)), jnp.asarray(angles), jnp.int32(30),
        max_candidates=4, min_index_gap=5)
    i = np.asarray(out.i)
    j = np.asarray(out.j)
    valid = np.asarray(out.valid)
    pairs = {(int(a), int(b)) for a, b, v in zip(i, j, valid) if v}
    assert (2, 25) in pairs, (pairs, np.asarray(out.distance))


def test_m2dp_loop_method_runs(small_cfg):
    """close_loops(method='m2dp') wires end to end on a toy map."""
    import dataclasses

    from radarslampy_tpu.models.frontend import empty_map
    from radarslampy_tpu.models.loopclosure import close_loops

    cfg = dataclasses.replace(small_cfg, loop_method="m2dp")
    m = empty_map(cfg)
    rng2 = np.random.default_rng(5)
    M = 8
    K = cfg.k_max
    feat = rng2.normal(0, 15, (cfg.max_keyframes, K, 2)).astype(np.float32)
    m = m._replace(
        poses=jnp.asarray(
            np.pad(np.cumsum(rng2.normal(0, 1, (M, 3)), 0),
                   ((0, cfg.max_keyframes - M), (0, 0))).astype(np.float32)),
        feat_local=jnp.asarray(feat),
        feat_mask=jnp.ones((cfg.max_keyframes, K), bool),
        cursor=jnp.int32(M),
    )
    graph, matches = close_loops(m, cfg, min_index_gap=3)
    assert graph.poses.shape[0] == cfg.max_keyframes
    assert np.isfinite(np.asarray(matches.rel_pose)).all()


# ---------------------------------------------------------------------------
# Real-radar validation (VERDICT.md r03 missing #3): the appearance stack on
# the 11 real Oxford frames in data/tiny — descriptors must be stable
# frame-to-frame, rotation-consistent, and discriminative on *real* scans,
# not only on synthetic Gaussian blobs.  The reference stored keyframe point
# clouds precisely for this purpose (Mapping.py:62) and never used them.
# ---------------------------------------------------------------------------

import pytest

from tests.conftest import TINY_ROOT, tiny_available


def _real_polar_frames(n=11):
    from radarslampy_tpu.io import oxford

    seq = oxford.sequence_paths(TINY_ROOT, "tiny")
    paths = oxford.radar_image_paths(seq["radar"], seq["timestamps"])[:n]
    return [oxford.decode_radar_png(p, CFG).power for p in paths]


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_real_scan_context_adjacent_vs_far():
    """On real scans: adjacent frames (sub-metre apart at 4 Hz) must be much
    closer in scan-context distance than far-apart pairs, and every
    adjacent-pair alignment must report ~zero rotation (the platform turns
    < 0.1 rad across tiny)."""
    frames = _real_polar_frames()
    descs = [scan_context(jnp.asarray(f), CFG) for f in frames]

    adj = [float(sc_distance(descs[i], descs[i + 1]))
           for i in range(len(descs) - 1)]
    far = [float(sc_distance(descs[i], descs[j]))
           for i in range(len(descs)) for j in range(len(descs))
           if j - i >= 6]
    assert max(adj) < 0.3, adj
    assert np.mean(far) > 2.0 * np.mean(adj), (np.mean(adj), np.mean(far))
    # distance grows (weakly) monotonically with frame gap from frame 0
    d0 = [float(sc_distance(descs[0], descs[k])) for k in range(1, 11)]
    assert d0[-1] > d0[0], d0


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_real_scan_context_recovers_synthetic_roll():
    """sc_alignment must recover a synthetically applied row-roll of a REAL
    scan (rotation equivariance holds on real speckle, not only on
    synthetic blobs)."""
    frames = _real_polar_frames(3)
    A, S = CFG.num_azimuths, CFG.sc_sectors
    rows_per_sector = A // S
    for f in frames:
        d0 = scan_context(jnp.asarray(f), CFG)
        for q in (5, 33, 71):
            rolled = np.roll(np.asarray(f), q * rows_per_sector, axis=0)
            dq = scan_context(jnp.asarray(rolled), CFG)
            sim, k, rot = sc_alignment(d0, dq)
            assert float(sim) > 0.98, (q, float(sim))
            assert int(k) == q, (q, int(k))
    # and adjacent REAL frames still align at shift ~0 (no spurious rolls)
    da = scan_context(jnp.asarray(frames[0]), CFG)
    db = scan_context(jnp.asarray(frames[1]), CFG)
    _, k, _ = sc_alignment(da, db)
    S = CFG.sc_sectors
    assert min(int(k), S - int(k)) <= 1, int(k)


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_real_m2dp_from_real_pointclouds():
    """M2DP over point clouds extracted from REAL scans: stable under cloud
    rotation (PCA pre-alignment), discriminative between near and far
    frames."""
    import jax

    from radarslampy_tpu.models.frontend import keyframe_pointcloud
    from radarslampy_tpu.models.placerecog import m2dp_descriptor

    frames = _real_polar_frames()
    pc = jax.jit(
        lambda p: keyframe_pointcloud(p, jnp.zeros(3), CFG)
    )
    clouds = [pc(jnp.asarray(f)) for f in frames]

    descs = []
    for pts, mask in clouds:
        r = m2dp_descriptor(pts, mask)
        descs.append(np.asarray(r.desc))
        assert np.isfinite(descs[-1]).all()

    # rotation stability: rotating a real cloud by any angle leaves the
    # descriptor (PCA-aligned) essentially unchanged
    pts, mask = clouds[0]
    base = descs[0]
    for ang in (0.4, 1.1, 2.7):
        c, s = np.cos(ang), np.sin(ang)
        rot_pts = np.asarray(pts) @ np.array([[c, s], [-s, c]], np.float32)
        r = m2dp_descriptor(jnp.asarray(rot_pts), mask)
        cos = float(np.dot(base, np.asarray(r.desc)))
        assert cos > 0.95, (ang, cos)

    # adjacent real frames more similar than far pairs
    def cos_d(a, b):
        return 1.0 - float(np.dot(a, b))

    adj = [cos_d(descs[i], descs[i + 1]) for i in range(len(descs) - 1)]
    far = [cos_d(descs[i], descs[j]) for i in range(len(descs))
           for j in range(len(descs)) if j - i >= 6]
    assert np.mean(far) > np.mean(adj), (np.mean(adj), np.mean(far))
