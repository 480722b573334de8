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
