"""FMT phase-correlation rotation + per-azimuth point-cloud extraction."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.fmt import estimate_rotation_fmt, phase_correlate
from radarslampy_tpu.ops.pointcloud import extract_pointcloud
from radarslampy_tpu.sim import fakedata as fd

CFG = SlamConfig()


def test_phase_correlate_recovers_shift(rng):
    img = rng.random((128, 256)).astype(np.float32)
    # circular shift is phase correlation's exact model
    shifted = np.roll(img, (5, -9), axis=(0, 1))
    dy, dx, resp = phase_correlate(jnp.asarray(img), jnp.asarray(shifted))
    assert abs(float(dy) - (-5)) < 0.5
    assert abs(float(dx) - 9) < 0.5


def test_fmt_rotation_on_rendered_scans(rng):
    world_pts, world_refl = fd.make_world(rng, 600, 80.0)
    rot = 0.15  # rad
    a = fd.render_polar_scan(world_pts, world_refl, np.zeros(3), CFG, rng=rng,
                             noise=0.01)
    b = fd.render_polar_scan(world_pts, world_refl, np.array([0.0, 0.0, rot]),
                             CFG, rng=rng, noise=0.01)
    res = estimate_rotation_fmt(jnp.asarray(a), jnp.asarray(b), CFG)
    # sign convention: FMT.py:76-88 returns -delta_row * 2pi / H; a scene
    # rotated by +rot shifts polar rows by -rot/2pi*A
    assert abs(abs(float(res.rot_rad)) - rot) < 0.02


def test_pointcloud_finds_strong_returns(rng):
    A, Wp = CFG.num_azimuths, CFG.polar_width_padded
    polar = rng.rayleigh(0.02, (A, Wp)).astype(np.float32)
    polar[:, CFG.clipped_range_bins:] = 0
    # plant strong returns at known ranges on a few azimuths
    planted = {10: 500, 100: 1200, 399: 77}
    for az, rng_bin in planted.items():
        polar[az, rng_bin - 1 : rng_bin + 2] = [0.5, 1.0, 0.5]
    pc = extract_pointcloud(jnp.asarray(polar), CFG)
    ri = np.asarray(pc.range_idx)
    mask = np.asarray(pc.mask)
    for az, rng_bin in planted.items():
        got = ri[az][mask[az]]
        assert (np.abs(got - rng_bin) < 2).any(), f"azimuth {az} missed"


def test_pointcloud_shapes_and_masks(rng):
    polar = jnp.zeros((CFG.num_azimuths, CFG.polar_width_padded), jnp.float32)
    pc = extract_pointcloud(polar, CFG)
    assert pc.range_idx.shape == (CFG.num_azimuths, CFG.pc_peaks_per_azimuth)
    assert not bool(np.asarray(pc.mask).any())  # nothing on an empty scan


def test_keyframe_pointcloud_geometry(rng):
    """keyframe_pointcloud maps planted polar peaks to correct metric (x, y)
    sensor-local coordinates (the per-keyframe cloud of Mapping.py:62)."""
    from radarslampy_tpu.models.frontend import keyframe_pointcloud

    A, Wp = CFG.num_azimuths, CFG.polar_width_padded
    polar = rng.rayleigh(0.01, (A, Wp)).astype(np.float32)
    polar[:, CFG.clipped_range_bins:] = 0
    planted = [(0, 800), (100, 1200), (200, 400)]  # (azimuth row, range bin)
    for az, rb in planted:
        polar[az, rb - 1 : rb + 2] = [0.5, 1.0, 0.5]
    pts, mask = keyframe_pointcloud(jnp.asarray(polar), jnp.zeros(3), CFG)
    pts = np.asarray(pts)[np.asarray(mask)]
    assert len(pts) >= len(planted)
    for az, rb in planted:
        phi = az / A * 2 * np.pi
        r = rb * CFG.range_resolution_m
        expect = np.array([r * np.cos(phi), r * np.sin(phi)])
        d = np.linalg.norm(pts - expect, axis=1).min()
        assert d < 3 * CFG.range_resolution_m, (az, rb, d)


def test_map_stores_pointcloud_and_m2dp_uses_it(rng):
    """Keyframes persist their dense point cloud into MapState and
    m2dp_from_map(auto) consumes it (VERDICT.md missing #1)."""
    import jax

    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.models.placerecog import m2dp_from_map

    cfg = SlamConfig(cart_size=512, cart_downsample=8, n_candidates=256,
                     anms_top_k=100, k_max=128, pc_points_per_kf=256)
    maps = build_frame_maps(cfg)
    world_pts, world_refl = fd.make_world(rng, 500, 80.0)
    scan = fd.render_polar_scan(world_pts, world_refl, np.zeros(3), cfg,
                                rng=rng, noise=0.01)
    state = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))(
        jnp.asarray(scan), maps)
    m = state.map
    assert int(np.asarray(m.pc_mask[0]).sum()) > 50
    # stored cloud points lie within the clipped range
    pts = np.asarray(m.pc_local[0])[np.asarray(m.pc_mask[0])]
    assert (np.linalg.norm(pts, axis=1) <= cfg.max_range_clip_m + 1).all()
    res = m2dp_from_map(m)
    d0 = np.asarray(res.desc[0])
    assert np.isfinite(d0).all() and abs(np.linalg.norm(d0) - 1) < 1e-3
    # auto source really used the point cloud: descriptor differs from the
    # sparse-feature one
    res_feat = m2dp_from_map(m, source="features")
    assert not np.allclose(d0, np.asarray(res_feat.desc[0]), atol=1e-4)
