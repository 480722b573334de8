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
