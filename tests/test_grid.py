"""Polar<->Cartesian resampling: geometric correctness properties."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.grid import (
    bilinear_sample_image,
    build_grid_maps,
    polar_to_cartesian,
    polar_to_logpolar,
)

CFG = SlamConfig(cart_size=512, cart_downsample=8)  # small grid for CPU speed


def test_cart_center_is_range_zero():
    maps = build_grid_maps(CFG)
    c = (CFG.cart_size - 1) / 2
    center_rng = float(maps.cart_rng[CFG.cart_size // 2, CFG.cart_size // 2])
    assert center_rng < CFG.cart_downsample * 1.5


def test_known_direction_mapping():
    """A bright ring at fixed range must appear at that radius in Cartesian."""
    maps = build_grid_maps(CFG)
    A, Wp = CFG.num_azimuths, CFG.polar_width_padded
    polar = np.zeros((A, Wp), np.float32)
    ring_bin = 800
    polar[:, ring_bin - 12 : ring_bin + 12] = 1.0
    cart = np.asarray(polar_to_cartesian(jnp.asarray(polar), maps, CFG))
    c = (CFG.cart_size - 1) / 2
    r_px = ring_bin / CFG.cart_downsample
    # sample along +x axis at expected ring radius (widened ring absorbs the
    # half-pixel centre offset)
    row = int(round(c))
    val_on = cart[row, int(c + r_px - 1) : int(c + r_px + 2)].max()
    val_off = cart[row, int(round(c + r_px * 0.7))]
    assert val_on > 0.5
    assert val_off < 0.1


def test_azimuth_zero_points_along_plus_x():
    """Energy only in azimuth row 0 must land along the +x image direction."""
    maps = build_grid_maps(CFG)
    polar = np.zeros((CFG.num_azimuths, CFG.polar_width_padded), np.float32)
    polar[0:3, 200:1200] = 1.0
    cart = np.asarray(polar_to_cartesian(jnp.asarray(polar), maps, CFG))
    c = CFG.cart_size // 2
    right = cart[c - 2 : c + 3, c + 30 :].sum()
    left = cart[c - 2 : c + 3, : c - 30].sum()
    assert right > 10 * max(left, 1e-6)


def test_out_of_range_filled_with_zero():
    maps = build_grid_maps(CFG)
    polar = np.ones((CFG.num_azimuths, CFG.polar_width_padded), np.float32)
    cart = np.asarray(polar_to_cartesian(jnp.asarray(polar), maps, CFG))
    assert cart[0, 0] == 0.0  # corner beyond max range
    assert cart[CFG.cart_size // 2, CFG.cart_size // 2] > 0.5


def test_logpolar_monotone_range():
    maps = build_grid_maps(CFG)
    # gradient image: power == range bin index
    A, Wp = CFG.num_azimuths, CFG.polar_width_padded
    polar = np.tile(np.arange(Wp, dtype=np.float32), (A, 1))
    lp = np.asarray(polar_to_logpolar(jnp.asarray(polar), maps, CFG))
    # log-spaced sampling of a linear ramp must be monotone increasing
    row = lp[0]
    assert np.all(np.diff(row[5:]) >= -1e-3)
    np.testing.assert_allclose(row[-1], CFG.clipped_range_bins - 1, rtol=0.01)


def test_bilinear_sample_exact_on_grid():
    img = jnp.asarray(np.arange(25, dtype=np.float32).reshape(5, 5))
    xy = jnp.asarray([[2.0, 3.0], [0.0, 0.0], [4.0, 4.0]])
    out = np.asarray(bilinear_sample_image(img, xy))
    np.testing.assert_allclose(out, [17.0, 0.0, 24.0])


def test_bilinear_sample_interpolates():
    img = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]], np.float32))
    out = float(bilinear_sample_image(img, jnp.asarray([[0.5, 0.5]]))[0])
    np.testing.assert_allclose(out, 1.5)
