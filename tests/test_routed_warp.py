"""Routed (fast-gather) warp must match the naive bilinear warp."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.grid import build_grid_maps, polar_to_cartesian
from radarslampy_tpu.ops.routed_warp import (
    build_routed_warp_maps,
    routed_polar_to_cartesian,
)

CFG = SlamConfig(cart_size=512, cart_downsample=8)


def test_routed_matches_naive(rng):
    maps_naive = build_grid_maps(CFG)
    maps_routed = build_routed_warp_maps(CFG)
    polar = jnp.asarray(
        rng.random((CFG.num_azimuths, CFG.polar_width_padded)).astype(np.float32)
    )
    ref = np.asarray(polar_to_cartesian(polar, maps_naive, CFG))
    fast = np.asarray(routed_polar_to_cartesian(polar, maps_routed))
    err = np.abs(ref - fast)
    assert err.max() < 1e-4, f"max err {err.max()} at {np.unravel_index(err.argmax(), err.shape)}"


def test_routed_region_cover(rng):
    """The 4 pass masks are disjoint and cover exactly the in-range disc."""
    maps = build_routed_warp_maps(CFG)
    m = np.asarray(maps.mask)
    m_out = np.stack([m[0], m[1], m[2].T, m[3].T])
    total = m_out.sum(axis=0)
    assert total.max() == 1, "pass regions overlap"
    S = CFG.cart_size
    c = (S - 1) / 2
    v, u = np.mgrid[0:S, 0:S]
    inside = np.hypot(u - c, v - c) * CFG.cart_downsample <= (
        CFG.clipped_range_bins - 1
    )
    assert (total.astype(bool) == inside).all()


def test_routed_ring_geometry(rng):
    """Same physical check as the naive warp's ring test."""
    maps = build_routed_warp_maps(CFG)
    polar = np.zeros((CFG.num_azimuths, CFG.polar_width_padded), np.float32)
    polar[:, 788:812] = 1.0
    cart = np.asarray(routed_polar_to_cartesian(jnp.asarray(polar), maps))
    c = (CFG.cart_size - 1) / 2
    r_px = 800 / CFG.cart_downsample
    row = int(round(c))
    assert cart[row, int(c + r_px - 1) : int(c + r_px + 2)].max() > 0.5
    assert cart[row, int(round(c + r_px * 0.7))] < 0.1
