"""Speed-of-light polar->Cartesian warp via axis-aligned routed gathers.

The naive warp (`ops/grid.py`) is a 4-tap arbitrary 2-D gather: XLA lowers it
to a scalar gather loop (~35 ms for 1024^2 on one TPU v5e chip).  But TPUs have
a *fast* hardware path for `take_along_axis`-style gathers (one axis, index
array congruent with the operand): measured ~0.03 ms for an 8 MB gather —
full HBM bandwidth.

This module routes the bilinear polar warp through that fast path ("rook
routing"): every Cartesian pixel reads polar(az, rng); we factor the 2-D lookup
into an azimuth gather (axis 0) followed by a range gather (axis 1), using a
*static intermediate layout* where the value destined for cart pixel (v, u)
is parked at coordinates (v, floor(rng(v,u))) between the stages.

The factorisation needs the map u -> floor(rng) to be injective within each
output row, which holds exactly on the shallow octants (|du| >= |dv|, where
range grows by >= 4/sqrt(2) ~ 2.8 bins per pixel) split into left/right; the
steep octants are handled identically in the transposed output frame.  Four
statically-masked passes cover the disc:

    pass (per octant pair):
      tA0[v, p] = (1-FR) * P[RA[v,p], p] + FR * P[RA[v,p], p+1]   # range lerp
      tA1[v, p] = same with azimuth row RA+1 (mod A)              # 2nd az tap
      out[v, u] = (1-FA) * tA0[v, CB[v,u]] + FA * tA1[v, CB[v,u]] # az lerp

All maps (RA, FR, CB, FA, region masks) are precomputed once on the host.
Six take_along_axis calls per pass, 4 passes: ~50x faster than the naive warp
and bit-identical to it up to float addition order (validated in
tests/test_routed_warp.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig


class RoutedWarpMaps(NamedTuple):
    """Static routing maps.

    IMPORTANT: pass these through jit as *runtime arguments*, never closure
    constants — XLA lowers gathers with constant index operands onto a ~1000x
    slower path (measured: 22 ms vs 0.03 ms for one [1024, 2048] gather).
    """

    # per pass (4 passes stacked on axis 0):
    ra: jax.Array     # [4, S, B] int32 azimuth row parked at (row, range-bin)
    fr: jax.Array     # [4, S, B] float range fraction parked likewise
    cb: jax.Array     # [4, S, S] int32 range-bin column per output pixel
    fa: jax.Array     # [4, S, S] float azimuth fraction per output pixel
    mask: jax.Array   # [4, S, S] bool pass-region ownership (disjoint)
    # [4, B, S] int32: ra transposed.  The azimuth gather is executed as a
    # take_along_axis along AXIS 1 of the TRANSPOSED polar operand: on the
    # current axon TPU runtime an axis-0 take_along_axis lowers to a ~24 ms
    # slow path while the axis-1 form runs at memory speed (WARP_MICRO_r05:
    # 51.6 ms vs 25.0 ms against a 28 ms dispatch floor; 16 axis-0 gathers
    # were 429 of the fused step's 458 ms, PROFILE_r05).
    ra_t: jax.Array = None


def build_routed_warp_maps(cfg: SlamConfig) -> RoutedWarpMaps:
    S = cfg.cart_size
    A = cfg.num_azimuths
    B = cfg.polar_width_padded
    bins = cfg.clipped_range_bins
    c = (S - 1) / 2.0

    v, u = np.mgrid[0:S, 0:S].astype(np.float64)
    du = u - c
    dv = v - c
    rng = np.hypot(du, dv) * cfg.cart_downsample
    rng = np.minimum(rng, bins - 1 - 1e-3)
    phi = np.arctan2(dv, du)
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    az = phi / (2 * np.pi) * A

    a0 = np.floor(az)
    fa = (az - a0).astype(np.float32)
    a0 = a0.astype(np.int64) % A
    r0 = np.floor(rng).astype(np.int64)
    fr = (rng - r0).astype(np.float32)

    inside = np.hypot(du, dv) * cfg.cart_downsample <= (bins - 1)
    # disjoint octant-pair regions (processed in output frame / transposed)
    hr = du >= np.abs(dv)
    regions = [
        inside & hr,                            # HR: row-wise, right (incl. diagonals)
        inside & (du <= -np.abs(dv)) & ~hr,     # HL: row-wise, left (incl. diagonals)
        inside & (dv > np.abs(du)),             # VB: column-wise, bottom (strict)
        inside & (dv < -np.abs(du)),            # VT: column-wise, top (strict)
    ]

    ra = np.zeros((4, S, B), np.int32)
    frm = np.zeros((4, S, B), np.float32)
    cb = np.zeros((4, S, S), np.int32)
    fam = np.zeros((4, S, S), np.float32)
    maskm = np.zeros((4, S, S), bool)

    for p, reg in enumerate(regions):
        transposed = p >= 2
        if transposed:
            # operate on the transposed output: rows of the working frame are
            # output columns; all per-pixel maps transpose accordingly
            reg_t = reg.T
            a0_t, fa_t, r0_t, fr_t = a0.T, fa.T, r0.T, fr.T
        else:
            reg_t = reg
            a0_t, fa_t, r0_t, fr_t = a0, fa, r0, fr

        rows, cols = np.nonzero(reg_t)
        park = r0_t[rows, cols]
        # injectivity within (pass, row): guaranteed by the octant geometry
        key = rows * B + park
        assert len(np.unique(key)) == len(key), f"routing collision in pass {p}"
        ra[p, rows, park] = a0_t[rows, cols]
        frm[p, rows, park] = fr_t[rows, cols]
        cb[p, rows, cols] = park
        fam[p, rows, cols] = fa_t[rows, cols]
        maskm[p] = reg_t

    return RoutedWarpMaps(
        ra=jnp.asarray(ra),
        fr=jnp.asarray(frm),
        cb=jnp.asarray(cb),
        fa=jnp.asarray(fam),
        mask=jnp.asarray(maskm),
        ra_t=jnp.asarray(np.ascontiguousarray(ra.transpose(0, 2, 1))),
    )


@jax.jit
def routed_polar_to_cartesian(polar, maps: RoutedWarpMaps):
    """Warp a [A, B] polar scan to [S, S] Cartesian via 24 fast gathers.

    NOTE `maps` must be a runtime argument (see RoutedWarpMaps docstring), and
    every quantity feeding index arithmetic must be static or array-valued —
    a *traced scalar* in the `% A` pushed XLA onto the slow gather path
    (measured 430 ms vs 0.04 ms for this whole function).
    """
    A = polar.shape[0]  # static
    S = maps.cb.shape[-1]
    # range-shifted copy for the r+1 tap (zero pad keeps edge behaviour)
    p_shift = jnp.pad(polar[:, 1:], ((0, 0), (0, 1)))
    # transposed operands for the azimuth gathers: the axis-1 take_along_axis
    # form is the one on the fast TPU path (see RoutedWarpMaps.ra_t)
    polar_t = polar.T          # [B, A]
    p_shift_t = p_shift.T

    out = jnp.zeros((S, S), polar.dtype)
    for p in range(4):
        fr = maps.fr[p]
        ra0_t = maps.ra_t[p]                  # [B, S]
        ra1_t = (ra0_t + 1) % A
        # stage A: azimuth gather (axis-1 on transposed operands) +
        # in-place range lerp -> parked columns
        t0 = (1 - fr) * jnp.take_along_axis(polar_t, ra0_t, axis=1).T + \
            fr * jnp.take_along_axis(p_shift_t, ra0_t, axis=1).T
        t1 = (1 - fr) * jnp.take_along_axis(polar_t, ra1_t, axis=1).T + \
            fr * jnp.take_along_axis(p_shift_t, ra1_t, axis=1).T
        # keep the two stages as separate materialised gathers
        t0, t1 = jax.lax.optimization_barrier((t0, t1))
        # stage B: un-park along the range axis to output pixel order
        g0 = jnp.take_along_axis(t0, maps.cb[p], axis=1)
        g1 = jnp.take_along_axis(t1, maps.cb[p], axis=1)
        val = (1 - maps.fa[p]) * g0 + maps.fa[p] * g1
        if p >= 2:
            val = val.T
            contrib = jnp.where(maps.mask[p].T, val, 0.0)
        else:
            contrib = jnp.where(maps.mask[p], val, 0.0)
        out = out + contrib
    return out
