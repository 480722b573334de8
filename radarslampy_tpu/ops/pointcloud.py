"""Per-azimuth radar point-cloud extraction (masked peak detection).

Replaces scipy's `find_peaks` loop in `getPointCloud.py:11-52`: for every
azimuth, local maxima of the power profile are found with a vectorised
neighbour comparison, gated at mean + 1*std of the *peak* heights per azimuth
(matching the reference's `height=None` + post-filter behaviour), and the top
`pc_peaks_per_azimuth` per azimuth are kept into a fixed-shape tensor.

Output feeds keyframe storage (Mapping.py:62) and is the hook for future
loop-closure descriptors (M2DP in the paper's future work).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig


class PointCloud(NamedTuple):
    range_idx: jax.Array  # [A, P] float32 range-bin index of each kept peak
    power: jax.Array      # [A, P] peak power
    mask: jax.Array       # [A, P] validity


def extract_pointcloud(polar, cfg: SlamConfig) -> PointCloud:
    """polar: [A, Wpad] power scan -> top-P peaks per azimuth above mean+std."""
    bins = cfg.clipped_range_bins
    x = polar[:, :bins]
    left = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=jnp.inf)
    right = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=jnp.inf)
    is_peak = (x > left) & (x >= right) & (x > 0)

    peak_vals = jnp.where(is_peak, x, jnp.nan)
    mean = jnp.nanmean(peak_vals, axis=1, keepdims=True)
    std = jnp.nanstd(peak_vals, axis=1, keepdims=True)
    strong = is_peak & (x >= mean + std)

    scored = jnp.where(strong, x, -jnp.inf)
    vals, idx = jax.lax.top_k(scored, cfg.pc_peaks_per_azimuth)
    ok = jnp.isfinite(vals)
    return PointCloud(
        range_idx=idx.astype(jnp.float32),
        power=jnp.where(ok, vals, 0.0),
        mask=ok,
    )
