"""Geometric-consistency outlier rejection, TPU-vectorised.

The reference builds a pairwise rigid-consistency graph and enumerates *all*
maximal cliques with networkx Bron-Kerbosch, keeping the largest
(`outlierRejection.py:16-95`) — exponential worst case and inherently serial.

TPU-native replacement (SURVEY.md §7 "robust"): the same O(K^2) dense boolean
compatibility matrix, then *iterative degree peeling*: repeatedly drop the
active feature with the most consistency violations until the surviving set is
mutually consistent.  The survivors form a clique of the compatibility graph by
construction; peeling is the standard polynomial approximation to maximum
clique used by robust-registration pipelines, runs as a bounded
`lax.while_loop` of fused VPU work, and its inlier sets are validated against
exact networkx cliques in tests/test_robust.py.

Distances are in Cartesian *pixels* with the reference's 0.5 m threshold
(`outlierRejection.py:10-13`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig


def _pairwise_dist(pts):
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


class RejectResult(NamedTuple):
    inlier_mask: jax.Array  # [K] bool — surviving mutually-consistent features
    n_inliers: jax.Array    # scalar int32


@partial(jax.jit, static_argnames=("cfg", "threshold_px"))
def reject_outliers(prev_coords, new_coords, mask, cfg: SlamConfig,
                    threshold_px: float | None = None) -> RejectResult:
    """Consistency peeling over [K,2] correspondence sets with validity mask.

    A pair (i, j) is *compatible* when the inter-point distance is preserved
    between frames within the threshold — rigid-scene geometry
    (`outlierRejection.py:49-58`).  Invalid (padded) slots never participate.
    """
    if threshold_px is None:
        threshold_px = cfg.clique_dist_threshold_px
    K = prev_coords.shape[0]
    d_prev = _pairwise_dist(prev_coords)
    d_new = _pairwise_dist(new_coords)
    compat = jnp.abs(d_prev - d_new) <= threshold_px
    eye = jnp.eye(K, dtype=bool)
    pair_valid = mask[:, None] & mask[None, :] & ~eye

    def violations(active):
        act_pair = pair_valid & active[:, None] & active[None, :]
        return jnp.sum((act_pair & ~compat).astype(jnp.int32), axis=1)

    def cond(state):
        active, _ = state
        return jnp.any(violations(active) > 0)

    def body(state):
        active, it = state
        v = violations(active)
        # drop the active node with the most violations (ties -> lowest index)
        v = jnp.where(active, v, -1)
        worst = jnp.argmax(v)
        return active.at[worst].set(False), it + 1

    active, _ = jax.lax.while_loop(cond, body, (mask, jnp.int32(0)))
    return RejectResult(inlier_mask=active, n_inliers=jnp.sum(active.astype(jnp.int32)))
