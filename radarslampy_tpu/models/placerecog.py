"""Appearance-based place recognition over radar scans (Scan Context style).

The reference stores a per-keyframe point cloud "for computing descriptors like
M2DP for loop closure detection" but never implements the descriptor
(`Mapping.py:62`, `getPointCloud.py`; raw-roam.pdf p.6 "Future work").  This
module supplies that missing capability, TPU-native, using the radar's *native*
polar geometry: a Navtech scan is already a (azimuth x range) grid, so the
classic Scan Context descriptor (rings x sectors polar occupancy signature,
Kim & Kim IROS'18) needs no point-cloud binning at all — it is one reshape-max
pooling of the polar power image.

Everything is fixed-shape and batched:
  * descriptor:          one [A, W] -> [R, S] max-pool        (per keyframe)
  * rotation-invariant
    retrieval key:       sector mean -> [R]                   (one reduction)
  * pairwise retrieval:  ring-key distances = one [M,R]x[R,M] matmul
  * alignment + score:   all S circular shifts at once via the [S, S] column
                         cosine matrix (one [S,R]x[R,S] matmul + diagonal
                         gather) — the MXU does the whole shift search.

The best circular shift doubles as a rotation *initialiser* for the ICP
verification stage (loopclosure.py), which is what makes appearance candidates
usable under large odometry drift — exactly the regime where the pose-proximity
candidate search fails.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig


def scan_context(polar, cfg: SlamConfig):
    """Polar power scan [A, Wpad] -> descriptor [R, S] (rings x sectors).

    Max-pools range bins into R rings and azimuth rows into S sectors.  Max
    (not mean) pooling mirrors Scan Context's max-height encoding: a strong
    reflector anywhere in the cell marks it occupied, robust to speckle.
    """
    A, R, S = cfg.num_azimuths, cfg.sc_rings, cfg.sc_sectors
    assert A % S == 0, "sc_sectors must divide num_azimuths"
    bins = (cfg.clipped_range_bins // R) * R
    p = polar[:, :bins]
    p = p.reshape(A, R, bins // R).max(axis=2)      # [A, R] ring profile per row
    p = p.reshape(S, A // S, R).max(axis=1)         # [S, R] pooled sectors
    return p.T                                      # [R, S]


def ring_key(desc):
    """Rotation-invariant retrieval key [..., R]: sector mean per ring."""
    return desc.mean(axis=-1)


def sc_alignment(d1, d2):
    """Best circular sector alignment between two descriptors.

    Returns (similarity in [0,1], shift k, rotation radians) maximising the
    mean column cosine over all S circular shifts; rotation follows the frame
    convention of `estimate_rotation_fmt`: d2's scene is d1's rotated by `rot`.
    """
    R, S = d1.shape
    eps = 1e-8
    n1 = d1 / (jnp.linalg.norm(d1, axis=0, keepdims=True) + eps)  # [R, S]
    n2 = d2 / (jnp.linalg.norm(d2, axis=0, keepdims=True) + eps)
    dots = n1.T @ n2                                              # [S, S]
    s = jnp.arange(S)
    # sims[k] = mean_s dots[s, (s + k) % S]
    sims = dots[s[None, :], (s[None, :] + s[:, None]) % S].mean(axis=1)  # [S]
    k = jnp.argmax(sims)
    rot = k.astype(d1.dtype) * (2.0 * jnp.pi / S)
    rot = jnp.where(rot > jnp.pi, rot - 2.0 * jnp.pi, rot)
    return sims[k], k, rot


def sc_distance(d1, d2):
    """Scan-context distance in [0, 1]: 1 - best-shift mean column cosine."""
    sim, _, _ = sc_alignment(d1, d2)
    return 1.0 - sim


class AppearanceCandidates(NamedTuple):
    i: jax.Array        # [C] earlier keyframe index
    j: jax.Array        # [C] later keyframe index
    distance: jax.Array # [C] scan-context distance
    rot_init: jax.Array # [C] rotation initialiser for verification (rad)
    valid: jax.Array    # [C]


@partial(jax.jit, static_argnames=("max_candidates", "min_index_gap",
                                   "prefilter"))
def find_candidates_appearance(
    descriptors,            # [M, R, S] keyframe descriptors (live prefix)
    cursor,                 # int32 number of live keyframes
    max_candidates: int,
    min_index_gap: int = 20,
    max_distance: float = 0.35,
    prefilter: int = 4,
) -> AppearanceCandidates:
    """Loop candidates by appearance alone (no pose prior).

    Two-stage, all on device: (1) ring-key L2 over all pairs — one matmul-sized
    [M, M] scoring; (2) exact all-shift scan-context distance on the
    `prefilter * max_candidates` best pairs, returning the final top
    `max_candidates` with per-pair rotation initialisers.
    """
    M = descriptors.shape[0]
    keys = ring_key(descriptors)                       # [M, R]
    idx = jnp.arange(M)
    live = idx < cursor
    kd = jnp.linalg.norm(keys[:, None, :] - keys[None, :, :], axis=-1)
    gap_ok = (idx[None, :] - idx[:, None]) >= min_index_gap
    ok = live[:, None] & live[None, :] & gap_ok
    score = jnp.where(ok, kd, jnp.inf)

    P = prefilter * max_candidates
    vals, flat = jax.lax.top_k(-score.reshape(-1), P)
    pi = (flat // M).astype(jnp.int32)
    pj = (flat % M).astype(jnp.int32)
    pre_ok = jnp.isfinite(-vals)

    def exact(a, b):
        sim, _, rot = sc_alignment(descriptors[a], descriptors[b])
        # sc_alignment reports the *scene* rotation seen from the sensor (FMT
        # convention); the ICP/pose-graph initialiser wants the relative
        # sensor heading theta_j - theta_i, which is its negation.
        return 1.0 - sim, -rot

    dist, rot = jax.vmap(exact)(pi, pj)
    dist = jnp.where(pre_ok, dist, jnp.inf)
    best = jnp.argsort(dist)[:max_candidates]
    d = dist[best]
    return AppearanceCandidates(
        i=pi[best], j=pj[best], distance=d, rot_init=rot[best],
        valid=jnp.isfinite(d) & (d <= max_distance),
    )
