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


@partial(jax.jit, static_argnames=("block", "max_candidates", "min_index_gap",
                                   "prefilter"))
def find_candidates_appearance_block(
    descriptors,            # [M, R, S] keyframe descriptors (live prefix)
    cursor,                 # int32 number of live keyframes
    lo,                     # int32 first NEW keyframe index (block start)
    block: int,             # static row-block size
    max_candidates: int,
    min_index_gap: int = 20,
    max_distance: float = 0.35,
    prefilter: int = 4,
) -> AppearanceCandidates:
    """`find_candidates_appearance` restricted to pairs whose LATER keyframe
    lies in [lo, lo+block) — the incremental-backend retrieval (only keyframes
    added since the last pass are scored, O(block*M) instead of O(M^2);
    VERDICT.md weak #4)."""
    M = descriptors.shape[0]
    keys = ring_key(descriptors)                       # [M, R]
    j = lo + jnp.arange(block)
    jc = jnp.minimum(j, M - 1)
    i = jnp.arange(M)
    kd = jnp.linalg.norm(keys[jc][:, None, :] - keys[None, :, :], axis=-1)
    ok = ((j < cursor)[:, None] & (i < cursor)[None, :]
          & ((jc[:, None] - i[None, :]) >= min_index_gap))
    score = jnp.where(ok, kd, jnp.inf)

    P = prefilter * max_candidates
    vals, flat = jax.lax.top_k(-score.reshape(-1), P)
    pj = jc[(flat // M)].astype(jnp.int32)
    pi = (flat % M).astype(jnp.int32)
    pre_ok = jnp.isfinite(-vals)

    def exact(a, b):
        sim, _, rot = sc_alignment(descriptors[a], descriptors[b])
        return 1.0 - sim, -rot

    dist, rot = jax.vmap(exact)(pi, pj)
    dist = jnp.where(pre_ok, dist, jnp.inf)
    best = jnp.argsort(dist)[:max_candidates]
    d = dist[best]
    return AppearanceCandidates(
        i=pi[best], j=pj[best], distance=d, rot_init=rot[best],
        valid=jnp.isfinite(d) & (d <= max_distance),
    )


# --------------------------------------------------------------------------- #
# M2DP (2-D adaptation) — the descriptor the reference paper names             #
# --------------------------------------------------------------------------- #


class M2dpResult(NamedTuple):
    desc: jax.Array   # [n_dirs + n_bins] unit-norm signature
    angle: jax.Array  # [] PCA alignment angle (world heading of the cloud's
                      # principal axis in the sensor frame) — differencing two
                      # keyframes' angles initialises relative rotation


def m2dp_descriptor(points, mask, n_dirs: int = 16, n_bins: int = 24,
                    radius_m: float = 80.0, soft_px: float = 2.0):
    """M2DP descriptor of a 2-D point cloud (He, Wang & Zhang IROS'16, adapted
    from 3-D to the planar radar case).

    The reference stores a per-keyframe point cloud precisely "for computing
    descriptors like M2DP" but never builds the descriptor (`Mapping.py:62`,
    raw-roam.pdf p.6).  The original projects a PCA-aligned 3-D cloud onto
    multiple 2-D view planes and SVDs the stacked ring/sector density
    signatures; the planar analogue projects the PCA-aligned 2-D cloud onto
    `n_dirs` view *lines* and SVDs the stacked 1-D soft density histograms —
    the same multiview-projection + rank-1 factorisation idea, one dimension
    down.  Everything is fixed-shape and vmappable: center -> closed-form 2x2
    eigenvector -> [n_dirs] rotations -> soft scatter-add histograms [D, B]
    -> SVD -> concat(u1, v1).

    Rotation invariance comes from the PCA pre-alignment (sign disambiguated
    by third-moment skewness, as in the paper); the alignment angle is
    returned so retrieval can hand ICP a relative-rotation initialiser.
    """
    w = mask.astype(points.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mu = (points * w[:, None]).sum(0) / n
    c = (points - mu) * w[:, None]

    # principal axis of the 2x2 covariance, closed form
    sxx = jnp.sum(c[:, 0] * c[:, 0])
    syy = jnp.sum(c[:, 1] * c[:, 1])
    sxy = jnp.sum(c[:, 0] * c[:, 1])
    angle = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    ca, sa = jnp.cos(-angle), jnp.sin(-angle)
    ax = ca * c[:, 0] - sa * c[:, 1]
    ay = sa * c[:, 0] + ca * c[:, 1]
    # sign disambiguation: positive skewness along both axes (M2DP §III-A)
    fx = jnp.where(jnp.sum(ax**3) < 0, -1.0, 1.0)
    fy = jnp.where(jnp.sum(ay**3) < 0, -1.0, 1.0)
    ax = ax * fx
    ay = ay * fy
    angle = jnp.where(fx < 0, angle + jnp.pi, angle)
    angle = jnp.arctan2(jnp.sin(angle), jnp.cos(angle))

    thetas = jnp.linspace(0.0, jnp.pi, n_dirs, endpoint=False)
    proj = (ax[None, :] * jnp.cos(thetas)[:, None]
            + ay[None, :] * jnp.sin(thetas)[:, None])      # [D, P]
    # soft 1-D histogram: linear hat around each point's bin position
    pos = (proj / radius_m + 1.0) * 0.5 * (n_bins - 1)     # [D, P] in bins
    pos = jnp.clip(pos, 0.0, n_bins - 1.0)
    centers = jnp.arange(n_bins, dtype=points.dtype)
    dist = jnp.abs(pos[:, :, None] - centers[None, None, :])
    hat = jnp.maximum(0.0, 1.0 - dist / soft_px)           # [D, P, B]
    A = (hat * w[None, :, None]).sum(axis=1)               # [D, B]
    A = A / (jnp.linalg.norm(A, axis=1, keepdims=True) + 1e-8)

    u, s, vt = jnp.linalg.svd(A, full_matrices=False)
    u1 = u[:, 0] * jnp.sign(u[0, 0] + 1e-12)
    v1 = vt[0] * jnp.sign(u[0, 0] + 1e-12)
    d = jnp.concatenate([u1, v1])
    d = d / (jnp.linalg.norm(d) + 1e-8)
    return M2dpResult(desc=d, angle=angle)


def m2dp_from_map(m, n_dirs: int = 16, n_bins: int = 24,
                  radius_m: float = 80.0, source: str = "auto"):
    """Batched M2DP over a MapState's keyframe clouds: [M, D+B].

    `source`: "pointcloud" uses the stored dense peak clouds (`m.pc_local` —
    what the reference stores keyframe clouds *for*, Mapping.py:62), "features"
    the sparse ANMS feature clouds, "auto" decides PER KEYFRAME — the stored
    cloud where one exists, the feature cloud otherwise — so mixed maps (e.g.
    a restored legacy checkpoint with new keyframes appended) never compute
    descriptors from fully-masked empty input (ADVICE.md r02 #4).  Traceable:
    no host bool conversion, safe under jit/vmap.
    """
    if source == "pointcloud":
        pts, mask = m.pc_local, m.pc_mask
    elif source == "features":
        pts, mask = m.feat_local, m.feat_mask
    else:
        assert source == "auto", source
        P = m.pc_local.shape[1]
        K = m.feat_local.shape[1]
        N = max(P, K)

        def padp(a):
            return jnp.pad(a, ((0, 0), (0, N - a.shape[1])) + ((0, 0),) * (a.ndim - 2))

        has_pc = jnp.any(m.pc_mask, axis=1)                      # [M]
        pts = jnp.where(has_pc[:, None, None], padp(m.pc_local),
                        padp(m.feat_local))
        mask = jnp.where(has_pc[:, None], padp(m.pc_mask), padp(m.feat_mask))
    return jax.vmap(
        lambda p, k: m2dp_descriptor(p, k, n_dirs, n_bins, radius_m)
    )(pts, mask)


@partial(jax.jit, static_argnames=("max_candidates", "min_index_gap"))
def find_candidates_m2dp(
    descs,                # [M, D+B] unit-norm descriptors
    angles,               # [M] PCA alignment angles
    cursor,
    max_candidates: int,
    min_index_gap: int = 20,
    max_distance: float = 0.25,
) -> AppearanceCandidates:
    """Loop candidates by M2DP cosine distance: one [M, M] matmul retrieval.

    Unlike scan-context there is no shift search — the descriptor is already
    rotation invariant — so retrieval is a single Gram matrix.  The relative
    rotation initialiser is the difference of PCA alignment angles (mod pi
    ambiguity resolved by skewness at build time).
    """
    M = descs.shape[0]
    idx = jnp.arange(M)
    live = idx < cursor
    sim = descs @ descs.T                                  # [M, M]
    gap_ok = (idx[None, :] - idx[:, None]) >= min_index_gap
    ok = live[:, None] & live[None, :] & gap_ok
    dist = jnp.where(ok, 1.0 - sim, jnp.inf)

    vals, flat = jax.lax.top_k(-dist.reshape(-1), max_candidates)
    ci = (flat // M).astype(jnp.int32)
    cj = (flat % M).astype(jnp.int32)
    d = -vals
    rot = angles[ci] - angles[cj]
    rot = jnp.arctan2(jnp.sin(rot), jnp.cos(rot))
    return AppearanceCandidates(
        i=ci, j=cj, distance=d, rot_init=rot,
        valid=jnp.isfinite(d) & (d <= max_distance),
    )
