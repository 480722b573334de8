"""Determinant-of-Hessian blob detection + ANMS, as fixed-shape jitted tensor ops.

Replaces skimage's Cython `blob_doh` (`getFeatures.py:22-53`) and the data-dependent
SSC binary search (`ANMS.py:5-102`) with a TPU-first formulation:

  * scale space: separable Gaussian convolutions (XLA `conv_general_dilated`, which
    the TPU backend tiles onto the MXU) at `cfg.doh_sigmas`, then the scale-
    normalised Hessian determinant  sigma^4 * (Ixx*Iyy - Ixy^2).
  * blob candidates: 3x3x3 local maxima above threshold, extracted with
    `jax.lax.top_k` over the masked response volume into a *fixed* candidate
    budget (`cfg.n_candidates`) with a validity mask — no dynamic shapes.
  * ANMS: response-ordered greedy cell covering — candidates are sorted by
    response and at most one winner is kept per spatial cell of an
    `anms_grid x anms_grid` grid, keeping the strongest `anms_top_k`.  This is a
    vectorised O(K*C) replacement for SSC's sequential binary search; deliberate
    fix over the reference, which sorts by *sigma* before SSC
    (`getFeatures.py:66-72`) rather than by strength.

All outputs are (coords [N,2] in (x,y) pixels, response [N], mask [N]) triples.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig


def _gaussian_kernel_1d(sigma: float, dtype=jnp.float32):
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, sigma: float):
    """Separable Gaussian blur of a [H, W] image (static sigma)."""
    if sigma < 0.3:  # effectively a delta kernel
        return img
    k = _gaussian_kernel_1d(sigma, img.dtype)
    n = k.shape[0]
    x = img[None, None, :, :]
    kh = k.reshape(1, 1, 1, n)
    kv = k.reshape(1, 1, n, 1)
    # HIGHEST precision: TPU's default reduced-precision conv loses ~40% of
    # the DoH signal at large sigma once amplified by sigma^4 (see
    # ops/pallas/doh_pallas.py — the fused Toeplitz-matmul path is preferred
    # on TPU for this reason)
    hp = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (n // 2, n // 2)],
                                     precision=hp)
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), [(n // 2, n // 2), (0, 0)],
                                     precision=hp)
    return x[0, 0]


def _hessian_det(smoothed, sigma: float):
    """Scale-normalised determinant of Hessian via small difference stencils."""
    # second derivatives with 3-tap / cross stencils
    z = smoothed
    ixx = z[:, 2:] - 2.0 * z[:, 1:-1] + z[:, :-2]
    ixx = jnp.pad(ixx, ((0, 0), (1, 1)))
    iyy = z[2:, :] - 2.0 * z[1:-1, :] + z[:-2, :]
    iyy = jnp.pad(iyy, ((1, 1), (0, 0)))
    ixy = 0.25 * (z[2:, 2:] - z[2:, :-2] - z[:-2, 2:] + z[:-2, :-2])
    ixy = jnp.pad(ixy, ((1, 1), (1, 1)))
    s4 = float(max(sigma, 1.0)) ** 4
    return s4 * (ixx * iyy - ixy * ixy)


def doh_response(img, cfg: SlamConfig, doh_mats=None):
    """[n_sigma, H, W] scale-normalised DoH responses (getFeatures.py:13-18 params).

    Three equivalent implementations (tests assert parity):
      * conv path (default): separable XLA convolutions
      * matmul path (doh_mats given): Toeplitz blur matmuls on the MXU
      * fused Pallas kernel (doh_mats given, TPU backend): both matmuls + the
        Hessian stencil in one VMEM-resident kernel (ops/pallas/doh_pallas.py)
    """
    if doh_mats is not None:
        from radarslampy_tpu.ops.pallas.doh_pallas import (
            doh_response_matmul,
            doh_response_pallas,
        )

        if jax.default_backend() == "tpu":
            return doh_response_pallas(img, doh_mats, cfg.doh_sigmas)
        return doh_response_matmul(img, doh_mats, cfg.doh_sigmas)
    resps = []
    for sigma in cfg.doh_sigmas:
        sm = gaussian_blur(img, float(sigma))
        resps.append(_hessian_det(sm, float(sigma)))
    return jnp.stack(resps, axis=0)


class Candidates(NamedTuple):
    xy: jax.Array        # [N, 2] float (x, y) pixel coords
    response: jax.Array  # [N] float DoH response
    sigma: jax.Array     # [N] float blob scale
    mask: jax.Array      # [N] bool validity


def detect_blobs(img, cfg: SlamConfig, doh_mats=None) -> Candidates:
    """Fixed-budget DoH blob candidates (replaces `getBlobsFromCart`)."""
    resp = doh_response(img, cfg, doh_mats)  # [S_, H, W]
    ns, H, W = resp.shape

    # 3x3 spatial local max within each scale
    def pool_max(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )

    spatial_max = pool_max(resp)
    # max over adjacent scales (scale axis window 3, SAME)
    scale_max = jax.lax.reduce_window(
        spatial_max, -jnp.inf, jax.lax.max, (3, 1, 1), (1, 1, 1), "SAME"
    )
    is_peak = (resp >= scale_max) & (resp > cfg.doh_threshold)
    masked = jnp.where(is_peak, resp, -jnp.inf)

    flat = masked.reshape(-1)
    vals, idx = jax.lax.top_k(flat, cfg.n_candidates)
    sidx = idx // (H * W)
    rem = idx % (H * W)
    yy = (rem // W).astype(jnp.float32)
    xx = (rem % W).astype(jnp.float32)
    sig = jnp.asarray(jnp.array(cfg.doh_sigmas, dtype=jnp.float32))[sidx]
    ok = jnp.isfinite(vals)
    return Candidates(
        xy=jnp.stack([xx, yy], axis=-1),
        response=jnp.where(ok, vals, 0.0),
        sigma=sig,
        mask=ok,
    )


def anms_cell_cover(cands: Candidates, cfg: SlamConfig, image_size: int) -> Candidates:
    """Spatially-uniform suppression: strongest-first, one winner per grid cell.

    Vectorised replacement for SSC (`ANMS.py:5-102`): candidates are processed in
    response order; a candidate is kept iff no stronger candidate already claimed
    its cell, and at most `anms_top_k` survive.
    """
    N = cands.xy.shape[0]
    G = cfg.anms_grid
    cell_sz = image_size / G
    cx = jnp.clip((cands.xy[:, 0] / cell_sz).astype(jnp.int32), 0, G - 1)
    cy = jnp.clip((cands.xy[:, 1] / cell_sz).astype(jnp.int32), 0, G - 1)
    cell = cy * G + cx  # [N]

    order = jnp.argsort(-jnp.where(cands.mask, cands.response, -jnp.inf))
    cell_o = cell[order]
    mask_o = cands.mask[order]

    onehot = jax.nn.one_hot(cell_o, G * G, dtype=jnp.int32) * mask_o[:, None].astype(
        jnp.int32
    )
    claimed_before = jnp.cumsum(onehot, axis=0) - onehot  # exclusive prefix
    first_in_cell = jnp.take_along_axis(claimed_before, cell_o[:, None], axis=1)[:, 0] == 0
    keep = mask_o & first_in_cell
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep = keep & (rank < cfg.anms_top_k)

    return Candidates(
        xy=cands.xy[order],
        response=cands.response[order],
        sigma=cands.sigma[order],
        mask=keep,
    )


@partial(jax.jit, static_argnames=("cfg",))
def get_features(img, cfg: SlamConfig, doh_mats=None) -> Candidates:
    """DoH + ANMS, the jitted equivalent of `getFeatures` (`getFeatures.py:74-95`)."""
    cands = detect_blobs(img, cfg, doh_mats)
    return anms_cell_cover(cands, cfg, img.shape[-1])


@partial(jax.jit, static_argnames=("min_dist_px",))
def merge_features(
    coords,       # [K, 2] existing tracked features
    mask,         # [K] validity of existing slots
    new_cands: Candidates,
    min_dist_px: float = 4.0,
):
    """Fill free slots of a tracked feature set with fresh detections.

    The masked-tensor equivalent of `appendNewFeatures` (`getFeatures.py:98-118`):
    instead of vstack + np.unique, new candidates further than `min_dist_px` from
    every live feature are written into invalid (free) slots.  Shapes never change.

    Returns (coords', mask').
    """
    K = coords.shape[0]
    # suppress new candidates near existing live features
    d2 = jnp.sum(
        (new_cands.xy[:, None, :] - coords[None, :, :]) ** 2, axis=-1
    )  # [N, K]
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    far_enough = jnp.min(d2, axis=1) > min_dist_px**2
    cand_keep = new_cands.mask & far_enough

    # order: kept candidates first (stable, already response-ordered)
    cand_order = jnp.argsort(~cand_keep, stable=True)
    cand_xy = new_cands.xy[cand_order]
    cand_ok = cand_keep[cand_order]
    n_keep = jnp.sum(cand_keep.astype(jnp.int32))

    # order: free slots first
    slot_order = jnp.argsort(mask, stable=True)  # False(0) first
    n_free = jnp.sum((~mask).astype(jnp.int32))

    n_fill = jnp.minimum(jnp.minimum(n_keep, n_free), K)
    take = jnp.minimum(jnp.arange(K), cand_xy.shape[0] - 1)
    fill_xy = cand_xy[take]
    fill_ok = cand_ok[take] & (jnp.arange(K) < n_fill)

    tgt = coords[slot_order]
    tgt = jnp.where(fill_ok[:, None], fill_xy, tgt)
    new_mask_sorted = mask[slot_order] | fill_ok

    out_coords = jnp.zeros_like(coords).at[slot_order].set(tgt)
    out_mask = jnp.zeros_like(mask).at[slot_order].set(new_mask_sorted)
    return out_coords, out_mask
