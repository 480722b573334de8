"""Pyramidal Lucas-Kanade feature tracking, batched over a fixed feature budget.

Replaces OpenCV's C++ `cv2.calcOpticalFlowPyrLK` — the reference's hottest
kernel (`getTransformKLT.py:317-382`, SURVEY.md §2#5) — with a pure-JAX,
fully-vectorised implementation: all `k_max` features advance together through
a Gaussian image pyramid; per level a fixed number of Gauss-Newton iterations
updates the flow with a closed-form 2x2 solve.  Everything is masked, so padded
feature slots cost nothing extra and shapes never change.

Parameters mirror the reference (`getTransformKLT.py:77-84,343`): 15x15 window,
4 pyramid levels, 10 iterations, eps 0.03, and a mean-abs-residual error gate
(err < 10 on the 0..255 intensity scale).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.grid import bilinear_sample_image


def _blur_small(img):
    """5-tap binomial blur, separable (antialias for pyramid downsample).

    HIGHEST precision: the TPU's default reduced-precision conv path
    perturbs the coarse pyramid levels that seed the sub-pixel flow; in
    the fused long-sequence program those perturbations are pose-correlated
    and integrate (round-5 platform drift elimination chain,
    DRIFT_ANALYSIS.md).  The blur is 10 MACs/px — precision is free here.
    """
    hp = jax.lax.Precision.HIGHEST
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    x = img[None, None]
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 1, 5), (1, 1),
                                     [(0, 0), (2, 2)], precision=hp)
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 5, 1), (1, 1),
                                     [(2, 2), (0, 0)], precision=hp)
    return x[0, 0]


def build_pyramid(img, levels: int):
    """List of images, level 0 = full resolution, each next 2x downsampled."""
    pyr = [img]
    for _ in range(levels - 1):
        sm = _blur_small(pyr[-1])
        pyr.append(sm[::2, ::2])
    return pyr


def _patch_offsets(window: int, dtype=None):
    """Static (numpy) regular-grid offsets so the patch geometry stays concrete
    under tracing (only the *centres* are traced values)."""
    import numpy as np

    r = window // 2
    o = np.arange(-r, r + 1, dtype=np.float32)
    oy, ox = np.meshgrid(o, o, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)  # each [window*window]


def _gather_patches(img, centers, ox, oy):
    """Bilinear patches around [K,2] centers: -> [K, P] with P=window^2.

    TPU-fast formulation: because the sample pattern is an axis-aligned regular
    grid, bilinear interpolation of each patch is NOT a per-element gather —
    it is four *contiguous* dynamic slices of the image blended with the
    fractional weights.  vmapped `lax.dynamic_slice` lowers to a batched
    block-gather, which the TPU memory system handles ~100x faster than
    4*P scalar gathers per feature.
    """
    w = int(round(float(ox[-1] - ox[0]))) + 1  # window side (static)
    H, W = img.shape
    # edge-pad so slice origins never clamp (clamping would silently shift the
    # sampled window relative to the requested fractional position)
    pad = w + 2
    imgp = jnp.pad(img, pad, mode="edge")
    x0f = centers[:, 0] + float(ox[0]) + pad
    y0f = centers[:, 1] + float(oy[0]) + pad
    x0 = jnp.floor(x0f)
    y0 = jnp.floor(y0f)
    fx = (x0f - x0)[:, None, None]
    fy = (y0f - y0)[:, None, None]
    xi = jnp.clip(x0.astype(jnp.int32), 0, W + 2 * pad - w - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H + 2 * pad - w - 1)

    def slice_one(y, x):
        return jax.lax.dynamic_slice(imgp, (y, x), (w + 1, w + 1))

    big = jax.vmap(slice_one)(yi, xi)  # [K, w+1, w+1]
    p00 = big[:, :w, :w]
    p01 = big[:, :w, 1:]
    p10 = big[:, 1:, :w]
    p11 = big[:, 1:, 1:]
    out = (
        p00 * (1 - fy) * (1 - fx)
        + p01 * (1 - fy) * fx
        + p10 * fy * (1 - fx)
        + p11 * fy * fx
    )
    return out.reshape(centers.shape[0], w * w)


class TrackResult(NamedTuple):
    coords: jax.Array  # [K, 2] tracked positions in the current frame
    status: jax.Array  # [K] bool — tracked successfully and err below gate
    error: jax.Array   # [K] mean abs patch residual (0..255 scale)


@partial(jax.jit, static_argnames=("cfg",))
def track_klt(prev_img, curr_img, coords, mask, cfg: SlamConfig,
              init_flow=None) -> TrackResult:
    """Track [K,2] (x, y) feature coords from prev_img to curr_img.

    Returns new coords plus a status mask combining the input mask, an
    in-bounds check and the error gate — the masked analogue of the reference's
    `status &= err < ERR_THRESHOLD` (`getTransformKLT.py:360-366`).

    `init_flow` [K,2]: optional initial displacement guess (e.g. from the FMT
    rotation prior) — extends LK's convergence basin past the pyramid's reach
    on fast turns.  cv2's equivalent is OPTFLOW_USE_INITIAL_FLOW, which the
    reference never sets.
    """
    W = cfg.klt_window
    L = cfg.klt_pyramid_levels
    H = prev_img.shape[0]
    ox, oy = _patch_offsets(W, prev_img.dtype)
    # gradient patches need a 1-px apron
    gx_off, gy_off = _patch_offsets(W + 2, prev_img.dtype)

    pyr_prev = build_pyramid(prev_img, L)
    pyr_curr = build_pyramid(curr_img, L)

    # displacement at full resolution
    flow = jnp.zeros_like(coords) if init_flow is None else init_flow
    for level in range(L - 1, -1, -1):
        scale = 2.0**level
        p_img = pyr_prev[level]
        c_img = pyr_curr[level]
        base = coords / scale  # template centers at this level

        # template patch + gradients (computed once per level)
        big = _gather_patches(p_img, base, gx_off, gy_off)  # [K,(W+2)^2]
        Wp = W + 2
        big2 = big.reshape(-1, Wp, Wp)
        tmpl = big2[:, 1:-1, 1:-1].reshape(-1, W * W)
        ix = 0.5 * (big2[:, 1:-1, 2:] - big2[:, 1:-1, :-2]).reshape(-1, W * W)
        iy = 0.5 * (big2[:, 2:, 1:-1] - big2[:, :-2, 1:-1]).reshape(-1, W * W)

        gxx = jnp.sum(ix * ix, axis=1)
        gxy = jnp.sum(ix * iy, axis=1)
        gyy = jnp.sum(iy * iy, axis=1)
        det = gxx * gyy - gxy * gxy
        trackable = det > 1e-9
        det_safe = jnp.where(trackable, det, 1.0)
        # inverse of the 2x2 structure tensor
        inv00 = gyy / det_safe
        inv01 = -gxy / det_safe
        inv11 = gxx / det_safe

        def gn_step(i, d):
            cur = _gather_patches(c_img, base + d, ox, oy)
            r = tmpl - cur  # [K, P]
            bx = jnp.sum(ix * r, axis=1)
            by = jnp.sum(iy * r, axis=1)
            dx = inv00 * bx + inv01 * by
            dy = inv01 * bx + inv11 * by
            step = jnp.stack([dx, dy], axis=-1)
            step = jnp.where(trackable[:, None], step, 0.0)
            # freeze converged features (|step| < eps), like the TERM_CRITERIA_EPS gate
            moving = jnp.sum(step * step, axis=-1) > cfg.klt_eps**2
            return d + jnp.where(moving[:, None], step, 0.0)

        d_level = jax.lax.fori_loop(0, cfg.klt_iters, gn_step, flow / scale)
        flow = d_level * scale

    new_coords = coords + flow

    # final residual at full resolution, on the 0..255 scale the reference gates on
    tmpl0 = _gather_patches(pyr_prev[0], coords, ox, oy)
    cur0 = _gather_patches(pyr_curr[0], new_coords, ox, oy)
    err = jnp.mean(jnp.abs(tmpl0 - cur0), axis=1) * 255.0

    r = W // 2 + 1
    inb = (
        (new_coords[:, 0] >= r)
        & (new_coords[:, 0] < H - r)
        & (new_coords[:, 1] >= r)
        & (new_coords[:, 1] < H - r)
    )
    status = mask & inb & (err < cfg.klt_err_threshold)
    return TrackResult(coords=new_coords, status=status, error=err)
