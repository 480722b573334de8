"""Fused determinant-of-Hessian scale space as a Pallas TPU kernel.

The detection front-end (replacing skimage `blob_doh`, SURVEY.md §2#3) needs,
per scale sigma: Gaussian blur -> second derivatives -> scale-normalised
Hessian determinant.  Two TPU-first choices here:

  * Gaussian blur as *banded Toeplitz matmuls*:  Y = B_s X B_s  with
    B_s[i,j] = g_s(i-j).  A separable 61-tap blur becomes two [S,S]x[S,S]
    matmuls that run on the MXU at full throughput instead of a 61-shift VPU
    convolution.
  * one Pallas kernel fuses both matmuls and the Hessian-determinant stencil
    per (sigma, row-tile) grid step, keeping the blurred intermediates in
    VMEM — the pure-XLA formulation round-trips ~8 MB of intermediates to HBM
    per sigma.

The kernel reads the full image from VMEM (4 MB at 1024^2), slices the needed
row band of B_s for its tile (plus a 1-row halo for the vertical stencil), and
writes one [TILE, S] block of the [n_sigma, S, S] response volume.

`doh_response_fused` dispatches: Pallas on TPU, the equivalent XLA matmul path
elsewhere (also used by the interpret-mode correctness tests).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radarslampy_tpu.config import SlamConfig

ROW_TILE = 64


def gaussian_blur_matrix(size: int, sigma: float) -> np.ndarray:
    """Symmetric banded Toeplitz blur operator [size, size] (edge-renormalised)."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    k /= k.sum()
    B = np.zeros((size, size), np.float64)
    idx = np.arange(size)
    for off, w in zip(range(-radius, radius + 1), k):
        j = idx + off
        ok = (j >= 0) & (j < size)
        B[idx[ok], j[ok]] += w
    # renormalise edge rows (truncated kernel mass) to match 'SAME' conv with
    # zero padding *not* being what we want — we match the XLA conv path,
    # which zero-pads; so no renormalisation.
    return B.astype(np.float32)


def build_doh_mats(cfg: SlamConfig) -> jnp.ndarray:
    """[n_sigma, S, S] blur operators for cfg.doh_sigmas (identity for tiny sigma)."""
    S = cfg.cart_size
    mats = []
    for sigma in cfg.doh_sigmas:
        if sigma < 0.3:
            mats.append(np.eye(S, dtype=np.float32))
        else:
            mats.append(gaussian_blur_matrix(S, float(sigma)))
    return jnp.asarray(np.stack(mats))


def _hessian_det_rows(y, sig4):
    """Scale-normalised DoH of a [T+2, S] row band -> [T, S] (zero-padded cols).

    Matches ops/features._hessian_det: 3-tap second differences, cross for xy.
    """
    ixx = y[1:-1, 2:] - 2.0 * y[1:-1, 1:-1] + y[1:-1, :-2]
    ixx = jnp.pad(ixx, ((0, 0), (1, 1)))
    iyy = y[2:, 1:-1] - 2.0 * y[1:-1, 1:-1] + y[:-2, 1:-1]
    iyy = jnp.pad(iyy, ((0, 0), (1, 1)))
    ixy = 0.25 * (y[2:, 2:] - y[2:, :-2] - y[:-2, 2:] + y[:-2, :-2])
    ixy = jnp.pad(ixy, ((0, 0), (1, 1)))
    return sig4 * (ixx * iyy - ixy * ixy)


def _kernel(sig4_ref, img_ref, B_ref, out_ref):
    sig = pl.program_id(0)
    r = pl.program_id(1)
    S = img_ref.shape[0]
    T = out_ref.shape[1]
    PAD = 16  # extra rows so the band start stays 8-aligned (Mosaic constraint)
    # band of blur rows [lo8, lo8 + T + 16), 8-aligned start, covering the
    # stencil halo of output rows [start, start+T)
    start = r * T
    lo8 = jnp.minimum(jnp.maximum(start - 8, 0), S - (T + PAD))
    lo8 = pl.multiple_of(lo8, 8)

    Brow = B_ref[0, pl.ds(lo8, T + PAD), :]                # [T+16, S]
    # HIGHEST precision: the Hessian determinant subtracts near-equal products
    # scaled by sigma^4 — default bf16-pass MXU matmuls lose ~40% of the signal
    t1 = jnp.dot(Brow, img_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    # horizontal blur: t1 @ B^T; B symmetric => t1 @ B
    y = jnp.dot(t1, B_ref[0], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [T+16, S]

    # Hessian stencil via circular rolls (Mosaic dislikes column-pad concats);
    # wrapped edge rows/cols are zeroed by the masks below.
    Trows, Scols = y.shape
    yl = pltpu.roll(y, 1, 1)
    yr = pltpu.roll(y, Scols - 1, 1)   # shift -1 (roll requires non-negative)
    yu = pltpu.roll(y, 1, 0)
    yd = pltpu.roll(y, Trows - 1, 0)
    ixx = yr - 2.0 * y + yl
    iyy = yd - 2.0 * y + yu
    ixy = 0.25 * (
        pltpu.roll(yd, Scols - 1, 1) - pltpu.roll(yd, 1, 1)
        - pltpu.roll(yu, Scols - 1, 1) + pltpu.roll(yu, 1, 1)
    )
    det = sig4_ref[sig, 0] * (ixx * iyy - ixy * ixy)       # [T+16, S]

    # zero the stencil's image-border rows/cols (zero-pad convention)
    col = jax.lax.broadcasted_iota(jnp.int32, det.shape, 1)
    grow = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0) + lo8
    det = jnp.where((col > 0) & (col < S - 1) & (grow > 0) & (grow < S - 1),
                    det, 0.0)

    # det[k] is the response at global row lo8+k; pick the window at offset
    # start-lo8 in {0, 8, 16} with static slices (no dynamic_slice on values)
    w = start - lo8
    out_ref[0] = jnp.where(
        w == 0,
        det[0:T],
        jnp.where(w == 8, det[8 : T + 8], det[16 : T + 16]),
    )


def doh_response_pallas(img, doh_mats, sigmas):
    """[n_sigma, S, S] DoH responses via the fused Pallas kernel (TPU)."""
    S = img.shape[0]
    n_sigma = doh_mats.shape[0]
    sig4 = jnp.asarray(
        [float(max(s, 1.0)) ** 4 for s in sigmas], jnp.float32
    ).reshape(n_sigma, 1)
    sig4_shape = (n_sigma, 1)

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_sigma, S, S), jnp.float32),
        grid=(n_sigma, S // ROW_TILE),
        in_specs=[
            pl.BlockSpec(sig4_shape, lambda s, r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, S), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S), lambda s, r: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, S), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM
        ),
    )(sig4, img, doh_mats)


def doh_response_matmul(img, doh_mats, sigmas):
    """XLA fallback with the same Toeplitz-matmul math (CPU/GPU + tests)."""
    outs = []
    for i, sigma in enumerate(sigmas):
        B = doh_mats[i]
        y = jnp.dot(jnp.dot(B, img, precision=jax.lax.Precision.HIGHEST), B,
                    precision=jax.lax.Precision.HIGHEST)  # B symmetric
        det = _hessian_det_rows(y, float(max(sigma, 1.0)) ** 4)  # rows 1..S-2
        outs.append(jnp.pad(det, ((1, 1), (0, 0))))
    return jnp.stack(outs)
