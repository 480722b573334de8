"""Fourier-Mellin rotation estimation via FFT phase correlation.

Replaces the reference's OpenCV pipeline (`FMT.py:36-101`: resize -> warpPolar x2
-> `cv2.phaseCorrelate` with a Hanning window) with `jnp.fft` on TPU.  Because a
rotation of the scene is a pure row-shift of the *polar* image, we phase-correlate
the (optionally log-range-resampled) polar scans directly — no Cartesian
round-trip (SURVEY.md §2#9).

The reference computes this every frame and throws the result away
(`Tracker.py:62-72`); here it is gated by `cfg.use_fmt` and can seed the
tracker's rotation prior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig


def _hanning_2d(shape, dtype=jnp.float32):
    h = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(shape[0], dtype=dtype) / (shape[0] - 1))
    w = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(shape[1], dtype=dtype) / (shape[1] - 1))
    return h[:, None] * w[None, :]


def phase_correlate(a, b):
    """Sub-pixel 2-D phase correlation shift of b relative to a.

    Returns (dy, dx, peak_response): the shift that aligns b to a, with
    parabolic sub-pixel refinement around the correlation peak.
    """
    win = _hanning_2d(a.shape, a.dtype)
    fa = jnp.fft.rfft2(a * win)
    fb = jnp.fft.rfft2(b * win)
    cross = fa * jnp.conj(fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = jnp.fft.irfft2(cross, s=a.shape)

    H, W = a.shape
    idx = jnp.argmax(corr)
    py, px = idx // W, idx % W

    def parabolic(cm, c0, cp):
        denom = cm - 2 * c0 + cp
        return jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0)

    ym, yp = (py - 1) % H, (py + 1) % H
    xm, xp = (px - 1) % W, (px + 1) % W
    dy_sub = parabolic(corr[ym, px], corr[py, px], corr[yp, px])
    dx_sub = parabolic(corr[py, xm], corr[py, px], corr[py, xp])

    dy = jnp.where(py > H // 2, py - H, py).astype(a.dtype) + dy_sub
    dx = jnp.where(px > W // 2, px - W, px).astype(a.dtype) + dx_sub
    return dy, dx, corr[py, px]


class FmtResult(NamedTuple):
    rot_rad: jnp.ndarray   # estimated rotation of curr relative to prev
    scale: jnp.ndarray     # log-range scale factor (1.0 for rigid radar scenes)
    response: jnp.ndarray  # correlation peak height (confidence)


def estimate_rotation_fmt(prev_polar, curr_polar, cfg: SlamConfig,
                          grid=None) -> FmtResult:
    """Rotation (and scale) between two polar scans [A, W].

    A scene rotation by dphi shifts polar rows by dphi / (2*pi) * A; a scale
    change shifts *log*-range columns by log(scale)/log(log_base).  Mirrors the
    angle/scale extraction of `FMT.py:76-88` with sign matching its
    `rotRad = -delta_y * 2*pi / height` convention.

    `grid` (a `GridMaps`): when given, both scans are resampled to log-polar
    range spacing (the direct 1-D resample of grid.polar_to_logpolar — no
    Cartesian round-trip, unlike the reference's double cv2.warpPolar,
    `parseData.py:138-157`) and the column shift of the correlation peak
    yields the scale factor `log_base ** dx` exactly as `FMT.py:86-88`.
    Without `grid` the scans are used in linear range spacing and scale is
    reported as 1.0 (rigid radar scenes).
    """
    A = prev_polar.shape[0]
    # light range downsampling like FMT_DOWNSAMPLE_FACTOR (FMT.py:10) to cut FFT cost
    ds = cfg.fmt_downsample
    if grid is not None:
        from radarslampy_tpu.ops.grid import polar_to_logpolar

        a = polar_to_logpolar(prev_polar, grid, cfg)[:, ::ds]
        b = polar_to_logpolar(curr_polar, grid, cfg)[:, ::ds]
        dy, dx, resp = phase_correlate(a, b)
        rot = -dy * 2.0 * jnp.pi / A
        # same sign convention as rotation: phase_correlate reports -d for a
        # content shift of +d, and a scene scaled by s shifts log-range
        # columns by +log(s)/log(base)
        scale = jnp.asarray(grid.log_base, a.dtype) ** (-dx * ds)
    else:
        a = prev_polar[:, ::ds]
        b = curr_polar[:, ::ds]
        dy, dx, resp = phase_correlate(a, b)
        rot = -dy * 2.0 * jnp.pi / A
        scale = jnp.ones_like(dx)
    return FmtResult(rot_rad=rot, scale=scale, response=resp)
