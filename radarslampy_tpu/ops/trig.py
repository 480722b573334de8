"""Accurate float32 trigonometry for the pose-critical path.

WHY THIS EXISTS (round-5 drift diagnosis, DRIFT_ANALYSIS.md): the TPU's
transcendental unit evaluates f32 sin/cos/atan2 to only ~1e-4 relative
accuracy (documented axon/TPU behaviour; CPU libm is ~1e-7).  The SLAM
front-end anchors features keyframe-relatively, so the error CANCELS while
the heading is constant — but it is a deterministic function eps(theta), so
driving through a turn sweeps theta and d(eps)/d(theta) leaks into the
measured rotation as a turn-proportional heading bias.  Integrated over a
9 km urban route this produced the "~2.5%-of-path drift floor" that no
algorithmic knob touched (VERDICT.md r04 weak #1): the identical code, data
and seed give ~0.9-2.7 m ATE on CPU vs tens of metres on the chip
(DRIFT_EXP_r05.json vs PROBE_AB_r05.json).

These implementations use only VPU add/mul/sqrt (plus one native arctan2
call as a SEED, refined by a Newton step with the accurate sin/cos), so
they are ~1-2 f32 ulp on every platform:

  * `sin_cos(theta)` — octant reduction with a two-float pi/2
    (Cody-Waite), then degree-9/8 Taylor polynomials on |r| <= pi/4
    (truncation < 3e-9), quadrant recombination by sign flips.
  * `atan2(y, x)` — one Newton refinement of the platform arctan2:
    theta1 = theta0 + (cos(theta0) y - sin(theta0) x)/hypot — the native
    ~1e-4 error enters only quadratically.

Cost: ~25 VPU flops per angle — irrelevant next to the image pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

# pi/2 split into an exact-f32 head and a tail (Cody-Waite reduction):
# float32(pi/2) = 0x3FC90FDB; tail = pi/2 - head in f64, rounded to f32.
_PIO2_HI = 1.57079637050628662109375
_PIO2_LO = -4.37113900018624283e-8


def sin_cos(theta):
    """Accurate (sin, cos) of f32 `theta` (|theta| up to a few*2pi)."""
    t = jnp.asarray(theta)
    dtype = t.dtype
    k = jnp.round(t * jnp.asarray(0.6366197723675814, dtype))   # 2/pi
    r = (t - k * jnp.asarray(_PIO2_HI, dtype)) - k * jnp.asarray(
        _PIO2_LO, dtype
    )
    r2 = r * r
    # sin on |r|<=pi/4: r + r^3(-1/6 + r^2(1/120 + r^2(-1/5040 + r^2/362880)))
    s = r + r * r2 * (
        jnp.asarray(-1.0 / 6.0, dtype)
        + r2 * (
            jnp.asarray(1.0 / 120.0, dtype)
            + r2 * (
                jnp.asarray(-1.0 / 5040.0, dtype)
                + r2 * jnp.asarray(1.0 / 362880.0, dtype)
            )
        )
    )
    # cos on |r|<=pi/4: 1 + r^2(-1/2 + r^2(1/24 + r^2(-1/720 + r^2/40320)))
    c = 1.0 + r2 * (
        jnp.asarray(-0.5, dtype)
        + r2 * (
            jnp.asarray(1.0 / 24.0, dtype)
            + r2 * (
                jnp.asarray(-1.0 / 720.0, dtype)
                + r2 * jnp.asarray(1.0 / 40320.0, dtype)
            )
        )
    )
    q = jnp.mod(k.astype(jnp.int32), 4)
    sin_v = jnp.where(q == 0, s,
            jnp.where(q == 1, c,
            jnp.where(q == 2, -s, -c)))
    cos_v = jnp.where(q == 0, c,
            jnp.where(q == 1, -s,
            jnp.where(q == 2, -c, s)))
    return sin_v, cos_v


def sin(theta):
    return sin_cos(theta)[0]


def cos(theta):
    return sin_cos(theta)[1]


_LN2_HI = 0.693147182464599609375       # float32(ln 2)
_LN2_LO = -1.904654323148236017e-9      # ln2 - _LN2_HI
_LOG2E = 1.4426950408889634


def exp(x):
    """Accurate f32 exp: Cody-Waite reduction x = k ln2 + r (|r| <= ln2/2),
    degree-6 Taylor on r (<1e-8 truncation), scale by 2^k via ldexp.

    Exists for the same reason as `sin_cos`: the platform exp is ~1e-4
    relative on the TPU, which distorts the device renderer's Gaussian blob
    profiles asymmetrically in the sub-pixel blob position — measured as
    the REMAINING platform drift after the trig fix (DRIFT_ANALYSIS.md:
    identical host-rendered scans track platform-clean, device-rendered
    ones drift only on the chip)."""
    x = jnp.asarray(x)
    dtype = x.dtype
    k = jnp.round(x * jnp.asarray(_LOG2E, dtype))
    r = (x - k * jnp.asarray(_LN2_HI, dtype)) - k * jnp.asarray(_LN2_LO, dtype)
    # exp(r) on |r| <= 0.347: 1 + r(1 + r/2(1 + r/3(1 + r/4(1 + r/5(1 + r/6)))))
    p = 1.0 + r * (1.0 + r * (1.0 / 2.0) * (
        1.0 + r * (1.0 / 3.0) * (
            1.0 + r * (1.0 / 4.0) * (
                1.0 + r * (1.0 / 5.0) * (1.0 + r * (1.0 / 6.0))
            )
        )
    ))
    out = jnp.ldexp(p, k.astype(jnp.int32))
    # underflow guard: very negative args (far Gaussian tails) -> 0
    return jnp.where(x < -87.0, jnp.zeros_like(p), out).astype(dtype)


def atan2(y, x):
    """Accurate f32 atan2: platform arctan2 seed + one Newton step.

    theta_true - theta0 = asin((cos(theta0) y - sin(theta0) x)/r) for the
    residual rotation; one step with the ACCURATE sin/cos pushes the native
    ~1e-4 error to ~1e-8 (it enters only quadratically)."""
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    theta0 = jnp.arctan2(y, x)
    s0, c0 = sin_cos(theta0)
    r = jnp.sqrt(x * x + y * y)
    r_safe = jnp.where(r > 0, r, 1.0)
    corr = (c0 * y - s0 * x) / r_safe
    return jnp.where(r > 0, theta0 + corr, theta0)
