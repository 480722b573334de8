"""SE(2) geometry and masked rigid registration, fully jittable.

Replaces the reference's `utils.py` pose helpers (`utils.py:29-164`) and its
LAPACK-SVD rigid fit (`getTransformKLT.py:129-162`).  In 2-D the Kabsch/Procrustes
problem has a closed form via a single atan2 — no SVD needed — which also extends
naturally to per-point weights so padded (masked) feature sets work without any
dynamic shapes.

Conventions (matching the reference): a pose is [x, y, theta]; its 3x3 homogeneous
transform T maps local->world.  `procrustes_masked(src, tgt)` returns (R, h) with
R @ tgt_i + h ~= src_i, the reference's `R x1 + h = x0` convention
(`getTransformKLT.py:134-146`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radarslampy_tpu.ops import trig

# All trig below goes through ops/trig.py (accurate f32 sin/cos/atan2): the
# TPU's native transcendentals are only ~1e-4 accurate, and because the
# front-end tracks keyframe-relatively that error cancels at constant heading
# but leaks into measured rotation through turns — the round-4 "drift floor"
# (see ops/trig.py docstring and DRIFT_ANALYSIS.md).


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]  (utils.py:29-33)."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def rotation_matrix(theta):
    """2x2 rotation matrix; batched over leading dims (utils.py:36-43)."""
    s, c = trig.sin_cos(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def pose_to_transform(pose):
    """[..., 3] pose -> [..., 3, 3] homogeneous transform (utils.py:46-72)."""
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    s, c = trig.sin_cos(th)
    zero, one = jnp.zeros_like(x), jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, x], axis=-1),
        jnp.stack([s, c, y], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def transform_to_pose(T):
    """[..., 3, 3] transform -> [..., 3] pose (utils.py:75-92)."""
    return jnp.stack(
        [T[..., 0, 2], T[..., 1, 2], trig.atan2(T[..., 1, 0], T[..., 0, 0])],
        axis=-1,
    )


def invert_transform(T):
    """Closed-form SE(2) inverse (utils.py:147-156), batched."""
    R = T[..., :2, :2]
    t = T[..., :2, 2:]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -Rt @ t
    top = jnp.concatenate([Rt, ti], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se2_exp(xi):
    """Exponential map R^3 -> SE(2): xi = [vx, vy, omega] (unit time).

    Used by the motion-distortion model: per-point pose interpolation along a
    constant-velocity twist.  For |omega| ~ 0 falls back to first order.
    """
    vx, vy, w = xi[..., 0], xi[..., 1], xi[..., 2]
    eps = 1e-5
    small = jnp.abs(w) < eps
    ws = jnp.where(small, 1.0, w)  # safe denominator only
    sw, cw = trig.sin_cos(ws)
    a = jnp.where(small, 1.0 - w**2 / 6.0, sw / ws)            # sin(w)/w
    b = jnp.where(small, w / 2.0 - w**3 / 24.0, (1.0 - cw) / ws)  # (1-cos(w))/w
    x = a * vx - b * vy
    y = b * vx + a * vy
    return pose_to_transform(jnp.stack([x, y, w], axis=-1))


def se2_log(T):
    """Logarithm map SE(2) -> R^3 twist [vx, vy, omega]."""
    pose = transform_to_pose(T)
    x, y, w = pose[..., 0], pose[..., 1], pose[..., 2]
    eps = 1e-5
    small = jnp.abs(w) < eps
    ws = jnp.where(small, 1.0, w)  # safe denominator only
    half_safe = ws / 2.0
    # a = (w/2) * cot(w/2); series: 1 - w^2/12 for small w
    sh, ch = trig.sin_cos(half_safe)
    a = jnp.where(small, 1.0 - w**2 / 12.0, half_safe * ch / sh)
    half = w / 2.0
    vx = a * x + half * y
    vy = -half * x + a * y
    return jnp.stack([vx, vy, w], axis=-1)


def transform_points(T, pts):
    """Apply [3,3] SE(2) transform to [..., 2] points."""
    return pts @ T[:2, :2].T + T[:2, 2]


def procrustes_masked(src, tgt, weights):
    """Weighted closed-form 2-D rigid registration.

    Finds (R, h) minimising sum_i w_i || R tgt_i + h - src_i ||^2 — the
    convention of `calculateTransformSVD` (`getTransformKLT.py:129-162`):
    apply (R, h) to the *new* frame's points to land on the *old* frame's.

    In 2-D the optimal rotation angle is atan2(sum w (x0 x x1), sum w (x0 . x1))
    of the centred point sets, which replaces the reference's LAPACK SVD with a
    handful of fused VPU reductions.

    Args:
      src:     [K, 2] points in the source (old) frame.
      tgt:     [K, 2] corresponding points in the target (new) frame.
      weights: [K] nonnegative weights; padded slots get weight 0.

    Returns:
      (R, h, ok): [2,2] rotation, [2] translation, and a bool scalar that is
      False when fewer than 2 effective points were available.
    """
    w = weights.astype(src.dtype)
    wsum = jnp.sum(w)
    ok = wsum > 1.5
    safe = jnp.maximum(wsum, 1e-12)
    mu_src = jnp.sum(src * w[:, None], axis=0) / safe
    mu_tgt = jnp.sum(tgt * w[:, None], axis=0) / safe
    a = src - mu_src
    b = tgt - mu_tgt
    # cross/dot accumulators of the 2x2 covariance C = sum w b a^T
    dot = jnp.sum(w * (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]))
    cross = jnp.sum(w * (a[:, 1] * b[:, 0] - a[:, 0] * b[:, 1]))
    theta = trig.atan2(cross, dot)
    R = rotation_matrix(theta)
    h = mu_src - R @ mu_tgt
    R = jnp.where(ok, R, jnp.eye(2, dtype=src.dtype))
    h = jnp.where(ok, h, jnp.zeros(2, dtype=src.dtype))
    return R, h, ok


def rigid_transform_pose(src, tgt, weights):
    """As `procrustes_masked` but returning the [dx, dy, dtheta] pose vector."""
    R, h, ok = procrustes_masked(src, tgt, weights)
    return jnp.array([h[0], h[1], trig.atan2(R[1, 0], R[0, 0])]), ok
