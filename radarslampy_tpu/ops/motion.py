"""Joint velocity/pose motion-distortion solver — fixed-budget Levenberg-Marquardt.

The radar spins while the car moves, so each azimuth of a scan is observed at a
slightly different vehicle pose.  The reference models this as a constant-velocity
twist and jointly optimises body velocity v=[vx,vy,omega] and the frame pose T_wj
with scipy's MINPACK LM using finite-difference Jacobians — hundreds of host-side
residual evaluations per frame (`motionDistortion.py:38-325`, SURVEY.md §3.3).

TPU-native replacement: the same residual model, but
  * the Jacobian comes from `jax.jacfwd` (exact forward-mode, 6 tangents — the
    reference derived an analytic J at `motionDistortion.py:218-270` and then
    didn't use it);
  * LM runs a *fixed* iteration budget inside `lax.scan` with accept/reject
    damping, 6x6 normal equations solved in closed form — one compiled XLA
    program, vmappable across frames;
  * padded feature slots contribute exactly zero residual and Jacobian.

Model (mirroring `motionDistortion.py:107-205`):
  dt_i   = period * atan2(-y_i, -x_i) / (2*pi)                  per observed point
  undist = R(omega*dt_i) p_i + v_xy*dt_i                        per-point correction
  e_p    = log((T_wj^-1 p_w - undist)^2 / 2 + 1)                Cauchy, per component
  e_v    = n_valid * (v - log(T_wj0^-1 T_wj)/period)            velocity prior
residuals are scaled by 1/sigma (info vector) and squared by LM.  The reference's
sigma_p is specified in px^2 but applied in metric space — kept verbatim
(documented quirk, `RawROAMSystem.py:135-139`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.ops import trig


def compute_time_deltas(points, period: float):
    """Per-point scan-time offset from scan angle (motionDistortion.py:107-124)."""
    angles = trig.atan2(-points[..., 1], -points[..., 0])
    return period * angles / (2.0 * jnp.pi)


def undistort(v, points, period: float, times=None):
    """Apply the constant-velocity correction to [K,2] points
    (motionDistortion.py:126-153): p' = R(omega*dt) p + v_xy*dt."""
    if times is None:
        times = compute_time_deltas(points, period)
    disp = v[None, :] * times[:, None]  # [K,3]
    th = disp[:, 2]
    s, c = trig.sin_cos(th)
    x = c * points[:, 0] - s * points[:, 1] + disp[:, 0]
    y = s * points[:, 0] + c * points[:, 1] + disp[:, 1]
    return jnp.stack([x, y], axis=-1)


class MotionSolution(NamedTuple):
    pose: jax.Array      # [3] optimised world pose of this frame [x, y, theta]
    velocity: jax.Array  # [3] optimised body velocity [vx, vy, omega]
    cost: jax.Array      # final weighted squared-residual cost
    ok: jax.Array        # bool — enough inliers to solve


def relative_velocity(pose_prev, pose_curr, period: float):
    """Body-frame velocity implied by two consecutive poses.

    Numerically conditioned form of `infer_velocity` (motionDistortion.py:101-105):
    the *small* pose difference is taken first and only then rotated, and the
    heading rate is a direct wrapped angle difference — no transform products,
    no atan2 of near-identical rotations.  This matters in float32: the stiff
    velocity prior amplifies any rounding in the relative pose by
    n_valid / sigma_v.
    """
    dp = pose_curr[:2] - pose_prev[:2]
    s0, c0 = trig.sin_cos(pose_prev[2])
    vx = c0 * dp[0] + s0 * dp[1]
    vy = -s0 * dp[0] + c0 * dp[1]
    w = geo.wrap_angle(pose_curr[2] - pose_prev[2])
    return jnp.stack([vx, vy, w]) / period


def _residuals(params, pose_prev, p_w, p_jt, times, mask, n_valid, info_p, info_v,
               period):
    v = params[:3]
    pose = params[3:]
    und = undistort(v, p_jt, period, times)                    # [K,2]
    # expected observation: R(theta)^T (p_w - t)  == T_wj^-1 p_w
    # accurate trig of the FULL heading: this residual meets feat_world
    # anchored with pose_to_transform's trig — with the platform's ~1e-4
    # transcendentals the theta-dependent error mismatch between the two is
    # exactly the turn-proportional drift mechanism (DRIFT_ANALYSIS.md)
    s, c = trig.sin_cos(pose[2])
    d = p_w - pose[:2]
    expected = jnp.stack([c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]],
                         axis=-1)
    e = expected - und                                         # [K,2]
    e_p = jnp.log(e * e / 2.0 + 1.0) * jnp.sign(e)             # Cauchy magnitude, signed
    e_p = jnp.where(mask[:, None], e_p * info_p[None, :], 0.0)

    dv = v - relative_velocity(pose_prev, pose, period)
    dv = dv.at[2].set(geo.wrap_angle(dv[2]))
    e_v = dv * n_valid * info_v
    return jnp.concatenate([e_p.reshape(-1), e_v])


@partial(jax.jit, static_argnames=("cfg",))
def solve_motion(
    pose_prev,    # [3] previous frame's world pose [x, y, theta]
    p_w,          # [K,2] world positions of tracked points (from keyframe)
    p_jt,         # [K,2] observed (distorted) points, metric, sensor-centred
    pose_init,    # [3] initial guess of this frame's pose (SVD estimate)
    mask,         # [K] validity
    cfg: SlamConfig,
) -> MotionSolution:
    """Fixed-budget LM over [v; x, y, theta] (replaces `optimize_library`).

    float32 matmul precision on the J^T J build/solve — cheap (6x6) and
    immune to the TPU MXU's reduced-precision default (models/posegraph.py).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_motion(pose_prev, p_w, p_jt, pose_init, mask, cfg)


def _solve_motion(pose_prev, p_w, p_jt, pose_init, mask, cfg: SlamConfig):
    period = cfg.scan_period_s
    times = compute_time_deltas(p_jt, period)
    n_valid = jnp.sum(mask.astype(p_w.dtype))
    ok = n_valid >= 3.0
    info_p = 1.0 / jnp.sqrt(jnp.array(cfg.mds_sigma_p, dtype=p_w.dtype))
    info_v = 1.0 / jnp.sqrt(jnp.array(cfg.mds_sigma_v, dtype=p_w.dtype))

    v_init = relative_velocity(pose_prev, pose_init, period)
    p0 = jnp.concatenate([v_init, pose_init])

    def res_fn(p):
        return _residuals(
            p, pose_prev, p_w, p_jt, times, mask, n_valid, info_p, info_v, period
        )

    def cost_of(p):
        r = res_fn(p)
        return jnp.sum(r * r)

    def lm_step(carry, _):
        p, lam, cost = carry
        r = res_fn(p)
        J = jax.jacfwd(res_fn)(p)  # [(2K+3), 6]
        JtJ = J.T @ J
        Jtr = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-12)
        delta = -jax.scipy.linalg.solve(A, Jtr, assume_a="pos")
        p_new = p + delta
        new_cost = cost_of(p_new)
        accept = new_cost < cost
        p = jnp.where(accept, p_new, p)
        cost2 = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), jnp.minimum(lam * 10.0, 1e6))
        return (p, lam, cost2), None

    init = (p0, jnp.asarray(cfg.mds_init_lambda, p_w.dtype), cost_of(p0))
    (p_fin, _, cost_fin), _ = jax.lax.scan(lm_step, init, None, length=cfg.mds_iterations)

    p_fin = jnp.where(ok, p_fin, p0)
    pose = p_fin[3:].at[2].set(geo.wrap_angle(p_fin[5]))
    return MotionSolution(pose=pose, velocity=p_fin[:3], cost=cost_fin, ok=ok)
