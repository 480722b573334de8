"""Motion-distortion solver: recovery of known velocity/pose on synthetic data.

Mirrors the intent of the reference's `testMotionDistortion.py` (which is
bit-rotted — it calls a dead constructor, SURVEY.md §4) with actual assertions.
"""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.ops.motion import compute_time_deltas, solve_motion, undistort
from radarslampy_tpu.sim import fakedata as fd

CFG = SlamConfig()


def test_undistort_inverts_distort(rng):
    pts = fd.random_points(rng, 64, spread=40.0)
    vel = np.array([3.0, -2.0, 0.15])  # m/s, m/s, rad/s
    distorted = fd.distort(pts, vel, period=CFG.scan_period_s)
    und = np.asarray(
        undistort(jnp.asarray(vel), jnp.asarray(distorted), CFG.scan_period_s)
    )
    # dt is re-estimated from distorted points, so exact inversion is only
    # approximate — but it must shrink the distortion error by >10x
    err_before = np.linalg.norm(distorted - pts, axis=1).mean()
    err_after = np.linalg.norm(und - pts, axis=1).mean()
    assert err_after < err_before / 10


def _build_problem(rng, vel, pose_prev, pose_curr, n=80, K=128, noise=0.0):
    """World points seen from pose_curr with scan distortion by vel."""
    world = fd.random_points(rng, n, spread=40.0)
    c, s = np.cos(pose_curr[2]), np.sin(pose_curr[2])
    R_inv = np.array([[c, s], [-s, c]])
    local = (world - pose_curr[:2]) @ R_inv.T
    observed = fd.distort(local, vel, period=CFG.scan_period_s)
    if noise:
        observed = fd.add_noise(rng, observed, noise)

    p_w = np.zeros((K, 2)); p_w[:n] = world
    p_jt = np.zeros((K, 2)); p_jt[:n] = observed
    m = np.zeros(K, dtype=bool); m[:n] = True
    return jnp.asarray(p_w), jnp.asarray(p_jt), jnp.asarray(m)


def test_solver_recovers_pose_and_velocity(rng):
    pose_prev = np.array([1.0, 2.0, 0.1])
    # constant-velocity consistent step: pose_curr = pose_prev + R(th) v dt
    vel = np.array([4.0, 1.0, 0.2])  # body frame m/s
    dt = CFG.scan_period_s
    c, s = np.cos(pose_prev[2]), np.sin(pose_prev[2])
    pose_curr = np.array([
        pose_prev[0] + (c * vel[0] - s * vel[1]) * dt,
        pose_prev[1] + (s * vel[0] + c * vel[1]) * dt,
        pose_prev[2] + vel[2] * dt,
    ])
    p_w, p_jt, m = _build_problem(rng, vel, pose_prev, pose_curr)

    # perturbed initial guess (as the SVD stage would supply)
    guess = pose_curr + np.array([0.3, -0.3, 0.02])

    sol = solve_motion(jnp.asarray(pose_prev, jnp.float32), p_w, p_jt,
                       jnp.asarray(guess, jnp.float32), m, CFG)
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.pose), pose_curr, atol=0.05)
    np.testing.assert_allclose(np.asarray(sol.velocity), vel, atol=0.3)


def test_solver_improves_on_naive_with_noise(rng):
    pose_prev = np.array([0.0, 0.0, 0.0])
    vel = np.array([6.0, 0.0, 0.3])
    dt = CFG.scan_period_s
    pose_curr = np.array([vel[0] * dt, vel[1] * dt, vel[2] * dt])
    p_w, p_jt, m = _build_problem(rng, vel, pose_prev, pose_curr, noise=0.05)

    guess = pose_curr + np.array([0.2, 0.2, -0.03])
    sol = solve_motion(jnp.asarray(pose_prev, jnp.float32), p_w, p_jt,
                       jnp.asarray(guess, jnp.float32), m, CFG)

    err_guess = np.linalg.norm(guess[:2] - pose_curr[:2])
    err_sol = np.linalg.norm(np.asarray(sol.pose)[:2] - pose_curr[:2])
    assert err_sol < err_guess


def test_solver_handles_empty_mask():
    K = 128
    zeros = jnp.zeros((K, 2))
    m = jnp.zeros(K, dtype=bool)
    z3 = jnp.zeros(3)
    sol = solve_motion(z3, zeros, zeros, z3, m, CFG)
    assert not bool(sol.ok)
    assert np.all(np.isfinite(np.asarray(sol.pose)))


def test_time_deltas_range():
    pts = jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]))
    dt = np.asarray(compute_time_deltas(pts, 0.25))
    assert np.all(np.abs(dt) <= 0.125 + 1e-6)
