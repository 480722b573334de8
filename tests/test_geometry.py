"""SE(2) utilities and masked Procrustes — property tests against closed forms."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.sim import fakedata as fd


def test_pose_transform_roundtrip(rng):
    poses = rng.uniform(-5, 5, size=(32, 3))
    poses[:, 2] = rng.uniform(-np.pi, np.pi, size=32)
    T = geo.pose_to_transform(jnp.asarray(poses))
    back = geo.transform_to_pose(T)
    np.testing.assert_allclose(np.asarray(back), poses, atol=1e-3)


def test_invert_transform(rng):
    pose = jnp.asarray(rng.uniform(-3, 3, size=3))
    T = geo.pose_to_transform(pose)
    I = np.asarray(geo.invert_transform(T) @ T)
    np.testing.assert_allclose(I, np.eye(3), atol=5e-3)


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.uniform(-1, 1, size=(16, 3)))
    back = geo.se2_log(geo.se2_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-3)


def test_exp_log_small_angle():
    xi = jnp.array([0.5, -0.2, 1e-12])
    back = geo.se2_log(geo.se2_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-8)


def test_procrustes_recovers_transform(rng):
    old, new, pose = fd.make_correspondences(rng, n=80)
    # convention: R @ new + h = old  (getTransformKLT.py:129-162)
    K = 128
    src = np.zeros((K, 2)); src[:80] = old
    tgt = np.zeros((K, 2)); tgt[:80] = new
    w = np.zeros(K); w[:80] = 1.0
    R, h, ok = geo.procrustes_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    assert bool(ok)
    recovered = np.asarray(R) @ new.T + np.asarray(h)[:, None]
    np.testing.assert_allclose(recovered.T, old, atol=1e-2)


def test_procrustes_masked_ignores_padding(rng):
    old, new, pose = fd.make_correspondences(rng, n=50)
    K = 128
    src = rng.uniform(-100, 100, size=(K, 2)); src[:50] = old
    tgt = rng.uniform(-100, 100, size=(K, 2)); tgt[:50] = new
    w = np.zeros(K); w[:50] = 1.0
    R, h, ok = geo.procrustes_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    recovered = np.asarray(R) @ new.T + np.asarray(h)[:, None]
    np.testing.assert_allclose(recovered.T, old, atol=1e-2)


def test_procrustes_weighted_downweights_outliers(rng):
    old, new, _ = fd.make_correspondences(rng, n=60)
    new_out, idx = fd.make_outliers(rng, new, 10, magnitude=30.0)
    w = np.ones(60); w[idx] = 0.0
    R, h, ok = geo.procrustes_masked(
        jnp.asarray(old), jnp.asarray(new_out), jnp.asarray(w)
    )
    recovered = np.asarray(R) @ new.T + np.asarray(h)[:, None]
    np.testing.assert_allclose(recovered.T, old, atol=1e-2)


def test_procrustes_degenerate_returns_identity():
    src = jnp.zeros((8, 2)); tgt = jnp.zeros((8, 2)); w = jnp.zeros(8)
    R, h, ok = geo.procrustes_masked(src, tgt, w)
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(R), np.eye(2))
