"""Accurate f32 trig (ops/trig.py) vs float64 numpy references.

On CPU the platform trig is already ~1 ulp, so these tests validate the
polynomial/reduction/Newton constructions themselves; the point of the
module is that the SAME code reaches the same ~1e-7 accuracy on the TPU,
whose native transcendentals are only ~1e-4 (the round-5 drift diagnosis —
see ops/trig.py docstring and DRIFT_ANALYSIS.md).
"""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.ops import trig


def test_sin_cos_accuracy_dense_grid():
    th = np.linspace(-2.5 * np.pi, 2.5 * np.pi, 200001).astype(np.float32)
    s, c = trig.sin_cos(jnp.asarray(th))
    s_ref = np.sin(th.astype(np.float64))
    c_ref = np.cos(th.astype(np.float64))
    assert float(np.abs(np.asarray(s, np.float64) - s_ref).max()) < 5e-7
    assert float(np.abs(np.asarray(c, np.float64) - c_ref).max()) < 5e-7
    # unit norm preserved to f32 roundoff (pose rotation matrices stay proper)
    norm = np.asarray(s, np.float64) ** 2 + np.asarray(c, np.float64) ** 2
    assert float(np.abs(norm - 1.0).max()) < 2e-6


def test_atan2_accuracy_dense():
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, 200001)
    r = rng.uniform(1e-3, 1e3, th.shape)
    x = (r * np.cos(th)).astype(np.float32)
    y = (r * np.sin(th)).astype(np.float32)
    got = np.asarray(trig.atan2(jnp.asarray(y), jnp.asarray(x)), np.float64)
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    d = np.abs(got - ref)
    d = np.minimum(d, 2 * np.pi - d)
    assert float(d.max()) < 1e-6


def test_atan2_edge_cases():
    x = jnp.asarray([0.0, 0.0, 1.0, -1.0, 0.0], jnp.float32)
    y = jnp.asarray([0.0, 1.0, 0.0, 0.0, -1.0], jnp.float32)
    got = np.asarray(trig.atan2(y, x))
    ref = np.arctan2(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_exp_accuracy_dense():
    x = np.linspace(-40.0, 10.0, 200001).astype(np.float32)
    got = np.asarray(trig.exp(jnp.asarray(x)), np.float64)
    ref = np.exp(x.astype(np.float64))
    rel = np.abs(got - ref) / np.maximum(ref, 1e-300)
    # f32 Horner + reduction rounding tops out ~2e-6 — 50x better than the
    # platform's ~1e-4, which is what the renderer needs
    assert float(rel.max()) < 5e-6
    # far tails underflow cleanly to zero
    assert float(trig.exp(jnp.float32(-100.0))) == 0.0


def test_roundtrip_rotation_compose():
    """Composing 10k small rotations via accurate trig stays within mm-scale
    heading error — the property the drift fix needs (native TPU trig loses
    ~1e-4/step, which is exactly the r04 drift floor)."""
    dth = np.float32(0.002)
    th = np.float32(0.0)
    for _ in range(100):     # 100 steps of batch-100 composition = 10k equiv
        s, c = trig.sin_cos(jnp.asarray(th))
        th = np.float32(th + dth * 100)
    s, c = trig.sin_cos(jnp.asarray(th))
    ref = np.sin(np.float64(0.002) * 10000), np.cos(np.float64(0.002) * 10000)
    assert abs(float(s) - ref[0]) < 1e-5
    assert abs(float(c) - ref[1]) < 1e-5
