"""Pyramidal LK tracking: recovery of known shifts on synthetic imagery."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.tracking import build_pyramid, track_klt

CFG = SlamConfig(k_max=64)


def _texture(rng, size=256):
    """Smooth random texture with strong gradients (trackable everywhere)."""
    img = rng.standard_normal((size, size)).astype(np.float32)
    # big blur via FFT low-pass for smoothness
    f = np.fft.rfft2(img)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    f *= np.exp(-((fx**2 + fy**2) / (2 * 0.05**2)))
    img = np.fft.irfft2(f, s=(size, size)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    return img


def _shift_image(img, dx, dy):
    """Subpixel shift via Fourier phase ramp."""
    H, W = img.shape
    f = np.fft.fft2(img)
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    f *= np.exp(-2j * np.pi * (fx * dx + fy * dy))
    return np.real(np.fft.ifft2(f)).astype(np.float32)


def _pad_coords(pts, K):
    c = np.zeros((K, 2), np.float32)
    c[: len(pts)] = pts
    m = np.zeros(K, dtype=bool)
    m[: len(pts)] = True
    return jnp.asarray(c), jnp.asarray(m)


def test_recovers_small_subpixel_shift(rng):
    img = _texture(rng)
    dx, dy = 1.3, -0.7
    shifted = _shift_image(img, dx, dy)
    pts = rng.uniform(40, 216, size=(30, 2)).astype(np.float32)
    coords, mask = _pad_coords(pts, CFG.k_max)
    res = track_klt(jnp.asarray(img), jnp.asarray(shifted), coords, mask, CFG)
    st = np.asarray(res.status)[:30]
    flow = np.asarray(res.coords)[:30] - pts
    assert st.mean() > 0.8
    err = np.abs(flow[st] - [dx, dy])
    assert np.median(err) < 0.25


def test_recovers_large_shift_via_pyramid(rng):
    img = _texture(rng)
    dx, dy = 14.0, -9.0  # far beyond one 15px window, needs pyramid
    shifted = _shift_image(img, dx, dy)
    pts = rng.uniform(60, 196, size=(25, 2)).astype(np.float32)
    coords, mask = _pad_coords(pts, CFG.k_max)
    res = track_klt(jnp.asarray(img), jnp.asarray(shifted), coords, mask, CFG)
    st = np.asarray(res.status)[:25]
    flow = np.asarray(res.coords)[:25] - pts
    assert st.mean() > 0.6
    err = np.linalg.norm(flow[st] - [dx, dy], axis=1)
    assert np.median(err) < 0.5


def test_zero_shift_stays_put(rng):
    img = _texture(rng)
    pts = rng.uniform(40, 216, size=(20, 2)).astype(np.float32)
    coords, mask = _pad_coords(pts, CFG.k_max)
    res = track_klt(jnp.asarray(img), jnp.asarray(img), coords, mask, CFG)
    flow = np.asarray(res.coords)[:20] - pts
    assert np.abs(flow).max() < 0.1


def test_masked_slots_not_tracked(rng):
    img = _texture(rng)
    coords, mask = _pad_coords(rng.uniform(40, 216, size=(5, 2)), CFG.k_max)
    res = track_klt(jnp.asarray(img), jnp.asarray(img), coords, mask, CFG)
    assert not np.asarray(res.status)[5:].any()


def test_error_gate_rejects_decorrelated(rng):
    img = _texture(rng)
    other = _texture(np.random.default_rng(99))  # unrelated image
    pts = rng.uniform(40, 216, size=(20, 2)).astype(np.float32)
    coords, mask = _pad_coords(pts, CFG.k_max)
    res = track_klt(jnp.asarray(img), jnp.asarray(other), coords, mask, CFG)
    # most features must fail the error gate on an unrelated image
    assert np.asarray(res.status)[:20].mean() < 0.5


def test_pyramid_shapes(rng):
    img = jnp.asarray(_texture(rng, 256))
    pyr = build_pyramid(img, 4)
    assert [p.shape[0] for p in pyr] == [256, 128, 64, 32]
