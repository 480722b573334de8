"""Fused Pallas DoH kernel vs the conv and matmul reference paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.features import doh_response
from radarslampy_tpu.ops.pallas import doh_pallas as dp

CFG = SlamConfig(cart_size=256, cart_downsample=16)


def _img(rng, size=256):
    img = rng.random((size, size)).astype(np.float32)
    # smooth a bit so second derivatives aren't pure noise
    k = np.ones(5) / 5
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
    return img.astype(np.float32)


def test_matmul_matches_conv(rng):
    img = jnp.asarray(_img(rng))
    mats = dp.build_doh_mats(CFG)
    a = np.asarray(doh_response(img, CFG))
    b = np.asarray(dp.doh_response_matmul(img, mats, CFG.doh_sigmas))
    # identical math up to float addition order; sigma^4 up to 1e4 amplifies
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=2e-3 * max(scale, 1.0))


def test_pallas_interpret_matches_matmul(rng):
    img = jnp.asarray(_img(rng))
    mats = dp.build_doh_mats(CFG)
    ref = np.asarray(dp.doh_response_matmul(img, mats, CFG.doh_sigmas))

    # run the kernel in interpreter mode (no TPU needed)
    S = img.shape[0]
    n_sigma = mats.shape[0]
    sig4 = jnp.asarray(
        [float(max(s, 1.0)) ** 4 for s in CFG.doh_sigmas], jnp.float32
    ).reshape(n_sigma, 1)
    out = pl.pallas_call(
        dp._kernel,
        out_shape=jax.ShapeDtypeStruct((n_sigma, S, S), jnp.float32),
        grid=(n_sigma, S // dp.ROW_TILE),
        in_specs=[
            pl.BlockSpec((n_sigma, 1), lambda s, r: (0, 0)),
            pl.BlockSpec((S, S), lambda s, r: (0, 0)),
            pl.BlockSpec((1, S, S), lambda s, r: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dp.ROW_TILE, S), lambda s, r: (s, r, 0)),
        interpret=True,
    )(sig4, img, mats)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3 * max(scale, 1.0))


def test_frontend_detect_with_mats_matches_without(rng):
    """End-to-end detection equivalence: conv path vs matmul path."""
    from radarslampy_tpu.ops.features import get_features

    cfg = SlamConfig(cart_size=256, cart_downsample=16, n_candidates=128,
                     anms_top_k=50)
    img = jnp.asarray(_img(rng))
    mats = dp.build_doh_mats(cfg)
    a = get_features(img, cfg)
    b = get_features(img, cfg, mats)
    xa = np.asarray(a.xy)[np.asarray(a.mask)]
    xb = np.asarray(b.xy)[np.asarray(b.mask)]
    # same detections (order may differ): compare as sets
    sa = set(map(tuple, xa.astype(int).tolist()))
    sb = set(map(tuple, xb.astype(int).tolist()))
    inter = len(sa & sb) / max(len(sa | sb), 1)
    assert inter > 0.9, f"detections diverge: jaccard {inter:.2f}"
