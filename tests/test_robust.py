"""Outlier rejection: degree peeling vs. exact networkx max clique."""

import jax.numpy as jnp
import networkx as nx
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.robust import reject_outliers
from radarslampy_tpu.sim import fakedata as fd

CFG = SlamConfig()


def _exact_clique_mask(prev_pts, new_pts, thresh):
    """Oracle: the reference's algorithm (outlierRejection.py:49-78) verbatim idea."""
    from scipy.spatial.distance import cdist

    dp = cdist(prev_pts, prev_pts)
    dn = cdist(new_pts, new_pts)
    adj = (np.abs(dp - dn) <= thresh).astype(np.int8)
    G = nx.Graph(adj)
    best = max(nx.find_cliques(G), key=len)
    mask = np.zeros(len(prev_pts), dtype=bool)
    mask[list(best)] = True
    return mask


def _padded(prev_pts, new_pts, K=128):
    n = len(prev_pts)
    p = np.zeros((K, 2)); p[:n] = prev_pts
    q = np.zeros((K, 2)); q[:n] = new_pts
    m = np.zeros(K, dtype=bool); m[:n] = True
    return jnp.asarray(p), jnp.asarray(q), jnp.asarray(m)


def test_peeling_recovers_inliers(rng):
    thresh = 5.0
    old, new, _ = fd.make_correspondences(rng, n=100, spread=300.0)
    new = fd.add_noise(rng, new, sigma=thresh / 20)
    new_out, out_idx = fd.make_outliers(rng, new, 20, magnitude=5 * thresh)
    p, q, m = _padded(old, new_out)
    res = reject_outliers(p, q, m, CFG, threshold_px=thresh)
    mask = np.asarray(res.inlier_mask)[:100]
    # every forced outlier must be rejected
    assert not mask[out_idx].any()
    # the vast majority of true inliers must survive
    inlier_idx = np.setdiff1d(np.arange(100), out_idx)
    assert mask[inlier_idx].mean() > 0.9


def test_peeling_matches_exact_clique_size(rng):
    """Peeling's clique must be near the exact maximum clique on random data."""
    thresh = 5.0
    for seed in range(3):
        r = np.random.default_rng(seed)
        old, new, _ = fd.make_correspondences(r, n=60, spread=200.0)
        new = fd.add_noise(r, new, sigma=0.3)
        new_out, _ = fd.make_outliers(r, new, 12, magnitude=40.0)
        exact = _exact_clique_mask(old, new_out, thresh)
        p, q, m = _padded(old, new_out)
        res = reject_outliers(p, q, m, CFG, threshold_px=thresh)
        approx = np.asarray(res.inlier_mask)[:60]
        # clique property: all surviving pairs mutually consistent
        from scipy.spatial.distance import cdist

        dp = cdist(old[approx], old[approx])
        dn = cdist(new_out[approx], new_out[approx])
        assert np.all(np.abs(dp - dn) <= thresh + 1e-6)
        # within 90% of the exact maximum clique size
        assert approx.sum() >= 0.9 * exact.sum()


def test_all_inliers_untouched(rng):
    old, new, _ = fd.make_correspondences(rng, n=50, spread=100.0)
    p, q, m = _padded(old, new)
    res = reject_outliers(p, q, m, CFG, threshold_px=5.0)
    assert int(res.n_inliers) == 50


def test_padding_never_selected(rng):
    old, new, _ = fd.make_correspondences(rng, n=30, spread=100.0)
    p, q, m = _padded(old, new)
    res = reject_outliers(p, q, m, CFG, threshold_px=5.0)
    assert not np.asarray(res.inlier_mask)[30:].any()
