"""DoH blob detection + ANMS: synthetic-blob recovery and dispersion checks."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.features import (
    Candidates,
    anms_cell_cover,
    detect_blobs,
    get_features,
    merge_features,
)

CFG = SlamConfig(cart_size=512, n_candidates=256, anms_top_k=64, k_max=128)


def _blob_image(rng, centers, sigma=3.0, size=512):
    img = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for cx, cy in centers:
        img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2))
    return np.clip(img, 0, 1)


def test_detects_planted_blobs(rng):
    centers = [(100, 100), (400, 120), (250, 300), (120, 420), (380, 390)]
    img = _blob_image(rng, centers)
    cands = detect_blobs(jnp.asarray(img), CFG)
    xy = np.asarray(cands.xy)[np.asarray(cands.mask)]
    assert len(xy) >= len(centers)
    for cx, cy in centers:
        d = np.hypot(xy[:, 0] - cx, xy[:, 1] - cy).min()
        assert d < 5.0, f"blob at ({cx},{cy}) missed (nearest {d:.1f}px)"


def test_no_detections_on_flat_image():
    img = jnp.zeros((512, 512), jnp.float32)
    cands = detect_blobs(img, CFG)
    assert int(np.asarray(cands.mask).sum()) == 0


def test_anms_one_winner_per_cell(rng):
    n = 200
    xy = rng.uniform(0, 512, size=(n, 2)).astype(np.float32)
    resp = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    pad = CFG.n_candidates - n
    cands = Candidates(
        xy=jnp.asarray(np.vstack([xy, np.zeros((pad, 2), np.float32)])),
        response=jnp.asarray(np.concatenate([resp, np.zeros(pad, np.float32)])),
        sigma=jnp.ones(CFG.n_candidates, jnp.float32),
        mask=jnp.asarray(np.arange(CFG.n_candidates) < n),
    )
    out = anms_cell_cover(cands, CFG, 512)
    kept = np.asarray(out.mask)
    kxy = np.asarray(out.xy)[kept]
    cell_sz = 512 / CFG.anms_grid
    cells = (kxy[:, 1] // cell_sz).astype(int) * CFG.anms_grid + (
        kxy[:, 0] // cell_sz
    ).astype(int)
    assert len(cells) == len(set(cells)), "two winners share a cell"
    assert kept.sum() <= CFG.anms_top_k


def test_anms_keeps_strongest(rng):
    """Within one cell, the surviving candidate must be the strongest."""
    xy = np.array([[10.0, 10.0], [12.0, 11.0], [11.0, 12.0]], np.float32)
    resp = np.array([0.2, 0.9, 0.5], np.float32)
    pad = CFG.n_candidates - 3
    cands = Candidates(
        xy=jnp.asarray(np.vstack([xy, np.zeros((pad, 2), np.float32)])),
        response=jnp.asarray(np.concatenate([resp, np.zeros(pad, np.float32)])),
        sigma=jnp.ones(CFG.n_candidates, jnp.float32),
        mask=jnp.asarray(np.arange(CFG.n_candidates) < 3),
    )
    out = anms_cell_cover(cands, CFG, 512)
    kept_resp = np.asarray(out.response)[np.asarray(out.mask)]
    assert len(kept_resp) == 1 and kept_resp[0] == np.float32(0.9)


def test_merge_features_fills_free_slots(rng):
    K = CFG.k_max
    coords = np.zeros((K, 2), np.float32)
    mask = np.zeros(K, dtype=bool)
    coords[:10] = rng.uniform(50, 450, (10, 2))
    mask[:10] = True

    n_new = 30
    new_xy = rng.uniform(50, 450, (n_new, 2)).astype(np.float32)
    pad = CFG.n_candidates - n_new
    cands = Candidates(
        xy=jnp.asarray(np.vstack([new_xy, np.zeros((pad, 2), np.float32)])),
        response=jnp.asarray(
            np.concatenate([np.ones(n_new, np.float32), np.zeros(pad, np.float32)])
        ),
        sigma=jnp.ones(CFG.n_candidates, jnp.float32),
        mask=jnp.asarray(np.arange(CFG.n_candidates) < n_new),
    )
    out_c, out_m = merge_features(jnp.asarray(coords), jnp.asarray(mask), cands)
    out_c, out_m = np.asarray(out_c), np.asarray(out_m)
    # originals untouched
    np.testing.assert_allclose(out_c[:10], coords[:10])
    assert out_m[:10].all()
    # all sufficiently-distant new features placed
    far = np.array(
        [np.hypot(*(new_xy[i] - coords[:10]).T).min() > 4.0 for i in range(n_new)]
    )
    assert out_m.sum() == 10 + far.sum()


def test_merge_features_dedupes_near_existing(rng):
    K = CFG.k_max
    coords = np.zeros((K, 2), np.float32)
    mask = np.zeros(K, dtype=bool)
    coords[0] = (100.0, 100.0)
    mask[0] = True
    # candidate right on top of the existing feature
    pad = CFG.n_candidates - 1
    cands = Candidates(
        xy=jnp.asarray(np.vstack([[[101.0, 100.0]], np.zeros((pad, 2), np.float32)])),
        response=jnp.asarray(np.concatenate([[1.0], np.zeros(pad)]).astype(np.float32)),
        sigma=jnp.ones(CFG.n_candidates, jnp.float32),
        mask=jnp.asarray(np.arange(CFG.n_candidates) < 1),
    )
    _, out_m = merge_features(jnp.asarray(coords), jnp.asarray(mask), cands)
    assert np.asarray(out_m).sum() == 1  # duplicate rejected
