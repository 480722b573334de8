"""Golden-parity tests: our TPU-native ops vs the reference's actual C++ kernels.

The reference pipeline leans on OpenCV C++ for its hot kernels (SURVEY.md §2):
`cv2.imread` decode (parseData.py:39-53), `cv2.warpPolar` (parseData.py:100-135),
`cv2.calcOpticalFlowPyrLK` (getTransformKLT.py:356-360) and
`cv2.phaseCorrelate` FMT (FMT.py:36-101).  cv2 is available in this image, so
these tests drive the *same* C++ kernels the reference calls — configured to the
reference's parameters — on REAL Oxford tiny frames and assert our JAX ops agree
within sub-pixel / interpolation tolerances.  skimage is absent, so DoH golden
coverage stays with the planted-blob tests in test_features.py.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.io.oxford import decode_radar_png, radar_image_paths, sequence_paths
from radarslampy_tpu.ops.features import get_features
from radarslampy_tpu.ops.fmt import estimate_rotation_fmt, phase_correlate
from radarslampy_tpu.ops.grid import build_grid_maps, polar_to_cartesian
from radarslampy_tpu.ops.tracking import track_klt

from conftest import TINY_ROOT, tiny_available

pytestmark = pytest.mark.skipif(not tiny_available(), reason="tiny dataset absent")


def _tiny_paths():
    p = sequence_paths(TINY_ROOT, "tiny")
    return radar_image_paths(p["radar"], p["timestamps"])


@pytest.fixture(scope="module")
def frames(cfg):
    paths = _tiny_paths()
    return [decode_radar_png(p, cfg) for p in paths[:3]]


@pytest.fixture(scope="module")
def carts(cfg, frames):
    maps = build_grid_maps(cfg)
    return [np.asarray(polar_to_cartesian(jnp.asarray(f.power), maps, cfg)) for f in frames]


# --------------------------------------------------------------------- decode
def test_decode_matches_cv2_imread(cfg):
    """Our PIL decode must be bit-identical to the reference's cv2.imread path
    (field layout per parseData.py:39-53)."""
    path = _tiny_paths()[0]
    ours = decode_radar_png(path, cfg)

    raw = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    ts = raw[:, :8].copy().view(np.int64).reshape(-1)
    az = (
        raw[:, 8:10].copy().view(np.uint16).reshape(-1).astype(np.float32)
        / float(cfg.encoder_size) * 2.0 * np.pi
    )
    valid = raw[:, 10] == 255
    bins = cfg.clipped_range_bins
    power = raw[:, 11 : 11 + bins].astype(np.float32) / 255.0

    np.testing.assert_array_equal(ours.timestamps, ts)
    np.testing.assert_array_equal(ours.azimuths, az)
    np.testing.assert_array_equal(ours.valid, valid)
    np.testing.assert_array_equal(ours.power[:, :bins], power)
    assert not ours.power[:, bins:].any()  # lane padding stays zero


# ----------------------------------------------------------------------- warp
def test_polar_to_cartesian_matches_cv2_warppolar(cfg, frames, carts):
    """Our bilinear-gather warp vs cv2.warpPolar with the reference's flags
    (WARP_POLAR_LINEAR + WARP_INVERSE_MAP + INTER_LINEAR + WARP_FILL_OUTLIERS,
    parseData.py:131-134) mapped onto our grid geometry."""
    bins = cfg.clipped_range_bins
    polar = np.asarray(frames[0].power[:, :bins], dtype=np.float32)
    S = cfg.cart_size
    # cv2 maps source column W to radius maxRadius; our map puts range bin
    # r at cart radius r / cart_downsample px, so maxRadius = bins / downsample.
    max_radius = bins / cfg.cart_downsample
    c = (S - 1) / 2.0
    flags = (
        cv2.WARP_POLAR_LINEAR + cv2.WARP_INVERSE_MAP
        + cv2.INTER_LINEAR + cv2.WARP_FILL_OUTLIERS
    )
    golden = cv2.warpPolar(polar, (S, S), (c, c), max_radius, flags)

    ours = carts[0]
    both = (golden > 0) & (ours > 0)
    assert both.mean() > 0.3  # real scan has plenty of signal
    diff = np.abs(ours - golden)[both]
    # cv2 uses fixed-point bilinear taps (~1/32 px) and a slightly different
    # azimuth rounding at the wrap seam; agreement must be sub-quantisation.
    assert np.median(diff) < 2e-3
    assert diff.mean() < 5e-3
    corr = np.corrcoef(ours[both], golden[both])[0, 1]
    assert corr > 0.995


# ------------------------------------------------------------------------ KLT
def test_track_klt_matches_cv2_pyrlk(cfg, carts):
    """Our pyramidal LK vs cv2.calcOpticalFlowPyrLK with the reference params
    (winSize 15x15, maxLevel 3, 10 iters / eps 0.03 — getTransformKLT.py:77-81)
    on two consecutive REAL frames, from real detected features."""
    prev, curr = carts[0], carts[1]
    feats = get_features(jnp.asarray(prev), cfg)
    pts = np.asarray(feats.xy)[np.asarray(feats.mask)]
    assert len(pts) >= 50

    prev8 = np.clip(prev * 255.0, 0, 255).astype(np.uint8)
    curr8 = np.clip(curr * 255.0, 0, 255).astype(np.uint8)
    golden_pts, st, err = cv2.calcOpticalFlowPyrLK(
        prev8, curr8, pts.astype(np.float32).reshape(-1, 1, 2), None,
        winSize=(cfg.klt_window, cfg.klt_window),
        maxLevel=cfg.klt_pyramid_levels - 1,
        criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS,
                  cfg.klt_iters, cfg.klt_eps),
    )
    golden_pts = golden_pts.reshape(-1, 2)
    st = st.reshape(-1).astype(bool) & (err.reshape(-1) < 10.0)

    K = cfg.k_max
    coords = np.zeros((K, 2), np.float32)
    mask = np.zeros(K, bool)
    n = min(len(pts), K)
    coords[:n] = pts[:n]
    mask[:n] = True
    res = track_klt(jnp.asarray(prev), jnp.asarray(curr), jnp.asarray(coords),
                    jnp.asarray(mask), cfg)
    ours = np.asarray(res.coords)[:n]
    ours_ok = np.asarray(res.status)[:n]

    both = st[:n] & ours_ok
    assert both.sum() >= 30
    d = np.linalg.norm(ours[both] - golden_pts[:n][both], axis=1)
    # sub-pixel agreement on the overwhelming majority; a few speckle features
    # legitimately converge to different local minima.
    assert np.median(d) < 0.25
    assert np.mean(d < 1.0) > 0.85


# ------------------------------------------------------------------------ FMT
def _reference_fmt_cv2(src_polar, tgt_polar, cfg):
    """The reference FMT pipeline (FMT.py:36-101) driven through cv2:
    range clip -> cv2.resize x10 down -> polar->Cart (warpPolar inverse,
    downsampleFactor=1) -> Cart->log-polar (warpPolar WARP_POLAR_LOG)
    -> Hanning phaseCorrelate -> angle = -dy * 2pi / sz."""
    bins = cfg.clipped_range_bins
    src = src_polar[:, :bins].astype(np.float32)
    tgt = tgt_polar[:, :bins].astype(np.float32)
    H, W = src.shape
    size = (int(W // cfg.fmt_downsample), H)
    src = cv2.resize(src, size)
    tgt = cv2.resize(tgt, size)

    def to_logpolar(img):
        h, w = img.shape
        flags = (cv2.WARP_POLAR_LINEAR + cv2.WARP_INVERSE_MAP
                 + cv2.INTER_LINEAR + cv2.WARP_FILL_OUTLIERS)
        cart_size = (w * 2, w * 2)
        cart = cv2.warpPolar(img, cart_size, (w, w), w, flags)
        lp_flags = cv2.WARP_POLAR_LOG + cv2.INTER_LINEAR + cv2.WARP_FILL_OUTLIERS
        return cv2.warpPolar(cart, None, (cart.shape[0] / 2, cart.shape[1] / 2),
                             cart.shape[0] / 2, lp_flags)

    src_lp = to_logpolar(src)
    tgt_lp = to_logpolar(tgt)
    hann = cv2.createHanningWindow((src_lp.shape[1], src_lp.shape[0]), cv2.CV_32F)
    (dx, dy), resp = cv2.phaseCorrelate(src_lp, tgt_lp, hann)
    sz = max(src_lp.shape)
    ang = -float(dy) * 2.0 * np.pi / sz
    return (ang + np.pi) % (2 * np.pi) - np.pi


def test_fmt_rotation_matches_cv2_pipeline(cfg, frames):
    """Both FMT paths must recover a planted pure rotation (integer polar-row
    roll of a REAL scan) to sub-azimuth accuracy, and agree with each other."""
    polar = np.asarray(frames[0].power, dtype=np.float32)
    for shift in (3, -5):
        rolled = np.roll(polar, shift, axis=0)
        # rolling rows by +k moves the return at azimuth phi to phi + k*delta:
        # the scene rotated by +k*delta (reference convention R(ang) @ src = tgt)
        truth = shift * 2.0 * np.pi / cfg.num_azimuths

        golden = _reference_fmt_cv2(polar, rolled, cfg)
        ours = float(
            estimate_rotation_fmt(jnp.asarray(polar), jnp.asarray(rolled), cfg).rot_rad
        )
        step = 2.0 * np.pi / cfg.num_azimuths
        assert abs(ours - truth) < 0.5 * step, (ours, truth)
        # The reference's double-warp pipeline recovers the magnitude but the
        # OPPOSITE sign of the true rotation — a latent bug it never noticed
        # because the FMT result is computed-and-discarded (Tracker.py:66-72,
        # SURVEY.md §2#9).  We pin that behaviour here: golden == -truth.
        assert abs(golden + truth) < 1.0 * step, (golden, truth)
        assert abs(abs(ours) - abs(golden)) < 1.0 * step


def test_phase_correlate_matches_cv2(carts):
    """Our jnp.fft phase correlation vs cv2.phaseCorrelate on a REAL Cartesian
    scan with a planted integer shift: both sub-pixel, mutually consistent."""
    img = carts[0][256:768, 256:768].astype(np.float32)
    shifted = np.roll(np.roll(img, 7, axis=0), -4, axis=1)

    hann = cv2.createHanningWindow((img.shape[1], img.shape[0]), cv2.CV_32F)
    (gdx, gdy), _ = cv2.phaseCorrelate(img, shifted, hann)
    dy, dx, resp = phase_correlate(jnp.asarray(img), jnp.asarray(shifted))
    dy, dx = float(dy), float(dx)

    # cv2 reports the (x, y) shift of the second image relative to the first
    # with opposite sign convention to a forward roll.
    assert abs(abs(gdy) - 7) < 0.1 and abs(abs(gdx) - 4) < 0.1
    assert abs(abs(dy) - 7) < 0.1 and abs(abs(dx) - 4) < 0.1
    assert abs(abs(dy) - abs(gdy)) < 0.05
    assert abs(abs(dx) - abs(gdx)) < 0.05


# ---------------------------------------------------------------- FMT scale
def test_fmt_scale_matches_reference_fmt(cfg, frames):
    """Drive the reference's ACTUAL getRotationUsingFMT (FMT.py:36-88 — resize,
    double cv2.warpPolar, cv2.phaseCorrelate) against our direct log-polar
    path (grid= wired) on a REAL scan with a planted range scaling: both must
    recover the scale factor (VERDICT.md missing #3: the scale path is now
    live, not dead code)."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import FMT as ref_fmt
    finally:
        sys.path.remove("/root/reference")

    polar = np.asarray(frames[0].power, dtype=np.float32)
    bins = cfg.clipped_range_bins
    grid = build_grid_maps(cfg)

    for s_true in (1.0, 1.05, 0.95):
        # scale the scene by s: target(phi, r) = src(phi, r / s)
        cols = np.arange(polar.shape[1], dtype=np.float32)
        scaled = np.stack(
            [np.interp(cols / s_true, cols, row) for row in polar]
        ).astype(np.float32)
        scaled[:, bins:] = 0.0

        ref_ang, ref_scale, _ = ref_fmt.getRotationUsingFMT(
            polar[:, :bins], scaled[:, :bins]
        )
        ours = estimate_rotation_fmt(
            jnp.asarray(polar), jnp.asarray(scaled), cfg, grid=grid
        )
        our_scale = float(ours.scale)
        assert abs(our_scale - s_true) < 0.02, (s_true, our_scale)
        assert abs(float(ours.rot_rad)) < 0.02  # no rotation planted
        # reference agreement: same scale magnitude up to its coarser
        # log-polar grid (its base comes from a 2x-downsampled cart image)
        assert abs(ref_scale - s_true) < 0.05, (s_true, ref_scale)
        assert abs(our_scale - ref_scale) < 0.05
