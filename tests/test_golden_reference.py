"""Golden tests driving the REFERENCE'S OWN PYTHON CODE as the oracle.

The reference modules that don't need skimage import cleanly from
/root/reference (read-only): `ANMS.ssc`, `outlierRejection.rejectOutliers`
(networkx Bron-Kerbosch max clique), and `motionDistortion.
MotionDistortionSolver` (scipy/MINPACK LM with finite-difference Jacobians).
These tests feed identical synthetic problems to the reference implementation
and to our TPU-native ops and assert behavioural agreement — the strongest
parity evidence available short of running the full reference pipeline (which
needs skimage for blob detection).
"""

import os
import sys

import numpy as np
import pytest

os.environ.setdefault("MPLBACKEND", "Agg")

import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops.features import Candidates, anms_cell_cover
from radarslampy_tpu.ops.motion import solve_motion, undistort
from radarslampy_tpu.ops.robust import reject_outliers
from radarslampy_tpu.ops import geometry as geo

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")


@pytest.fixture(scope="module")
def ref():
    """Import the reference's pure-Python modules (matplotlib forced headless)."""
    sys.path.insert(0, REF)
    try:
        import ANMS
        import motionDistortion
        import outlierRejection
    finally:
        sys.path.remove(REF)
    return {
        "ssc": ANMS.ssc,
        "rejectOutliers": outlierRejection.rejectOutliers,
        "MDS": motionDistortion.MotionDistortionSolver,
    }


# ------------------------------------------------------- motion distortion
def test_motion_solver_matches_reference_minpack(ref, rng):
    """Same distorted observations -> reference MINPACK LM and our fixed-budget
    LM must both recover the ground-truth pose/velocity, and agree."""
    cfg = SlamConfig(mds_iterations=20)
    period = cfg.scan_period_s

    K = 80
    p_jt = rng.uniform(-60.0, 60.0, (K, 2)).astype(np.float64)
    v_true = np.array([9.0, 0.6, 0.12])  # m/s, m/s, rad/s — brisk turn
    pose_true = np.array([2.2, 0.4, 0.05])

    # forward model: the observed (distorted) p_jt undistorts to the true
    # sensor-frame points, which the true pose lifts to world coords
    p_und = np.asarray(undistort(jnp.asarray(v_true), jnp.asarray(p_jt), period))
    T_true = np.asarray(geo.pose_to_transform(jnp.asarray(pose_true)))
    p_w = p_und @ T_true[:2, :2].T + T_true[:2, 2]

    # keyframe pose consistent with the velocity prior: T_wj0 = T_wj exp(-v*T)
    T_rel = np.asarray(
        geo.pose_to_transform(jnp.asarray(v_true * period))
    )
    T_wj0 = T_true @ np.linalg.inv(T_rel)
    pose_prev = np.asarray(geo.transform_to_pose(jnp.asarray(T_wj0)))

    pose_init = pose_true + np.array([0.4, -0.3, 0.02])
    T_init = np.asarray(geo.pose_to_transform(jnp.asarray(pose_init)))

    # ---- reference: scipy least_squares(method='lm') ----
    mds = ref["MDS"](np.diag(list(cfg.mds_sigma_p)),
                     np.diag(list(cfg.mds_sigma_v)),
                     cfg.scan_frequency_hz)
    mds.update_problem(T_wj0, p_w, p_jt, T_init)
    params_ref = np.asarray(ref_optimize(mds))
    v_ref, pose_ref = params_ref[:3], params_ref[3:]

    # ---- ours: fixed-budget LM, exact forward-mode Jacobian ----
    sol = solve_motion(
        jnp.asarray(pose_prev, jnp.float32),
        jnp.asarray(p_w, jnp.float32),
        jnp.asarray(p_jt, jnp.float32),
        jnp.asarray(pose_init, jnp.float32),
        jnp.ones(K, dtype=bool),
        cfg,
    )
    assert bool(sol.ok)
    pose_ours = np.asarray(sol.pose)
    v_ours = np.asarray(sol.velocity)

    # both recover ground truth
    assert np.linalg.norm(pose_ref[:2] - pose_true[:2]) < 0.05, pose_ref
    assert np.linalg.norm(pose_ours[:2] - pose_true[:2]) < 0.05, pose_ours
    assert abs(pose_ours[2] - pose_true[2]) < 5e-3
    assert np.linalg.norm(v_ref - v_true) < 0.25
    assert np.linalg.norm(v_ours - v_true) < 0.25
    # and agree with each other
    assert np.linalg.norm(pose_ours - pose_ref) < 0.05
    assert np.linalg.norm(v_ours - v_ref) < 0.15


def ref_optimize(mds):
    """Run the reference's optimize_library without its verbose prints."""
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        return mds.optimize_library()


# ------------------------------------------------------- outlier rejection
def test_reject_outliers_matches_reference_clique(ref, rng):
    """Reference Bron-Kerbosch max clique vs our degree peeling on the same
    correspondence set (reference pixel scale, 0.0864 m/px)."""
    cfg = SlamConfig(cart_size=2048, cart_downsample=2)
    K, n_out = 48, 10
    prev = rng.uniform(200.0, 1800.0, (K, 2))
    th, t = 0.04, np.array([8.0, -5.0])
    c, s = np.cos(th), np.sin(th)
    new = prev @ np.array([[c, -s], [s, c]]).T + t
    # sub-threshold noise on everyone, gross offsets on the outliers
    thresh_px = cfg.clique_dist_threshold_px
    new += rng.normal(0.0, thresh_px / 12.0, new.shape)
    out_idx = rng.choice(K, n_out, replace=False)
    new[out_idx] += rng.uniform(2.5 * thresh_px, 6.0 * thresh_px, (n_out, 2)) * (
        rng.integers(0, 2, (n_out, 2)) * 2 - 1
    )

    _, _, mask_ref = ref["rejectOutliers"](prev.copy(), new.copy())
    mask_ref = np.asarray(mask_ref).reshape(-1).astype(bool)

    res = reject_outliers(
        jnp.asarray(prev, jnp.float32), jnp.asarray(new, jnp.float32),
        jnp.ones(K, dtype=bool), cfg,
    )
    mask_ours = np.asarray(res.inlier_mask)

    true_inliers = np.ones(K, bool)
    true_inliers[out_idx] = False
    # both reject every planted outlier
    assert not mask_ref[out_idx].any()
    assert not mask_ours[out_idx].any()
    # both keep the overwhelming majority of honest matches
    assert mask_ref[true_inliers].mean() > 0.9
    assert mask_ours[true_inliers].mean() > 0.9
    # and agree almost everywhere
    assert (mask_ref == mask_ours).mean() > 0.9, (mask_ref.sum(), mask_ours.sum())


# ----------------------------------------------------------------- ANMS/SSC
def test_anms_spatial_uniformity_matches_ssc(ref, rng):
    """Our cell-cover ANMS must match reference SSC's keypoint count and
    spatial dispersion (mean nearest-neighbour distance) on the same input."""
    cfg = SlamConfig()
    S = cfg.cart_size
    N = 600
    # strength-sorted keypoints, clustered like radar blobs (dense near centre)
    pts = np.clip(rng.normal(S / 2, S / 5, (N, 2)), 0, S - 1)

    # reference ssc consumes [N, 3] blob rows (row, col, sigma) — getFeatures.py:66-72
    blobs = np.hstack([pts, np.ones((N, 1))])
    sel_ref = np.asarray(ref["ssc"](blobs, cfg.anms_top_k, 0.1, S, S))[:, :2]

    cands = Candidates(
        xy=jnp.asarray(pts[:, ::-1], jnp.float32),  # ssc is [row, col]; ours [x, y]
        response=jnp.asarray(np.linspace(1.0, 0.1, N), jnp.float32),
        sigma=jnp.ones(N, jnp.float32),
        mask=jnp.ones(N, dtype=bool),
    )
    out = anms_cell_cover(cands, cfg, S)
    sel_ours = np.asarray(out.xy)[np.asarray(out.mask)]

    def mean_nn(a):
        d = np.linalg.norm(a[:, None] - a[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1).mean()

    n_ref, n_ours = len(sel_ref), len(sel_ours)
    assert abs(n_ours - n_ref) <= 0.25 * n_ref, (n_ref, n_ours)
    nn_ref, nn_ours = mean_nn(sel_ref), mean_nn(sel_ours)
    assert 0.6 * nn_ref < nn_ours < 1.7 * nn_ref, (nn_ref, nn_ours)
