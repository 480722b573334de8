"""Long-sequence evaluation harness on real GT motion (evaluation.py)."""

import os

import numpy as np
import pytest

from radarslampy_tpu import evaluation
from radarslampy_tpu.config import SlamConfig

GT_CSV = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(GT_CSV),
                                reason="full_seq_1 GT absent")


def test_gt_subsequence_anchored():
    seg = evaluation.gt_subsequence(GT_CSV, 400, 50)
    assert seg.shape == (50, 3)
    np.testing.assert_allclose(seg[0], 0.0, atol=1e-9)
    # the car moves: path length over 50 frames is tens of metres
    dist = np.sum(np.linalg.norm(np.diff(seg[:, :2], axis=0), axis=1))
    assert 10.0 < dist < 500.0


def test_evaluate_short_real_motion(small_cfg):
    poses = evaluation.gt_subsequence(GT_CSV, 400, 40)
    res = evaluation.evaluate_sequence(poses, small_cfg, seed=3)
    assert res.frames == 40
    assert res.n_keyframes >= 2
    assert res.ate_odometry < 3.0, res.ate_odometry
    assert res.fps > 0


def test_evaluation_cli(small_cfg, capsys):
    res = evaluation.main([
        "--start", "450", "--count", "25", "--cart-size", "512",
        "--progress-every", "0",
    ])
    out = capsys.readouterr().out
    assert "odometry ATE" in out
    assert res.frames == 25


def _square_laps(side_m=40.0, step_m=2.0, laps=2, corner_frames=10):
    """GT poses driving `laps` times around a rounded square (revisit-heavy);
    corners are smooth arcs so per-frame rotation stays trackable."""
    per_side = int(side_m / step_m)
    poses = []
    pose = np.zeros(3)
    for _ in range(laps * 4):
        for _ in range(per_side):
            poses.append(pose.copy())
            pose[0] += step_m * np.cos(pose[2])
            pose[1] += step_m * np.sin(pose[2])
        for _ in range(corner_frames):
            poses.append(pose.copy())
            pose[2] = (pose[2] + np.pi / 2 / corner_frames + np.pi) % (
                2 * np.pi) - np.pi
            pose[0] += 0.5 * step_m * np.cos(pose[2])
            pose[1] += 0.5 * step_m * np.sin(pose[2])
    return np.stack(poses)


def test_online_backend_reduces_ate(small_cfg):
    """Mid-run loop-closure corrections must reduce the FRAME-trajectory ATE
    vs the post-hoc-only path (post-hoc can only fix keyframes after the
    fact; online correction changes where odometry continues from) —
    VERDICT.md next #2's done-criterion."""
    import dataclasses

    cfg = dataclasses.replace(small_cfg, loop_method="pose")
    poses = _square_laps()

    posthoc = evaluation.evaluate_sequence(
        poses, cfg, seed=11, noise=0.05, run_backend=True)
    online = evaluation.evaluate_sequence(
        poses, cfg, seed=11, noise=0.05, run_backend=True, backend_every=30)

    assert online.n_online_loops > 0, "online backend never fired"
    # drift must be material for the comparison to mean anything
    assert posthoc.ate_odometry > 0.3, posthoc.ate_odometry
    assert online.ate_odometry < posthoc.ate_odometry, (
        online.ate_odometry, posthoc.ate_odometry)
    # and the final map is no worse than the post-hoc-only map
    if posthoc.ate_keyframes_after is not None and (
            online.ate_keyframes_after is not None):
        assert online.ate_keyframes_after <= posthoc.ate_keyframes_after * 1.5


def test_chunked_eval_matches_per_frame(small_cfg):
    """chunk_frames>0 (u8-quantised macro-stepping) tracks the same GT motion
    to a comparable ATE as the per-frame float path."""
    poses = evaluation.gt_subsequence(GT_CSV, 400, 45)
    per_frame = evaluation.evaluate_sequence(poses, small_cfg, seed=3)
    chunked = evaluation.evaluate_sequence(poses, small_cfg, seed=3,
                                           chunk_frames=16)
    assert chunked.frames == per_frame.frames
    # same world, same motion; u8 quantisation perturbs at the percent level
    assert chunked.ate_odometry < max(2.0 * per_frame.ate_odometry, 1.0), (
        chunked.ate_odometry, per_frame.ate_odometry)
    # keyframe counts agree to a couple (quantisation can shift a threshold)
    assert abs(chunked.n_keyframes - per_frame.n_keyframes) <= 2


def test_chunk_consolidation_preserves_results(small_cfg):
    """Device-side [k,F,6] consolidation of packed chunk blocks (the handle-
    churn bound for full-length runs) is a pure re-grouping: per-frame poses
    and health stats are identical with and without it."""
    poses = evaluation.gt_subsequence(GT_CSV, 400, 41)
    plain = evaluation.evaluate_sequence(poses, small_cfg, seed=3,
                                         chunk_frames=4,
                                         consolidate_every=10**9)
    packed = evaluation.evaluate_sequence(poses, small_cfg, seed=3,
                                          chunk_frames=4,
                                          consolidate_every=3)
    assert packed.frames == plain.frames
    assert packed.n_keyframes == plain.n_keyframes
    np.testing.assert_allclose(packed.ate_odometry, plain.ate_odometry,
                               rtol=1e-6)
    np.testing.assert_allclose(packed.mean_inliers, plain.mean_inliers,
                               rtol=1e-6)


def test_eval_checkpoint_resume_bitmatch(small_cfg, tmp_path):
    """The eval harness's checkpoint/resume (VERDICT.md r04 next #1): a run
    resumed from a mid-run checkpoint produces BIT-IDENTICAL per-frame poses
    to the uninterrupted run — render keys fold absolute frame indices, the
    chunk program is chunking-invariant, and the checkpoint carries the full
    SlamState + fetched result blocks + cursors."""
    poses = evaluation.gt_subsequence(GT_CSV, 400, 41)
    ckpt = str(tmp_path / "ck")
    full = evaluation.evaluate_sequence(
        poses, small_cfg, seed=3, chunk_frames=4, return_state=True,
        ckpt_dir=ckpt, ckpt_every=16,
    )
    # the surviving checkpoint is the LAST one written mid-run (frame < 41);
    # resuming from it must replay only the tail and land on the same result
    from radarslampy_tpu.utils.checkpoint import load_meta

    meta = load_meta(ckpt)
    assert 1 < meta["next_t"] < 41, meta
    resumed = evaluation.evaluate_sequence(
        poses, small_cfg, seed=3, chunk_frames=4, return_state=True,
        ckpt_dir=ckpt, ckpt_every=16, resume=True,
    )
    assert resumed.frames == full.frames
    assert resumed.n_keyframes == full.n_keyframes
    np.testing.assert_array_equal(resumed.est_frames, full.est_frames)
    np.testing.assert_array_equal(
        np.asarray(resumed.final_state.map.poses),
        np.asarray(full.final_state.map.poses),
    )
    # config mismatch refuses instead of silently mixing runs
    with pytest.raises(ValueError, match="different run configuration"):
        evaluation.evaluate_sequence(
            poses, small_cfg, seed=4, chunk_frames=4,
            ckpt_dir=ckpt, resume=True,
        )


def test_associate_frame_ids_on_self_intersection():
    """Keyframe->GT association by creating-frame index must pick the correct
    GT row at a path self-intersection where nearest-position association
    picks the other branch (VERDICT.md r03 weak #6 / r04 next #7).

    Figure-8 geometry: the two lobes cross at the origin, so frames ~25 and
    ~75 share (x, y) with opposite headings.  A keyframe created at the
    second crossing whose ESTIMATED position drifted slightly toward the
    first crossing's estimate is mis-associated by nearest-xy — and exactly
    associated by frame index."""
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    # lemniscate of Gerono: crosses itself at the origin at t=pi/2, 3pi/2
    x = 30.0 * np.cos(t)
    y = 15.0 * np.sin(2 * t)
    th = np.arctan2(np.gradient(y), np.gradient(x))
    poses_gt = np.stack([x, y, th], axis=1)
    i_a, i_b = 25, 75          # the two crossing frames (t = pi/2, 3pi/2)
    assert np.linalg.norm(poses_gt[i_a, :2] - poses_gt[i_b, :2]) < 1.0
    # GT headings at the crossing differ — the two branches are distinct rows
    dth = (poses_gt[i_a, 2] - poses_gt[i_b, 2] + np.pi) % (2 * np.pi) - np.pi
    assert abs(dth) > 0.5

    # The mismatch arises when the online backend has RE-ANCHORED the map
    # (keyframe poses near GT) while est_frames keep raw drifted odometry:
    # the corrected keyframe sits at the crossing, nearest to the EARLIER
    # branch's (undrifted) estimate, not to its own drifted creating frame.
    est = poses_gt.copy()
    est[i_b, :2] += 0.8                 # later branch drifted in est_frames
    kf_poses = poses_gt[[i_b]].copy()   # map pose corrected back to truth

    by_index = evaluation._associate(kf_poses, poses_gt, est,
                                     frame_ids=np.array([i_b]))
    np.testing.assert_array_equal(by_index[0], poses_gt[i_b])

    by_nearest = evaluation._associate(kf_poses, poses_gt, est, frame_ids=None)
    assert np.array_equal(by_nearest[0], poses_gt[i_a]), (
        "precondition: nearest-xy should pick the wrong branch here")


def test_eval_ba_stage(small_cfg):
    """`run_ba` adds a bundle-adjustment row to the backend result: a BA
    problem built from the map's persistent landmark ids, solved by the
    Schur path, with a keyframe ATE comparable to the pose-graph result
    (the reference's never-executed BA intent, PoseGraphLib.py:46-98)."""
    import dataclasses

    cfg = dataclasses.replace(small_cfg, loop_method="pose")
    poses = _square_laps(laps=1)
    res = evaluation.evaluate_sequence(poses, cfg, seed=11, noise=0.05,
                                       run_backend=True, run_ba=True)
    assert res.n_ba_landmarks > 10, res.n_ba_landmarks
    assert res.n_ba_observations > res.n_ba_landmarks
    assert res.ate_keyframes_after_ba is not None
    assert np.isfinite(res.ate_keyframes_after_ba)
    # BA must not blow up the map the pose graph produced
    base = res.ate_keyframes_after or res.ate_keyframes_before
    assert res.ate_keyframes_after_ba < max(2.0 * base, 1.0), (
        res.ate_keyframes_after_ba, base)


def test_partial_write_flushes_before_backend(small_cfg):
    """The eval must flush results before the backend stages run — a device
    fault during the post-hoc solve cannot lose the odometry (round-4 run 1
    lost 8,862 completed frames to a TPU worker crash inside BA)."""
    poses = evaluation.gt_subsequence(GT_CSV, 2000, 30)
    stages = []
    res = evaluation.evaluate_sequence(
        poses, small_cfg, seed=3, chunk_frames=8, run_backend=True,
        partial_write=lambda r: stages.append(
            (r.ate_odometry, r.ate_keyframes_before)),
    )
    # flushed at least twice: after odometry (before-backend fields still
    # None) and after the pose-graph stage
    assert len(stages) >= 2
    assert stages[0][1] is None          # pre-backend flush
    assert stages[0][0] == res.ate_odometry
