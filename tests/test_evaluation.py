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
