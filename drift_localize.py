"""Localize full-sequence odometry error from an eval checkpoint.

Reads eval_ckpt_*/eval_results.npz (per-frame packed rows [x, y, theta,
n_inliers, fit_ok, did_retrack]) and reports per-window segment drift and
the single worst per-frame heading jumps with their inlier counts — the
r05 analysis that diagnosed the full-seq ATE as localized inlier-collapse
catastrophes, not uniform platform drift (see DRIFT_ANALYSIS.md).

Usage: python drift_localize.py [ckpt_dir] [gt_csv]
"""
import sys

import numpy as np

from radarslampy_tpu.evaluation import gt_subsequence

ckpt = sys.argv[1] if len(sys.argv) > 1 else "eval_ckpt_cpu"
gt_csv = (sys.argv[2] if len(sys.argv) > 2
          else "/root/reference/data/full_seq_1/gt/radar_odometry.csv")

d = np.load(f"{ckpt}/eval_results.npz")
rows = d["blocks"].reshape(-1, 6)
est, inl, ret = rows[:, :3], rows[:, 3], rows[:, 5]
gt = np.asarray(gt_subsequence(gt_csv, 0, len(rows)))[: len(rows)]

err = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1)
dth_e = np.diff(np.unwrap(est[:, 2]))
dth_g = np.diff(np.unwrap(gt[:, 2]))
herr = np.degrees(np.abs(dth_e - dth_g))
step = np.linalg.norm(np.diff(gt[:, :2], axis=0), axis=1)
turn = np.degrees(np.abs(np.diff(np.unwrap(gt[:, 2]))))


def rel(p, a, b):
    c, s = np.cos(p[a, 2]), np.sin(p[a, 2])
    dx, dy = p[b, 0] - p[a, 0], p[b, 1] - p[a, 1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, p[b, 2] - p[a, 2]])


W = 512
print("win    abs_err_m  seg_path_m  seg_drift_pct  dheading_deg  "
      "inl_min  retracks  hinc_max_deg")
for t in range(0, len(rows) - W, W):
    re_, rg = rel(est, t, t + W), rel(gt, t, t + W)
    seg = np.sum(step[t : t + W])
    dd = np.linalg.norm(re_[:2] - rg[:2])
    dh = np.degrees((re_[2] - rg[2] + np.pi) % (2 * np.pi) - np.pi)
    s = slice(t, t + W)
    print(f"{t:5d}  {err[t]:9.2f}  {seg:9.1f}  {100 * dd / max(seg, 1e-6):12.2f}"
          f"  {dh:+11.2f}  {inl[s].min():6.0f}  {ret[s].sum():7.0f}"
          f"  {herr[s].max():10.2f}")

bad = np.argsort(herr)[-10:][::-1]
print("\nworst single-frame heading jumps:")
for b in bad:
    print(f"  frame {int(b):5d}: {herr[b]:5.1f} deg jump, inliers "
          f"{inl[b]:.0f}, gt step {step[min(b, len(step) - 1)]:.2f} m, "
          f"gt turn {turn[min(b, len(turn) - 1)]:.2f} deg")
