"""Trajectory container, time interpolation and ATE metrics (host-side).

Replaces `trajectoryPlotting.py:20-122`: pose accumulation happens on device in
the fused step; this class just records the per-frame outputs, interpolates
between timestamps, and computes the RMSE/ATE metric the paper reports
(`trajectoryPlotting.py:116-122`).
"""

from __future__ import annotations

import numpy as np


class Trajectory:
    def __init__(self, timestamps=None, poses=None):
        self.timestamps = list(timestamps) if timestamps is not None else []
        self.poses = [np.asarray(p, dtype=np.float64) for p in poses] if poses is not None else []

    def append(self, timestamp: int, pose) -> None:
        self.timestamps.append(int(timestamp))
        self.poses.append(np.asarray(pose, dtype=np.float64))

    def as_arrays(self):
        return np.asarray(self.timestamps, dtype=np.int64), np.stack(self.poses)

    def pose_at_times(self, query_times):
        """Linear interpolation of poses at query timestamps, nearest-clamped at
        the ends (replaces the cubic interp1d of trajectoryPlotting.py:72-101,
        whose bare-except nearest fallback is a documented quirk)."""
        ts, poses = self.as_arrays()
        q = np.atleast_1d(np.asarray(query_times, dtype=np.float64))
        t = ts.astype(np.float64)
        out = np.empty((len(q), 3))
        for d in range(2):
            out[:, d] = np.interp(q, t, poses[:, d])
        # interpolate heading via unwrapped angles to avoid 2*pi jumps
        unwrapped = np.unwrap(poses[:, 2])
        th = np.interp(q, t, unwrapped)
        out[:, 2] = (th + np.pi) % (2 * np.pi) - np.pi
        return out if np.ndim(query_times) else out[0]


def compute_rmse(gt_poses, est_poses):
    """Translational RMSE/ATE over matched poses (trajectoryPlotting.py:116-122)."""
    err = np.linalg.norm(gt_poses[:, :2] - est_poses[:, :2], axis=-1)
    return float(np.sqrt(np.mean(err**2)))


def align_and_rmse(gt_traj: Trajectory, est_traj: Trajectory):
    """Evaluate both trajectories on the overlapping timestamp range
    (plotGtAndEstTrajectory's sampling, trajectoryPlotting.py:141-149)."""
    t0 = max(gt_traj.timestamps[0], est_traj.timestamps[0])
    t1 = min(gt_traj.timestamps[-1], est_traj.timestamps[-1])
    times = [t for t in gt_traj.timestamps if t0 <= t <= t1]
    gt = gt_traj.pose_at_times(times)
    est = est_traj.pose_at_times(times)
    return compute_rmse(gt, est), gt, est
