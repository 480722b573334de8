"""RadarSlamSystem — the user-facing driver (replaces `RawROAMSystem.py:20-298`).

Host responsibilities only: PNG decode (double-buffered prefetch thread),
feeding frames to the jitted device step, recording the trajectory, metrics and
checkpoints.  All per-frame compute is `frontend.slam_step`, compiled once.

Usage:
    sys = RadarSlamSystem("tiny", data_root="/root/reference/data")
    result = sys.run()
    print(result.rmse_vs_gt)
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial
from typing import Callable, List, Optional

import jax
import numpy as np

from radarslampy_tpu.config import DEFAULT_CONFIG, SlamConfig
from radarslampy_tpu.io import oxford
from radarslampy_tpu.models import frontend
from radarslampy_tpu.models.trajectory import Trajectory, align_and_rmse
from radarslampy_tpu.ops.grid import build_grid_maps


@dataclasses.dataclass
class RunResult:
    trajectory: Trajectory
    gt_trajectory: Optional[Trajectory]
    rmse_vs_gt: Optional[float]
    n_keyframes: int
    frames: int
    seconds: float
    fps: float
    final_state: frontend.SlamState


class _Prefetcher:
    """Background PNG decode + host->device upload overlap (SURVEY.md §7:
    'the pipeline is I/O-bound before it is compute-bound')."""

    def __init__(self, paths: List[str], cfg: SlamConfig, depth: int = 4):
        self._paths = paths
        self._cfg = cfg
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        for p in self._paths:
            frame = oxford.decode_radar_png(p, self._cfg)
            self._q.put(frame)
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item


class RadarSlamSystem:
    def __init__(
        self,
        sequence: str,
        data_root: str = "data",
        cfg: SlamConfig = DEFAULT_CONFIG,
        progress: Optional[Callable[[int, frontend.StepOutput], None]] = None,
    ):
        self.cfg = cfg
        self.sequence = sequence
        self.paths = oxford.sequence_paths(data_root, sequence)
        self.img_paths = oxford.radar_image_paths(
            self.paths["radar"], self.paths["timestamps"]
        )
        self.maps = build_grid_maps(cfg)
        self.progress = progress

        self._init_fn = jax.jit(
            partial(frontend.init_state, maps=self.maps, cfg=cfg)
        )
        self._step_fn = jax.jit(
            partial(frontend.slam_step, maps=self.maps, cfg=cfg),
            donate_argnums=(0,),
        )

        # ground truth (optional — bench sequences may not ship one)
        self.gt_traj: Optional[Trajectory] = None
        try:
            stamps, poses, _ = oxford.load_gt_trajectory(self.paths["gt"])
            self.gt_traj = Trajectory(stamps, poses)
        except (OSError, ValueError):
            pass

    def initial_pose(self, timestamp: int) -> np.ndarray:
        if self.gt_traj is not None:
            return np.asarray(self.gt_traj.pose_at_times(timestamp))
        return np.zeros(3)

    def run(self, start: int = 0, end: int = -1, warm_state=None) -> RunResult:
        paths = self.img_paths
        if end < 0:
            end = len(paths) - 1
        assert 0 <= start <= end < len(paths)

        frames = _Prefetcher(paths[start : end + 1], self.cfg)
        it = iter(frames)
        first = next(it)

        state = self._init_fn(first.power, self.initial_pose(first.frame_timestamp))
        est = Trajectory()
        est.append(first.frame_timestamp, np.asarray(state.pose))

        t0 = time.perf_counter()
        n = 0
        for frame in it:
            state, out = self._step_fn(state, frame.power)
            est.append(frame.frame_timestamp, np.asarray(out.pose))
            n += 1
            if self.progress is not None:
                self.progress(n, out)
        jax.block_until_ready(state.pose)
        dt = time.perf_counter() - t0

        rmse = None
        if self.gt_traj is not None and len(est.timestamps) > 1:
            rmse, _, _ = align_and_rmse(self.gt_traj, est)
        return RunResult(
            trajectory=est,
            gt_trajectory=self.gt_traj,
            rmse_vs_gt=rmse,
            n_keyframes=int(state.map.cursor),
            frames=n + 1,
            seconds=dt,
            fps=n / dt if dt > 0 else float("inf"),
            final_state=state,
        )
