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
import functools
import os
import queue
import threading
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from radarslampy_tpu.config import DEFAULT_CONFIG, SlamConfig
from radarslampy_tpu.io import oxford
from radarslampy_tpu.models import frontend
from radarslampy_tpu.models.trajectory import Trajectory, align_and_rmse
from radarslampy_tpu.models.frontend import build_frame_maps


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
    # backend (loop closure + pose graph), present when run(optimize=True)
    n_loop_closures: int = 0
    # loops found by ONLINE backend passes (run(backend_every=N))
    n_online_loops: int = 0
    kf_poses_optimized: Optional[np.ndarray] = None
    posegraph_cost: Optional[float] = None
    # bundle adjustment (run(optimize=True, ba=True))
    kf_poses_ba: Optional[np.ndarray] = None
    landmarks_ba: Optional[np.ndarray] = None
    ba_cost: Optional[float] = None
    # per-run health (failure detection the reference lacks, SURVEY.md §5.3):
    # frames where the rigid fit degenerated (fell back to the SVD pose) and
    # the worst per-frame inlier count — a collapsing track is the SLAM
    # failure mode worth alerting on.
    n_fit_failures: int = 0
    min_inliers: int = 0


class _Prefetcher:
    """Background PNG decode + host->device upload overlap (SURVEY.md §7:
    'the pipeline is I/O-bound before it is compute-bound').

    A pool of decode workers (PIL releases the GIL during inflate) feeds an
    in-order reassembly queue, so the device never waits on a single-threaded
    ~24 ms/frame decode."""

    def __init__(self, paths: List[str], cfg: SlamConfig, depth: int = 8,
                 workers: int = 4, raw_u8: bool = False):
        self._paths = paths
        self._cfg = cfg
        self._raw_u8 = raw_u8
        self._results: dict = {}
        self._error: Optional[BaseException] = None
        self._lock = threading.Lock()
        self._ready = threading.Condition(self._lock)
        self._next_put = 0
        self._depth = depth
        self._workers = [
            threading.Thread(target=self._work, args=(w, workers), daemon=True)
            for w in range(min(workers, max(len(paths), 1)))
        ]
        for t in self._workers:
            t.start()

    def _work(self, offset: int, stride: int):
        # A decode exception must surface to the consumer: a silently-dead
        # worker would leave __iter__ waiting forever on the missing index
        # (VERDICT.md weak #6 — the reference-era hang this replaces).
        try:
            for i in range(offset, len(self._paths), stride):
                frame = oxford.decode_radar_png(self._paths[i], self._cfg,
                                                raw_u8=self._raw_u8)
                with self._ready:
                    while i - self._next_put > self._depth:
                        if self._error is not None:
                            return
                        self._ready.wait()
                    self._results[i] = frame
                    self._ready.notify_all()
        except BaseException as e:  # noqa: BLE001 — propagate everything
            with self._ready:
                if self._error is None:
                    self._error = e
                self._ready.notify_all()

    def __iter__(self):
        for i in range(len(self._paths)):
            with self._ready:
                while i not in self._results:
                    if self._error is not None:
                        raise IOError(
                            f"radar frame decode failed (frame {i})"
                        ) from self._error
                    self._ready.wait()
                frame = self._results.pop(i)
                self._next_put = i + 1
                self._ready.notify_all()
            yield frame


@functools.lru_cache(maxsize=8)
def _compiled_fns(cfg: SlamConfig):
    """Shared jitted entry points, cached per config.

    One compiled executable per SlamConfig for the whole process — a fresh
    jit wrapper per system instance would recompile the fused step (~30 s)
    on every run.  Maps are runtime jit arguments (constant index operands
    would push XLA's gathers onto a ~1000x slower path; see ops/routed_warp.py).
    """
    init_fn = jax.jit(
        lambda polar, pose, maps: frontend.init_state(polar, pose, maps, cfg)
    )
    step_fn = jax.jit(
        lambda state, polar, maps: frontend.slam_step(state, polar, maps, cfg),
        donate_argnums=(0,),
    )
    return init_fn, step_fn


@functools.lru_cache(maxsize=8)
def _compiled_row_step(cfg: SlamConfig):
    """slam_step variant that ALSO packs the per-frame scalars into one [8]
    row *inside* the compiled program: [x, y, theta, n_tracked, n_inliers,
    fit_ok, is_keyframe, did_retrack].

    The driver keeps only these rows between consolidations, so a full-length
    run holds O(frames/256) live device handles instead of ~8 per frame —
    the axon remote client wedges near ~1k live handles (VERDICT.md r03
    weak #5; same fix the eval chunk path got in round 3)."""
    import jax.numpy as jnp

    def step_row(state, polar, maps):
        s2, out = frontend.slam_step(state, polar, maps, cfg)
        f32 = out.pose.dtype
        row = jnp.concatenate([
            out.pose,
            jnp.stack([out.n_tracked.astype(f32), out.n_inliers.astype(f32),
                       out.fit_ok.astype(f32), out.is_keyframe.astype(f32),
                       out.did_retrack.astype(f32)]),
        ])
        return s2, out, row

    return jax.jit(step_row, donate_argnums=(0,))


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
        self.maps = build_frame_maps(cfg)
        self.progress = progress
        self._init_fn, self._step_fn = _compiled_fns(cfg)
        self._row_step_fn = _compiled_row_step(cfg)

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

    def optimize_map(self, state: frontend.SlamState, ba: bool = False):
        """Back-end pass over the finished map: loop closure + pose graph,
        optionally followed by Schur-complement bundle adjustment over the
        persistent landmarks.

        Replaces what the reference scaffolded but never ran
        (`PoseGraphLib.py:5-98` — both its pose graph AND its
        `BundleAdjustment` class, SURVEY.md §2#12).  Returns
        (pose-graph keyframe poses [M,3] or None, n_loop_closures, pg cost,
         ba keyframe poses or None, ba landmarks or None, ba cost or None).
        """
        from radarslampy_tpu.models.loopclosure import close_loops, trim_map_state
        from radarslampy_tpu.models.posegraph import optimize_pose_graph

        m = trim_map_state(jax.device_get(state.map))
        graph, matches = close_loops(m, self.cfg)
        n_loops = int(np.asarray(matches.ok).sum())
        M = int(np.asarray(m.cursor))
        kf_pg, pg_cost = (None, None)
        if n_loops > 0:
            poses, cost = optimize_pose_graph(graph, self.cfg)
            kf_pg, pg_cost = np.asarray(poses)[:M], float(cost)

        kf_ba, lm_ba, ba_cost = (None, None, None)
        if ba:
            from radarslampy_tpu.models.ba import build_ba_problem, optimize_ba

            if kf_pg is not None:
                # seed BA from the loop-corrected poses; world-space landmark
                # inits must be refreshed to match (they were anchored to the
                # drifted odometry poses)
                poses_new = np.asarray(m.poses).copy()
                poses_new[:M] = kf_pg
                c = np.cos(poses_new[:, 2])[:, None]
                s = np.sin(poses_new[:, 2])[:, None]
                local = np.asarray(m.feat_local)
                fw = np.stack(
                    [
                        c * local[..., 0] - s * local[..., 1] + poses_new[:, 0:1],
                        s * local[..., 0] + c * local[..., 1] + poses_new[:, 1:2],
                    ],
                    axis=-1,
                ) * np.asarray(m.feat_mask)[..., None]
                m = m._replace(
                    poses=jax.numpy.asarray(poses_new),
                    feat_world=jax.numpy.asarray(fw.astype(local.dtype)),
                )
            problem = build_ba_problem(m, min_views=2)
            if int(np.asarray(problem.lm_mask).sum()) > 0:
                poses_b, lms, cost_b = optimize_ba(problem, self.cfg)
                kf_ba = np.asarray(poses_b)[:M]
                lm_ba = np.asarray(lms)[np.asarray(problem.lm_mask)]
                ba_cost = float(cost_b)
        return kf_pg, n_loops, pg_cost, kf_ba, lm_ba, ba_cost

    @staticmethod
    def _write_metrics(path, start, stamps, rows, online_events):
        """Flush the per-frame JSONL metrics stream (SURVEY.md §5.5).

        `rows`: the fetched [n, 8] packed per-frame block (see
        `_compiled_row_step`)."""
        import json

        with open(path, "w") as f:
            for k, (ts, row) in enumerate(zip(stamps, rows)):
                nt, ni, ok, kf, rt = row[3:8]
                rec = {
                    "frame": start + k + 1,
                    "timestamp": int(ts),
                    "n_tracked": int(nt),
                    "n_inliers": int(ni),
                    "fit_ok": bool(ok),
                    "is_keyframe": bool(kf),
                    "did_retrack": bool(rt),
                }
                nl = online_events.get(start + k + 1)
                if nl:
                    rec["online_loops_closed"] = int(nl)
                f.write(json.dumps(rec) + "\n")

    def _state_template(self):
        """SlamState tree structure without running any compute (for
        checkpoint restore): eval_shape of the init program."""
        import jax.numpy as jnp

        polar = jax.ShapeDtypeStruct(
            (self.cfg.num_azimuths, self.cfg.polar_width_padded), jnp.uint8
        )
        return jax.eval_shape(
            lambda p: frontend.init_state(p, jnp.zeros(3), self.maps, self.cfg),
            polar,
        )

    def run(self, start: int = 0, end: int = -1, optimize: bool = False,
            ba: bool = False, checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 0,
            resume_from: Optional[str] = None,
            backend_every: int = 0,
            viz_dir: Optional[str] = None,
            viz_every: int = 3,
            metrics_path: Optional[str] = None,
            frame_source=None) -> RunResult:
        """Run the SLAM pipeline over frames [start, end].

        `metrics_path`: when set, a structured JSONL stream is written with
        one record per frame (frame index, timestamp, n_tracked, n_inliers,
        fit_ok, keyframe/retrack flags, online-backend loop counts) — the
        per-frame observability the reference only had as prints
        (SURVEY.md §5.5).  Per-frame scalars live on device as packed [8]
        rows, consolidated into [256, 8] blocks as the run goes (bounded
        live-handle count) and fetched ONCE at the end (mid-run D2H degrades
        remote dispatch).

        `resume_from`: directory written by a previous run's checkpoint —
        restores the full SlamState + trajectory and continues from the frame
        after the checkpoint (replaces-and-beats the reference's npz feature
        snapshots, `getTransformKLT.py:405-425`).  `start` is taken from the
        checkpoint metadata.

        `backend_every`: frames between ONLINE loop-closure + pose-graph
        passes whose corrections are fed back into the running state
        (models/loopclosure.incremental_backend); 0 = post-hoc only.  Each
        pass costs one device fetch — on the axon remote-TPU client that
        degrades subsequent dispatch, so meant for long offline runs.

        `viz_dir`: when set, a tracked-features + trajectory composite is
        saved every `viz_every` frames and assembled into run.mp4 at the end
        (the reference's every-3rd-frame figure + ffmpeg export,
        RawROAMSystem.py:273-294,493-516).  Host-side, but each figure costs
        a device fetch — same axon caveat as backend_every.
        """
        paths = self.img_paths
        resumed_state = None
        est = Trajectory()
        if resume_from is not None:
            from radarslampy_tpu.utils.checkpoint import load_meta, load_state

            meta = load_meta(resume_from)
            if "next_frame_index" not in meta:
                raise ValueError(
                    f"checkpoint at {resume_from} has no 'next_frame_index' "
                    f"metadata — written by an older/incompatible build "
                    f"(ADVICE.md r02 #2)"
                )
            start = int(meta["next_frame_index"])
            resumed_state, traj = load_state(resume_from, self._state_template())
            resumed_state = jax.device_put(resumed_state)
            if traj is not None:
                for ts, pose in zip(*traj):
                    est.append(int(ts), np.asarray(pose))
        if end < 0:
            end = len(paths) - 1 if frame_source is None else start
        if resume_from is not None and start > end:
            raise ValueError(
                f"checkpoint already covers frames through {start - 1}; "
                f"nothing to resume (end={end})"
            )
        if frame_source is None:
            assert 0 <= start <= end < len(paths)

        window = paths[start : end + 1]
        if frame_source is not None:
            # caller-supplied iterable of frames (objects with .power and
            # .frame_timestamp) — synthetic long-run testing without PNGs
            frames = frame_source
        else:
            try:  # native C++ decode pool (io/native/) — GIL-free, ~3x faster
                from radarslampy_tpu.io.native_loader import (
                    NativeLoader, native_available,
                )

                frames = (NativeLoader(window, self.cfg, raw_u8=True)
                          if native_available() else None)
            except Exception:
                frames = None
            if frames is None:
                # raw u8 power: dequantised on device (_dequantize_polar)
                frames = _Prefetcher(window, self.cfg, raw_u8=True)
        it = iter(frames)
        if resumed_state is not None:
            state = resumed_state
        else:
            first = next(it)
            init_pose = self.initial_pose(first.frame_timestamp)
            state = self._init_fn(first.power, init_pose, self.maps)
            # host-side copy of the init pose: a device readback here would
            # poison remote-TPU (axon) dispatch into a synchronous slow path
            # for the rest of the process (measured 25x dispatch degradation
            # after any D2H).
            est.append(first.frame_timestamp, init_pose)
        last_abs = start if resumed_state is None else start - 1

        # keep the device pipeline busy: poses stay on device during the loop
        # (each np.asarray would be a blocking transfer) and are fetched after.
        # fps excludes first-step compile: time starts after the first step
        # completes on device.
        t0 = time.perf_counter()
        n = 0
        n_online_loops = 0
        backend_state = None
        stamps: List[int] = []
        online_events = {}
        viz_poses: List[np.ndarray] = []
        viz_stamps: List[int] = []

        # per-frame [8] rows are consolidated into one [256, 8] device block
        # every 256 frames: live handles stay O(frames/256), under the axon
        # client's ~1k-live-handle wedge across a full 8.8k-frame sequence
        # (VERDICT.md r03 weak #5).  The consolidating stack is also the
        # periodic device sync that bounds the async dispatch queue.
        CONSOL = 256
        import jax.numpy as jnp

        row_blocks: List = []       # [*, 8] device blocks
        pending_rows: List = []     # [8] device rows since last consolidation

        def _consolidate(block_until=False):
            if pending_rows:
                row_blocks.append(jnp.stack(pending_rows))
                pending_rows.clear()
                if block_until:
                    jax.block_until_ready(row_blocks[-1])

        def _fetch_rows():
            _consolidate()
            if not row_blocks:
                return np.zeros((0, 8), np.float32)
            return np.concatenate(
                [np.asarray(b) for b in jax.device_get(row_blocks)]
            )

        for frame in it:
            state, out, row = self._row_step_fn(state, frame.power, self.maps)
            stamps.append(frame.frame_timestamp)
            pending_rows.append(row)
            if len(pending_rows) >= CONSOL:
                _consolidate(block_until=True)
            n += 1
            last_abs += 1
            if n == 1:
                jax.block_until_ready(row)
                t0 = time.perf_counter()
            if self.progress is not None:
                self.progress(n, out)
            if backend_every and n % backend_every == 0:
                from radarslampy_tpu.models.loopclosure import incremental_backend

                state, nl, _, backend_state = incremental_backend(
                    state, self.cfg, backend_state=backend_state
                )
                n_online_loops += nl
                if nl:
                    online_events[start + n] = nl
            if viz_dir and viz_every and n % viz_every == 0:
                from radarslampy_tpu.viz.plots import plot_frame_composite

                os.makedirs(viz_dir, exist_ok=True)
                viz_poses.append(np.asarray(jax.device_get(out.pose)))
                # GT sampled at the SAME frames the estimated poses were
                # captured at (this frame's timestamp), not stamps[::v] which
                # is offset by one frame (ADVICE.md r02 #3)
                viz_stamps.append(frame.frame_timestamp)
                est_xy = np.stack(viz_poses)[:, :2]
                gt_xy = None
                if self.gt_traj is not None:
                    gt_xy = np.asarray(
                        self.gt_traj.pose_at_times(viz_stamps)
                    )[:, :2]
                plot_frame_composite(
                    np.asarray(jax.device_get(state.prev_cart)),
                    np.asarray(jax.device_get(state.feat_px)),
                    np.asarray(jax.device_get(state.feat_mask)),
                    gt_xy, est_xy,
                    os.path.join(viz_dir, f"frame_{start + n:06d}.jpg"),
                    title=f"frame {start + n}",
                )
            if checkpoint_dir and checkpoint_every and n % checkpoint_every == 0:
                # NOTE: checkpointing forces a device fetch mid-run; on the
                # axon remote-TPU client this degrades subsequent dispatch —
                # intended for long offline runs where durability wins.
                from radarslampy_tpu.utils.checkpoint import save_state

                partial = Trajectory()
                for ts, pose in zip(est.as_arrays()[0], est.as_arrays()[1]):
                    partial.append(int(ts), np.asarray(pose))
                for ts, pose in zip(stamps, _fetch_rows()[:, :3]):
                    partial.append(ts, pose)
                save_state(checkpoint_dir, jax.device_get(state), partial,
                           meta={"next_frame_index": last_abs + 1})
        jax.block_until_ready(state.pose)
        dt = time.perf_counter() - t0
        rows = _fetch_rows()           # ONE bulk fetch of all per-frame data
        for ts, pose in zip(stamps, rows[:, :3]):
            est.append(ts, pose)
        if metrics_path:
            self._write_metrics(metrics_path, start, stamps, rows,
                                online_events)
        inlier_counts = (rows[:, 4].astype(int) if len(rows)
                         else np.array([0]))
        n_fit_failures = int(np.sum(rows[:, 5] == 0.0)) if len(rows) else 0

        rmse = None
        if self.gt_traj is not None and len(est.timestamps) > 1:
            rmse, _, _ = align_and_rmse(self.gt_traj, est)

        kf_opt, n_loops, pg_cost = (None, 0, None)
        kf_ba, lm_ba, ba_cost = (None, None, None)
        if optimize or ba:
            kf_opt, n_loops, pg_cost, kf_ba, lm_ba, ba_cost = self.optimize_map(
                state, ba=ba
            )

        if checkpoint_dir:
            from radarslampy_tpu.utils.checkpoint import save_state

            save_state(checkpoint_dir, jax.device_get(state), est,
                       meta={"next_frame_index": last_abs + 1})

        if viz_dir:
            # end-of-run artifacts: global map scatter + mp4 assembly
            # (RawROAMSystem.py:493-516; Map.plot, Mapping.py:184-206)
            from radarslampy_tpu.viz.plots import frames_to_mp4, plot_map

            frames_to_mp4(viz_dir, os.path.join(viz_dir, "run.mp4"))
            m = jax.device_get(state.map)
            _, est_poses = est.as_arrays()
            plot_map(
                np.asarray(m.feat_world).reshape(-1, 2),
                np.asarray(m.feat_mask).reshape(-1),
                est_poses=np.asarray(est_poses),
                save_path=os.path.join(viz_dir, "map.png"),
            )

        return RunResult(
            trajectory=est,
            gt_trajectory=self.gt_traj,
            rmse_vs_gt=rmse,
            n_keyframes=int(state.map.cursor),
            frames=n + (0 if resumed_state is not None else 1),
            seconds=dt,
            fps=(n - 1) / dt if dt > 0 and n > 1 else float("inf"),
            final_state=state,
            n_loop_closures=n_loops,
            n_online_loops=n_online_loops,
            kf_poses_optimized=kf_opt,
            posegraph_cost=pg_cost,
            kf_poses_ba=kf_ba,
            landmarks_ba=lm_ba,
            ba_cost=ba_cost,
            n_fit_failures=n_fit_failures,
            min_inliers=int(inlier_counts.min()),
        )
