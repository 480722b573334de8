"""Long-sequence evaluation harness on synthetic scans along real GT motion.

full_seq_1 ships its ground-truth odometry but not its radar images
(BASELINE.md; only data/tiny has PNGs), so large-scale end-to-end validation
renders synthetic scans from a landmark world along the *real* full_seq_1
trajectory (io.oxford.load_gt_trajectory) — real vehicle dynamics, exact
ground truth, arbitrary length.

`evaluate_sequence` runs the full device pipeline over the rendered frames and
reports odometry ATE; optionally runs loop-closure + pose-graph optimisation
and reports the corrected keyframe ATE as well.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.io import oxford
from radarslampy_tpu.models.trajectory import compute_rmse


@dataclasses.dataclass
class EvalResult:
    frames: int
    fps: float
    ate_odometry: float
    n_keyframes: int
    n_loop_closures: int = 0
    n_online_loops: int = 0
    ate_keyframes_before: Optional[float] = None
    ate_keyframes_after: Optional[float] = None
    ate_keyframes_after_ba: Optional[float] = None
    n_ba_landmarks: int = 0
    n_ba_observations: int = 0
    # per-frame health aggregates (chunked path)
    mean_inliers: Optional[float] = None
    frac_fit_ok: Optional[float] = None
    n_retracks: int = 0
    final_state: object = None       # SlamState when return_state=True
    est_frames: Optional[np.ndarray] = None
    gt_keyframes: Optional[np.ndarray] = None
    # loop-edge measurement quality vs GT (frame-indexed): separates
    # bad-edges from bad-solver when the backend underperforms
    loop_edge_err_median: Optional[float] = None
    loop_edge_err_p90: Optional[float] = None
    n_loop_edges_bad: int = 0        # edges whose translation error > 1 m
    backend_error: Optional[str] = None  # backend/BA crash salvaged (results
                                         # up to the crash point are kept)
    # drift diagnostics (VERDICT.md r04 next #4): ATE alone cannot separate a
    # heading random walk from translation noise; KITTI-style RPE/100 m and
    # heading-error growth can
    rpe_trans_pct: Optional[float] = None      # mean rel. transl. err, % of 100 m
    rpe_rot_deg_100m: Optional[float] = None   # mean rel. rot. err, deg / 100 m
    heading_rmse_deg: Optional[float] = None   # absolute heading error RMSE


def compute_rpe(poses_gt: np.ndarray, est: np.ndarray, seg_m: float = 100.0,
                stride: int = 10):
    """KITTI-style relative pose error over ~`seg_m`-long GT path segments.

    Returns (translation error as % of segment length, rotation error in
    deg/100 m), averaged over segment starts every `stride` frames — the
    drift-RATE metrics ATE hides (a single early heading error dominates ATE
    but contributes one sample here).
    """
    d = np.linalg.norm(np.diff(poses_gt[:, :2], axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(d)])
    errs_t, errs_r = [], []
    for i in range(0, len(poses_gt) - 1, stride):
        j = int(np.searchsorted(cum, cum[i] + seg_m))
        if j >= len(poses_gt):
            break
        seg = cum[j] - cum[i]
        if seg <= 1.0:
            continue

        def rel(p, i=i, j=j):
            dd = p[j, :2] - p[i, :2]
            c, s = np.cos(p[i, 2]), np.sin(p[i, 2])
            return np.array(
                [c * dd[0] + s * dd[1], -s * dd[0] + c * dd[1],
                 (p[j, 2] - p[i, 2] + np.pi) % (2 * np.pi) - np.pi]
            )

        rg, re = rel(poses_gt), rel(est)
        errs_t.append(np.linalg.norm(re[:2] - rg[:2]) / seg)
        dth = (re[2] - rg[2] + np.pi) % (2 * np.pi) - np.pi
        errs_r.append(abs(dth) / seg * 100.0)
    if not errs_t:
        return None, None
    return (float(np.mean(errs_t) * 100.0),
            float(np.degrees(np.mean(errs_r))))


def gt_subsequence(gt_csv: str, start: int, count: int, stride: int = 1):
    """[count, 3] poses from a real GT odometry csv, re-anchored to the origin."""
    _, poses, _ = oxford.load_gt_trajectory(gt_csv)
    seg = poses[start : start + count * stride : stride].copy()
    # re-anchor: first pose at origin, heading 0
    x0, y0, th0 = seg[0]
    c, s = np.cos(-th0), np.sin(-th0)
    xy = seg[:, :2] - (x0, y0)
    seg[:, 0] = c * xy[:, 0] - s * xy[:, 1]
    seg[:, 1] = s * xy[:, 0] + c * xy[:, 1]
    seg[:, 2] = (seg[:, 2] - th0 + np.pi) % (2 * np.pi) - np.pi
    return seg


def make_eval_chunk(cfg: SlamConfig, noise: float, k_vis: int = 512,
                    renderer: str = "max", quantize: bool = True,
                    fusion_barrier: bool = True):
    """One jitted program: render F synthetic scans ON DEVICE and run the
    fused SLAM step on each — a chunk dispatch ships only [F,3] GT poses,
    [F,3] velocities, [F] frame ids and a [F] validity mask.

    Padded tail frames (`valid[i]=False`) are lax.cond passthroughs: no
    render, no step, state unchanged — so ANY sequence length runs under one
    compiled program (no per-frame fallback compile; VERDICT.md weak #7).

    Noise keys fold in the *absolute* frame index, so the rendered sequence
    is identical for any chunking of the same seed (tested).

    Returns (state, packed [F, 6] float32): columns are [x, y, theta,
    n_inliers, fit_ok, did_retrack].  ONE output handle per dispatch: the
    axon remote client wedges after ~1k live handle creations, and a full
    8.8k-frame run at 64-frame chunks is 138 dispatches — 9 stacked
    StepOutput leaves each would cross that limit (the round-2 stall's
    second ingredient besides input-byte retention).
    """
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.sim.render_device import (
        quantize_u8,
        render_polar_scan_device,
    )

    def chunk_fn(state, poses_f, vels_f, frame_ids, valid, key, wp, wr, maps):
        def body(s, xs):
            pose, vel, fid, ok = xs

            def do(s_):
                k = jax.random.fold_in(key, fid)
                scan = render_polar_scan_device(
                    wp, wr, pose, vel, k, cfg, noise=noise, k_vis=k_vis,
                    mode=renderer,
                )
                # u8 quantisation mimics the real PNG ingestion path;
                # quantize=False is the float A/B for the drift analysis
                # (u8_exp r04: chunked-u8 15.74 m vs per-frame float 12.13 m
                # confounded TWO variables — this isolates one)
                scan_in = quantize_u8(scan) if quantize else scan
                # Fusion isolation (r05): standalone-compiled, the renderer
                # is bit-clean CPU-vs-TPU at the u8 boundary
                # (RENDER_DIFF_r05), yet the fused render->step scan program
                # drifts 6x worse than the same program fed host-rendered u8
                # scans (HOSTRENDER_TPU_r05 9.1 m vs 57.6 m at 1100 frames).
                # The barrier forces XLA to materialise the quantised scan
                # between the two stages instead of cross-fusing renderer
                # arithmetic into the step — reproducing, inside one
                # program, exactly the host-render boundary measured clean.
                if fusion_barrier:
                    scan_in = jax.lax.optimization_barrier(scan_in)
                return frontend.slam_step(s_, scan_in, maps, cfg)

            def skip(s_):
                f32 = s_.pose.dtype
                out = frontend.StepOutput(
                    pose=s_.pose,
                    velocity=s_.velocity,
                    n_tracked=jnp.int32(0),
                    n_inliers=jnp.int32(0),
                    is_keyframe=jnp.asarray(False),
                    did_retrack=jnp.asarray(False),
                    fmt_rotation=jnp.zeros((), f32),
                    fit_ok=jnp.asarray(False),
                    fmt_scale=jnp.ones((), f32),
                )
                return s_, out

            s2, out = jax.lax.cond(ok, do, skip, s)
            f32 = s2.pose.dtype
            packed = jnp.concatenate([
                out.pose,
                jnp.stack([out.n_inliers.astype(f32),
                           out.fit_ok.astype(f32),
                           out.did_retrack.astype(f32)]),
            ])
            return s2, packed

        return jax.lax.scan(body, state, (poses_f, vels_f, frame_ids, valid))

    return jax.jit(chunk_fn, donate_argnums=(0,))


def evaluate_sequence(
    poses_gt: np.ndarray,
    cfg: SlamConfig,
    seed: int = 0,
    n_landmarks_per_km2: float = 400.0,
    run_backend: bool = False,
    run_ba: bool = False,
    noise: float = 0.02,
    progress_every: int = 0,
    return_state: bool = False,
    world: str = "corridor",
    landmarks_per_scan: float = 80.0,
    backend_every: int = 0,
    chunk_frames: int = 0,
    device_render: bool = True,
    consolidate_every: int = 16,
    renderer: str = "max",
    partial_write=None,
    sync_every: int = 1,
    quantize: bool = True,
    fusion_barrier: bool = True,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 2048,
    resume: bool = False,
):
    """Render scans along poses_gt, run SLAM, report ATE (+backend ATE).

    `backend_every`: frames between ONLINE loop-closure + pose-graph passes
    fed back into the running state (0 = off); the final post-hoc backend
    still runs when `run_backend` so before/after keyframe ATE is reported
    on the (possibly mid-run-corrected) map.

    `chunk_frames`: >0 fuses F frames per device dispatch.  With
    `device_render` (default) the scans are rendered *inside* the chunk
    program (sim.render_device) so a dispatch ships only that chunk's GT
    poses/velocities (~1.5 KB) — the fix for the round-2 full-sequence stall,
    where 52 MB/dispatch host-rendered scan blocks accumulated in the axon
    client's per-dispatch input retention and froze the run near frame 8,000
    (VERDICT.md missing #1).  A short tail is padded to a full chunk with
    masked frames (lax.cond passthrough), so there is exactly ONE compiled
    chunk program per run (VERDICT.md weak #7).  `device_render=False` keeps
    the legacy host-rendered `slam_step_chunk` path.
    """
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    # run_ba implies the backend (BA consumes the trimmed map + pose-graph
    # poses); a direct caller passing run_ba without run_backend previously
    # got a silent no-op (ADVICE.md r03 #1)
    run_backend = run_backend or run_ba

    rng = np.random.default_rng(seed)
    maps = build_frame_maps(cfg)

    if world == "corridor":
        # density follows the route, so per-scan landmark visibility stays
        # ~constant however long/thin the trajectory is (full_seq_1 is 9 km
        # inside a 2.4 km box — a uniform box world starves every scan there)
        world_pts, world_refl = fd.make_world_corridor(
            rng, poses_gt, cfg.max_range_clip_m, per_scan=landmarks_per_scan
        )
    else:
        span = poses_gt[:, :2]
        extent = float(np.abs(span).max() + cfg.max_range_clip_m)
        area_km2 = (2 * extent / 1000.0) ** 2
        n_landmarks = max(800, int(area_km2 * n_landmarks_per_km2))
        world_pts, world_refl = fd.make_world(rng, n_landmarks, extent)

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(
        lambda s, p, m: frontend.slam_step(s, p, m, cfg), donate_argnums=(0,)
    )

    period = cfg.scan_period_s

    def render(t):
        if t > 0:
            dp = poses_gt[t] - poses_gt[t - 1]
            c, s = np.cos(poses_gt[t][2]), np.sin(poses_gt[t][2])
            vel = np.array(
                [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1], dp[2]]
            ) / period
        else:
            vel = np.zeros(3)
        # mode=renderer: the host A/B paths must render the SAME blob
        # composition the artifact records (ADVICE.md r04 #1 — --host-render
        # --renderer sum previously rendered max silently)
        return fd.render_polar_scan(
            world_pts, world_refl, poses_gt[t], cfg, velocity=vel, rng=rng,
            noise=noise, mode=renderer,
        )

    T = len(poses_gt)
    state = init(jnp.asarray(render(0)), maps)
    device_poses = []
    n_online_loops = 0
    backend_state = None
    health = None
    fps_base = 1          # first frame index processed THIS process (resume)
    t0 = time.perf_counter()
    if chunk_frames > 0 and device_render:
        from radarslampy_tpu.models.loopclosure import incremental_backend

        # per-frame body velocities in the body frame (same math as render())
        vels = np.zeros((T, 3), np.float32)
        if T > 1:
            dp = np.diff(poses_gt, axis=0)
            cth = np.cos(poses_gt[1:, 2])
            sth = np.sin(poses_gt[1:, 2])
            vels[1:, 0] = (cth * dp[:, 0] + sth * dp[:, 1]) / period
            vels[1:, 1] = (-sth * dp[:, 0] + cth * dp[:, 1]) / period
            vels[1:, 2] = dp[:, 2] / period

        wp = jnp.asarray(world_pts, jnp.float32)
        wr = jnp.asarray(world_refl, jnp.float32)
        key = jax.random.PRNGKey(seed)
        chunk = make_eval_chunk(cfg, noise=noise, renderer=renderer,
                                quantize=quantize,
                                fusion_barrier=fusion_barrier)
        # one tiny D2H before the loop: the axon remote client's FIRST
        # device fetch after a long async run can wedge indefinitely
        # (observed on the 8.8k-frame run); an early fetch switches the
        # client into its (slower but reliable) synchronous-fetch mode.
        np.asarray(state.pose)

        chunk_packed = []  # [F,6] DEVICE arrays; fetched in bulk after the run
        chunk_valid = []
        # Every CONSOLIDATE chunks, stack the pending [F,6] blocks into one
        # [k,F,6] device array: live client handles stay O(T/(F*k)) instead of
        # O(T/F).  The axon remote client wedges after ~32 eval-chunk dispatch
        # cycles' worth of accumulated handles (project memory / verify
        # skill), which a full 8.8k-frame run exceeds at chunk sizes <512.
        CONSOLIDATE = max(1, consolidate_every)
        groups = []  # [k,F,6] consolidated DEVICE stacks
        # Results already fetched to host (at a checkpoint, or loaded on
        # resume): [F,6] numpy blocks + their valid counts, strictly BEFORE
        # everything still on device in frame order.
        host_flat: list = []
        host_valid: list = []
        F = chunk_frames
        t = 1

        def _drain_to_host():
            """Fetch all pending device result blocks to the host lists (one
            bulk sync point — used at checkpoints)."""
            nonlocal chunk_packed, groups
            for g in jax.device_get(groups):
                host_flat.extend(np.asarray(g))
            host_flat.extend(jax.device_get(chunk_packed))
            host_valid.extend(chunk_valid)
            chunk_valid.clear()
            chunk_packed = []
            groups = []

        def _write_ckpt(next_t):
            """Persist everything a resume needs: SlamState, fetched result
            blocks, accumulated backend edges, cursors.  A mid-run TPU fault
            then costs minutes, not the run (VERDICT.md r04: both full-seq
            attempts died with zero artifact because this didn't exist)."""
            from radarslampy_tpu.utils.checkpoint import save_state

            _drain_to_host()
            save_state(ckpt_dir, jax.device_get(state), meta={
                "next_t": int(next_t),
                "n_online_loops": int(n_online_loops),
                "seed": int(seed),
                "count": int(T),
                "chunk_frames": int(F),
                "renderer": renderer,
                "quantize": bool(quantize),
                "backend_prev_cursor": (int(backend_state.prev_cursor)
                                        if backend_state is not None else 0),
            })
            np.savez(
                f"{ckpt_dir}/eval_results.npz",
                blocks=(np.stack(host_flat) if host_flat
                        else np.zeros((0, F, 6), np.float32)),
                valid=np.asarray(host_valid, np.int64),
                edges_ij=(backend_state.edges_ij if backend_state is not None
                          else np.zeros((0, 2), np.int32)),
                edges_meas=(backend_state.edges_meas
                            if backend_state is not None
                            else np.zeros((0, 3), np.float32)),
            )

        if resume and ckpt_dir is not None:
            import os

            from radarslampy_tpu.models.loopclosure import BackendState
            from radarslampy_tpu.utils.checkpoint import load_meta, load_state

            if os.path.exists(f"{ckpt_dir}/treedef.json"):
                meta = load_meta(ckpt_dir)
                if (meta.get("count") != T or meta.get("seed") != seed
                        or meta.get("chunk_frames") != F
                        or meta.get("renderer") != renderer
                        or meta.get("quantize", True) != quantize):
                    raise ValueError(
                        f"checkpoint at {ckpt_dir} was written by a different "
                        f"run configuration ({meta}) — refusing to resume")
                loaded, _ = load_state(ckpt_dir, jax.device_get(state))
                state = jax.tree_util.tree_map(jnp.asarray, loaded)
                rz = np.load(f"{ckpt_dir}/eval_results.npz")
                host_flat = list(rz["blocks"])
                host_valid = list(rz["valid"])
                t = int(meta["next_t"])
                n_online_loops = int(meta["n_online_loops"])
                if backend_every:
                    backend_state = BackendState(
                        prev_cursor=int(meta["backend_prev_cursor"]),
                        edges_ij=rz["edges_ij"],
                        edges_meas=rz["edges_meas"],
                    )
                if progress_every:
                    print(f"  resumed from {ckpt_dir} at frame {t}/{T} "
                          f"({len(host_flat)} result blocks, "
                          f"{n_online_loops} online loops)", flush=True)

        fps_base = t
        last_ckpt_t = t
        while t < T:
            n = min(F, T - t)
            pv = np.zeros((F, 3), np.float32)
            vv = np.zeros((F, 3), np.float32)
            valid = np.zeros(F, bool)
            pv[:n] = poses_gt[t : t + n]
            vv[:n] = vels[t : t + n]
            valid[:n] = True
            fid = np.minimum(np.arange(t, t + F), T - 1).astype(np.int32)
            tc0 = time.perf_counter()
            state, packed = chunk(state, jnp.asarray(pv), jnp.asarray(vv),
                                  jnp.asarray(fid), jnp.asarray(valid), key,
                                  wp, wr, maps)
            # device sync only — NO per-chunk D2H (mid-run fetches both
            # degrade remote dispatch ~25x and have been observed to hang).
            # sync_every>1 (or 0 = never) skips the per-chunk block: on the
            # axon remote client block_until_ready's poll backoff can charge
            # a long constant slack per blocked dispatch (458 ms/frame
            # observed INDEPENDENT of program content — r4 finding), so
            # letting chunks queue async and blocking rarely recovers the
            # true device rate.  Health caveat: per-chunk ms/frame prints
            # measure wall between syncs, not device time, in that mode.
            n_chunk = len(chunk_valid)
            if sync_every and (n_chunk % sync_every == 0):
                jax.block_until_ready(packed)
            elif not sync_every and n_chunk % 64 == 63:
                # backstop even at --sync-every 0: the client buffers every
                # pending dispatch's inputs, so the queue needs SOME bound
                # (ADVICE.md r04 #3)
                jax.block_until_ready(packed)
            tc1 = time.perf_counter()
            chunk_packed.append(packed)
            chunk_valid.append(n)
            if len(chunk_packed) >= CONSOLIDATE:
                groups.append(jnp.stack(chunk_packed))
                chunk_packed = []
            t += n
            if backend_every and (t - 1) % backend_every < n:
                state, nl, _, backend_state = incremental_backend(
                    state, cfg, backend_state=backend_state
                )
                n_online_loops += nl
            if progress_every and (t // progress_every) != ((t - n) // progress_every):
                print(f"  frame {t}/{T}  "
                      f"({(tc1 - tc0) / n * 1e3:.1f} ms/frame device wall)",
                      flush=True)
            if ckpt_dir is not None and (t - last_ckpt_t) >= ckpt_every \
                    and t < T:
                _write_ckpt(t)
                last_ckpt_t = t
                if progress_every:
                    print(f"  checkpoint written at frame {t} -> {ckpt_dir}",
                          flush=True)
        # bulk fetch of all per-chunk packed blocks (one sync point);
        # host blocks (checkpoint drains / resume) come first in frame order
        stats_inl, stats_ok, stats_rt = [], [], []
        all_valid = host_valid + chunk_valid
        flat = list(host_flat)
        flat.extend(b for g in jax.device_get(groups) for b in np.asarray(g))
        flat.extend(jax.device_get(chunk_packed))
        for block, n in zip(flat, all_valid):
            block = np.asarray(block)[:n]
            device_poses.extend(block[:, :3])
            stats_inl.extend(block[:, 3])
            stats_ok.extend(block[:, 4])
            stats_rt.extend(block[:, 5])
        if stats_inl:  # T == 1 -> no steps, no health (ADVICE.md r03 #3)
            health = (float(np.mean(stats_inl)), float(np.mean(stats_ok)),
                      int(np.sum(stats_rt)))
    elif chunk_frames > 0:
        chunk = jax.jit(
            lambda s, ps, m: frontend.slam_step_chunk(s, ps, m, cfg),
            donate_argnums=(0,),
        )
        def to_u8(x):
            # u8 quantisation = the real PNG ingestion path (u8/255 decode)
            return np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)

        t = 1
        while t < T:
            F = min(chunk_frames, T - t)
            if F == chunk_frames:
                block = np.stack([to_u8(render(t + k)) for k in range(F)])
                state, outs = chunk(state, jnp.asarray(block), maps)
                jax.block_until_ready(outs.pose)
                device_poses.extend(outs.pose[:F])
            else:
                # tail shorter than a chunk: per-frame steps (one extra
                # compile, no padded fake frames polluting the map)
                for k in range(F):
                    state, out = step(state, jnp.asarray(to_u8(render(t + k))),
                                      maps)
                    device_poses.append(out.pose)
                jax.block_until_ready(device_poses[-1])
            t += F
            if backend_every and (t - 1) % backend_every < F:
                from radarslampy_tpu.models.loopclosure import incremental_backend

                state, nl, _, backend_state = incremental_backend(
                    state, cfg, backend_state=backend_state
                )
                n_online_loops += nl
            if progress_every and (t // progress_every) != ((t - F) // progress_every):
                print(f"  frame {t}/{T}", flush=True)
    else:
        for t in range(1, T):
            state, out = step(state, jnp.asarray(render(t)), maps)
            device_poses.append(out.pose)
            if t % 256 == 0:
                # bound the async dispatch queue: the axon remote client
                # buffers every pending execution's inputs — an unbounded
                # queue grows to ~50 GB host RSS.  A device sync is NOT a
                # D2H transfer, so it doesn't poison dispatch.
                jax.block_until_ready(out.pose)
            if backend_every and t % backend_every == 0:
                from radarslampy_tpu.models.loopclosure import incremental_backend

                state, nl, _, backend_state = incremental_backend(
                    state, cfg, backend_state=backend_state
                )
                n_online_loops += nl
                if progress_every and nl:
                    print(f"  frame {t}: online backend closed {nl} loops",
                          flush=True)
            if progress_every and t % progress_every == 0:
                print(f"  frame {t}/{T}", flush=True)
    import jax as _jax

    _jax.block_until_ready(state.pose)
    fps = max(T - fps_base, 1) / (time.perf_counter() - t0)

    est = np.stack([np.asarray(p) for p in _jax.device_get(device_poses)])
    est = np.vstack([poses_gt[0][None], est])
    ate = compute_rmse(poses_gt, est)
    rpe_t, rpe_r = compute_rpe(poses_gt, est)
    dth_abs = (est[:, 2] - poses_gt[:, 2] + np.pi) % (2 * np.pi) - np.pi
    heading_rmse = float(np.degrees(np.sqrt(np.mean(dth_abs ** 2))))

    res = EvalResult(
        frames=T,
        fps=fps,
        ate_odometry=ate,
        n_keyframes=int(state.map.cursor),
        n_online_loops=n_online_loops,
        rpe_trans_pct=rpe_t,
        rpe_rot_deg_100m=rpe_r,
        heading_rmse_deg=heading_rmse,
    )
    if health is not None:
        res.mean_inliers, res.frac_fit_ok, res.n_retracks = health
    if return_state:
        res.final_state = state
        res.est_frames = est

    # flush a partial artifact BEFORE the backend: a device fault during the
    # post-hoc solve must not destroy an hour of completed odometry (run 1 of
    # round 4 lost all 8,862 frames to a TPU worker crash inside the final BA)
    if partial_write is not None:
        partial_write(res)
    if run_backend:
        from radarslampy_tpu.models.loopclosure import (
            close_loops, graph_with_loop_edges, scan_new_loops, trim_map_state,
        )
        from radarslampy_tpu.models.posegraph import optimize_pose_graph

        if progress_every:
            print("  backend: loop closure...", flush=True)
        m = trim_map_state(_jax.device_get(state.map))
        if backend_state is not None:
            # The online backend already holds edges ICP-verified while drift
            # was BOUNDED (each was accepted within one backend_every window
            # of a correction) — strictly better measurements than re-running
            # verification under full end-of-run drift, where the pose-derived
            # translation init can be tens of metres off.  Scan only the tail
            # the last online pass hasn't seen, then build the graph from the
            # accumulated edge set.
            tail_ij, tail_rel = scan_new_loops(m, cfg,
                                               backend_state.prev_cursor)
            # dedup the tail against accumulated edges, mirroring
            # incremental_backend's seen-set — a duplicated (i,j) pair would
            # silently double that edge's information weight (ADVICE.md r04 #2)
            seen_ij = set(map(tuple, backend_state.edges_ij.tolist()))
            fresh = np.array(
                [tuple(e) not in seen_ij for e in tail_ij.tolist()], bool
            )
            acc_ij = np.concatenate([backend_state.edges_ij, tail_ij[fresh]])
            acc_rel = np.concatenate([backend_state.edges_meas,
                                      tail_rel[fresh]])
            graph = graph_with_loop_edges(m, acc_ij, acc_rel)
            res.n_loop_closures = len(acc_ij)
        else:
            # post-hoc-only under FULL end-of-run drift: scale the pose-
            # proximity candidate gate with path length (drift grows with
            # path; a fixed 10 m gate misses true revisits whose estimates
            # drifted apart), capped so the search stays selective.  The
            # appearance candidates and the zero-translation ICP starts are
            # the main drift defences (loopclosure.verify_candidate).
            path_m = float(np.sum(np.linalg.norm(
                np.diff(poses_gt[:, :2], axis=0), axis=1)))
            graph, matches = close_loops(
                m, cfg, radius_m=min(60.0, 10.0 + 0.005 * path_m))
            res.n_loop_closures = int(np.asarray(matches.ok).sum())
        # accepted loop edges, uniformly for both paths: every graph builder
        # appends loop edges after the M odometry-chain slots
        E0 = m.poses.shape[0]
        lsel = np.asarray(graph.edge_mask)[E0:]
        edges_ij = np.asarray(graph.edges_ij)[E0:][lsel]
        edges_rel = np.asarray(graph.edges_meas)[E0:][lsel]
        if progress_every:
            print(f"  backend: {res.n_loop_closures} loops; pose graph...",
                  flush=True)
        M = int(np.asarray(m.cursor))
        kf_poses_before = np.asarray(m.poses)[:M]
        # associate keyframes to GT by the *creating frame index* recorded in
        # MapState.frame_ids — exact, immune to re-anchored poses and revisit
        # ambiguity (VERDICT.md r03 weak #6); position-nearest fallback only
        # for maps predating the field.
        fids = (np.asarray(m.frame_ids)[:M]
                if m.frame_ids is not None else None)
        gt_kf = _associate(kf_poses_before, poses_gt, est, frame_ids=fids)
        res.gt_keyframes = gt_kf
        res.ate_keyframes_before = compute_rmse(gt_kf, kf_poses_before)
        if len(edges_ij) > 0:
            # measured vs GT relative pose per accepted loop edge
            gi, gj = gt_kf[edges_ij[:, 0]], gt_kf[edges_ij[:, 1]]
            d = gj[:, :2] - gi[:, :2]
            c0, s0 = np.cos(gi[:, 2]), np.sin(gi[:, 2])
            rel_gt_xy = np.stack(
                [c0 * d[:, 0] + s0 * d[:, 1], -s0 * d[:, 0] + c0 * d[:, 1]],
                axis=1,
            )
            err = np.linalg.norm(edges_rel[:, :2] - rel_gt_xy, axis=1)
            res.loop_edge_err_median = float(np.median(err))
            res.loop_edge_err_p90 = float(np.quantile(err, 0.9))
            res.n_loop_edges_bad = int((err > 1.0).sum())
            if progress_every:
                print(f"  backend: edge error median "
                      f"{res.loop_edge_err_median:.2f} m, p90 "
                      f"{res.loop_edge_err_p90:.2f} m, "
                      f"{res.n_loop_edges_bad} bad (>1 m)", flush=True)
        opt = kf_poses_before
        try:
            if res.n_loop_closures > 0:
                opt_poses, _ = optimize_pose_graph(graph, cfg)
                opt = np.asarray(opt_poses)[:M]
                res.ate_keyframes_after = compute_rmse(gt_kf, opt)
        except Exception as e:  # salvage: keep odometry + before-ATE
            res.backend_error = f"pose graph: {type(e).__name__}: {e}"[:300]
            print(f"  backend: POSE GRAPH FAILED, salvaging partial results "
                  f"({type(e).__name__})", flush=True)
        if partial_write is not None:
            partial_write(res)
        if run_ba and res.backend_error is None:
            # Bundle adjustment over the (pose-graph-corrected) map: the
            # matrix-free Schur path at full_seq_1 scale (VERDICT.md r02
            # next #3 "the full-seq artifact gains a BA row"; replaces the
            # reference's never-executed g2o scaffold, PoseGraphLib.py:46-98)
            if progress_every:
                print("  backend: bundle adjustment...", flush=True)
            try:
                res.ate_keyframes_after_ba, res.n_ba_landmarks, \
                    res.n_ba_observations = _run_ba(m, opt, gt_kf, M, cfg)
            except Exception as e:  # salvage: keep pose-graph results
                res.backend_error = f"BA: {type(e).__name__}: {e}"[:300]
                print(f"  backend: BA FAILED, salvaging pose-graph results "
                      f"({type(e).__name__})", flush=True)
    return res


def _run_ba(m, opt_poses, gt_kf, M, cfg: SlamConfig):
    """Schur-complement BA over the trimmed map, poses initialised from the
    pose-graph solution and landmark world coords recomputed from the
    (pose-independent) sensor-local observations.  Returns
    (keyframe ATE after BA, n landmarks, n observations)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from radarslampy_tpu.models.ba import build_ba_problem, optimize_ba

    mp = np.asarray(m.poses).copy()
    mp[:M] = opt_poses
    local = np.asarray(m.feat_local)
    fmask = np.asarray(m.feat_mask)
    c = np.cos(mp[:, 2])[:, None]
    s = np.sin(mp[:, 2])[:, None]
    fw = np.stack(
        [c * local[..., 0] - s * local[..., 1] + mp[:, 0:1],
         c * local[..., 1] + s * local[..., 0] + mp[:, 1:2]],
        axis=-1,
    ) * fmask[..., None]
    m_ba = m._replace(poses=jnp.asarray(mp.astype(np.float32)),
                      feat_world=jnp.asarray(fw.astype(np.float32)))
    prob = build_ba_problem(m_ba)
    # pg_cg_iterations=0 -> auto (8M) sweep cap: an explicit 512 truncated the
    # Schur solves at full_seq_1 scale (M~4.6k) — the probe's BA moved
    # keyframe ATE the WRONG way (31.4 -> 33.6 m); the 1e-10 relative-
    # residual exit keeps converged solves cheap regardless of the cap
    ba_cfg = dc.replace(cfg, pg_iterations=15, pg_cg_iterations=0)
    poses_ba, _, _ = optimize_ba(prob, ba_cfg)
    ate = compute_rmse(gt_kf, np.asarray(poses_ba)[:M])
    return (ate, int(np.asarray(prob.lm_mask).sum()),
            int(np.asarray(prob.obs_mask).sum()))


def _associate(kf_poses, poses_gt, est_frames, frame_ids=None):
    """Associate keyframes to their GT poses.

    Preferred: by creating-frame index (`MapState.frame_ids` — exact).
    Fallback (frame_ids None, e.g. an old checkpoint): nearest estimated
    frame position, which can pick the wrong branch near self-intersections
    (VERDICT.md r03 weak #6)."""
    if frame_ids is not None:
        fid = np.clip(np.asarray(frame_ids, np.int64), 0, len(poses_gt) - 1)
        return poses_gt[fid]
    gt = np.zeros_like(kf_poses)
    for i, kp in enumerate(kf_poses):
        j = np.argmin(np.linalg.norm(est_frames[:, :2] - kp[:2], axis=1))
        gt[i] = poses_gt[j]
    return gt


def main(argv=None):
    """CLI: long-sequence eval on real GT motion.

    Example (a real revisit loop of full_seq_1 — frame 1370 passes within
    2 m of frame 1069):
        python -m radarslampy_tpu.evaluation --start 1040 --count 360 --backend
    """
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gt-csv",
                   default="/root/reference/data/full_seq_1/gt/radar_odometry.csv")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--count", type=int, default=200)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise", type=float, default=0.02)
    p.add_argument("--backend", action="store_true",
                   help="run loop closure + pose graph after odometry")
    p.add_argument("--ba", action="store_true",
                   help="run Schur-complement bundle adjustment after the "
                        "pose graph (matrix-free PCG at scale)")
    p.add_argument("--backend-every", type=int, default=0,
                   help="frames between ONLINE backend passes fed back into "
                        "the run (0 = post-hoc only)")
    p.add_argument("--loop-method", default=None,
                   choices=("pose", "appearance", "m2dp", "both"))
    p.add_argument("--cart-size", type=int, default=1024)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--progress-every", type=int, default=50)
    p.add_argument("--max-keyframes", type=int, default=None,
                   help="map capacity override (full 9 km run needs ~8192)")
    p.add_argument("--per-scan", type=float, default=80.0,
                   help="target visible landmarks per scan (corridor world)")
    p.add_argument("--world", default="corridor", choices=("corridor", "box"),
                   help="synthetic world model; 'box' is the pre-corridor "
                        "uniform world (ATE numbers are NOT comparable "
                        "across worlds)")
    p.add_argument("--chunk-frames", type=int, default=0,
                   help="frames per device dispatch (slam_step_chunk); "
                        "use 64 for very long runs on the axon remote TPU")
    p.add_argument("--sync-every", type=int, default=1,
                   help="block_until_ready every N chunks (0 = only at the "
                        "final bulk fetch); >1 avoids the axon client's "
                        "per-block poll-backoff slack")
    p.add_argument("--renderer", default="max", choices=("max", "sum"),
                   help="device-render blob composition: 'max' = 9x9 "
                        "scatter-max patches (original; ~450 ms/frame on "
                        "the real chip — TPU scatters serialize); 'sum' = "
                        "additive separable splat as one MXU matmul "
                        "(sub-ms)")
    p.add_argument("--host-render", action="store_true",
                   help="render scans on host even when chunking (A/B "
                        "against the device renderer)")
    p.add_argument("--no-quantize", action="store_true",
                   help="skip u8 quantisation of rendered scans (float A/B "
                        "for the drift analysis; the default u8 path mimics "
                        "real PNG ingestion)")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint directory: the chunked run saves "
                        "(state, results, backend edges, cursor) every "
                        "--ckpt-every frames so a mid-run TPU fault costs "
                        "minutes, not the run")
    p.add_argument("--ckpt-every", type=int, default=2048)
    p.add_argument("--resume", action="store_true",
                   help="resume from --ckpt-dir if a compatible checkpoint "
                        "exists (config mismatch refuses)")
    p.add_argument("--out", default=None, help="write a JSON result artifact")
    p.add_argument("--min-inliers-accept", type=int, default=None,
                   help="override cfg.min_inliers_accept (0 disables the "
                        "degenerate-fit coasting gate — the r05 A/B control)")
    p.add_argument("--no-fusion-barrier", action="store_true",
                   help="drop the renderer/step optimization_barrier in the "
                        "device-render chunk program (the r05 control for "
                        "the fused-program drift isolation)")
    p.add_argument("--matmul-precision", default=None,
                   choices=("bfloat16", "tensorfloat32", "float32", "highest"),
                   help="override jax_default_matmul_precision for the whole "
                        "run — diagnostic hammer for TPU reduced-precision "
                        "drift (pose-critical sites are individually "
                        "annotated HIGHEST already; this catches stragglers)")
    a = p.parse_args(argv)
    if a.matmul_precision:
        jax.config.update("jax_default_matmul_precision", a.matmul_precision)

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    kw = {"cart_size": a.cart_size,
          "cart_downsample": 4096 // a.cart_size}
    if a.loop_method:
        kw["loop_method"] = a.loop_method
    if a.max_keyframes:
        kw["max_keyframes"] = a.max_keyframes
    if a.min_inliers_accept is not None:
        kw["min_inliers_accept"] = a.min_inliers_accept
    cfg = SlamConfig(**kw)
    poses = gt_subsequence(a.gt_csv, a.start, a.count, a.stride)
    dist = float(np.sum(np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)))
    print(f"eval: {len(poses)} frames, {dist:.0f} m path, "
          f"cart {a.cart_size}, loop_method {cfg.loop_method}")
    def _artifact(res):
        import jax

        return {
            "gt_csv": a.gt_csv,
            "start": a.start,
            "count": a.count,
            "path_m": round(dist, 1),
            "world": a.world,
            "seed": a.seed,
            "noise": a.noise,
            "cart_size": a.cart_size,
            "max_keyframes": cfg.max_keyframes,
            "loop_method": cfg.loop_method,
            "backend_every": a.backend_every,
            "chunk_frames": a.chunk_frames,
            "renderer": a.renderer,
            "platform": jax.devices()[0].platform,
            "frames": res.frames,
            "fps": round(res.fps, 2),
            "n_keyframes": res.n_keyframes,
            "ate_odometry_m": round(res.ate_odometry, 3),
            "n_online_loops": res.n_online_loops,
            "n_loop_closures": res.n_loop_closures,
            "ate_keyframes_before_m": (round(res.ate_keyframes_before, 3)
                                       if res.ate_keyframes_before is not None
                                       else None),
            "ate_keyframes_after_m": (round(res.ate_keyframes_after, 3)
                                      if res.ate_keyframes_after is not None
                                      else None),
            "ate_keyframes_after_ba_m": (round(res.ate_keyframes_after_ba, 3)
                                         if res.ate_keyframes_after_ba
                                         is not None else None),
            "n_ba_landmarks": res.n_ba_landmarks,
            "n_ba_observations": res.n_ba_observations,
            "loop_edge_err_median_m": (round(res.loop_edge_err_median, 3)
                                       if res.loop_edge_err_median is not None
                                       else None),
            "loop_edge_err_p90_m": (round(res.loop_edge_err_p90, 3)
                                    if res.loop_edge_err_p90 is not None
                                    else None),
            "n_loop_edges_bad": res.n_loop_edges_bad,
            "mean_inliers": (round(res.mean_inliers, 1)
                             if res.mean_inliers is not None else None),
            "frac_fit_ok": (round(res.frac_fit_ok, 4)
                            if res.frac_fit_ok is not None else None),
            "n_retracks": res.n_retracks,
            "backend_error": res.backend_error,
            "rpe_trans_pct": (round(res.rpe_trans_pct, 3)
                              if res.rpe_trans_pct is not None else None),
            "rpe_rot_deg_100m": (round(res.rpe_rot_deg_100m, 3)
                                 if res.rpe_rot_deg_100m is not None else None),
            "heading_rmse_deg": (round(res.heading_rmse_deg, 3)
                                 if res.heading_rmse_deg is not None else None),
            "quantize": not a.no_quantize,
            "reference_ate_m": 41.81,
        }

    def _write(res):
        # progressive flush: odometry results land on disk BEFORE the
        # backend/BA stages run (a device fault there must not lose the run)
        if a.out:
            import json

            with open(a.out, "w") as f:
                json.dump(_artifact(res), f, indent=2)

    res = evaluate_sequence(poses, cfg, seed=a.seed,
                            run_backend=a.backend or a.ba, run_ba=a.ba,
                            noise=a.noise, progress_every=a.progress_every,
                            landmarks_per_scan=a.per_scan, world=a.world,
                            backend_every=a.backend_every,
                            chunk_frames=a.chunk_frames,
                            device_render=not a.host_render,
                            renderer=a.renderer,
                            partial_write=_write,
                            sync_every=a.sync_every,
                            quantize=not a.no_quantize,
                            fusion_barrier=not a.no_fusion_barrier,
                            ckpt_dir=a.ckpt_dir,
                            ckpt_every=a.ckpt_every,
                            resume=a.resume)
    print(f"odometry ATE {res.ate_odometry:.2f} m over {res.frames} frames "
          f"({res.fps:.1f} fps), {res.n_keyframes} keyframes, "
          f"{res.n_online_loops} online loops")
    if res.mean_inliers is not None:
        print(f"health: mean inliers {res.mean_inliers:.1f}, fit_ok "
              f"{100 * res.frac_fit_ok:.1f}%, {res.n_retracks} retracks")
    if a.backend or a.ba:
        def _fmt(v):  # None renders as 'n/a (0 loops)' not 'None' (ADVICE r03 #2)
            return f"{v:.2f} m" if v is not None else "n/a (0 loops)"

        print(f"loop closures: {res.n_loop_closures}; keyframe ATE "
              f"{_fmt(res.ate_keyframes_before)} -> "
              f"{_fmt(res.ate_keyframes_after)}")
        if a.ba:
            print(f"BA ({res.n_ba_landmarks} landmarks, "
                  f"{res.n_ba_observations} obs): keyframe ATE "
                  f"{_fmt(res.ate_keyframes_after_ba)}")
    _write(res)
    return res


if __name__ == "__main__":
    main()
