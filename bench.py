"""Benchmark: frames/s/chip of the fused SLAM step at full sensor resolution.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference processes Oxford full_seq_1 at ~0.8-1.2 frames/s on an
i7-8650U (raw-roam.pdf p.5 §IV; BASELINE.md) — we use 1.0 fps as the divisor.
The benchmark drives the *device* pipeline (polar->cart warp, DoH+ANMS on
keyframe frames, KLT, clique rejection, rigid fit, motion-distortion LM,
keyframe/map update) on synthetic full-resolution scans rendered from a world
landmark model along a curved trajectory, so keyframe branches are genuinely
exercised.  Host PNG decode is excluded here (measured separately; overlapped
by the prefetcher in the real driver).

Measurement discipline (VERDICT.md r02 weak #1/#2 — the round-2 number was
inflated ~2x by blocking on `outs.pose` only): every timed path blocks on the
COMPLETE output tree (state AND outputs) before the clock stops.  Three
mutually-consistent numbers are reported:

  * per_dispatch_fps   — one remote dispatch per frame, full tree blocked at
                         the end (continues the r01 metric series: r01
                         "value" 10,355 was this number).
  * per_dispatch_sync_fps — same, but blocking after EVERY call (per-frame
                         latency a live consumer would see).
  * chunked_fps        — F frames per dispatch via lax.scan, full tree
                         blocked; the throughput number, and the headline
                         `value`.
  * device_us_per_frame_profiled — device-side busy time per frame from a
                         `jax.profiler` trace of the chunked program (null
                         when the profiler can't see the device, e.g. through
                         the axon tunnel); cross-check: chunked_fps implies
                         1e6/chunked_fps us/frame of wall per frame.
"""

from __future__ import annotations

import glob
import json
import time

import numpy as np


def _profiled_device_us_per_frame(trace_dir: str, n_frames: int):
    """Total device-plane busy time per frame from a jax.profiler trace.

    Sums the span (first event start -> last event end) of the busiest line
    of the device plane — robust to the exact program name.  Returns None
    when no device plane is visible (remote-tunnel TPUs may not expose one).
    """
    import jax.profiler as jp

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        return None
    pd = jp.ProfileData.from_serialized_xspace(open(files[-1], "rb").read())
    best = None
    for plane in pd.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name and "gpu" not in name:
            continue
        for line in plane.lines:
            evs = [e for e in line.events if e.duration_ns > 0]
            if not evs:
                continue
            busy = sum(e.duration_ns for e in evs)
            if best is None or busy > best:
                best = busy
    if best is None:
        return None
    return best / 1e3 / n_frames


def main():
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig()
    maps = build_frame_maps(cfg)
    rng = np.random.default_rng(0)

    # synthetic curved trajectory at realistic speed (~10 m/s, 4 Hz)
    n_warm, n_meas = 4, 40
    T = n_warm + n_meas
    poses = np.zeros((T, 3))
    v, w = 10.0 * cfg.scan_period_s, 0.03
    for t in range(1, T):
        th = poses[t - 1, 2]
        poses[t] = poses[t - 1] + [v * np.cos(th), v * np.sin(th), w]

    world_pts, world_refl = fd.make_world(rng, n_landmarks=3000, extent_m=250.0)
    scans = [
        jnp.asarray(
            fd.render_polar_scan(world_pts, world_refl, p, cfg, rng=rng, noise=0.02)
        )
        for p in poses
    ]

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    state = init(scans[0], maps)
    step = jax.jit(
        lambda s, p, m: frontend.slam_step(s, p, m, cfg), donate_argnums=(0,)
    )

    # --- per-dispatch path: one remote dispatch per frame ---
    for i in range(1, n_warm + 1):
        state, out = step(state, scans[i], maps)
    jax.block_until_ready((state, out))

    t0 = time.perf_counter()
    for i in range(n_warm + 1, T):
        state, out = step(state, scans[i], maps)
    jax.block_until_ready((state, out))          # FULL tree, not just pose
    fps_per_dispatch = n_meas / (time.perf_counter() - t0)

    # --- per-dispatch with per-call sync: live per-frame latency ---
    state_s = init(scans[0], maps)
    for i in range(1, n_warm + 1):
        state_s, out = step(state_s, scans[i], maps)
        jax.block_until_ready((state_s, out))
    t0 = time.perf_counter()
    for i in range(n_warm + 1, T):
        state_s, out = step(state_s, scans[i], maps)
        jax.block_until_ready((state_s, out))
    fps_sync = n_meas / (time.perf_counter() - t0)

    # --- chunked path: F frames per dispatch (frontend.slam_step_chunk) ---
    # identical math (parity tested, tests/test_system.py::
    # test_chunked_step_matches_per_frame); amortises the ~100 us remote
    # dispatch cost over the scan — the device-throughput number
    chunk = jax.jit(
        lambda s, ps, m: frontend.slam_step_chunk(s, ps, m, cfg),
        donate_argnums=(0,),
    )
    batch = jnp.stack(scans[1:])  # [T-1, A, W]
    state_c = init(scans[0], maps)
    state_c, outs = chunk(state_c, batch, maps)        # compile + warm
    jax.block_until_ready((state_c, outs))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        state_c, outs = chunk(state_c, batch, maps)
    jax.block_until_ready((state_c, outs))             # FULL tree
    dt_c = time.perf_counter() - t0
    fps_chunked = reps * (T - 1) / dt_c

    # --- profiled device time of the chunked program (one rep) ---
    profiled_us = None
    try:
        import shutil
        import tempfile

        trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
        jax.profiler.start_trace(trace_dir)
        state_c, outs = chunk(state_c, batch, maps)
        jax.block_until_ready((state_c, outs))
        jax.profiler.stop_trace()
        profiled_us = _profiled_device_us_per_frame(trace_dir, T - 1)
        shutil.rmtree(trace_dir, ignore_errors=True)
    except Exception:
        profiled_us = None

    print(
        json.dumps(
            {
                "metric": "frames/s/chip (fused SLAM step, 400x2025 polar -> "
                          "1024^2 cart @0.173m/px; chunked, full output tree "
                          "blocked)",
                "value": round(fps_chunked, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps_chunked / 1.0, 3),
                "per_dispatch_fps": round(fps_per_dispatch, 3),
                "per_dispatch_sync_fps": round(fps_sync, 3),
                "chunked_fps": round(fps_chunked, 3),
                "chunk_frames": T - 1,
                "device_us_per_frame_profiled": (
                    round(profiled_us, 3) if profiled_us else None
                ),
                "wall_us_per_frame_chunked": round(1e6 / fps_chunked, 3),
                "blocking": "jax.block_until_ready((state, outs)) on every "
                            "timed path (r02's outs.pose-only blocking "
                            "inflated the number ~2x; VERDICT.md weak #1)",
                "r01_series_note": "per_dispatch_fps continues BENCH_r01's "
                                   "'value' semantics (10,355 fps in r01)",
            }
        )
    )


if __name__ == "__main__":
    main()
