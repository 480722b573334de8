"""Endgame chip sequence after the axis-1 warp rewrite.

WARP_MICRO_r05 showed the axon runtime runs axis-0 take_along_axis on a
~24 ms slow path (16 of them = 429 of the step's 458 ms, PROFILE_r05)
while axis-1 is free; the warp now gathers along axis 1 of the transposed
operand.  Every component is bit-clean CPU-vs-TPU in isolation
(PLATFORM_DIFF, RENDER_DIFF) yet the fused chunked eval drifts 57 m on
TPU vs 0.62 m on CPU — consistent with the slow-path gather DEGRADING
inside the fused program.  Stages:

  1. warp timing (expect ~dispatch-floor)
  2. probe A: 1100-frame chunked device-render eval (new warp) — perf AND
     the accuracy verdict: if the slow gather was also numerically wrong
     in fusion, this collapses to CPU-level ATE
  3. if A is fast, full 8,862-frame run is launched SEPARATELY

Each stage flushes results immediately.
"""

import json
import time

import numpy as np


def stage_micro():
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.ops.routed_warp import (
        build_routed_warp_maps, routed_polar_to_cartesian,
    )

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    maps = build_routed_warp_maps(cfg)
    rng = np.random.default_rng(0)
    polar = jnp.asarray(
        rng.random((cfg.num_azimuths, cfg.polar_width_padded), np.float32))

    f = jax.jit(routed_polar_to_cartesian)
    r = f(polar, maps)
    jax.block_until_ready(r)
    np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(polar, maps)
    np.asarray(r).ravel()[:1]
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"routed_warp (axis-1 form): {ms:.3f} ms  (was 445.0)", flush=True)

    # fused step per-call sync
    fmaps = build_frame_maps(cfg)
    from radarslampy_tpu.sim import fakedata as fd

    poses = np.zeros((8, 3))
    poses[:, 0] = np.arange(8) * 2.5
    wp, wr = fd.make_world_corridor(rng, poses, cfg.max_range_clip_m,
                                    per_scan=120.0)
    scans = [jnp.asarray(fd.render_polar_scan(wp, wr, p, cfg, rng=rng,
                                              noise=0.02)) for p in poses]
    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg),
                   donate_argnums=(0,))
    st = init(scans[0], fmaps)
    st, out = step(st, scans[1], fmaps)
    np.asarray(st.pose)
    t0 = time.perf_counter()
    n = 0
    for _ in range(5):
        for sc in scans[2:]:
            st, out = step(st, sc, fmaps)
            n += 1
    np.asarray(st.pose)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"fused step per-call (async batch, fetch-forced): {ms:.3f} ms "
          f"(was ~457)", flush=True)
    with open("WARP_FIX_TIMING_r05.json", "w") as fj:
        json.dump({"fused_step_ms": ms}, fj)


def stage_probe():
    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    poses = gt_subsequence(
        "/root/reference/data/full_seq_1/gt/radar_odometry.csv", 0, 1100)
    t0 = time.perf_counter()
    res = evaluate_sequence(poses, cfg, seed=0, chunk_frames=128,
                            renderer="sum", sync_every=1, progress_every=512)
    out = {
        "config": "1100-frame chunked device-render, axis-1 warp",
        "ate_odometry_m": round(res.ate_odometry, 3),
        "heading_rmse_deg": (round(res.heading_rmse_deg, 3)
                             if res.heading_rmse_deg is not None else None),
        "fps": round(res.fps, 3),
        "n_keyframes": res.n_keyframes,
        "mean_inliers": (round(res.mean_inliers, 1)
                         if res.mean_inliers is not None else None),
        "wall_s": round(time.perf_counter() - t0, 1),
        "history": {"old_warp_tpu": 57.6, "cpu_same_config": 0.62},
    }
    with open("WARP_FIX_PROBE_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print("probe:", json.dumps(out), flush=True)


if __name__ == "__main__":
    import traceback

    for name, fn in [("micro", stage_micro), ("probe", stage_probe)]:
        print(f"=== stage {name}", flush=True)
        try:
            fn()
        except Exception:
            print(f"stage {name} FAILED:\n{traceback.format_exc()}", flush=True)
    print("endgame stages done", flush=True)
