"""Post-full-run TPU follow-ups, ONE process (axon claim discipline).

Ordered by importance; each stage flushes its artifact before the next
starts, so a fault costs only the remaining stages:

  1. DRIFT_FIX_TPU_r05.json — the 1100-frame probe config byte-identical to
     PROBE_AB_r05's `sum_sync1` row (36.66 m pre-fix) re-run with the
     accurate-trig build: the on-chip validation of the drift fix.
  2. PLATFORM_TRACE_tpu.npz — per-frame pose increments on identical
     host-rendered scans (platform_diff.py) for the CPU-vs-TPU numeric
     divergence report.
  3. bench.py — validates the rewritten benchmark runs rc=0 on the chip
     (<=128-frame chunks, progressive prints, HIGHEST-precision bound).
  4. PROBE_2048_r05.json — >=1k frames at the reference-exact grid
     (2048^2 @ 0.0864 m/px, parseData.py:10-13; VERDICT.md r04 next #9),
     chunk 64 (2048^2 programs are ~4x the 1024^2 per-dispatch size — stay
     clear of the fault cliff).
"""

from __future__ import annotations

import json
import time
import traceback

import numpy as np


def stage1_driftfix():
    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    poses = gt_subsequence(
        "/root/reference/data/full_seq_1/gt/radar_odometry.csv", 0, 1100)
    t0 = time.perf_counter()
    res = evaluate_sequence(poses, cfg, seed=0, chunk_frames=128,
                            renderer="sum", sync_every=1, progress_every=512)
    out = {
        "config": "identical to PROBE_AB_r05 row sum_sync1 (pre-fix ATE 36.66 m)",
        "ate_odometry_m": round(res.ate_odometry, 3),
        "rpe_trans_pct": (round(res.rpe_trans_pct, 3)
                          if res.rpe_trans_pct is not None else None),
        "rpe_rot_deg_100m": (round(res.rpe_rot_deg_100m, 3)
                             if res.rpe_rot_deg_100m is not None else None),
        "heading_rmse_deg": (round(res.heading_rmse_deg, 3)
                             if res.heading_rmse_deg is not None else None),
        "fps": round(res.fps, 3),
        "n_keyframes": res.n_keyframes,
        "mean_inliers": (round(res.mean_inliers, 1)
                         if res.mean_inliers is not None else None),
        "wall_s": round(time.perf_counter() - t0, 1),
        "pre_fix_ate_m": 36.66,
        "cpu_reference_ate_m": "0.17-2.7 m at 700 frames (DRIFT_EXP_r05)",
    }
    with open("DRIFT_FIX_TPU_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print("stage1 drift-fix:", json.dumps(out), flush=True)


def stage2_trace():
    import platform_diff

    platform_diff.run("tpu")


def stage3_bench():
    import bench

    bench.main()


def stage4_2048():
    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

    cfg = SlamConfig(cart_size=2048, cart_downsample=2)
    poses = gt_subsequence(
        "/root/reference/data/full_seq_1/gt/radar_odometry.csv", 0, 1100)
    t0 = time.perf_counter()
    res = evaluate_sequence(poses, cfg, seed=0, chunk_frames=64,
                            renderer="sum", sync_every=1, progress_every=256)
    out = {
        "cart_size": 2048, "cart_downsample": 2,
        "resolution_m_per_px": 0.0864,
        "note": "reference-exact grid (parseData.py:10-13), 1100 frames",
        "ate_odometry_m": round(res.ate_odometry, 3),
        "rpe_trans_pct": (round(res.rpe_trans_pct, 3)
                          if res.rpe_trans_pct is not None else None),
        "heading_rmse_deg": (round(res.heading_rmse_deg, 3)
                             if res.heading_rmse_deg is not None else None),
        "fps": round(res.fps, 3),
        "n_keyframes": res.n_keyframes,
        "mean_inliers": (round(res.mean_inliers, 1)
                         if res.mean_inliers is not None else None),
        "wall_s": round(time.perf_counter() - t0, 1),
        "ate_1024_same_frames_m": "see DRIFT_FIX_TPU_r05.json",
    }
    with open("PROBE_2048_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print("stage4 2048:", json.dumps(out), flush=True)


if __name__ == "__main__":
    for name, fn in [("drift-fix", stage1_driftfix), ("trace", stage2_trace),
                     ("bench", stage3_bench), ("2048", stage4_2048)]:
        print(f"=== stage {name}", flush=True)
        try:
            fn()
        except Exception:
            print(f"stage {name} FAILED:\n{traceback.format_exc()}",
                  flush=True)
    print("post_run complete", flush=True)
