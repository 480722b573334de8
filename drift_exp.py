"""Controlled drift-floor experiment (VERDICT.md r04 next #4).

Round 4 established a ~2.3-2.5%-of-path odometry drift floor that landmark
density, noise halving and solver iteration budgets do not touch
(density_exp2.log, solver_exp.log) — and left the mechanism undiagnosed.
This harness varies ONE variable per row on the same ~553 m / 700-frame
full_seq_1 GT segment and reports the drift-RATE metrics (KITTI-style
RPE/100 m translation + rotation, heading RMSE) alongside ATE, which is what
separates the candidate mechanisms:

  * u8 quantisation   (rows u8 vs float, SAME chunking — the r04 u8_exp
    comparison confounded chunked-vs-per-frame with u8-vs-float)
  * sensor noise      (rows noise=0.02 vs noise=0: if drift survives noise=0
    it is geometric/deterministic, not stochastic)
  * both off          (float + noise=0: the pipeline's intrinsic floor)
  * path difficulty   (the same pipeline reported 0.04 m over 300 easy
    frames — rows report turn-rate stats so easy/hard can be compared)

Writes DRIFT_EXP_r05.json progressively; conclusions go to DRIFT_ANALYSIS.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

GT_CSV = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"
OUT = "DRIFT_EXP_r05.json"

ROWS = [
    # (label, quantize, noise, seed)
    ("u8_noise02_s0", True, 0.02, 0),
    ("float_noise02_s0", False, 0.02, 0),
    ("u8_noise0_s0", True, 0.0, 0),
    ("float_noise0_s0", False, 0.0, 0),
    ("u8_noise02_s1", True, 0.02, 1),
    ("float_noise02_s1", False, 0.02, 1),
]


def path_stats(poses):
    d = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    dth = np.abs((np.diff(poses[:, 2]) + np.pi) % (2 * np.pi) - np.pi)
    return {
        "path_m": round(float(d.sum()), 1),
        "mean_step_m": round(float(d.mean()), 3),
        "turn_rate_deg_per_frame_mean": round(float(np.degrees(dth.mean())), 3),
        "turn_rate_deg_per_frame_p95": round(
            float(np.degrees(np.quantile(dth, 0.95))), 3),
    }


def main(count: int = 700, cart: int = 1024, rows=None):
    import jax

    cfg = SlamConfig(cart_size=cart, cart_downsample=4096 // cart)
    poses = gt_subsequence(GT_CSV, 0, count)
    results = {
        "count": count,
        "platform": jax.devices()[0].platform,
        "cart_size": cart,
        "chunk_frames": 128,
        "renderer": "sum",
        **path_stats(poses),
        "rows": [],
    }
    for label, quantize, noise, seed in (rows or ROWS):
        print(f"=== row {label}", flush=True)
        t0 = time.perf_counter()
        res = evaluate_sequence(
            poses, cfg, seed=seed, chunk_frames=128, renderer="sum",
            noise=noise, quantize=quantize, progress_every=512,
        )
        row = {
            "label": label, "quantize": quantize, "noise": noise, "seed": seed,
            "ate_odometry_m": round(res.ate_odometry, 3),
            "ate_pct_of_path": round(
                100.0 * res.ate_odometry / results["path_m"], 3),
            "rpe_trans_pct": (round(res.rpe_trans_pct, 3)
                              if res.rpe_trans_pct is not None else None),
            "rpe_rot_deg_100m": (round(res.rpe_rot_deg_100m, 3)
                                 if res.rpe_rot_deg_100m is not None else None),
            "heading_rmse_deg": (round(res.heading_rmse_deg, 3)
                                 if res.heading_rmse_deg is not None else None),
            "n_keyframes": res.n_keyframes,
            "mean_inliers": (round(res.mean_inliers, 1)
                             if res.mean_inliers is not None else None),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"drift experiment complete -> {OUT}", flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 700)
