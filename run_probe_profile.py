"""Renderer-exp-fix probe + per-stage profile, one chip process.

Stage A gates the round's final decision: the 1100-frame eval config
(= PROBE_AB_r05 sum_sync1: pre-trig-fix 36.66 m, post-trig-fix 58.87 m,
CPU ~1-3 m) re-run with the accurate-exp renderer.  If it lands near the
CPU number, the platform-numerics story is closed end-to-end and a final
full-sequence run is launched with the fixed renderer.

Stage B: utils/profile_stages on the chip — the fused step measures
~457 ms/frame on this runtime (BENCH above) while the same code does
~300 ms on a 2-core CPU; the per-stage relative weights localize it.
"""

import json
import time

import numpy as np


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
        "config": "PROBE_AB sum_sync1 config, accurate-exp renderer",
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
        "history_same_config": {
            "pre_trig_fix": 36.66, "post_trig_fix_pre_exp_fix": 58.87,
            "cpu_700_frames": "0.17-2.7 m",
        },
    }
    with open("DRIFT_FIX2_TPU_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print("probe:", json.dumps(out), flush=True)


def stage_profile():
    from radarslampy_tpu.utils import profile_stages

    profile_stages.main(["--out", "PROFILE_r05.json"])


if __name__ == "__main__":
    import traceback

    for name, fn in [("probe", stage_probe), ("profile", stage_profile)]:
        print(f"=== stage {name}", flush=True)
        try:
            fn()
        except Exception:
            print(f"stage {name} FAILED:\n{traceback.format_exc()}", flush=True)
    print("done", flush=True)
