"""A/B probe: what is the 458 ms/frame in the chunked TPU eval loop?

Round 4 left two committed, mutually exclusive explanations (VERDICT.md r04
missing #4): "the on-device scan renderer dominates" (verify skill §4) vs
"constant client poll-backoff slack independent of program content"
(evaluation.py).  This probe settles it with a 2x2 at --count 1100, no
backend: {renderer max, sum} x {sync-every 1, 0}.

  * renderer theory  -> (sum, 1) is much faster than (max, 1)
  * client-slack theory -> (max, 0) is much faster than (max, 1), and the
    renderer axis barely matters

A 5th row re-measures the ONLINE backend at backend_every=512 after the
device-resident rewrite (r04: 0.69 fps with the per-pass full-map D2H;
target >= 1.5 fps — VERDICT.md r04 next #2 done-criterion).

ONE process, rows sequential (axon TPU claim discipline: one claim, clean
exit).  Results flush to PROBE_AB_r05.json after EVERY row.
"""

from __future__ import annotations

import json
import time

import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

GT_CSV = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"
OUT = "PROBE_AB_r05.json"

ROWS = [
    # (label, renderer, sync_every, backend_every)
    ("max_sync1", "max", 1, 0),
    ("max_sync0", "max", 0, 0),
    ("sum_sync1", "sum", 1, 0),
    ("sum_sync0", "sum", 0, 0),
    ("sum_sync1_backend512", "sum", 1, 512),
]


def main(count: int = 1100, cart: int = 1024):
    import jax

    cfg = SlamConfig(cart_size=cart, cart_downsample=4096 // cart)
    poses = gt_subsequence(GT_CSV, 0, count)
    dist = float(np.sum(np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)))
    results = {
        "count": count, "path_m": round(dist, 1),
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "chunk_frames": 128,
        "rows": [],
    }
    for label, renderer, sync_every, backend_every in ROWS:
        print(f"=== row {label}: renderer={renderer} sync_every={sync_every} "
              f"backend_every={backend_every}", flush=True)
        t0 = time.perf_counter()
        res = evaluate_sequence(
            poses, cfg, seed=0, chunk_frames=128, renderer=renderer,
            sync_every=sync_every, backend_every=backend_every,
            progress_every=512,
        )
        wall = time.perf_counter() - t0
        row = {
            "label": label, "renderer": renderer, "sync_every": sync_every,
            "backend_every": backend_every,
            "fps": round(res.fps, 3),
            "wall_s": round(wall, 1),
            "ms_per_frame_wall": round(1e3 * wall / (count - 1), 1),
            "ate_odometry_m": round(res.ate_odometry, 3),
            "n_keyframes": res.n_keyframes,
            "n_online_loops": res.n_online_loops,
            "mean_inliers": (round(res.mean_inliers, 1)
                             if res.mean_inliers is not None else None),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:          # progressive flush per row
            json.dump(results, f, indent=2)
    print(f"probe complete -> {OUT}", flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1100)
