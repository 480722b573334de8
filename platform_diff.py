"""Per-frame numeric divergence of the SLAM step: CPU vs TPU.

Round-5 finding (DRIFT_EXP_r05 vs PROBE_AB_r05): the identical 553 m
segment, same code/seed/renderer, gives ~0.9 m ATE on CPU and tens of
metres on the TPU — the round-4 "2.5%-of-path drift floor" is a PLATFORM
NUMERIC effect, not an algorithmic one (axon float32 transcendentals are
~1e-4 accurate; FFTs worse).

This harness isolates it: N host-rendered scans (numpy — bit-identical on
every platform) are fed through the per-frame jitted `slam_step` and the
resulting per-frame pose increments are written to a platform-tagged npz.
`compare` diffs two traces and reports per-frame translation/heading error
statistics and whether the heading divergence is BIASED (grows ~linearly —
a systematic transcendental error) or a random walk (~sqrt growth).

Usage:
    python platform_diff.py run cpu          # writes PLATFORM_TRACE_cpu.npz
    python platform_diff.py run tpu          # on the chip
    python platform_diff.py compare          # prints the verdict
"""

from __future__ import annotations

import json
import sys

import numpy as np

GT_CSV = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"
N_FRAMES = 256
START = 450     # the sequence starts PARKED (~350 stationary frames); trace a
                # moving, turning segment — drift is turn-proportional


def run(tag: str):
    import jax

    if tag == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.evaluation import gt_subsequence
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    poses_gt = gt_subsequence(GT_CSV, START, N_FRAMES)
    rng = np.random.default_rng(0)
    world_pts, world_refl = fd.make_world_corridor(
        rng, poses_gt, cfg.max_range_clip_m, per_scan=80.0)

    period = cfg.scan_period_s
    scans = []
    for t in range(N_FRAMES):
        if t > 0:
            dp = poses_gt[t] - poses_gt[t - 1]
            c, s = np.cos(poses_gt[t][2]), np.sin(poses_gt[t][2])
            vel = np.array([c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1],
                            dp[2]]) / period
        else:
            vel = np.zeros(3)
        img = fd.render_polar_scan(world_pts, world_refl, poses_gt[t], cfg,
                                   velocity=vel, rng=rng, noise=0.02,
                                   mode="sum")
        scans.append(np.clip(np.rint(np.asarray(img) * 255), 0,
                             255).astype(np.uint8))

    maps = build_frame_maps(cfg)
    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg),
                   donate_argnums=(0,))
    state = init(jnp.asarray(scans[0]), maps)
    np.asarray(state.pose)                     # axon sync-fetch mode switch
    out_poses = np.zeros((N_FRAMES, 3), np.float32)
    fmt_rot = np.zeros(N_FRAMES, np.float32)
    n_inl = np.zeros(N_FRAMES, np.int32)
    for t in range(1, N_FRAMES):
        state, out = step(state, jnp.asarray(scans[t]), maps)
        op, fr, ni = jax.device_get((out.pose, out.fmt_rotation,
                                     out.n_inliers))
        out_poses[t], fmt_rot[t], n_inl[t] = op, fr, ni
    dev = jax.devices()[0]
    np.savez(f"PLATFORM_TRACE_{tag}.npz", poses=out_poses, fmt=fmt_rot,
             inliers=n_inl, gt=poses_gt.astype(np.float32),
             platform=str(dev.platform),
             device_kind=getattr(dev, "device_kind", ""))
    print(f"trace written: PLATFORM_TRACE_{tag}.npz "
          f"(final pose {out_poses[-1]}, gt {poses_gt[-1]})")


def compare():
    a = np.load("PLATFORM_TRACE_cpu.npz")
    b = np.load("PLATFORM_TRACE_tpu.npz")
    pa, pb, gt = a["poses"], b["poses"], a["gt"]
    wrap = lambda x: (x + np.pi) % (2 * np.pi) - np.pi
    # per-frame INCREMENT differences (what accumulates)
    da = np.diff(pa, axis=0)
    db = np.diff(pb, axis=0)
    dth = wrap(db[:, 2] - da[:, 2])
    dxy = np.linalg.norm(db[:, :2] - da[:, :2], axis=1)
    cum_heading = np.cumsum(dth)
    n = len(dth)
    rep = {
        "frames": int(n + 1),
        "per_frame_dtheta_mean_rad": float(dth.mean()),
        "per_frame_dtheta_std_rad": float(dth.std()),
        "per_frame_dxy_mean_m": float(dxy.mean()),
        "cum_heading_div_deg": float(np.degrees(cum_heading[-1])),
        "cum_heading_div_half_deg": float(np.degrees(cum_heading[n // 2])),
        "bias_verdict": (
            "BIASED (linear growth: systematic per-frame heading error)"
            if abs(cum_heading[-1]) > 2.5 * abs(cum_heading[n // 2]) * 0.8
            and abs(dth.mean()) > 0.3 * dth.std() / np.sqrt(n)
            else "random-walk-like"),
        "ate_cpu_m": float(np.sqrt(np.mean(
            np.sum((pa[:, :2] - gt[:, :2]) ** 2, axis=1)))),
        "ate_tpu_m": float(np.sqrt(np.mean(
            np.sum((pb[:, :2] - gt[:, :2]) ** 2, axis=1)))),
        "fmt_rot_absdiff_mean_rad": float(np.abs(b["fmt"] - a["fmt"]).mean()),
        "inlier_diff_mean": float(np.abs(
            b["inliers"].astype(int) - a["inliers"].astype(int)).mean()),
    }
    print(json.dumps(rep, indent=2))
    with open("PLATFORM_DIFF_r05.json", "w") as f:
        json.dump(rep, f, indent=2)


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run(sys.argv[2])
    else:
        compare()
