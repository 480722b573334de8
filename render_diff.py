"""Direct CPU-vs-TPU diff of the DEVICE renderer's output.

The round-5 elimination chain: per-frame SLAM step on identical scans is
platform-clean (PLATFORM_DIFF_r05); CPU+device-render evals are clean
(0.62 m / 1100 frames); TPU+device-render drifts 57 m — with accurate
trig AND exp already in the renderer. This measures what actually
differs: the same `render_polar_scan_device` call, same args, on both
platforms, compared as images AND as CPU-extracted feature positions
(the quantity the tracker consumes).

Usage: python render_diff.py {cpu|tpu}   then: python render_diff.py compare
"""

import json
import sys

import numpy as np

GT_CSV = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"
FRAMES = [451, 455, 460, 700, 900, 1050]   # turning/late-route frames


def run(tag):
    import jax

    if tag == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.evaluation import gt_subsequence
    from radarslampy_tpu.sim import fakedata as fd
    from radarslampy_tpu.sim.render_device import (
        quantize_u8, render_polar_scan_device,
    )

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    poses = gt_subsequence(GT_CSV, 0, 1100)
    rng = np.random.default_rng(0)
    wp, wr = fd.make_world_corridor(rng, poses, cfg.max_range_clip_m,
                                    per_scan=80.0)
    wp = jnp.asarray(wp, jnp.float32)
    wr = jnp.asarray(wr, jnp.float32)
    key = jax.random.PRNGKey(0)
    period = cfg.scan_period_s
    imgs = []
    for t in FRAMES:
        dp = poses[t] - poses[t - 1]
        c, s = np.cos(poses[t][2]), np.sin(poses[t][2])
        vel = np.array([c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1],
                        dp[2]]) / period
        k = jax.random.fold_in(key, t)
        img = render_polar_scan_device(wp, wr, jnp.asarray(poses[t]),
                                       jnp.asarray(vel, jnp.float32), k, cfg,
                                       noise=0.02, k_vis=512, mode="sum")
        imgs.append(np.asarray(quantize_u8(img)))
    np.savez(f"RENDER_{tag}.npz", imgs=np.stack(imgs),
             frames=np.asarray(FRAMES))
    print(f"RENDER_{tag}.npz written", flush=True)


def compare():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.ops.features import get_features
    from radarslampy_tpu.ops.routed_warp import routed_polar_to_cartesian

    a = np.load("RENDER_cpu.npz")["imgs"].astype(np.int16)
    b = np.load("RENDER_tpu.npz")["imgs"].astype(np.int16)
    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    maps = build_frame_maps(cfg)
    rows = []
    for i, f in enumerate(FRAMES):
        d = np.abs(a[i] - b[i])
        # CPU-side feature extraction on BOTH images: isolates the renderer
        def feats(img_u8):
            polar = jnp.asarray(img_u8.astype(np.float32) / 255.0)
            cart = routed_polar_to_cartesian(polar, maps.routed)
            c = get_features(cart, cfg, maps.doh)
            return np.asarray(c.xy), np.asarray(c.mask)

        xy_a, m_a = feats(a[i])
        xy_b, m_b = feats(b[i])
        both = m_a & m_b
        # nearest-match displacement of shared features
        shift = []
        for j in np.nonzero(both)[0][:200]:
            dd = np.linalg.norm(xy_b[m_b] - xy_a[j], axis=1)
            shift.append(dd.min())
        rows.append({
            "frame": int(f),
            "px_diff_max": int(d.max()),
            "px_diff_mean": round(float(d.mean()), 4),
            "frac_pixels_differ": round(float((d > 0).mean()), 4),
            "n_feats_cpu": int(m_a.sum()), "n_feats_tpu": int(m_b.sum()),
            "feat_shift_median_px": (round(float(np.median(shift)), 4)
                                     if shift else None),
            "feat_shift_p90_px": (round(float(np.quantile(shift, 0.9)), 4)
                                  if shift else None),
        })
        print(json.dumps(rows[-1]), flush=True)
    with open("RENDER_DIFF_r05.json", "w") as fjson:
        json.dump(rows, fjson, indent=2)


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        run(sys.argv[1])
