"""End-to-end: full pipeline on real Oxford frames (data/tiny) + synthetic seq.

data/tiny (11 real frames + GT odometry) is the reference's de-facto
integration fixture (SURVEY.md §4); over 11 frames at ~4Hz the platform moves
only a few metres, so we assert the estimated trajectory stays within a small
ATE of GT — with actual assertions, unlike the reference's eyeballed plots.
"""

import os

import numpy as np
import pytest

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.system import RadarSlamSystem

from tests.conftest import TINY_ROOT, tiny_available

# CPU tests: reduced Cartesian resolution for speed (same m/px geometry scaled)
CPU_CFG = SlamConfig(
    cart_size=1024,
    cart_downsample=4,
    n_candidates=512,
    mds_iterations=8,
)


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_tiny_sequence_runs_and_tracks(tmp_path):
    sys_ = RadarSlamSystem("tiny", data_root=TINY_ROOT, cfg=CPU_CFG)
    outs = []
    sys_.progress = lambda i, o: outs.append(o)
    metrics = tmp_path / "metrics.jsonl"
    res = sys_.run(optimize=True, ba=True, metrics_path=str(metrics))
    assert res.frames == 11
    assert res.n_keyframes >= 1
    # tracking must be healthy on real data
    n_inl = np.array([int(o.n_inliers) for o in outs])
    assert n_inl.min() > 30, f"inliers collapsed: {n_inl}"
    assert res.min_inliers == n_inl.min()
    assert res.n_fit_failures == 0
    # all poses finite
    _, poses = res.trajectory.as_arrays()
    assert np.isfinite(poses).all()
    # ~11 frames at city driving speed: total motion bounded
    dists = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    assert dists.max() < 10.0, f"absurd per-frame motion: {dists}"
    # ATE vs GT over the covered window
    assert res.rmse_vs_gt is not None
    assert res.rmse_vs_gt < 5.0, f"ATE {res.rmse_vs_gt:.2f} m too high on tiny"
    # bundle adjustment ran over the persistent landmarks and stayed sane:
    # refined keyframe poses must remain close to the odometry keyframes
    # (11 frames, negligible drift — BA must not tear the map apart)
    assert res.kf_poses_ba is not None
    assert res.landmarks_ba is not None and len(res.landmarks_ba) > 10
    kf_odo = np.asarray(res.final_state.map.poses)[: res.n_keyframes]
    assert np.linalg.norm(
        res.kf_poses_ba[:, :2] - kf_odo[:, :2], axis=1
    ).max() < 2.0
    # structured per-frame metrics stream (SURVEY.md §5.5): one record per
    # stepped frame, consistent with the in-band health outputs
    import json

    recs = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(recs) == res.frames - 1
    assert [r["n_inliers"] for r in recs] == [int(o.n_inliers) for o in outs]
    assert all(r["fit_ok"] for r in recs)
    assert sum(r["is_keyframe"] for r in recs) == res.n_keyframes - 1
    assert recs[0]["frame"] == 1 and recs[-1]["frame"] == 10
    assert all(isinstance(r["timestamp"], int) for r in recs)


def test_synthetic_sequence_odometry(rng):
    """Known-GT synthetic world: end-to-end drift must stay small."""
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig(
        cart_size=1024, cart_downsample=4, n_candidates=512, mds_iterations=8
    )
    maps = build_frame_maps(cfg)

    T = 8
    poses = np.zeros((T, 3))
    for t in range(1, T):
        th = poses[t - 1, 2]
        step_m = 2.0
        poses[t] = poses[t - 1] + [step_m * np.cos(th), step_m * np.sin(th), 0.04]

    frames = [s for _, s in fd.render_sequence(rng, poses, cfg, n_landmarks=1200,
                                               with_distortion=True, noise=0.01)]

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg))

    # note: the renderer's world frame is the image frame (y down); GT poses are
    # interpreted in that same frame, so comparison is direct.
    state = init(jnp.asarray(frames[0]), maps)
    est = [np.asarray(state.pose)]
    for f in frames[1:]:
        state, out = step(state, jnp.asarray(f), maps)
        est.append(np.asarray(out.pose))
    est = np.stack(est)

    assert np.isfinite(est).all()
    err = np.linalg.norm(est[:, :2] - poses[:, :2], axis=1)
    assert err[-1] < 1.5, f"drift {err} m over {T} frames"


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_u8_ingest_matches_float():
    """Raw-u8 transfer + on-device dequantisation is numerically identical to
    shipping float32 (u8/255 is the exact decode math, parseData.py:43)."""
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.io import oxford
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps

    seq = oxford.sequence_paths(TINY_ROOT, "tiny")
    paths = oxford.radar_image_paths(seq["radar"], seq["timestamps"])[:3]
    cfg = CPU_CFG
    maps = build_frame_maps(cfg)

    f32 = [oxford.decode_radar_png(p, cfg) for p in paths]
    u8 = [oxford.decode_radar_png(p, cfg, raw_u8=True) for p in paths]
    for a, b in zip(f32, u8):
        assert b.power.dtype == np.uint8
        np.testing.assert_allclose(
            a.power, b.power.astype(np.float32) / 255.0, atol=1e-7)
        np.testing.assert_array_equal(a.timestamps, b.timestamps)

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg))
    sf = init(f32[0].power, maps)
    su = init(u8[0].power, maps)
    for t in (1, 2):
        sf, of = step(sf, f32[t].power, maps)
        su, ou = step(su, u8[t].power, maps)
    # poses agree to mm (the only input difference is 1 ulp from host /255 vs
    # device *(1/255); iterative KLT amplifies it slightly over frames)
    np.testing.assert_allclose(np.asarray(of.pose), np.asarray(ou.pose),
                               atol=5e-3)


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_native_u8_decode_matches_python():
    from radarslampy_tpu.io import oxford
    from radarslampy_tpu.io.native_loader import (
        decode_radar_png_native, native_available)

    if not native_available():
        pytest.skip("native loader toolchain unavailable")
    seq = oxford.sequence_paths(TINY_ROOT, "tiny")
    path = oxford.radar_image_paths(seq["radar"], seq["timestamps"])[0]
    cfg = CPU_CFG
    py = oxford.decode_radar_png(path, cfg, raw_u8=True)
    nat = decode_radar_png_native(path, cfg, raw_u8=True)
    np.testing.assert_array_equal(py.power, nat.power)
    np.testing.assert_array_equal(py.timestamps, nat.timestamps)
    np.testing.assert_allclose(py.azimuths, nat.azimuths, atol=1e-6)
    # float API still agrees with its own u8 bytes
    natf = decode_radar_png_native(path, cfg)
    np.testing.assert_array_equal(
        natf.power, nat.power.astype(np.float32) * np.float32(1.0 / 255.0))


@pytest.mark.skipif(not tiny_available(), reason="tiny dataset unavailable")
def test_long_run_bounded_handles_with_metrics(rng, tmp_path):
    """A 600-frame run() with --metrics through the driver loop: per-frame
    rows are consolidated into [256, 8] device blocks, so live handles stay
    O(frames/256) — the long-sequence fix for the axon ~1k-live-handle wedge
    (VERDICT.md r03 weak #5).  Feeds synthetic frames through the public
    `frame_source` hook; the full 8.8k-frame proof runs on the chip via the
    eval harness (EVAL_r04.json)."""
    import json
    from collections import namedtuple

    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig(cart_size=512, cart_downsample=8, n_candidates=256,
                     anms_top_k=100, k_max=128, mds_iterations=4,
                     max_keyframes=256)
    T = 600
    poses = np.zeros((T, 3))
    for t in range(1, T):
        th = poses[t - 1, 2]
        poses[t] = poses[t - 1] + [0.6 * np.cos(th), 0.6 * np.sin(th), 0.004]
    world_pts, refl = fd.make_world_corridor(rng, poses, cfg.max_range_clip_m,
                                             per_scan=60.0)

    Frame = namedtuple("Frame", "power frame_timestamp")

    def source():
        period = cfg.scan_period_s
        for t in range(T):
            if t > 0:
                dp = poses[t] - poses[t - 1]
                c, s = np.cos(poses[t][2]), np.sin(poses[t][2])
                vel = np.array([c * dp[0] + s * dp[1],
                                -s * dp[0] + c * dp[1], dp[2]]) / period
            else:
                vel = np.zeros(3)
            scan = fd.render_polar_scan(world_pts, refl, poses[t], cfg,
                                        velocity=vel, rng=rng, noise=0.02)
            u8 = np.clip(np.rint(scan * 255.0), 0, 255).astype(np.uint8)
            yield Frame(power=u8, frame_timestamp=1000 + t)

    sys_ = RadarSlamSystem("tiny", data_root=TINY_ROOT, cfg=cfg)
    sys_.gt_traj = None  # synthetic motion is unrelated to tiny's GT
    metrics = tmp_path / "metrics.jsonl"
    res = sys_.run(metrics_path=str(metrics), frame_source=source())

    assert res.frames == T
    _, est = res.trajectory.as_arrays()
    assert est.shape == (T, 3) and np.isfinite(est).all()
    # odometry must actually track the synthetic motion.  The bound is loose
    # (this config is 0.35 m/px, 4 LM iters — accuracy is pinned elsewhere);
    # it exists to catch a *lost* tracker, not to measure drift.
    path_len = float(
        np.sum(np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1))
    )
    err = np.linalg.norm(est[-1, :2] - poses[-1, :2])
    assert err < 0.25 * path_len, \
        f"end drift {err:.1f} m over {path_len:.0f} m path"
    assert res.n_keyframes > 50
    assert res.min_inliers > 10
    recs = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(recs) == T - 1
    assert recs[-1]["frame"] == T - 1
    assert sum(r["is_keyframe"] for r in recs) == res.n_keyframes - 1


def test_chunked_step_matches_per_frame(rng):
    """slam_step_chunk (lax.scan macro-step, one dispatch per F frames) must
    match per-frame stepping.  Not bit-identical — XLA fuses the scan body
    differently than the standalone jit, so float32 rounding drifts at the
    1e-4 relative level — but poses and state must agree far below any
    physically meaningful scale (mm here)."""
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig(cart_size=512, cart_downsample=8, n_candidates=256,
                     anms_top_k=100, k_max=128, mds_iterations=6)
    maps = build_frame_maps(cfg)
    T = 7
    poses = np.zeros((T, 3))
    for t in range(1, T):
        poses[t] = poses[t - 1] + [1.5, 0.3, 0.03]
    world_pts, refl = fd.make_world(rng, 600, 60.0)
    frames = [fd.render_polar_scan(world_pts, refl, p, cfg, rng=rng, noise=0.01)
              for p in poses]

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg))
    chunk = jax.jit(lambda s, ps, m: frontend.slam_step_chunk(s, ps, m, cfg))

    s_a = init(jnp.asarray(frames[0]), maps)
    outs_a = []
    for f in frames[1:]:
        s_a, o = step(s_a, jnp.asarray(f), maps)
        outs_a.append(np.asarray(o.pose))

    s_b = init(jnp.asarray(frames[0]), maps)
    s_b, outs_b = chunk(s_b, jnp.stack([jnp.asarray(f) for f in frames[1:]]), maps)

    np.testing.assert_allclose(np.stack(outs_a), np.asarray(outs_b.pose),
                               atol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_b)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "iub":
            np.testing.assert_array_equal(a, b)
        else:
            # rtol covers pixel-scale coords (hundreds of px); atol the
            # near-zero entries
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-2)
