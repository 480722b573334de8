"""Device-side renderer + device-render evaluation chunk tests (round 3).

The long-sequence eval renders scans ON DEVICE inside the chunk program
(sim/render_device.py, evaluation.make_eval_chunk) — the fix for the round-2
full-sequence stall (VERDICT.md missing #1).  These tests pin:
  * host/device renderer parity (same world, pose, velocity, no noise),
  * chunk-size invariance of the device-render eval (incl. masked tail pads),
  * that padded tail frames leave the state untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.sim import fakedata as fd
from radarslampy_tpu.sim.render_device import quantize_u8, render_polar_scan_device

SMALL = SlamConfig(
    cart_size=512,
    cart_downsample=8,
    n_candidates=256,
    anms_top_k=100,
    k_max=128,
    mds_iterations=4,
    max_keyframes=128,
)


def test_device_renderer_matches_host():
    """Same landmarks/pose/velocity, no noise: the JAX renderer reproduces the
    host renderer's image (identical blob placement + Gaussian math; float32
    vs float64 rounding tolerance only)."""
    cfg = SMALL
    rng = np.random.default_rng(3)
    world_pts, world_refl = fd.make_world(rng, 300, 120.0)
    pose = np.array([5.0, -3.0, 0.4])
    vel = np.array([8.0, 0.5, 0.05])

    host = fd.render_polar_scan(world_pts, world_refl, pose, cfg,
                                velocity=vel, noise=0.0, rng=None)
    dev = np.asarray(render_polar_scan_device(
        jnp.asarray(world_pts, jnp.float32), jnp.asarray(world_refl, jnp.float32),
        jnp.asarray(pose, jnp.float32), jnp.asarray(vel, jnp.float32),
        jax.random.PRNGKey(0), cfg, noise=0.0, k_vis=256,
    ))
    assert dev.shape == host.shape
    # identical splat positions except for sub-ULP rounding flips at cell
    # boundaries: demand near-exact agreement on 99.5% of pixels and a tiny
    # mean error overall
    diff = np.abs(dev - host)
    assert np.quantile(diff, 0.995) < 1e-3, float(np.quantile(diff, 0.995))
    assert diff.mean() < 1e-4, float(diff.mean())


def test_device_renderer_quantize_roundtrip():
    cfg = SMALL
    rng = np.random.default_rng(0)
    world_pts, world_refl = fd.make_world(rng, 300, 120.0)
    img = render_polar_scan_device(
        jnp.asarray(world_pts, jnp.float32), jnp.asarray(world_refl, jnp.float32),
        jnp.zeros(3), jnp.zeros(3), jax.random.PRNGKey(1), cfg, noise=0.02,
        k_vis=256,
    )
    q = quantize_u8(img)
    assert q.dtype == jnp.uint8
    back = np.asarray(q, np.float32) / 255.0
    assert np.abs(back - np.asarray(img)).max() <= 0.5 / 255.0 + 1e-6


def test_eval_chunk_size_invariance():
    """The device-render eval produces bit-identical trajectories for any
    chunking (noise keys fold in absolute frame indices; the padded tail is a
    masked passthrough)."""
    from radarslampy_tpu.evaluation import evaluate_sequence, gt_subsequence

    poses = gt_subsequence(
        "/root/reference/data/full_seq_1/gt/radar_odometry.csv", 0, 33
    )
    r1 = evaluate_sequence(poses, SMALL, chunk_frames=16, progress_every=0)
    r2 = evaluate_sequence(poses, SMALL, chunk_frames=8, progress_every=0)
    assert r1.n_keyframes == r2.n_keyframes
    assert abs(r1.ate_odometry - r2.ate_odometry) < 1e-6
    # 33 poses -> 32 steps: chunk 16 divides evenly, chunk 8 divides evenly;
    # also check a chunk size that forces a padded tail (32 = 2*13 + 6)
    r3 = evaluate_sequence(poses, SMALL, chunk_frames=13, progress_every=0)
    assert abs(r1.ate_odometry - r3.ate_odometry) < 1e-6
    assert r1.n_keyframes == r3.n_keyframes


def test_eval_chunk_padded_tail_noop():
    """Frames with valid=False must not touch the state."""
    from radarslampy_tpu.evaluation import make_eval_chunk
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps

    cfg = SMALL
    maps = build_frame_maps(cfg)
    rng = np.random.default_rng(0)
    world_pts, world_refl = fd.make_world(rng, 300, 120.0)
    wp = jnp.asarray(world_pts, jnp.float32)
    wr = jnp.asarray(world_refl, jnp.float32)
    scan0 = fd.render_polar_scan(world_pts, world_refl, np.zeros(3), cfg,
                                 rng=rng, noise=0.02)
    state = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))(
        jnp.asarray(scan0), maps
    )
    chunk = make_eval_chunk(cfg, noise=0.02)
    F = 4
    key = jax.random.PRNGKey(0)
    all_invalid = jnp.zeros(F, bool)
    poses_f = jnp.zeros((F, 3), jnp.float32)
    vels_f = jnp.zeros((F, 3), jnp.float32)
    fids = jnp.arange(1, F + 1, dtype=jnp.int32)
    before = jax.device_get(state)
    state2, outs = chunk(state, poses_f, vels_f, fids, all_invalid, key,
                         wp, wr, maps)
    after = jax.device_get(state2)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # packed [F, 6] rows: [x, y, theta, n_inliers, fit_ok, did_retrack] —
    # skipped frames report zero inliers / no fit / no retrack and echo the
    # (unchanged) state pose
    packed = np.asarray(outs)
    assert packed.shape == (F, 6)
    np.testing.assert_array_equal(packed[:, 3:], 0.0)
    np.testing.assert_array_equal(
        packed[:, :3], np.broadcast_to(np.asarray(state2.pose), (F, 3))
    )


def test_sum_mode_renderer_parity_and_features():
    """mode='sum' (one-matmul additive splat — the TPU fast path; scatter-max
    costs ~450 ms/frame on the real chip): host and device agree, and the
    image matches mode='max' away from blob overlaps (same blobs, same
    positions; tails <1e-4)."""
    cfg = SMALL
    rng = np.random.default_rng(3)
    world_pts, world_refl = fd.make_world(rng, 300, 120.0)
    pose = np.array([5.0, -3.0, 0.4])
    vel = np.array([8.0, 0.5, 0.05])

    host = fd.render_polar_scan(world_pts, world_refl, pose, cfg,
                                velocity=vel, noise=0.0, rng=None, mode="sum")
    dev = np.asarray(render_polar_scan_device(
        jnp.asarray(world_pts, jnp.float32), jnp.asarray(world_refl, jnp.float32),
        jnp.asarray(pose, jnp.float32), jnp.asarray(vel, jnp.float32),
        jax.random.PRNGKey(0), cfg, noise=0.0, k_vis=256, mode="sum",
    ))
    diff = np.abs(dev - host)
    assert diff.max() < 2e-3, float(diff.max())
    # vs max-mode: identical except where blobs overlap (sum >= max) and the
    # truncated 9-px tails; bulk of pixels equal
    mx = fd.render_polar_scan(world_pts, world_refl, pose, cfg,
                              velocity=vel, noise=0.0, rng=None, mode="max")
    assert np.quantile(np.abs(host - mx), 0.99) < 2e-2
    assert (host - mx).min() > -2e-2  # sum only ADDS relative to max


def test_eval_sum_renderer_tracks_same_motion():
    """The sum-mode eval chunk tracks the same GT motion to a comparable ATE
    as the max-mode one (same world, same noise keys)."""
    import os

    from radarslampy_tpu import evaluation

    gt = "/root/reference/data/full_seq_1/gt/radar_odometry.csv"
    if not os.path.exists(gt):
        pytest.skip("full_seq_1 GT absent")
    poses = evaluation.gt_subsequence(gt, 2000, 40)
    a = evaluation.evaluate_sequence(poses, SMALL, seed=3, chunk_frames=16,
                                     renderer="max")
    b = evaluation.evaluate_sequence(poses, SMALL, seed=3, chunk_frames=16,
                                     renderer="sum")
    assert b.frames == a.frames
    assert b.ate_odometry < max(2.0 * a.ate_odometry, 1.0), (
        b.ate_odometry, a.ate_odometry)
