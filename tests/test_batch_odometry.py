"""Data-parallel segment odometry: parity with sequential runs + joining."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models import frontend
from radarslampy_tpu.models.frontend import build_frame_maps
from radarslampy_tpu.parallel.batch_odometry import (
    batched_init,
    join_segments,
    make_batched_step,
    run_segments,
)
from radarslampy_tpu.parallel.mesh import make_mesh
from radarslampy_tpu.sim import fakedata as fd

CFG = SlamConfig(
    cart_size=512, cart_downsample=8, n_candidates=256, anms_top_k=100,
    k_max=128, mds_iterations=6, max_keyframes=64,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def _render_frames(rng, D, T):
    """[D, T, A, W] frames: D straight-line segments through one world."""
    frames = np.zeros(
        (D, T, CFG.num_azimuths, CFG.polar_width_padded), np.float32
    )
    for d in range(D):
        poses = np.zeros((T, 3))
        for t in range(1, T):
            poses[t] = poses[t - 1] + [2.0, 0.3 * (d % 2), 0.02]
        for t, (_, scan) in enumerate(
            fd.render_sequence(
                np.random.default_rng(100 + d), poses, CFG, n_landmarks=900,
                with_distortion=False, noise=0.01,
            )
        ):
            frames[d, t] = scan
    return frames


def test_batched_matches_sequential(rng, mesh):
    D, T = 8, 4
    frames = _render_frames(rng, D, T)
    maps = build_frame_maps(CFG)

    batched = run_segments(frames, maps, CFG, mesh)  # [D, T, 3]

    # sequential reference for two segments
    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, CFG))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, CFG))
    for d in (0, 5):
        state = init(jnp.asarray(frames[d, 0]), maps)
        seq = [np.zeros(3, np.float32)]
        for t in range(1, T):
            state, out = step(state, jnp.asarray(frames[d, t]), maps)
            seq.append(np.asarray(out.pose))
        seq = np.stack(seq)
        # vmap turns lax.cond into select (both branches run) so keyframe
        # bookkeeping may differ; poses must still agree closely
        np.testing.assert_allclose(batched[d], seq, atol=0.05)


def test_join_segments_chains_poses():
    a = np.array([[0, 0, 0], [1, 0, 0], [2, 0, np.pi / 2]], np.float64)
    b = np.array([[0, 0, 0], [1, 0, 0]], np.float64)  # forward in its frame
    joined = join_segments([a, b])
    assert joined.shape == (4, 3)
    # segment b's step is along a's final heading (+y)
    np.testing.assert_allclose(joined[-1][:2], [2, 1], atol=1e-5)
    np.testing.assert_allclose(joined[-1][2], np.pi / 2, atol=1e-5)
