"""Checkpoint round-trip + host visualisation smoke tests."""

import os

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState, SlamState, empty_map
from radarslampy_tpu.models.trajectory import Trajectory
from radarslampy_tpu.utils.checkpoint import load_state, save_state
from radarslampy_tpu.viz.plots import plot_map, plot_tracking, plot_trajectories

CFG = SlamConfig(cart_size=256, cart_downsample=16, k_max=32)


def _dummy_state(rng):
    K = CFG.k_max
    return SlamState(
        pose=jnp.asarray(rng.random(3), jnp.float32),
        velocity=jnp.asarray(rng.random(3), jnp.float32),
        prev_polar=jnp.asarray(
            rng.random((CFG.num_azimuths, CFG.polar_width_padded)), jnp.float32
        ),
        prev_cart=jnp.asarray(rng.random((256, 256)), jnp.float32),
        feat_px=jnp.asarray(rng.random((K, 2)) * 256, jnp.float32),
        feat_mask=jnp.asarray(rng.random(K) > 0.5),
        feat_id=jnp.arange(K, dtype=jnp.int32),
        next_id=jnp.int32(K),
        feat_world=jnp.asarray(rng.random((K, 2)), jnp.float32),
        kf_pose=jnp.zeros(3, jnp.float32),
        map=empty_map(CFG),
        frame_idx=jnp.int32(7),
    )


def test_checkpoint_roundtrip(rng, tmp_path):
    state = _dummy_state(rng)
    traj = Trajectory([1, 2, 3], [np.zeros(3), np.ones(3), 2 * np.ones(3)])
    path = str(tmp_path / "ckpt")
    save_state(path, state, traj)

    restored, traj_data = load_state(path, state)
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(state),
        __import__("jax").tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ts, poses = traj_data
    assert list(ts) == [1, 2, 3]
    np.testing.assert_allclose(poses[2], 2.0)


def test_plots_write_files(rng, tmp_path):
    est = np.cumsum(rng.random((20, 3)), axis=0)
    gt = est + rng.normal(0, 0.1, est.shape)
    p1 = str(tmp_path / "traj.jpg")
    plot_trajectories(gt, est, rmse=1.23, save_path=p1)
    assert os.path.getsize(p1) > 1000

    img = rng.random((64, 64))
    pts = rng.random((10, 2)) * 64
    p2 = str(tmp_path / "track.jpg")
    plot_tracking(img, img, pts, pts + 1.0, save_path=p2)
    assert os.path.getsize(p2) > 1000

    p3 = str(tmp_path / "map.jpg")
    plot_map(rng.random((100, 2)) * 50, rng.random(100) > 0.2,
             est_poses=est, subsample=1, save_path=p3)
    assert os.path.getsize(p3) > 1000


def test_prefetcher_propagates_decode_errors(tmp_path):
    """A corrupt/missing PNG must raise in the consumer, not hang the run
    (VERDICT.md weak #6: silently-dead worker left __iter__ waiting forever)."""
    import pytest

    from radarslampy_tpu.models.system import _Prefetcher

    bad = str(tmp_path / "missing.png")
    pf = _Prefetcher([bad], CFG, raw_u8=True)
    with pytest.raises(IOError):
        next(iter(pf))

    # corrupt bytes (valid path, not a PNG)
    corrupt = tmp_path / "corrupt.png"
    corrupt.write_bytes(b"not a png at all")
    pf2 = _Prefetcher([str(corrupt)], CFG, raw_u8=True)
    with pytest.raises(IOError):
        next(iter(pf2))


def test_run_resume_bitmatches_straight_run(tmp_path):
    """A run checkpointed mid-sequence and resumed must produce the same final
    pose and map as a single straight run (VERDICT.md next #8; replaces the
    reference's feature-npz resume, getTransformKLT.py:405-425)."""
    import pytest

    from tests.conftest import TINY_ROOT, tiny_available

    if not tiny_available():
        pytest.skip("tiny dataset unavailable")

    from radarslampy_tpu.models.system import RadarSlamSystem

    cfg = SlamConfig(cart_size=1024, cart_downsample=4, n_candidates=512,
                     mds_iterations=8)
    straight = RadarSlamSystem("tiny", data_root=TINY_ROOT, cfg=cfg).run(0, 8)

    ckpt = str(tmp_path / "ckpt")
    sys_b = RadarSlamSystem("tiny", data_root=TINY_ROOT, cfg=cfg)
    first_half = sys_b.run(0, 4, checkpoint_dir=ckpt)
    resumed = sys_b.run(end=8, resume_from=ckpt)

    assert first_half.frames == 5
    assert resumed.frames == 4  # frames 5..8
    _, sp = straight.trajectory.as_arrays()
    _, rp = resumed.trajectory.as_arrays()
    np.testing.assert_array_equal(sp, rp)
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(straight.final_state),
        __import__("jax").tree_util.tree_leaves(resumed.final_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
