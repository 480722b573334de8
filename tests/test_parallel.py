"""Multi-device paths on the virtual 8-CPU mesh: sharded pose graph + map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState
from radarslampy_tpu.models.posegraph import optimize_pose_graph
from radarslampy_tpu.parallel.dist_posegraph import optimize_pose_graph_sharded
from radarslampy_tpu.parallel.mesh import make_mesh
from radarslampy_tpu.parallel.sharded_map import (
    global_map_points,
    nearest_keyframes,
    shard_map_state,
)
from tests.test_posegraph import _ring_graph

CFG = SlamConfig(pg_iterations=15)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_posegraph_matches_dense(rng, mesh):
    g, gt, init = _ring_graph(rng)
    dense_poses, dense_cost = optimize_pose_graph(g, CFG)
    shard_poses, shard_cost = optimize_pose_graph_sharded(g, CFG, mesh)
    np.testing.assert_allclose(
        np.asarray(shard_poses), np.asarray(dense_poses), atol=1e-3
    )
    np.testing.assert_allclose(
        float(shard_cost), float(dense_cost), rtol=1e-3, atol=1e-4
    )


def _toy_map(M=64, K=8):
    rng = np.random.default_rng(7)
    poses = rng.uniform(-50, 50, (M, 3)).astype(np.float32)
    fw = rng.uniform(-60, 60, (M, K, 2)).astype(np.float32)
    fm = rng.uniform(size=(M, K)) > 0.3
    return MapState(
        poses=jnp.asarray(poses),
        feat_world=jnp.asarray(fw),
        feat_local=jnp.asarray(fw * 0.5),
        feat_ids=jnp.arange(M * K, dtype=jnp.int32).reshape(M, K),
        feat_mask=jnp.asarray(fm),
        velocities=jnp.zeros((M, 3), jnp.float32),
        cursor=jnp.int32(40),
        descriptors=jnp.asarray(rng.uniform(size=(M, 16, 80)).astype(np.float32)),
    )


def test_nearest_keyframes_sharded(mesh):
    m = _toy_map()
    ms = shard_map_state(m, mesh)
    q = np.asarray([5.0, -3.0, 0.0], np.float32)
    idx, dist, valid = nearest_keyframes(ms, q, k=5, mesh=mesh)
    idx, dist = np.asarray(idx), np.asarray(dist)
    # oracle: numpy over live prefix
    poses = np.asarray(m.poses)[:40]
    d = np.linalg.norm(poses[:, :2] - q[:2], axis=1)
    expect = np.sort(d)[:5]
    np.testing.assert_allclose(np.sort(dist), expect, rtol=1e-5)


def test_global_map_points_sharded(mesh):
    m = _toy_map()
    ms = shard_map_state(m, mesh)
    pts, mask = global_map_points(ms, mesh)
    pts, mask = np.asarray(pts), np.asarray(mask)
    # only live keyframes' valid features are exposed
    fm = np.asarray(m.feat_mask)
    live = np.zeros_like(fm)
    live[:40] = fm[:40]
    assert mask.sum() == live.sum()
    got = set(map(tuple, pts[mask].round(3)))
    expect = set(map(tuple, np.asarray(m.feat_world)[live].round(3)))
    assert got == expect
