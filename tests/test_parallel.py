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
        pc_local=jnp.zeros((M, 8, 2), jnp.float32),
        pc_mask=jnp.zeros((M, 8), dtype=bool),
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


def test_sharded_appearance_retrieval_matches_dense(mesh):
    """Sharded scan-context retrieval must select the same loop candidates as
    the dense single-device search (same pairs, distances, rotation inits)."""
    from radarslampy_tpu.models.placerecog import find_candidates_appearance
    from radarslampy_tpu.parallel.sharded_map import appearance_candidates_sharded

    rng = np.random.default_rng(11)
    M, R, S = 64, 16, 80
    descs = rng.uniform(0.0, 1.0, (M, R, S)).astype(np.float32)
    # plant a genuine revisit: keyframe 40 sees keyframe 5's scene rotated
    descs[40] = np.roll(descs[5], 13, axis=1) + rng.normal(0, 0.01, (R, S))
    cursor = 50

    m = _toy_map(M=M)._replace(
        descriptors=jnp.asarray(descs), cursor=jnp.int32(cursor)
    )
    dense = find_candidates_appearance(
        m.descriptors, m.cursor, max_candidates=6, min_index_gap=10
    )
    ms = shard_map_state(m, mesh)
    shard = appearance_candidates_sharded(ms, mesh, max_candidates=6,
                                          min_index_gap=10)

    def as_set(c):
        return {
            (int(i), int(j), round(float(d), 5))
            for i, j, d, v in zip(c.i, c.j, c.distance, c.valid) if bool(v)
        }

    assert as_set(shard) == as_set(dense)
    # the planted revisit is found with the right rotation initialiser
    pairs = [(int(i), int(j)) for i, j in zip(shard.i, shard.j)]
    assert (5, 40) in pairs
    rot = float(shard.rot_init[pairs.index((5, 40))])
    expect = -(13 * 2 * np.pi / S)
    expect = (expect + np.pi) % (2 * np.pi) - np.pi
    assert abs(rot - expect) < 1e-5


def test_sharded_pcg_matches_single_device(rng, mesh):
    """Matrix-free sharded PCG (psum of [M,3] per sweep) == single-device PCG."""
    g, gt, init = _ring_graph(rng)
    single, c1 = optimize_pose_graph(g, CFG, method="pcg")
    shard, c8 = optimize_pose_graph_sharded(g, CFG, mesh, method="pcg")
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single), atol=1e-3)
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-3, atol=1e-4)


def test_sharded_gather_matches_single_device(rng, mesh):
    """Communication-avoiding gather mode (one all-gather per solve, then
    replicated local PCG) == single-device PCG (VERDICT.md r02 weak #5)."""
    g, gt, init = _ring_graph(rng)
    single, c1 = optimize_pose_graph(g, CFG, method="pcg")
    shard, c8 = optimize_pose_graph_sharded(g, CFG, mesh, method="gather")
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single), atol=1e-3)
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-3, atol=1e-4)


def test_sharded_verify_matches_serial(rng, mesh):
    """Candidate-sharded ICP verification fan-out == serial verify_candidate
    on every candidate (the compute-bound scaling surface)."""
    from radarslampy_tpu.models.loopclosure import find_candidates, verify_candidate
    from radarslampy_tpu.parallel.dist_verify import (
        pad_candidates,
        verify_candidates_sharded,
    )
    from tests.test_loopclosure import _loop_map

    cfg = SlamConfig(pg_iterations=10)
    ms, gt = _loop_map(rng, drift=0.5)
    ms = ms._replace(poses=jnp.asarray(np.pad(
        np.asarray(ms.poses),
        ((0, ms.feat_local.shape[0] - int(ms.poses.shape[0])), (0, 0)),
    )))
    c = find_candidates(ms.poses, ms.cursor, max_candidates=12, radius_m=8.0,
                        min_index_gap=20)
    rot = jnp.full(12, jnp.nan, jnp.float32)
    ci, cj, cv, cr = pad_candidates(c.i, c.j, c.valid, rot, 8)

    sharded = verify_candidates_sharded(ms, ci, cj, cv, cr, cfg, mesh)

    serial = jax.vmap(
        lambda i, j, v, r: jax.tree_util.tree_map(
            lambda x: x,
            verify_candidate(ms, i, j, cfg, rot_override=r),
        )
    )(ci, cj, cv, cr)
    ok_serial = np.asarray(serial.ok) & np.asarray(cv)
    np.testing.assert_array_equal(np.asarray(sharded.ok), ok_serial)
    sel = ok_serial
    np.testing.assert_allclose(
        np.asarray(sharded.rel_pose)[sel], np.asarray(serial.rel_pose)[sel],
        atol=1e-5,
    )
    assert ok_serial.any()
