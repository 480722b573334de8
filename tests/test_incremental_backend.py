"""Incremental backend (round 3, VERDICT.md r02 weak #4): verified loop
edges persist across passes, each pass retrieves/verifies only pairs whose
later keyframe is new, and the accumulated result matches a full recompute.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState, SlamState
from radarslampy_tpu.models.loopclosure import (
    BackendState,
    close_loops,
    graph_with_loop_edges,
    incremental_backend,
    scan_new_loops,
    trim_map_state,
)
from radarslampy_tpu.models.posegraph import optimize_pose_graph

from tests.test_loopclosure import _local_view, _loop_map


def _revisit_map(rng, n_base=520, n_planted=13, gap=40, M_cap=1024, K=64,
                 drift_m=4.0):
    """Random-walk map with planted revisits spread over the whole run."""
    th = np.cumsum(rng.normal(0, 0.08, n_base))
    xy = np.cumsum(np.stack([2.0 * np.cos(th), 2.0 * np.sin(th)], 1), axis=0)
    gt = np.concatenate([xy, th[:, None]], axis=1)

    planted = []
    insert_every = n_base // (n_planted + 1)
    out = []
    src = 0
    for k in range(n_planted):
        j_pos = (k + 1) * insert_every
        out.append(gt[src:j_pos])
        i_k = max(0, j_pos - gap - rng.integers(5, 60))
        p = gt[i_k].copy()
        p[:2] += rng.normal(0, 0.5, 2)
        out.append(p[None])
        planted.append(int(i_k))
        src = j_pos
    out.append(gt[src:])
    gt = np.concatenate(out)
    M = len(gt)

    drift = np.linspace(0, drift_m, M)[:, None] * np.array([1.0, 0.4, 0.0])
    est = gt + drift

    world = rng.uniform(gt[:, :2].min() - 50, gt[:, :2].max() + 50, (3000, 2))
    feat_local = np.zeros((M_cap, K, 2), np.float32)
    feat_mask = np.zeros((M_cap, K), bool)
    for m in range(M):
        d = np.linalg.norm(world - gt[m][:2], axis=1)
        near = np.argsort(d)[: K // 2]
        feat_local[m, : len(near)] = _local_view(gt[m], world[near])
        feat_mask[m, : len(near)] = True

    ms = MapState(
        poses=jnp.asarray(np.pad(est, ((0, M_cap - M), (0, 0))).astype(np.float32)),
        feat_world=jnp.zeros((M_cap, K, 2), jnp.float32),
        feat_local=jnp.asarray(feat_local),
        feat_ids=jnp.full((M_cap, K), -1, jnp.int32),
        feat_mask=jnp.asarray(feat_mask),
        velocities=jnp.zeros((M_cap, 3), jnp.float32),
        cursor=jnp.int32(M),
        descriptors=jnp.zeros((M_cap, 16, 80), jnp.float32),
        pc_local=jnp.zeros((M_cap, 8, 2), jnp.float32),
        pc_mask=jnp.zeros((M_cap, 8), dtype=bool),
    )
    return ms, gt, M


def test_incremental_scan_matches_full_recompute(rng):
    """Union of per-pass scan_new_loops edges optimises to the same ATE as
    one full close_loops pass on the final map — and per-pass wall time stays
    ~flat as the map grows (the search is O(dM*M) with fixed dM block)."""
    cfg = SlamConfig(pg_iterations=15, loop_method="pose")
    gap = 40
    ms, gt, M = _revisit_map(rng)

    # ---- full recompute (the oracle) ----
    graph_full, matches_full = close_loops(ms, cfg, radius_m=12.0,
                                           min_index_gap=gap)
    n_full = int(np.asarray(matches_full.ok).sum())
    assert n_full >= 8, f"scenario too easy/hard: {n_full} loops"
    poses_full = np.asarray(optimize_pose_graph(graph_full, cfg)[0])[:M]
    err_full = np.linalg.norm(poses_full[:, :2] - gt[:, :2], axis=1).mean()
    err_drift = np.linalg.norm(
        np.asarray(ms.poses)[:M, :2] - gt[:, :2], axis=1
    ).mean()
    assert err_full < err_drift * 0.7

    # ---- incremental passes over a growing cursor ----
    acc_ij = np.zeros((0, 2), np.int32)
    acc_rel = np.zeros((0, 3), np.float32)
    prev = 0
    stage = 130
    wall = []
    for cur in range(stage, M + stage, stage):
        cur = min(cur, M)
        m_t = trim_map_state(ms._replace(cursor=jnp.int32(cur)),
                             pad_multiple=1024)
        t0 = time.perf_counter()
        nij, nrel = scan_new_loops(m_t, cfg, prev, radius_m=12.0,
                                   min_index_gap=gap)
        wall.append(time.perf_counter() - t0)
        acc_ij = np.concatenate([acc_ij, nij])
        acc_rel = np.concatenate([acc_rel, nrel])
        prev = cur
        if cur == M:
            break

    assert len(acc_ij) >= 0.7 * n_full, (len(acc_ij), n_full)
    graph_inc = graph_with_loop_edges(trim_map_state(ms), acc_ij, acc_rel)
    poses_inc = np.asarray(optimize_pose_graph(graph_inc, cfg)[0])[:M]
    err_inc = np.linalg.norm(poses_inc[:, :2] - gt[:, :2], axis=1).mean()
    # same correction quality as the full recompute
    assert err_inc < err_drift * 0.7
    assert err_inc < err_full * 1.5 + 0.1, (err_inc, err_full)

    # ---- per-pass cost stays flat (fixed-shape block search + verify):
    # later passes (map 4x bigger) within 3x of the first warm pass ----
    if len(wall) >= 3:
        assert wall[-1] < 3.0 * wall[1] + 0.2, wall


def test_incremental_backend_state_roundtrip(rng):
    """incremental_backend on a SlamState: first pass closes loops and
    re-anchors; a second pass with no new keyframes is a no-op that reuses
    the persisted edges (no re-verification)."""
    cfg = SlamConfig(pg_iterations=20, loop_method="pose")
    ms, gt = _loop_map(rng, drift=0.6)
    M = int(ms.cursor)
    K = ms.feat_local.shape[1]
    # _loop_map leaves poses unpadded (live rows only); a real MapState's
    # arrays all share the capacity leading axis — pad to match
    M_cap = ms.feat_local.shape[0]
    ms = ms._replace(poses=jnp.asarray(np.pad(
        np.asarray(ms.poses), ((0, M_cap - int(ms.poses.shape[0])), (0, 0))
    )))
    state = SlamState(
        pose=ms.poses[M - 1],
        velocity=jnp.zeros(3),
        prev_polar=jnp.zeros((4, 4), jnp.float32),
        prev_cart=jnp.zeros((4, 4), jnp.float32),
        feat_px=jnp.zeros((K, 2), jnp.float32),
        feat_mask=jnp.zeros(K, dtype=bool),
        feat_id=jnp.full(K, -1, jnp.int32),
        next_id=jnp.int32(0),
        feat_world=jnp.zeros((K, 2), jnp.float32),
        kf_pose=ms.poses[M - 1],
        map=ms,
        frame_idx=jnp.int32(M),
    )
    st2, n1, cost1, bs = incremental_backend(state, cfg)
    assert n1 >= 1
    assert bs.prev_cursor == M
    assert len(bs.edges_ij) == n1
    err_before = np.linalg.norm(
        np.asarray(state.map.poses)[:M, :2] - gt[:, :2], axis=1
    ).mean()
    err_after = np.linalg.norm(
        np.asarray(st2.map.poses)[:M, :2] - gt[:, :2], axis=1
    ).mean()
    assert err_after < err_before * 0.8

    st3, n2, cost2, bs2 = incremental_backend(st2, cfg, backend_state=bs)
    assert n2 == 0 and cost2 is None
    assert bs2.prev_cursor == M
    for a, b in zip(jax.tree_util.tree_leaves(st2),
                    jax.tree_util.tree_leaves(st3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
