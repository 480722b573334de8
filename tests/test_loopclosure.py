"""Loop closure: ICP verification + drift correction on a synthetic loop."""

import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState
from radarslampy_tpu.models.loopclosure import (
    close_loops,
    find_candidates,
    icp_align,
    verify_candidate,
)
from radarslampy_tpu.models.posegraph import optimize_pose_graph

CFG = SlamConfig(pg_iterations=20)


def _local_view(pose, world_pts):
    c, s = np.cos(pose[2]), np.sin(pose[2])
    d = world_pts - pose[:2]
    return np.stack([c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]], axis=1)


def test_icp_aligns_known_transform(rng):
    K = 64
    pts_j = rng.uniform(-30, 30, (K, 2)).astype(np.float32)
    rel_true = np.array([2.0, -1.0, 0.2], np.float32)
    c, s = np.cos(rel_true[2]), np.sin(rel_true[2])
    pts_i = pts_j @ np.array([[c, -s], [s, c]]).T + rel_true[:2]

    init = rel_true + np.array([0.5, 0.5, 0.05], np.float32)
    m = jnp.ones(K, dtype=bool)
    match = icp_align(jnp.asarray(pts_i), m, jnp.asarray(pts_j), m,
                      jnp.asarray(init))
    assert bool(match.ok)
    np.testing.assert_allclose(np.asarray(match.rel_pose), rel_true, atol=0.02)
    assert float(match.residual) < 0.05


def test_icp_partial_overlap(rng):
    K = 64
    pts_j = np.zeros((K, 2), np.float32)
    pts_i = np.zeros((K, 2), np.float32)
    shared = rng.uniform(-20, 20, (40, 2)).astype(np.float32)
    rel_true = np.array([1.0, 0.5, -0.1], np.float32)
    c, s = np.cos(rel_true[2]), np.sin(rel_true[2])
    pts_j[:40] = shared
    pts_i[:40] = shared @ np.array([[c, -s], [s, c]]).T + rel_true[:2]
    # unshared clutter
    pts_j[40:] = rng.uniform(50, 80, (24, 2))
    pts_i[40:] = rng.uniform(-80, -50, (24, 2))
    m = jnp.ones(K, dtype=bool)
    match = icp_align(jnp.asarray(pts_i), m, jnp.asarray(pts_j), m,
                      jnp.asarray(rel_true + np.float32(0.3)))
    np.testing.assert_allclose(np.asarray(match.rel_pose), rel_true, atol=0.05)


def _loop_map(rng, n=30, drift=0.4):
    """Square loop of keyframes; last keyframe physically at the first's spot
    but with accumulated drift in its pose estimate."""
    side = n // 4
    gt = []
    pose = np.zeros(3)
    for leg in range(4):
        for _ in range(side):
            gt.append(pose.copy())
            c, s = np.cos(pose[2]), np.sin(pose[2])
            pose[:2] += np.array([c, s]) * 4.0
        pose[2] += np.pi / 2
    gt = np.array(gt)

    world = rng.uniform(-30, 50, (300, 2))

    M, K = 64, 64
    ms = MapState(
        poses=jnp.zeros((M, 3), jnp.float32),
        feat_world=jnp.zeros((M, K, 2), jnp.float32),
        feat_local=jnp.zeros((M, K, 2), jnp.float32),
        feat_ids=jnp.full((M, K), -1, jnp.int32),
        feat_mask=jnp.zeros((M, K), dtype=bool),
        velocities=jnp.zeros((M, 3), jnp.float32),
        cursor=jnp.int32(len(gt)),
        descriptors=jnp.zeros((M, 16, 80), jnp.float32),
        pc_local=jnp.zeros((M, 8, 2), jnp.float32),
        pc_mask=jnp.zeros((M, 8), dtype=bool),
    )
    poses_est = gt.copy()
    # linear drift along the run
    poses_est[:, 0] += np.linspace(0, drift, len(gt))
    poses_est[:, 1] += np.linspace(0, drift * 0.5, len(gt))

    feat_local = np.zeros((M, K, 2), np.float32)
    feat_mask = np.zeros((M, K), bool)
    for m in range(len(gt)):
        d = np.linalg.norm(world - gt[m][:2], axis=1)
        near = np.argsort(d)[:K // 2]
        feat_local[m, : len(near)] = _local_view(gt[m], world[near])
        feat_mask[m, : len(near)] = True

    ms = ms._replace(
        poses=jnp.asarray(poses_est.astype(np.float32)),
        feat_local=jnp.asarray(feat_local),
        feat_mask=jnp.asarray(feat_mask),
    )
    return ms, gt


def test_find_candidates_prefers_revisits(rng):
    ms, gt = _loop_map(rng)
    cands = find_candidates(ms.poses, ms.cursor, max_candidates=8,
                            radius_m=8.0, min_index_gap=20)
    i, j, v = np.asarray(cands.i), np.asarray(cands.j), np.asarray(cands.valid)
    assert v.any()
    # the best candidate must pair the loop start with the loop end region
    assert i[0] < 5 and j[0] >= 25


def test_close_loops_reduces_drift(rng):
    ms, gt = _loop_map(rng, drift=0.6)
    graph, matches = close_loops(ms, CFG, max_candidates=8, radius_m=8.0,
                                 min_index_gap=20)
    assert int(matches.ok.sum()) >= 1, "no loop closure accepted"
    poses_opt, cost = optimize_pose_graph(graph, CFG)
    poses_opt = np.asarray(poses_opt)[: int(ms.cursor)]
    est = np.asarray(ms.poses)[: int(ms.cursor)]
    err_before = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1).mean()
    err_after = np.linalg.norm(poses_opt[:, :2] - gt[:, :2], axis=1).mean()
    assert err_after < err_before * 0.8, (err_before, err_after)


def test_verify_survives_large_drift(rng):
    """Post-hoc verification under ~45 m of accumulated drift (VERDICT.md
    r04 next #6): the pose-derived translation init is tens of metres wrong,
    far outside the ICP annealing radius — the zero-translation starts in
    `verify_candidate`'s multi-start fan plus an appearance-style rotation
    prior must still lock on, because the TRUE relative translation of a
    revisit pair is only a few metres."""
    ms, gt = _loop_map(rng, drift=45.0)
    i, j = 0, int(ms.cursor) - 1           # loop start vs loop end (revisit)
    assert np.linalg.norm(gt[j, :2] - gt[i, :2]) < 8.0, "not a revisit pair"
    # drifted pose-derived init is ~50 m off — precondition for the test
    est = np.asarray(ms.poses)
    init_err = np.linalg.norm((est[j, :2] - est[i, :2]) - (gt[j, :2] - gt[i, :2]))
    assert init_err > 40.0, init_err

    # true relative pose (what the edge should measure)
    d = gt[j, :2] - gt[i, :2]
    c0, s0 = np.cos(gt[i, 2]), np.sin(gt[i, 2])
    rel_true = np.array([c0 * d[0] + s0 * d[1], -s0 * d[0] + c0 * d[1],
                         (gt[j, 2] - gt[i, 2] + np.pi) % (2 * np.pi) - np.pi])

    # rotation prior as the scan-context alignment would supply it (coarse:
    # one sector = 2*pi/80 = 4.5 deg resolution)
    rot_prior = jnp.asarray(rel_true[2] + 0.04, jnp.float32)
    match = verify_candidate(ms, jnp.int32(i), jnp.int32(j), CFG,
                             rot_override=rot_prior)
    assert bool(match.ok), (int(match.n_matches), float(match.residual))
    np.testing.assert_allclose(np.asarray(match.rel_pose)[:2], rel_true[:2],
                               atol=0.3)


def test_loop_recall_many_revisits(rng):
    """Plant 55 revisits in a 900-keyframe synthetic map and require >=90%
    recall of the planted loops (VERDICT.md next #3: the candidate budget
    scales with map size; the old fixed 16-pair ceiling provably misses)."""
    from radarslampy_tpu.models.loopclosure import candidate_budget

    M_cap, K = 1024, 64
    n_base = 845
    n_planted = 55
    gap = 40

    # base path: a smooth random walk exploring new ground (2 m steps)
    th = np.cumsum(rng.normal(0, 0.08, n_base))
    xy = np.cumsum(np.stack([2.0 * np.cos(th), 2.0 * np.sin(th)], 1), axis=0)
    gt = np.concatenate([xy, th[:, None]], axis=1)

    # plant revisits: keyframe j_k sits on top of earlier keyframe i_k
    base_idx = rng.choice(np.arange(n_base - gap), n_planted, replace=False)
    planted = []
    for k, i_k in enumerate(np.sort(base_idx)):
        j_k = n_base + k
        p = gt[i_k].copy()
        p[:2] += rng.normal(0, 0.5, 2)   # not exactly on top
        gt = np.vstack([gt, p[None]])
        planted.append((int(i_k), int(j_k)))
    M = len(gt)                           # 900

    # drifted pose estimates (what the map believes)
    drift = np.linspace(0, 5.0, M)[:, None] * np.array([1.0, 0.4, 0.0])
    est = gt + drift

    world = rng.uniform(gt[:, :2].min() - 50, gt[:, :2].max() + 50, (4000, 2))
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

    assert candidate_budget(M) >= 2 * n_planted  # budget scaled past old 16

    cfg = SlamConfig(pg_iterations=20, loop_method="pose")
    graph, matches = close_loops(ms, cfg, radius_m=12.0, min_index_gap=gap)
    ci = np.asarray(graph.edges_ij[M_cap:, 0])
    cj = np.asarray(graph.edges_ij[M_cap:, 1])
    ok = np.asarray(graph.edge_mask[M_cap:])

    found = 0
    for i_k, j_k in planted:
        hit = ok & (np.abs(ci - i_k) <= 3) & (np.abs(cj - j_k) <= 3)
        found += bool(hit.any())
    recall = found / n_planted
    assert recall >= 0.9, f"loop recall {recall:.2f} ({found}/{n_planted})"

    # the old fixed 16-candidate ceiling misses most of them
    _, m16 = close_loops(ms, cfg, max_candidates=16, radius_m=12.0,
                         min_index_gap=gap)
    assert int(np.asarray(m16.ok).sum()) <= 16 < found


def test_loop_recall_full_seq_scale(rng):
    """full_seq_1-shaped recall test (VERDICT.md r03 ask #7): ~4.5k keyframes
    with 52 revisit events spread over the whole run must retrieve+verify at
    >=90% recall under the scaled-but-capped candidate budget (512 slots)."""
    from radarslampy_tpu.models.loopclosure import candidate_budget

    M_cap, K = 4608, 64
    n_base = 4484
    n_planted = 52
    gap = 40

    # base path: smooth random walk, 2 m steps (full_seq_1 keyframe spacing)
    th = np.cumsum(rng.normal(0, 0.05, n_base))
    xy = np.cumsum(np.stack([2.0 * np.cos(th), 2.0 * np.sin(th)], 1), axis=0)
    gt = np.concatenate([xy, th[:, None]], axis=1)

    # plant revisits SPREAD over the run (every ~86 keyframes one revisit of
    # a random earlier spot), like a city route re-crossing intersections
    insert_every = n_base // (n_planted + 1)
    out, planted, src = [], [], 0
    for k in range(n_planted):
        j_pos = (k + 1) * insert_every
        out.append(gt[src:j_pos])
        i_k = int(max(0, j_pos - gap - rng.integers(10, 400)))
        p = gt[i_k].copy()
        p[:2] += rng.normal(0, 0.5, 2)
        out.append(p[None])
        planted.append(i_k)
        src = j_pos
    out.append(gt[src:])
    gt = np.concatenate(out)
    M = len(gt)
    # planted indices shift by the number of earlier insertions
    planted_pairs = []
    for k, i_k in enumerate(planted):
        shift_i = sum(1 for kk in range(k) if (kk + 1) * insert_every <= i_k)
        planted_pairs.append((i_k + shift_i, (k + 1) * insert_every + k))

    # mild drift (the online backend keeps full-run drift bounded)
    drift = np.linspace(0, 4.0, M)[:, None] * np.array([1.0, 0.4, 0.0])
    est = gt + drift

    world = rng.uniform(gt[:, :2].min() - 60, gt[:, :2].max() + 60, (20000, 2))
    feat_local = np.zeros((M_cap, K, 2), np.float32)
    feat_mask = np.zeros((M_cap, K), bool)
    for m in range(M):
        d = np.linalg.norm(world - gt[m][:2], axis=1)
        near = np.argpartition(d, K // 2)[: K // 2]
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

    assert candidate_budget(M) == 512  # the cap under test

    cfg = SlamConfig(pg_iterations=10, loop_method="pose")
    graph, matches = close_loops(ms, cfg, radius_m=12.0, min_index_gap=gap)
    ci = np.asarray(graph.edges_ij[M_cap:, 0])
    cj = np.asarray(graph.edges_ij[M_cap:, 1])
    ok = np.asarray(graph.edge_mask[M_cap:])

    found = 0
    for i_k, j_k in planted_pairs:
        hit = ok & (np.abs(ci - i_k) <= 3) & (np.abs(cj - j_k) <= 3)
        found += bool(hit.any())
    recall = found / n_planted
    assert recall >= 0.9, f"full-scale loop recall {recall:.2f} ({found}/{n_planted})"
