"""SE(2) pose-graph optimisation — dense Gauss-Newton/LM on device.

The reference only scaffolds this: `PoseGraphLib.py:5-43` wraps g2o's SE3
optimizer (CHOLMOD + Levenberg) but is never imported by the live pipeline
(paper p.6: g2o issues blocked it; SURVEY.md §2#12).  There is therefore no
behavioural oracle; correctness is validated against synthetic graphs with
known ground truth (tests/test_posegraph.py) per SURVEY.md §7.

Design: fixed-capacity edge/node tensors with validity masks.  Per-edge 3x3
Jacobian blocks are computed with vmapped forward-mode AD, scattered into a
dense [3M, 3M] normal matrix, and solved with a damped Cholesky inside a fixed
LM iteration budget (`lax.scan`).  Dense is exact and MXU-friendly up to ~2k
keyframes; the sharded multi-device variant lives in
parallel/dist_posegraph.py and reuses `edge_system` verbatim.

Gauge freedom is fixed with a strong prior on node 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.ops import geometry as geo


class PoseGraph(NamedTuple):
    poses: jax.Array       # [M, 3] node estimates
    node_mask: jax.Array   # [M] bool
    edges_ij: jax.Array    # [E, 2] int32 (i, j)
    edges_meas: jax.Array  # [E, 3] measured relative pose  T_i^-1 T_j
    edges_info: jax.Array  # [E, 3] diagonal information (weights) per component
    edge_mask: jax.Array   # [E] bool


def edge_residual(pose_i, pose_j, meas):
    """r = T_meas^-1 (T_i^-1 T_j) as [dx, dy, dtheta], in difference form.

    Written without transform products: the *small* pose difference is taken
    first and only then rotated.  In float32 this matters — building T_i, T_j
    and inverting amplifies trig rounding by the absolute pose magnitude
    (poses reach hundreds of metres on full_seq_1), whereas the difference
    form's error scales with the edge length.
    """
    d = pose_j[:2] - pose_i[:2]
    ci, si = jnp.cos(pose_i[2]), jnp.sin(pose_i[2])
    rel_x = ci * d[0] + si * d[1]
    rel_y = -si * d[0] + ci * d[1]
    rel_th = pose_j[2] - pose_i[2]
    ex = rel_x - meas[0]
    ey = rel_y - meas[1]
    cm, sm = jnp.cos(meas[2]), jnp.sin(meas[2])
    return jnp.stack(
        [cm * ex + sm * ey, -sm * ex + cm * ey, geo.wrap_angle(rel_th - meas[2])]
    )


def _edge_blocks(pose_i, pose_j, meas, info, huber_delta):
    """Residual + robust-weighted Jacobian blocks for one edge."""
    r = edge_residual(pose_i, pose_j, meas)
    Ji = jax.jacfwd(lambda p: edge_residual(p, pose_j, meas))(pose_i)
    Jj = jax.jacfwd(lambda p: edge_residual(pose_i, p, meas))(pose_j)
    # Huber robust reweighting (PoseGraphLib.py:83 uses Huber in its BA scaffold)
    e = jnp.sqrt(jnp.sum(r * r * info) + 1e-12)
    w = jnp.where(e <= huber_delta, 1.0, huber_delta / e)
    W = info * w  # [3]
    return r, Ji, Jj, W


def edge_system(poses, g: PoseGraph, huber_delta: float):
    """Per-edge (r, Ji, Jj, W) for all edges, vmapped. Shared with the
    distributed solver."""
    pi = poses[g.edges_ij[:, 0]]
    pj = poses[g.edges_ij[:, 1]]
    r, Ji, Jj, W = jax.vmap(_edge_blocks, in_axes=(0, 0, 0, 0, None))(
        pi, pj, g.edges_meas, g.edges_info, huber_delta
    )
    m = g.edge_mask.astype(poses.dtype)
    return r * m[:, None], Ji * m[:, None, None], Jj * m[:, None, None], W * m[:, None]


def assemble_normal_equations(poses, g: PoseGraph, huber_delta: float):
    """Dense H = J^T W J  [3M, 3M] and b = J^T W r  [3M] via block scatter-add."""
    M = poses.shape[0]
    r, Ji, Jj, W = edge_system(poses, g, huber_delta)
    i = g.edges_ij[:, 0]
    j = g.edges_ij[:, 1]

    WJi = W[:, :, None] * Ji  # [E,3,3]
    WJj = W[:, :, None] * Jj
    Hii = jnp.einsum("eab,eac->ebc", Ji, WJi)
    Hjj = jnp.einsum("eab,eac->ebc", Jj, WJj)
    Hij = jnp.einsum("eab,eac->ebc", Ji, WJj)
    bi = jnp.einsum("eab,ea->eb", Ji, W * r)
    bj = jnp.einsum("eab,ea->eb", Jj, W * r)

    Hb = jnp.zeros((M, M, 3, 3), poses.dtype)
    Hb = Hb.at[i, i].add(Hii)
    Hb = Hb.at[j, j].add(Hjj)
    Hb = Hb.at[i, j].add(Hij)
    Hb = Hb.at[j, i].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((M, 3), poses.dtype)
    b = b.at[i].add(bi)
    b = b.at[j].add(bj)

    H = Hb.transpose(0, 2, 1, 3).reshape(3 * M, 3 * M)
    return H, b.reshape(3 * M)


def _gauge_and_mask(H, b, node_mask, dtype):
    M3 = H.shape[0]
    M = M3 // 3
    diag_fix = jnp.zeros(M, dtype).at[0].set(1e8)           # anchor node 0
    diag_fix = diag_fix + jnp.where(node_mask, 0.0, 1e8)    # freeze dead nodes
    fix = jnp.repeat(diag_fix, 3)
    return H + jnp.diag(fix), b


def graph_cost(poses, g: PoseGraph, huber_delta: float):
    r, _, _, W = edge_system(poses, g, huber_delta)
    return jnp.sum(W * r * r)


def optimize_pose_graph(g: PoseGraph, cfg: SlamConfig):
    """Fixed-budget LM over the whole graph; returns (poses, final_cost).

    Runs under float32 matmul precision: the [3M, 3M] normal-equation solve is
    ill-conditioned (1e8 gauge anchor on node 0) and the TPU MXU's default
    reduced-precision passes stall LM far from the optimum — measured 5.98 m
    vs 2.23 m keyframe ATE on a real 447 m loop of full_seq_1 GT motion.
    """
    with jax.default_matmul_precision("float32"):
        return _optimize_pose_graph(g, cfg)


def _optimize_pose_graph(g: PoseGraph, cfg: SlamConfig):
    hd = cfg.pg_huber_delta
    dtype = g.poses.dtype

    def lm_step(carry, _):
        poses, lam, cost = carry
        H, b = assemble_normal_equations(poses, g, hd)
        H, b = _gauge_and_mask(H, b, g.node_mask, dtype)
        A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
        delta = -jax.scipy.linalg.solve(A, b, assume_a="pos")
        cand = poses + delta.reshape(-1, 3)
        cand = cand.at[:, 2].set(geo.wrap_angle(cand[:, 2]))
        new_cost = graph_cost(cand, g, hd)
        accept = new_cost < cost
        poses = jnp.where(accept, cand, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7))
        return (poses, lam, cost), None

    init = (g.poses, jnp.asarray(1e-4, dtype), graph_cost(g.poses, g, hd))
    (poses, _, cost), _ = jax.lax.scan(lm_step, init, None, length=cfg.pg_iterations)
    return poses, cost


def odometry_graph_from_map(map_poses, cursor, max_edges=None,
                            info=(100.0, 100.0, 400.0)) -> PoseGraph:
    """Build the chain-of-keyframes odometry graph from a MapState's poses.

    Consecutive live keyframes get an edge with their current relative pose as
    the measurement.  Loop-closure edges can be appended by the caller
    (models/loopclosure.py).
    """
    M = map_poses.shape[0]
    E = max_edges or M
    idx = jnp.arange(E)
    i = jnp.minimum(idx, M - 2)
    j = i + 1
    live = (idx + 1) < cursor

    pi, pj = map_poses[i], map_poses[j]
    d = pj[:, :2] - pi[:, :2]
    ci, si = jnp.cos(pi[:, 2]), jnp.sin(pi[:, 2])
    rel = jnp.stack(
        [
            ci * d[:, 0] + si * d[:, 1],
            -si * d[:, 0] + ci * d[:, 1],
            geo.wrap_angle(pj[:, 2] - pi[:, 2]),
        ],
        axis=-1,
    )

    return PoseGraph(
        poses=map_poses,
        node_mask=jnp.arange(M) < cursor,
        edges_ij=jnp.stack([i, j], axis=1).astype(jnp.int32),
        edges_meas=rel,
        edges_info=jnp.broadcast_to(jnp.asarray(info, map_poses.dtype), (E, 3)),
        edge_mask=live,
    )
