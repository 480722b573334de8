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
from radarslampy_tpu.ops import trig


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
    si, ci = trig.sin_cos(pose_i[2])
    rel_x = ci * d[0] + si * d[1]
    rel_y = -si * d[0] + ci * d[1]
    rel_th = pose_j[2] - pose_i[2]
    ex = rel_x - meas[0]
    ey = rel_y - meas[1]
    sm, cm = trig.sin_cos(meas[2])
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


def _edge_robust_err(poses, g: PoseGraph):
    """Per-edge robustified error magnitude e = sqrt(r^T diag(info) r),
    zeroed on masked-out edges.  Used to pick the GNC annealing start."""
    pi = poses[g.edges_ij[:, 0]]
    pj = poses[g.edges_ij[:, 1]]
    r = jax.vmap(edge_residual)(pi, pj, g.edges_meas)
    e = jnp.sqrt(jnp.sum(r * r * g.edges_info, axis=1) + 1e-12)
    return e * g.edge_mask.astype(poses.dtype)


def _huber_schedule(g: PoseGraph, cfg: SlamConfig, reduce_max_fn=None):
    """Per-LM-iteration Huber deltas, annealed geometrically (GNC).

    With the post-hoc backend, loop-closure residuals at the INITIAL (drifted)
    poses can be tens of metres: under a fixed delta of 1 the robust weight
    delta/e ~ 1/300 freezes exactly the edges that carry the correction
    (observed: 611-node/143-loop graph moved keyframe ATE only 38.9->31.4 m).
    Graduated non-convexity fixes this: start the delta at the largest initial
    robustified edge error (so every verified loop edge begins effectively
    quadratic), anneal down to cfg.pg_huber_delta so the final iterations have
    the configured outlier robustness.  When initial residuals are already
    below the configured delta the schedule is constant and behavior is
    unchanged.  Disable via cfg.pg_gnc_anneal=False.
    """
    hd = jnp.asarray(cfg.pg_huber_delta, g.poses.dtype)
    N = cfg.pg_iterations
    if not getattr(cfg, "pg_gnc_anneal", True):
        return jnp.full((N,), hd)
    e0 = jnp.max(_edge_robust_err(g.poses, g))
    if reduce_max_fn is not None:
        e0 = reduce_max_fn(e0)
    start = jnp.maximum(e0, hd)
    frac = jnp.arange(N, dtype=g.poses.dtype) / max(N - 1, 1)
    return jnp.exp((1.0 - frac) * jnp.log(start) + frac * jnp.log(hd))


def optimize_pose_graph(g: PoseGraph, cfg: SlamConfig, method: str = "auto"):
    """Fixed-budget LM over the whole graph; returns (poses, final_cost).

    `method`:
      * "dense" — exact damped-Cholesky LM on the assembled [3M, 3M] normal
        matrix.  Exact but O(M^3)/iteration: past ~2k nodes the Cholesky alone
        dominates (g2o would use sparse CHOLMOD here, `PoseGraphLib.py:21`).
      * "pcg"   — matrix-free LM: the normal system is solved with
        block-Jacobi-preconditioned conjugate gradient using only per-edge
        Hessian-vector products (O(E) per CG sweep).  This is how the solver
        scales to full_seq_1's ~4.5k keyframes and beyond.  HOST-DRIVEN at
        bounded dispatch size: one device dispatch per LM linearisation and
        per <= cfg.pg_sweeps_per_dispatch CG sweeps — never the
        all-iterations-in-one-program dispatch that crossed the axon chip's
        per-dispatch fault cliff at full_seq_1 scale (VERDICT.md r04
        missing #1 / next #5; the r04 full-run worker crash happened inside
        exactly that single giant BA dispatch).
      * "auto"  — dense when M <= 1024 else pcg.

    Runs under float32 matmul precision: the normal system is ill-conditioned
    (1e8 gauge anchor on node 0) and the TPU MXU's default reduced-precision
    passes stall LM far from the optimum — measured 5.98 m vs 2.23 m keyframe
    ATE on a real 447 m loop of full_seq_1 GT motion.
    """
    if method == "auto":
        method = "dense" if g.poses.shape[0] <= 1024 else "pcg"
    with jax.default_matmul_precision("float32"):
        if method == "pcg":
            return _optimize_pose_graph_pcg_hostloop(g, cfg)
        return _optimize_pose_graph(g, cfg)


def _optimize_pose_graph(g: PoseGraph, cfg: SlamConfig):
    hd = cfg.pg_huber_delta
    dtype = g.poses.dtype
    deltas = _huber_schedule(g, cfg)

    def lm_step(carry, hd_k):
        poses, lam = carry
        # the Huber delta changes across iterations (GNC annealing), so the
        # acceptance test recomputes the CURRENT cost under this iteration's
        # delta rather than carrying a cost measured under a different one
        cost = graph_cost(poses, g, hd_k)
        H, b = assemble_normal_equations(poses, g, hd_k)
        H, b = _gauge_and_mask(H, b, g.node_mask, dtype)
        A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
        delta = -jax.scipy.linalg.solve(A, b, assume_a="pos")
        cand = poses + delta.reshape(-1, 3)
        cand = cand.at[:, 2].set(geo.wrap_angle(cand[:, 2]))
        new_cost = graph_cost(cand, g, hd_k)
        accept = new_cost < cost
        poses = jnp.where(accept, cand, poses)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7))
        return (poses, lam), None

    init = (g.poses, jnp.asarray(1e-4, dtype))
    (poses, _), _ = jax.lax.scan(lm_step, init, deltas, length=cfg.pg_iterations)
    return poses, graph_cost(poses, g, jnp.asarray(hd, dtype))


def _gauge_diag(node_mask, M, dtype):
    """Per-node gauge/freeze diagonal (same policy as `_gauge_and_mask`)."""
    d = jnp.zeros(M, dtype).at[0].set(1e8)
    return d + jnp.where(node_mask, 0.0, 1e8)


def _optimize_pose_graph_pcg(g: PoseGraph, cfg: SlamConfig, reduce_fn=None,
                             reduce_max_fn=None):
    """Matrix-free LM: each step solves (H + lam diag(H)) delta = -b with
    block-Jacobi PCG, never materialising H.  Per CG sweep the cost is one
    gather + two [E,3,3]x[E,3] batched products + one scatter-add — O(E),
    independent of M^2, so full_seq_1-scale graphs (4-8k keyframes) solve in
    milliseconds where the dense Cholesky needs minutes.

    `reduce_fn` sums edge-parallel contributions across shards (identity on a
    single device; `lax.psum` when `g.edges_*` hold only this device's shard —
    parallel/dist_posegraph.py).  Only [M,3]-sized vectors ever cross devices.
    """
    if reduce_fn is None:
        reduce_fn = lambda x: x
    hd = cfg.pg_huber_delta
    dtype = g.poses.dtype
    M = g.poses.shape[0]
    ei = g.edges_ij[:, 0]
    ej = g.edges_ij[:, 1]
    # GNC Huber annealing (see _huber_schedule); with sharded edges the start
    # delta needs a global MAX across shards, hence reduce_max_fn (pmax) —
    # reduce_fn (psum) would double-count.
    deltas = _huber_schedule(g, cfg, reduce_max_fn=reduce_max_fn)

    def lm_step(carry, hd_k):
        poses, lam = carry
        cost = reduce_fn(graph_cost(poses, g, hd_k))
        r, Ji, Jj, W = edge_system(poses, g, hd_k)
        WJi = W[:, :, None] * Ji
        WJj = W[:, :, None] * Jj
        # gradient b = J^T W r  [M,3]
        b = reduce_fn(
            jnp.zeros((M, 3), dtype)
            .at[ei].add(jnp.einsum("eab,ea->eb", Ji, W * r))
            .at[ej].add(jnp.einsum("eab,ea->eb", Jj, W * r))
        )
        # Gauge by PROJECTION, not by penalty: the dense path's 1e8 anchor
        # diagonal makes the preconditioned system's condition number ~1e8,
        # which float32 CG cannot survive — measured: a 400-node/76 m-drift
        # loop graph solved to 0.32 m ATE by dense Cholesky stalled at 14 m
        # under penalty-gauged PCG.  Freezing anchor + dead nodes exactly
        # (delta := 0 on them, identity rows in A) keeps A SPD with the
        # conditioning of the ACTUAL problem.
        free = (g.node_mask & (jnp.arange(M) > 0)).astype(dtype)[:, None]
        b = b * free
        # diagonal blocks of H  [M,3,3]
        D = reduce_fn(
            jnp.zeros((M, 3, 3), dtype)
            .at[ei].add(jnp.einsum("eab,eac->ebc", Ji, WJi))
            .at[ej].add(jnp.einsum("eab,eac->ebc", Jj, WJj))
        )
        ddiag = jnp.diagonal(D, axis1=1, axis2=2)  # [M,3]
        damp = lam * (ddiag + 1e-9)

        def Afun(v):  # projected (H + lam diag) v, v [M,3]
            vf = v * free
            Jv = jnp.einsum("eab,eb->ea", Ji, vf[ei]) + jnp.einsum(
                "eab,eb->ea", Jj, vf[ej]
            )
            u = W * Jv
            Hv = reduce_fn(
                jnp.zeros((M, 3), dtype)
                .at[ei].add(jnp.einsum("eab,ea->eb", Ji, u))
                .at[ej].add(jnp.einsum("eab,ea->eb", Jj, u))
            )
            return (Hv + damp * vf) * free + (1.0 - free) * v

        # block-Jacobi preconditioner: inverse of the damped 3x3 diagonal
        # blocks on free nodes, identity on frozen ones
        P = (D + jax.vmap(jnp.diag)(damp)) * free[..., None] + (
            1.0 - free[..., None]
        ) * jnp.eye(3, dtype=dtype)
        Pinv = jnp.linalg.inv(P)  # [M,3,3] batched

        def Minv(v):
            return jnp.einsum("mab,mb->ma", Pinv, v)

        x0 = jnp.zeros((M, 3), dtype)
        r0 = -b
        z0 = Minv(r0)
        rz0 = jnp.sum(r0 * z0)
        # sweep cap: block-Jacobi PCG moves information ~1 node per sweep
        # along the odometry chain, so crossing the graph needs O(M) sweeps —
        # and when the robust weights are UNEVEN (mid-GNC, loop edges pulling
        # hard) convergence needs several crossings.  Measured on a
        # 400-node/76 m-drift loop graph: a 2M cap left LM steps truncated and
        # the solve stalled at 14 m ATE where dense Cholesky reached 0.32 m; an
        # 8M cap matched dense exactly.  The while_loop still exits as soon as
        # the preconditioned residual drops 1e-10x, so converged solves (late
        # LM iterations, rejected-step re-solves) cost a handful of sweeps.
        # All quantities in the condition are replicated in the sharded path
        # (they come from psum-reduced products), so the trip count is uniform
        # across devices.
        n_cg = cfg.pg_cg_iterations or 8 * M

        def cg_cond(c):
            it, x, rr, z, p, rz = c
            return (it < n_cg) & (rz > 1e-10 * rz0) & (rz > 1e-20)

        def cg_body(c):
            it, x, rr, z, p, rz = c
            Ap = Afun(p)
            pAp = jnp.sum(p * Ap)
            ok = pAp > 1e-30
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = Minv(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(ok, rz_new / rz, 0.0)
            p = z + beta * p
            return (it + 1, x, rr, z, p, rz_new)

        _, delta, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), x0, r0, z0, z0, rz0)
        )

        cand = poses + delta
        cand = cand.at[:, 2].set(geo.wrap_angle(cand[:, 2]))
        new_cost = reduce_fn(graph_cost(cand, g, hd_k))
        accept = new_cost < cost
        poses = jnp.where(accept, cand, poses)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
        )
        return (poses, lam), None

    init = (g.poses, jnp.asarray(1e-4, dtype))
    (poses, _), _ = jax.lax.scan(lm_step, init, deltas, length=cfg.pg_iterations)
    return poses, reduce_fn(graph_cost(poses, g, jnp.asarray(hd, dtype)))


# --- host-driven bounded-dispatch PCG (single device) ------------------------
#
# Identical math to `_optimize_pose_graph_pcg`, restructured so NO device
# dispatch exceeds one LM linearisation or `cfg.pg_sweeps_per_dispatch` CG
# sweeps.  The axon TPU faults on large single dispatches (per-dispatch
# size/time cliff: a 128-frame eval chunk runs, 512 faults — project memory),
# and the old solver launched pg_iterations x up-to-8M sweeps as ONE program:
# the prime suspect for round 4's full-scale BA worker crash (VERDICT.md).
# The large linearisation products (Ji/Jj/W, preconditioner) stay on device as
# handles between slice dispatches; only three convergence scalars per slice
# cross to the host.

from functools import partial as _partial


_huber_schedule_jit = jax.jit(_huber_schedule, static_argnums=(1,))


@jax.jit
def _pg_lm_prepare(poses, lam, hd_k, g: PoseGraph):
    """One LM iteration's linearisation: per-edge Jacobians, projected
    gradient, damped block-Jacobi preconditioner, initial CG state."""
    with jax.default_matmul_precision("float32"):
        dtype = poses.dtype
        M = poses.shape[0]
        ei, ej = g.edges_ij[:, 0], g.edges_ij[:, 1]
        r, Ji, Jj, W = edge_system(poses, g, hd_k)
        free = (g.node_mask & (jnp.arange(M) > 0)).astype(dtype)[:, None]
        b = (
            jnp.zeros((M, 3), dtype)
            .at[ei].add(jnp.einsum("eab,ea->eb", Ji, W * r))
            .at[ej].add(jnp.einsum("eab,ea->eb", Jj, W * r))
        ) * free
        WJi = W[:, :, None] * Ji
        WJj = W[:, :, None] * Jj
        D = (
            jnp.zeros((M, 3, 3), dtype)
            .at[ei].add(jnp.einsum("eab,eac->ebc", Ji, WJi))
            .at[ej].add(jnp.einsum("eab,eac->ebc", Jj, WJj))
        )
        ddiag = jnp.diagonal(D, axis1=1, axis2=2)
        damp = lam * (ddiag + 1e-9)
        P = (D + jax.vmap(jnp.diag)(damp)) * free[..., None] + (
            1.0 - free[..., None]
        ) * jnp.eye(3, dtype=dtype)
        Pinv = jnp.linalg.inv(P)
        x0 = jnp.zeros((M, 3), dtype)
        r0 = -b
        z0 = jnp.einsum("mab,mb->ma", Pinv, r0)
        rz0 = jnp.sum(r0 * z0)
        cg = (jnp.int32(0), x0, r0, z0, z0, rz0)
        return Ji, Jj, W, damp, free, Pinv, cg, rz0


@_partial(jax.jit, static_argnames=("k_max",), donate_argnums=(0,))
def _pg_cg_slice(cg, Ji, Jj, W, damp, free, Pinv, g: PoseGraph, n_cg, rz0,
                 k_max: int):
    """<= k_max PCG sweeps on the projected damped normal system; the CG
    state carries across slice dispatches, so slicing changes nothing about
    the iterate sequence — only the per-dispatch work bound."""
    with jax.default_matmul_precision("float32"):
        dtype = damp.dtype
        M = damp.shape[0]
        ei, ej = g.edges_ij[:, 0], g.edges_ij[:, 1]

        def Afun(v):
            vf = v * free
            Jv = jnp.einsum("eab,eb->ea", Ji, vf[ei]) + jnp.einsum(
                "eab,eb->ea", Jj, vf[ej]
            )
            u = W * Jv
            Hv = (
                jnp.zeros((M, 3), dtype)
                .at[ei].add(jnp.einsum("eab,ea->eb", Ji, u))
                .at[ej].add(jnp.einsum("eab,ea->eb", Jj, u))
            )
            return (Hv + damp * vf) * free + (1.0 - free) * v

        def Minv(v):
            return jnp.einsum("mab,mb->ma", Pinv, v)

        def cond(c):
            k, (it, x, rr, z, p, rz) = c
            return (k < k_max) & (it < n_cg) & (rz > 1e-10 * rz0) & (rz > 1e-20)

        def body(c):
            k, (it, x, rr, z, p, rz) = c
            Ap = Afun(p)
            pAp = jnp.sum(p * Ap)
            ok = pAp > 1e-30
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = Minv(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(ok, rz_new / rz, 0.0)
            p = z + beta * p
            return (k + 1, (it + 1, x, rr, z, p, rz_new))

        _, cg = jax.lax.while_loop(cond, body, (jnp.int32(0), cg))
        return cg


@jax.jit
def _pg_lm_accept(poses, lam, delta, hd_k, g: PoseGraph):
    with jax.default_matmul_precision("float32"):
        cost = graph_cost(poses, g, hd_k)
        cand = poses + delta
        cand = cand.at[:, 2].set(geo.wrap_angle(cand[:, 2]))
        new_cost = graph_cost(cand, g, hd_k)
        accept = new_cost < cost
        poses = jnp.where(accept, cand, poses)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
        )
        return poses, lam


@jax.jit
def _pg_cost(poses, g: PoseGraph, hd):
    with jax.default_matmul_precision("float32"):
        return graph_cost(poses, g, hd)


def _optimize_pose_graph_pcg_hostloop(g: PoseGraph, cfg: SlamConfig):
    """Matrix-free LM with every device dispatch bounded (see
    optimize_pose_graph's "pcg" doc).  Same iterate sequence as
    `_optimize_pose_graph_pcg` — parity-tested in test_posegraph."""
    import numpy as np

    dtype = g.poses.dtype
    M = g.poses.shape[0]
    K = max(1, int(getattr(cfg, "pg_sweeps_per_dispatch", 4096)))
    n_cg = jnp.int32(cfg.pg_cg_iterations or 8 * M)
    deltas = np.asarray(_huber_schedule_jit(g, cfg))
    poses = g.poses
    lam = jnp.asarray(1e-4, dtype)
    for hd_host in deltas:
        hd_k = jnp.asarray(hd_host, dtype)
        Ji, Jj, W, damp, free, Pinv, cg, rz0 = _pg_lm_prepare(
            poses, lam, hd_k, g
        )
        rz0_h = float(rz0)
        while True:
            cg = _pg_cg_slice(cg, Ji, Jj, W, damp, free, Pinv, g, n_cg, rz0,
                              k_max=K)
            # ONE D2H round trip per slice decides continuation on the host
            it_h, rz_h = jax.device_get((cg[0], cg[5]))
            if (it_h >= int(n_cg)) or (rz_h <= 1e-10 * rz0_h) or (rz_h <= 1e-20):
                break
        poses, lam = _pg_lm_accept(poses, lam, cg[1], hd_k, g)
    return poses, _pg_cost(poses, g, jnp.asarray(cfg.pg_huber_delta, dtype))


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
    si, ci = trig.sin_cos(pi[:, 2])
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
