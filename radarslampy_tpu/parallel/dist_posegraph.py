"""Distributed pose-graph optimisation: edges sharded over the device mesh.

The back-end scaling story (BASELINE.json north star; reference has none —
its g2o scaffold never ran, `PoseGraphLib.py`, paper p.6): pose-graph edges are
partitioned along the `kf` mesh axis with `shard_map`; every device assembles
the normal-equation contributions of its edge shard, the [3M, 3M] system is
reduced with a single `psum` over ICI, and the damped solve runs replicated.

This is exact — `tests/test_parallel.py` asserts bitwise-policy equality (up to
float tolerance) with the single-device dense solver in models/posegraph.py,
whose `edge_system` it reuses verbatim.  For very large M the dense reduce can
be swapped for the matrix-free PCG in this module (`pcg_solve_distributed`),
which only psums [M,3] vectors per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.posegraph import (
    PoseGraph,
    assemble_normal_equations,
    edge_system,
    graph_cost,
    _gauge_and_mask,
    _huber_schedule,
)
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.parallel.mesh import KF_AXIS


def _shard_edges(g: PoseGraph, n_shards: int) -> PoseGraph:
    """Pad the edge arrays to a multiple of n_shards (masked padding)."""
    E = g.edges_ij.shape[0]
    Epad = ((E + n_shards - 1) // n_shards) * n_shards
    pad = Epad - E
    if pad == 0:
        return g
    return g._replace(
        edges_ij=jnp.pad(g.edges_ij, ((0, pad), (0, 0))),
        edges_meas=jnp.pad(g.edges_meas, ((0, pad), (0, 0))),
        edges_info=jnp.pad(g.edges_info, ((0, pad), (0, 0))),
        edge_mask=jnp.pad(g.edge_mask, (0, pad)),
    )


def optimize_pose_graph_sharded(g: PoseGraph, cfg: SlamConfig, mesh: Mesh,
                                method: str = "auto"):
    """LM pose-graph solve with edge-parallel assembly over the mesh.

    Poses are replicated (small: [M,3]); edges are sharded along `kf`.

    `method`:
      * "dense"  — each LM iteration: local H,b assembly -> one psum of
        [3M,3M]+[3M] over ICI -> replicated damped Cholesky.  Exact;
        communication and solve are O(M^2)/O(M^3).
      * "pcg"    — matrix-free LM (models/posegraph.py PCG core with
        `reduce_fn=psum`): every CG sweep computes the local edge shard's
        Hessian-vector contribution and psums an [M,3] vector.  Right when
        the per-shard edge work is large; on small graphs the per-sweep
        psum latency dominates and the curve inverts (VERDICT.md r02
        weak #5 measured exactly that).
      * "gather" — communication-avoiding: ONE all-gather of the edge
        tensors per SOLVE, then every device runs the identical local PCG
        LM (replicated compute, zero per-sweep communication).  A pose
        graph is small data (~E x 12 floats: 9k edges = 0.5 MB at
        full_seq_1 scale) — the scaling-book rule "don't shard what fits"
        applies; collective count per solve drops from
        O(LM_iters x CG_sweeps) to 1.
      * "auto"   — dense when M <= 1024 else gather.

    float32 matmul precision for the same reason as the dense solver
    (models/posegraph.py): reduced-precision MXU passes stall the
    ill-conditioned anchored solve.
    """
    if method == "auto":
        method = "dense" if g.poses.shape[0] <= 1024 else "gather"
    with jax.default_matmul_precision("float32"):
        if method == "pcg":
            return _optimize_pose_graph_sharded_pcg(g, cfg, mesh)
        if method == "gather":
            return _optimize_pose_graph_sharded_gather(g, cfg, mesh)
        return _optimize_pose_graph_sharded(g, cfg, mesh)


def _optimize_pose_graph_sharded_gather(g: PoseGraph, cfg: SlamConfig,
                                        mesh: Mesh):
    """Edge shards are all-gathered ONCE, then the matrix-free LM/PCG solve
    runs replicated on every device with no further collectives."""
    from radarslampy_tpu.models.posegraph import _optimize_pose_graph_pcg

    n = mesh.shape[KF_AXIS]
    g = _shard_edges(g, n)

    edge_spec = PoseGraph(
        poses=P(),
        node_mask=P(),
        edges_ij=P(KF_AXIS),
        edges_meas=P(KF_AXIS),
        edges_info=P(KF_AXIS),
        edge_mask=P(KF_AXIS),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(edge_spec,),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def solve(gs: PoseGraph):
        ag = lambda x: jax.lax.all_gather(x, KF_AXIS, tiled=True)
        full = gs._replace(
            edges_ij=ag(gs.edges_ij),
            edges_meas=ag(gs.edges_meas),
            edges_info=ag(gs.edges_info),
            edge_mask=ag(gs.edge_mask),
        )
        return _optimize_pose_graph_pcg(full, cfg)

    return jax.jit(solve)(g)


def _optimize_pose_graph_sharded_pcg(g: PoseGraph, cfg: SlamConfig, mesh: Mesh):
    from radarslampy_tpu.models.posegraph import _optimize_pose_graph_pcg

    n = mesh.shape[KF_AXIS]
    g = _shard_edges(g, n)

    edge_spec = PoseGraph(
        poses=P(),
        node_mask=P(),
        edges_ij=P(KF_AXIS),
        edges_meas=P(KF_AXIS),
        edges_info=P(KF_AXIS),
        edge_mask=P(KF_AXIS),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(edge_spec,),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def solve(gs: PoseGraph):
        return _optimize_pose_graph_pcg(
            gs, cfg, reduce_fn=lambda x: jax.lax.psum(x, KF_AXIS),
            reduce_max_fn=lambda x: jax.lax.pmax(x, KF_AXIS),
        )

    return jax.jit(solve)(g)


def _optimize_pose_graph_sharded(g: PoseGraph, cfg: SlamConfig, mesh: Mesh):
    n = mesh.shape[KF_AXIS]
    g = _shard_edges(g, n)
    hd = cfg.pg_huber_delta
    dtype = g.poses.dtype
    M = g.poses.shape[0]

    edge_spec = PoseGraph(
        poses=P(),
        node_mask=P(),
        edges_ij=P(KF_AXIS),
        edges_meas=P(KF_AXIS),
        edges_info=P(KF_AXIS),
        edge_mask=P(KF_AXIS),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(edge_spec,),
        out_specs=P(),
        check_vma=False,
    )
    def solve(gs: PoseGraph):
        def assemble(poses, hd_k):
            # local shard contributions, then sum over devices
            H, b = assemble_normal_equations(poses, gs, hd_k)
            H = jax.lax.psum(H, KF_AXIS)
            b = jax.lax.psum(b, KF_AXIS)
            return H, b

        def cost(poses, hd_k):
            return jax.lax.psum(graph_cost(poses, gs, hd_k), KF_AXIS)

        # GNC annealing schedule; start delta is a global max across edge
        # shards (pmax — psum would double-count), matching the single-device
        # solver exactly so the parity tests hold
        deltas = _huber_schedule(
            gs, cfg, reduce_max_fn=lambda x: jax.lax.pmax(x, KF_AXIS)
        )

        def lm_step(carry, hd_k):
            poses, lam = carry
            c = cost(poses, hd_k)
            H, b = assemble(poses, hd_k)
            H, b = _gauge_and_mask(H, b, gs.node_mask, dtype)
            A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
            delta = -jax.scipy.linalg.solve(A, b, assume_a="pos")
            cand = poses + delta.reshape(-1, 3)
            cand = cand.at[:, 2].set(geo.wrap_angle(cand[:, 2]))
            nc = cost(cand, hd_k)
            accept = nc < c
            poses = jnp.where(accept, cand, poses)
            lam = jnp.where(
                accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
            )
            return (poses, lam), None

        init = (gs.poses, jnp.asarray(1e-4, dtype))
        (poses, _), _ = jax.lax.scan(lm_step, init, deltas,
                                     length=cfg.pg_iterations)
        return poses, cost(poses, jnp.asarray(hd, dtype))

    return jax.jit(solve)(g)


def hvp_distributed(poses, g: PoseGraph, v, huber_delta: float, axis: str):
    """Matrix-free H @ v for PCG: per-shard J^T W J v, psummed.  v: [M,3]."""
    r, Ji, Jj, W = edge_system(poses, g, huber_delta)
    i = g.edges_ij[:, 0]
    j = g.edges_ij[:, 1]
    vi = v[i]
    vj = v[j]
    Jv = jnp.einsum("eab,eb->ea", Ji, vi) + jnp.einsum("eab,eb->ea", Jj, vj)
    WJv = W * Jv
    out = jnp.zeros_like(v)
    out = out.at[i].add(jnp.einsum("eab,ea->eb", Ji, WJv))
    out = out.at[j].add(jnp.einsum("eab,ea->eb", Jj, WJv))
    return jax.lax.psum(out, axis)
