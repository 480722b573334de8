"""Sharded keyframe map store — the distributed back-end state.

The reference's `Map` is a Python list of keyframe objects (`Mapping.py:128-182`).
The TPU-native store is already dense (`frontend.MapState`); this module places
it on a mesh with the keyframe axis partitioned, so map queries (nearest
keyframes for loop closure, global point gathers for visualisation/BA) run as
sharded computations with `psum`/`all_gather` collectives instead of Python
loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from radarslampy_tpu.models.frontend import MapState
from radarslampy_tpu.parallel.mesh import KF_AXIS


def shard_map_state(m: MapState, mesh: Mesh) -> MapState:
    """Place the map on the mesh: keyframe axis sharded, cursor replicated."""
    rep = NamedSharding(mesh, P())

    def put(x):
        if x.ndim == 0:
            return jax.device_put(x, rep)
        spec = P(*([KF_AXIS] + [None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, m)


def nearest_keyframes(m: MapState, query_pose, k: int, mesh: Mesh,
                      min_index_gap: int = 0, exclude_after: int | None = None):
    """Top-k nearest live keyframes to `query_pose` — loop-closure candidates.

    Runs sharded: each device scores its keyframe shard, results are
    all-gathered (k is tiny).  Returns (indices [k], distances [k], valid [k]).
    """
    M = m.poses.shape[0]
    n = mesh.shape[KF_AXIS]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(KF_AXIS, None), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def score(poses, q, cursor):
        shard = poses.shape[0]
        me = jax.lax.axis_index(KF_AXIS)
        gidx = me * shard + jnp.arange(shard)
        live = gidx < cursor
        if exclude_after is not None:
            live = live & (gidx < exclude_after)
        d = jnp.linalg.norm(poses[:, :2] - q[:2], axis=1)
        d = jnp.where(live, d, jnp.inf)
        # gather all shards' distances+indices, top-k on every device (replicated)
        d_all = jax.lax.all_gather(d, KF_AXIS, tiled=True)
        i_all = jax.lax.all_gather(gidx, KF_AXIS, tiled=True)
        vals, pos = jax.lax.top_k(-d_all, k)
        return i_all[pos], -vals

    idx, dist = jax.jit(score)(m.poses, jnp.asarray(query_pose), m.cursor)
    return idx, dist, jnp.isfinite(dist)


def appearance_candidates_sharded(m: MapState, mesh: Mesh,
                                  max_candidates: int,
                                  min_index_gap: int = 20,
                                  max_distance: float = 0.35,
                                  prefilter: int = 4):
    """Distributed scan-context retrieval: loop candidates by appearance with
    the descriptor store sharded along the keyframe axis.

    Two phases, mirroring `placerecog.find_candidates_appearance`:
      1. ring-key scoring runs *sharded* — each device scores its descriptor
         rows against the all-gathered [M, R] key table (keys are tiny), takes
         a local top-P and the shards' candidates are merged replicated;
      2. the exact all-shift alignment runs on the merged <=P pairs with
         `jnp.take` on the sharded descriptors (XLA inserts the gathers).

    Returns an `AppearanceCandidates`, bit-equivalent to the dense search.
    """
    from radarslampy_tpu.models.placerecog import (
        AppearanceCandidates, sc_alignment,
    )

    M = m.descriptors.shape[0]
    P_pre = prefilter * max_candidates

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(KF_AXIS, None, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def prefilter_pairs(descs, cursor):
        shard = descs.shape[0]
        me = jax.lax.axis_index(KF_AXIS)
        gidx = me * shard + jnp.arange(shard)
        keys_local = descs.mean(axis=-1)                         # [shard, R]
        keys_all = jax.lax.all_gather(keys_local, KF_AXIS, tiled=True)  # [M, R]
        idx_all = jnp.arange(M)
        kd = jnp.linalg.norm(keys_local[:, None, :] - keys_all[None, :, :],
                             axis=-1)                            # [shard, M]
        ok = (
            (gidx < cursor)[:, None]
            & (idx_all < cursor)[None, :]
            & ((idx_all[None, :] - gidx[:, None]) >= min_index_gap)
        )
        score = jnp.where(ok, kd, jnp.inf)
        vals, flat = jax.lax.top_k(-score.reshape(-1), P_pre)    # local top
        i = (me * shard + flat // M).astype(jnp.int32)
        j = (flat % M).astype(jnp.int32)
        # merge all shards' locals, keep the global best P_pre (replicated)
        v_all = jax.lax.all_gather(vals, KF_AXIS, tiled=True)
        i_all = jax.lax.all_gather(i, KF_AXIS, tiled=True)
        j_all = jax.lax.all_gather(j, KF_AXIS, tiled=True)
        v2, pos = jax.lax.top_k(v_all, P_pre)
        return i_all[pos], j_all[pos], v2

    pi, pj, negv = jax.jit(prefilter_pairs)(m.descriptors, m.cursor)
    pre_ok = jnp.isfinite(negv)

    rep = NamedSharding(mesh, P())

    @jax.jit
    def exact_stage(descs, pi, pj, pre_ok):
        # cross-shard gathers: explicit replicated out-sharding so XLA knows
        # to all-gather the <=P selected descriptor rows
        di = descs.at[pi].get(out_sharding=rep)
        dj = descs.at[pj].get(out_sharding=rep)

        def one(a, b):
            sim, _, rot = sc_alignment(a, b)
            return 1.0 - sim, -rot         # heading init = -scene rotation

        dist, rot = jax.vmap(one)(di, dj)
        dist = jnp.where(pre_ok, dist, jnp.inf)
        best = jnp.argsort(dist)[:max_candidates]
        d = dist[best]
        return AppearanceCandidates(
            i=pi[best], j=pj[best], distance=d, rot_init=rot[best],
            valid=jnp.isfinite(d) & (d <= max_distance),
        )

    return exact_stage(m.descriptors, pi, pj, pre_ok)


def global_map_points(m: MapState, mesh: Mesh):
    """All live keyframes' feature world positions, all-gathered.

    Replaces `Map.plot`'s Python loop over keyframes (`Mapping.py:184-206`).
    Returns (points [M*K, 2], mask [M*K]).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(KF_AXIS, None, None), P(KF_AXIS, None), P()),
        out_specs=(P(KF_AXIS, None), P(KF_AXIS)),
        check_vma=False,
    )
    def gather(fw, fm, cursor):
        shard, K = fm.shape
        me = jax.lax.axis_index(KF_AXIS)
        gidx = me * shard + jnp.arange(shard)
        live = (gidx < cursor)[:, None] & fm
        return fw.reshape(shard * K, 2), live.reshape(shard * K)

    pts, mask = jax.jit(gather)(m.feat_world, m.feat_mask, m.cursor)
    return pts, mask
