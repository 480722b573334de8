"""Data-parallel odometry: D independent sequence segments in lock-step.

The SLAM chain is serial per trajectory, but offline mapping of a long
recording parallelises by *segmenting* it: device d runs the full fused
pipeline on segment d, all segments advance one frame per step via a single
`shard_map`-wrapped vmapped `slam_step`, and the per-segment trajectories are
joined afterwards by chaining relative poses (optionally refined by the pose
graph with loop closures across segment boundaries).

This is the frames/s *scaling-efficiency* axis of the BASELINE.json north star
(frames/s/chip held while adding chips): per-step work is embarrassingly
parallel across the batch; there is no cross-device communication in the hot
loop at all.

Note: under vmap, the keyframe/retrack `lax.cond` branches become selects
(both branches execute), so detection cost is paid every frame — the right
trade for offline throughput, where frames vastly outnumber devices.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models import frontend
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.parallel.mesh import KF_AXIS


def batched_init(polars0, maps, cfg: SlamConfig):
    """[D, A, W] first frames -> batched SlamState (each segment at origin)."""
    D = polars0.shape[0]
    return jax.vmap(
        lambda p: frontend.init_state(p, jnp.zeros(3), maps, cfg)
    )(polars0)


def make_batched_init(cfg: SlamConfig, mesh: Mesh):
    """shard_map variant of `batched_init` for globally-sharded inputs
    (multi-process meshes: plain vmap over a global array trips ambiguous
    gather sharding inside the feature detector)."""
    vinit = jax.vmap(
        lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg),
        in_axes=(0, None),
    )
    return jax.jit(shard_map(
        vinit, mesh=mesh, in_specs=(P(KF_AXIS), P()), out_specs=P(KF_AXIS),
        check_vma=False,
    ))


def make_batched_step(cfg: SlamConfig, mesh: Mesh):
    """jitted (states, polars [D,A,W], maps) -> (states, outputs), batch sharded."""

    def step_one(state, polar, maps):
        return frontend.slam_step(state, polar, maps, cfg)

    vstep = jax.vmap(step_one, in_axes=(0, 0, None))

    sharded = shard_map(
        vstep,
        mesh=mesh,
        in_specs=(P(KF_AXIS), P(KF_AXIS), P()),
        out_specs=(P(KF_AXIS), P(KF_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def join_segments(segment_poses: List[np.ndarray]) -> np.ndarray:
    """Chain per-segment trajectories (each starting at the origin) into one.

    Segment k's poses are transformed by the accumulated end pose of segments
    0..k-1.  Exact when segments overlap by one frame (the next segment's
    first frame is the previous segment's last); otherwise the seam assumes
    continuity at the boundary frame.
    """
    out = [segment_poses[0]]
    T_acc = geo.pose_to_transform(jnp.asarray(segment_poses[0][-1]))
    for seg in segment_poses[1:]:
        Ts = jax.vmap(geo.pose_to_transform)(jnp.asarray(seg))
        joined = jax.vmap(lambda T: geo.transform_to_pose(T_acc @ T))(Ts)
        joined = np.asarray(joined)
        out.append(joined[1:])  # drop the duplicated overlap frame
        T_acc = geo.pose_to_transform(jnp.asarray(joined[-1]))
    return np.concatenate(out, axis=0)


def run_segments(frames: np.ndarray, maps, cfg: SlamConfig, mesh: Mesh):
    """frames: [D, T, A, W] — run D segments in lock-step; returns [D, T, 3]
    per-segment pose arrays (each segment in its own origin frame)."""
    D, T = frames.shape[:2]
    states = batched_init(jnp.asarray(frames[:, 0]), maps, cfg)
    step = make_batched_step(cfg, mesh)
    pose_log = [np.zeros((D, 3), np.float32)]
    device_poses = []
    for t in range(1, T):
        states, outs = step(states, jnp.asarray(frames[:, t]), maps)
        device_poses.append(outs.pose)
    jax.block_until_ready(states.pose)
    for p in jax.device_get(device_poses):
        pose_log.append(np.asarray(p))
    return np.stack(pose_log, axis=1)  # [D, T, 3]
