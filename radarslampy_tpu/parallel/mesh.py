"""Device-mesh helpers for multi-chip / multi-host scaling.

The reference has no distributed backend of any kind (SURVEY.md §2, §5.8); all
multi-device capability is new TPU-native scope.  Axis conventions:

  * ``kf``  — the keyframe/map dimension: keyframe stores, pose-graph edges and
    BA landmark blocks are sharded along it (the map, not the scan, is the long
    axis — SURVEY.md §5.7).
  * ``batch`` — independent frames/sequences for offline mapping throughput.

Meshes are built from all visible devices by default; multi-host initialisation
uses `jax.distributed.initialize()` upstream of this module.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

KF_AXIS = "kf"
BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, axis: str = KF_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def make_mesh_2d(kf: int, batch: int) -> Mesh:
    devs = np.asarray(jax.devices()[: kf * batch]).reshape(kf, batch)
    return Mesh(devs, (KF_AXIS, BATCH_AXIS))


def shard_along(mesh: Mesh, axis_name: str, ndim: int, dim: int = 0) -> NamedSharding:
    """NamedSharding that partitions array dimension `dim` along `axis_name`."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
