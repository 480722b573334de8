"""Checkpoint/resume of full SLAM state (trajectory + map + frame state).

The reference's only resume mechanism is npz snapshots of feature coordinates
keyed by start index (`getTransformKLT.py:405-425,539-541`, SURVEY.md §5.4) —
no pose or map state.  Here the entire `SlamState` pytree (which *contains* the
map) plus the host-side trajectory is saved with orbax when available, falling
back to a plain npz of the flattened pytree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:  # orbax is in the image; guard anyway
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

# Bump whenever the SlamState pytree layout changes (leaf count/order), so
# resume from an older checkpoint fails with a clear message instead of a
# raw KeyError (ADVICE.md r02 #2).  v1 = round-2 layout incl. pc_local/pc_mask;
# v2 = round-4 layout incl. MapState.frame_ids.
FORMAT_VERSION = 2


def save_state(path: str, state: Any, trajectory=None,
               meta: Optional[dict] = None) -> None:
    """Save a pytree (SlamState) + optional (timestamps, poses) trajectory.

    `meta` (JSON-serialisable) records resume bookkeeping — e.g. the absolute
    index of the next frame to process — read back by `load_meta`.
    """
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        os.path.join(path, "state.npz"),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"format_version": FORMAT_VERSION, "n_leaves": len(leaves),
                   "meta": meta or {}}, f)
    if trajectory is not None:
        ts, poses = trajectory.as_arrays()
        np.savez(os.path.join(path, "trajectory.npz"), timestamps=ts, poses=poses)


def load_state(path: str, like: Any) -> Tuple[Any, Optional[tuple]]:
    """Restore a pytree saved by `save_state`, using `like` for the treedef.

    `like` only supplies tree structure — `jax.eval_shape` output works.
    Raises a clear error (not a raw KeyError) when the checkpoint was written
    by an older/incompatible state layout (ADVICE.md r02 #2).
    """
    data = np.load(os.path.join(path, "state.npz"))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    with open(os.path.join(path, "treedef.json")) as f:
        td = json.load(f)
    n_saved = td.get("n_leaves", -1)
    version = td.get("format_version", 0)
    if version != FORMAT_VERSION or n_saved != len(leaves_like):
        raise ValueError(
            f"incompatible checkpoint at {path}: format_version={version} "
            f"(expected {FORMAT_VERSION}), {n_saved} saved leaves vs "
            f"{len(leaves_like)} in the current SlamState layout — it was "
            f"written by an older build; re-run from scratch or load with "
            f"that build"
        )
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    traj = None
    traj_path = os.path.join(path, "trajectory.npz")
    if os.path.exists(traj_path):
        t = np.load(traj_path)
        traj = (t["timestamps"], t["poses"])
    return state, traj


def load_meta(path: str) -> dict:
    """Resume metadata saved alongside the state (empty dict if none)."""
    with open(os.path.join(path, "treedef.json")) as f:
        return json.load(f).get("meta", {})
