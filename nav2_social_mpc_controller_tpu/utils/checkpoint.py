"""Checkpoint/resume for long batch campaigns.

The reference's only cross-tick persistence is the in-memory TrajectoryMemory
warm start (trajectory_memory.hpp:32-49) — no disk persistence. For
large-scale scenario campaigns this module snapshots the batched
ControllerCarry (and any other pytree state) with Orbax, with a NumPy .npz
fallback when Orbax is unavailable (SURVEY.md section 5.4).
"""

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - environment without orbax
    _HAVE_ORBAX = False


def save_carry(path: str, state: Any, use_orbax: bool = True) -> str:
    """Snapshot a pytree of arrays. Returns the path written.

    Leaves are stored positionally (leaf_i in flatten order) so restore is
    exact for any pytree whose structure the caller can rebuild (`like`).

    use_orbax=False forces the .npz writer — REQUIRED for per-process
    host-local snapshots under jax.distributed: orbax's save protocol
    synchronizes all processes around one global checkpoint directory and
    deadlocks when each process writes its own path."""
    path = os.path.abspath(path)
    flat, _ = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    if _HAVE_ORBAX and use_orbax:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        return path
    np.savez(path + ".npz", **payload)
    return path + ".npz"


def restore_carry(path: str, like: Any) -> Any:
    """Restore a pytree snapshot with the structure/dtypes of `like`."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        data = ocp.PyTreeCheckpointer().restore(path)
    else:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [jnp.asarray(data[f"leaf_{i}"], l.dtype) for i, l in enumerate(leaves_like)]
    return jax.tree.unflatten(treedef, leaves)
