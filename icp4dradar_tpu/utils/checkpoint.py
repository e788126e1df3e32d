"""Checkpoint/resume of pipeline state (SURVEY.md §5: the reference's only
analog is the CSV record/replay fixture, src/iterative_closest_point.cpp:
188-206 — here the full {poses, map, frame index} state snapshots to disk and
resumes at scan k).

Uses orbax-style pytree serialization via numpy npz (no external service
deps); arbitrary pytrees of jnp/np arrays + static metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, metadata: Dict[str, Any] | None = None) -> None:
    """Snapshot a pytree of arrays + JSON-able metadata to `<path>.npz`."""
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    arrays["__meta__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with the same structure as `like`."""
    f = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = [f[f"leaf_{i}"] for i in range(n)]
    meta = json.loads(bytes(f["__meta__"]).decode()) if "__meta__" in f else {}
    state = jax.tree.unflatten(treedef, leaves)
    return state, meta
