"""Checkpoint / resume for SLAM state (map + trajectory + BA problem).

The reference has nothing to checkpoint (stateless per-frame calls,
SURVEY.md §5.4); the SLAM backend's persistent state (plane-landmark map,
keyframe poses) snapshots via Orbax when available, with a numpy .npz
fallback so checkpointing never depends on optional deps.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict) -> None:
    """state: a dict of arrays / NamedTuples (e.g. {'map': MapState, ...})."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), _to_numpy_tree(state), force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    flat, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(state))
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(str(path) + ".npz", treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), n=len(flat),
        **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)})


def load_checkpoint(path: str, example_state: dict):
    """Restore a checkpoint saved by save_checkpoint; example_state provides
    the tree structure (and dtypes for orbax)."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        if path.exists() and path.is_dir():
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(path.resolve(), _to_numpy_tree(example_state))
    except Exception:
        pass
    npz = np.load(str(path) + ".npz")
    flat = [npz[f"leaf_{i}"] for i in range(int(npz["n"]))]
    treedef = jax.tree_util.tree_structure(example_state)
    return jax.tree_util.tree_unflatten(treedef, flat)
