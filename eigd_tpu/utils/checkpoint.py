"""Checkpoint / warm-restart of optimization state.

The reference has no checkpointing (SURVEY.md §5.4); this adds the natural
artifact: (x, lam, Phi, iteration, aux) saved with orbax so a topology
optimization loop can resume and the eigensolver can warm-start from the
previous design's eigenvectors.
"""

from __future__ import annotations

import numpy as np

import jax


def save_checkpoint(path, state: dict):
    """state: pytree of arrays (e.g. {'x': ..., 'lam': ..., 'Phi': ...})."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return "orbax"
    except Exception:
        # fall back to a plain npz (single-host)
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(str(path) + ".npz",
                 treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
                 **{f"arr{i}": np.asarray(a) for i, a in enumerate(flat)})
        return "npz"


def load_checkpoint(path, like: dict):
    """Restore a checkpoint with the structure of `like`."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, like)
    except Exception:
        data = np.load(str(path) + ".npz")
        flat, treedef = jax.tree_util.tree_flatten(like)
        arrs = [data[f"arr{i}"] for i in range(len(flat))]
        return jax.tree_util.tree_unflatten(treedef, arrs)
