"""Checkpoint/resume for streaming PEAQ state.

The stream state is an explicit pytree of arrays (parallel/stream.py), which
makes checkpointing trivial: save with orbax (or plain npz via the fallback)
and restore into a fresh stream.  The reference has no checkpointing — its
"state" lives in C structs inside a running GStreamer pipeline; this module
is the TPU-native equivalent enabling resumable hour-scale evaluations.
"""

from __future__ import annotations

import pathlib
from typing import Any

import numpy as np


def save_state(path: str, state: Any) -> None:
    """Save a stream state pytree (orbax if available, else npz)."""
    import jax

    path_obj = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path_obj.resolve(), jax.tree.map(np.asarray, state))
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(state)
    np.savez(str(path_obj) + ".npz",
             **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def load_state(path: str, like: Any) -> Any:
    """Restore a stream state saved by save_state; `like` provides the
    pytree structure (e.g. a freshly initialized stream's .state)."""
    import jax

    path_obj = pathlib.Path(path)
    npz = pathlib.Path(str(path_obj) + ".npz")
    if npz.exists():
        data = np.load(str(npz))
        leaves, treedef = jax.tree.flatten(like)
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new_leaves)
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path_obj.resolve(),
                        jax.tree.map(np.asarray, like))
