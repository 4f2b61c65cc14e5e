"""Checkpoint/resume for streaming PEAQ state.

The stream state is an explicit pytree of arrays (parallel/stream.py), which
makes checkpointing trivial: save with orbax (or plain npz via the fallback)
and restore into a fresh stream.  The reference has no checkpointing — its
"state" lives in C structs inside a running GStreamer pipeline; this module
is the TPU-native equivalent enabling resumable hour-scale evaluations.

Every checkpoint embeds parallel.stream.STATE_FORMAT_VERSION; loading a
checkpoint written under a different state layout fails with an explicit
message instead of opaque shape/transfer errors mid-stream.
"""

from __future__ import annotations

import pathlib
from typing import Any

import numpy as np


def _format_version() -> int:
    from ..parallel.stream import STATE_FORMAT_VERSION
    return STATE_FORMAT_VERSION


def _check_version(found: int | None, path: str) -> None:
    want = _format_version()
    if found is None:
        raise ValueError(
            f"checkpoint {path!r} carries no state-format version: it was "
            f"written by a pre-v{want} revision whose state layout is "
            "incompatible (complex biquad carries / transposed e0 tail); "
            "re-run the evaluation from the start")
    if int(found) != want:
        raise ValueError(
            f"checkpoint {path!r} has state-format version {int(found)}, "
            f"this build expects {want}; the carried state layouts are "
            "incompatible — re-run the evaluation from the start")


def save_state(path: str, state: Any) -> None:
    """Save a stream state pytree (orbax if available, else npz)."""
    import jax

    path_obj = pathlib.Path(path)
    version = np.int64(_format_version())
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path_obj.resolve(),
                  {"format_version": version,
                   "state": jax.tree.map(np.asarray, state)})
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(state)
    np.savez(str(path_obj) + ".npz", format_version=version,
             **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def load_state(path: str, like: Any) -> Any:
    """Restore a stream state saved by save_state; `like` provides the
    pytree structure (e.g. a freshly initialized stream's .state)."""
    import jax

    path_obj = pathlib.Path(path)
    npz = pathlib.Path(str(path_obj) + ".npz")
    if npz.exists():
        data = np.load(str(npz))
        _check_version(data["format_version"]
                       if "format_version" in data else None, path)
        leaves, treedef = jax.tree.flatten(like)
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new_leaves)
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    try:
        out = ckpt.restore(path_obj.resolve(),
                           {"format_version": np.int64(0),
                            "state": jax.tree.map(np.asarray, like)})
    except Exception as exc:
        raise ValueError(
            f"checkpoint {path!r} does not match the current stream-state "
            f"format (v{_format_version()}); it was likely written by an "
            f"older revision — re-run the evaluation from the start "
            f"({type(exc).__name__}: {exc})") from exc
    _check_version(out.get("format_version"), path)
    return out["state"]
