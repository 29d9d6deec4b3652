"""Streaming-state checkpointing.

In the reference, the .nam file IS the (inference-only) checkpoint, and
runtime state (ring buffers, LSTM h/c) is not serializable — "resume" means
Reset() + prewarm (SURVEY.md §5). Here runtime state is an explicit pytree,
so it can additionally be snapshotted and restored exactly — useful for
migrating live streams between hosts/chips or resuming long renders.

Format: a .npz of flattened state leaves + a JSON treedef descriptor. Each
leaf is stored under its pytree key path, so files are robust to dict
ordering. Device placement/sharding is the caller's job on restore (pass
``device_put_fn`` to shard, e.g. parallel.sharding.shard_state).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

import numpy as np

import jax


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Serialize a state pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    keys = []
    for kp, leaf in leaves:
        k = _key_str(kp)
        keys.append(k)
        arrays[k] = np.asarray(leaf)
    arrays["__treedef__"] = np.frombuffer(
        json.dumps({"keys": keys, "metadata": metadata or {}}).encode(), dtype=np.uint8
    )
    # Write through a file object: np.savez(str) appends '.npz' when the
    # extension is missing, which would break the save/load path symmetry.
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_state(path: str, like: Any, device_put_fn: Optional[Callable] = None) -> Any:
    """Restore a state pytree saved by save_state. ``like`` provides the tree
    structure (e.g. a fresh ``model.init_state(batch)`` / engine state); leaf
    shapes and dtypes must match the snapshot."""
    with np.load(path) as data:
        desc = json.loads(bytes(data["__treedef__"]).decode())
        leaves_like = jax.tree_util.tree_flatten_with_path(like)
        paths = [_key_str(kp) for kp, _ in leaves_like[0]]
        missing = [k for k in paths if k not in data]
        if missing:
            raise ValueError(f"state snapshot missing leaves: {missing[:5]}")
        new_leaves = []
        for k, (_, old) in zip(paths, leaves_like[0]):
            arr = data[k]
            if tuple(arr.shape) != tuple(np.shape(old)):
                raise ValueError(
                    f"state leaf {k}: snapshot shape {arr.shape} != expected {np.shape(old)}"
                )
            old_dtype = np.asarray(old).dtype if not hasattr(old, "dtype") else old.dtype
            if arr.dtype != old_dtype:
                raise ValueError(
                    f"state leaf {k}: snapshot dtype {arr.dtype} != expected {old_dtype}"
                )
            if device_put_fn is not None:
                arr = device_put_fn(arr)
            new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), new_leaves)
