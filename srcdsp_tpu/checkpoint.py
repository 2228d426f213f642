"""Checkpoint / resume for streaming chains (SURVEY.md §5).

The reference has no checkpointing; here the entire mutable universe of a
running chain is one small pytree (overlap tails, NCO phase words, timing
accumulators), so checkpointing is trivial and exact: save the state pytree
plus the stream position every K blocks; resume = load pytree + seek the
capture file to that block (io.capture.read_capture_blocks(start_block=...)).

Uses orbax-checkpoint when importable, with a plain .npz fallback so the
core package works without it. Resumed runs are bit-identical to unbroken
runs (state round-trips losslessly; u32/f32/c64 leaves preserved exactly).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(state: Any):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save(path: str, state: Any, block_index: int, extra: dict | None = None) -> None:
    """Save a chain state pytree + stream position. Overwrites `path`(.npz).

    Atomic: block_index travels INSIDE the .npz (one os.replace commits state
    and position together), and the human-readable .json sidecar is also
    replaced atomically — a crash at any point leaves either the old
    checkpoint or the new one, never a state/position mismatch.
    """
    leaves, treedef = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["block_index"] = np.asarray(int(block_index))
    meta = {
        "block_index": int(block_index),
        "num_leaves": len(leaves),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    tmpj = path + ".tmp.json"
    with open(tmpj, "w") as f:
        json.dump(meta, f)
    os.replace(tmpj, path + ".json")


def restore(path: str, example_state: Any) -> tuple[Any, int]:
    """Load (state, block_index). `example_state` supplies the tree structure
    (and device placement targets) — its leaf VALUES are ignored."""
    with open(path + ".json") as f:
        meta = json.load(f)
    data = np.load(path + ".npz")
    # the position embedded in the .npz is authoritative (committed atomically
    # with the state); the .json value is advisory for humans
    if "block_index" in data:
        meta["block_index"] = int(data["block_index"])
    leaves, treedef = _flatten(example_state)
    if meta["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves, expected {len(leaves)}")
    new_leaves = []
    for i, ex in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        ex_arr = np.asarray(ex)
        if arr.shape != ex_arr.shape or arr.dtype != ex_arr.dtype:
            raise ValueError(
                f"leaf {i}: checkpoint {arr.shape}/{arr.dtype} vs "
                f"expected {ex_arr.shape}/{ex_arr.dtype}")
        new_leaves.append(jax.numpy.asarray(arr))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state, int(meta["block_index"])


def exists(path: str) -> bool:
    return os.path.exists(path + ".npz") and os.path.exists(path + ".json")


def delete(path: str) -> None:
    """Invalidate a checkpoint (call when the stream completes)."""
    for suffix in (".npz", ".json"):
        try:
            os.remove(path + suffix)
        except FileNotFoundError:
            pass


# --- orbax backend (multi-host-capable; same (state, block_index) contract).
# The .npz functions above remain the dependency-free default; use these for
# sharded state on pods (orbax handles per-host shard persistence).

def save_orbax(path: str, state: Any, block_index: int) -> None:
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
        ck.save(os.path.abspath(path) + ".orbax",
                {"state": state, "block_index": np.asarray(block_index)},
                force=True)


def restore_orbax(path: str, example_state: Any) -> tuple[Any, int]:
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
        out = ck.restore(os.path.abspath(path) + ".orbax",
                         {"state": example_state,
                          "block_index": np.asarray(0)})
    return out["state"], int(out["block_index"])
