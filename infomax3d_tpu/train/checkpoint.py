"""Checkpointing — same contract as the reference (trainer/trainer.py:252-280):

`best_checkpoint.pt` + `last_checkpoint.pt` per epoch, payload = epoch,
best_val_score, optim_steps, model state(s), optimizer state, scheduler
state; plus the config YAML copied beside the run.  Epoch-milestone snapshots
(`best_checkpoint_{E}epochs.pt`) via `models_to_save`.

Serialization is flax msgpack (host-independent, no pickle of arrays);
a small JSON sidecar carries python scalars.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _gather_tree(state):
    """device -> host with ONE transfer per dtype instead of one per leaf.

    `jax.device_get(tree)` issues a round-trip per buffer; a train state
    has ~450 leaves, which on a high-latency device link (remote TPU
    tunnels) turns a 20 MB checkpoint into minutes of serial fetches.
    Concatenating the raveled leaves on device (grouped by dtype — no
    promotion, bit-exact) and splitting on host makes it one DMA per
    dtype.  Extended dtypes (typed PRNG keys) and non-device leaves fall
    back to device_get."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree_util.tree_flatten(state)
    by_dt: Dict[Any, list] = {}
    for i, l in enumerate(leaves):
        if isinstance(l, jax.Array) and not jnp.issubdtype(
                l.dtype, jax.dtypes.extended):
            by_dt.setdefault(np.dtype(l.dtype), []).append(i)
    out = [None] * len(leaves)
    for dt, idxs in by_dt.items():
        flat = jnp.concatenate([leaves[i].reshape(-1) for i in idxs]) \
            if len(idxs) > 1 else leaves[idxs[0]].reshape(-1)
        host = np.asarray(jax.device_get(flat))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    for i, l in enumerate(leaves):
        if out[i] is None:
            out[i] = jax.device_get(l)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(path: str, state, host_state: Dict[str, Any]) -> None:
    state = _gather_tree(state)
    blob = serialization.to_bytes(state)
    # atomic replace: a reader (end-of-train best reload, a resuming run, or
    # a multi-seed sibling thread) must never observe a partially written
    # file — os.replace is atomic on POSIX
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    with open(path + ".json.tmp", "w") as f:
        json.dump(_jsonable(host_state), f, indent=2)
    os.replace(path + ".json.tmp", path + ".json")


def load_checkpoint(path: str, state_template) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        data = f.read()
    try:
        state = serialization.from_bytes(state_template, data)
    except Exception as e:
        raise ValueError(f"checkpoint {path} unreadable "
                         f"({len(data)} bytes): {e}") from e
    host_state = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            host_state = json.load(f)
    return state, host_state


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, float) and (obj != obj):  # NaN
        return None
    return obj
