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


def save_checkpoint(path: str, state, host_state: Dict[str, Any]) -> None:
    state = jax.device_get(state)
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
