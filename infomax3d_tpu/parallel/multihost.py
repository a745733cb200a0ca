"""Multi-host runtime (SURVEY.md §2.7 — new capability, absent upstream).

One process per host; `initialize_multihost()` wires `jax.distributed`, after
which `jax.devices()` spans the slice and the data-parallel mesh covers all
chips.  Each host feeds its own shard stream (`host_shard_indices`); the
shard_map train step and collectives are host-count agnostic.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; TPU pods auto-detect
    when everything is None)."""
    import jax
    kwargs = {}
    ca = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if ca:
        kwargs["coordinator_address"] = ca
        kwargs["num_processes"] = int(
            num_processes or os.environ["NUM_PROCESSES"])
        kwargs["process_id"] = int(process_id or os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def host_shard_indices(n_items: int, seed: int = 0,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> np.ndarray:
    """Deterministic disjoint per-host index shards: every host permutes the
    SAME way (same seed) then takes its stride slice, so the union is exactly
    the dataset and epochs stay globally shuffled."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    perm = np.random.default_rng(seed).permutation(n_items)
    return perm[pi::pc]


def local_mesh_devices():
    import jax
    return [d for d in jax.devices() if d.process_index == jax.process_index()]
