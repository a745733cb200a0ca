"""Runtime setup helpers."""
from __future__ import annotations

import os
import random

import numpy as np

_CACHE_ENABLED = False


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    TPU compiles of the fused train step take tens of seconds (minutes via a
    remote-compile tunnel); the disk cache makes every process after the
    first start instantly.  Called automatically by Trainer/bench/CLI.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax
    path = path or os.environ.get(
        "INFOMAX3D_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "infomax3d_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_ENABLED = True


def seed_all(seed: int) -> np.random.Generator:
    """Host-side seeding (reference commons/utils.py:15-28).  JAX device RNG
    uses explicit keys; this seeds numpy/python for data pipeline parity."""
    seed = seed or 0
    np.random.seed(seed)
    random.seed(seed)
    return np.random.default_rng(seed)
