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
    if jax.default_backend() == "cpu":
        # CPU-only runs (tests) compile fast and — behind a remote-compile
        # tunnel — cached CPU AOT artifacts may target the service's machine
        # features, not this host's (SIGILL risk).  Skip.
        _CACHE_ENABLED = True
        return
    path = path or os.environ.get(
        "INFOMAX3D_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "infomax3d_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # threshold keeps small host-side CPU-backend ops (metrics) out of the
    # cache; the big fused TPU train steps stay in
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _CACHE_ENABLED = True


def seed_all(seed: int) -> np.random.Generator:
    """Host-side seeding (reference commons/utils.py:15-28).  JAX device RNG
    uses explicit keys; this seeds numpy/python for data pipeline parity."""
    seed = seed or 0
    np.random.seed(seed)
    random.seed(seed)
    return np.random.default_rng(seed)
