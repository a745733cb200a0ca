"""Debug & observability toggles (SURVEY.md §5: the reference has only
`faulthandler.enable()`; here the JAX-native equivalents are first-class).

Usage:
    from infomax3d_tpu.utils.debug import debug_mode, enable_nan_checks
    with debug_mode():            # disable_jit + NaN checks + faulthandler
        trainer.train(...)
"""
from __future__ import annotations

import contextlib
import faulthandler


def enable_faulthandler():
    faulthandler.enable()


def enable_nan_checks(on: bool = True):
    import jax
    jax.config.update("jax_debug_nans", on)


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True, disable_jit: bool = True):
    import jax
    enable_faulthandler()
    prev_nan = jax.config.jax_debug_nans
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    ctx = jax.disable_jit() if disable_jit else contextlib.nullcontext()
    try:
        with ctx:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)


@contextlib.contextmanager
def pallas_interpret_mode():
    """Force all Pallas kernels through the interpreter (kernel debugging)."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace around a block; inspect with the trace-viewer or
    the parser in tools/parse_trace.py."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
