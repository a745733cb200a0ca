"""Trace-time context: which mesh axis (if any) the current computation is
mapped over.

Modules that must aggregate across data shards (masked BatchNorm statistics,
masked supervised losses) read this at trace time instead of threading an
`axis_name` argument through every model signature.  Set by the parallel
train step while tracing inside `shard_map`.
"""
from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Optional

_AXIS: ContextVar[Optional[str]] = ContextVar("cross_replica_axis", default=None)


def cross_replica_axis() -> Optional[str]:
    return _AXIS.get()


@contextlib.contextmanager
def using_cross_replica_axis(name: Optional[str]):
    token = _AXIS.set(name)
    try:
        yield
    finally:
        _AXIS.reset(token)
