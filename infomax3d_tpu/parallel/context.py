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

# Mesh axis over which the EDGE SET of the current batch is sharded
# (edge-partitioned graph parallelism, parallel/edge_partition.py).  Read by
# the edge->node aggregation ops (ops/segment.py, ops/mailbox.py) to complete
# their local partial reductions with psum/pmax/pmin over this axis.
_EDGE_AXIS: ContextVar[Optional[str]] = ContextVar("edge_partition_axis",
                                                   default=None)


def cross_replica_axis() -> Optional[str]:
    return _AXIS.get()


@contextlib.contextmanager
def using_cross_replica_axis(name: Optional[str]):
    token = _AXIS.set(name)
    try:
        yield
    finally:
        _AXIS.reset(token)


def edge_partition_axis() -> Optional[str]:
    return _EDGE_AXIS.get()


@contextlib.contextmanager
def using_edge_partition_axis(name: Optional[str]):
    token = _EDGE_AXIS.set(name)
    try:
        yield
    finally:
        _EDGE_AXIS.reset(token)


# Mesh axis over which the NODE SET is sharded (ppermute-halo node
# partitioning, parallel/node_partition.py).  Read by the sender-side
# gathers (ops/mailbox.py — halo-exchange ghosts before the take), the
# graph readout (ops/segment.py::graph_readout — psum/pmax completion of
# per-shard partials), and masked BatchNorm (models/base.py — statistics
# over the genuinely-split node/edge rows).  Receiver-side aggregation
# needs NO completion: every edge lives on the shard that owns its
# receiver, so a node's whole in-edge set is local.
_NODE_AXIS: ContextVar[Optional[str]] = ContextVar("node_partition_axis",
                                                   default=None)


def node_partition_axis() -> Optional[str]:
    return _NODE_AXIS.get()


@contextlib.contextmanager
def using_node_partition_axis(name: Optional[str]):
    token = _NODE_AXIS.set(name)
    try:
        yield
    finally:
        _NODE_AXIS.reset(token)
