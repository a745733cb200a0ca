"""Edge-partitioned graph parallelism (SURVEY.md §5 "long-context" analog).

For graphs too large for one chip's batch (or giant batched graphs), the EDGE
set is sharded across the mesh while node features are replicated: each
device runs the edge network on its edge shard, segment-reduces into a full
node-sized partial, and a `psum` over ICI completes the aggregation — the
all-reduce formulation of DistGNN-style edge partitioning (boundary-node
exchange degenerates to psum when nodes are replicated, which is the right
trade at molecular node counts; `ppermute` halo exchange becomes profitable
only when the node set itself must be sharded).

Host side, `partition_edges` balances edges across shards by per-molecule
greedy bin packing so shard loads stay within a few percent.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def partition_edges(edge_graph: np.ndarray, edge_mask: np.ndarray,
                    n_shards: int) -> np.ndarray:
    """Greedy per-molecule bin packing of edges into `n_shards` balanced
    shards.  Returns shard id per edge (padding edges spread round-robin)."""
    E = edge_graph.shape[0]
    shard_of_edge = np.zeros(E, np.int32)
    loads = np.zeros(n_shards, np.int64)
    graphs, counts = np.unique(edge_graph[edge_mask], return_counts=True)
    order = np.argsort(-counts)
    for gi in order:
        g = graphs[gi]
        s = int(np.argmin(loads))
        sel = (edge_graph == g) & edge_mask
        shard_of_edge[sel] = s
        loads[s] += counts[gi]
    pad_idx = np.nonzero(~edge_mask)[0]
    shard_of_edge[pad_idx] = np.arange(len(pad_idx)) % n_shards
    return shard_of_edge


def shard_edge_arrays(arrays: Dict[str, np.ndarray], shard_of_edge: np.ndarray,
                      n_shards: int, keys: Sequence[str]) -> Dict[str, np.ndarray]:
    """Reorder + pad edge arrays into [n_shards, E_shard] stacks (leading axis
    consumed by shard_map)."""
    out = {}
    per_shard: List[np.ndarray] = [np.nonzero(shard_of_edge == s)[0]
                                   for s in range(n_shards)]
    e_shard = max(len(idx) for idx in per_shard)
    e_shard = int(np.ceil(e_shard / 8) * 8)
    for k in keys:
        a = arrays[k]
        pads = np.zeros((n_shards, e_shard) + a.shape[1:], a.dtype)
        if a.dtype == np.int32 and k in ("senders", "receivers"):
            pads[:] = np.iinfo(np.int32).max // 2   # out-of-range padding
        for s, idx in enumerate(per_shard):
            pads[s, :len(idx)] = a[idx]
        out[k] = pads
    n_edges = shard_of_edge.shape[0]
    mask = np.zeros((n_shards, e_shard), bool)
    for s, idx in enumerate(per_shard):
        mask[s, :len(idx)] = arrays.get("edge_mask",
                                        np.ones(n_edges, bool))[idx]
    out["edge_shard_mask"] = mask
    return out


def edge_partitioned_segment_sum(messages: jnp.ndarray,
                                 receivers: jnp.ndarray,
                                 num_nodes: int, axis: str) -> jnp.ndarray:
    """Inside shard_map: local partial segment-sum + psum over the mesh axis.
    Equals the single-device segment_sum over the full edge set."""
    partial = jax.ops.segment_sum(messages, receivers, num_segments=num_nodes)
    return jax.lax.psum(partial, axis)
