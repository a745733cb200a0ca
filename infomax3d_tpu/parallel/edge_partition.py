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


# extras that index into the FULL edge ordering — meaningless on an edge
# shard; dropping them makes the aggregation dispatchers (ops/mailbox.py)
# fall through to the XLA segment path, which completes partials over the
# mesh axis (see ops/segment.py::pna_multi_aggregate `psum` completion).
_FULL_EDGE_EXTRAS = ("mb_in_edges", "mb_in_mask", "mb_edge_slot",
                     "mb_out_edges", "mb_out_mask", "mb_out_slot",
                     "csr_row_ptr", "_edge_perm", "csr_pos",
                     "csr_pair_base", "csr_pair_win")


def shard_batch_edges(g, k: int, axis: str):
    """Inside shard_map: slice a replicated GraphBatch down to this device's
    round-robin edge shard (edge e -> device ``e % k``).

    Node arrays stay replicated (full), so node-side compute is identical on
    every device of the `graph` axis; only the edge network (message MLPs —
    the FLOP-dominant part for dense 3D graphs, E ~ N^2) runs on E/k edges.
    The padded batch layout puts real edges first, so the round-robin stride
    balances real work across shards to within one edge — no host-side bin
    packing needed.  ``in_degree`` (precomputed over the FULL edge set by the
    batcher) is kept: it is the global degree the completed aggregation
    needs.
    """
    E = g.senders.shape[0]
    if E % k:
        raise ValueError(f"edge capacity {E} not divisible by graph_shards {k}")
    i = jax.lax.axis_index(axis)

    def _slice(a):
        if a is None:
            return None
        ar = a.reshape((E // k, k) + a.shape[1:])
        return jax.lax.dynamic_index_in_dim(ar, i, axis=1, keepdims=False)

    extras = {kk: v for kk, v in g.extras.items() if kk not in _FULL_EDGE_EXTRAS}
    return g.replace(
        senders=_slice(g.senders), receivers=_slice(g.receivers),
        edge_mask=_slice(g.edge_mask),
        edge_graph=None if g.edge_graph is None else _slice(g.edge_graph),
        edge_feat=None if g.edge_feat is None else _slice(g.edge_feat),
        edge_dist=None if g.edge_dist is None else _slice(g.edge_dist),
        extras=extras)


def edge_partitioned_segment_sum(messages: jnp.ndarray,
                                 receivers: jnp.ndarray,
                                 num_nodes: int, axis: str) -> jnp.ndarray:
    """Inside shard_map: local partial segment-sum + psum over the mesh axis.
    Equals the single-device segment_sum over the full edge set."""
    partial = jax.ops.segment_sum(messages, receivers, num_segments=num_nodes)
    return jax.lax.psum(partial, axis)
