"""Segment reductions — the XLA compute core replacing DGL message passing.

These are the TPU-native equivalents of the fused gather-edge-scatter CUDA
kernels the reference consumes through DGL (`g.update_all`, `g.apply_edges`,
`dgl.readout_nodes` — e.g. `models/pna.py:203-206`, `models/net3d.py:109-110`)
and through `torch_scatter.scatter`.

Conventions (see `graphs/batch.py`): padding indices are OUT OF RANGE
(node index N for padding edges, graph index G for padding nodes).  XLA's
scatter in drop mode ignores them, so no masking is needed on the scatter
side; gather sides use clip + mask.

DGL zero-degree semantics are preserved: a node (or graph) with no incoming
messages gets 0 for every aggregator, including max/min
(torch/DGL fill empty reductions with 0 in `update_all`).

A Pallas fused kernel path lives in `ops/pallas/`; these XLA versions are the
correctness oracle and the default (XLA already fuses the elementwise work
into the scatter well on TPU).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

EPS = 1e-5  # matches reference models/pna.py:14


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


import functools as _functools


def tri_block_prefix_sum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inclusive prefix sum over rows of ``x [E, D]`` computed on the MXU:
    per-block cumsum = lower-triangular-ones matmul (f32 accumulation), then
    a tiny f32 cumsum of block totals broadcast back.  Returns f32 [E, D].

    TPU's native cumsum lowering is transpose-heavy (~0.64 ms for
    f32[18432,200] on v5e); this runs the same prefix in ~0.1 ms because the
    O(E·block·D) triangular matmul rides the systolic array.
    """
    E, D = x.shape
    Ep = ((E + block - 1) // block) * block
    if Ep != E:
        x = jnp.pad(x, ((0, Ep - E), (0, 0)))
    nb = Ep // block
    xb = x.reshape(nb, block, D)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    within = jnp.einsum("ab,nbd->nad", tri, xb,
                        preferred_element_type=jnp.float32)
    block_tot = within[:, -1, :]
    offs = jnp.concatenate(
        [jnp.zeros((1, D), jnp.float32), jnp.cumsum(block_tot[:-1], 0)], 0)
    return (within + offs[:, None, :]).reshape(Ep, D)[:E]


def sorted_segment_sum(data: jnp.ndarray, row_ptr: jnp.ndarray,
                       block: int = 256) -> jnp.ndarray:
    """Segment sum for CONTIGUOUS sorted segments given by CSR ``row_ptr``
    [N+1], scatter-free: prefix-sum differences at the segment boundaries.

    TPU's scatter is row-serialized (~0.2 ms per 18k rows regardless of
    width); this costs one MXU triangular matmul + two N-row gathers
    (~0.06 ms for bf16[18432,200] → [8960,200] on v5e).  Rows at or beyond
    ``row_ptr[-1]`` (sorted-to-the-end padding) never affect the output.
    Differences of f32 prefix sums — not bit-exact vs sequential summation,
    ~1e-6 relative for fp32 inputs.
    """
    prefix = tri_block_prefix_sum(data, block)
    D = data.shape[-1]
    z = jnp.zeros((1, D), prefix.dtype)
    c2 = jnp.concatenate([z, prefix], axis=0)
    out = jnp.take(c2, row_ptr[1:], axis=0) - jnp.take(c2, row_ptr[:-1], axis=0)
    return out.astype(data.dtype)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6, 8))
def take_rows(nodes: jnp.ndarray, idx: jnp.ndarray,
              indices_sorted: bool = False,
              row_ptr: Optional[jnp.ndarray] = None,
              perm: Optional[jnp.ndarray] = None,
              max_deg: int = 0, tile_win: int = 0,
              snd_base: Optional[jnp.ndarray] = None,
              snd_win: int = 0) -> jnp.ndarray:
    """`nodes[idx.clip(0, N-1)]` with an optimized backward: (a) out-of-range
    padding rows are dropped (their cotangents are exactly zero — padding
    edges never reach the loss); (b) when `row_ptr` is given (receiver-sorted
    CSR buckets), the backward is the scatter-free `sorted_segment_sum`
    instead of TPU's row-serialized scatter (~3x on v5e: 0.06 vs 0.19 ms for
    an 18k-row bf16[.,200] accumulation); (c) `perm` additionally re-sorts the
    cotangent first — pass the CSC edge order + sender row_ptr so UNSORTED
    sender gathers get the same scatter-free backward (a gather is cheap, a
    scatter is not); (d) with `max_deg` > 0 (static; `tile_win` optionally
    compacts the window) a bf16 cotangent on a non-CPU backend rides the
    Pallas incidence-matmul segment sum (`ops.pallas.spmm.csr_segment_sum_
    bf16`) — no f32 [E, D] prefix materialization, exact f32 accumulation
    in-register (measured v5e: ~0.72 ms/step of boundary-gather fusions
    removed from the flagship train step); (e) `snd_base`/`snd_win`
    (batcher csr_pair_base/csr_pair_win) switch the unsorted-idx backward to
    the SENDER-KEYED incidence seg-sum (`snd_segment_sum_bf16`) — same
    result as the (c) path with NO [E, D] permutation gather."""
    return jnp.take(nodes, jnp.clip(idx, 0, nodes.shape[0] - 1), axis=0)


def _take_rows_fwd(nodes, idx, indices_sorted, row_ptr=None, perm=None,
                   max_deg=0, tile_win=0, snd_base=None, snd_win=0):
    return (take_rows(nodes, idx, indices_sorted, row_ptr, perm, max_deg,
                      tile_win, snd_base, snd_win),
            (idx, row_ptr, perm, snd_base, nodes.shape[0]))


def _use_segsum_kernel(ct, max_deg: int) -> bool:
    import os
    if max_deg <= 0 or os.environ.get("INFOMAX3D_SEGSUM_KERNEL", "1") == "0":
        return False
    return (ct.dtype == jnp.bfloat16 and ct.ndim == 2
            and ct.shape[1] <= 512 and jax.default_backend() != "cpu")


def _take_rows_bwd(indices_sorted, max_deg, tile_win, snd_win, res, ct):
    idx, row_ptr, perm, snd_base, n = res
    if (snd_win > 0 and snd_base is not None and n < 2 ** 15
            and _use_segsum_kernel(ct, max_deg)):
        # n < 2^15: sender ids ride the window as two bf16 lanes
        # (hi = s//128, lo = s%128) — hi is only integer-exact up to 256,
        # so beyond 2^15 padded nodes fall back to the CSC-permuted path
        # sender-keyed incidence seg-sum: no ct permutation gather
        from infomax3d_tpu.ops.pallas.spmm import snd_segment_sum_bf16
        return (snd_segment_sum_bf16(ct, idx, snd_base, snd_win)[:n],
                None, None, None, None)
    if row_ptr is not None:
        if perm is not None:
            ct = jnp.take(ct, perm, axis=0)
        if _use_segsum_kernel(ct, max_deg):
            from infomax3d_tpu.ops.pallas.spmm import csr_segment_sum_bf16
            return (csr_segment_sum_bf16(ct, row_ptr, max_deg, tile_win),
                    None, None, None, None)
        return sorted_segment_sum(ct, row_ptr), None, None, None, None
    d = jax.ops.segment_sum(ct, idx, num_segments=n,
                            indices_are_sorted=indices_sorted)
    return d, None, None, None, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def degree(segment_ids: jnp.ndarray, num_segments: int,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """In-degree per segment. Out-of-range padding ids are dropped by XLA."""
    ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask.astype(jnp.float32)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    d = degree(segment_ids, num_segments)
    return s / jnp.maximum(d, 1.0)[..., None] if data.ndim > 1 else s / jnp.maximum(d, 1.0)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                empty_value: float = 0.0) -> jnp.ndarray:
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    d = degree(segment_ids, num_segments)
    has = (d > 0)
    if data.ndim > 1:
        has = has[:, None]
    return jnp.where(has, out, empty_value)


def segment_min(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                empty_value: float = 0.0) -> jnp.ndarray:
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    d = degree(segment_ids, num_segments)
    has = (d > 0)
    if data.ndim > 1:
        has = has[:, None]
    return jnp.where(has, out, empty_value)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Numerically-stable softmax over segments (for graph attention)."""
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        m = mask if logits.ndim == 1 else mask[:, None]
        logits = jnp.where(m, logits, neg)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids.clip(0, num_segments - 1)]
    expv = jnp.exp(shifted)
    if mask is not None:
        m = mask if logits.ndim == 1 else mask[:, None]
        expv = jnp.where(m, expv, 0.0)
    seg_sum = jax.ops.segment_sum(expv, segment_ids, num_segments=num_segments)
    return expv / jnp.maximum(seg_sum[segment_ids.clip(0, num_segments - 1)], 1e-16)


# ---------------------------------------------------------------------------
# PNA multi-aggregator reduce
# ---------------------------------------------------------------------------

PNA_AGGREGATOR_NAMES = ("mean", "sum", "max", "min", "std", "var",
                        "moment3", "moment4", "moment5")
PNA_SCALER_NAMES = ("identity", "amplification", "attenuation")


def pna_multi_aggregate(
    messages: jnp.ndarray,          # [E, D]
    receivers: jnp.ndarray,         # [E] (padding -> out of range)
    num_nodes: int,
    aggregators: Sequence[str],
    scalers: Sequence[str] = ("identity",),
    avg_d_log: float = 1.0,
    deg: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One-pass fused multi-aggregator segment reduction with degree scalers.

    Reproduces the mailbox reduce of reference `models/pna.py:221-235`:
    aggregators over the incoming-message set per node, concatenated, then (if
    more than one scaler is configured — a reference quirk we preserve) each
    scaler applied and concatenated.  Zero-degree nodes produce 0.

    TPU cost note: XLA TPU scatter is row-serialized (~0.19 ms per scatter at
    molecular batch sizes), so scatters are MINIMIZED: sum and sum-of-squares
    share ONE segment_sum over [E, 2D]; max and min share ONE segment_max
    over [msg, -msg]; the degree comes precomputed from the batcher when
    available (`deg`).
    """
    E, D = messages.shape
    in_dtype = messages.dtype
    # bf16 compute mode: segment accumulation in f32 (bf16 segment_sum would
    # round every partial sum to 8-bit mantissa); result cast back at exit
    messages = messages.astype(jnp.float32)
    # edge-partitioned graph parallelism (parallel/edge_partition.py): the
    # caller passes this device's edge shard; local partial sums/extrema are
    # completed with psum/pmax over the mesh axis before any derived stat
    from infomax3d_tpu.parallel.context import edge_partition_axis
    part_ax = edge_partition_axis()
    if deg is None:
        deg = degree(receivers, num_nodes)                   # [num_nodes]
        if part_ax is not None:
            deg = jax.lax.psum(deg, part_ax)
    # (deg from the batcher's `in_degree` extras is already the global degree)
    deg = deg.astype(jnp.float32)
    deg_safe = jnp.maximum(deg, 1.0)[:, None]
    has = (deg > 0.0)[:, None]

    need_mean = any(a in ("mean", "std", "var", "moment3", "moment4", "moment5")
                    for a in aggregators)
    need_sq = any(a in ("std", "var") for a in aggregators)
    if need_sq:
        both = jax.ops.segment_sum(
            jnp.concatenate([messages, messages * messages], axis=-1),
            receivers, num_segments=num_nodes)
        if part_ax is not None:
            both = jax.lax.psum(both, part_ax)
        s1, s2 = both[:, :D], both[:, D:]
    else:
        s1 = jax.ops.segment_sum(messages, receivers, num_segments=num_nodes)
        if part_ax is not None:
            s1 = jax.lax.psum(s1, part_ax)
        s2 = None
    mean = s1 / deg_safe if need_mean else None

    mx = mn_ = None
    want_max = "max" in aggregators
    want_min = "min" in aggregators
    if want_max or want_min:
        # one shared segment_max over [msg, -msg]; empty local segments hold
        # the -inf identity, so pmax completion (locally-empty but globally
        # non-empty segments) happens BEFORE the zero-degree masking, which
        # uses the global degree
        cat = [messages] if not want_min else (
            [messages, -messages] if want_max else [-messages])
        both_mx = jax.ops.segment_max(
            jnp.concatenate(cat, axis=-1) if len(cat) > 1 else cat[0],
            receivers, num_segments=num_nodes)
        if part_ax is not None:
            # differentiable pmax: all_gather + max (lax.pmax has no VJP);
            # the max's subgradient routes the cotangent to the winning
            # device's partial, matching segment_max semantics
            both_mx = jnp.max(jax.lax.all_gather(both_mx, part_ax), axis=0)
        if want_max:
            mx = jnp.where(has, both_mx[:, :D], 0.0)
        if want_min:
            mn_ = jnp.where(has, -both_mx[:, -D:], 0.0)

    results: Dict[str, jnp.ndarray] = {}
    for a in aggregators:
        if a == "sum":
            results[a] = s1
        elif a == "mean":
            results[a] = jnp.where(has, mean, 0.0)
        elif a == "max":
            results[a] = mx
        elif a == "min":
            results[a] = mn_
        elif a in ("std", "var"):
            var = jax.nn.relu(s2 / deg_safe - mean * mean)   # relu stabilization, pna.py:36
            if a == "var":
                results[a] = jnp.where(has, var, 0.0)
            else:
                results[a] = jnp.where(has, jnp.sqrt(var + EPS), 0.0)
        elif a.startswith("moment"):
            n = int(a[len("moment"):])
            centered = messages - jnp.take(mean, receivers.clip(0, num_nodes - 1), axis=0)
            mom_s = jax.ops.segment_sum(centered ** n, receivers,
                                        num_segments=num_nodes)
            if part_ax is not None:
                mom_s = jax.lax.psum(mom_s, part_ax)
            mn = mom_s / deg_safe
            rooted = jnp.sign(mn) * jnp.power(jnp.abs(mn) + EPS, 1.0 / n)
            results[a] = jnp.where(has, rooted, 0.0)
        else:
            raise ValueError(f"unknown PNA aggregator: {a}")

    h = jnp.concatenate([results[a] for a in aggregators], axis=-1)

    # Reference quirk (models/pna.py:232): scalers only applied when >1 configured.
    if len(scalers) > 1:
        log_deg = jnp.log(deg + 1.0)[:, None]
        scaled = []
        for s in scalers:
            if s == "identity":
                scaled.append(h)
            elif s == "amplification":
                scaled.append(h * (log_deg / avg_d_log))
            elif s == "attenuation":
                # zero-degree nodes already have h == 0; guard the division
                scaled.append(jnp.where(has, h * (avg_d_log / jnp.maximum(log_deg, EPS)), 0.0))
            else:
                raise ValueError(f"unknown PNA scaler: {s}")
        h = jnp.concatenate(scaled, axis=-1)
    return h.astype(in_dtype)


def pna_multi_aggregate_always_scaled(
    messages: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    aggregators: Sequence[str],
    scalers: Sequence[str],
    avg_d_log: float = 1.0,
) -> jnp.ndarray:
    """PNAOriginal variant (models/pna_original.py:232-237): scalers are
    applied unconditionally (even a single one); moments are rejected — the
    reference collapses them to scalars (upstream bug)."""
    if any(a.startswith("moment") for a in aggregators):
        raise ValueError("moment aggregators are not supported by PNAOriginal "
                         "(the reference implementation collapses them)")
    h = pna_multi_aggregate(messages, receivers, num_nodes, aggregators,
                            ("identity",), avg_d_log)
    deg = degree(receivers, num_nodes)
    from infomax3d_tpu.parallel.context import edge_partition_axis
    part_ax = edge_partition_axis()
    if part_ax is not None:
        deg = jax.lax.psum(deg, part_ax)
    has = (deg > 0.0)[:, None]
    log_deg = jnp.log(deg + 1.0)[:, None]
    scaled = []
    for s in scalers:
        if s == "identity":
            scaled.append(h)
        elif s == "amplification":
            scaled.append(h * (log_deg / avg_d_log))
        elif s == "attenuation":
            scaled.append(jnp.where(has, h * (avg_d_log /
                                              jnp.maximum(log_deg, EPS)), 0.0))
        else:
            raise ValueError(f"unknown PNA scaler: {s}")
    return jnp.concatenate(scaled, axis=-1)


@jax.custom_vjp
def _regroup(node_feat: jnp.ndarray, idx2d: jnp.ndarray,
             inv_flat: jnp.ndarray) -> jnp.ndarray:
    """Gather node rows into their [G, nmax, D] dense graph slots.  `idx2d`
    [G, nmax] holds node rows (padding -> N); `inv_flat` [N] is the inverse
    map (node -> g*nmax+slot, padding -> G*nmax).  The backward is the
    inverse GATHER — no scatter in either direction."""
    n = node_feat.shape[0]
    out = jnp.take(node_feat, jnp.clip(idx2d, 0, n - 1), axis=0)
    return jnp.where((idx2d < n)[..., None], out, 0.0)


def _regroup_fwd(node_feat, idx2d, inv_flat):
    return _regroup(node_feat, idx2d, inv_flat), inv_flat


def _regroup_bwd(inv_flat, ct):
    G, nm, D = ct.shape
    flat = jnp.concatenate(
        [ct.reshape(G * nm, D), jnp.zeros((1, D), ct.dtype)], axis=0)
    return jnp.take(flat, jnp.clip(inv_flat, 0, G * nm), axis=0), None, None


_regroup.defvjp(_regroup_fwd, _regroup_bwd)


def _graph_readout_dense(node_feat, idx2d, inv_flat, aggregators,
                         sizes=None):
    """Scatter-free readout: regroup nodes to [G, nmax, D], masked reduces.
    Value-identical to the segment path (padding -> 0, empty graphs -> 0)."""
    n = node_feat.shape[0]
    dense = _regroup(node_feat, idx2d, inv_flat)          # [G, nmax, D]
    mask = (idx2d < n)[..., None]                          # [G, nmax, 1]
    if sizes is None:
        sizes = mask.sum(axis=(1, 2))
    sizes_f = sizes.astype(node_feat.dtype)
    has = (sizes_f > 0)[:, None]
    outs: Dict[str, jnp.ndarray] = {}
    if "sum" in aggregators or "mean" in aggregators:
        s = dense.sum(axis=1)
        outs["sum"] = s
        outs["mean"] = jnp.where(has, s / jnp.maximum(sizes_f, 1.0)[:, None],
                                 0.0)
    if "max" in aggregators:
        big = jnp.asarray(jnp.finfo(node_feat.dtype).max, node_feat.dtype)
        outs["max"] = jnp.where(
            has, jnp.where(mask, dense, -big).max(axis=1), 0.0)
    if "min" in aggregators:
        big = jnp.asarray(jnp.finfo(node_feat.dtype).max, node_feat.dtype)
        outs["min"] = jnp.where(
            has, jnp.where(mask, dense, big).min(axis=1), 0.0)
    for a in aggregators:
        if a not in outs:
            raise ValueError(f"unknown readout aggregator: {a}")
    return jnp.concatenate([outs[a] for a in aggregators], axis=-1)


def batch_readout(g, node_feat: jnp.ndarray, aggregators: Sequence[str],
                  sizes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """`graph_readout` over a GraphBatch — picks the scatter-free dense
    regroup automatically when the batch carries the rd_* extras."""
    return graph_readout(node_feat, g.node_graph, g.num_graphs, aggregators,
                         sizes=sizes,
                         dense_idx=g.extras.get("rd_node_idx"),
                         dense_inv=g.extras.get("rd_inv_flat"))


def graph_readout(
    node_feat: jnp.ndarray,        # [N, D]
    node_graph: jnp.ndarray,       # [N] (padding -> out of range)
    num_graphs: int,
    aggregators: Sequence[str],
    sizes: Optional[jnp.ndarray] = None,
    dense_idx: Optional[jnp.ndarray] = None,   # [G, nmax] rd_node_idx
    dense_inv: Optional[jnp.ndarray] = None,   # [N] rd_inv_flat
) -> jnp.ndarray:
    """Graph-level readout: concat of segment reductions over nodes.

    Replaces `dgl.readout_nodes(g, 'feat', op=...)` concatenation
    (`models/pna.py:133-135`, `models/net3d.py:73-75`).  Scatter-minimized:
    min/max share one segment_max; mean reuses sum with precomputed graph
    sizes when given.  When the batch carries ``rd_node_idx``/``rd_inv_flat``
    (BucketSpec.nmax > 0), the readout is fully scatter-free (dense regroup).
    """
    if dense_idx is not None and dense_inv is not None:
        return _graph_readout_dense(node_feat, dense_idx, dense_inv,
                                    aggregators, sizes)
    # node-sharded batches (parallel/node_partition.py `node_shards` mode):
    # each shard reduces its OWNED nodes; psum / gathered-max over the mesh
    # axis completes the per-graph partials before any mean/mask derivation
    from infomax3d_tpu.parallel.context import node_partition_axis
    np_ax = node_partition_axis()
    D = node_feat.shape[-1]
    outs: Dict[str, jnp.ndarray] = {}
    if sizes is None:
        sizes = degree(node_graph, num_graphs)
        if np_ax is not None:
            sizes = jax.lax.psum(sizes, np_ax)
    sizes_f = sizes.astype(node_feat.dtype)
    has = (sizes_f > 0)[:, None]
    if "sum" in aggregators or "mean" in aggregators:
        s = jax.ops.segment_sum(node_feat, node_graph, num_segments=num_graphs)
        if np_ax is not None:
            s = jax.lax.psum(s, np_ax)
        outs["sum"] = s
        outs["mean"] = jnp.where(has, s / jnp.maximum(sizes_f, 1.0)[:, None], 0.0)
    if ("max" in aggregators and "min" in aggregators) or \
            (np_ax is not None and ("max" in aggregators or
                                    "min" in aggregators)):
        cat = ([node_feat] if "max" in aggregators else []) + \
              ([-node_feat] if "min" in aggregators else [])
        both = jax.ops.segment_max(
            jnp.concatenate(cat, axis=-1) if len(cat) > 1 else cat[0],
            node_graph, num_segments=num_graphs)
        if np_ax is not None:
            # differentiable pmax (lax.pmax has no VJP); completes
            # locally-empty-but-globally-populated graphs before masking
            both = jnp.max(jax.lax.all_gather(both, np_ax), axis=0)
        off = 0
        if "max" in aggregators:
            outs["max"] = jnp.where(has, both[:, :D], 0.0)
            off = D
        if "min" in aggregators:
            outs["min"] = jnp.where(has, -both[:, off:off + D], 0.0)
    elif "max" in aggregators:
        outs["max"] = segment_max(node_feat, node_graph, num_graphs)
    elif "min" in aggregators:
        outs["min"] = segment_min(node_feat, node_graph, num_graphs)
    for a in aggregators:
        if a not in outs:
            raise ValueError(f"unknown readout aggregator: {a}")
    return jnp.concatenate([outs[a] for a in aggregators], axis=-1)
