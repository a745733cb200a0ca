"""Mailbox (degree-bucketed dense) aggregation — the scatter-free hot path.

Why: XLA lowers scatter-add on TPU to a row-serialized loop (~0.19 ms per
scatter on a 18k-edge batch regardless of width); a PNA train step issues
~100 of them (aggregators x layers x fwd/bwd) = ~20 ms/step of pure scatter
overhead.  This module removes EVERY scatter from forward AND backward:

* the host batcher precomputes, per node, the ids of its incoming/outgoing
  edges (`in_edges [N, K]` + mask) plus the inverse map `edge_slot [E]`
  (which mailbox slot each edge occupies — edges partition into mailboxes,
  so it's a bijection);
* aggregation = ONE gather into [N, K, D] + masked VPU reductions — exactly
  DGL's mailbox semantics, and all PNA aggregators amortize the same gather;
* `mailbox_gather` carries a custom VJP: the cotangent of a slot-partitioned
  gather is a PERMUTATION, expressed as another gather through `edge_slot` —
  no scatter;
* node-feature gathers (`h[senders]`) get a custom VJP whose backward is a
  mailbox-sum over the node's incident edges — again a gather + reduce.

Everything falls back to `ops.segment` when the batch has no mailbox arrays
(correctness oracle; also used in tests).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infomax3d_tpu.ops.segment import EPS


def build_mailbox(indices: np.ndarray, num_nodes: int, num_edges: int,
                  max_deg: Optional[int] = None):
    """Host-side (vectorized): per-node list of edge ids with
    `indices[e] == node`.

    Returns (edges [N, K] int32 pad=E, mask [N, K] bool, slot [E] int32 where
    slot[e] = n * K + k flat position of edge e, pad edges -> N*K).
    """
    indices = np.asarray(indices)
    valid = (indices >= 0) & (indices < num_nodes)
    e_ids = np.nonzero(valid)[0]
    tgt = indices[e_ids].astype(np.int64)
    order = np.argsort(tgt, kind="stable")
    e_sorted = e_ids[order]
    t_sorted = tgt[order]
    starts = np.searchsorted(t_sorted, np.arange(num_nodes))
    pos = np.arange(len(t_sorted)) - starts[t_sorted]
    deg_max = int(pos.max()) + 1 if len(pos) else 1
    K = int(max_deg or deg_max)
    if deg_max > K:
        raise ValueError(f"degree {deg_max} exceeds mailbox width {K}")
    edges = np.full((num_nodes, K), num_edges, np.int32)
    mask = np.zeros((num_nodes, K), bool)
    slot = np.full(num_edges, num_nodes * K, np.int32)
    edges[t_sorted, pos] = e_sorted
    mask[t_sorted, pos] = True
    slot[e_sorted] = (t_sorted * K + pos).astype(np.int32)
    return edges, mask, slot


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def mailbox_gather(messages, in_edges, edge_slot, num_edges):
    """[E, D] edge messages -> [N, K, D] mailboxes (zero-filled padding)."""
    E = messages.shape[0]
    padded = jnp.concatenate([messages, jnp.zeros((1,) + messages.shape[1:],
                                                  messages.dtype)], axis=0)
    return jnp.take(padded, in_edges.clip(0, E), axis=0)


def _mg_fwd(messages, in_edges, edge_slot, num_edges):
    return mailbox_gather(messages, in_edges, edge_slot, num_edges), \
        (edge_slot, in_edges.shape)


def _mg_bwd(num_edges, res, cot):
    edge_slot, (N, K) = res
    flat = cot.reshape((N * K,) + cot.shape[2:])
    flat = jnp.concatenate([flat, jnp.zeros((1,) + flat.shape[1:],
                                            flat.dtype)], axis=0)
    d_messages = jnp.take(flat, edge_slot.clip(0, N * K), axis=0)
    return d_messages, None, None


mailbox_gather.defvjp(_mg_fwd, _mg_bwd)


@jax.custom_vjp
def gather_nodes(h, idx, in_edges, edge_slot):
    """h[idx] ([E, D]) with a scatter-free backward: the cotangent per node is
    the masked mailbox-sum of the edge cotangents over the node's incident
    edges (`in_edges` built for THIS index array)."""
    N = h.shape[0]
    return jnp.take(h, idx.clip(0, N - 1), axis=0)


def _gn_fwd(h, idx, in_edges, edge_slot):
    return gather_nodes(h, idx, in_edges, edge_slot), \
        (idx, in_edges, edge_slot, h.shape)


def _gn_bwd(res, cot):
    idx, in_edges, edge_slot, h_shape = res
    E = cot.shape[0]
    mb = mailbox_gather(cot, in_edges, edge_slot, E)   # [N, K, D]
    return mb.sum(axis=1), None, None, None


gather_nodes.defvjp(_gn_fwd, _gn_bwd)


def mailbox_sum(messages, in_edges, edge_slot, mask):
    mb = mailbox_gather(messages, in_edges, edge_slot, messages.shape[0])
    return jnp.where(mask[..., None], mb, 0.0).sum(axis=1)


def mailbox_mean(messages, in_edges, edge_slot, mask):
    s = mailbox_sum(messages, in_edges, edge_slot, mask)
    deg = mask.sum(axis=1).astype(messages.dtype)
    return s / jnp.maximum(deg, 1.0)[:, None]


def pna_mailbox_aggregate(
    messages: jnp.ndarray,          # [E, D]
    in_edges: jnp.ndarray,          # [N, K]
    edge_slot: jnp.ndarray,         # [E]
    mask: jnp.ndarray,              # [N, K]
    aggregators: Sequence[str],
    scalers: Sequence[str] = ("identity",),
    avg_d_log: float = 1.0,
) -> jnp.ndarray:
    """All PNA aggregators + degree scalers from ONE mailbox gather —
    value-identical to `ops.segment.pna_multi_aggregate` (same zero-degree and
    >1-scaler-gate semantics)."""
    mb = mailbox_gather(messages, in_edges, edge_slot, messages.shape[0])
    m = mask[..., None]
    mbz = jnp.where(m, mb, 0.0)
    deg = mask.sum(axis=1).astype(messages.dtype)
    deg_safe = jnp.maximum(deg, 1.0)[:, None]
    has = (deg > 0.0)[:, None]

    need_mean = any(a in ("mean", "std", "var", "moment3", "moment4", "moment5")
                    for a in aggregators)
    s1 = mbz.sum(axis=1)
    mean = s1 / deg_safe if need_mean else None

    outs = {}
    big = jnp.asarray(jnp.finfo(messages.dtype).max, messages.dtype)
    for a in aggregators:
        if a == "sum":
            outs[a] = s1
        elif a == "mean":
            outs[a] = jnp.where(has, mean, 0.0)
        elif a == "max":
            outs[a] = jnp.where(has, jnp.where(m, mb, -big).max(axis=1), 0.0)
        elif a == "min":
            outs[a] = jnp.where(has, jnp.where(m, mb, big).min(axis=1), 0.0)
        elif a in ("std", "var"):
            s2 = (mbz * mbz).sum(axis=1)
            var = jax.nn.relu(s2 / deg_safe - mean * mean)
            outs[a] = jnp.where(has, var if a == "var"
                                else jnp.sqrt(var + EPS), 0.0)
        elif a.startswith("moment"):
            n = int(a[len("moment"):])
            centered = jnp.where(m, mb - mean[:, None, :], 0.0)
            mn = (centered ** n).sum(axis=1) / deg_safe
            rooted = jnp.sign(mn) * jnp.power(jnp.abs(mn) + EPS, 1.0 / n)
            outs[a] = jnp.where(has, rooted, 0.0)
        else:
            raise ValueError(f"unknown PNA aggregator: {a}")
    h = jnp.concatenate([outs[a] for a in aggregators], axis=-1)

    if len(scalers) > 1:
        log_deg = jnp.log(deg + 1.0)[:, None]
        scaled = []
        for s in scalers:
            if s == "identity":
                scaled.append(h)
            elif s == "amplification":
                scaled.append(h * (log_deg / avg_d_log))
            elif s == "attenuation":
                scaled.append(jnp.where(has, h * (avg_d_log /
                                                  jnp.maximum(log_deg, EPS)),
                                        0.0))
            else:
                raise ValueError(f"unknown PNA scaler: {s}")
        h = jnp.concatenate(scaled, axis=-1)
    return h


# ---------------------------------------------------------------------------
# GraphBatch-level dispatch: mailbox when available, segment ops otherwise
# ---------------------------------------------------------------------------

def has_mailbox(g) -> bool:
    return g.extras.get("mb_in_edges") is not None


def has_csr(g) -> bool:
    return g.extras.get("csr_row_ptr") is not None


_PALLAS_AGGS = frozenset(("sum", "mean", "max", "min", "std", "var"))


def _pallas_interpret() -> bool:
    import jax
    return jax.default_backend() == "cpu"


def edge_aggregate(g, messages, op: str):
    """Edge -> receiver-node reduction for a GraphBatch: Pallas fused kernel
    (csr buckets) > dense mailbox > XLA segment ops."""
    if has_csr(g):
        from infomax3d_tpu.ops.pallas.spmm import csr_mean, csr_sum
        K = g.extras["mb_in_edges"].shape[1]
        fn = csr_sum if op == "sum" else csr_mean
        return fn(messages, g.extras["csr_row_ptr"], g.receivers, K,
                  interpret=_pallas_interpret())
    if has_mailbox(g):
        fn = mailbox_sum if op == "sum" else mailbox_mean
        return fn(messages, g.extras["mb_in_edges"], g.extras["mb_edge_slot"],
                  g.extras["mb_in_mask"])
    from infomax3d_tpu.ops.segment import segment_sum
    from infomax3d_tpu.parallel.context import edge_partition_axis
    part_ax = edge_partition_axis()
    s = segment_sum(messages, g.receivers, g.num_nodes)
    if part_ax is not None:
        # edge-partitioned batch (parallel/edge_partition.py): complete the
        # local partial over the graph mesh axis
        s = jax.lax.psum(s, part_ax)
    if op == "sum":
        return s
    deg = g.extras.get("in_degree")   # batcher-precomputed = global degree
    if deg is None:
        from infomax3d_tpu.ops.segment import degree
        deg = degree(g.receivers, g.num_nodes)
        if part_ax is not None:
            deg = jax.lax.psum(deg, part_ax)
    return s / jnp.maximum(deg, 1.0)[:, None]


def pna_aggregate_parts(g, messages, aggregators, scalers, avg_d_log=1.0):
    """`pna_aggregate` for a SplitDense consumer: on the Pallas CSR path the
    aggregator/scaler blocks come back as lazy parts (no [N, A*S*D] concat or
    scaled copies hit HBM); other paths return the single concatenated
    tensor as a one-element list.

    `messages` may be a lazy AffinePart (the pretrans MLP's last BN): the
    CSR path folds it into the stats kernel; other paths materialize."""
    from infomax3d_tpu.models.base import AffinePart
    if has_csr(g) and set(aggregators) <= _PALLAS_AGGS:
        from infomax3d_tpu.ops.pallas.spmm import pna_csr_aggregate_parts
        K = g.extras["mb_in_edges"].shape[1]
        tw = g.extras.get("csr_tile_win")
        bs = g.extras.get("csr_bwd_span")
        return pna_csr_aggregate_parts(
            messages, g.extras["csr_row_ptr"], g.receivers, K, aggregators,
            scalers, avg_d_log, interpret=_pallas_interpret(),
            tile_win=0 if tw is None else tw.shape[0],
            bwd_span=0 if bs is None else bs.shape[0],
            pos=g.extras.get("csr_pos"))
    if isinstance(messages, AffinePart):
        import jax.numpy as _jnp
        messages = (messages.x.astype(_jnp.float32) * messages.scale
                    + messages.shift).astype(messages.x.dtype)
    return [pna_aggregate(g, messages, aggregators, scalers, avg_d_log)]


def pna_aggregate(g, messages, aggregators, scalers, avg_d_log=1.0):
    if has_csr(g) and set(aggregators) <= _PALLAS_AGGS:
        from infomax3d_tpu.ops.pallas.spmm import pna_csr_aggregate
        K = g.extras["mb_in_edges"].shape[1]
        tw = g.extras.get("csr_tile_win")
        bs = g.extras.get("csr_bwd_span")
        return pna_csr_aggregate(messages, g.extras["csr_row_ptr"],
                                 g.receivers, K, aggregators, scalers,
                                 avg_d_log, interpret=_pallas_interpret(),
                                 tile_win=0 if tw is None else tw.shape[0],
                                 bwd_span=0 if bs is None else bs.shape[0],
                                 pos=g.extras.get("csr_pos"))
    if has_mailbox(g):
        return pna_mailbox_aggregate(
            messages, g.extras["mb_in_edges"], g.extras["mb_edge_slot"],
            g.extras["mb_in_mask"], aggregators, scalers, avg_d_log)
    from infomax3d_tpu.ops.segment import pna_multi_aggregate
    return pna_multi_aggregate(messages, g.receivers, g.num_nodes,
                               aggregators, scalers, avg_d_log,
                               deg=g.extras.get("in_degree"))


def _node_partition_ext(g, h):
    """Under the node-sharded training mode (parallel/node_partition.py,
    `node_shards` config key): halo-exchange the owned node rows into the
    extended ``[owned ‖ ghost]`` table the batch's LOCAL sender indices
    address.  Returns None when the batch is not node-partitioned."""
    from infomax3d_tpu.parallel.context import node_partition_axis
    ax = node_partition_axis()
    if ax is None or "np_send_0" not in g.extras:
        return None
    from infomax3d_tpu.parallel.node_partition import halo_exchange
    rounds = []
    while f"np_send_{len(rounds)}" in g.extras:
        rounds.append(g.extras[f"np_send_{len(rounds)}"])
    return halo_exchange(h, rounds, ax, len(rounds) + 1)


def gather_parts(g, h):
    """(src_part, dst_part) lazy GatherParts for a SplitDense message MLP —
    node-space projection + scatter-free kernel backwards, and (together
    with a plain edge part) the fused Pallas edge-combine forward
    (models/base.py::SplitDense._try_edge_combine).  Callers on csr batches
    should prefer this over (h, idx) tuples."""
    ext = _node_partition_ext(g, h)
    if ext is not None:
        # node-sharded batch: project the extended table in node space then
        # gather by the LOCAL indices — ghost cotangents flow back through
        # halo_exchange's ppermute transpose
        from infomax3d_tpu.models.base import GatherPart
        return GatherPart(ext, g.senders), GatherPart(h, g.receivers)
    from infomax3d_tpu.models.base import GatherPart
    rp = g.extras.get("csr_row_ptr") if has_csr(g) else None
    mb = g.extras.get("mb_in_edges")
    K = mb.shape[1] if (mb is not None and has_csr(g)) else 0
    tw = g.extras.get("csr_tile_win")
    cw = g.extras.get("csc_tile_win")
    cs = g.extras.get("csr_cmb_span")
    cspan = 0 if cs is None else cs.shape[0]
    sw = g.extras.get("csr_pair_win")
    src = GatherPart(h, g.senders, row_ptr=g.extras.get("csc_row_ptr"),
                     perm=g.extras.get("csc_perm"), max_deg=K,
                     tile_win=0 if cw is None else cw.shape[0],
                     cmb_span=cspan,
                     snd_base=g.extras.get("csr_pair_base"),
                     snd_win=0 if sw is None else sw.shape[0])
    dst = GatherPart(h, g.receivers, indices_sorted=has_csr(g), row_ptr=rp,
                     max_deg=K, tile_win=0 if tw is None else tw.shape[0],
                     cmb_span=cspan)
    return src, dst


def gather_src(g, h):
    """h[senders]; under dense-mailbox batches the backward is a mailbox-sum
    (no scatter).  csr batches route the backward through the scatter-free
    sorted prefix sum (ops/segment.py::take_rows with the CSC edge order);
    plain batches use take (XLA fused scatter-add backward); node-sharded
    batches halo-exchange ghosts first (parallel/node_partition.py)."""
    ext = _node_partition_ext(g, h)
    if ext is not None:
        return jnp.take(ext, g.senders.clip(0, ext.shape[0] - 1), axis=0)
    if has_mailbox(g) and not has_csr(g):
        return gather_nodes(h, g.senders, g.extras["mb_out_edges"],
                            g.extras["mb_out_slot"])
    if has_csr(g):
        from infomax3d_tpu.ops.segment import take_rows
        cw = g.extras.get("csc_tile_win")
        sw = g.extras.get("csr_pair_win")
        return take_rows(h, g.senders, False,
                         g.extras["csc_row_ptr"], g.extras["csc_perm"],
                         g.extras["mb_in_edges"].shape[1],
                         0 if cw is None else cw.shape[0],
                         g.extras.get("csr_pair_base"),
                         0 if sw is None else sw.shape[0])
    return jnp.take(h, g.senders.clip(0, g.num_nodes - 1), axis=0)


def gather_dst(g, h):
    if has_mailbox(g) and not has_csr(g):
        return gather_nodes(h, g.receivers, g.extras["mb_in_edges"],
                            g.extras["mb_edge_slot"])
    if has_csr(g):
        # receiver-sorted edges: backward = Pallas incidence seg-sum (bf16)
        # or sorted_segment_sum (the MXU triangular prefix sum), no scatter
        from infomax3d_tpu.ops.segment import take_rows
        tw = g.extras.get("csr_tile_win")
        return take_rows(h, g.receivers, True, g.extras["csr_row_ptr"],
                         None, g.extras["mb_in_edges"].shape[1],
                         0 if tw is None else tw.shape[0])
    return jnp.take(h, g.receivers.clip(0, g.num_nodes - 1), axis=0)
