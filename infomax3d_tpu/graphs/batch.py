"""Static-shape batched molecular graphs for XLA.

This is the keystone data structure of the framework: the TPU-native
replacement for DGL's `dgl.batch` + the ~25 collate functions of the reference
(`datasets/custom_collate.py`) and its size-bucketing samplers
(`datasets/samplers.py:12-139`).

Design
------
A batch of molecules is ONE flat padded graph with static shapes so that every
step compiles once per bucket:

  node_feat   [N, Dn]   node features (int codes for embedding or float)
  edge_feat   [E, De]   edge features (optional)
  senders     [E]       edge source node index; padding edges -> N (out of range)
  receivers   [E]       edge destination node index; padding edges -> N
  node_graph  [N]       node -> graph segment id; padding nodes -> G
  coords      [N, 3]    3D coordinates (optional)
  node_mask   [N]       True for real nodes
  edge_mask   [E]       True for real edges
  graph_mask  [G]       True for real graphs
  n_nodes     [G]       real node count per graph (0 for padding graphs)

Out-of-range padding indices are intentional: `jax.ops.segment_sum` (XLA
scatter in drop mode) silently drops them, so padding edges/nodes never touch
real segments and no dummy graph slot is consumed.  Gathers clip
(`jnp.take(..., mode="clip")`) and mask afterwards.

All shapes (N, E, G) come from a `BucketSpec`; the host batcher pads up to the
bucket.  A small ladder of buckets bounds XLA recompiles (reference keeps
shapes dynamic and re-kernels every batch; we trade ~15-30% padding FLOPs for
one compile).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphBatch:
    """A statically-shaped batch of graphs (pytree).

    Replaces the batched ``dgl.DGLGraph`` of the reference
    (`datasets/custom_collate.py:12-18`).
    """

    node_feat: jnp.ndarray            # [N, Dn]
    senders: jnp.ndarray              # [E] int32 (pad -> N)
    receivers: jnp.ndarray            # [E] int32 (pad -> N)
    node_graph: jnp.ndarray           # [N] int32 (pad -> G)
    node_mask: jnp.ndarray            # [N] bool
    edge_mask: jnp.ndarray            # [E] bool
    graph_mask: jnp.ndarray           # [G] bool
    n_nodes: jnp.ndarray              # [G] int32
    edge_feat: Optional[jnp.ndarray] = None   # [E, De]
    coords: Optional[jnp.ndarray] = None      # [N, 3]
    edge_dist: Optional[jnp.ndarray] = None   # [E] distances for 3D complete graphs
    edge_graph: Optional[jnp.ndarray] = None  # [E] int32 edge -> graph (pad -> G)
    node_pos: Optional[jnp.ndarray] = None    # [N] int32 position within graph
    snorm: Optional[jnp.ndarray] = None       # [N, 1] 1/sqrt(n) per node (s_norm collates)
    lap_pe: Optional[jnp.ndarray] = None      # [N, k] Laplacian positional encoding
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_real_edges(self) -> jnp.ndarray:
        return self.edge_mask.sum()


@struct.dataclass
class BucketSpec:
    """Static shape of a batch: (graphs, nodes, edges). Hashable/static."""

    n_graphs: int = struct.field(pytree_node=False)
    n_nodes: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    # mailbox width (max in-degree); 0 disables the scatter-free mailbox
    # aggregation path (ops/mailbox.py)
    max_deg: int = struct.field(pytree_node=False, default=0)
    # sort edges by receiver and emit CSR row pointers — enables the Pallas
    # fused segmented-aggregation kernel (ops/pallas/spmm.py); requires
    # max_deg > 0 (the kernel's window bound)
    csr: bool = struct.field(pytree_node=False, default=False)
    # max nodes of any single graph; > 0 emits rd_node_idx/rd_inv_flat so
    # graph readouts run as gather + masked dense reduce (both directions
    # scatter-free) instead of TPU's row-serialized segment scatters
    nmax: int = struct.field(pytree_node=False, default=0)

    def __repr__(self):
        return (f"BucketSpec(G={self.n_graphs}, N={self.n_nodes}, "
                f"E={self.n_edges}, K={self.max_deg})")


def complete_graph_edges(n: int, self_loops: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """All directed (i, j) pairs for one molecule — the 3D complete graph of the
    reference (`datasets/qm9_dataset.py:233-244`)."""
    idx = np.arange(n)
    src = np.repeat(idx, n)
    dst = np.tile(idx, n)
    if not self_loops:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    return src.astype(np.int32), dst.astype(np.int32)


def batch_graphs(
    graphs: Sequence[Dict[str, np.ndarray]],
    bucket: BucketSpec,
    extras_keys: Sequence[str] = (),
) -> Dict[str, np.ndarray]:
    """Concatenate per-molecule numpy graph dicts into one padded flat batch.

    Each input dict carries: ``node_feat [n, Dn]``, ``senders [e]``,
    ``receivers [e]`` and optionally ``edge_feat``, ``coords``, ``edge_dist``,
    ``lap_pe`` and extra per-graph arrays (targets, ...).

    Returns plain numpy arrays (host side) matching the `GraphBatch` fields;
    wrap with :func:`to_graph_batch` / device_put to use in jit.
    """
    G, N, E = bucket.n_graphs, bucket.n_nodes, bucket.n_edges
    g_real = len(graphs)
    if g_real == 0:
        raise ValueError("batch_graphs needs at least one graph")
    if g_real > G:
        raise ValueError(f"{g_real} graphs > bucket {G}")

    # native C collate core (infomax3d_tpu/native/batcher.c): one O(N+E)
    # pass for every index-shaped array below; value-identical to this
    # numpy path (tests/test_native_batcher.py) and ~10x faster per batch.
    # INFOMAX3D_NO_NATIVE=1 opts out; capacity errors still raise here.
    import os as _os
    if not _os.environ.get("INFOMAX3D_NO_NATIVE"):
        from infomax3d_tpu.native.batcher import pack_batch_native
        native = pack_batch_native(graphs, bucket, extras_keys)
        if native is not None:
            return native

    n_per = np.array([g["node_feat"].shape[0] for g in graphs], dtype=np.int32)
    e_per = np.array([g["senders"].shape[0] for g in graphs], dtype=np.int32)
    n_tot, e_tot = int(n_per.sum()), int(e_per.sum())
    if n_tot > N or e_tot > E:
        raise ValueError(f"batch needs ({n_tot} nodes, {e_tot} edges) > bucket ({N}, {E})")

    node_off = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int32)

    first = graphs[0]
    nf = first["node_feat"]
    node_feat = np.zeros((N,) + nf.shape[1:], dtype=nf.dtype)
    node_feat[:n_tot] = np.concatenate([g["node_feat"] for g in graphs], axis=0)

    senders = np.full(E, N, dtype=np.int32)
    receivers = np.full(E, N, dtype=np.int32)
    if e_tot:
        senders[:e_tot] = np.concatenate(
            [g["senders"].astype(np.int32) + node_off[i] for i, g in enumerate(graphs)])
        receivers[:e_tot] = np.concatenate(
            [g["receivers"].astype(np.int32) + node_off[i] for i, g in enumerate(graphs)])

    node_graph = np.full(N, G, dtype=np.int32)
    node_graph[:n_tot] = np.repeat(np.arange(g_real, dtype=np.int32), n_per)
    node_pos = np.zeros(N, dtype=np.int32)
    node_pos[:n_tot] = np.concatenate(
        [np.arange(n, dtype=np.int32) for n in n_per])
    edge_graph = np.full(E, G, dtype=np.int32)
    if e_tot:
        edge_graph[:e_tot] = np.repeat(np.arange(g_real, dtype=np.int32), e_per)

    node_mask = np.zeros(N, dtype=bool)
    node_mask[:n_tot] = True
    edge_mask = np.zeros(E, dtype=bool)
    edge_mask[:e_tot] = True
    graph_mask = np.zeros(G, dtype=bool)
    graph_mask[:g_real] = True
    n_nodes = np.zeros(G, dtype=np.int32)
    n_nodes[:g_real] = n_per

    out: Dict[str, np.ndarray] = dict(
        node_feat=node_feat, senders=senders, receivers=receivers,
        node_graph=node_graph, edge_graph=edge_graph, node_pos=node_pos,
        node_mask=node_mask, edge_mask=edge_mask, graph_mask=graph_mask,
        n_nodes=n_nodes,
    )

    def _pad_node_field(key):
        if key in first and first[key] is not None:
            arr0 = first[key]
            buf = np.zeros((N,) + arr0.shape[1:], dtype=arr0.dtype)
            buf[:n_tot] = np.concatenate([g[key] for g in graphs], axis=0)
            out[key] = buf

    def _pad_edge_field(key):
        if key in first and first[key] is not None:
            arr0 = first[key]
            buf = np.zeros((E,) + arr0.shape[1:], dtype=arr0.dtype)
            if e_tot:
                buf[:e_tot] = np.concatenate([g[key] for g in graphs], axis=0)
            out[key] = buf

    _pad_edge_field("edge_feat")
    _pad_edge_field("edge_dist")
    _pad_node_field("coords")
    _pad_node_field("lap_pe")

    if bucket.csr:
        if bucket.max_deg <= 0:
            raise ValueError("csr buckets need max_deg > 0")
        # receiver-sorted edge order (stable; padding receivers == N sort last)
        order = np.argsort(receivers, kind="stable")
        for key in ("senders", "receivers", "edge_mask", "edge_graph",
                    "edge_feat", "edge_dist"):
            if key in out and out[key] is not None:
                out[key] = out[key][order]
        senders = out["senders"]
        receivers = out["receivers"]
        out["_edge_perm"] = order.astype(np.int32)   # original -> sorted pos
        row_ptr = np.zeros(N + 1, np.int32)
        np.cumsum(np.bincount(receivers.clip(0, N), minlength=N + 1)[:N],
                  out=row_ptr[1:])
        out["csr_row_ptr"] = row_ptr
        # CSC side: edge order sorted by SENDER (padding senders == N sort
        # last), for scatter-free sender-gather backwards — d_nodes =
        # sorted_segment_sum(ct[csc_perm], csc_row_ptr)
        csc = np.argsort(senders, kind="stable").astype(np.int32)
        out["csc_perm"] = csc
        csc_ptr = np.zeros(N + 1, np.int32)
        np.cumsum(np.bincount(senders.clip(0, N), minlength=N + 1)[:N],
                  out=csc_ptr[1:])
        out["csc_row_ptr"] = csc_ptr
        # compacted kernel window: the Pallas stats kernel's per-pass MXU
        # cost scales with its edge-window width, and the worst-case bound
        # TN*max_deg is ~3x wider than any real molecular tile (avg degree
        # ~2, max 4).  Measure the ACTUAL max edges under any TN-node tile
        # and publish it (rounded up to 128 lanes, +8 DMA-alignment slack)
        # as the shape of a tiny marker array — static to XLA, recompiles
        # only when the bucket's density class changes.
        from infomax3d_tpu.ops.pallas.spmm import CSR_TILE_N
        tile_starts = np.arange(0, N, CSR_TILE_N)
        tile_edges = (row_ptr[np.minimum(tile_starts + CSR_TILE_N, N)]
                      - row_ptr[tile_starts])
        win = max(128, int(np.ceil((int(tile_edges.max()) + 8) / 128)) * 128)
        out["csr_tile_win"] = np.zeros(win, np.int8)
        # same measurement over the CSC (sender-sorted) order — sizes the
        # Pallas seg-sum backward window of the SENDER gathers
        csc_tile_edges = (csc_ptr[np.minimum(tile_starts + CSR_TILE_N, N)]
                          - csc_ptr[tile_starts])
        cwin = max(128,
                   int(np.ceil((int(csc_tile_edges.max()) + 8) / 128)) * 128)
        out["csc_tile_win"] = np.zeros(cwin, np.int8)
        # backward-kernel node window: max receiver span under any TILE_E
        # consecutive REAL edges (receivers ascend; padding sorts last)
        from infomax3d_tpu.ops.pallas.spmm import CSR_TILE_E
        e_real = int(row_ptr[-1])
        spans = [1]
        for st in range(0, e_real, CSR_TILE_E):
            en = min(st + CSR_TILE_E, e_real)
            spans.append(int(receivers[en - 1]) - int(receivers[st]) + 1)
        bspan = max(128, int(np.ceil((max(spans) + 16) / 128)) * 128)
        out["csr_bwd_span"] = np.zeros(bspan, np.int8)
        # per-edge slot within its receiver's CSR range (the stats-backward
        # kernel's extremum-routing operand).  Host-precomputed: the in-jit
        # equivalent take(row_ptr, receivers) is a 1D XLA gather that
        # measured 131 us/step on v5e.  -1 on padding edges (matches no
        # argmax/argmin slot).
        pos = (np.arange(receivers.shape[0], dtype=np.int32)
               - row_ptr[np.minimum(receivers, N)])
        out["csr_pos"] = np.where(receivers < N, pos, -1).astype(np.int16)
        # node-tile csr PAIR windows: molecules are contiguous in csr
        # order, so all edges SENT OR RECEIVED by a CSR_TILE_N-node tile
        # live in one bounded csr index range — the sender-keyed /
        # pair seg-sum backwards (ops/pallas/spmm.py::
        # snd_segment_sum_bf16 / pair_segment_sum_bf16) window on these
        # instead of gathering ct through csc_perm
        ntt = (N + CSR_TILE_N - 1) // CSR_TILE_N
        stile = np.minimum(senders, N) // CSR_TILE_N
        slo = np.full(ntt + 1, np.iinfo(np.int64).max, np.int64)
        shi = np.full(ntt + 1, -1, np.int64)
        sval = senders < N
        eidx = np.arange(senders.shape[0], dtype=np.int64)
        np.minimum.at(slo, stile[sval], eidx[sval])
        np.maximum.at(shi, stile[sval], eidx[sval])
        tns = np.arange(ntt) * CSR_TILE_N
        lo_in = row_ptr[tns].astype(np.int64)
        hi_in = row_ptr[np.minimum(tns + CSR_TILE_N, N)].astype(np.int64) - 1
        plo = np.minimum(np.where(shi[:ntt] >= 0, slo[:ntt], lo_in), lo_in)
        phi = np.maximum(shi[:ntt], hi_in)
        pspan = np.maximum(phi - plo + 1, 1)
        pwin = max(128, int(np.ceil((int(pspan.max()) + 8) / 128)) * 128)
        out["csr_pair_base"] = plo.astype(np.int32)
        out["csr_pair_win"] = np.zeros(pwin, np.int8)
        # combine-kernel node window: max span of touched nodes (receivers
        # AND senders) under any TILE_E consecutive real edges — sizes the
        # fused edge-combine kernel's packed window (ops/pallas/spmm.py::
        # csr_edge_combine)
        cspans = [1]
        for st in range(0, e_real, CSR_TILE_E):
            en = min(st + CSR_TILE_E, e_real)
            touched_lo = min(int(receivers[st:en].min()),
                             int(senders[st:en].min()))
            touched_hi = max(int(receivers[st:en].max()),
                             int(senders[st:en].max()))
            cspans.append(touched_hi - touched_lo + 1)
        cspan = max(128, int(np.ceil((max(cspans) + 16) / 128)) * 128)
        out["csr_cmb_span"] = np.zeros(cspan, np.int8)

    if bucket.max_deg > 0:
        from infomax3d_tpu.ops.mailbox import build_mailbox
        in_e, in_m, in_s = build_mailbox(receivers, N, E, bucket.max_deg)
        out_e, out_m, out_s = build_mailbox(senders, N, E, bucket.max_deg)
        out.update(mb_in_edges=in_e, mb_in_mask=in_m, mb_edge_slot=in_s,
                   mb_out_edges=out_e, mb_out_mask=out_m, mb_out_slot=out_s)

    out["in_degree"] = np.bincount(receivers.clip(0, N),
                                   minlength=N + 1)[:N].astype(np.float32)

    # snorm_n = 1/sqrt(n) per node (reference s_norm collates, custom_collate.py:43-49)
    snorm = np.zeros((N, 1), dtype=np.float32)
    snorm[:n_tot, 0] = np.repeat(1.0 / np.sqrt(n_per.astype(np.float32)), n_per)
    out["snorm"] = snorm

    if bucket.nmax > 0:
        # dense readout regrouping: node row -> (graph, slot).  Forward
        # readout gathers nodes into [G, nmax, D] and masked-reduces; the
        # regroup backward is the inverse gather — no scatters either way
        # (ops/segment.py::graph_readout dense path).
        nm = int(bucket.nmax)
        if len(n_per) and int(n_per.max()) > nm:
            raise ValueError(
                f"bucket.nmax={nm} < largest graph ({int(n_per.max())} nodes)")
        idx2 = np.full((G, nm), N, np.int32)          # pad -> node row N
        inv = np.full(N, G * nm, np.int32)            # pad -> zero ct row
        ptr = 0
        for gi, np_i in enumerate(n_per):
            np_i = int(np_i)
            idx2[gi, :np_i] = np.arange(ptr, ptr + np_i, dtype=np.int32)
            inv[ptr:ptr + np_i] = gi * nm + np.arange(np_i, dtype=np.int32)
            ptr += np_i
        out["rd_node_idx"] = idx2
        out["rd_inv_flat"] = inv

    for key in extras_keys:
        vals = [np.asarray(g[key]) for g in graphs]
        v0 = vals[0]
        buf = np.zeros((G,) + v0.shape, dtype=v0.dtype)
        buf[:g_real] = np.stack(vals, axis=0)
        out[key] = buf
    return out


def to_graph_batch(arrays: Dict[str, np.ndarray], extras_keys: Sequence[str] = ()) -> GraphBatch:
    """Wrap host arrays from :func:`batch_graphs` into a `GraphBatch` pytree."""
    extras = {k: jnp.asarray(arrays[k]) for k in extras_keys if k in arrays}
    for k in ("mb_in_edges", "mb_in_mask", "mb_edge_slot", "mb_out_edges",
              "mb_out_mask", "mb_out_slot", "csr_row_ptr", "csr_tile_win", "csr_bwd_span",
              "csc_perm", "csc_row_ptr", "csc_tile_win", "csr_cmb_span", "csr_pos",
              "csr_pair_base", "csr_pair_win",
              "rd_node_idx", "rd_inv_flat",
              "in_degree"):
        if k in arrays:
            extras[k] = jnp.asarray(arrays[k])
    return GraphBatch(
        node_feat=jnp.asarray(arrays["node_feat"]),
        senders=jnp.asarray(arrays["senders"]),
        receivers=jnp.asarray(arrays["receivers"]),
        node_graph=jnp.asarray(arrays["node_graph"]),
        edge_graph=jnp.asarray(arrays["edge_graph"]),
        node_pos=jnp.asarray(arrays["node_pos"]) if "node_pos" in arrays else None,
        node_mask=jnp.asarray(arrays["node_mask"]),
        edge_mask=jnp.asarray(arrays["edge_mask"]),
        graph_mask=jnp.asarray(arrays["graph_mask"]),
        n_nodes=jnp.asarray(arrays["n_nodes"]),
        edge_feat=jnp.asarray(arrays["edge_feat"]) if "edge_feat" in arrays else None,
        coords=jnp.asarray(arrays["coords"]) if "coords" in arrays else None,
        edge_dist=jnp.asarray(arrays["edge_dist"]) if "edge_dist" in arrays else None,
        snorm=jnp.asarray(arrays["snorm"]) if "snorm" in arrays else None,
        lap_pe=jnp.asarray(arrays["lap_pe"]) if "lap_pe" in arrays else None,
        extras=extras,
    )


def make_bucket_ladder(
    batch_size: int,
    node_counts: Sequence[int],
    edge_counts: Sequence[int],
    n_buckets: int = 3,
    node_align: int = 128,
    edge_align: int = 512,
    headroom: float = 1.08,
    nmax: int = 0,
) -> List[BucketSpec]:
    """Derive a small ladder of static shapes from dataset histograms.

    The reference's `ConstantNumberAtoms*` samplers (`datasets/samplers.py`)
    cluster molecules by size; here we instead fix a few (N, E) capacities for
    a given batch size — a batch is assigned the smallest bucket that fits.
    """
    node_counts = np.asarray(node_counts)
    edge_counts = np.asarray(edge_counts)
    qs = np.linspace(0.6, 1.0, n_buckets)
    ladder = []
    for q in qs:
        # expected totals for a batch drawn at this quantile of "fatness"
        n_cap = float(np.quantile(node_counts, q)) * batch_size * headroom
        e_cap = float(np.quantile(edge_counts, q)) * batch_size * headroom
        n_cap = int(math.ceil(n_cap / node_align) * node_align)
        e_cap = int(math.ceil(e_cap / edge_align) * edge_align)
        ladder.append(BucketSpec(n_graphs=batch_size, n_nodes=n_cap,
                                 n_edges=e_cap, nmax=nmax))
    # dedupe while keeping order
    seen, uniq = set(), []
    for b in ladder:
        key = (b.n_graphs, b.n_nodes, b.n_edges)
        if key not in seen:
            seen.add(key)
            uniq.append(b)
    return uniq


def pick_bucket(ladder: Sequence[BucketSpec], n_tot: int, e_tot: int) -> BucketSpec:
    """Smallest bucket that fits the batch; falls back to the largest."""
    for b in ladder:
        if n_tot <= b.n_nodes and e_tot <= b.n_edges:
            return b
    return ladder[-1]
