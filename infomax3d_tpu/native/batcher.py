"""ctypes wrapper: native pack_topology -> the batch_graphs output dict.

Feature payloads (node_feat / edge_feat / coords / lap_pe / edge_dist) are
concatenated and reordered with numpy (already C-speed vectorized ops); the
C core produces every INDEX-shaped array — relabeled endpoints, CSR/CSC
sorts, masks, degrees, snorm, readout regroup, mailboxes — in one pass.
"""
from __future__ import annotations

import ctypes
from typing import Dict, Optional, Sequence

import numpy as np

from infomax3d_tpu.native import load


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def pack_batch_native(graphs: Sequence[Dict[str, np.ndarray]], bucket,
                      extras_keys: Sequence[str] = ()) -> Optional[Dict]:
    """batch_graphs via the C core; None when the library is unavailable
    (caller falls back to the numpy path)."""
    lib = load()
    if lib is None:
        return None
    G, N, E = bucket.n_graphs, bucket.n_nodes, bucket.n_edges
    g_real = len(graphs)
    if g_real == 0 or g_real > G:
        return None                           # let the numpy path raise
    n_per = np.array([g["node_feat"].shape[0] for g in graphs], np.int32)
    e_per = np.array([g["senders"].shape[0] for g in graphs], np.int32)
    n_tot, e_tot = int(n_per.sum()), int(e_per.sum())
    if n_tot > N or e_tot > E:
        return None
    K = int(bucket.max_deg)
    nmax = int(bucket.nmax)
    do_csr = 1 if bucket.csr else 0
    if do_csr and K <= 0:
        return None

    src_cat = np.ascontiguousarray(
        np.concatenate([g["senders"] for g in graphs]) if e_tot
        else np.empty(0), dtype=np.int32)
    dst_cat = np.ascontiguousarray(
        np.concatenate([g["receivers"] for g in graphs]) if e_tot
        else np.empty(0), dtype=np.int32)

    i32, u8, f32 = np.int32, np.uint8, np.float32
    senders = np.empty(E, i32)
    receivers = np.empty(E, i32)
    edge_perm = np.empty(E, i32)
    node_graph = np.empty(N, i32)
    node_pos = np.empty(N, i32)
    edge_graph = np.empty(E, i32)
    node_mask = np.empty(N, u8)
    edge_mask = np.empty(E, u8)
    n_nodes = np.empty(G, i32)
    graph_mask = np.empty(G, u8)
    snorm = np.empty(N, f32)
    in_degree = np.empty(N, f32)
    csr_row_ptr = np.zeros(N + 1, i32)
    csc_perm = np.empty(E, i32)
    csc_row_ptr = np.zeros(N + 1, i32)
    rd_node_idx = np.empty(max(G * nmax, 1), i32)
    rd_inv = np.empty(N, i32)
    KK = max(K, 1)
    mb_in_edges = np.empty(N * KK if K > 0 else 1, i32)
    mb_in_mask = np.empty(N * KK if K > 0 else 1, u8)
    mb_in_slot = np.empty(E if K > 0 else 1, i32)
    mb_out_edges = np.empty(N * KK if K > 0 else 1, i32)
    mb_out_mask = np.empty(N * KK if K > 0 else 1, u8)
    mb_out_slot = np.empty(E if K > 0 else 1, i32)
    scratch = np.empty(E + N + 2, i32)

    ci = ctypes.c_int32
    rc = lib.pack_topology(
        _ptr(src_cat, ci), _ptr(dst_cat, ci), _ptr(n_per, ci),
        _ptr(e_per, ci),
        ci(g_real), ci(G), ci(N), ci(E), ci(n_tot), ci(e_tot),
        ci(K), ci(nmax), ci(do_csr),
        _ptr(senders, ci), _ptr(receivers, ci), _ptr(edge_perm, ci),
        _ptr(node_graph, ci), _ptr(node_pos, ci), _ptr(edge_graph, ci),
        _ptr(node_mask, ctypes.c_uint8), _ptr(edge_mask, ctypes.c_uint8),
        _ptr(n_nodes, ci), _ptr(graph_mask, ctypes.c_uint8),
        _ptr(snorm, ctypes.c_float), _ptr(in_degree, ctypes.c_float),
        _ptr(csr_row_ptr, ci), _ptr(csc_perm, ci), _ptr(csc_row_ptr, ci),
        _ptr(rd_node_idx, ci), _ptr(rd_inv, ci),
        _ptr(mb_in_edges, ci), _ptr(mb_in_mask, ctypes.c_uint8),
        _ptr(mb_in_slot, ci),
        _ptr(mb_out_edges, ci), _ptr(mb_out_mask, ctypes.c_uint8),
        _ptr(mb_out_slot, ci),
        _ptr(scratch, ci))
    if rc == 1:
        raise ValueError(f"degree exceeds mailbox width {K}")
    if rc == 2:
        raise ValueError(f"bucket.nmax={nmax} < largest graph "
                         f"({int(n_per.max())} nodes)")
    if rc != 0:
        return None

    first = graphs[0]
    nf = first["node_feat"]
    node_feat = np.zeros((N,) + nf.shape[1:], dtype=nf.dtype)
    node_feat[:n_tot] = np.concatenate([g["node_feat"] for g in graphs])

    out: Dict[str, np.ndarray] = dict(
        node_feat=node_feat, senders=senders, receivers=receivers,
        node_graph=node_graph, edge_graph=edge_graph, node_pos=node_pos,
        node_mask=node_mask.view(bool), edge_mask=edge_mask.view(bool),
        graph_mask=graph_mask.view(bool), n_nodes=n_nodes,
        in_degree=in_degree, snorm=snorm[:, None],
    )

    def _edge_field(key):
        if key in first and first[key] is not None:
            arr0 = np.asarray(first[key])
            buf = np.zeros((E,) + arr0.shape[1:], dtype=arr0.dtype)
            if e_tot:
                buf[:e_tot] = np.concatenate([g[key] for g in graphs])
            out[key] = buf[edge_perm] if do_csr else buf

    def _node_field(key):
        if key in first and first[key] is not None:
            arr0 = np.asarray(first[key])
            buf = np.zeros((N,) + arr0.shape[1:], dtype=arr0.dtype)
            buf[:n_tot] = np.concatenate([g[key] for g in graphs])
            out[key] = buf

    _edge_field("edge_feat")
    _edge_field("edge_dist")
    _node_field("coords")
    _node_field("lap_pe")

    if do_csr:
        out["_edge_perm"] = edge_perm
        out["csr_row_ptr"] = csr_row_ptr
        out["csc_perm"] = csc_perm
        out["csc_row_ptr"] = csc_row_ptr
        # compacted Pallas window measurement — see graphs/batch.py (the
        # pure-python packer) for the rationale; shape IS the value
        from infomax3d_tpu.ops.pallas.spmm import CSR_TILE_N
        tile_starts = np.arange(0, N, CSR_TILE_N)
        tile_edges = (csr_row_ptr[np.minimum(tile_starts + CSR_TILE_N, N)]
                      - csr_row_ptr[tile_starts])
        win = max(128, int(np.ceil((int(tile_edges.max()) + 8) / 128)) * 128)
        out["csr_tile_win"] = np.zeros(win, np.int8)
        csc_tile_edges = (csc_row_ptr[np.minimum(tile_starts + CSR_TILE_N, N)]
                          - csc_row_ptr[tile_starts])
        cwin = max(128,
                   int(np.ceil((int(csc_tile_edges.max()) + 8) / 128)) * 128)
        out["csc_tile_win"] = np.zeros(cwin, np.int8)
        from infomax3d_tpu.ops.pallas.spmm import CSR_TILE_E
        recv_sorted = out["receivers"]
        e_real = int(csr_row_ptr[-1])
        spans = [1]
        for st in range(0, e_real, CSR_TILE_E):
            en = min(st + CSR_TILE_E, e_real)
            spans.append(int(recv_sorted[en - 1]) - int(recv_sorted[st]) + 1)
        bspan = max(128, int(np.ceil((max(spans) + 16) / 128)) * 128)
        out["csr_bwd_span"] = np.zeros(bspan, np.int8)
        # per-edge CSR slot (stats-backward routing operand); see
        # graphs/batch.py for rationale.  -1 on padding edges.
        pos = (np.arange(recv_sorted.shape[0], dtype=np.int32)
               - csr_row_ptr[np.minimum(recv_sorted, N)])
        out["csr_pos"] = np.where(recv_sorted < N, pos, -1).astype(np.int16)
        # node-tile csr PAIR windows (see graphs/batch.py)
        snd_all = out["senders"]
        ntt = (N + CSR_TILE_N - 1) // CSR_TILE_N
        stile = np.minimum(snd_all, N) // CSR_TILE_N
        slo = np.full(ntt + 1, np.iinfo(np.int64).max, np.int64)
        shi = np.full(ntt + 1, -1, np.int64)
        sval = snd_all < N
        eidx = np.arange(snd_all.shape[0], dtype=np.int64)
        np.minimum.at(slo, stile[sval], eidx[sval])
        np.maximum.at(shi, stile[sval], eidx[sval])
        tns = np.arange(ntt) * CSR_TILE_N
        lo_in = csr_row_ptr[tns].astype(np.int64)
        hi_in = csr_row_ptr[np.minimum(tns + CSR_TILE_N, N)] \
            .astype(np.int64) - 1
        plo = np.minimum(np.where(shi[:ntt] >= 0, slo[:ntt], lo_in), lo_in)
        phi = np.maximum(shi[:ntt], hi_in)
        pspan = np.maximum(phi - plo + 1, 1)
        pwin = max(128, int(np.ceil((int(pspan.max()) + 8) / 128)) * 128)
        out["csr_pair_base"] = plo.astype(np.int32)
        out["csr_pair_win"] = np.zeros(pwin, np.int8)
        send_sorted = out["senders"]
        cspans = [1]
        for st in range(0, e_real, CSR_TILE_E):
            en = min(st + CSR_TILE_E, e_real)
            touched_lo = min(int(recv_sorted[st:en].min()),
                             int(send_sorted[st:en].min()))
            touched_hi = max(int(recv_sorted[st:en].max()),
                             int(send_sorted[st:en].max()))
            cspans.append(touched_hi - touched_lo + 1)
        cspan = max(128, int(np.ceil((max(cspans) + 16) / 128)) * 128)
        out["csr_cmb_span"] = np.zeros(cspan, np.int8)
    if K > 0:
        out.update(
            mb_in_edges=mb_in_edges.reshape(N, K),
            mb_in_mask=mb_in_mask.reshape(N, K).view(bool),
            mb_edge_slot=mb_in_slot,
            mb_out_edges=mb_out_edges.reshape(N, K),
            mb_out_mask=mb_out_mask.reshape(N, K).view(bool),
            mb_out_slot=mb_out_slot,
        )
    if nmax > 0:
        out["rd_node_idx"] = rd_node_idx.reshape(G, nmax)
        out["rd_inv_flat"] = rd_inv

    for key in extras_keys:
        vals = [np.asarray(g[key]) for g in graphs]
        buf = np.zeros((G,) + vals[0].shape, dtype=vals[0].dtype)
        buf[:g_real] = np.stack(vals)
        out[key] = buf
    return out
