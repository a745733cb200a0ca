"""Dense padded batch format for attention models (SAN, Transformer,
PNATransformer, dense EGNN).

The reference materializes complete graphs + send/recv for SAN's real/fake
edge softmax (`models/san.py:111-145`) and pads to dense for torch
TransformerEncoderLayer (`datasets/custom_collate.py:285-358`).  On TPU the
whole family maps onto dense masked attention over [G, n_max, ...] tensors —
pure MXU work, no gather/scatter.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from infomax3d_tpu.graphs.batch import GraphBatch


@struct.dataclass
class DenseGraphBatch:
    node_feat: jnp.ndarray              # [G, Nmax, F] (int codes or float)
    node_mask: jnp.ndarray              # [G, Nmax] True = real
    edge_codes: Optional[jnp.ndarray] = None   # [G, Nmax, Nmax, Fe] bond codes
    real_edge_mask: Optional[jnp.ndarray] = None  # [G, Nmax, Nmax] bond present
    coords: Optional[jnp.ndarray] = None        # [G, Nmax, 3]
    lap_pe: Optional[jnp.ndarray] = None        # [G, Nmax, k, 2] (eigval, vec)
    lap_pe_mask: Optional[jnp.ndarray] = None   # [G, Nmax, k] True = valid
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def num_graphs(self) -> int:
        return self.node_feat.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.node_feat.shape[1]

    @property
    def pair_mask(self) -> jnp.ndarray:
        """[G, N, N] valid (real i, real j) pairs."""
        return self.node_mask[:, :, None] & self.node_mask[:, None, :]

    @property
    def graph_mask(self) -> jnp.ndarray:
        """[G] True where the graph slot holds a real molecule (same
        contract as GraphBatch.graph_mask — padded slots have no nodes)."""
        return self.node_mask.any(axis=1)


def dense_batch(graphs: Sequence[Dict[str, np.ndarray]], n_graphs: int,
                max_nodes: int, extras_keys: Sequence[str] = (),
                with_edges: bool = True, num_lap_pe: int = 0) -> Dict[str, np.ndarray]:
    """Pad per-molecule dicts into dense arrays (host side)."""
    g_real = len(graphs)
    if g_real == 0 or g_real > n_graphs:
        raise ValueError(f"got {g_real} graphs for {n_graphs} slots")
    f0 = graphs[0]
    nf = f0["node_feat"]
    node_feat = np.zeros((n_graphs, max_nodes) + nf.shape[1:], dtype=nf.dtype)
    node_mask = np.zeros((n_graphs, max_nodes), dtype=bool)
    out: Dict[str, np.ndarray] = {}
    if with_edges and f0.get("edge_feat") is not None:
        fe = f0["edge_feat"].shape[1]
        edge_codes = np.zeros((n_graphs, max_nodes, max_nodes, fe),
                              dtype=f0["edge_feat"].dtype)
        real_edge_mask = np.zeros((n_graphs, max_nodes, max_nodes), dtype=bool)
    else:
        edge_codes = real_edge_mask = None
    coords = None
    if f0.get("coords") is not None:
        coords = np.zeros((n_graphs, max_nodes, 3), dtype=np.float32)
    lap_pe = lap_pe_mask = None
    if num_lap_pe > 0:
        lap_pe = np.zeros((n_graphs, max_nodes, num_lap_pe, 2), dtype=np.float32)
        lap_pe_mask = np.zeros((n_graphs, max_nodes, num_lap_pe), dtype=bool)

    for i, g in enumerate(graphs):
        n = g["node_feat"].shape[0]
        if n > max_nodes:
            raise ValueError(f"molecule with {n} atoms > max_nodes {max_nodes}")
        node_feat[i, :n] = g["node_feat"]
        node_mask[i, :n] = True
        if edge_codes is not None:
            s, r = g["senders"], g["receivers"]
            edge_codes[i, s, r] = g["edge_feat"]
            real_edge_mask[i, s, r] = True
        if coords is not None and g.get("coords") is not None:
            coords[i, :n] = g["coords"]
        if lap_pe is not None and g.get("lap_pe") is not None:
            pe = g["lap_pe"]                     # [n, k, 2]
            k = min(pe.shape[1], num_lap_pe)
            lap_pe[i, :n, :k] = pe[:, :k]
            lap_pe_mask[i, :n, :k] = True

    out.update(node_feat=node_feat, node_mask=node_mask)
    if edge_codes is not None:
        out.update(edge_codes=edge_codes, real_edge_mask=real_edge_mask)
    if coords is not None:
        out["coords"] = coords
    if lap_pe is not None:
        out.update(lap_pe=lap_pe, lap_pe_mask=lap_pe_mask)
    for key in extras_keys:
        vals = [np.asarray(g[key]) for g in graphs]
        buf = np.zeros((n_graphs,) + vals[0].shape, dtype=vals[0].dtype)
        buf[:g_real] = np.stack(vals)
        if np.issubdtype(buf.dtype, np.floating):
            buf[g_real:] = np.nan
        out[key] = buf
    out["graph_mask"] = np.zeros(n_graphs, dtype=bool)
    out["graph_mask"][:g_real] = True
    return out


def to_dense_batch(arrays: Dict[str, np.ndarray],
                   extras_keys: Sequence[str] = ()) -> DenseGraphBatch:
    extras = {k: jnp.asarray(arrays[k]) for k in list(extras_keys) + ["graph_mask"]
              if k in arrays}
    return DenseGraphBatch(
        node_feat=jnp.asarray(arrays["node_feat"]),
        node_mask=jnp.asarray(arrays["node_mask"]),
        edge_codes=jnp.asarray(arrays["edge_codes"]) if "edge_codes" in arrays else None,
        real_edge_mask=jnp.asarray(arrays["real_edge_mask"])
        if "real_edge_mask" in arrays else None,
        coords=jnp.asarray(arrays["coords"]) if "coords" in arrays else None,
        lap_pe=jnp.asarray(arrays["lap_pe"]) if "lap_pe" in arrays else None,
        lap_pe_mask=jnp.asarray(arrays["lap_pe_mask"])
        if "lap_pe_mask" in arrays else None,
        extras=extras,
    )
