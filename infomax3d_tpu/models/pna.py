"""PNA — Principal Neighbourhood Aggregation 2D encoder.

TPU-native re-design of the reference's primary 2D GNN
(`models/pna.py:90-252`):

* edge "pretrans" MLP on [h_src ‖ h_dst ‖ e (‖ d²)] — a batched gather +
  dense matmul (MXU) instead of DGL `apply_edges`,
* fused multi-aggregator segment reduce with degree scalers
  (`ops.pna_multi_aggregate`) instead of DGL mailbox reduction,
* concat with self features -> "posttrans" MLP -> residual,
* graph readout = concat of {min,max,mean,sum} segment reductions -> MLP.

All shapes static (padded-CSR GraphBatch); BatchNorm statistics masked to
real rows.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder, BondEncoder
from infomax3d_tpu.ops.mailbox import (
    gather_dst, gather_src, pna_aggregate, pna_aggregate_parts,
)
from infomax3d_tpu.ops.segment import batch_readout


class PNALayer(nn.Module):
    """One PNA message-passing layer (reference `models/pna.py:169-252`)."""
    in_dim: int
    out_dim: int
    in_dim_edges: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    activation: str = "relu"
    last_activation: str = "none"
    dropout: float = 0.0
    residual: bool = True
    pairwise_distances: bool = False
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    avg_d_log: float = 1.0
    posttrans_layers: int = 2
    pretrans_layers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, h: jnp.ndarray, e: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        N = h.shape[0]
        residual = self.residual and (self.in_dim == self.out_dim)

        from infomax3d_tpu.ops.mailbox import has_csr, has_mailbox
        if has_csr(g) or not has_mailbox(g):
            # lazy gather parts: SplitDense projects h in NODE space then
            # gathers — no [E, 3*D] concat materialized, and the src/dst
            # matmul rows drop from E to N (exact: take(hK) == take(h)K).
            # CSR buckets are receiver-sorted, so the receiver gather's
            # scatter backward takes the sorted fast path.
            from infomax3d_tpu.ops.mailbox import gather_parts
            parts = list(gather_parts(g, h))
        else:
            # mailbox batches keep the explicit gathers (their custom VJP
            # backward is a scatter-free mailbox sum)
            parts = [gather_src(g, h), gather_dst(g, h)]
        if self.in_dim_edges > 0:
            parts.append(e)
        if self.pairwise_distances:
            xs = jnp.take(g.coords, g.senders.clip(0, N - 1), axis=0)
            xd = jnp.take(g.coords, g.receivers.clip(0, N - 1), axis=0)
            parts.append(jnp.sum((xs - xd) ** 2, axis=-1, keepdims=True))
        z = parts

        # lazy_out: when the last pretrans layer is batch-normed, its BN
        # apply stays a lazy AffinePart that pna_aggregate_parts folds into
        # the Pallas stats kernel (or materializes on other paths)
        msg = MLP(out_dim=self.in_dim, hidden_size=self.in_dim,
                  layers=self.pretrans_layers, mid_activation=self.activation,
                  last_activation=self.last_activation, dropout=self.dropout,
                  mid_batch_norm=self.mid_batch_norm,
                  last_batch_norm=self.last_batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  lazy_out=True,
                  name="pretrans")(z, mask=g.edge_mask, deterministic=deterministic)

        agg_parts = pna_aggregate_parts(g, msg, self.aggregators,
                                        self.scalers, self.avg_d_log)

        # SplitDense: no [N, D+D*aggs*scalers] concat; on the CSR path the
        # scaler blocks stay lazy ScaledParts (row scaling commutes with the
        # posttrans matmul)
        h_cat = [h] + list(agg_parts)
        h_new = MLP(out_dim=self.out_dim, hidden_size=self.out_dim,
                    layers=self.posttrans_layers, mid_activation=self.activation,
                    last_activation=self.last_activation, dropout=self.dropout,
                    mid_batch_norm=self.mid_batch_norm,
                    last_batch_norm=self.last_batch_norm,
                    batch_norm_momentum=self.batch_norm_momentum,
                    name="posttrans")(h_cat, mask=g.node_mask,
                                      deterministic=deterministic)
        if residual:
            h_new = h_new + h
        return h_new


class PNAGNN(nn.Module):
    """Atom/bond embedding + stack of PNALayers (reference `models/pna.py:138-166`)."""
    hidden_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    residual: bool = True
    pairwise_distances: bool = False
    activation: str = "relu"
    last_activation: str = "none"
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    propagation_depth: int = 5
    dropout: float = 0.0
    posttrans_layers: int = 1
    pretrans_layers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        e = BondEncoder(self.hidden_dim, name="bond_encoder")(g.edge_feat)
        for i in range(self.propagation_depth):
            h = PNALayer(in_dim=self.hidden_dim, out_dim=self.hidden_dim,
                         in_dim_edges=self.hidden_dim,
                         aggregators=self.aggregators, scalers=self.scalers,
                         pairwise_distances=self.pairwise_distances,
                         residual=self.residual, dropout=self.dropout,
                         activation=self.activation,
                         last_activation=self.last_activation,
                         mid_batch_norm=self.mid_batch_norm,
                         last_batch_norm=self.last_batch_norm,
                         avg_d_log=1.0,
                         posttrans_layers=self.posttrans_layers,
                         pretrans_layers=self.pretrans_layers,
                         batch_norm_momentum=self.batch_norm_momentum,
                         name=f"mp_{i}")(g, h, e, deterministic=deterministic)
        return h


class PNA(nn.Module):
    """Full PNA model: GNN + multi-aggregator readout + output MLP
    (reference `models/pna.py:90-135`)."""
    hidden_dim: int
    target_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    readout_aggregators: Sequence[str]
    readout_batchnorm: bool = True
    readout_hidden_dim: Optional[int] = None
    readout_layers: int = 2
    residual: bool = True
    pairwise_distances: bool = False
    activation: str = "relu"
    last_activation: str = "none"
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    propagation_depth: int = 5
    dropout: float = 0.0
    posttrans_layers: int = 1
    pretrans_layers: int = 1
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True,
                 return_nodes: bool = False):
        h = PNAGNN(hidden_dim=self.hidden_dim, aggregators=self.aggregators,
                   scalers=self.scalers, residual=self.residual,
                   pairwise_distances=self.pairwise_distances,
                   activation=self.activation, last_activation=self.last_activation,
                   mid_batch_norm=self.mid_batch_norm,
                   last_batch_norm=self.last_batch_norm,
                   propagation_depth=self.propagation_depth,
                   dropout=self.dropout, posttrans_layers=self.posttrans_layers,
                   pretrans_layers=self.pretrans_layers,
                   batch_norm_momentum=self.batch_norm_momentum,
                   name="node_gnn")(g, deterministic=deterministic)
        readout = batch_readout(g, h,
                                self.readout_aggregators, sizes=g.n_nodes)
        rh = self.readout_hidden_dim or self.hidden_dim
        out = MLP(out_dim=self.target_dim, hidden_size=rh,
                  layers=self.readout_layers, mid_batch_norm=self.readout_batchnorm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  name="output")(readout, mask=g.graph_mask,
                                 deterministic=deterministic)
        if return_nodes:
            return out, h
        return out
