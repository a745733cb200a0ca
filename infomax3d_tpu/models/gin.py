"""OGB GNN baseline: GIN / GCN convolutions ± virtual node
(reference `models/gin.py:17-315`).

TPU-native notes: virtual-node broadcast/pool are segment ops over the
node->graph ids (replacing `dgl.broadcast_nodes` / `SumPooling`); all
BatchNorms are masked to real rows.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import (
    AtomEncoder, BondEncoder, MaskedBatchNorm, scaled_xavier_uniform,
)
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import (
    batch_readout, degree, segment_mean, segment_softmax, segment_sum,
)


class GINConv(nn.Module):
    """GIN convolution (reference models/gin.py:85-110): messages =
    relu(h_src + bond_emb), sum-reduce, MLP((1+eps) * h + agg)."""
    hidden_dim: int
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, h, edge_attr, deterministic=True):
        N = h.shape[0]
        emb = BondEncoder(self.hidden_dim, name="bond_encoder")(edge_attr)
        from infomax3d_tpu.ops.mailbox import edge_aggregate, gather_src
        msg = jax.nn.relu(gather_src(g, h) + emb)
        agg = edge_aggregate(g, msg, "sum")
        eps = self.param("eps", nn.initializers.zeros, (1,))
        z = (1.0 + eps) * h + agg
        z = nn.Dense(self.hidden_dim)(z)
        z = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
            z, mask=g.node_mask, use_running_average=deterministic)
        z = jax.nn.relu(z)
        return nn.Dense(self.hidden_dim)(z)


class GCNConv(nn.Module):
    """GCN convolution (reference models/gin.py:113-143)."""
    hidden_dim: int
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, h, edge_attr, deterministic=True):
        N = h.shape[0]
        x = nn.Dense(self.hidden_dim, name="linear")(h)
        emb = BondEncoder(self.hidden_dim, name="bond_encoder")(edge_attr)
        degs = degree(g.senders, N, mask=g.edge_mask) + 1.0   # out-degree + 1
        norm = degs[:, None] ** -0.5
        enorm = (jnp.take(norm, g.senders.clip(0, N - 1), axis=0) *
                 jnp.take(norm, g.receivers.clip(0, N - 1), axis=0))
        from infomax3d_tpu.ops.mailbox import edge_aggregate, gather_src
        msg = enorm * jax.nn.relu(gather_src(g, x) + emb)
        agg = edge_aggregate(g, msg, "sum")
        root_emb = self.param("root_emb", nn.initializers.normal(1.0),
                              (self.hidden_dim,))
        return agg + jax.nn.relu(x + root_emb[None, :]) / degs[:, None]


class GNNNode(nn.Module):
    """Stack of GIN/GCN convs with JK aggregation (models/gin.py:146-210)."""
    num_layers: int
    hidden_dim: int
    dropout: float = 0.5
    jk: str = "last"
    residual: bool = False
    gnn_type: str = "gin"
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True):
        h_list = [AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)]
        for layer in range(self.num_layers):
            conv_cls = GINConv if self.gnn_type == "gin" else GCNConv
            h = conv_cls(self.hidden_dim, self.batch_norm_momentum,
                         name=f"conv_{layer}")(g, h_list[layer], g.edge_feat,
                                               deterministic=deterministic)
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                name=f"batch_norm_{layer}")(
                h, mask=g.node_mask, use_running_average=deterministic)
            if layer != self.num_layers - 1:
                h = jax.nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout,
                               deterministic=deterministic)(h)
            if self.residual:
                h = h + h_list[layer]
            h_list.append(h)
        if self.jk == "last":
            return h_list[-1]
        if self.jk == "sum":
            return sum(h_list[:self.num_layers])
        raise ValueError(f"unknown JK mode {self.jk}")


class GNNNodeVirtual(nn.Module):
    """GIN/GCN stack with a per-graph virtual node (models/gin.py:214-315)."""
    num_layers: int
    hidden_dim: int
    dropout: float = 0.5
    jk: str = "last"
    residual: bool = False
    gnn_type: str = "gin"
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True):
        G = g.num_graphs
        v_emb = self.param("virtualnode_embedding", nn.initializers.zeros,
                           (self.hidden_dim,))
        virtual = jnp.broadcast_to(v_emb[None, :], (G, self.hidden_dim))
        h_list = [AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)]
        for layer in range(self.num_layers):
            # broadcast virtual node message to real nodes
            vmsg = jnp.take(virtual, g.node_graph.clip(0, G - 1), axis=0)
            h_list[layer] = h_list[layer] + jnp.where(
                g.node_mask[:, None], vmsg, 0.0)
            conv_cls = GINConv if self.gnn_type == "gin" else GCNConv
            h = conv_cls(self.hidden_dim, self.batch_norm_momentum,
                         name=f"conv_{layer}")(g, h_list[layer], g.edge_feat,
                                               deterministic=deterministic)
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                name=f"batch_norm_{layer}")(
                h, mask=g.node_mask, use_running_average=deterministic)
            if layer != self.num_layers - 1:
                h = jax.nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
            if self.residual:
                h = h + h_list[layer]
            h_list.append(h)
            if layer < self.num_layers - 1:
                pooled = segment_sum(h_list[layer], g.node_graph, G) + virtual
                z = nn.Dense(self.hidden_dim)(pooled)
                z = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
                    z, mask=g.graph_mask, use_running_average=deterministic)
                z = jax.nn.relu(z)
                z = nn.Dense(self.hidden_dim)(z)
                z = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
                    z, mask=g.graph_mask, use_running_average=deterministic)
                z = jax.nn.relu(z)
                if self.dropout > 0:
                    z = nn.Dropout(rate=self.dropout,
                                   deterministic=deterministic)(z)
                virtual = virtual + z if self.residual else z
        if self.jk == "last":
            return h_list[-1]
        if self.jk == "sum":
            return sum(h_list[:self.num_layers])
        raise ValueError(f"unknown JK mode {self.jk}")


class Set2Set(nn.Module):
    """Set2Set pooling (dgl.nn.Set2Set equivalent): LSTM + attention over
    nodes, n_iters rounds, output [G, 2*D]."""
    hidden_dim: int
    n_iters: int = 2
    n_layers: int = 2

    @nn.compact
    def __call__(self, g: GraphBatch, h):
        G = g.num_graphs
        cells = [nn.LSTMCell(features=self.hidden_dim, name=f"lstm_{i}")
                 for i in range(self.n_layers)]
        carries = [c.initialize_carry(jax.random.key(0), (G, 2 * self.hidden_dim))
                   for c in cells]
        q_star = jnp.zeros((G, 2 * self.hidden_dim))
        for _ in range(self.n_iters):
            x = q_star
            new_carries = []
            for c, carry in zip(cells, carries):
                carry, x = c(carry, x)
                new_carries.append(carry)
            carries = new_carries
            q = x                                            # [G, D]
            e = jnp.sum(h * jnp.take(q, g.node_graph.clip(0, G - 1), axis=0),
                        axis=-1)
            a = segment_softmax(e, g.node_graph, G, mask=g.node_mask)
            r = segment_sum(a[:, None] * h, g.node_graph, G)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


@register_model("OGBGNN")
class OGBGNN(nn.Module):
    """Reference OGBGNN (models/gin.py:17-81)."""
    target_dim: int = 1
    num_layers: int = 5
    hidden_dim: int = 300
    gnn_type: str = "gin"
    virtual_node: bool = True
    residual: bool = False
    dropout: float = 0.0
    JK: str = "last"
    graph_pooling: str = "sum"
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        node_cls = GNNNodeVirtual if self.virtual_node else GNNNode
        h = node_cls(self.num_layers, self.hidden_dim, dropout=self.dropout,
                     jk=self.JK, residual=self.residual, gnn_type=self.gnn_type,
                     batch_norm_momentum=self.batch_norm_momentum,
                     name="node_gnn")(g, deterministic=deterministic)
        G = g.num_graphs
        if self.graph_pooling in ("sum", "mean", "max"):
            hg = batch_readout(g, h, [self.graph_pooling])
        elif self.graph_pooling == "attention":
            gate = nn.Dense(2 * self.hidden_dim)(h)
            gate = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
                gate, mask=g.node_mask, use_running_average=deterministic)
            gate = nn.Dense(1)(jax.nn.relu(gate))
            a = segment_softmax(gate[:, 0], g.node_graph, G, mask=g.node_mask)
            hg = segment_sum(a[:, None] * h, g.node_graph, G)
        elif self.graph_pooling == "set2set":
            hg = Set2Set(self.hidden_dim, name="set2set")(g, h)
        else:
            raise ValueError(f"Invalid graph pooling type {self.graph_pooling}")
        out = nn.Dense(self.target_dim, name="graph_pred_linear")(hg)
        if return_nodes:
            return out, h
        return out
