"""EGNN — E(n)-invariant 3D encoder over complete graphs
(reference `models/egnn.py:13-140`).

Message MLP on [h_src ‖ h_dst ‖ ‖x_i - x_j‖²], sigmoid soft-edge gate,
sum/mean segment reduce, update MLP + residual.  Consumes `g.coords` (the
squared distance is recomputed per layer from coordinates, as the reference
does) and raw float node features.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import batch_readout, segment_mean, segment_sum


class EGCLayer(nn.Module):
    hidden_dim: int
    edge_dim: int = 1
    batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    dropout: float = 0.0
    mid_activation: str = "SiLU"
    reduce_func: str = "sum"

    @nn.compact
    def __call__(self, g: GraphBatch, h, deterministic=True):
        N = h.shape[0]
        xs = jnp.take(g.coords, g.senders.clip(0, N - 1), axis=0)
        xd = jnp.take(g.coords, g.receivers.clip(0, N - 1), axis=0)
        sq = jnp.sum((xs - xd) ** 2, axis=-1, keepdims=True)
        from infomax3d_tpu.ops.mailbox import (
            edge_aggregate, gather_dst, gather_parts, gather_src, has_csr,
            has_mailbox)
        if has_csr(g) or not has_mailbox(g):
            # SplitDense lazy parts: node-space projection, no concat;
            # csr batches get the Pallas seg-sum backwards + fused combine
            src, dst = gather_parts(g, h)
            z = [src, dst, sq]
        else:
            z = [gather_src(g, h), gather_dst(g, h), sq]
        msg = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=2,
                  mid_activation=self.mid_activation,
                  last_activation=self.mid_activation,
                  mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  dropout=self.dropout,
                  name="message_network")(z, mask=g.edge_mask,
                                          deterministic=deterministic)
        gate = jax.nn.sigmoid(nn.Dense(1, name="soft_edge_network")(msg))
        gated = msg * gate
        if self.reduce_func not in ("sum", "mean"):
            raise ValueError(f"reduce function not supported: {self.reduce_func}")
        agg = edge_aggregate(g, gated, self.reduce_func)
        upd = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=2,
                  mid_activation=self.mid_activation, last_activation="none",
                  mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  dropout=self.dropout,
                  name="update_network")(agg + h, mask=g.node_mask,
                                         deterministic=deterministic)
        return upd + h


@register_model("EGNN")
class EGNN(nn.Module):
    node_dim: int
    hidden_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    edge_dim: int = 0
    batch_norm: bool = False
    readout_batchnorm: bool = True
    batch_norm_momentum: float = 0.1
    reduce_func: str = "sum"
    dropout: float = 0.0
    propagation_depth: int = 4
    readout_layers: int = 2
    readout_hidden_dim: Optional[int] = None
    fourier_encodings: int = 0
    mid_activation: str = "SiLU"

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        x = g.node_feat.astype(jnp.float32)
        h = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=1,
                mid_activation=self.mid_activation, last_activation="none",
                mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                batch_norm_momentum=self.batch_norm_momentum,
                dropout=self.dropout,
                name="input")(x, mask=g.node_mask, deterministic=deterministic)
        h = jax.nn.silu(h)   # reference applies F.silu on top (egnn.py:82)
        for i in range(self.propagation_depth):
            h = EGCLayer(hidden_dim=self.hidden_dim, batch_norm=self.batch_norm,
                         batch_norm_momentum=self.batch_norm_momentum,
                         dropout=self.dropout,
                         mid_activation=self.mid_activation,
                         reduce_func=self.reduce_func,
                         name=f"mp_{i}")(g, h, deterministic=deterministic)
        h = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=2,
                mid_activation=self.mid_activation, last_activation="none",
                mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                batch_norm_momentum=self.batch_norm_momentum, dropout=self.dropout,
                name="node_wise_output_network")(h, mask=g.node_mask,
                                                 deterministic=deterministic)
        readout = batch_readout(g, h,
                                self.readout_aggregators, sizes=g.n_nodes)
        rh = self.readout_hidden_dim or self.hidden_dim
        out = MLP(out_dim=self.target_dim, hidden_size=rh,
                  layers=self.readout_layers,
                  mid_batch_norm=self.readout_batchnorm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  name="output")(readout, mask=g.graph_mask,
                                 deterministic=deterministic)
        if return_nodes:
            return out, h
        return out
