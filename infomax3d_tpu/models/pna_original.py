"""PNAOriginal — the faithful PNA-paper implementation with towers, GRU
option and graph norm (reference `models/pna_original.py:119-434`).

Differences from the repo-main `PNA` (models/pna.py) preserved here:
* scalers are ALWAYS applied (no >1-scaler gate) and `avg_d` is a scalar,
* optional towers: the feature dim is split across independent tower
  convolutions, mixed by a Linear + LeakyReLU,
* optional GRU between layers, optional graph_norm (h * 1/sqrt(n)),
* PNAOriginalSimple: no edge network — neighbor features aggregated
  directly, posttrans over (aggregators x scalers) * in_dim.

The reference's `moment3..5` aggregators are broken upstream for this model
(scalar-collapsing torch.mean) and are rejected here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder, BondEncoder, MLPReadout
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import pna_multi_aggregate_always_scaled
from infomax3d_tpu.ops.segment import batch_readout


class PNATower(nn.Module):
    in_dim: int
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: float
    dropout: float = 0.0
    graph_norm: bool = False
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    use_3d: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    edge_features: bool = True
    edge_hidden_dim: int = 0

    @nn.compact
    def __call__(self, g: GraphBatch, h, e, deterministic=True):
        N = h.shape[0]
        src = jnp.take(h, g.senders.clip(0, N - 1), axis=0)
        dst = jnp.take(h, g.receivers.clip(0, N - 1), axis=0)
        parts = [src, dst]
        if self.edge_features:
            parts.append(e)
        if self.use_3d:
            xs = jnp.take(g.coords, g.senders.clip(0, N - 1), axis=0)
            xd = jnp.take(g.coords, g.receivers.clip(0, N - 1), axis=0)
            parts.append(jnp.linalg.norm(xs - xd, axis=-1, keepdims=True))
        z = parts                   # SplitDense: concat-free first Dense
        msg = MLP(out_dim=self.in_dim, hidden_size=self.in_dim,
                  layers=self.pretrans_layers, mid_activation="relu",
                  last_activation="none",
                  name="pretrans")(z, mask=g.edge_mask,
                                   deterministic=deterministic)
        agg = pna_multi_aggregate_always_scaled(
            msg, g.receivers, N, self.aggregators, self.scalers, self.avg_d)
        hc = [h, agg]               # SplitDense: concat-free first Dense
        out = MLP(out_dim=self.out_dim, hidden_size=self.out_dim,
                  layers=self.posttrans_layers, mid_activation="relu",
                  last_activation="none", mid_batch_norm=self.mid_batch_norm,
                  last_batch_norm=self.last_batch_norm,
                  name="posttrans")(hc, mask=g.node_mask,
                                    deterministic=deterministic)
        if self.graph_norm:
            out = out * g.snorm
        if self.dropout > 0:
            out = nn.Dropout(rate=self.dropout,
                             deterministic=deterministic)(out)
        return out


class PNAOriginalLayer(nn.Module):
    in_dim: int
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: float
    dropout: float = 0.0
    graph_norm: bool = False
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    use_3d: bool = False
    towers: int = 1
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    divide_input: bool = True
    residual: bool = False
    edge_features: bool = True
    edge_hidden_dim: int = 0

    @nn.compact
    def __call__(self, g: GraphBatch, h, e, deterministic=True):
        residual = self.residual and self.in_dim == self.out_dim
        in_tower = self.in_dim // self.towers if self.divide_input else self.in_dim
        out_tower = self.out_dim // self.towers
        outs = []
        for t in range(self.towers):
            ht = h[:, t * in_tower:(t + 1) * in_tower] if self.divide_input else h
            outs.append(PNATower(
                in_dim=in_tower, out_dim=out_tower,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=self.avg_d, dropout=self.dropout,
                graph_norm=self.graph_norm,
                mid_batch_norm=self.mid_batch_norm,
                last_batch_norm=self.last_batch_norm, use_3d=self.use_3d,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                edge_features=self.edge_features,
                edge_hidden_dim=self.edge_hidden_dim,
                name=f"tower_{t}")(g, ht, e, deterministic=deterministic))
        h_cat = jnp.concatenate(outs, axis=-1)
        h_out = jax.nn.leaky_relu(
            nn.Dense(self.out_dim, name="mixing_network")(h_cat), 0.01)
        if residual:
            h_out = h + h_out
        return h_out


@register_model("PNAOriginal")
class PNAOriginal(nn.Module):
    hidden_dim: int
    last_layer_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    avg_d: float = 1.0
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    last_batch_norm: bool = False
    mid_batch_norm: bool = False
    propagation_depth: int = 4
    readout_hidden_dim: Optional[int] = None
    readout_layers: int = 2
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    residual: bool = False
    posttrans_layers: int = 1
    pretrans_layers: int = 1
    edge_hidden_dim: int = 0
    graph_norm: bool = False
    use_3d: bool = False
    gru_enable: bool = False
    divide_input_last: bool = True
    divide_input_first: bool = True
    edge_feat: bool = True
    towers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        h = AtomEncoder(self.hidden_dim, name="embedding_h")(g.node_feat)
        if self.in_feat_dropout > 0:
            h = nn.Dropout(rate=self.in_feat_dropout,
                           deterministic=deterministic)(h)
        e = None
        if self.edge_feat:
            e = BondEncoder(self.edge_hidden_dim or self.hidden_dim,
                            name="embedding_e")(g.edge_feat)
        if self.gru_enable:
            gru = nn.GRUCell(features=self.hidden_dim, name="gru")
        for i in range(self.propagation_depth):
            last = i == self.propagation_depth - 1
            h_t = PNAOriginalLayer(
                in_dim=self.hidden_dim,
                out_dim=self.last_layer_dim if last else self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=self.avg_d, dropout=self.dropout,
                graph_norm=self.graph_norm,
                mid_batch_norm=self.mid_batch_norm,
                last_batch_norm=self.last_batch_norm, use_3d=self.use_3d,
                towers=self.towers, pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                divide_input=self.divide_input_last if last
                else self.divide_input_first,
                residual=self.residual, edge_features=self.edge_feat,
                edge_hidden_dim=self.edge_hidden_dim or self.hidden_dim,
                name=f"layer_{i}")(g, h, e, deterministic=deterministic)
            if self.gru_enable and not last:
                # torch GRU(x, y): input h_t, hidden h -> new hidden
                _, h_t = gru(h, h_t)
            h = h_t
        readout = batch_readout(g, h,
                                self.readout_aggregators, sizes=g.n_nodes)
        out = MLPReadout(self.last_layer_dim * len(self.readout_aggregators),
                         self.target_dim, name="output")(readout)
        if return_nodes:
            return out, h
        return out


class PNASimpleLayer(nn.Module):
    in_dim: int
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: float
    dropout: float = 0.0
    last_batch_norm: bool = False
    mid_batch_norm: bool = False
    residual: bool = False
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, h, deterministic=True):
        N = h.shape[0]
        msgs = jnp.take(h, g.senders.clip(0, N - 1), axis=0)
        agg = pna_multi_aggregate_always_scaled(
            msgs, g.receivers, N, self.aggregators, self.scalers, self.avg_d)
        out = MLP(out_dim=self.out_dim, hidden_size=self.out_dim,
                  layers=self.posttrans_layers, mid_activation="relu",
                  last_activation="none", mid_batch_norm=self.mid_batch_norm,
                  last_batch_norm=self.last_batch_norm,
                  name="posttrans")(agg, mask=g.node_mask,
                                    deterministic=deterministic)
        out = jax.nn.relu(out)
        if self.residual and self.in_dim == self.out_dim:
            out = h + out
        if self.dropout > 0:
            out = nn.Dropout(rate=self.dropout,
                             deterministic=deterministic)(out)
        return out


@register_model("PNAOriginalSimple")
class PNAOriginalSimple(nn.Module):
    hidden_dim: int
    last_layer_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    avg_d: float = 1.0
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    last_batch_norm: bool = False
    mid_batch_norm: bool = False
    propagation_depth: int = 4
    readout_hidden_dim: Optional[int] = None
    readout_layers: int = 2
    readout_batchnorm: bool = True
    batch_norm_momentum: float = 0.1
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    residual: bool = False
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        h = AtomEncoder(self.hidden_dim, name="embedding_h")(g.node_feat)
        if self.in_feat_dropout > 0:
            h = nn.Dropout(rate=self.in_feat_dropout,
                           deterministic=deterministic)(h)
        for i in range(self.propagation_depth):
            last = i == self.propagation_depth - 1
            h = PNASimpleLayer(
                in_dim=self.hidden_dim,
                out_dim=self.last_layer_dim if last else self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=self.avg_d, dropout=self.dropout,
                last_batch_norm=self.last_batch_norm,
                mid_batch_norm=self.mid_batch_norm, residual=self.residual,
                posttrans_layers=self.posttrans_layers,
                name=f"layer_{i}")(g, h, deterministic=deterministic)
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
