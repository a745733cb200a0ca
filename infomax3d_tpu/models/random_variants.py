"""Remaining random-feature model variants.

Covers the reference files not already handled by `models/pna_random.py`:

- ``PNAOriginalRandom`` (reference `models/pna_original_random.py:120-150`) —
  despite its name the reference forward draws NO noise; it is PNAOriginal
  with the layer stack from that file.  Implemented as a thin re-registration
  of :class:`PNAOriginal`.
- ``PNAOriginalSimpleRandom`` (reference `pna_original_random.py:328-412`) —
  full-width atom embedding, per-forward Gaussian node noise concatenated and
  mixed by a 2-layer GeomolMLP ``node_init``, then PNASimpleLayer stack.
- ``PNARandomEdgeUpdate`` (reference `models/pna_edge_update_random.py`) —
  PNA whose edge state is updated GIN-style each layer:
  ``e' = (1+edge_eps)*e + pretrans(relu(W_e e + W_in h_src + W_out h_dst))``
  then nodes update from the aggregated transformed edge messages.  The
  reference's ``reduce_func`` (pna_edge_update_random.py:179-194) returns the
  UN-aggregated mailbox (its aggregation code is commented out), which crashes
  in DGL for mixed degrees; we implement the evident intent — PNA
  aggregators x scalers over ``posttrans_1``-transformed edge messages feeding
  ``posttrans_2`` (whose declared in_dim ``len(agg)*len(scalers)*in_dim``
  confirms it).
- ``OGBGNNRandom`` / ``GNNNodeRandom`` / ``GNNNodeVirtualRandom`` (reference
  `models/gin_random.py`) — OGB GIN with noise columns: atom/bond encoders
  emit ``hidden - random_vec_dim`` and the SAME per-forward noise draw is
  concatenated at the input (nodes) and inside every conv (edges).
- ``GeomolGNNWrapperOGBFeatRandomNonShared`` (reference
  `models/geomol_mpnn_ogb_feat_random_non_shared.py:14-76`) — unlike the
  shared-encoder OGB-feat wrapper, full-width atom/bond encoders followed by
  dedicated 2-layer GeomolMLP ``node_init``/``edge_init`` mixing in the noise.

Noise comes from the flax ``'random'`` RNG collection (pass
``rngs={'random': key}``); without it a deterministic zero draw keeps shapes
and initialization stable, matching how the reference behaves at std=0.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import (
    MLP, AtomEncoder, BondEncoder, MaskedBatchNorm, MLPReadout,
)
from infomax3d_tpu.models.geomol_mpnn import GeomolGNN, GeomolMLP
from infomax3d_tpu.models.gin import GINConv, GNNNode, GNNNodeVirtual, OGBGNN
from infomax3d_tpu.models.pna_original import PNAOriginal, PNASimpleLayer
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import batch_readout, segment_mean


class _NoiseMixin:
    def _noise(self, shape):
        if self.has_rng("random"):
            return self.random_vec_std * jax.random.normal(
                self.make_rng("random"), shape)
        return jnp.zeros(shape)


@register_model("PNAOriginalRandom")
class PNAOriginalRandom(PNAOriginal):
    """Reference pna_original_random.py:120-150 — forward draws no noise;
    numerically identical to PNAOriginal (kept as its own registry entry so
    reference configs naming it resolve)."""
    pass


@register_model("PNAOriginalSimpleRandom")
class PNAOriginalSimpleRandom(nn.Module, _NoiseMixin):
    """Reference pna_original_random.py:328-412."""
    hidden_dim: int
    last_layer_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
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
        h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        h = jnp.concatenate(
            [h, self._noise((h.shape[0], self.random_vec_dim))], axis=-1)
        h = GeomolMLP(self.hidden_dim + self.random_vec_dim, self.hidden_dim,
                      num_layers=2, name="node_init")(
            h, mask=g.node_mask, deterministic=deterministic)
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


class PNALayerEdgeUpdate(nn.Module):
    """Reference pna_edge_update_random.py:119-206 (see module docstring for
    the upstream-broken reduce this repairs)."""
    in_dim: int
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    activation: str = "relu"
    last_activation: str = "none"
    dropout: float = 0.0
    residual: bool = True
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    posttrans_layers: int = 2
    pretrans_layers: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, h, e, deterministic=True):
        from infomax3d_tpu.ops.mailbox import gather_dst, gather_src, pna_aggregate
        z = jax.nn.relu(
            nn.Dense(self.in_dim, name="edge")(e)
            + nn.Dense(self.in_dim, use_bias=False, name="node_in")(
                gather_src(g, h))
            + nn.Dense(self.in_dim, use_bias=False, name="node_out")(
                gather_dst(g, h)))
        z = MLP(out_dim=self.in_dim, hidden_size=self.in_dim,
                layers=self.pretrans_layers, mid_activation=self.activation,
                last_activation=self.last_activation,
                mid_batch_norm=self.mid_batch_norm,
                last_batch_norm=self.last_batch_norm,
                batch_norm_momentum=self.batch_norm_momentum,
                dropout=self.dropout,
                name="pretrans")(z, mask=g.edge_mask,
                                 deterministic=deterministic)
        edge_eps = self.param("edge_eps", nn.initializers.zeros, (1,))
        e_out = (1.0 + edge_eps) * e + z

        msg = MLP(out_dim=self.in_dim, hidden_size=self.out_dim,
                  layers=self.posttrans_layers, mid_activation=self.activation,
                  last_activation=self.last_activation,
                  mid_batch_norm=self.mid_batch_norm,
                  last_batch_norm=self.last_batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  dropout=self.dropout,
                  name="posttrans_1")(e_out, mask=g.edge_mask,
                                      deterministic=deterministic)
        agg = pna_aggregate(g, msg, self.aggregators, self.scalers,
                            avg_d_log=1.0)
        node_eps = self.param("node_eps", nn.initializers.zeros, (1,))
        h_out = (1.0 + node_eps) * h + MLP(
            out_dim=self.out_dim, hidden_size=self.out_dim,
            layers=self.posttrans_layers, mid_activation=self.activation,
            last_activation=self.last_activation,
            mid_batch_norm=self.mid_batch_norm,
            last_batch_norm=self.last_batch_norm,
            batch_norm_momentum=self.batch_norm_momentum, dropout=self.dropout,
            name="posttrans_2")(agg, mask=g.node_mask,
                                deterministic=deterministic)
        return h_out, e_out


@register_model("PNAGNNRandomEdgeUpdate")
class PNAGNNRandomEdgeUpdate(nn.Module, _NoiseMixin):
    """GNN-only edge-update variant (reference
    pna_edge_update_random.py:57-117): full-width atom/bond encoders,
    noise concatenated then GeomolMLP-projected back to hidden_dim, edge
    state updated across layers.  Returns node embeddings (the OT conformer
    model's backbone, `gnn_model: PNAGNNRandomEdgeUpdate` in
    configs_clean/pre-train_Optimal_Transport_baseline.yml)."""
    hidden_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
    residual: bool = True
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
    def __call__(self, g: GraphBatch, deterministic=True):
        h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        e = BondEncoder(self.hidden_dim, name="bond_encoder")(g.edge_feat)
        h = jnp.concatenate(
            [h, self._noise((h.shape[0], self.random_vec_dim))], axis=-1)
        e = jnp.concatenate(
            [e, self._noise((e.shape[0], self.random_vec_dim))], axis=-1)
        h = GeomolMLP(self.hidden_dim + self.random_vec_dim, self.hidden_dim,
                      num_layers=2,
                      batch_norm_momentum=self.batch_norm_momentum,
                      name="node_init")(h, mask=g.node_mask,
                                        deterministic=deterministic)
        e = GeomolMLP(self.hidden_dim + self.random_vec_dim, self.hidden_dim,
                      num_layers=2,
                      batch_norm_momentum=self.batch_norm_momentum,
                      name="edge_init")(e, mask=g.edge_mask,
                                        deterministic=deterministic)
        for i in range(self.propagation_depth):
            h, e = PNALayerEdgeUpdate(
                in_dim=self.hidden_dim, out_dim=self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                residual=self.residual, dropout=self.dropout,
                activation=self.activation,
                last_activation=self.last_activation,
                mid_batch_norm=self.mid_batch_norm,
                last_batch_norm=self.last_batch_norm,
                posttrans_layers=self.posttrans_layers,
                pretrans_layers=self.pretrans_layers,
                batch_norm_momentum=self.batch_norm_momentum,
                name=f"mp_{i}")(g, h, e, deterministic=deterministic)
        return h


@register_model("PNARandomEdgeUpdate")
class PNARandomEdgeUpdate(nn.Module, _NoiseMixin):
    """Reference pna_edge_update_random.py:15-57."""
    hidden_dim: int
    target_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    readout_aggregators: Sequence[str]
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
    readout_batchnorm: bool = True
    readout_hidden_dim: Optional[int] = None
    readout_layers: int = 2
    residual: bool = True
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
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        e = BondEncoder(self.hidden_dim, name="bond_encoder")(g.edge_feat)
        h = jnp.concatenate(
            [h, self._noise((h.shape[0], self.random_vec_dim))], axis=-1)
        e = jnp.concatenate(
            [e, self._noise((e.shape[0], self.random_vec_dim))], axis=-1)
        h = GeomolMLP(self.hidden_dim + self.random_vec_dim, self.hidden_dim,
                      num_layers=2,
                      batch_norm_momentum=self.batch_norm_momentum,
                      name="node_init")(h, mask=g.node_mask,
                                        deterministic=deterministic)
        e = GeomolMLP(self.hidden_dim + self.random_vec_dim, self.hidden_dim,
                      num_layers=2,
                      batch_norm_momentum=self.batch_norm_momentum,
                      name="edge_init")(e, mask=g.edge_mask,
                                        deterministic=deterministic)
        for i in range(self.propagation_depth):
            h, e = PNALayerEdgeUpdate(
                in_dim=self.hidden_dim, out_dim=self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                residual=self.residual, dropout=self.dropout,
                activation=self.activation,
                last_activation=self.last_activation,
                mid_batch_norm=self.mid_batch_norm,
                last_batch_norm=self.last_batch_norm,
                posttrans_layers=self.posttrans_layers,
                pretrans_layers=self.pretrans_layers,
                batch_norm_momentum=self.batch_norm_momentum,
                name=f"mp_{i}")(g, h, e, deterministic=deterministic)
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


class GINConvRandom(nn.Module):
    """Reference gin_random.py:89-117: bond encoder emits
    ``hidden - random_vec_dim``; the forward-level edge noise is appended."""
    hidden_dim: int
    random_vec_dim: int
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, h, edge_attr, rand_edge,
                 deterministic=True):
        emb = BondEncoder(self.hidden_dim - self.random_vec_dim,
                          name="bond_encoder")(edge_attr)
        emb = jnp.concatenate([emb, rand_edge], axis=-1)
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


class GNNNodeRandom(nn.Module):
    """Reference gin_random.py:153-243 (non-virtual)."""
    num_layers: int
    hidden_dim: int
    random_vec_dim: int
    dropout: float = 0.5
    jk: str = "last"
    residual: bool = False
    batch_norm_momentum: float = 0.1
    virtual_node: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, rand_x, rand_edge, deterministic=True):
        G = g.num_graphs
        h = AtomEncoder(self.hidden_dim - self.random_vec_dim,
                        name="atom_encoder")(g.node_feat)
        h = jnp.concatenate([h, rand_x], axis=-1)
        if self.virtual_node:
            v_emb = self.param("virtualnode_embedding", nn.initializers.zeros,
                               (self.hidden_dim,))
            virtual = jnp.broadcast_to(v_emb[None, :], (G, self.hidden_dim))
        h_list = [h]
        for layer in range(self.num_layers):
            h = h_list[layer]
            if self.virtual_node:
                h = h + jnp.take(virtual, g.node_graph.clip(0, G - 1), axis=0)
            h = GINConvRandom(self.hidden_dim, self.random_vec_dim,
                              self.batch_norm_momentum,
                              name=f"conv_{layer}")(
                g, h, g.edge_feat, rand_edge, deterministic=deterministic)
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                name=f"bn_{layer}")(
                h, mask=g.node_mask, use_running_average=deterministic)
            if layer != self.num_layers - 1:
                h = jax.nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout,
                               deterministic=deterministic)(h)
            if self.residual:
                h = h + h_list[layer]
            h_list.append(h)
            if self.virtual_node and layer < self.num_layers - 1:
                from infomax3d_tpu.ops.segment import segment_sum
                pooled = segment_sum(h_list[layer], g.node_graph, G) + virtual
                z = nn.Dense(2 * self.hidden_dim, name=f"vn_mlp_{layer}_0")(pooled)
                z = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                    name=f"vn_bn_{layer}")(
                    z, mask=g.graph_mask, use_running_average=deterministic)
                z = jax.nn.relu(z)
                z = nn.Dense(self.hidden_dim, name=f"vn_mlp_{layer}_1")(z)
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


@register_model("OGBGNNRandom")
class OGBGNNRandom(nn.Module, _NoiseMixin):
    """Reference gin_random.py:16-86 — OGB GIN with per-forward noise columns
    on atoms and bonds (one draw shared by all layers)."""
    target_dim: int = 1
    num_layers: int = 5
    hidden_dim: int = 300
    virtual_node: bool = True
    residual: bool = False
    dropout: float = 0.0
    JK: str = "last"
    graph_pooling: str = "sum"
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        rand_x = self._noise((g.num_nodes, self.random_vec_dim))
        rand_edge = self._noise((g.num_edges, self.random_vec_dim))
        h = GNNNodeRandom(self.num_layers, self.hidden_dim,
                          self.random_vec_dim, dropout=self.dropout,
                          jk=self.JK, residual=self.residual,
                          batch_norm_momentum=self.batch_norm_momentum,
                          virtual_node=self.virtual_node,
                          name="node_gnn")(g, rand_x, rand_edge,
                                           deterministic=deterministic)
        hg = batch_readout(g, h,
                           [self.graph_pooling], sizes=g.n_nodes)
        out = nn.Dense(self.target_dim, name="graph_pred_linear")(hg)
        if return_nodes:
            return out, h
        return out


@register_model("GeomolGNNWrapperOGBFeatRandomNonShared")
class GeomolGNNWrapperOGBFeatRandomNonShared(nn.Module):
    """Reference geomol_mpnn_ogb_feat_random_non_shared.py:14-76: the
    noise-augmented wrapper whose meta-layers are NOT shared across depth
    (a separate edge/node model + epsilons per layer, :29-33) — encoders
    also not shared with an OT generator, hence the name."""
    hidden_dim: int
    target_dim: int = 1
    depth: int = 3
    n_layers: int = 2
    readout_layers: int = 2
    readout_batchnorm: bool = True
    readout_hidden_dim: Optional[int] = None
    random_vec_dim: int = 10
    random_vec_std: float = 1.0

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        from infomax3d_tpu.models.geomol_mpnn import GeomolGNNOGBFeatRandom
        x, _ = GeomolGNNOGBFeatRandom(
            self.hidden_dim, self.depth, self.n_layers,
            random_vec_dim=self.random_vec_dim,
            random_vec_std=self.random_vec_std, non_shared=True,
            name="node_gnn")(g, deterministic=deterministic)
        pooled = segment_mean(x, g.node_graph, g.num_graphs)
        out = MLP(out_dim=self.target_dim,
                  hidden_size=self.readout_hidden_dim or self.hidden_dim,
                  layers=self.readout_layers,
                  mid_batch_norm=self.readout_batchnorm,
                  name="output")(pooled, mask=g.graph_mask,
                                 deterministic=deterministic)
        if return_nodes:
            return out, x
        return out
