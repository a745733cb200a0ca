"""GeoMol MPNN family (reference `models/geomol_mpnn.py` and the
`geomol_mpnn_ogb_feat*` variants): meta-layer GNN with learnable-epsilon
residual edge+node models, random-vector augmentation, mean-pool readout.

These models consume chemprop-style one-hot features (GeoMol featurization)
or OGB categorical codes; the wrapper injects per-forward Gaussian noise from
the 'random' rng collection (explicit keys instead of global torch RNG).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder, BondEncoder, MaskedBatchNorm
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import segment_mean, segment_sum


class GeomolMLP(nn.Module):
    """Reference GeomolMLP (geomol_mpnn.py:12-45): hidden width = in_dim when
    out_dim < 10 else out_dim; num_layers hidden blocks then a final Linear."""
    in_dim: int
    out_dim: int
    num_layers: int
    layer_norm: bool = False
    batch_norm: bool = False
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h_dim = self.in_dim if self.out_dim < 10 else self.out_dim
        for layer in range(self.num_layers):
            x = nn.Dense(h_dim)(x)
            if self.layer_norm:
                x = nn.LayerNorm()(x)
            if self.batch_norm:
                x = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
                    x, mask=mask, use_running_average=deterministic)
            x = jax.nn.relu(x)
        return nn.Dense(self.out_dim)(x)


class GeomolEdgeModel(nn.Module):
    hidden_dim: int
    n_layers: int

    @nn.compact
    def __call__(self, g: GraphBatch, x, edge_attr, deterministic=True):
        N = x.shape[0]
        f_ij = nn.Dense(self.hidden_dim, name="edge")(edge_attr)
        f_i = nn.Dense(self.hidden_dim, use_bias=False, name="node_in")(x)
        f_j = nn.Dense(self.hidden_dim, use_bias=False, name="node_out")(x)
        out = jax.nn.relu(f_ij +
                          jnp.take(f_i, g.senders.clip(0, N - 1), axis=0) +
                          jnp.take(f_j, g.receivers.clip(0, N - 1), axis=0))
        return GeomolMLP(self.hidden_dim, self.hidden_dim, self.n_layers,
                         name="mlp")(out, mask=g.edge_mask,
                                     deterministic=deterministic)


class GeomolNodeModel(nn.Module):
    hidden_dim: int
    n_layers: int

    @nn.compact
    def __call__(self, g: GraphBatch, x, edge_attr, deterministic=True):
        out = GeomolMLP(self.hidden_dim, self.hidden_dim, self.n_layers,
                        name="node_mlp_1")(edge_attr, mask=g.edge_mask,
                                           deterministic=deterministic)
        out = segment_sum(out, g.receivers, x.shape[0])
        return GeomolMLP(self.hidden_dim, self.hidden_dim, self.n_layers,
                         name="node_mlp_2")(out, mask=g.node_mask,
                                            deterministic=deterministic)


class GeomolGNN(nn.Module):
    """Reference GeomolGNN (geomol_mpnn.py:121-135): init MLPs + `depth`
    applications of ONE shared meta-layer.  `non_shared=True` builds a
    separate meta-layer (models + epsilons) per depth instead — the
    geomol_mpnn_ogb_feat_random_non_shared.py:29-33 variant."""
    node_dim: int
    edge_dim: int
    hidden_dim: int = 300
    depth: int = 3
    n_layers: int = 2
    non_shared: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, x, edge_attr, deterministic=True):
        x = GeomolMLP(self.node_dim, self.hidden_dim, self.n_layers,
                      name="node_init")(x, deterministic=deterministic)
        edge_attr = GeomolMLP(self.edge_dim, self.hidden_dim, self.n_layers,
                              name="edge_init")(edge_attr,
                                                deterministic=deterministic)
        for d in range(self.depth):
            sfx = f"_{d}" if self.non_shared else ""
            if d == 0 or self.non_shared:
                edge_model = GeomolEdgeModel(self.hidden_dim, self.n_layers,
                                             name=f"edge_model{sfx}")
                node_model = GeomolNodeModel(self.hidden_dim, self.n_layers,
                                             name=f"node_model{sfx}")
                edge_eps = self.param(f"edge_eps{sfx}",
                                      nn.initializers.zeros, (1,))
                node_eps = self.param(f"node_eps{sfx}",
                                      nn.initializers.zeros, (1,))
            edge_attr = (1 + edge_eps) * edge_attr + edge_model(
                g, x, edge_attr, deterministic=deterministic)
            x = (1 + node_eps) * x + node_model(
                g, x, edge_attr, deterministic=deterministic)
        return x, edge_attr


class GeomolGNNOGBFeat(nn.Module):
    """Reference GeomolGNNOGBFeat (geomol_mpnn_ogb_feat.py:14-37): full-width
    atom/bond encoders, then the GeomolGNN stack.  No random vectors — the
    reference's forward swallows them via **kwargs (:29); the Random
    variants below mix them in.  Returns (node, edge) embeddings."""
    hidden_dim: int = 300
    depth: int = 3
    n_layers: int = 2

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        x = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        e = BondEncoder(self.hidden_dim, name="bond_encoder")(g.edge_feat)
        return GeomolGNN(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                         self.depth, self.n_layers,
                         name="gnn")(g, x, e, deterministic=deterministic)


class GeomolGNNOGBFeatRandom(nn.Module):
    """Reference GeomolGNNOGBFeatRandom (geomol_mpnn_ogb_feat_random.py:
    14-46): encode full width, append per-forward Gaussian noise columns,
    init MLPs take hidden+random width.  `non_shared` selects the
    ..._non_shared.py sibling (per-depth meta-layers)."""
    hidden_dim: int = 300
    depth: int = 3
    n_layers: int = 2
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
    non_shared: bool = False

    def _noise(self, shape):
        if self.has_rng("random"):
            return self.random_vec_std * jax.random.normal(
                self.make_rng("random"), shape)
        return jnp.zeros(shape)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        x = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        e = BondEncoder(self.hidden_dim, name="bond_encoder")(g.edge_feat)
        x = jnp.concatenate(
            [x, self._noise((x.shape[0], self.random_vec_dim))], axis=-1)
        e = jnp.concatenate(
            [e, self._noise((e.shape[0], self.random_vec_dim))], axis=-1)
        return GeomolGNN(self.hidden_dim + self.random_vec_dim,
                         self.hidden_dim + self.random_vec_dim,
                         self.hidden_dim, self.depth, self.n_layers,
                         non_shared=self.non_shared,
                         name="gnn")(g, x, e, deterministic=deterministic)


@register_model("GeomolGNNWrapper")
class GeomolGNNWrapper(nn.Module):
    """Random-vec augmented GeomolGNN + mean pool + MLP head
    (geomol_mpnn.py:138-164).  Expects float (one-hot chemprop) features."""
    hidden_dim: int
    node_dim: int
    edge_dim: int
    depth: int = 3
    n_layers: int = 2
    readout_layers: int = 2
    readout_batchnorm: bool = True
    target_dim: int = 1
    random_vec_dim: int = 10
    random_vec_std: float = 1.0

    def _noise(self, shape):
        if self.has_rng("random"):
            return self.random_vec_std * jax.random.normal(
                self.make_rng("random"), shape)
        return jnp.zeros(shape)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        x = g.node_feat.astype(jnp.float32)
        e = g.edge_feat.astype(jnp.float32)
        x = jnp.concatenate(
            [x, self._noise((x.shape[0], self.random_vec_dim))], axis=-1)
        e = jnp.concatenate(
            [e, self._noise((e.shape[0], self.random_vec_dim))], axis=-1)
        x, e = GeomolGNN(self.node_dim + self.random_vec_dim,
                         self.edge_dim + self.random_vec_dim,
                         self.hidden_dim, self.depth, self.n_layers,
                         name="gnn")(g, x, e, deterministic=deterministic)
        pooled = segment_mean(x, g.node_graph, g.num_graphs)
        out = MLP(out_dim=self.target_dim, hidden_size=self.hidden_dim,
                  layers=self.readout_layers,
                  mid_batch_norm=self.readout_batchnorm,
                  name="output")(pooled, mask=g.graph_mask,
                                 deterministic=deterministic)
        if return_nodes:
            return out, x
        return out


@register_model("GeomolGNNWrapperOGBFeat")
class GeomolGNNWrapperOGBFeat(nn.Module):
    """OGB-categorical-feature fine-tune wrapper
    (geomol_mpnn_ogb_feat.py:39-56): GeomolGNNOGBFeat + mean pool + MLP
    head.  NO random vectors — those belong to the ...Random siblings; the
    node_gnn here is class-identical to the OT generator's
    `gnn_model: GeomolGNNOGBFeat` backbone so `transfer_layers: [gnn.]`
    checkpoint transfer (configs/tune_from_ot_geomol_gnn.yml) lines up
    key-for-key after the gnn->node_gnn rename."""
    hidden_dim: int
    depth: int = 3
    n_layers: int = 2
    readout_layers: int = 2
    readout_batchnorm: bool = True
    readout_hidden_dim: Optional[int] = None
    target_dim: int = 1

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        x, _ = GeomolGNNOGBFeat(self.hidden_dim, self.depth, self.n_layers,
                                name="node_gnn")(g,
                                                 deterministic=deterministic)
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


@register_model("GeomolGNNWrapperOGBFeatRandom")
class GeomolGNNWrapperOGBFeatRandom(nn.Module):
    """Noise-augmented sibling (geomol_mpnn_ogb_feat_random.py:48-74):
    per-forward Gaussian columns appended after encoding, drawn from the
    'random' rng collection."""
    hidden_dim: int
    depth: int = 3
    n_layers: int = 2
    readout_layers: int = 2
    readout_batchnorm: bool = True
    readout_hidden_dim: Optional[int] = None
    target_dim: int = 1
    random_vec_dim: int = 10
    random_vec_std: float = 1.0
    non_shared: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        x, _ = GeomolGNNOGBFeatRandom(
            self.hidden_dim, self.depth, self.n_layers,
            random_vec_dim=self.random_vec_dim,
            random_vec_std=self.random_vec_std, non_shared=self.non_shared,
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
