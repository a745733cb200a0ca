"""Random-feature PNA variants (reference `models/pna_gnn_random.py`,
`pna_original_random.py`, `pna_edge_update_random.py`, `gin_random.py`).

Per-forward Gaussian noise vectors are concatenated to atom/bond embeddings
so repeated forwards give different outputs — the multi-conformer generation
mode.  The reference samples from global torch RNG; here noise comes from the
flax 'random' RNG collection, so training remains reproducible with explicit
keys (pass ``rngs={'random': key}``; at init a deterministic zero draw keeps
shapes stable).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder, BondEncoder
from infomax3d_tpu.models.pna import PNALayer
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import batch_readout


class PNAGNNRandom(nn.Module):
    random_vec_dim: int
    hidden_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    random_vec_std: float = 1.0
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

    def _noise(self, shape):
        if self.has_rng("random"):
            return self.random_vec_std * jax.random.normal(
                self.make_rng("random"), shape)
        return jnp.zeros(shape)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True):
        small = self.hidden_dim - self.random_vec_dim
        h = AtomEncoder(small, name="atom_encoder")(g.node_feat)
        e = BondEncoder(small, name="bond_encoder")(g.edge_feat)
        h = jnp.concatenate([h, self._noise((h.shape[0], self.random_vec_dim))],
                            axis=-1)
        e = jnp.concatenate([e, self._noise((e.shape[0], self.random_vec_dim))],
                            axis=-1)
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
                         posttrans_layers=self.posttrans_layers,
                         pretrans_layers=self.pretrans_layers,
                         batch_norm_momentum=self.batch_norm_momentum,
                         name=f"mp_{i}")(g, h, e, deterministic=deterministic)
        return h


@register_model("PNARandom")
class PNARandom(nn.Module):
    """PNA with random-vector features (reference pna_gnn_random.py:13-52)."""
    hidden_dim: int
    target_dim: int
    random_vec_dim: int
    random_vec_std: float
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
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        h = PNAGNNRandom(random_vec_dim=self.random_vec_dim,
                         random_vec_std=self.random_vec_std,
                         hidden_dim=self.hidden_dim,
                         aggregators=self.aggregators, scalers=self.scalers,
                         residual=self.residual,
                         pairwise_distances=self.pairwise_distances,
                         activation=self.activation,
                         last_activation=self.last_activation,
                         mid_batch_norm=self.mid_batch_norm,
                         last_batch_norm=self.last_batch_norm,
                         propagation_depth=self.propagation_depth,
                         dropout=self.dropout,
                         posttrans_layers=self.posttrans_layers,
                         pretrans_layers=self.pretrans_layers,
                         batch_norm_momentum=self.batch_norm_momentum,
                         name="node_gnn")(g, deterministic=deterministic)
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
