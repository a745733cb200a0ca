"""Net3DAE — encoder/decoder Net3D for the SelfSupervisedAETrainer
(reference `models/net3d_VAE.py:15-135`).

Encoder layers -> latent graph readout (concat of aggregators, NO output
MLP), decoder layers continue message passing, then pairwise distances are
predicted per complete-graph edge with a symmetrized distance net:
softplus(dn([h_i‖h_j]) + dn([h_j‖h_i])).  The reference predicts over
one-directional `pairwise_indices`; we predict over the (bidirectional)
complete-graph edges — every pair appears twice with identical value, so
masked-MSE reconstruction matches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder
from infomax3d_tpu.models.net3d import Net3DLayer
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.encodings import fourier_encode_dist
from infomax3d_tpu.ops.segment import batch_readout


@register_model("Net3DAE")
class Net3DAE(nn.Module):
    hidden_dim: int
    readout_aggregators: Sequence[str]
    batch_norm: bool = False
    node_wise_encoder_layers: int = 0
    node_wise_output_layers: int = 0
    batch_norm_momentum: float = 0.1
    reduce_func: str = "sum"
    dropout: float = 0.0
    encoder_depth: int = 4
    decoder_depth: int = 4
    projection_dim: int = 3
    distance_net: bool = True
    projection_layers: int = 1
    fourier_encodings: int = 0
    activation: str = "SiLU"
    update_net_layers: int = 2
    message_net_layers: int = 2
    use_node_features: bool = False
    # accepted for config compatibility with Net3D (unused here)
    target_dim: int = 0
    readout_batchnorm: bool = True
    readout_layers: int = 1
    readout_hidden_dim: Optional[int] = None
    propagation_depth: int = 0

    @nn.compact
    def __call__(self, g: GraphBatch, pairs: Optional[GraphBatch] = None,
                 deterministic: bool = True):
        """`pairs` (optional): a pair-view over the same node layout
        (reference net3d_distance_predictor.py:79 takes pairwise_indices);
        when given, the distance head predicts over its senders/receivers
        instead of g's own edges."""
        N = g.num_nodes
        if self.use_node_features:
            h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        else:
            emb = self.param("node_embedding", nn.initializers.normal(1.0),
                             (self.hidden_dim,))
            h = jnp.broadcast_to(emb[None, :], (N, self.hidden_dim))

        d = g.edge_dist
        if d.ndim == 1:
            d = d[:, None]
        if self.fourier_encodings > 0:
            d = fourier_encode_dist(d[..., 0], num_encodings=self.fourier_encodings)
        e = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=1,
                mid_activation=self.activation, last_activation=self.activation,
                mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                batch_norm_momentum=self.batch_norm_momentum, dropout=self.dropout,
                name="edge_input")(d, mask=g.edge_mask, deterministic=deterministic)
        e = jax.nn.silu(e)

        depth = self.encoder_depth or self.propagation_depth
        for i in range(depth):
            h, e = Net3DLayer(hidden_dim=self.hidden_dim,
                              batch_norm=self.batch_norm,
                              batch_norm_momentum=self.batch_norm_momentum,
                              dropout=self.dropout, mid_activation=self.activation,
                              reduce_func=self.reduce_func,
                              message_net_layers=self.message_net_layers,
                              update_net_layers=self.update_net_layers,
                              name=f"enc_{i}")(g, h, e, deterministic=deterministic)

        if self.node_wise_encoder_layers > 0:
            h = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                    layers=self.node_wise_encoder_layers,
                    mid_activation=self.activation, last_activation="none",
                    mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                    batch_norm_momentum=self.batch_norm_momentum,
                    name="node_wise_encoder")(h, mask=g.node_mask,
                                              deterministic=deterministic)

        latent = batch_readout(g, h,
                               self.readout_aggregators, sizes=g.n_nodes)

        for i in range(self.decoder_depth):
            h, e = Net3DLayer(hidden_dim=self.hidden_dim,
                              batch_norm=self.batch_norm,
                              batch_norm_momentum=self.batch_norm_momentum,
                              dropout=self.dropout, mid_activation=self.activation,
                              reduce_func=self.reduce_func,
                              message_net_layers=self.message_net_layers,
                              update_net_layers=self.update_net_layers,
                              name=f"dec_{i}")(g, h, e, deterministic=deterministic)

        pg = pairs if pairs is not None else g
        emask = pg.edge_mask
        s_idx = pg.senders.clip(0, N - 1)
        d_idx = pg.receivers.clip(0, N - 1)
        if self.distance_net:
            dn = MLP(out_dim=1, hidden_size=self.projection_dim,
                     mid_batch_norm=True, layers=self.projection_layers,
                     name="distance_net")
            # concat-free lazy parts: both kernel halves project h in NODE
            # space, then gather per (complete-graph) pair
            fwd = dn([(h, s_idx), (h, d_idx)], mask=emask,
                     deterministic=deterministic)
            bwd = dn([(h, d_idx), (h, s_idx)], mask=emask,
                     deterministic=deterministic)
            distances = jax.nn.softplus(fwd + bwd)[:, 0]
        else:
            if self.projection_dim > 0:
                h = MLP(out_dim=self.projection_dim, hidden_size=32,
                        mid_batch_norm=True, layers=self.projection_layers,
                        name="node_projection_net")(h, mask=g.node_mask,
                                                    deterministic=deterministic)
            src = jnp.take(h, s_idx, axis=0)
            dst = jnp.take(h, d_idx, axis=0)
            distances = jnp.linalg.norm(src - dst, axis=-1)
        return latent, distances


@register_model("Net3DDistancePredictor")
class Net3DDistancePredictor(nn.Module):
    """Reference `models/net3d_distance_predictor.py:15-110` — structurally
    Net3DAE with the reference's flat kwargs (propagation_depth = encoder
    depth, optional decoder_depth); returns (latent readout, predicted
    pairwise distances)."""
    hidden_dim: int
    readout_aggregators: Sequence[str]
    batch_norm: bool = False
    node_wise_encoder_layers: int = 0
    node_wise_output_layers: int = 0
    batch_norm_momentum: float = 0.1
    reduce_func: str = "sum"
    dropout: float = 0.0
    propagation_depth: int = 4
    decoder_depth: int = 0
    projection_dim: int = 3
    distance_net: bool = True
    projection_layers: int = 1
    fourier_encodings: int = 0
    activation: str = "SiLU"
    update_net_layers: int = 2
    message_net_layers: int = 2
    use_node_features: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, pairs: Optional[GraphBatch] = None,
                 deterministic: bool = True):
        out = Net3DAE(
            hidden_dim=self.hidden_dim,
            readout_aggregators=self.readout_aggregators,
            batch_norm=self.batch_norm,
            node_wise_encoder_layers=self.node_wise_encoder_layers,
            node_wise_output_layers=self.node_wise_output_layers,
            batch_norm_momentum=self.batch_norm_momentum,
            reduce_func=self.reduce_func, dropout=self.dropout,
            encoder_depth=self.propagation_depth,
            decoder_depth=self.decoder_depth,
            projection_dim=self.projection_dim,
            distance_net=self.distance_net,
            projection_layers=self.projection_layers,
            fourier_encodings=self.fourier_encodings,
            activation=self.activation,
            update_net_layers=self.update_net_layers,
            message_net_layers=self.message_net_layers,
            use_node_features=self.use_node_features,
            name="net")(g, pairs, deterministic=deterministic)
        if pairs is not None:
            # DistancePredictorTrainer contract: per-pair predictions [E, 1]
            return out[1][:, None]
        return out
