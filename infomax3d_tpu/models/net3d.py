"""Net3D — 3D geometry encoder over complete graphs with edge distances.

TPU-native re-design of reference `models/net3d.py:14-125`:

* input is the complete graph per molecule (E = n(n-1)) with only the
  inter-atomic distance on each edge; node features are a single learned
  embedding vector (node_dim = 0) unless `use_node_features`,
* optional Fourier distance encoding, then an input edge MLP (+ extra SiLU —
  reference applies F.silu on top of an MLP whose last activation is already
  SiLU, `models/net3d.py:81`; preserved),
* each layer: message MLP on [h_src ‖ h_dst ‖ e], the message is ADDED to the
  edge state (edge features are layer-carried state — reference
  `edges.data['d'] += message`), sigmoid soft-edge gate, sum/mean segment
  reduce, update MLP + residual,
* readout identical to PNA.

The layer returns (h, e) because edge state is mutable across layers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP, AtomEncoder
from infomax3d_tpu.ops.encodings import fourier_encode_dist
from infomax3d_tpu.ops.mailbox import edge_aggregate, gather_dst, gather_src
from infomax3d_tpu.ops.segment import batch_readout


class Net3DLayer(nn.Module):
    """One Net3D message-passing layer (reference `models/net3d.py:84-125`)."""
    hidden_dim: int
    batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    dropout: float = 0.0
    mid_activation: str = "SiLU"
    reduce_func: str = "sum"
    message_net_layers: int = 2
    update_net_layers: int = 2

    @nn.compact
    def __call__(self, g: GraphBatch, h: jnp.ndarray, e: jnp.ndarray,
                 deterministic: bool = True):
        N = h.shape[0]
        from infomax3d_tpu.ops.mailbox import has_csr, has_mailbox
        if has_csr(g) or not has_mailbox(g):
            # SplitDense lazy parts: node-space projection, no concat;
            # csr batches additionally get the Pallas seg-sum backwards and
            # the fused edge-combine forward (ops/mailbox.py::gather_parts)
            from infomax3d_tpu.ops.mailbox import gather_parts
            src, dst = gather_parts(g, h)
            z = [src, dst, e]
        else:
            z = [gather_src(g, h), gather_dst(g, h), e]
        message = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                      layers=self.message_net_layers,
                      mid_activation=self.mid_activation,
                      last_activation=self.mid_activation,
                      mid_batch_norm=self.batch_norm,
                      last_batch_norm=self.batch_norm,
                      batch_norm_momentum=self.batch_norm_momentum,
                      dropout=self.dropout,
                      name="message_network")(z, mask=g.edge_mask,
                                              deterministic=deterministic)
        e_new = e + message                                   # net3d.py:116
        gate = jax.nn.sigmoid(nn.Dense(1, name="soft_edge_network")(message))
        gated = message * gate
        if self.reduce_func not in ("sum", "mean"):
            raise ValueError(f"reduce function not supported: {self.reduce_func}")
        agg = edge_aggregate(g, gated, self.reduce_func)
        upd = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                  layers=self.update_net_layers,
                  mid_activation=self.mid_activation, last_activation="none",
                  mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  dropout=self.dropout,
                  name="update_network")(agg + h, mask=g.node_mask,
                                         deterministic=deterministic)
        return upd + h, e_new


class Net3D(nn.Module):
    """Full Net3D model (reference `models/net3d.py:14-81`).

    Consumes `g.edge_dist` (pairwise distances of the complete graph).
    """
    hidden_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    batch_norm: bool = False
    node_wise_output_layers: int = 2
    readout_batchnorm: bool = True
    batch_norm_momentum: float = 0.1
    reduce_func: str = "sum"
    dropout: float = 0.0
    propagation_depth: int = 4
    readout_layers: int = 2
    readout_hidden_dim: Optional[int] = None
    fourier_encodings: int = 0
    activation: str = "SiLU"
    update_net_layers: int = 2
    message_net_layers: int = 2
    use_node_features: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True,
                 return_nodes: bool = False):
        N = g.num_nodes
        if self.use_node_features:
            h = AtomEncoder(self.hidden_dim, name="atom_encoder")(g.node_feat)
        else:
            node_embedding = self.param("node_embedding",
                                        nn.initializers.normal(1.0),
                                        (self.hidden_dim,))
            h = jnp.broadcast_to(node_embedding[None, :], (N, self.hidden_dim))

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
        e = jax.nn.silu(e)  # reference applies F.silu AGAIN on top (net3d.py:81)

        for i in range(self.propagation_depth):
            h, e = Net3DLayer(hidden_dim=self.hidden_dim,
                              batch_norm=self.batch_norm,
                              batch_norm_momentum=self.batch_norm_momentum,
                              dropout=self.dropout, mid_activation=self.activation,
                              reduce_func=self.reduce_func,
                              message_net_layers=self.message_net_layers,
                              update_net_layers=self.update_net_layers,
                              name=f"mp_{i}")(g, h, e, deterministic=deterministic)

        if self.node_wise_output_layers > 0:
            h = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                    layers=self.node_wise_output_layers,
                    mid_activation=self.activation, last_activation="none",
                    mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                    batch_norm_momentum=self.batch_norm_momentum,
                    dropout=self.dropout,
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


def _dense_readout(h: jnp.ndarray, node_mask: jnp.ndarray,
                   aggregators: Sequence[str],
                   sizes: jnp.ndarray) -> jnp.ndarray:
    """graph_readout over a dense [G, n, D] node tensor (padding masked)."""
    m = node_mask[..., None]
    hz = jnp.where(m, h, 0.0)
    big = jnp.asarray(jnp.finfo(h.dtype).max, h.dtype)
    has = (sizes > 0)[:, None]
    outs = []
    for a in aggregators:
        if a == "sum":
            outs.append(hz.sum(axis=1))
        elif a == "mean":
            outs.append(hz.sum(axis=1) /
                        jnp.maximum(sizes, 1).astype(h.dtype)[:, None])
        elif a == "max":
            outs.append(jnp.where(has, jnp.where(m, h, -big).max(axis=1), 0.0))
        elif a == "min":
            outs.append(jnp.where(has, jnp.where(m, h, big).min(axis=1), 0.0))
        else:
            raise ValueError(f"unknown readout aggregator: {a}")
    return jnp.concatenate(outs, axis=-1)


class Net3DDenseLayer(nn.Module):
    """Net3DLayer math on dense [G, n, n, D] edge state (same submodule
    names as Net3DLayer, so parameters are interchangeable)."""
    hidden_dim: int
    batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    dropout: float = 0.0
    mid_activation: str = "SiLU"
    reduce_func: str = "sum"
    message_net_layers: int = 2
    update_net_layers: int = 2

    @nn.compact
    def __call__(self, h, e, emask, node_mask, deg, deterministic=True):
        G, n, D = h.shape
        # concat-free SplitDense parts (same trick as the flat Net3DLayer):
        # the src/dst blocks of the first Dense are computed in NODE space
        # [G, n, D] and broadcast into the edge grid by the add — the
        # [G, n, n, 3D] concat (and its 128-lane padding) never exists
        z = [h[:, :, None, :], h[:, None, :, :], e]
        message = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                      layers=self.message_net_layers,
                      mid_activation=self.mid_activation,
                      last_activation=self.mid_activation,
                      mid_batch_norm=self.batch_norm,
                      last_batch_norm=self.batch_norm,
                      batch_norm_momentum=self.batch_norm_momentum,
                      dropout=self.dropout,
                      name="message_network")(z, mask=emask,
                                              deterministic=deterministic)
        e_new = e + message
        gate = jax.nn.sigmoid(nn.Dense(1, name="soft_edge_network")(message))
        gated = jnp.where(emask[..., None], message * gate, 0.0)
        agg = gated.sum(axis=1)                                # over senders
        if self.reduce_func == "mean":
            agg = agg / jnp.maximum(deg, 1.0)[..., None]
        elif self.reduce_func != "sum":
            raise ValueError(f"reduce function not supported: {self.reduce_func}")
        upd = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                  layers=self.update_net_layers,
                  mid_activation=self.mid_activation, last_activation="none",
                  mid_batch_norm=self.batch_norm,
                  last_batch_norm=self.batch_norm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  dropout=self.dropout,
                  name="update_network")(agg + h, mask=node_mask,
                                         deterministic=deterministic)
        return upd + h, e_new


class Net3DDense(nn.Module):
    """Net3D on the dense per-graph complete-graph layout [G, n_max, ...].

    Math- and parameter-identical to :class:`Net3D` (same submodule names, so
    checkpoints transfer both ways); the edge set of a complete graph is a
    dense [n, n] minus the diagonal, so every gather/scatter of the flat path
    becomes a broadcast/masked-reduce — pure MXU/VPU work.  Measured on v5e
    this removes the three row-serialized XLA scatters (~3.6 ms/step at
    batch 500) the flat path pays per layer step.

    Consumes a `DenseGraphBatch` with `coords` (distances computed in-model)
    or `extras['edge_dist']` [G, n, n].
    """
    hidden_dim: int
    target_dim: int
    readout_aggregators: Sequence[str]
    batch_norm: bool = False
    node_wise_output_layers: int = 2
    readout_batchnorm: bool = True
    batch_norm_momentum: float = 0.1
    reduce_func: str = "sum"
    dropout: float = 0.0
    propagation_depth: int = 4
    readout_layers: int = 2
    readout_hidden_dim: Optional[int] = None
    fourier_encodings: int = 0
    activation: str = "SiLU"
    update_net_layers: int = 2
    message_net_layers: int = 2
    use_node_features: bool = False

    @nn.compact
    def __call__(self, g, deterministic: bool = True,
                 return_nodes: bool = False):
        G, n = g.node_feat.shape[:2]
        node_mask = g.node_mask
        sizes = node_mask.sum(axis=1)
        eye = np.eye(n, dtype=bool)[None]
        emask = (node_mask[:, :, None] & node_mask[:, None, :]) & ~eye

        if self.use_node_features:
            h = AtomEncoder(self.hidden_dim, name="atom_encoder")(
                g.node_feat.reshape(G * n, -1)).reshape(G, n, self.hidden_dim)
        else:
            node_embedding = self.param("node_embedding",
                                        nn.initializers.normal(1.0),
                                        (self.hidden_dim,))
            h = jnp.broadcast_to(node_embedding[None, None, :],
                                 (G, n, self.hidden_dim))

        d = g.extras.get("edge_dist")
        if d is None:
            diff = g.coords[:, :, None, :] - g.coords[:, None, :, :]
            # keep sqrt off exact zeros (diagonal/padding): NaN-free gradients
            d2 = (diff * diff).sum(-1)
            d = jnp.sqrt(jnp.where(emask, d2, 1.0))
        d = d[..., None]
        if self.fourier_encodings > 0:
            d = fourier_encode_dist(d[..., 0],
                                    num_encodings=self.fourier_encodings)
        e = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim, layers=1,
                mid_activation=self.activation, last_activation=self.activation,
                mid_batch_norm=self.batch_norm, last_batch_norm=self.batch_norm,
                batch_norm_momentum=self.batch_norm_momentum,
                dropout=self.dropout,
                name="edge_input")(d, mask=emask, deterministic=deterministic)
        e = jax.nn.silu(e)  # extra silu quirk preserved (net3d.py:81)

        if self.reduce_func not in ("sum", "mean"):
            raise ValueError(f"reduce function not supported: {self.reduce_func}")
        deg = emask.sum(axis=1).astype(e.dtype)                # [G, n] in-deg

        for i in range(self.propagation_depth):
            h, e = Net3DDenseLayer(hidden_dim=self.hidden_dim,
                                   batch_norm=self.batch_norm,
                                   batch_norm_momentum=self.batch_norm_momentum,
                                   dropout=self.dropout,
                                   mid_activation=self.activation,
                                   reduce_func=self.reduce_func,
                                   message_net_layers=self.message_net_layers,
                                   update_net_layers=self.update_net_layers,
                                   name=f"mp_{i}")(
                h, e, emask, node_mask, deg, deterministic=deterministic)

        if self.node_wise_output_layers > 0:
            h = MLP(out_dim=self.hidden_dim, hidden_size=self.hidden_dim,
                    layers=self.node_wise_output_layers,
                    mid_activation=self.activation, last_activation="none",
                    mid_batch_norm=self.batch_norm,
                    last_batch_norm=self.batch_norm,
                    batch_norm_momentum=self.batch_norm_momentum,
                    dropout=self.dropout,
                    name="node_wise_output_network")(
                h, mask=node_mask, deterministic=deterministic)

        readout = _dense_readout(h, node_mask, self.readout_aggregators, sizes)
        rh = self.readout_hidden_dim or self.hidden_dim
        out = MLP(out_dim=self.target_dim, hidden_size=rh,
                  layers=self.readout_layers,
                  mid_batch_norm=self.readout_batchnorm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  name="output")(readout, mask=g.extras.get("graph_mask"),
                                 deterministic=deterministic)
        if return_nodes:
            return out, h
        return out
