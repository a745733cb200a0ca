"""Dense padded EGNN (reference `models/egnn_torch.py:7-207`, consumed via
`egnn_padded_collate`).

The torch original does sparse `unsorted_segment_sum` over a full adjacency
edge list; on TPU the same computation is dense masked [G, n, n] tensor work
— attention-free all-pairs messages with coordinate updates (the E(n)-GNN of
Satorras et al.), entirely MXU/VPU friendly.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.dense import DenseGraphBatch
from infomax3d_tpu.models.registry import register_model


class DenseEGCL(nn.Module):
    """One E_GCL layer (egnn_torch.py:7-120) on dense [G, n, ...] tensors."""
    hidden_dim: int
    act: str = "silu"
    residual: bool = True
    attention: bool = False
    coords_weight: float = 1.0

    @nn.compact
    def __call__(self, h, x, pair_mask, deterministic=True):
        G, n, D = h.shape
        act = jax.nn.silu if self.act == "silu" else jax.nn.relu
        diff = x[:, :, None, :] - x[:, None, :, :]             # [G, n, n, 3]
        radial = jnp.sum(diff ** 2, axis=-1, keepdims=True)    # [G, n, n, 1]
        # concat-free: the h_i/h_j blocks of edge_mlp_1 are computed in node
        # space and broadcast into the [G, n, n] grid by the add (SplitDense
        # has nn.Dense's parameter tree, so checkpoints are unchanged)
        from infomax3d_tpu.models.base import SplitDense
        eij = [h[:, :, None, :], h[:, None, :, :], radial]
        m = act(SplitDense(self.hidden_dim, name="edge_mlp_1")(eij))
        m = act(nn.Dense(self.hidden_dim, name="edge_mlp_2")(m))
        if self.attention:
            att = jax.nn.sigmoid(nn.Dense(1, name="att_mlp")(m))
            m = m * att
        m = jnp.where(pair_mask[..., None], m, 0.0)
        agg = m.sum(axis=2)                                    # [G, n, D]
        # coordinate update
        cmlp = act(nn.Dense(self.hidden_dim, name="coord_mlp_1")(m))
        trans = diff * nn.Dense(1, use_bias=False, name="coord_mlp_out")(cmlp)
        trans = jnp.where(pair_mask[..., None], trans, 0.0)
        x = x + trans.sum(axis=2) * self.coords_weight
        # node update
        out = act(SplitDense(self.hidden_dim, name="node_mlp_1")([h, agg]))
        out = nn.Dense(self.hidden_dim, name="node_mlp_2")(out)
        if self.residual:
            out = h + out
        return out, x


@register_model("EGNNTorch")
class DenseEGNN(nn.Module):
    """Full padded-dense EGNN (egnn_torch.py:124-187)."""
    in_node_nf: int
    hidden_dim: int
    target_dim: int
    n_layers: int = 4
    act: str = "silu"
    residual: bool = True
    attention: bool = False
    coords_weight: float = 1.0
    node_attr: bool = False

    @nn.compact
    def __call__(self, g: DenseGraphBatch, deterministic=True):
        G, n = g.node_feat.shape[:2]
        h = nn.Dense(self.hidden_dim, name="embedding")(
            g.node_feat.astype(jnp.float32))
        x = g.coords
        pair = g.pair_mask & ~np.eye(n, dtype=bool)[None]
        for i in range(self.n_layers):
            h, x = DenseEGCL(self.hidden_dim, self.act, self.residual,
                             self.attention, self.coords_weight,
                             name=f"gcl_{i}")(h, x, pair,
                                              deterministic=deterministic)
        h = jnp.where(g.node_mask[..., None], h, 0.0)
        pooled = h.sum(axis=1)                                  # sum pool
        z = jax.nn.silu(nn.Dense(self.hidden_dim, name="node_dec")(pooled))
        return nn.Dense(self.target_dim, name="graph_dec")(z)
