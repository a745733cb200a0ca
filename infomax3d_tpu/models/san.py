"""SAN — Spectral Attention Network graph transformer
(reference `models/san.py:78-334`).

TPU-native re-design: the reference materializes a complete graph with
real/fake edge ids and runs sparse send/recv softmax; here the real-vs-fake
two-channel attention is dense masked attention over [G, n_max, n_max] —
pure MXU, no gather/scatter (SURVEY.md §7 "SAN / complete-graph attention").

Semantics preserved exactly:
  score_real(i<-j) = exp(clamp(sum_d K1_j*Q1_i*E1_ij / sqrt(d), -5, 5)) / (γ+1)
  score_fake(i<-j) = γ * exp(clamp(sum_d K2_j*Q2_i*E2_ij / sqrt(d), -5, 5)) / (γ+1)
  h_i = Σ_j score_ij V_j / (Σ_j score_ij + 1e-6),  j != i (no self edges)
with E1 from the real-bond encoder on bond codes and E2 from a separate
fake-bond encoder on the "no-bond" code.

LPE: Laplacian (eigval, eigvec) pairs per node refined by a small Transformer
over the eigenvector axis, nansum-pooled, concatenated to atom embeddings
(reference san.py:309-327).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.graphs.dense import DenseGraphBatch
from infomax3d_tpu.models.attention import TransformerEncoderBlock
from infomax3d_tpu.models.base import (
    FULL_BOND_FEATURE_DIMS, MLP, AtomEncoder, CategoricalFeatureEncoder,
    MaskedBatchNorm,
)
from infomax3d_tpu.models.registry import register_model


class SANAttention(nn.Module):
    gamma: float
    out_dim: int          # per-head dim
    num_heads: int
    full_graph: bool
    use_bias: bool = False

    @nn.compact
    def __call__(self, g: DenseGraphBatch, h, e_real, e_fake):
        G, N, _ = h.shape
        H, hd = self.num_heads, self.out_dim
        dense = lambda name: nn.Dense(hd * H, use_bias=self.use_bias, name=name)

        def heads(x):
            return x.reshape(x.shape[:-1] + (H, hd))

        q1, k1, v = heads(dense("Q")(h)), heads(dense("K")(h)), heads(dense("V")(h))
        e1 = heads(dense("E")(e_real))                       # [G,N,N,H,hd]
        score1 = jnp.einsum("gjhd,gihd->gijhd", k1, q1) / jnp.sqrt(hd)
        score1 = jnp.sum(score1 * e1, axis=-1)               # [G,N,N,H] (i<-j)
        pair = g.pair_mask
        eye = np.eye(N, dtype=bool)[None]
        real = g.real_edge_mask & pair & ~eye
        if self.full_graph:
            q2, k2 = heads(dense("Q_2")(h)), heads(dense("K_2")(h))
            e2 = heads(dense("E_2")(e_fake))
            score2 = jnp.einsum("gjhd,gihd->gijhd", k2, q2) / jnp.sqrt(hd)
            score2 = jnp.sum(score2 * e2, axis=-1)
            fake = pair & ~eye & ~real
            L = self.gamma
            s_real = jnp.exp(jnp.clip(score1, -5, 5)) / (L + 1)
            s_fake = L * jnp.exp(jnp.clip(score2, -5, 5)) / (L + 1)
            soft = jnp.where(real[..., None], s_real,
                             jnp.where(fake[..., None], s_fake, 0.0))
        else:
            soft = jnp.where(real[..., None],
                             jnp.exp(jnp.clip(score1, -5, 5)), 0.0)
        wv = jnp.einsum("gijh,gjhd->gihd", soft, v)           # sum over j
        z = jnp.sum(soft, axis=2)                             # [G,N,H]
        return wv / (z[..., None] + 1e-6)


class GraphTransformerLayer(nn.Module):
    gamma: float
    out_dim: int
    num_heads: int
    full_graph: bool
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    use_bias: bool = False
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: DenseGraphBatch, h, e_real, e_fake, deterministic=True):
        h_in1 = h
        attn = SANAttention(self.gamma, self.out_dim // self.num_heads,
                            self.num_heads, self.full_graph, self.use_bias,
                            name="attention")(g, h, e_real, e_fake)
        G, N = h.shape[:2]
        h = attn.reshape(G, N, self.out_dim)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.out_dim, name="O_h")(h)
        if self.residual and h_in1.shape[-1] == self.out_dim:
            h = h_in1 + h
        if self.layer_norm:
            h = nn.LayerNorm(name="layer_norm1_h")(h)
        if self.batch_norm:
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                name="batch_norm1_h")(
                h, mask=g.node_mask, use_running_average=deterministic)
        h_in2 = h
        z = jax.nn.relu(nn.Dense(self.out_dim * 2, name="FFN_h_layer1")(h))
        if self.dropout > 0:
            z = nn.Dropout(rate=self.dropout, deterministic=deterministic)(z)
        z = nn.Dense(self.out_dim, name="FFN_h_layer2")(z)
        if self.residual:
            h = h_in2 + z
        else:
            h = z
        if self.layer_norm:
            h = nn.LayerNorm(name="layer_norm2_h")(h)
        if self.batch_norm:
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                name="batch_norm2_h")(
                h, mask=g.node_mask, use_running_average=deterministic)
        return h


class SANNodeLPE(nn.Module):
    """SAN trunk with learned Laplacian PE (reference san.py:278-334)."""
    gamma: float
    full_graph: bool
    GT_hidden_dim: int
    GT_n_heads: int
    GT_out_dim: int
    GT_layers: int
    LPE_n_heads: int
    LPE_layers: int
    LPE_dim: int
    residual: bool = True
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    batch_norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, g: DenseGraphBatch, deterministic=True):
        G, N = g.node_feat.shape[:2]
        h = AtomEncoder(self.GT_hidden_dim - self.LPE_dim,
                        name="embedding_h")(g.node_feat.reshape(G * N, -1))
        h = h.reshape(G, N, -1)
        e_real = CategoricalFeatureEncoder(
            FULL_BOND_FEATURE_DIMS, self.GT_hidden_dim,
            name="embedding_e_real")(g.edge_codes.reshape(G * N * N, -1))
        e_real = e_real.reshape(G, N, N, -1)
        e_fake = CategoricalFeatureEncoder(
            FULL_BOND_FEATURE_DIMS, self.GT_hidden_dim,
            name="embedding_e_fake")(
            jnp.zeros((G * N * N, len(FULL_BOND_FEATURE_DIMS)), jnp.int32))
        e_fake = e_fake.reshape(G, N, N, -1)

        # learned LPE: [G, N, k, 2] -> linear -> transformer over k -> sum pool
        pe = jnp.nan_to_num(g.lap_pe)
        pe = nn.Dense(self.LPE_dim, name="linear_A")(pe)     # [G,N,k,LPE]
        pe = pe.reshape(G * N, pe.shape[2], self.LPE_dim)
        pe_mask = g.lap_pe_mask.reshape(G * N, -1)
        for i in range(self.LPE_layers):
            pe = TransformerEncoderBlock(
                self.LPE_dim, self.LPE_n_heads, dim_feedforward=2048,
                dropout=0.0, name=f"PE_Transformer_{i}")(
                pe, pe_mask, deterministic=deterministic)
        pe = jnp.where(pe_mask[..., None], pe, 0.0).sum(axis=1)   # nansum pool
        h = jnp.concatenate([h, pe.reshape(G, N, self.LPE_dim)], axis=-1)
        if self.in_feat_dropout > 0:
            h = nn.Dropout(rate=self.in_feat_dropout,
                           deterministic=deterministic)(h)
        for i in range(self.GT_layers - 1):
            h = GraphTransformerLayer(
                self.gamma, self.GT_hidden_dim, self.GT_n_heads,
                self.full_graph, self.dropout, self.layer_norm,
                self.batch_norm, self.residual,
                batch_norm_momentum=self.batch_norm_momentum,
                name=f"layer_{i}")(g, h, e_real, e_fake,
                                   deterministic=deterministic)
        h = GraphTransformerLayer(
            self.gamma, self.GT_out_dim, self.GT_n_heads, self.full_graph,
            self.dropout, self.layer_norm, self.batch_norm, self.residual,
            batch_norm_momentum=self.batch_norm_momentum,
            name=f"layer_{self.GT_layers - 1}")(g, h, e_real, e_fake,
                                                deterministic=deterministic)
        return h


@register_model("SAN")
class SAN(nn.Module):
    GT_out_dim: int
    readout_hidden_dim: int
    readout_aggregators: Sequence[str]
    target_dim: int
    readout_layers: int = 2
    readout_batchnorm: bool = True
    batch_norm_momentum: float = 0.1
    # trunk params
    gamma: float = 1e-5
    full_graph: bool = True
    GT_hidden_dim: int = 64
    GT_n_heads: int = 8
    GT_layers: int = 4
    LPE_n_heads: int = 4
    LPE_layers: int = 2
    LPE_dim: int = 8
    residual: bool = True
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True

    @nn.compact
    def __call__(self, g: DenseGraphBatch, deterministic=True,
                 return_nodes=False):
        h = SANNodeLPE(gamma=self.gamma, full_graph=self.full_graph,
                       GT_hidden_dim=self.GT_hidden_dim,
                       GT_n_heads=self.GT_n_heads, GT_out_dim=self.GT_out_dim,
                       GT_layers=self.GT_layers, LPE_n_heads=self.LPE_n_heads,
                       LPE_layers=self.LPE_layers, LPE_dim=self.LPE_dim,
                       residual=self.residual,
                       in_feat_dropout=self.in_feat_dropout,
                       dropout=self.dropout, layer_norm=self.layer_norm,
                       batch_norm=self.batch_norm,
                       batch_norm_momentum=self.batch_norm_momentum,
                       name="gnn")(g, deterministic=deterministic)
        m = g.node_mask[..., None]
        outs = []
        for a in self.readout_aggregators:
            if a == "sum":
                outs.append(jnp.sum(jnp.where(m, h, 0.0), axis=1))
            elif a == "mean":
                outs.append(jnp.sum(jnp.where(m, h, 0.0), axis=1) /
                            jnp.maximum(m.sum(axis=1), 1.0))
            elif a == "max":
                outs.append(jnp.where(
                    m.any(axis=1), jnp.max(jnp.where(m, h, -jnp.inf), axis=1), 0.0))
            elif a == "min":
                outs.append(jnp.where(
                    m.any(axis=1), jnp.min(jnp.where(m, h, jnp.inf), axis=1), 0.0))
            else:
                raise ValueError(f"unknown readout {a}")
        readout = jnp.concatenate(outs, axis=-1)
        out = MLP(out_dim=self.target_dim, hidden_size=self.readout_hidden_dim,
                  layers=self.readout_layers,
                  mid_batch_norm=self.readout_batchnorm,
                  batch_norm_momentum=self.batch_norm_momentum,
                  name="output")(readout, mask=g.extras.get("graph_mask"),
                                 deterministic=deterministic)
        if return_nodes:
            return out, h
        return out
