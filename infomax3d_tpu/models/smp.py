"""SMP — spherical message passing (SphereNet/DimeNet++-style 3D encoder),
reference `models/spherical_message_passing.py:24-285`.

TPU-native design: the geometry (radius graph, triplets, angles, min-dihedral
torsions) is precomputed host-side into padded index arrays
(`data/smp_featurize.py`); the model evaluates the Bessel/spherical-harmonic
bases numerically in-jit (`ops/spherical.py`) and reduces with segment ops.

The batch is a `GraphBatch` whose edges are the radius graph (edge_dist set)
plus triplet arrays in `extras`: angle [T], torsion [T], idx_kj [T],
idx_ji [T], tri_mask [T].
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import AtomEncoder
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.segment import segment_sum
from infomax3d_tpu.ops.spherical import angle_emb, dist_emb, torsion_emb


def glorot_orthogonal(scale: float = 2.0):
    """PyG glorot_orthogonal: orthogonal then rescaled so that
    var(W) = scale / (fan_in + fan_out)."""
    def init(key, shape, dtype=jnp.float32):
        w = jax.nn.initializers.orthogonal()(key, shape, dtype)
        fan_in, fan_out = shape[0], shape[1]
        target = scale / (fan_in + fan_out)
        w = w * jnp.sqrt(target / jnp.maximum(jnp.var(w), 1e-12))
        return w
    return init


def _dense(out, bias=True, name=None):
    return nn.Dense(out, use_bias=bias, kernel_init=glorot_orthogonal(2.0),
                    bias_init=nn.initializers.zeros, name=name)


class ResidualLayer(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.swish(_dense(self.hidden, name="lin1")(x))
        return x + jax.nn.swish(_dense(self.hidden, name="lin2")(h))


class SMPInit(nn.Module):
    num_radial: int
    hidden: int
    use_node_features: bool = True

    @nn.compact
    def __call__(self, g: GraphBatch, rbf):
        N = g.num_nodes
        if self.use_node_features:
            x = AtomEncoder(self.hidden, name="emb")(g.node_feat)
        else:
            emb = self.param("node_embedding", nn.initializers.normal(1.0),
                             (self.hidden,))
            x = jnp.broadcast_to(emb[None, :], (N, self.hidden))
        from infomax3d_tpu.models.base import SplitDense
        rbf0 = jax.nn.swish(_dense(self.hidden, name="lin_rbf_0")(rbf))
        # concat-free: the x_i/x_j kernel blocks project in node space and
        # gather per radius edge (same parameter tree as the fused Dense)
        e1 = jax.nn.swish(SplitDense(
            self.hidden, kernel_init=glorot_orthogonal(2.0),
            bias_init=nn.initializers.zeros,
            name="lin")([(x, g.receivers.clip(0, N - 1)),
                         (x, g.senders.clip(0, N - 1)), rbf0]))
        e2 = _dense(self.hidden, bias=False, name="lin_rbf_1")(rbf) * e1
        return e1, e2


class SMPUpdateE(nn.Module):
    hidden: int
    int_emb_size: int
    basis_emb_size: int
    num_spherical: int
    num_radial: int
    num_before_skip: int = 1
    num_after_skip: int = 2

    @nn.compact
    def __call__(self, x1, rbf0, sbf, t, idx_kj, idx_ji, n_edges):
        x_ji = jax.nn.swish(_dense(self.hidden, name="lin_ji")(x1))
        x_kj = jax.nn.swish(_dense(self.hidden, name="lin_kj")(x1))
        rbf = _dense(self.basis_emb_size, bias=False, name="lin_rbf1")(rbf0)
        rbf = _dense(self.hidden, bias=False, name="lin_rbf2")(rbf)
        x_kj = x_kj * rbf
        x_kj = jax.nn.swish(_dense(self.int_emb_size, bias=False,
                                   name="lin_down")(x_kj))
        sbf = _dense(self.basis_emb_size, bias=False, name="lin_sbf1")(sbf)
        sbf = _dense(self.int_emb_size, bias=False, name="lin_sbf2")(sbf)
        E = x_kj.shape[0]
        x_kj = jnp.take(x_kj, idx_kj.clip(0, E - 1), axis=0) * sbf
        tt = _dense(self.basis_emb_size, bias=False, name="lin_t1")(t)
        tt = _dense(self.int_emb_size, bias=False, name="lin_t2")(tt)
        x_kj = x_kj * tt
        x_kj = segment_sum(x_kj, idx_ji, n_edges)
        x_kj = jax.nn.swish(_dense(self.hidden, bias=False, name="lin_up")(x_kj))
        e1 = x_ji + x_kj
        for b in range(self.num_before_skip):
            e1 = ResidualLayer(self.hidden, name=f"res_before_{b}")(e1)
        e1 = jax.nn.swish(_dense(self.hidden, name="lin")(e1)) + x1
        for a in range(self.num_after_skip):
            e1 = ResidualLayer(self.hidden, name=f"res_after_{a}")(e1)
        e2 = _dense(self.hidden, bias=False, name="lin_rbf")(rbf0) * e1
        return e1, e2


class SMPUpdateV(nn.Module):
    hidden: int
    out_emb_size: int
    out_channels: int
    num_output_layers: int = 3
    output_init: str = "GlorotOrthogonal"

    @nn.compact
    def __call__(self, e2, receivers, num_nodes):
        v = segment_sum(e2, receivers, num_nodes)
        v = _dense(self.out_emb_size, name="lin_up")(v)
        for k in range(self.num_output_layers):
            v = jax.nn.swish(_dense(self.out_emb_size, name=f"lins_{k}")(v))
        kern = (nn.initializers.zeros if self.output_init == "zeros"
                else glorot_orthogonal(2.0))
        return nn.Dense(self.out_channels, use_bias=False, kernel_init=kern,
                        name="lin")(v)


@register_model("SMP")
class SMP(nn.Module):
    cutoff: float = 5.0
    propagation_depth: int = 4
    hidden_channels: int = 128
    target_dim: int = 1
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_size: int = 256
    num_spherical: int = 3
    num_radial: int = 6
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    output_init: str = "GlorotOrthogonal"
    use_node_features: bool = True
    energy_and_force: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic=True, return_nodes=False):
        N, E = g.num_nodes, g.num_edges
        # padded edges carry dist 0; the Bessel bases (1/d envelope,
        # sin(x)/x) are NaN there and would poison the shared-frequency
        # gradients even though the rows are masked downstream — pin padding
        # to the cutoff, where the envelope vanishes
        dist = jnp.where(g.edge_mask, g.edge_dist, self.cutoff)
        angle = g.extras["angle"]
        torsion = g.extras["torsion"]
        idx_kj = g.extras["idx_kj"]
        idx_ji = g.extras["idx_ji"]

        freq = self.param("dist_emb_freq",
                          lambda k, s: jnp.arange(1, s[0] + 1) * math.pi,
                          (self.num_radial,))
        rbf0 = dist_emb(dist, freq, self.cutoff, self.envelope_exponent)
        sbf = angle_emb(dist, angle, idx_kj, self.num_spherical,
                        self.num_radial, self.cutoff)
        t = torsion_emb(dist, angle, torsion, idx_kj, self.num_spherical,
                        self.num_radial, self.cutoff)
        # mask padded edges/triplets out of the bases
        rbf0 = jnp.where(g.edge_mask[:, None], rbf0, 0.0)
        tmask = g.extras["tri_mask"][:, None]
        sbf = jnp.where(tmask, sbf, 0.0)
        t = jnp.where(tmask, t, 0.0)

        e1, e2 = SMPInit(self.num_radial, self.hidden_channels,
                         self.use_node_features, name="init_e")(g, rbf0)
        v = SMPUpdateV(self.hidden_channels, self.out_emb_size,
                       self.target_dim, self.num_output_layers,
                       self.output_init, name="init_v")(e2, g.receivers, N)
        u = segment_sum(v, g.node_graph, g.num_graphs)
        for layer in range(self.propagation_depth):
            e1, e2 = SMPUpdateE(self.hidden_channels, self.int_emb_size,
                                self.basis_emb_size, self.num_spherical,
                                self.num_radial, self.num_before_skip,
                                self.num_after_skip,
                                name=f"update_e_{layer}")(
                e1, rbf0, sbf, t, idx_kj, idx_ji, E)
            v = SMPUpdateV(self.hidden_channels, self.out_emb_size,
                           self.target_dim, self.num_output_layers,
                           self.output_init,
                           name=f"update_v_{layer}")(e2, g.receivers, N)
            u = u + segment_sum(v, g.node_graph, g.num_graphs)
        if return_nodes:
            return u, v
        return u
