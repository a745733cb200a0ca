"""Shared model building blocks (reference `models/base_layers.py`,
`commons/mol_encoder.py`) as flax.linen modules.

Critical TPU-specific difference from the reference: batches are padded to
static shapes, so BatchNorm statistics MUST exclude padding rows
(`MaskedBatchNorm`) or parity with the reference breaks (SURVEY.md §7
"Masked BatchNorm parity").  Running-stat semantics follow torch:
``running = (1 - momentum) * running + momentum * batch_stat`` with the
*unbiased* batch variance entering the running estimate and the *biased*
variance used for normalization.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Union

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

# Activation registry — replaces reference get_activation (models/base_layers.py:9-20).
ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "softplus": jax.nn.softplus,
    "silu": jax.nn.silu,
    "glu": lambda x: jax.nn.glu(x, axis=-1),
    "gelu": jax.nn.gelu,
    "none": lambda x: x,
}


def get_activation(act: Union[str, Callable, None]) -> Callable:
    if act is None:
        return ACTIVATIONS["none"]
    if callable(act):
        return act
    key = act.lower()
    if key not in ACTIVATIONS:
        raise ValueError(f"unsupported activation: {act}")
    return ACTIVATIONS[key]


def scaled_xavier_uniform(gain_from_fan_in: bool = True):
    """torch ``xavier_uniform_(w, gain=1/in_dim)`` — the reference FCLayer init
    (models/base_layers.py:93-98).  Bound = gain * sqrt(6 / (fan_in + fan_out))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        gain = (1.0 / fan_in) if gain_from_fan_in else 1.0
        bound = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def xavier_uniform_embedding(key, shape, dtype=jnp.float32):
    """torch ``xavier_uniform_`` on an embedding table (commons/mol_encoder.py:27)."""
    fan_in, fan_out = shape[0], shape[1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the row axis with padding rows excluded from statistics.

    torch semantics (nn.BatchNorm1d): normalize with biased batch variance,
    update running stats with unbiased variance; running = (1-m)*running +
    m*batch.  `mask=None` behaves like plain BatchNorm.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    affine_out: bool = False   # return (a, b) with y == x*a + b (see below)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 use_running_average: bool = False) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            from infomax3d_tpu.parallel.context import (
                cross_replica_axis, edge_partition_axis, node_partition_axis)
            axis = cross_replica_axis()
            # under edge partitioning, edge-space rows are split over the
            # graph axis: complete their statistics there too.  For
            # node-space rows (replicated over that axis) this inflates
            # count and sums by the same factor, so mean/var — and hence the
            # normalized output — are unchanged; only the unbiased-var
            # count/(count-1) correction of the RUNNING stats shifts by
            # O(1/count), which is below bf16 resolution.
            e_axis = edge_partition_axis()
            if e_axis is not None:
                axis = (axis, e_axis) if axis is not None else e_axis
            # under node partitioning BOTH node- and edge-space rows are
            # genuinely split over the axis — completion is simply correct
            n_axis = node_partition_axis()
            if n_axis is not None:
                axis = ((axis, n_axis) if isinstance(axis, str)
                        else (*axis, n_axis) if axis is not None else n_axis)
            xf = x.astype(jnp.float32)
            red = tuple(range(xf.ndim - 1))
            if mask is not None:
                m = mask.astype(jnp.float32)
                while m.ndim < xf.ndim:
                    m = m[..., None]
                count = m.sum()
                s1 = (xf * m).sum(axis=red)
                s2 = (xf * xf * m).sum(axis=red)
            else:
                count = jnp.asarray(x.size / features, jnp.float32)
                s1 = xf.sum(axis=red)
                s2 = (xf * xf).sum(axis=red)
            if axis is not None:
                # data-parallel: statistics over the GLOBAL batch (parity with
                # single-device training)
                count = jax.lax.psum(count, axis)
                s1 = jax.lax.psum(s1, axis)
                s2 = jax.lax.psum(s2, axis)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        if self.affine_out:
            # lazy apply: return the per-column affine (a, b) with
            # y == x * a + b — the caller folds it into the NEXT matmul's
            # [D, F] weights (AffinePart), so the normalized [rows, D]
            # tensor never hits HBM.  Running-stats updates above are
            # identical to the materializing path.
            a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
            b = bias.astype(jnp.float32) - mean * a
            return a, b
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        # normalize in f32 (stats precision), return in the network's compute
        # dtype so bf16 mode stays bf16 across BN boundaries
        return (y * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(x.dtype)


class GatherPart(NamedTuple):
    """Lazy ``take(nodes, idx)`` SplitDense input: project in NODE space then
    gather (``take(nodes @ K) == take(nodes) @ K``).  `row_ptr` (CSR, for
    receiver-sorted idx) switches the backward to the scatter-free
    `sorted_segment_sum`; `indices_sorted` alone just passes the sorted hint
    to the scatter (ops/segment.py::take_rows)."""
    nodes: jnp.ndarray
    idx: jnp.ndarray
    indices_sorted: bool = False
    row_ptr: Optional[jnp.ndarray] = None
    perm: Optional[jnp.ndarray] = None
    max_deg: int = 0        # static; >0 enables the Pallas seg-sum backward
    tile_win: int = 0       # static compacted window (batcher-measured)
    cmb_span: int = 0       # static; >0 enables the fused edge-combine
                            # kernel when a src+dst GatherPart pair meets
                            # in one SplitDense (csr_cmb_span marker)
    snd_base: Optional[jnp.ndarray] = None  # per-node-tile csr window base
    snd_win: int = 0        # static; >0 enables the sender-keyed seg-sum
                            # backward (no csc permutation gather)


class ScaledPart(NamedTuple):
    """Lazy ``row_scale * x`` SplitDense input: row scaling commutes with the
    right-matmul (``diag(s)·X·K == diag(s)·(X·K)``), so PNA degree-scaled
    aggregator blocks are never materialized — y += row_scale * (x @ k)."""
    x: jnp.ndarray
    row_scale: jnp.ndarray  # [N, 1]


class AffinePart(NamedTuple):
    """Lazy column-affine SplitDense input: ``(x*scale + shift) @ k ==
    x @ (scale[:,None]*k) + shift@k`` — a BatchNorm APPLY between two dense
    layers folds into the next matmul's [D, F] weight columns, so the
    normalized [rows, D] tensor never hits HBM (rows is the edge count in
    the PNA pretrans MLP — 58 us/layer of BN-apply fusion on v5e).
    Gradients through scale/shift (and hence the batch mean/var) are exact:
    everything stays plain traced jax ops."""
    x: jnp.ndarray          # pre-BN activations [rows, D]
    scale: jnp.ndarray      # [D] f32
    shift: jnp.ndarray      # [D] f32


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _split_kernel_rows(kernel, dims):
    """Slice `kernel` into row blocks of sizes `dims` with a CONCAT
    backward: AD's per-slice transpose is pad-with-zeros, so the sum over
    parts rewrites the full [in_total, F] buffer once per part (13 padded
    [2600, 200] adds per PNA layer ~ 26 MB of HBM traffic, measured
    31 us/layer on v5e, ~10x the light bound of the 1 MB of real data);
    the blocks are disjoint and cover every row, so the exact gradient is
    simply the concatenation of the block cotangents — one 2 MB pass."""
    out, o = [], 0
    for d in dims:
        out.append(jax.lax.slice_in_dim(kernel, o, o + d, axis=0))
        o += d
    return tuple(out)


def _split_kernel_rows_fwd(kernel, dims):
    return _split_kernel_rows(kernel, dims), None


def _split_kernel_rows_bwd(dims, _, cts):
    return (jnp.concatenate(list(cts), axis=0),)


_split_kernel_rows.defvjp(_split_kernel_rows_fwd, _split_kernel_rows_bwd)


class SplitDense(nn.Module):
    """Drop-in for ``nn.Dense`` applied to a CONCATENATION of parts, without
    materializing the concat: y = sum_i part_i @ kernel[o_i:o_i+d_i] + b.
    Parameter tree ({kernel, bias}) is identical to nn.Dense, so checkpoints
    interchange.  A part may be a plain array, a lazy ``(nodes, idx)`` pair /
    GatherPart (project-then-gather), or a ScaledPart (row-scaled block)."""
    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, parts):
        def _dim(p):
            if isinstance(p, (GatherPart, ScaledPart, AffinePart)):
                return p[0].shape[-1]
            return (p[0] if isinstance(p, tuple) else p).shape[-1]
        in_total = sum(_dim(p) for p in parts)
        kernel = self.param("kernel", self.kernel_init,
                            (in_total, self.features))

        fused = self._try_edge_combine(parts, kernel)
        if fused is not None:
            return fused

        blocks = _split_kernel_rows(kernel, tuple(_dim(p) for p in parts))
        metas = list(zip(parts, blocks))
        # group plain/ScaledPart inputs sharing ONE source array (the PNA
        # posttrans pattern: each aggregator section appears once per
        # scaler): one matmul against the column-concatenated kernel blocks
        # reads the source ONCE for all scalers instead of |scalers| times
        # (HBM-bound at these widths), then the per-row scales weight the
        # column slices
        by_src = {}
        for i, (p, _) in enumerate(metas):
            if isinstance(p, ScaledPart):
                by_src.setdefault(id(p.x), []).append(i)
            elif not isinstance(p, (GatherPart, tuple)):
                by_src.setdefault(id(p), []).append(i)
        y = None
        done = set()
        F = self.features
        for i, (p, k) in enumerate(metas):
            if i in done:
                continue
            if isinstance(p, GatherPart):
                from infomax3d_tpu.ops.segment import take_rows
                t = take_rows(p.nodes @ k, p.idx, p.indices_sorted, p.row_ptr,
                              p.perm, p.max_deg, p.tile_win, p.snd_base,
                              p.snd_win)
            elif isinstance(p, AffinePart):
                # fold the column affine into the weight block: the scaled
                # kernel is [D, F] (tiny), the [rows, D] apply never runs
                kf = (p.scale[:, None].astype(jnp.float32)
                      * k.astype(jnp.float32)).astype(p.x.dtype)
                row = p.shift @ k.astype(jnp.float32)          # [F] f32
                t = (jnp.dot(p.x, kf, preferred_element_type=jnp.float32)
                     + row).astype(p.x.dtype)
            elif isinstance(p, tuple):
                nodes, idx = p
                t = jnp.take(nodes @ k, idx.clip(0, nodes.shape[0] - 1),
                             axis=0)
            else:
                src = p.x if isinstance(p, ScaledPart) else p
                idxs = by_src[id(src)]
                if len(idxs) > 1:
                    wide = src @ jnp.concatenate(
                        [metas[j][1] for j in idxs], axis=1)
                    t = None
                    for slot, j in enumerate(idxs):
                        pj = metas[j][0]
                        yj = wide[:, slot * F:(slot + 1) * F]
                        if isinstance(pj, ScaledPart):
                            yj = pj.row_scale * yj
                        t = yj if t is None else t + yj
                        done.add(j)
                elif isinstance(p, ScaledPart):
                    t = p.row_scale * (p.x @ k)
                else:
                    t = p @ k
            y = t if y is None else y + t
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y

    def _try_edge_combine(self, parts, kernel):
        """Fused path for the message-MLP first layer: a (src, dst)
        GatherPart pair + plain edge arrays becomes ONE Pallas edge-combine
        call (`ops/pallas/spmm.py::csr_edge_combine`) — the two [E, D]
        gather outputs and the add chain never hit HBM.  Value contract:
        identical on real edges; padding edges hold pe (edge-projection +
        bias) instead of clip-gather junk — both are masked everywhere.
        Returns None when the pattern or backend doesn't fit."""
        gps = [p for p in parts if isinstance(p, GatherPart)]
        rest = [p for p in parts
                if not isinstance(p, (GatherPart, ScaledPart, tuple))]
        if (len(gps) != 2 or len(gps) + len(rest) != len(parts)
                or not rest):
            return None
        src = next((p for p in gps if p.perm is not None), None)
        dst = next((p for p in gps if p.perm is None
                    and p.row_ptr is not None), None)
        if src is None or dst is None or src.row_ptr is None:
            return None
        if min(src.cmb_span, dst.cmb_span) <= 0:
            return None
        from infomax3d_tpu.ops.pallas.spmm import (_combine_kernel_ok,
                                                   csr_edge_combine)
        # gate BEFORE creating any param (the main path creates `bias` too —
        # a late bail here would double-create it)
        if not (_combine_kernel_ok(dst.nodes, rest[0], dst.cmb_span)
                and self.features <= 512
                and kernel.dtype == dst.nodes.dtype
                and all(p.dtype == dst.nodes.dtype for p in rest)):
            return None
        o = 0
        slices = {}
        for p in parts:
            d = (p[0] if isinstance(p, (GatherPart, ScaledPart, tuple))
                 else p).shape[-1]
            slices[id(p)] = kernel[o:o + d]
            o += d
        pe = None
        for p in rest:
            t = p @ slices[id(p)]
            pe = t if pe is None else pe + t
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            pe = pe + bias.astype(pe.dtype)
        hd = dst.nodes @ slices[id(dst)]
        hs = src.nodes @ slices[id(src)]
        return csr_edge_combine(
            hd, hs, pe, dst.idx, src.idx, dst.row_ptr, src.row_ptr,
            src.perm, src.snd_base, dst.max_deg, dst.tile_win,
            src.tile_win, dst.cmb_span, False, src.snd_win)


class FCLayer(nn.Module):
    """Dense -> activation -> dropout -> batchnorm (reference FCLayer order,
    models/base_layers.py:100-111).  Accepts a list of input parts (see
    SplitDense) in place of a single array."""
    out_dim: int
    activation: Union[str, Callable, None] = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    bias: bool = True
    lazy_out: bool = False   # batch_norm -> return AffinePart (fold the BN
                             # apply into the consumer's matmul weights)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 use_running_average: Optional[bool] = None):
        if use_running_average is None:
            use_running_average = deterministic
        if isinstance(x, AffinePart):
            x = [x]
        if isinstance(x, (list, tuple)):
            h = SplitDense(self.out_dim, use_bias=self.bias,
                           kernel_init=scaled_xavier_uniform(),
                           bias_init=nn.initializers.zeros,
                           name="Dense_0")(x)
        else:
            h = nn.Dense(self.out_dim, use_bias=self.bias,
                         kernel_init=scaled_xavier_uniform(),
                         bias_init=nn.initializers.zeros)(x)
        h = get_activation(self.activation)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        if self.batch_norm:
            if self.lazy_out:
                a, b = MaskedBatchNorm(momentum=self.batch_norm_momentum,
                                       affine_out=True)(
                    h, mask=mask, use_running_average=use_running_average)
                return AffinePart(h, a, b)
            h = MaskedBatchNorm(momentum=self.batch_norm_momentum)(
                h, mask=mask, use_running_average=use_running_average)
        return h


class MLP(nn.Module):
    """Stack of FCLayers (reference MLP, models/base_layers.py:114-147)."""
    out_dim: int
    layers: int
    hidden_size: Optional[int] = None
    mid_activation: Union[str, Callable] = "relu"
    last_activation: Union[str, Callable, None] = "none"
    dropout: float = 0.0
    mid_batch_norm: bool = False
    last_batch_norm: bool = False
    batch_norm_momentum: float = 0.1
    lazy_out: bool = False   # last BN -> AffinePart for an affine-aware
                             # consumer (e.g. the Pallas stats kernel)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 use_running_average: Optional[bool] = None):
        kw = dict(mask=mask, deterministic=deterministic,
                  use_running_average=use_running_average)
        if self.layers <= 1:
            return FCLayer(self.out_dim, activation=self.last_activation,
                           batch_norm=self.last_batch_norm, dropout=self.dropout,
                           batch_norm_momentum=self.batch_norm_momentum,
                           lazy_out=self.lazy_out)(x, **kw)
        # mid layers emit lazy AffineParts when batch-normed: the BN apply
        # folds into the NEXT FCLayer's matmul weights (see AffinePart)
        h = FCLayer(self.hidden_size, activation=self.mid_activation,
                    batch_norm=self.mid_batch_norm, dropout=self.dropout,
                    batch_norm_momentum=self.batch_norm_momentum,
                    lazy_out=True)(x, **kw)
        for _ in range(self.layers - 2):
            h = FCLayer(self.hidden_size, activation=self.mid_activation,
                        batch_norm=self.mid_batch_norm, dropout=self.dropout,
                        batch_norm_momentum=self.batch_norm_momentum,
                        lazy_out=True)(h, **kw)
        return FCLayer(self.out_dim, activation=self.last_activation,
                       batch_norm=self.last_batch_norm, dropout=self.dropout,
                       batch_norm_momentum=self.batch_norm_momentum,
                       lazy_out=self.lazy_out)(h, **kw)


class MLPReadout(nn.Module):
    """Halving-width readout MLP (reference models/base_layers.py:149-164)."""
    input_dim: int
    output_dim: int
    num_hidden: int = 2  # reference `L`

    @nn.compact
    def __call__(self, x):
        y = x
        for l in range(self.num_hidden):
            y = nn.Dense(self.input_dim // 2 ** (l + 1))(y)
            y = jax.nn.relu(y)
        return nn.Dense(self.output_dim)(y)


# OGB categorical feature vocabulary sizes (ogb.utils.features.get_atom_feature_dims /
# get_bond_feature_dims — hardcoded here; ogb is host-side data prep only).
FULL_ATOM_FEATURE_DIMS = (119, 5, 12, 12, 10, 6, 6, 2, 2)
FULL_BOND_FEATURE_DIMS = (5, 6, 2)


class CategoricalFeatureEncoder(nn.Module):
    """Sum of one embedding table per categorical column (reference
    AtomEncoder/BondEncoder, commons/mol_encoder.py:10-73).

    `padding=True`: code -1 selects a gradient-frozen constant row.  The
    reference (mol_encoder.py:24-27) re-xaviers the whole table AFTER
    constructing Embedding(padding_idx=0), so ITS frozen row is a random
    non-zero vector; here the -1 output is zeroed instead (also frozen,
    since the one-hot row is zeroed).  Equivalent everywhere it's consumed:
    the only padding=True user is the dense EGNN (egnn_torch.py:160), whose
    padded rows are node_mask-excluded downstream.
    """
    feature_dims: Sequence[int]
    emb_dim: int
    padding: bool = False

    @nn.compact
    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:   # codes [N, num_feats] int
        # Multi-hot matmul instead of per-table take: the sum of k lookups is
        # one [N, sum(vocab)] multi-hot times the row-stacked tables.  Forward
        # value-identical to take+add (clip semantics preserved); the payoff
        # is the BACKWARD — dT = multi_hotᵀ @ ct rides the MXU instead of k
        # row-serialized 9-18k-row scatters (~0.11-0.19 ms EACH on v5e).
        tables = []
        vocabs = []
        for i, dim in enumerate(self.feature_dims):
            vocab = dim + 1 if self.padding else dim
            tables.append(self.param(f"emb_{i}", xavier_uniform_embedding,
                                     (vocab, self.emb_dim)))
            vocabs.append(vocab)
        stacked = jnp.concatenate(tables, axis=0)
        total_vocab = sum(vocabs)
        mh = None
        off = 0
        for i, vocab in enumerate(vocabs):
            idx = codes[:, i]
            if self.padding:
                idx = idx + 1
            oh = jax.nn.one_hot(idx.clip(0, vocab - 1) + off, total_vocab,
                                dtype=stacked.dtype)
            if self.padding:
                oh = jnp.where((idx > 0)[:, None], oh, 0.0)
            mh = oh if mh is None else mh + oh
            off += vocab
        return mh @ stacked


class AtomEncoder(nn.Module):
    emb_dim: int
    padding: bool = False

    @nn.compact
    def __call__(self, codes):
        return CategoricalFeatureEncoder(FULL_ATOM_FEATURE_DIMS, self.emb_dim,
                                         self.padding, name="encoder")(codes)


class BondEncoder(nn.Module):
    emb_dim: int
    padding: bool = False

    @nn.compact
    def __call__(self, codes):
        return CategoricalFeatureEncoder(FULL_BOND_FEATURE_DIMS, self.emb_dim,
                                         self.padding, name="encoder")(codes)
