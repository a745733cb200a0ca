"""Tensor parallelism over a `model` mesh axis (SURVEY §2.7 design item).

The reference has no distributed layer at all; at the reference's model
scale (hidden 200) TP is not profitable on real chips, but the axis is
designed in so larger encoders drop in: a `(data, model)` mesh where MLP
kernels are column-sharded over `model` and XLA's GSPMD propagates the
activation shardings and inserts the all-gathers/reduce-scatters.

This is deliberately the jit/GSPMD route, not shard_map: TP is a *layout*
statement (which dim of each weight lives where), and GSPMD derives the
collective program from the layouts — the idiomatic TPU design (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives).  The DP/graph axes keep their explicit shard_map treatment in
`train/trainer.py::_make_parallel_step` because their semantics (per-shard
batch-stat psum, cross-device loss) are contracts, not layouts.

Composition: `tp_shard_params` can be applied to the same param tree the DP
shard_map step consumes — shard_map partitions only the batch arguments,
while params enter replicated over `data` and sharded over `model`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(path: str, value: Any, tp_size: int,
                axis: str = "model") -> P:
    """PartitionSpec for one param leaf.

    2D kernels [in, out] are column-sharded (out split over `axis`) when the
    out dim divides evenly; their biases/BN vectors [out] follow.  Everything
    else (scalars, embedding tables with small rows, odd dims) replicates —
    correctness never depends on a leaf being sharded, GSPMD treats the spec
    as a layout hint.
    """
    shape = getattr(value, "shape", ())
    if len(shape) == 2 and shape[1] % tp_size == 0 and shape[1] >= tp_size:
        return P(None, axis)
    if len(shape) == 1 and shape[0] % tp_size == 0 and shape[0] >= tp_size:
        return P(axis)
    return P()


def tp_shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with column-sharded kernels over `axis`.

    Any jitted function consuming the result inherits the shardings
    (GSPMD propagation) — no changes to model code required.
    """
    tp_size = mesh.shape[axis]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        spec = tp_spec_for(jax.tree_util.keystr(path), leaf, tp_size, axis)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def tp_shard_tree(tree, mesh: Mesh, axis: str = "model"):
    """`tp_shard_params` for ANY param-shaped tree (optimizer moments,
    batch-stats vectors, BYOL teacher copies): every leaf is device_put with
    the shape-derived column sharding, non-array leaves pass through."""
    tp_size = mesh.shape[axis]

    def put(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        spec = tp_spec_for("", leaf, tp_size, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def make_tp_mesh(n_data: int, n_model: int,
                 devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if len(devs) < n_data * n_model:
        raise ValueError(f"need {n_data * n_model} devices, have {len(devs)}")
    arr = np.array(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))
