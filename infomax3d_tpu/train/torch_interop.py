"""Torch-checkpoint interop: load reference `.pt` checkpoints into flax trees.

The reference's headline workflow fine-tunes from a published torch
checkpoint (`/root/reference/train.py:207-231`; payload written by
`/root/reference/trainer/trainer.py:252-280` —
``{'model_state_dict', 'model3d_state_dict', 'optimizer_state_dict', ...}``).
This module maps those torch ``state_dict`` keys onto this framework's flax
parameter/batch-stats trees so ``pretrain_checkpoint: *.pt`` drives transfer
learning directly.

Approach: the FLAX tree is the template.  For every flax leaf path we
*generate* the corresponding torch key by component-wise name translation
(the same correspondence the golden-parity tests encode by construction,
``tests/test_layer_golden.py::copy_mlp``), look it up in the state_dict, and
adapt the layout (torch ``Linear.weight`` is ``[out, in]``; flax ``kernel``
is ``[in, out]``).  Unmatched leaves on either side are reported, never
silently dropped.

Name translation (flax component -> torch component):

====================  =======================================
``mp_{i}``            ``mp_layers.{i}``        (PNAGNN / Net3D)
``conv_{i}``          ``convs.{i}``            (OGBGNN GNN_node)
``batch_norm_{i}``    ``batch_norms.{i}``      (OGBGNN GNN_node)
``FCLayer_{i}``       ``fully_connected.{i}``  (MLP)
``Dense_0/kernel``    ``linear.weight``:sup:`T` (FCLayer)
``MaskedBatchNorm_0`` ``batch_norm``           (FCLayer; scale->weight,
                      mean/var -> running_mean/running_var)
``encoder/emb_{i}``   ``atom|bond_embedding_list.{i}.weight``
``<dense>/kernel``    ``<dense>.weight``:sup:`T` (bare nn.Dense modules)
====================  =======================================
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def is_torch_checkpoint(path: str) -> bool:
    """True when `path` is a torch pickle (zipfile-based or legacy magic),
    False for flax msgpack checkpoints."""
    with open(path, "rb") as f:
        head = f.read(8)
    # torch >=1.6 saves a zip archive ("PK\x03\x04"); legacy torch pickles
    # start with pickle protocol 2 opcodes (\x80\x02).
    return head[:4] == b"PK\x03\x04" or head[:2] == b"\x80\x02"


def load_torch_payload(path: str) -> Dict[str, Any]:
    """torch.load the reference checkpoint payload on CPU, tensors -> numpy."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(v):
        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
        return v

    out = {}
    for k, v in payload.items():
        if isinstance(v, Mapping) and k.endswith("state_dict") and \
                "optimizer" not in k and "scheduler" not in k:
            out[k] = {kk: to_np(vv) for kk, vv in v.items()}
        else:
            out[k] = v
    return out


def _torch_key_candidates(path: Tuple[str, ...], collection: str):
    """Generate candidate torch state_dict keys for one flax leaf path.

    `collection` is 'params' or 'batch_stats'; yields (key, transform) where
    transform adapts the numpy array layout (None = identity).
    """
    comps = list(path)
    leaf = comps[-1]
    mods = comps[:-1]

    def xlate(c: str) -> str:
        if c.startswith("mp_") and c[3:].isdigit():
            return f"mp_layers.{c[3:]}"
        if c.startswith("conv_") and c[5:].isdigit():
            return f"convs.{c[5:]}"
        if c.startswith("batch_norm_") and c[11:].isdigit():
            return f"batch_norms.{c[11:]}"
        if c.startswith("FCLayer_"):
            return f"fully_connected.{c[8:]}"
        if c.startswith("lstm_") and c[5:].isdigit():
            return f"lstm.{c[5:]}"
        return c

    mods_t = [xlate(c) for c in mods]

    # embedding tables: .../atom_encoder/encoder/emb_{i} -> the reference
    # wraps the per-column Embeddings in atom/bond_embedding_list
    if leaf.startswith("emb_") and mods and mods[-1] == "encoder":
        i = leaf[4:]
        kind = "atom" if any("atom" in c for c in mods) else "bond"
        base = ".".join(mods_t[:-1])  # drop the 'encoder' wrapper level
        prefix = f"{base}." if base else ""
        yield f"{prefix}{kind}_embedding_list.{i}.weight", None
        return

    prefix = ".".join(mods_t)
    prefix = f"{prefix}." if prefix else ""

    # Context-dependent torch attributes for flax auto-numbered submodules.
    # Candidates are exact-key lookups with a shape check, so yielding every
    # plausible context is safe — only the real one matches:
    #  - FCLayer: Dense_0 -> `linear`, MaskedBatchNorm_0 -> `batch_norm`
    #  - GINConv (reference models/gin.py:92-96): mlp = Sequential(Linear,
    #    BatchNorm1d, ReLU, Linear) -> Dense_0/MaskedBatchNorm_0/Dense_1
    #    map to mlp.0 / mlp.1 / mlp.3
    #  - GNN_node_Virtualnode (models/gin.py:259-263): per-layer Sequential
    #    (Linear, BN, ReLU, Linear, BN, ReLU) -> flax Dense_{2k+j} maps to
    #    mlp_virtualnode_list.{k}.{0|3}, MaskedBatchNorm_{2k+j} to .{1|4}
    #  - OGBGNN attention pooling (models/gin.py:57-61): gate_nn =
    #    Sequential(Linear, BN, ReLU, Linear) under `pool`
    def _dense_attrs(i: int):
        yield "linear"                                     # FCLayer
        if i <= 1:
            yield f"mlp.{0 if i == 0 else 3}"              # GINConv
            yield f"pool.gate_nn.{0 if i == 0 else 3}"     # attention pool
        yield f"mlp_virtualnode_list.{i // 2}.{0 if i % 2 == 0 else 3}"

    def _bn_attrs(i: int):
        yield "batch_norm"                                 # FCLayer
        if i == 0:
            yield "mlp.1"                                  # GINConv
            yield "pool.gate_nn.1"                         # attention pool
        yield f"mlp_virtualnode_list.{i // 2}.{1 if i % 2 == 0 else 4}"

    def _idx(name: str, stem: str):
        if name.startswith(stem) and name[len(stem):].isdigit():
            return int(name[len(stem):])
        return None

    if collection == "batch_stats":
        # MaskedBatchNorm_{i} stats sit on the context module's BN attribute;
        # a bare MaskedBatchNorm maps to the module name itself
        name = {"mean": "running_mean", "var": "running_var"}.get(leaf)
        if name is None:
            return
        i = _idx(mods_t[-1], "MaskedBatchNorm_") if mods_t else None
        if i is not None:
            base = ".".join(mods_t[:-1])
            base = f"{base}." if base else ""
            for attr in _bn_attrs(i):
                yield f"{base}{attr}.{name}", None
        else:
            yield f"{prefix}{name}", None
        return

    i = _idx(mods_t[-1], "Dense_") if mods_t else None
    if i is not None:
        base = ".".join(mods_t[:-1])
        base = f"{base}." if base else ""
        for attr in _dense_attrs(i):
            if leaf == "kernel":
                yield f"{base}{attr}.weight", np.transpose
            elif leaf == "bias":
                yield f"{base}{attr}.bias", None
        return

    i = _idx(mods_t[-1], "MaskedBatchNorm_") if mods_t else None
    if i is not None:
        base = ".".join(mods_t[:-1])
        base = f"{base}." if base else ""
        for attr in _bn_attrs(i):
            if leaf == "scale":
                yield f"{base}{attr}.weight", None
            elif leaf == "bias":
                yield f"{base}{attr}.bias", None
        return

    if leaf in ("root_emb", "virtualnode_embedding"):
        # nn.Embedding(1, D) parameters (GCNConv's root_emb, the virtual
        # node's embedding): torch stores `<name>.weight` [1, D]; our flax
        # param is [D] (_adapt reshapes)
        yield f"{prefix}{leaf}.weight", None
        return

    if leaf == "kernel":
        yield f"{prefix[:-1]}.weight" if prefix else "weight", np.transpose
        return
    if leaf == "scale":
        yield f"{prefix[:-1]}.weight" if prefix else "weight", None
        return
    if leaf == "bias":
        yield f"{prefix[:-1]}.bias" if prefix else "bias", None
        return
    # bare parameters (e.g. Net3D's node_embedding, GIN's eps)
    yield f"{prefix}{leaf}", None


def _adapt(value: np.ndarray, transform, want_shape) -> Optional[np.ndarray]:
    v = np.asarray(value)
    if transform is not None:
        v = transform(v)
    if tuple(v.shape) == tuple(want_shape):
        # OWNED copy, never a view: `tensor.detach().numpy()` shares storage
        # with the live torch tensor, and jnp.asarray on the CPU backend
        # zero-copies numpy — without this, a torch `optim.step()` after
        # conversion would silently mutate the "converted" flax parameters
        return v.copy()
    # squeeze torch [1, D] buffers onto flax [D] params (Net3D node_embedding)
    if v.size == int(np.prod(want_shape)):
        return v.reshape(want_shape).copy()
    return None


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       template_params: Dict[Tuple[str, ...], Any],
                       template_stats: Dict[Tuple[str, ...], Any],
                       verbose: bool = False):
    """Map a (already root-renamed) torch state_dict onto flat flax dicts.

    `template_params` / `template_stats` are *flat* dicts (tuple path ->
    array) as produced by `flax.traverse_util.flatten_dict`; returns
    (flat_params, flat_stats, report) where the flat outputs contain ONLY
    the matched leaves (callers overlay them subject to transfer filters)
    and report = {'matched': int, 'missing': [flax paths], 'unused':
    [torch keys]}.
    """
    used = set()
    out_p: Dict[Tuple[str, ...], np.ndarray] = {}
    out_s: Dict[Tuple[str, ...], np.ndarray] = {}
    missing = []
    for collection, template, out in (("params", template_params, out_p),
                                      ("batch_stats", template_stats, out_s)):
        for path, tmpl in template.items():
            hit = False
            for key, transform in _torch_key_candidates(path, collection):
                if key in state_dict:
                    v = _adapt(state_dict[key], transform,
                               np.shape(tmpl))
                    if v is not None:
                        out[path] = v
                        used.add(key)
                        hit = True
                        break
            if not hit:
                missing.append((collection,) + path)
    unused = [k for k in state_dict
              if k not in used and "num_batches_tracked" not in k]
    report = {"matched": len(out_p) + len(out_s), "missing": missing,
              "unused": unused}
    if verbose:
        print(f"torch->flax: matched {report['matched']} tensors, "
              f"{len(missing)} flax leaves unmatched, "
              f"{len(unused)} torch keys unused")
    return out_p, out_s, report


def rename_torch_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The reference's transfer renames (train.py:216-226), applied on torch
    key strings: strip BYOL 'student.' prefixes, root-anchored 'gnn.'/'gnn2.'
    -> 'node_gnn.'."""
    out = {}
    for k, v in sd.items():
        if k.startswith("student."):
            k = k[len("student."):]
        if k.startswith("gnn.") or k.startswith("gnn2."):
            k = "node_gnn." + k.split(".", 1)[1]
        out[k] = v
    return out
