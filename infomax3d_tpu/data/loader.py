"""Host data pipeline: collate registry + bucketed loader.

Replaces the reference's `torch.utils.data.DataLoader` + ~25 collate
functions (`datasets/custom_collate.py`) with a static-shape loader:

* a collate function assembles per-molecule numpy dicts into one or more
  padded `GraphBatch`es for a fixed `BucketSpec` (dict of named views, e.g.
  {"graph2d": ..., "graph3d": ...}),
* the loader shuffles with its own numpy RNG (matching the reference's
  epoch-reshuffled DataLoader), picks the bucket per batch from a ladder,
  and yields device-ready pytrees,
* contrastive collates require FULL batches (the NT-Xent [B,B] math assumes
  every row real), so the loader drops the last partial batch when
  `drop_last`; supervised collates keep it and rely on masks.

Collate names are byte-compatible with the reference YAML
(`collate_function:` key).
"""
from __future__ import annotations

import threading
import queue as queue_mod
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from infomax3d_tpu.graphs.batch import (
    BucketSpec, batch_graphs, pick_bucket, to_graph_batch,
)

COLLATE_REGISTRY: Dict[str, Callable] = {}

# Reference YAML collate names -> canonical registry names.  Several of the
# reference's ~25 collates exist only because torch/DGL needed a different
# host layout per model family (reference datasets/custom_collate.py); our
# GraphBatch already carries what they add (snorm from n_nodes, pos_mask
# from node_graph, flat<->dense exchange inside the hybrid models), so those
# names alias onto the canonical collates that produce the same batches.
COLLATE_ALIASES: Dict[str, str] = {
    "NodeDropCollate": "graphcl_collate",            # custom_collate.py:254-282
    "NodeDrop2dCollate": "graphcl_collate",          # :231-251
    "NodeDrop3dCollate": "node_drop_3d_collate",     # :188-206
    "NodeDrop2d3DCollate": "node_drop_2d3d_collate",  # :208-229
    "NoisedDistancesCollate": "noised_distances_collate",    # :131-152
    "NoisedCoordinatesCollate": "noised_coordinates_collate",  # :160-185
    "pyg_and_dgl_graph_collate": "ot_collate",       # :30-34 (OT trainer)
    "pyg_graph_only_collate": "graph_only_collate",  # :37-40
    "pytorch_geometric_collate": "graph_collate",    # :24-27
    # 'ConformerCollate' exists in no reference module (NameError upstream —
    # configs/contrastive_training_multiple_positives*.yml); evident intent
    # is conformer_collate (custom_collate.py:155-157)
    "ConformerCollate": "conformer_collate",
    "pytorch_geometric2d_contrastive_collate": "contrastive_collate",  # :124-131
    "pytorch_geometric3d_contrastive_collate": "contrastive_collate",  # :117-121
    "contrastive_graphs_with_mask_collate": "contrastive_collate",  # :81-90
    "contrastive_vae_collate": "contrastive_collate_ae",  # :52-62
    "s_norm_graph_collate": "graph_collate",         # :43-49 (snorm in batch)
    "s_norm_contrastive_collate": "contrastive_collate",  # :93-102
    "pna_transformer_collate": "graph_collate",      # :361-370
    "pna_transformer_collate_contrastive": "contrastive_collate",  # :373-382
    "padded_collate": "egnn_padded_collate",         # :285-293
    "egnn_padded_collate3d": "egnn_padded_collate",  # :296-320
    "padded_distances_collate": "pairwise_distance_collate",  # :394-403
}


def register_collate(name):
    def deco(fn):
        COLLATE_REGISTRY[name] = fn
        return fn
    return deco


def get_collate(name: str):
    name = COLLATE_ALIASES.get(name, name)
    if name not in COLLATE_REGISTRY:
        raise KeyError(f"unknown collate_function '{name}'; known: "
                       f"{sorted(COLLATE_REGISTRY)}")
    return COLLATE_REGISTRY[name]


def _pad_targets_nan(arrays: Dict[str, np.ndarray], key: str, g_real: int):
    """Padded target rows become NaN so masked losses ignore them naturally."""
    if key in arrays and np.issubdtype(arrays[key].dtype, np.floating):
        arrays[key][g_real:] = np.nan
    return arrays


@register_collate("graph_collate")
def graph_collate(items: Sequence[Dict], bucket: BucketSpec):
    """dgl.batch + stacked targets (custom_collate.py:12-18)."""
    merged = [dict(it["graph2d"], targets=it["targets"]) for it in items]
    arrays = batch_graphs(merged, bucket, extras_keys=["targets"])
    _pad_targets_nan(arrays, "targets", len(items))
    return {"graph": to_graph_batch(arrays, extras_keys=["targets"])}


@register_collate("graph_only_collate")
def graph_only_collate(items: Sequence[Dict], bucket: BucketSpec):
    arrays = batch_graphs([it["graph2d"] for it in items], bucket)
    return {"graph": to_graph_batch(arrays)}


@register_collate("contrastive_collate")
def contrastive_collate(items: Sequence[Dict], bucket: BucketSpec,
                        bucket3d: Optional[BucketSpec] = None,
                        dense_3d: bool = False,
                        max_nodes3d: Optional[int] = None):
    """[2D graphs], [3D complete graphs], optional targets
    (custom_collate.py:105-114).

    ``dense_3d=True`` emits the 3D side as a `DenseGraphBatch` (coords only)
    for the scatter-free Net3DDense path."""
    if "targets" in items[0]:
        g2 = batch_graphs([dict(it["graph2d"], targets=it["targets"])
                           for it in items], bucket, extras_keys=["targets"])
        _pad_targets_nan(g2, "targets", len(items))
        g2b = to_graph_batch(g2, extras_keys=["targets"])
    else:
        g2 = batch_graphs([it["graph2d"] for it in items], bucket)
        g2b = to_graph_batch(g2)
    if dense_3d:
        from infomax3d_tpu.graphs.dense import dense_batch, to_dense_batch
        mols3 = [it["graph3d"] for it in items]
        nmax = max_nodes3d or max(m["node_feat"].shape[0] for m in mols3)
        g3d = to_dense_batch(dense_batch(mols3, bucket.n_graphs, nmax,
                                         with_edges=False))
        return {"graph2d": g2b, "graph3d": g3d}
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    g3 = batch_graphs([it["graph3d"] for it in items], b3)
    return {"graph2d": g2b, "graph3d": to_graph_batch(g3)}


@register_collate("conformer_collate")
def conformer_collate(items: Sequence[Dict], bucket: BucketSpec,
                      bucket3d: Optional[BucketSpec] = None,
                      num_conformers: Optional[int] = None):
    """2D graphs + C conformer complete-graphs per molecule packed
    molecule-major (custom_collate.py:155-157, qmugs_dataset.py:149-166).

    num_conformers: optional cap from `collate_params` (configs/
    contrastive_training_multiple_positives.yml names it on the collate)."""
    g2 = batch_graphs([it["graph2d"] for it in items], bucket)
    conf_graphs: List[Dict] = []
    for it in items:
        confs = it["conformers3d"]
        if num_conformers:
            confs = confs[:num_conformers]
        conf_graphs.extend(confs)
    n_conf = len(items[0]["conformers3d"])
    if num_conformers:
        n_conf = min(n_conf, num_conformers)
    b3 = bucket3d or BucketSpec(bucket.n_graphs * n_conf,
                                bucket.n_nodes * n_conf,
                                _complete_edge_cap(items) * n_conf)
    g3 = batch_graphs(conf_graphs, b3)
    return {"graph2d": to_graph_batch(g2), "graph3d": to_graph_batch(g3)}


@register_collate("contrastive_collate_ae")
def contrastive_collate_ae(items, bucket, bucket3d=None):
    """AE trainer batch: identical to contrastive; the reconstruction targets
    are `graph3d.edge_dist` (masked by `edge_mask`), so no extra arrays."""
    return contrastive_collate(items, bucket, bucket3d)


def _complete_edge_cap(items) -> int:
    return int(sum(len(it["graph3d"]["senders"]) for it in items) * 1.0 + 64)


@register_collate("noised_distances_collate")
def noised_distances_collate(items: Sequence[Dict], bucket: BucketSpec,
                             bucket3d: Optional[BucketSpec] = None,
                             std: float = 0.1, num_noised: int = 1,
                             rng: Optional[np.random.Generator] = None):
    """Contrastive batch + `num_noised` copies of the 3D view with Gaussian
    noise on the edge distances, appended as extra negatives
    (NoisedDistancesCollate, custom_collate.py:131-152)."""
    rng = rng or np.random.default_rng(0)
    out = contrastive_collate(items, bucket, bucket3d)
    base = [it["graph3d"] for it in items]
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    noised = []
    for k in range(num_noised):
        copies = []
        for g in base:
            c = dict(g)
            c["edge_dist"] = (g["edge_dist"] + rng.normal(
                scale=std, size=g["edge_dist"].shape)).astype(np.float32)
            copies.append(c)
        noised.append(to_graph_batch(batch_graphs(copies, b3)))
    out["noisy3d"] = noised[0] if num_noised == 1 else noised
    return out


@register_collate("noised_coordinates_collate")
def noised_coordinates_collate(items: Sequence[Dict], bucket: BucketSpec,
                               bucket3d: Optional[BucketSpec] = None,
                               std: float = 0.1, num_noised: int = 1,
                               rng: Optional[np.random.Generator] = None):
    """Noise the COORDINATES and recompute distances
    (NoisedCoordinatesCollate, custom_collate.py:160-185)."""
    rng = rng or np.random.default_rng(0)
    out = contrastive_collate(items, bucket, bucket3d)
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    noised = []
    for k in range(num_noised):
        copies = []
        for it in items:
            g = it["graph3d"]
            coords = g["coords"] + rng.normal(
                scale=std, size=g["coords"].shape).astype(np.float32)
            d = np.linalg.norm(coords[g["senders"]] - coords[g["receivers"]],
                               axis=-1).astype(np.float32)
            copies.append(dict(g, coords=coords, edge_dist=d))
        noised.append(to_graph_batch(batch_graphs(copies, b3)))
    out["noisy3d"] = noised[0] if num_noised == 1 else noised
    return out


def _node_drop_3d(g3: Dict, keep: np.ndarray) -> Dict:
    """Rebuild a complete graph on the kept nodes."""
    coords = g3["coords"][keep]
    n = coords.shape[0]
    idx = np.arange(n)
    src = np.repeat(idx, n)
    dst = np.tile(idx, n)
    sel = src != dst
    src, dst = src[sel].astype(np.int32), dst[sel].astype(np.int32)
    d = np.linalg.norm(coords[src] - coords[dst], axis=-1).astype(np.float32)
    return dict(node_feat=g3["node_feat"][keep], senders=src, receivers=dst,
                edge_dist=d, coords=coords)


@register_collate("node_drop_3d_collate")
def node_drop_3d_collate(items, bucket, bucket3d=None, num_drop: int = 3,
                         rng: Optional[np.random.Generator] = None):
    """Randomly remove up to num_drop atoms from the 3D view only
    (NodeDrop3dCollate, custom_collate.py:188-206)."""
    rng = rng or np.random.default_rng(0)
    g2 = batch_graphs([it["graph2d"] for it in items], bucket)
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    dropped = []
    for it in items:
        g3 = it["graph3d"]
        n = g3["node_feat"].shape[0]
        k = int(rng.integers(0, num_drop))
        keep = np.setdiff1d(np.arange(n),
                            rng.integers(0, n, size=k)) if k else np.arange(n)
        dropped.append(_node_drop_3d(g3, keep))
    g3b = batch_graphs(dropped, b3)
    return {"graph2d": to_graph_batch(g2), "graph3d": to_graph_batch(g3b)}


@register_collate("node_drop_2d3d_collate")
def node_drop_2d3d_collate(items, bucket, bucket3d=None,
                           drop_ratio: float = 0.1,
                           rng: Optional[np.random.Generator] = None):
    """Independently drop a fraction of atoms from BOTH views
    (NodeDrop2d3DCollate, custom_collate.py:208-229)."""
    rng = rng or np.random.default_rng(0)
    g2s, g3s = [], []
    for it in items:
        g2s.append(node_drop(it["graph2d"], rng, drop_ratio))
        g3 = it["graph3d"]
        n = g3["node_feat"].shape[0]
        keep = np.sort(rng.permutation(n)[: n - int(drop_ratio * n)])
        g3s.append(_node_drop_3d(g3, keep))
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    return {"graph2d": to_graph_batch(batch_graphs(g2s, bucket)),
            "graph3d": to_graph_batch(batch_graphs(g3s, b3))}


@register_collate("san_collate")
def san_collate(items: Sequence[Dict], bucket: BucketSpec, max_nodes: int = 40,
                num_lap_pe: int = 10, rng: Optional[np.random.Generator] = None,
                sign_flip: bool = False):
    """Dense batch for SAN: padded node/bond codes, real-edge mask, LapPE
    (reference san_graph return type + padded collates)."""
    from infomax3d_tpu.data.featurize import lap_pe_node_array, random_sign_flip
    from infomax3d_tpu.graphs.dense import dense_batch, to_dense_batch
    graphs = []
    for it in items:
        g = dict(it["graph2d"])
        if "lap_pe" not in g or g["lap_pe"] is None or g["lap_pe"].ndim != 3:
            g["lap_pe"] = lap_pe_node_array(g["senders"], g["receivers"],
                                            g["node_feat"].shape[0], num_lap_pe)
        if sign_flip and rng is not None:
            g["lap_pe"] = random_sign_flip(g["lap_pe"], rng)
        if "targets" in it:
            g["targets"] = it["targets"]
        graphs.append(g)
    extras = ["targets"] if "targets" in items[0] else []
    arrays = dense_batch(graphs, bucket.n_graphs, max_nodes,
                         extras_keys=extras, num_lap_pe=num_lap_pe)
    return {"graph": to_dense_batch(arrays, extras_keys=extras)}


@register_collate("padded_collate_positional_encoding")
def padded_collate_positional_encoding(items, bucket, max_nodes: int = 40,
                                       num_lap_pe: int = 10, **kw):
    """Dense padded batch with LapPE for TransformerPlain
    (reference custom_collate.py:349-358)."""
    return san_collate(items, bucket, max_nodes=max_nodes,
                       num_lap_pe=num_lap_pe, **kw)


@register_collate("egnn_padded_collate")
def egnn_padded_collate(items: Sequence[Dict], bucket: BucketSpec,
                        max_nodes: int = 40):
    """Dense EGNN batch: padded float node features, coords, masks
    (reference custom_collate.py:296-346)."""
    from infomax3d_tpu.graphs.dense import dense_batch, to_dense_batch
    graphs = []
    for it in items:
        g = dict(it["graph2d"])
        if "coords" not in g and "graph3d" in it:
            g["coords"] = it["graph3d"]["coords"]
        if "targets" in it:
            g["targets"] = it["targets"]
        graphs.append(g)
    extras = ["targets"] if "targets" in items[0] else []
    arrays = dense_batch(graphs, bucket.n_graphs, max_nodes,
                         extras_keys=extras, with_edges=False)
    return {"graph": to_dense_batch(arrays, extras_keys=extras)}


@register_collate("molhiv_padded_collate")
def molhiv_padded_collate(items, bucket, max_nodes: int = 40, **kw):
    """Padded dense batch for molhiv (reference custom_collate.py:385-391)."""
    return egnn_padded_collate(items, bucket, max_nodes=max_nodes)


@register_collate("pairwise_distance_collate")
def pairwise_distance_collate(items: Sequence[Dict], bucket: BucketSpec,
                              bucket3d: Optional[BucketSpec] = None,
                              graph_3d: bool = False):
    """2D graph + complete pair graph carrying true pairwise distances as
    targets (reference custom_collate.py:65-78).  Node layouts are aligned:
    both views use the same node bucket so flat indices coincide.

    graph_3d: serve the complete 3D graph (with edge distances) as the
    model input instead of the bond graph — the Net3DDistancePredictor
    protocol (configs/net3d_info_experiment.yml requires complete_graph3d,
    reference net3d_distance_predictor.py:79)."""
    b3 = bucket3d or BucketSpec(bucket.n_graphs, bucket.n_nodes,
                                _complete_edge_cap(items))
    b3 = BucketSpec(b3.n_graphs, bucket.n_nodes, b3.n_edges)
    pairs = to_graph_batch(batch_graphs([it["graph3d"] for it in items], b3))
    if graph_3d:
        # the pair view IS the model input — share one GraphBatch (one
        # host->device transfer of the complete-graph arrays)
        return {"graph": pairs, "pairs": pairs}
    g = batch_graphs([it["graph2d"] for it in items], bucket)
    return {"graph": to_graph_batch(g), "pairs": pairs}


@register_collate("ot_collate")
def ot_collate(items: Sequence[Dict], bucket: BucketSpec,
               n_true_confs: int = 3, n_neighborhoods: Optional[int] = None,
               n_pairs: Optional[int] = None):
    """GeoMol OT batch: bond graph + neighborhood / dihedral-pair index
    arrays + true conformer positions (reference pyg GeoMol featurization +
    `assign_neighborhoods`)."""
    from infomax3d_tpu.data.geomol_featurize import geomol_featurize
    graphs = [it["graph2d"] for it in items]
    arrays = batch_graphs(graphs, bucket)
    node_off = np.concatenate(
        [[0], np.cumsum([g["node_feat"].shape[0] for g in graphs])[:-1]]
    ).astype(np.int32)
    feats = [geomol_featurize(g) for g in graphs]

    NH = n_neighborhoods or sum(len(f["nbh_center"]) for f in feats) + 8
    P = n_pairs or sum(len(f["dp"]) for f in feats) + 8
    N, G = bucket.n_nodes, bucket.n_graphs
    z = lambda *s: np.zeros(s, np.int32)
    nbh_center = np.full(NH, N, np.int32)
    nbh_nbrs = z(NH, 4); nbh_perms = z(NH, 6, 4)
    nbh_mask = np.zeros((NH, 4), np.float32)
    nbh_mol = np.full(NH, G, np.int32)
    dp_x = np.full(P, N, np.int32); dp_y = np.full(P, N, np.int32)
    dp_x_h = np.full(P, NH, np.int32); dp_y_h = np.full(P, NH, np.int32)
    dp_x_nbrs = z(P, 4); dp_y_nbrs = z(P, 4)
    dp_xn_perms = z(P, 6, 4); dp_yn_perms = z(P, 6, 4)
    x_map = np.zeros((P, 4), np.float32); y_map = np.zeros((P, 4), np.float32)
    x_other = z(P, 3); y_other = z(P, 3)
    dihedral_mask = np.zeros((P, 9), np.float32)
    dp_mol = np.full(P, G, np.int32)

    oh, op = 0, 0
    for m, (g, f) in enumerate(zip(graphs, feats)):
        off = node_off[m]
        nh = len(f["nbh_center"])
        if oh + nh > NH or op + len(f["dp"]) > P:
            raise ValueError("ot_collate buckets too small")
        nbh_center[oh:oh + nh] = f["nbh_center"] + off
        nbh_nbrs[oh:oh + nh] = f["nbh_nbrs"] + off
        nbh_perms[oh:oh + nh] = f["nbh_perms"] + off
        nbh_mask[oh:oh + nh] = f["nbh_mask"]
        nbh_mol[oh:oh + nh] = m
        for i, (s, r) in enumerate(f["dp"]):
            j = op + i
            dp_x[j], dp_y[j] = s + off, r + off
            hs, hr = f["x_to_h"][s], f["x_to_h"][r]
            dp_x_h[j], dp_y_h[j] = oh + hs, oh + hr
            dp_x_nbrs[j] = f["nbh_nbrs"][hs] + off
            dp_y_nbrs[j] = f["nbh_nbrs"][hr] + off
            dp_xn_perms[j] = f["nbh_perms"][hs] + off
            dp_yn_perms[j] = f["nbh_perms"][hr] + off
            x_map[j] = f["x_map"][i]
            y_map[j] = f["y_map"][i]
            x_other[j] = np.nonzero(f["x_map"][i] == 0)[0][:3]
            y_other[j] = np.nonzero(f["y_map"][i] == 0)[0][:3]
            dx = f["dx_mask"][i][x_other[j]]
            dy = f["dy_mask"][i][y_other[j]]
            dihedral_mask[j] = (dx[:, None] * dy[None, :]).reshape(9)
            dp_mol[j] = m
        oh += nh
        op += len(f["dp"])

    # true conformer positions [N, T, 3] + per-molecule mask [G, T]
    pos = np.zeros((N, n_true_confs, 3), np.float32)
    pos_mask = np.zeros((G, n_true_confs), np.float32)
    for m, it in enumerate(graphs):
        off = node_off[m]
        nn_ = it["node_feat"].shape[0]
        confs = items[m].get("conformers3d")
        if confs is not None:
            for c, cg in enumerate(confs[:n_true_confs]):
                pos[off:off + nn_, c] = cg["coords"]
                pos_mask[m, c] = 1.0
        elif it.get("coords") is not None:
            pos[off:off + nn_, 0] = it["coords"]
            pos_mask[m, 0] = 1.0

    gb = to_graph_batch(arrays)
    extras = dict(gb.extras)
    extras.update({k: jnp.asarray(v) for k, v in dict(
        nbh_center=nbh_center, nbh_nbrs=nbh_nbrs, nbh_perms=nbh_perms,
        nbh_mask=nbh_mask, nbh_mol=nbh_mol, dp_x=dp_x, dp_y=dp_y,
        dp_x_h=dp_x_h, dp_y_h=dp_y_h, dp_x_nbrs=dp_x_nbrs,
        dp_y_nbrs=dp_y_nbrs, dp_xn_perms=dp_xn_perms, dp_yn_perms=dp_yn_perms,
        x_map=x_map, y_map=y_map, x_other=x_other, y_other=y_other,
        dihedral_mask=dihedral_mask, dp_mol=dp_mol, pos=pos,
        pos_mask=pos_mask).items()})
    return {"graph": gb.replace(extras=extras)}


@register_collate("smp_collate")
def smp_collate(items: Sequence[Dict], bucket: BucketSpec,
                cutoff: float = 5.0, n_triplets: Optional[int] = None):
    """Radius-graph batch + padded triplet arrays for SMP (host-side
    xyztodat equivalent, data/smp_featurize.py)."""
    from infomax3d_tpu.data.smp_featurize import smp_featurize
    graphs, tri = [], []
    for it in items:
        mol = it["graph2d"] if "coords" in it["graph2d"] else it["graph3d"]
        feats = smp_featurize(mol["coords"], cutoff=cutoff)
        graphs.append(dict(node_feat=mol["node_feat"],
                           senders=feats["senders"],
                           receivers=feats["receivers"],
                           edge_dist=feats["dist"], coords=mol["coords"]))
        tri.append(feats)
    arrays = batch_graphs(graphs, bucket)
    E = bucket.n_edges
    edge_off = np.concatenate(
        [[0], np.cumsum([len(t["senders"]) for t in tri])[:-1]])
    T = n_triplets or int(sum(int(t["tri_count"]) for t in tri) * 1.0 + 64)
    angle = np.zeros(T, np.float32)
    torsion = np.zeros(T, np.float32)
    idx_kj = np.full(T, E, np.int32)
    idx_ji = np.full(T, E, np.int32)
    tri_mask = np.zeros(T, bool)
    o = 0
    for m, t in enumerate(tri):
        c = int(t["tri_count"])
        if o + c > T:
            raise ValueError(f"triplet bucket {T} too small")
        angle[o:o + c] = t["angle"]
        torsion[o:o + c] = t["torsion"]
        idx_kj[o:o + c] = t["idx_kj"] + edge_off[m]
        idx_ji[o:o + c] = t["idx_ji"] + edge_off[m]
        tri_mask[o:o + c] = True
        o += c
    gb = to_graph_batch(arrays)
    extras = dict(gb.extras)
    extras.update(angle=jnp.asarray(angle), torsion=jnp.asarray(torsion),
                  idx_kj=jnp.asarray(idx_kj), idx_ji=jnp.asarray(idx_ji),
                  tri_mask=jnp.asarray(tri_mask))
    if "targets" in items[0]:
        tg = np.stack([np.asarray(it["targets"]) for it in items])
        buf = np.full((bucket.n_graphs,) + tg.shape[1:], np.nan, np.float32)
        buf[:len(items)] = tg
        extras["targets"] = jnp.asarray(buf)
    return {"graph": gb.replace(extras=extras)}


@register_collate("graphcl_collate")
def graphcl_collate(items: Sequence[Dict], bucket: BucketSpec,
                    rng: Optional[np.random.Generator] = None,
                    drop_ratio: float = 0.1):
    """Two node-dropped augmented views of the 2D graph (NodeDrop2dCollate,
    custom_collate.py:188-282)."""
    rng = rng or np.random.default_rng(0)
    v1 = [node_drop(it["graph2d"], rng, drop_ratio) for it in items]
    v2 = [node_drop(it["graph2d"], rng, drop_ratio) for it in items]
    return {"view1": to_graph_batch(batch_graphs(v1, bucket)),
            "view2": to_graph_batch(batch_graphs(v2, bucket))}


def node_drop(graph: Dict, rng: np.random.Generator, ratio: float) -> Dict:
    """Drop a fraction of nodes (keeping >=1) and incident edges."""
    n = graph["node_feat"].shape[0]
    keep_n = max(1, int(round(n * (1 - ratio))))
    keep = np.sort(rng.permutation(n)[:keep_n])
    remap = -np.ones(n, dtype=np.int64)
    remap[keep] = np.arange(keep_n)
    s, r = graph["senders"], graph["receivers"]
    ekeep = (remap[s] >= 0) & (remap[r] >= 0)
    out = dict(graph)
    out["node_feat"] = graph["node_feat"][keep]
    out["senders"] = remap[s[ekeep]].astype(np.int32)
    out["receivers"] = remap[r[ekeep]].astype(np.int32)
    if graph.get("edge_feat") is not None:
        out["edge_feat"] = graph["edge_feat"][ekeep]
    if graph.get("coords") is not None:
        out["coords"] = graph["coords"][keep]
    return out


class GraphDataLoader:
    """Bucketed, shuffling, optionally-prefetching loader.

    dataset: object with __len__ and __getitem__(i) -> item dict holding the
    views the collate needs ("graph2d", "graph3d", "targets", ...).
    """

    def __init__(self, dataset, batch_size: int, collate,
                 bucket: Optional[BucketSpec] = None,
                 ladder: Optional[Sequence[BucketSpec]] = None,
                 shuffle: bool = True, drop_last: bool = False,
                 seed: int = 0, indices: Optional[Sequence[int]] = None,
                 prefetch: int = 2, collate_kwargs: Optional[Dict] = None,
                 n_shards: int = 1, batch_sampler=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate if callable(collate) else get_collate(collate)
        self.bucket = bucket
        self.ladder = list(ladder) if ladder else None
        self.shuffle = shuffle
        self.n_shards = n_shards
        if n_shards > 1:
            if batch_size % n_shards:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"n_shards {n_shards}")
            drop_last = True  # every shard must be full
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.indices = np.asarray(indices if indices is not None
                                  else np.arange(len(dataset)))
        self.prefetch = prefetch
        self.collate_kwargs = collate_kwargs or {}
        self.batch_sampler = batch_sampler

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _shard_bucket(self, bucket: BucketSpec) -> BucketSpec:
        s = self.n_shards
        # per-shard bucket keeps the structural fields — dropping csr/
        # max_deg here would silently kick every DP shard off the Pallas
        # fast path
        return BucketSpec(bucket.n_graphs // s, bucket.n_nodes // s,
                          bucket.n_edges // s, max_deg=bucket.max_deg,
                          csr=bucket.csr, nmax=bucket.nmax)

    def _shard_kwargs(self) -> Dict:
        kw = dict(self.collate_kwargs)
        if isinstance(kw.get("bucket3d"), BucketSpec):
            kw["bucket3d"] = self._shard_bucket(kw["bucket3d"])
        return kw

    def _index_batches(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        idx = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            yield idx[i:i + self.batch_size]

    def _batches(self) -> Iterator:
        for chunk in self._index_batches():
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            items = [self.dataset[int(j)] for j in chunk]
            bucket = self.bucket
            if bucket is None and self.ladder:
                n_tot = sum(it["graph2d"]["node_feat"].shape[0] for it in items)
                e_tot = sum(it["graph2d"]["senders"].shape[0] for it in items)
                bucket = pick_bucket(self.ladder, n_tot, e_tot)
            if self.n_shards == 1:
                yield self.collate(items, bucket, **self.collate_kwargs)
                continue
            # data-parallel: one padded sub-batch per device, stacked on a
            # leading axis consumed by shard_map (no molecule ever crosses a
            # shard boundary)
            per = len(items) // self.n_shards
            import jax
            sub = [self.collate(items[s * per:(s + 1) * per],
                                self._shard_bucket(bucket),
                                **self._shard_kwargs())
                   for s in range(self.n_shards)]

            def _stack(*xs):
                # Pallas window markers (1-D int8, shape IS the value) may
                # differ per shard; a wider window is always valid, so pad
                # every shard to the max before stacking
                if (xs[0].ndim == 1 and xs[0].dtype == np.int8
                        and len({x.shape[0] for x in xs}) > 1):
                    m = max(x.shape[0] for x in xs)
                    xs = [np.zeros(m, np.int8) for _ in xs]
                return np.stack(xs)

            yield jax.tree_util.tree_map(_stack, *sub)

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        err: list = []
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not _put(b):
                        return       # consumer gone (e.g. next(iter(...)))
            except BaseException as e:   # re-raised on the consuming thread
                err.append(e)
            finally:
                _put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is SENTINEL:
                    if err:
                        raise err[0]
                    break
                yield b
        finally:
            # unblock and retire the worker if the consumer abandoned the
            # iterator early — otherwise it would pin `prefetch` collated
            # batches for the process lifetime
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass
