"""Golden parity: dihedral-pair selection vs the ACTUAL reference
`commons/geomol_utils.get_dihedral_pairs` (ring prioritization via
networkx cycle_basis, `geomol_utils.py:74-124` + `cycle_utils.py:12-32`).

The reference needs `torch_geometric.utils.to_networkx` and `degree`;
both are stubbed with the exact PyG semantics the function consumes
(DiGraph over range(num_nodes) + edge_index order; bincount degree).
networkx itself is real.
"""
import sys
import types

import numpy as np
import torch

import test_layer_golden_ext  # noqa: F401  (installs dgl/ogb stubs)

import networkx as nx

if "torch_geometric.utils" not in sys.modules:
    sys.modules.setdefault("torch_geometric",
                           types.ModuleType("torch_geometric"))
    tg_utils = types.ModuleType("torch_geometric.utils")
    sys.modules["torch_geometric"].utils = tg_utils
    sys.modules["torch_geometric.utils"] = tg_utils
tg_utils = sys.modules["torch_geometric.utils"]
tg_utils.degree = lambda idx, num_nodes=None: torch.bincount(
    idx, minlength=num_nodes or 0).float()


def _to_networkx(data):
    # PyG to_networkx(data): DiGraph, nodes 0..num_nodes-1 in order, edges
    # in edge_index column order
    G = nx.DiGraph()
    G.add_nodes_from(range(data.num_nodes))
    G.add_edges_from(data.edge_index.t().tolist())
    return G


tg_utils.to_networkx = _to_networkx

for pkg, path in (("commons", "/root/reference/commons"),):
    if pkg not in sys.modules or not hasattr(sys.modules[pkg], "__path__"):
        mod = types.ModuleType(pkg)
        mod.__path__ = [path]
        sys.modules[pkg] = mod
sys.path.insert(0, "/root/reference")
from commons import geomol_utils as ref  # noqa: E402

sys.path.pop(0)

from infomax3d_tpu.data.geomol_featurize import (  # noqa: E402
    _get_dihedral_pairs, geomol_featurize)


class _Data:
    def __init__(self, edge_index, num_nodes):
        self.edge_index = edge_index
        self.num_nodes = num_nodes


def _bidir(bonds, n):
    s, r = [], []
    for a, b in bonds:
        s += [a, b]
        r += [b, a]
    return np.asarray(s, np.int64), np.asarray(r, np.int64), n


# molecules as undirected bond lists (both directions materialized like the
# reference datasets do)
MOLS = {
    # propane-like chain with substituents: acyclic, several rotatable bonds
    "chain": _bidir([(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (3, 6)], 7),
    # cyclohexane with one exocyclic methyl: single ring
    "ring6": _bidir([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 6),
                     (6, 7)], 8),
    # naphthalene-like fused pair: two basis cycles SHARING an edge — the
    # shared bond is emitted by both cycle runs (reference duplicate quirk)
    "fused": _bidir([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
                     (4, 6), (6, 7), (7, 8), (8, 5)], 9),
    # biphenyl-like: two rings joined by a rotatable bond whose endpoints
    # are BOTH in cycles; with the join bond FIRST in edge order both rings
    # are still unconsumed when it's processed — the bond is dropped and
    # only ring-x's run is emitted (reference quirk, geomol_utils.py:105-110)
    "biphenyl": _bidir([(0, 3), (0, 1), (1, 2), (2, 0),
                        (3, 4), (4, 5), (5, 3), (2, 6), (4, 7)], 8),
    # ring attached to a tail whose first pair hits the elif (y in cycle)
    "tail_ring": _bidir([(0, 1), (1, 2), (2, 3), (3, 4), (4, 2), (0, 5)], 6),
}


def _ref_pairs(senders, receivers, n):
    edge_index = torch.tensor(np.stack([senders, receivers]), dtype=torch.long)
    data = _Data(edge_index, n)
    out = ref.get_dihedral_pairs(edge_index, None, data)   # [2, P]
    return out.t().numpy().astype(np.int32)


def test_dihedral_pairs_match_reference_exactly():
    for name, (s, r, n) in MOLS.items():
        deg = np.bincount(r, minlength=n)
        mine = _get_dihedral_pairs(s, r, deg, n)
        theirs = _ref_pairs(s, r, n)
        assert mine.shape == theirs.shape, (
            f"{name}: {mine.shape} vs {theirs.shape}\n{mine}\n{theirs}")
        assert (mine == theirs).all(), f"{name}:\n{mine}\nvs ref\n{theirs}"


def test_fused_ring_duplicate_quirk_preserved():
    s, r, n = MOLS["fused"]
    deg = np.bincount(r, minlength=n)
    mine = _get_dihedral_pairs(s, r, deg, n)
    und = {tuple(sorted(p)) for p in mine.tolist()}
    # the shared fusion bond (4,5) appears in both cycle runs
    counts = {}
    for p in mine.tolist():
        k = tuple(sorted(p))
        counts[k] = counts.get(k, 0) + 1
    assert counts[(4, 5)] == 2, counts
    assert (4, 5) in und


def test_biphenyl_join_bond_dropped():
    s, r, n = MOLS["biphenyl"]
    deg = np.bincount(r, minlength=n)
    mine = _get_dihedral_pairs(s, r, deg, n)
    und = {tuple(sorted(p)) for p in mine.tolist()}
    assert (0, 3) not in und  # both endpoints in (separate) cycles -> dropped


def test_featurize_consumes_ring_ordered_pairs():
    s, r, n = MOLS["ring6"]
    g = {"node_feat": np.ones((n, 9), np.int32),
         "senders": s.astype(np.int32), "receivers": r.astype(np.int32)}
    out = geomol_featurize(g)
    assert out["dp"].shape[1] == 2 and len(out["dp"]) >= 6
    # maps stay one-hot after the ring reordering
    assert (out["x_map"].sum(1) == 1).all()
    assert (out["y_map"].sum(1) == 1).all()
