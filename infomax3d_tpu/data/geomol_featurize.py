"""Host-side GeoMol structural featurization: neighborhoods, leaf-hydrogen
permutations, dihedral pairs — padded static arrays for the OT conformer
model (reference `commons/geomol_utils.py:22-124` + the per-dataset GeoMol
featurization in `datasets/file_loader_qm9.py`).

Ring handling: reference-exact `get_dihedral_pairs` semantics
(`commons/geomol_utils.py:74-124` + `commons/cycle_utils.py:12-32`):
candidate bonds (both endpoints degree > 1, start < end, edge order) are
walked in order; when both endpoints sit in a not-yet-consumed
`nx.cycle_basis` cycle, the candidate itself is DROPPED and the cycle's
edges are emitted as directed consecutive pairs starting from the first
endpoint all the way around (the cycle is popped — each basis cycle fires
once); when only the second endpoint is in a remaining cycle, the pair is
kept and that cycle's run is appended after it.  An undirected
already-emitted check (`sorted_keep`) suppresses later candidates that a
cycle run covered, but cycle runs themselves are emitted unconditionally —
fused rings therefore repeat their shared bond, exactly like upstream.
"""
from __future__ import annotations

from itertools import permutations
from typing import Dict, List

import numpy as np

MAX_NEIGHBORS = 4
N_PERMS = 6  # up to 3 symmetric leaf hydrogens -> 3! permutations


def _cycle_run(cycle: List[int], start: int) -> List[List[int]]:
    """Directed consecutive edge pairs of `cycle` rotated to start at
    `start`, all the way around (k pairs for a k-cycle) — the exact output
    of reference `cycle_utils.get_cycle_indices` (`cycle_utils.py:12-25`)."""
    i = cycle.index(start)
    k = len(cycle)
    order = [cycle[(i + j) % k] for j in range(k)] + [start]
    return [[order[j], order[j + 1]] for j in range(k)]


def _pop_cycle_run(cycles: List[List[int]], idx: int) -> List[List[int]]:
    """Pop the FIRST remaining cycle containing `idx` and return its edge
    run starting from `idx` (reference `get_current_cycle_indices`,
    `cycle_utils.py:28-32` — note the cycle is consumed)."""
    c_i = next(i for i, c in enumerate(cycles) if idx in c)
    return _cycle_run(cycles.pop(c_i), idx)


def _get_dihedral_pairs(senders, receivers, degree, n: int) -> np.ndarray:
    """Reference-exact `get_dihedral_pairs` (`commons/geomol_utils.py:74-124`).

    Candidates: directed edges with both endpoint degrees > 1, kept where
    start < end, in edge order.  Ring prioritization walks candidates and
    substitutes/extends with `nx.cycle_basis` edge runs (see module
    docstring for the full quirk list).  Falls back to the plain candidate
    list when networkx is unavailable (documented deviation — networkx is
    pure Python and present in the supported environment).
    """
    pairs = [(int(s), int(r)) for s, r in zip(senders, receivers)
             if degree[int(s)] > 1 and degree[int(r)] > 1 and int(s) < int(r)]
    try:
        import networkx as nx
        # byte-identical graph construction to the reference:
        # tg.utils.to_networkx(data) builds a DiGraph over range(n) with
        # edge_index-ordered edges, then nx.to_undirected merges — the
        # adjacency ITERATION ORDER this produces decides cycle_basis's
        # cycle orientation, so a direct nx.Graph would reorder pairs
        G = nx.DiGraph()
        G.add_nodes_from(range(n))
        G.add_edges_from(zip(map(int, senders), map(int, receivers)))
        cycles = [list(c) for c in nx.cycle_basis(nx.to_undirected(G))]
    except ImportError:
        return np.asarray(pairs, np.int32).reshape(-1, 2)

    keep: List[List[int]] = []
    sorted_keep: List[List[int]] = []
    for x, y in pairs:
        if sorted((x, y)) in sorted_keep:
            continue
        x_in = any(x in c for c in cycles)
        y_in = any(y in c for c in cycles)
        if x_in and y_in:
            # both endpoints in remaining cycles: the pair itself is
            # dropped; x's cycle run is emitted (geomol_utils.py:105-110)
            run = _pop_cycle_run(cycles, x)
            keep.extend(run)
            sorted_keep.extend(sorted(c) for c in run)
        elif y_in:
            run = _pop_cycle_run(cycles, y)
            keep.append([x, y])
            keep.extend(run)
            sorted_keep.append(sorted((x, y)))
            sorted_keep.extend(sorted(c) for c in run)
        else:
            keep.append([x, y])
    return np.asarray(keep, np.int32).reshape(-1, 2)


def geomol_featurize(graph: Dict[str, np.ndarray],
                     h_code_column: int = 0) -> Dict[str, np.ndarray]:
    """graph: per-molecule dict (node_feat, senders, receivers).

    Returns padded per-molecule arrays:
      nbh_center [Nh]         central atom of each neighborhood (degree > 1)
      nbh_nbrs [Nh, 4]        neighbor atom ids (pad 0, see mask)
      nbh_mask [Nh, 4]
      nbh_perms [Nh, 6, 4]    hydrogen-permuted neighbor ids
      x_to_h [n_atoms]        atom -> neighborhood row (or -1)
      dp [P, 2]               dihedral pairs (x, y), both degree > 1
      x_map_to_neighbor_y [P, 4], y_map_to_neighbor_x [P, 4] (one-hot)
      dihedral_x_mask / dihedral_y_mask [P, 4]
    """
    n = graph["node_feat"].shape[0]
    senders = graph["senders"]
    receivers = graph["receivers"]
    nbrs: List[List[int]] = [[] for _ in range(n)]
    for s, r in zip(senders, receivers):
        nbrs[int(s)].append(int(r))
    # unique neighbor list preserving order
    nbrs = [list(dict.fromkeys(v)) for v in nbrs]
    degree = np.array([len(v) for v in nbrs])
    # H flag: OGB atomic-number code 0 == hydrogen
    is_h = graph["node_feat"][:, h_code_column] == 0

    centers = [a for a in range(n) if degree[a] > 1]
    nh = len(centers)
    nbh_center = np.zeros(nh, np.int32)
    nbh_nbrs = np.zeros((nh, MAX_NEIGHBORS), np.int32)
    nbh_mask = np.zeros((nh, MAX_NEIGHBORS), np.float32)
    nbh_perms = np.zeros((nh, N_PERMS, MAX_NEIGHBORS), np.int32)
    x_to_h = -np.ones(n, np.int32)
    for i, a in enumerate(centers):
        v = nbrs[a][:MAX_NEIGHBORS]
        nbh_center[i] = a
        nbh_nbrs[i, :len(v)] = v
        nbh_mask[i, :len(v)] = 1.0
        x_to_h[a] = i
        # leaf-hydrogen flags; only counts if >1 symmetric H (geomol quirk)
        leaf = np.array([is_h[x] and degree[x] == 1 for x in v])
        if leaf.sum() <= 1:
            leaf = np.zeros_like(leaf)
        base = np.array(v + [0] * (MAX_NEIGHBORS - len(v)), np.int32)
        perms = np.tile(base, (N_PERMS, 1))
        if leaf.any():
            h_ids = [v[k] for k in range(len(v)) if leaf[k]]
            slots = [k for k in range(len(v)) if leaf[k]]
            for pi, perm in enumerate(permutations(h_ids)):
                if pi >= N_PERMS:
                    break
                row = base.copy()
                for slot, val in zip(slots, perm):
                    row[slot] = val
                perms[pi] = row
        nbh_perms[i] = perms

    dp_arr = _get_dihedral_pairs(senders, receivers, degree, n)

    p = len(dp_arr)
    x_map = np.zeros((p, MAX_NEIGHBORS), np.float32)
    y_map = np.zeros((p, MAX_NEIGHBORS), np.float32)
    dx_mask = np.zeros((p, MAX_NEIGHBORS), np.float32)
    dy_mask = np.zeros((p, MAX_NEIGHBORS), np.float32)
    for i, (s, r) in enumerate(dp_arr):
        hs, hr = x_to_h[s], x_to_h[r]
        x_map[i] = (nbh_nbrs[hs] == r) & (nbh_mask[hs] > 0)
        y_map[i] = (nbh_nbrs[hr] == s) & (nbh_mask[hr] > 0)
        dx_mask[i] = nbh_mask[hs]
        dy_mask[i] = nbh_mask[hr]
    # drop pairs where the bond partner is not within the (truncated) 4
    valid = (x_map.sum(1) == 1) & (y_map.sum(1) == 1)
    return dict(nbh_center=nbh_center, nbh_nbrs=nbh_nbrs, nbh_mask=nbh_mask,
                nbh_perms=nbh_perms, x_to_h=x_to_h,
                dp=dp_arr[valid], x_map=x_map[valid], y_map=y_map[valid],
                dx_mask=dx_mask[valid], dy_mask=dy_mask[valid])
