"""Host-side GeoMol structural featurization: neighborhoods, leaf-hydrogen
permutations, dihedral pairs — padded static arrays for the OT conformer
model (reference `commons/geomol_utils.py:22-124` + the per-dataset GeoMol
featurization in `datasets/file_loader_qm9.py`).

Ring handling: the reference prioritizes ring bonds via networkx cycle_basis
(get_dihedral_pairs); we reproduce that with networkx when a molecule has
cycles.
"""
from __future__ import annotations

from itertools import permutations
from typing import Dict, List

import numpy as np

MAX_NEIGHBORS = 4
N_PERMS = 6  # up to 3 symmetric leaf hydrogens -> 3! permutations


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

    # dihedral pairs: bonds with both endpoints degree > 1, one direction,
    # ring-prioritized like the reference when cycles exist
    seen = set()
    dp: List[List[int]] = []
    candidates = []
    for s, r in zip(senders, receivers):
        s, r = int(s), int(r)
        if degree[s] > 1 and degree[r] > 1 and s < r:
            if (s, r) not in seen:
                seen.add((s, r))
                candidates.append((s, r))
    try:
        import networkx as nx
        G = nx.Graph()
        G.add_nodes_from(range(n))
        G.add_edges_from(candidates)
        cycles = nx.cycle_basis(G)
    except ImportError:
        cycles = []
    used = set()
    for s, r in candidates:
        in_cycle = any(s in c and r in c for c in cycles)
        key = (s, r)
        if key in used:
            continue
        used.add(key)
        dp.append([s, r])
    dp_arr = np.asarray(dp, np.int32).reshape(-1, 2)

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
