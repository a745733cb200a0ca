"""Host-side geometry featurization for spherical message passing.

Replaces the reference's on-device PyG `radius_graph` + torch_sparse triplet
enumeration (`commons/spherical_encoding.py:276-330`) with numpy
preprocessing: molecules are tiny, and precomputing padded index arrays keeps
every shape static for XLA (SURVEY.md §2.6).

Per molecule: radius graph edges (j->i), distances, triplets (k->j->i) with
edge-id pairs (idx_kj, idx_ji), interior angles, and the per-triplet MINIMUM
dihedral torsion over the remaining neighbors — exactly the reference
`xyztodat` semantics including the 0..2pi wrap and scatter-min.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def radius_graph(coords: np.ndarray, cutoff: float):
    """All directed pairs within cutoff (no self loops); returns (j, i) with
    the reference's edge orientation j->i."""
    n = coords.shape[0]
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    mask = (d <= cutoff) & ~np.eye(n, dtype=bool)
    i_idx, j_idx = np.nonzero(mask)          # edge from j -> i
    return j_idx.astype(np.int32), i_idx.astype(np.int32)


def smp_featurize(coords: np.ndarray, cutoff: float = 5.0) -> Dict[str, np.ndarray]:
    coords = np.asarray(coords, dtype=np.float64)
    j, i = radius_graph(coords, cutoff)
    e = len(j)
    dist = np.linalg.norm(coords[i] - coords[j], axis=-1)

    # edge id lookup: eid[j, i]
    n = coords.shape[0]
    eid = -np.ones((n, n), dtype=np.int64)
    eid[j, i] = np.arange(e)

    # triplets k->j->i: for each edge (j->i), all k with edge (k->j), k != i
    tri_i, tri_j, tri_k, idx_kj, idx_ji = [], [], [], [], []
    in_nbrs = [np.nonzero(eid[:, node] >= 0)[0] for node in range(n)]
    for edge_id in range(e):
        jj, ii = j[edge_id], i[edge_id]
        for k in in_nbrs[jj]:
            if k == ii:
                continue
            tri_i.append(ii); tri_j.append(jj); tri_k.append(k)
            idx_kj.append(eid[k, jj])
            idx_ji.append(edge_id)
    t = len(tri_i)
    tri_i = np.asarray(tri_i, dtype=np.int32)
    tri_j = np.asarray(tri_j, dtype=np.int32)
    tri_k = np.asarray(tri_k, dtype=np.int32)
    idx_kj = np.asarray(idx_kj, dtype=np.int32)
    idx_ji = np.asarray(idx_ji, dtype=np.int32)

    if t:
        pos_ji = coords[tri_i] - coords[tri_j]
        pos_jk = coords[tri_k] - coords[tri_j]
        a = np.sum(pos_ji * pos_jk, axis=-1)
        b = np.linalg.norm(np.cross(pos_ji, pos_jk), axis=-1)
        angle = np.arctan2(b, a)
    else:
        angle = np.zeros(0)

    # torsion: per triplet, min dihedral over other neighbors k_n of j (k_n != i)
    torsion = np.zeros(t)
    for tt in range(t):
        ii, jj, kk = tri_i[tt], tri_j[tt], tri_k[tt]
        pos_ji = coords[ii] - coords[jj]
        pos_j0 = coords[kk] - coords[jj]
        dist_ji = np.linalg.norm(pos_ji)
        best = None
        for k_n in in_nbrs[jj]:
            if k_n == ii:
                continue
            pos_jk = coords[k_n] - coords[jj]
            plane1 = np.cross(pos_ji, pos_j0)
            plane2 = np.cross(pos_ji, pos_jk)
            a = np.dot(plane1, plane2)
            b = np.dot(np.cross(plane1, plane2), pos_ji) / max(dist_ji, 1e-12)
            tor = np.arctan2(b, a)
            if tor <= 0:
                tor += 2 * np.pi
            best = tor if best is None else min(best, tor)
        torsion[tt] = 0.0 if best is None else best

    return dict(senders=j, receivers=i, dist=dist.astype(np.float32),
                angle=angle.astype(np.float32),
                torsion=torsion.astype(np.float32),
                idx_kj=idx_kj, idx_ji=idx_ji,
                tri_count=np.int32(t))
