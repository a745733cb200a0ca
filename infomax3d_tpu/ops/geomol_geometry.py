"""GeoMol geometry math — jnp ports of reference `commons/geomol_utils.py`
(Kabsch-style frames, batched dihedrals, von Mises losses, local-neighborhood
statistics).  Pure functions over padded arrays; randomness (the frame's
auxiliary vector, random rotations) takes explicit keys.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# which angle combos are valid for a given neighbor count (geomol_utils.py:8-19)
ANGLE_MASK_REF = np.array([[0, 0, 0, 0, 0, 0],
                           [0, 0, 0, 0, 0, 0],
                           [1, 0, 0, 0, 0, 0],
                           [1, 1, 1, 0, 0, 0],
                           [1, 1, 1, 1, 1, 1]], dtype=np.float32)

ANGLE_COMBOS = np.array([[0, 1], [0, 2], [1, 2], [0, 3], [1, 3], [2, 3]],
                        dtype=np.int32)



def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """norm with finite gradient at 0 (jnp.linalg.norm has NaN grad there;
    padded rows are exactly zero)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)

def batch_distance_metrics_from_coords(coords, mask):
    """One-hop distances and the pairwise 2-hop distance matrix within each
    local neighborhood (geomol_utils.py:127-141).  coords [..., 4, C, 3] with
    an optional perm axis; mask [Nh, 4]."""
    d_mat_mask = mask[:, None, :] * mask[:, :, None]          # [Nh, 4, 4]
    if coords.ndim == 4:       # [Nh, 4, C, 3]
        diff = coords[:, None, :, :, :] - coords[:, :, None, :, :] + 1e-10
        two_hop = safe_norm(diff) * d_mat_mask[..., None]
        one_hop = safe_norm(coords)
    else:                      # [Nh, 6, 4, C, 3] (hydrogen perms)
        diff = coords[:, :, None, :, :, :] - coords[:, :, :, None, :, :] + 1e-10
        two_hop = safe_norm(diff) * d_mat_mask[:, None, :, :, None]
        one_hop = safe_norm(coords)
    return one_hop, two_hop


def batch_angle_between_vectors(a, b):
    inner = jnp.sum(a * b, axis=-1)
    den = safe_norm(a) * safe_norm(b) + 1e-10
    return inner / den


def batch_angles_from_coords(coords, mask):
    """All 6 pairwise neighbor angles (cosines) per neighborhood
    (geomol_utils.py:161-176)."""
    combos = jnp.asarray(ANGLE_COMBOS)
    amask = jnp.asarray(ANGLE_MASK_REF)[mask.sum(axis=1).astype(jnp.int32)]
    if coords.ndim == 4:       # [Nh, 4, C, 3]
        c = coords[:, combos]                          # [Nh, 6, 2, C, 3]
        ang = batch_angle_between_vectors(c[:, :, 0], c[:, :, 1])
        return ang * amask[..., None]
    c = coords[:, :, combos]                           # [Nh, 6p, 6, 2, C, 3]
    ang = batch_angle_between_vectors(c[:, :, :, 0], c[:, :, :, 1])
    return ang * amask[:, None, :, None]


def batch_local_stats_from_coords(coords, mask):
    one_hop, two_hop = batch_distance_metrics_from_coords(coords, mask)
    angles = batch_angles_from_coords(coords, mask)
    return one_hop, two_hop, angles


def batch_dihedrals(p0, p1, p2, p3, angle: bool = False):
    """sin/cos of dihedral over the p1-p2 axis (geomol_utils.py:190-204)."""
    s1 = p1 - p0
    s2 = p2 - p1
    s3 = p3 - p2
    c12 = jnp.cross(s1, s2)
    c23 = jnp.cross(s2, s3)
    sin_d = safe_norm(s2) * jnp.sum(s1 * c23, axis=-1)
    cos_d = jnp.sum(c12 * c23, axis=-1)
    if angle:
        return jnp.arctan2(sin_d, cos_d + 1e-10)
    den = safe_norm(c12) * safe_norm(c23) + 1e-10
    return sin_d / den, cos_d / den


def von_mises_loss(a, b, a_sin=None, b_sin=None):
    """Cosine-difference similarity (geomol_utils.py:222-232); HIGHER is
    better (the reference subtracts it in the molecule loss)."""
    if a_sin is not None:
        return a * b + a_sin * b_sin
    return a * b + jnp.sqrt(1 - a ** 2 + 1e-5) * jnp.sqrt(1 - b ** 2 + 1e-5)


def rotation_matrix_v2(neighbor_coords, neighbor_map, key):
    """Frame construction over the bond axis with a random auxiliary vector
    (geomol_utils.py:269-298).

    neighbor_coords [P, 4, C, 3]; neighbor_map [P, 4] one-hot of the neighbor
    that is the other dihedral atom.  Returns H [P, C, 3, 3].
    """
    p_y = jnp.einsum("pn,pncd->pcd", neighbor_map, neighbor_coords)
    eta_1 = jax.random.uniform(key, p_y.shape)
    eta_2 = eta_1 - jnp.sum(eta_1 * p_y, axis=-1, keepdims=True) / \
        (jnp.sum(p_y * p_y, axis=-1, keepdims=True) + 1e-10) * p_y
    eta = eta_2 / safe_norm(eta_2, keepdims=True)
    h1 = p_y / (safe_norm(p_y, keepdims=True) + 1e-10)
    h3_1 = jnp.cross(p_y, eta)
    h3 = h3_1 / (safe_norm(h3_1, keepdims=True) + 1e-10)
    h2 = -jnp.cross(h1, h3)
    return jnp.stack([h1, h2, h3], axis=-2)


def signed_volume(local_coords):
    """Sign of the tetrahedral volume (geomol_utils.py:301-313).
    local_coords [K, 4, C, 3] -> [K, C]."""
    v1 = local_coords[:, 0] - local_coords[:, 3]
    v2 = local_coords[:, 1] - local_coords[:, 3]
    v3 = local_coords[:, 2] - local_coords[:, 3]
    return jnp.sign(jnp.sum(v1 * jnp.cross(v2, v3), axis=-1))


def random_rotation_matrix(key, dim):
    yaw, pitch, roll = jax.random.uniform(key, (3,) + tuple(dim))
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    R = jnp.stack([
        jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
        jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
        jnp.stack([-sp, cp * sr, cp * cr], -1)], -2)
    return R


def build_alpha_rotation(sin_a, cos_a):
    """[..., 3, 3] rotation about the x-axis from sin/cos."""
    shape = sin_a.shape
    zeros = jnp.zeros(shape)
    ones = jnp.ones(shape)
    return jnp.stack([
        jnp.stack([ones, zeros, zeros], -1),
        jnp.stack([zeros, cos_a, -sin_a], -1),
        jnp.stack([zeros, sin_a, cos_a], -1)], -2)
