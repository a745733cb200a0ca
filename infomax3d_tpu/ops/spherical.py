"""Spherical message-passing bases — TPU-native DimeNet++/SphereNet math
(reference `commons/spherical_encoding.py:21-273`).

The reference generates sympy formula strings and lambdifies them per call.
Here the same functions are evaluated with NUMERIC recurrences in jnp
(spherical Bessel j_l via upward recurrence, Legendre / associated Legendre
via standard recurrences) — jit-friendly, no symbolic dependency at runtime.
Bessel zeros come from scipy.brentq once at module build (host, cached).

Verified against the sympy-generated reference formulas in
tests/test_spherical_golden.py.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def bessel_zeros(n: int, k: int) -> np.ndarray:
    """First k positive zeros of spherical Bessel j_0..j_{n-1}
    (reference Jn_zeros, spherical_encoding.py:25-37)."""
    from scipy import special as sp
    from scipy.optimize import brentq

    def Jn(r, order):
        return np.sqrt(np.pi / (2 * r)) * sp.jv(order + 0.5, r)

    zerosj = np.zeros((n, k), dtype="float64")
    zerosj[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi
    racines = np.zeros(k + n - 1, dtype="float64")
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = brentq(Jn, points[j], points[j + 1], (i,))
        points = racines.copy()
        zerosj[i][:k] = racines[:k]
    return zerosj


@functools.lru_cache(maxsize=None)
def bessel_normalizers(n: int, k: int) -> np.ndarray:
    from scipy import special as sp
    zeros = bessel_zeros(n, k)

    def Jn(r, order):
        return np.sqrt(np.pi / (2 * r)) * sp.jv(order + 0.5, r)

    norm = np.zeros((n, k))
    for order in range(n):
        for i in range(k):
            norm[order, i] = 1.0 / np.sqrt(0.5 * Jn(zeros[order, i], order + 1) ** 2)
    return norm


def spherical_jn(x: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """j_0..j_{n_max-1}(x) stacked on the last axis: upward recurrence
    j_{l+1} = (2l+1)/x * j_l - j_{l-1}, with a small-x Taylor fallback
    (the recurrence loses precision for x << l)."""
    x = jnp.where(jnp.abs(x) < 1e-8, 1e-8, x)
    j0 = jnp.sin(x) / x
    out = [j0]
    if n_max > 1:
        j1 = jnp.sin(x) / x ** 2 - jnp.cos(x) / x
        out.append(j1)
        for l in range(1, n_max - 1):
            out.append((2 * l + 1) / x * out[l] - out[l - 1])
    stacked = jnp.stack(out, axis=-1)
    if n_max > 2:
        # series: j_l(x) ~ x^l / (2l+1)!! * (1 - x^2/(2(2l+3)))
        series = []
        for l in range(n_max):
            dfact = float(np.prod(np.arange(2 * l + 1, 0, -2)))
            series.append(x ** l / dfact * (1 - x * x / (2 * (2 * l + 3))))
        series = jnp.stack(series, axis=-1)
        stacked = jnp.where(x[..., None] < 0.5, series, stacked)
    return stacked


def legendre_p(z: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """P_0..P_{l_max-1}(z) stacked on the last axis."""
    out = [jnp.ones_like(z)]
    if l_max > 1:
        out.append(z)
        for l in range(2, l_max):
            out.append(((2 * l - 1) * z * out[l - 1] - (l - 1) * out[l - 2]) / l)
    return jnp.stack(out, axis=-1)


def assoc_legendre(z: jnp.ndarray, l_max: int):
    """P_l^m(z) for 0<=m<=l<l_max as dict[(l,m)] using the reference's
    recurrences (no Condon-Shortley beyond the (1-2m) factor it uses).
    NOTE: the reference substitutes z=cos(theta) WITHOUT the sin(theta)^m
    factor sqrt(1-z^2)^m — its P_l_m[i][i] = (1-2i) * P_{i-1}^{i-1}, a pure
    constant — preserved exactly."""
    P = {}
    P[(0, 0)] = jnp.ones_like(z)
    if l_max > 1:
        P[(1, 0)] = z
        for l in range(2, l_max):
            P[(l, 0)] = ((2 * l - 1) * z * P[(l - 1, 0)] -
                         (l - 1) * P[(l - 2, 0)]) / l
        for m in range(1, l_max):
            P[(m, m)] = (1 - 2 * m) * P[(m - 1, m - 1)]
            if m + 1 < l_max:
                P[(m + 1, m)] = (2 * m + 1) * z * P[(m, m)]
            for l in range(m + 2, l_max):
                P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)] -
                             (l + m - 1) * P[(l - 2, m)]) / (l - m)
    return P


def sph_harm_prefactor(l: int, m: int) -> float:
    return math.sqrt((2 * l + 1) * math.factorial(l - abs(m)) /
                     (4 * math.pi * math.factorial(l + abs(m))))


def real_sph_harm_m0(theta: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Y_l^0(theta) for l<l_max: prefactor * P_l(cos theta)."""
    P = legendre_p(jnp.cos(theta), l_max)
    pref = jnp.asarray([sph_harm_prefactor(l, 0) for l in range(l_max)])
    return P * pref


def real_sph_harm_full(theta: jnp.ndarray, phi: jnp.ndarray,
                       l_max: int) -> jnp.ndarray:
    """All real Y_l^m for |m|<=l<l_max, stacked [..., l_max, 2*l_max-1] with
    m index offset by l (entries for |m|>l are zero) — reference
    real_sph_harm with zero_m_only=False, spherical coordinates.

    Reference quirk preserved: its C_m/S_m substitution uses
    x=sin(theta)cos(phi), y=sin(theta)sin(phi) giving cos/sin(m phi) *
    sin(theta)^m, and its associated Legendre lacks the sin^m factor — the
    product reproduces the standard real harmonics."""
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    P = assoc_legendre(ct, l_max)
    # C_m = cos(m phi) * sin(theta)^m, S_m = sin(m phi) * sin(theta)^m via the
    # reference's x/y recurrence
    x = st * jnp.cos(phi)
    y = st * jnp.sin(phi)
    C = [jnp.ones_like(x)]
    S = [jnp.zeros_like(x)]
    for m in range(1, l_max):
        S.append(x * S[m - 1] + y * C[m - 1])
        C.append(x * C[m - 1] - y * S[m - 1])
    out = jnp.zeros(theta.shape + (l_max, 2 * l_max - 1))
    for l in range(l_max):
        out = out.at[..., l, l_max - 1].set(sph_harm_prefactor(l, 0) * P[(l, 0)])
        for m in range(1, l + 1):
            out = out.at[..., l, l_max - 1 + m].set(
                math.sqrt(2) * sph_harm_prefactor(l, m) * C[m] * P[(l, m)])
            out = out.at[..., l, l_max - 1 - m].set(
                math.sqrt(2) * sph_harm_prefactor(l, -m) * S[m] * P[(l, m)])
    return out


def envelope(x: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """Smooth cutoff envelope (reference Envelope, spherical_encoding.py:159-172)."""
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    xp0 = x ** (p - 1)
    return 1.0 / x + a * xp0 + b * xp0 * x + c * xp0 * x * x


def dist_emb(dist: jnp.ndarray, freq: jnp.ndarray, cutoff: float,
             envelope_exponent: int) -> jnp.ndarray:
    """Radial Bessel embedding with learned frequencies (dist_emb.forward)."""
    d = (dist / cutoff)[..., None]
    return envelope(d, envelope_exponent) * jnp.sin(freq * d)


def bessel_rbf(dist_scaled: jnp.ndarray, num_spherical: int,
               num_radial: int) -> jnp.ndarray:
    """Normalized spherical-Bessel basis rbf[l, n](d) flattened [..., l*n]
    (the sympy bessel_basis evaluated numerically)."""
    zeros = jnp.asarray(bessel_zeros(num_spherical, num_radial))     # [L, K]
    norm = jnp.asarray(bessel_normalizers(num_spherical, num_radial))
    x = dist_scaled[..., None, None] * zeros                         # [..., L, K]
    vals = []
    for l in range(num_spherical):
        vals.append(spherical_jn(x[..., l, :], num_spherical)[..., l])
    j = jnp.stack(vals, axis=-2)                                     # [..., L, K]
    return j * norm


def angle_emb(dist: jnp.ndarray, angle: jnp.ndarray, idx_kj: jnp.ndarray,
              num_spherical: int, num_radial: int,
              cutoff: float) -> jnp.ndarray:
    """[T, num_spherical*num_radial] angular basis (angle_emb.forward)."""
    rbf = bessel_rbf(dist / cutoff, num_spherical, num_radial)       # [E, L, K]
    cbf = real_sph_harm_m0(angle, num_spherical)                     # [T, L]
    E = rbf.shape[0]
    out = (jnp.take(rbf, idx_kj.clip(0, E - 1), axis=0) *
           cbf[..., None])
    return out.reshape(out.shape[0], num_spherical * num_radial)


def torsion_emb(dist: jnp.ndarray, angle: jnp.ndarray, phi: jnp.ndarray,
                idx_kj: jnp.ndarray, num_spherical: int, num_radial: int,
                cutoff: float) -> jnp.ndarray:
    """[T, num_spherical^2*num_radial] torsion basis (torsion_emb.forward).

    Reference layout: rbf[T,1,L,K] * cbf[T,L,L',1] where cbf rows l hold the
    2l+1 real harmonics padded into an [L, L] grid by repetition of the
    reference's flat stacking: for l=0 a single func repeated L times? —
    no: the reference stacks 1 + sum(2l+1) funcs then VIEWS as [L, L].
    sum_{l<L}(2l+1) = L^2, matching the view; we reproduce that flat order.
    """
    rbf = bessel_rbf(dist / cutoff, num_spherical, num_radial)       # [E, L, K]
    full = real_sph_harm_full(angle, phi, num_spherical)             # [T, L, 2L-1]
    # reference storage order per l: [m=0, +1..+l, -l..-1]; its torsion loop
    # walks that storage order, so we must too
    cols = [full[..., 0, num_spherical - 1]]                         # Y_0^0
    for l in range(1, num_spherical):
        ms = list(range(0, l + 1)) + list(range(-l, 0))
        for m in ms:
            cols.append(full[..., l, num_spherical - 1 + m])
    cbf = jnp.stack(cols, axis=-1)                                   # [T, L^2]
    T = cbf.shape[0]
    E = rbf.shape[0]
    rbf_kj = jnp.take(rbf, idx_kj.clip(0, E - 1), axis=0)            # [T, L, K]
    out = (rbf_kj[:, None, :, :] *
           cbf.reshape(T, num_spherical, num_spherical, 1))
    return out.reshape(T, num_spherical * num_spherical * num_radial)
