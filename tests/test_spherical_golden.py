"""Golden parity: numeric Bessel/spherical-harmonic recurrences vs the
reference's sympy-generated formulas (commons/spherical_encoding.py), plus
SMP model smoke tests."""
import sys
import types

import math

import numpy as np
import pytest

np.math = math  # the reference uses np.math.factorial (removed in numpy>=1.25)

sys.path.insert(0, "/root/reference")
import torch  # noqa: E402


def _scatter_add(src, index, dim=0, dim_size=None):
    assert dim == 0
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


# import reference module with torch-only deps stubbed — the stubs must be
# FUNCTIONAL (test_layer_golden_ext's SMP golden calls scatter through the
# same sys.modules entry, whichever test file imports first)
for mod in ("torch_scatter", "torch_sparse"):
    if mod not in sys.modules:
        stub = types.ModuleType(mod)
        stub.scatter = _scatter_add
        stub.scatter_sum = _scatter_add
        stub.SparseTensor = type("SparseTensor", (), {})
        sys.modules[mod] = stub
from commons import spherical_encoding as ref  # noqa: E402

sys.path.pop(0)

import jax.numpy as jnp  # noqa: E402

from infomax3d_tpu.ops import spherical as sph  # noqa: E402

L, K = 4, 5
RNG = np.random.default_rng(0)


def test_bessel_zeros_match():
    np.testing.assert_allclose(sph.bessel_zeros(L, K), ref.Jn_zeros(L, K),
                               rtol=1e-5)


def test_bessel_basis_matches_sympy():
    import sympy as sym
    forms = ref.bessel_basis(L, K)
    x = np.linspace(0.05, 1.0, 40)
    got = np.asarray(sph.bessel_rbf(jnp.asarray(x), L, K))  # [40, L, K]
    xs = sym.symbols("x")
    for l in range(L):
        for k in range(K):
            f = sym.lambdify([xs], forms[l][k], "numpy")
            np.testing.assert_allclose(got[:, l, k], f(x), rtol=2e-3,
                                       atol=2e-4, err_msg=f"l={l} k={k}")


def test_sph_harm_m0_matches_sympy():
    import sympy as sym
    forms = ref.real_sph_harm(L, zero_m_only=True)
    theta = np.linspace(0.01, np.pi - 0.01, 37)
    got = np.asarray(sph.real_sph_harm_m0(jnp.asarray(theta), L))
    th = sym.symbols("theta")
    for l in range(L):
        f = sym.lambdify([th], forms[l][0], "numpy")
        expect = f(theta) if l > 0 else np.full_like(theta, float(forms[0][0]))
        np.testing.assert_allclose(got[:, l], expect, rtol=1e-4, atol=1e-5,
                                   err_msg=f"l={l}")


def test_sph_harm_full_matches_sympy():
    import sympy as sym
    forms = ref.real_sph_harm(L, zero_m_only=False)
    theta = np.linspace(0.01, np.pi - 0.01, 23)
    phi = np.linspace(-np.pi + 0.01, np.pi - 0.01, 23)
    got = np.asarray(sph.real_sph_harm_full(jnp.asarray(theta),
                                            jnp.asarray(phi), L))
    th, ph = sym.symbols("theta phi")
    # reference list layout per l: index 0 -> m=0, j -> m=+j, -j -> m=-j
    for l in range(L):
        for m in range(-l, l + 1):
            expr = forms[l][m]          # python negative indexing == ref's
            f = sym.lambdify([th, ph], expr, "numpy")
            expect = f(theta, phi)
            expect = np.broadcast_to(expect, theta.shape)
            np.testing.assert_allclose(got[:, l, L - 1 + m], expect,
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"l={l} m={m}")


def test_envelope_and_dist_emb_match_torch():
    x = RNG.uniform(0.05, 1.0, size=50).astype(np.float32)
    env_ref = ref.Envelope(5)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(sph.envelope(jnp.asarray(x), 5)),
                               env_ref, rtol=1e-4, atol=1e-5)
    with torch.no_grad():   # reference reset_parameters breaks on torch>=2
        de = ref.dist_emb(num_radial=6, cutoff=5.0, envelope_exponent=5)
    d = RNG.uniform(0.5, 4.9, size=30).astype(np.float32)
    expect = de(torch.from_numpy(d)).detach().numpy()
    freq = jnp.arange(1, 7) * np.pi
    got = np.asarray(sph.dist_emb(jnp.asarray(d), freq, 5.0, 5))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_smp_featurize_and_model():
    import jax
    from infomax3d_tpu.data.loader import get_collate
    from infomax3d_tpu.data.smp_featurize import smp_featurize
    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import BucketSpec
    from infomax3d_tpu.models import SMP

    ds = SyntheticMolecules(3, seed=0, n_max=10)
    feats = smp_featurize(ds.graph2d(0)["coords"], cutoff=5.0)
    e = len(feats["senders"])
    assert feats["idx_kj"].max(initial=-1) < e
    # triplet angles in [0, pi], torsions in [0, 2pi]
    assert (feats["angle"] >= 0).all() and (feats["angle"] <= np.pi).all()
    assert (feats["torsion"] >= 0).all() and (feats["torsion"] <= 2 * np.pi + 1e-6).all()

    items = [{"graph2d": ds.graph2d(i), "targets": ds.targets[i]}
             for i in range(3)]
    batch = get_collate("smp_collate")(items, BucketSpec(3, 64, 1024),
                                       cutoff=5.0, n_triplets=8192)
    g = batch["graph"]
    model = SMP(hidden_channels=32, target_dim=4, int_emb_size=16,
                basis_emb_size=4, out_emb_size=32, num_spherical=3,
                num_radial=4, propagation_depth=2)
    vs = model.init(jax.random.key(0), g, deterministic=True)
    out = model.apply(vs, g, deterministic=True)
    assert out.shape == (3, 4)
    assert np.isfinite(np.asarray(out)).all()

    # padding invariance
    batch2 = get_collate("smp_collate")(items, BucketSpec(5, 96, 2048),
                                        cutoff=5.0, n_triplets=10000)
    out2 = model.apply(vs, batch2["graph"], deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2)[:3],
                               rtol=2e-4, atol=2e-4)
