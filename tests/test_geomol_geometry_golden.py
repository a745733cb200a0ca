"""Golden parity for the GeoMol geometry kernels (ops/geomol_geometry.py)
vs the ACTUAL reference torch code (commons/geomol_utils.py) — these shape
every term of the OT conformer loss (local stats, dihedrals, von Mises,
signed volume).

torch_geometric / networkx are stubbed (geomol_utils only touches them in
graph-construction helpers this test does not call)."""
import sys
import types

import numpy as np
import torch

# install the canonical reference-import stubs (dgl/ogb via
# test_layer_golden, torch_geometric/torch_scatter/torch_sparse via
# test_layer_golden_ext) so test-file import order cannot leave a
# partially-populated stub for the other golden files
import test_layer_golden_ext  # noqa: F401

# networkx is NOT stubbed — it is actually installed, our own
# data/geomol_featurize.py uses it, and a bare module stub (no __spec__)
# breaks torch's lazy importlib probing for the whole process
if "torch_geometric.utils" not in sys.modules:
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.degree = lambda idx, num_nodes=None: torch.bincount(
        idx, minlength=num_nodes or 0).float()
    sys.modules["torch_geometric"].utils = tg_utils
    sys.modules["torch_geometric.utils"] = tg_utils

for pkg, path in (("commons", "/root/reference/commons"),):
    if pkg not in sys.modules or not hasattr(sys.modules[pkg], "__path__"):
        mod = types.ModuleType(pkg)
        mod.__path__ = [path]
        sys.modules[pkg] = mod

sys.path.insert(0, "/root/reference")
from commons import geomol_utils as ref  # noqa: E402

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infomax3d_tpu.ops import geomol_geometry as mine  # noqa: E402


def _coords(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def test_batch_dihedrals_golden():
    rng = np.random.default_rng(0)
    p = [_coords(rng, 7, 5, 3) for _ in range(4)]
    sin_r, cos_r = ref.batch_dihedrals(*[torch.from_numpy(x) for x in p])
    sin_m, cos_m = mine.batch_dihedrals(*[jnp.asarray(x) for x in p])
    np.testing.assert_allclose(np.asarray(sin_m), sin_r.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cos_m), cos_r.numpy(),
                               rtol=1e-4, atol=1e-5)
    ang_r = ref.batch_dihedrals(*[torch.from_numpy(x) for x in p], angle=True)
    ang_m = mine.batch_dihedrals(*[jnp.asarray(x) for x in p], angle=True)
    np.testing.assert_allclose(np.asarray(ang_m), ang_r.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_von_mises_loss_golden():
    rng = np.random.default_rng(1)
    a, b = _coords(rng, 9, 4), _coords(rng, 9, 4)
    a_sin, b_sin = _coords(rng, 9, 4), _coords(rng, 9, 4)
    r = ref.von_Mises_loss(torch.from_numpy(a), torch.from_numpy(b),
                           torch.from_numpy(a_sin), torch.from_numpy(b_sin))
    m = mine.von_mises_loss(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(a_sin), jnp.asarray(b_sin))
    np.testing.assert_allclose(np.asarray(m), r.numpy(), rtol=1e-5, atol=1e-6)


def test_signed_volume_golden():
    rng = np.random.default_rng(2)
    local = _coords(rng, 6, 4, 5, 3)       # [pairs, 4 nbrs, confs, 3]
    r = ref.signed_volume(torch.from_numpy(local))
    m = mine.signed_volume(jnp.asarray(local))
    np.testing.assert_allclose(np.asarray(m), r.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_local_stats_golden():
    rng = np.random.default_rng(3)
    coords = _coords(rng, 8, 4, 5, 3)      # [centers, max_nbrs, confs, 3]
    mask = (rng.random((8, 4)) < 0.8).astype(np.float32)
    mask[:, 0] = 1.0
    d_r, d2_r, ang_r = ref.batch_local_stats_from_coords(
        torch.from_numpy(coords), torch.from_numpy(mask))
    d_m, d2_m, ang_m = mine.batch_local_stats_from_coords(
        jnp.asarray(coords), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(d_m), d_r.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2_m), d2_r.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ang_m), ang_r.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_rotation_matrix_v2_frame_properties():
    """rotation_matrix_v2 draws a random azimuthal auxiliary vector (the
    reference uses torch.rand_like; ours an explicit key), so exact parity
    is undefined — instead both must produce a right-handed orthonormal
    frame whose FIRST row is p_Y normalized (that row is deterministic and
    must match the reference's)."""
    rng = np.random.default_rng(4)
    nbr = _coords(rng, 6, 4, 5, 3)
    nmap = np.zeros((6, 4), np.float32)
    nmap[:, 1] = 1.0
    H_r = ref.rotation_matrix_v2(torch.from_numpy(nbr),
                                 torch.from_numpy(np.ones((6, 4), np.float32)),
                                 torch.from_numpy(nmap)).numpy()
    H_m = np.asarray(mine.rotation_matrix_v2(jnp.asarray(nbr),
                                             jnp.asarray(nmap),
                                             jax.random.key(0)))
    assert H_m.shape == H_r.shape
    # first row: p_Y / |p_Y| — deterministic, must agree
    np.testing.assert_allclose(H_m[..., 0, :], H_r[..., 0, :],
                               rtol=1e-4, atol=1e-5)
    for H in (H_m,):
        eye = np.einsum("...ij,...kj->...ik", H, H)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-4)
        det = np.linalg.det(H)
        np.testing.assert_allclose(det, np.ones_like(det), atol=1e-4)


def test_fourier_encode_dist_golden():
    """ops/encodings.py::fourier_encode_dist vs the reference
    commons/utils.py:103-110 (sin/cos over power-of-two scales + self)."""
    import collections
    import collections.abc
    collections.MutableMapping = collections.abc.MutableMapping
    # commons/utils.py imports dgl + tensorboard at module level; reuse the
    # dgl stub installed by test_layer_golden — tensorboard is real here
    # (never stub an installed package: the networkx lesson above)
    import test_layer_golden  # noqa: F401  (installs dgl/ogb stubs)
    import torch.utils.tensorboard  # noqa: F401
    sys.path.insert(0, "/root/reference")
    from commons.utils import fourier_encode_dist as ref_fourier
    sys.path.pop(0)
    from infomax3d_tpu.ops.encodings import fourier_encode_dist

    rng = np.random.default_rng(5)
    d = (rng.random(23) * 8).astype(np.float32)
    for k in (1, 4, 7):
        r = ref_fourier(torch.from_numpy(d), num_encodings=k).numpy()
        m = np.asarray(fourier_encode_dist(jnp.asarray(d), num_encodings=k))
        np.testing.assert_allclose(m, r, rtol=1e-5, atol=1e-6)


def test_laplacian_pe_golden():
    """data/featurize.py::laplacian_pe vs the reference's exact torch math
    (qm9_dataset.py:403-419) — including the `N * L * N` broadcasting quirk
    (1-D N broadcasts as a ROW both times, scaling columns by N_j^2 rather
    than the symmetric N_i L_ij N_j).  Eigenvectors compared up to the
    per-column sign eigh leaves free."""
    import torch.nn.functional as F

    from infomax3d_tpu.data.featurize import laplacian_pe

    rng = np.random.default_rng(6)
    n = 9
    src = np.arange(1, n)
    dst = rng.integers(0, np.maximum(np.arange(1, n), 1))
    senders = np.concatenate([src, dst]).astype(np.int32)
    receivers = np.concatenate([dst, src]).astype(np.int32)

    adj = torch.zeros((n, n))
    adj[senders, receivers] = 1.0
    max_freqs = 10
    D = torch.diag(adj.sum(dim=0))
    L = D - adj
    N = adj.sum(dim=0) ** -0.5
    L_sym = torch.eye(n) - N * L * N
    eig_vals, eig_vecs = torch.linalg.eigh(L_sym)
    idx = eig_vals.argsort()[0:max_freqs]
    eig_vals, eig_vecs = eig_vals[idx], eig_vecs[:, idx]
    eig_vecs = eig_vecs[:, eig_vals.argsort()]
    eig_vecs = F.normalize(eig_vecs, p=2, dim=1, eps=1e-12)
    eig_vecs = F.pad(eig_vecs, (0, max_freqs - n), value=float("nan"))
    eig_vals = F.pad(eig_vals, (0, max_freqs - n), value=float("nan"))

    vals_m, vecs_m = laplacian_pe(senders, receivers, n, max_freqs)
    np.testing.assert_allclose(vals_m[:n], eig_vals.numpy()[:n],
                               rtol=1e-4, atol=1e-5)
    assert np.isnan(vals_m[n:]).all() and np.isnan(vecs_m[:, n:]).all()
    ref_v, my_v = eig_vecs.numpy()[:, :n], vecs_m[:, :n]
    # eigh leaves the basis free within (near-)degenerate eigenspaces —
    # compare the spectral PROJECTORS per eigenvalue cluster instead of
    # raw columns (also covers the per-column sign freedom).  Note the
    # reference L2-normalizes vectors along dim=1 (per NODE, across
    # frequencies), so within a cluster the projector uses the raw eigh
    # vectors before that normalization; cluster on eigenvalues and
    # re-orthonormalize each cluster's columns first.
    def projectors(vals, vecs):
        out, start = [], 0
        for i in range(1, len(vals) + 1):
            if i == len(vals) or vals[i] - vals[start] > 1e-5:
                q, _ = np.linalg.qr(vecs[:, start:i])
                out.append(q @ q.T)
                start = i
        return out
    for pm, pr in zip(projectors(vals_m[:n], my_v),
                      projectors(eig_vals.numpy()[:n], ref_v)):
        np.testing.assert_allclose(pm, pr, atol=1e-4)
