"""Native C collate core vs the numpy batch_graphs path: array-for-array
equality on every output key, across bucket configurations."""
import os

import numpy as np
import pytest

from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs
from infomax3d_tpu.native import load
from infomax3d_tpu.native.batcher import pack_batch_native

pytestmark = pytest.mark.skipif(load() is None,
                                reason="no C compiler for the native core")


def _mols(seed=0, n_graphs=24, with_zero_edge=True):
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(2, 14))
        if with_zero_edge and i == 3:
            e = 0
        else:
            e = int(rng.integers(1, 3 * n))
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        graphs.append(dict(
            node_feat=rng.integers(0, 5, (n, 4)).astype(np.int32),
            senders=src, receivers=dst,
            edge_feat=rng.integers(0, 3, (e, 2)).astype(np.int32),
            coords=rng.standard_normal((n, 3)).astype(np.float32),
            y=rng.standard_normal(7).astype(np.float32),
        ))
    return graphs


def _numpy_path(graphs, bucket, extras):
    os.environ["INFOMAX3D_NO_NATIVE"] = "1"
    try:
        return batch_graphs(graphs, bucket, extras)
    finally:
        del os.environ["INFOMAX3D_NO_NATIVE"]


def _assert_same(a, b):
    assert set(a.keys()) == set(b.keys()), (
        sorted(set(a) ^ set(b)))
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        assert x.dtype == y.dtype or (x.dtype == bool and y.dtype == bool), k
        assert x.shape == y.shape, (k, x.shape, y.shape)
        np.testing.assert_array_equal(x, y, err_msg=k)


@pytest.mark.parametrize("csr", [False, True])
@pytest.mark.parametrize("nmax", [0, 16])
def test_native_matches_numpy(csr, nmax):
    graphs = _mols()
    n_tot = sum(g["node_feat"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    max_deg = max((int(np.bincount(g["receivers"]).max()) if len(g["receivers"])
                   else 0) for g in graphs)
    max_out = max((int(np.bincount(g["senders"]).max()) if len(g["senders"])
                   else 0) for g in graphs)
    K = max(max_deg, max_out)
    bucket = BucketSpec(32, n_tot + 13, e_tot + 29, max_deg=K, csr=csr,
                        nmax=nmax)
    got = pack_batch_native(graphs, bucket, ("y",))
    assert got is not None
    ref = _numpy_path(graphs, bucket, ("y",))
    _assert_same(got, ref)


def test_native_no_mailbox_plain_bucket():
    graphs = _mols(seed=1, n_graphs=5)
    n_tot = sum(g["node_feat"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    bucket = BucketSpec(5, n_tot, e_tot)       # exact fit, no padding
    got = pack_batch_native(graphs, bucket)
    ref = _numpy_path(graphs, bucket, ())
    _assert_same(got, ref)


def test_native_single_graph():
    graphs = _mols(seed=2, n_graphs=1, with_zero_edge=False)
    bucket = BucketSpec(1, 64, 128, max_deg=16, csr=True, nmax=32)
    got = pack_batch_native(graphs, bucket)
    ref = _numpy_path(graphs, bucket, ())
    _assert_same(got, ref)


def test_native_degree_overflow_raises():
    g = dict(node_feat=np.zeros((3, 2), np.int32),
             senders=np.zeros(5, np.int32),
             receivers=np.zeros(5, np.int32))     # node 0 in-degree 5
    bucket = BucketSpec(1, 8, 16, max_deg=2)
    with pytest.raises(ValueError):
        pack_batch_native([g], bucket)


def test_batch_graphs_dispatches_native():
    """The public batch_graphs uses the C core by default (same output, so
    just check it runs and matches the opt-out path)."""
    graphs = _mols(seed=3, n_graphs=8)
    n_tot = sum(g["node_feat"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    bucket = BucketSpec(8, n_tot + 5, e_tot + 7)
    _assert_same(batch_graphs(graphs, bucket),
                 _numpy_path(graphs, bucket, ()))
