"""GraphBatch batcher tests: padding invariance is the keystone property."""
import numpy as np
import jax.numpy as jnp

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import (
    BucketSpec, batch_graphs, make_bucket_ladder, pick_bucket, to_graph_batch,
)
from infomax3d_tpu.ops.segment import graph_readout, segment_sum


def make_batch(num=6, seed=0, bucket=None, extras=("targets",)):
    ds = SyntheticMolecules(num, seed=seed)
    graphs = [dict(ds.graph2d(i), targets=ds.targets[i]) for i in range(num)]
    n_tot = sum(g["node_feat"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    if bucket is None:
        bucket = BucketSpec(n_graphs=num + 2, n_nodes=n_tot + 17, n_edges=e_tot + 33)
    arrays = batch_graphs(graphs, bucket, extras_keys=list(extras))
    return graphs, arrays, bucket


def test_batch_layout():
    graphs, arrays, bucket = make_batch()
    n_tot = sum(g["node_feat"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    assert arrays["node_feat"].shape[0] == bucket.n_nodes
    assert arrays["node_mask"].sum() == n_tot
    assert arrays["edge_mask"].sum() == e_tot
    # padding edges point out of range, padding nodes map to graph id G
    assert (arrays["senders"][e_tot:] == bucket.n_nodes).all()
    assert (arrays["node_graph"][n_tot:] == bucket.n_graphs).all()
    # offsets: first edge of graph 1 references nodes >= n_0
    n0 = graphs[0]["node_feat"].shape[0]
    e0 = graphs[0]["senders"].shape[0]
    assert (arrays["senders"][e0:e0 + 4] >= n0).all()
    np.testing.assert_array_equal(arrays["targets"][:len(graphs)],
                                  np.stack([g["targets"] for g in graphs]))


def test_padding_invariance():
    """Same molecules in two bucket sizes -> identical per-graph readouts."""
    graphs, a1, b1 = make_batch()
    b2 = BucketSpec(n_graphs=b1.n_graphs + 5, n_nodes=b1.n_nodes + 128,
                    n_edges=b1.n_edges + 256)
    a2 = batch_graphs(graphs, b2, extras_keys=["targets"])
    g1, g2 = to_graph_batch(a1), to_graph_batch(a2)
    feat1 = jnp.asarray(a1["node_feat"][:, :3], jnp.float32)
    feat2 = jnp.asarray(a2["node_feat"][:, :3], jnp.float32)
    r1 = graph_readout(feat1, g1.node_graph, len(graphs), ["min", "max", "mean", "sum"])
    r2 = graph_readout(feat2, g2.node_graph, len(graphs), ["min", "max", "mean", "sum"])
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
    # edge scatter also invariant
    s1 = segment_sum(jnp.ones((g1.num_edges, 1)), g1.receivers, g1.num_nodes)
    s2 = segment_sum(jnp.ones((g2.num_edges, 1)), g2.receivers, g2.num_nodes)
    np.testing.assert_allclose(np.asarray(s1)[:g1.num_nodes].sum(),
                               np.asarray(s2).sum())


def test_bucket_ladder():
    rng = np.random.default_rng(0)
    nodes = rng.integers(4, 30, size=1000)
    edges = nodes * 2
    ladder = make_bucket_ladder(batch_size=32, node_counts=nodes, edge_counts=edges)
    assert all(b.n_nodes % 128 == 0 for b in ladder)
    b = pick_bucket(ladder, 32 * 10, 32 * 20)
    assert b.n_nodes >= 320


def test_random_conformer_sampling(tmp_path):
    """complete_graph_random_conformer semantics (reference
    qmugs_dataset.py:187-193): each access serves one uniformly sampled
    stored conformer's coordinates."""
    import numpy as np
    from infomax3d_tpu.data.cached import CachedMoleculeDataset
    rng = np.random.default_rng(0)
    n, C = 5, 4
    cache = dict(
        atom_features=rng.integers(0, 3, (n, 9)).astype(np.int32),
        edge_features=rng.integers(0, 2, (4, 3)).astype(np.int32),
        edge_indices=np.array([[0, 1, 1, 2], [1, 0, 2, 1]], np.int64),
        atom_slices=np.array([0, n], np.int64),
        edge_slices=np.array([0, 4], np.int64),
        coordinates=rng.standard_normal((n, C, 3)).astype(np.float32),
    )
    path = tmp_path / "processed.npz"
    np.savez(path, **cache)
    ds = CachedMoleculeDataset(str(path), random_conformer=True, seed=1)
    seen = set()
    for _ in range(40):
        coords = ds[0]["graph3d"]["coords"]
        for c in range(C):
            if np.allclose(coords, cache["coordinates"][:, c]):
                seen.add(c)
    assert len(seen) >= 3   # samples across the conformer set
    fixed = CachedMoleculeDataset(str(path))
    assert np.allclose(fixed[0]["graph3d"]["coords"],
                       cache["coordinates"][:, 0])


def test_loader_prefetch_propagates_errors():
    """A collate failure inside the prefetch worker thread must surface as
    the original exception, not silently end iteration (it previously
    surfaced as a bogus StopIteration)."""
    import pytest

    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.data.synthetic import SyntheticMolecules

    class DS:
        def __init__(self):
            self.ds = SyntheticMolecules(8, seed=0, n_min=10, n_max=14)

        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"graph2d": self.ds.graph2d(i)}

    tiny = BucketSpec(8, 4, 4)           # guaranteed overflow
    loader = GraphDataLoader(DS(), 8, "graph_only_collate", bucket=tiny,
                             prefetch=2)
    with pytest.raises(ValueError, match="bucket"):
        next(iter(loader))
