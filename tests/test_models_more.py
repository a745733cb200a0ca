"""Smoke + invariance tests for OGBGNN (GIN/GCN ± virtual node) and EGNN."""
import jax
import numpy as np
import pytest

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import EGNN, OGBGNN


def batches(num=5, seed=0, pad_extra=(0, 0, 0), use_3d=False):
    ds = SyntheticMolecules(num, seed=seed)
    graphs = [ds.graph3d(i) if use_3d else ds.graph2d(i) for i in range(num)]
    n = sum(g["node_feat"].shape[0] for g in graphs) + 5 + pad_extra[1]
    e = sum(g["senders"].shape[0] for g in graphs) + 9 + pad_extra[2]
    b = BucketSpec(num + pad_extra[0], n, e)
    return to_graph_batch(batch_graphs(graphs, b))


@pytest.mark.parametrize("gnn_type,virtual,pooling", [
    ("gin", False, "sum"),
    ("gin", True, "sum"),
    ("gcn", False, "mean"),
    ("gcn", True, "attention"),
    ("gin", False, "set2set"),
])
def test_ogbgnn_variants(gnn_type, virtual, pooling):
    g = batches()
    model = OGBGNN(target_dim=3, num_layers=2, hidden_dim=16,
                   gnn_type=gnn_type, virtual_node=virtual, dropout=0.0,
                   graph_pooling=pooling)
    vs = model.init(jax.random.key(0), g, deterministic=True)
    out, mut = model.apply(vs, g, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (g.num_graphs, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("virtual", [False, True])
def test_ogbgnn_padding_invariance(virtual):
    a = batches()
    b = batches(pad_extra=(3, 64, 128))
    model = OGBGNN(target_dim=2, num_layers=2, hidden_dim=16,
                   gnn_type="gin", virtual_node=virtual, dropout=0.0)
    vs = model.init(jax.random.key(0), a, deterministic=True)
    oa, ma = model.apply(vs, a, deterministic=False, mutable=["batch_stats"])
    ob, mb = model.apply(vs, b, deterministic=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob)[:a.num_graphs],
                               rtol=2e-4, atol=2e-4)
    for xs, xb in zip(jax.tree_util.tree_leaves(ma),
                      jax.tree_util.tree_leaves(mb)):
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xb), rtol=2e-4,
                                   atol=2e-4)


def test_egnn_forward_and_invariance():
    a = batches(use_3d=True)
    b = batches(use_3d=True, pad_extra=(2, 32, 256))
    model = EGNN(node_dim=9, hidden_dim=16, target_dim=8,
                 readout_aggregators=["min", "max", "mean"], batch_norm=True,
                 propagation_depth=2, reduce_func="mean")
    vs = model.init(jax.random.key(0), a, deterministic=True)
    oa, _ = model.apply(vs, a, deterministic=False, mutable=["batch_stats"])
    ob, _ = model.apply(vs, b, deterministic=False, mutable=["batch_stats"])
    assert oa.shape == (a.num_graphs, 8)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob)[:a.num_graphs],
                               rtol=2e-4, atol=2e-4)
    # E(3) invariance: rotating+translating coordinates must not change output
    import jax.numpy as jnp
    theta = 0.7
    R = jnp.asarray([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    a_rot = a.replace(coords=a.coords @ R.T + jnp.asarray([1.0, -2.0, 0.5]))
    oa_rot = model.apply(vs, a_rot, deterministic=True)
    oa_det = model.apply(vs, a, deterministic=True)
    np.testing.assert_allclose(np.asarray(oa_det), np.asarray(oa_rot),
                               rtol=1e-4, atol=1e-4)
