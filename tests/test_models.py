"""Model forward smoke + padding-invariance tests for PNA / Net3D."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import PNA, Net3D

PNA_KW = dict(hidden_dim=32, target_dim=16,
              aggregators=["mean", "max", "min", "std"],
              scalers=["identity", "amplification", "attenuation"],
              readout_aggregators=["min", "max", "mean"],
              readout_batchnorm=True, mid_batch_norm=True, last_batch_norm=True,
              propagation_depth=3, readout_layers=2, pretrans_layers=2,
              posttrans_layers=1, batch_norm_momentum=0.93, residual=True)

NET3D_KW = dict(hidden_dim=20, target_dim=16, readout_aggregators=["min", "max", "mean"],
                batch_norm=True, readout_batchnorm=True, batch_norm_momentum=0.93,
                node_wise_output_layers=0, message_net_layers=1, update_net_layers=1,
                reduce_func="mean", fourier_encodings=4, propagation_depth=1,
                readout_layers=1)


def build_batches(num=5, seed=0, pad_extra=(0, 0, 0)):
    ds = SyntheticMolecules(num, seed=seed)
    g2 = [ds.graph2d(i) for i in range(num)]
    g3 = [ds.graph3d(i) for i in range(num)]
    def mk(graphs):
        n = sum(g["node_feat"].shape[0] for g in graphs) + 5 + pad_extra[1]
        e = sum(g["senders"].shape[0] for g in graphs) + 9 + pad_extra[2]
        b = BucketSpec(n_graphs=num + pad_extra[0], n_nodes=n, n_edges=e)
        return to_graph_batch(batch_graphs(graphs, b))
    return mk(g2), mk(g3)


def test_pna_forward_masked():
    b2, _ = build_batches()
    model = PNA(**PNA_KW)
    vs = model.init(jax.random.key(0), b2, deterministic=True)
    out, mut = model.apply(vs, b2, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (b2.num_graphs, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert "batch_stats" in mut


def test_net3d_forward():
    _, b3 = build_batches()
    model = Net3D(**NET3D_KW)
    vs = model.init(jax.random.key(0), b3, deterministic=True)
    out = model.apply(vs, b3, deterministic=True)
    assert out.shape == (b3.num_graphs, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model_case", ["pna", "net3d"])
def test_padding_invariance(model_case):
    """Same molecules, different padding -> identical outputs AND identical
    batch-norm statistics (the masked-BN requirement of SURVEY.md §7)."""
    a2, a3 = build_batches()
    b2, b3 = build_batches(pad_extra=(3, 64, 128))
    if model_case == "pna":
        model, small, big = PNA(**PNA_KW), a2, b2
    else:
        model, small, big = Net3D(**NET3D_KW), a3, b3
    vs = model.init(jax.random.key(0), small, deterministic=True)
    out_s, mut_s = model.apply(vs, small, deterministic=False, mutable=["batch_stats"])
    out_b, mut_b = model.apply(vs, big, deterministic=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b)[:small.num_graphs],
                               rtol=2e-4, atol=2e-4)
    flat_s = jax.tree_util.tree_leaves(mut_s)
    flat_b = jax.tree_util.tree_leaves(mut_b)
    for xs, xb in zip(flat_s, flat_b):
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xb), rtol=2e-4, atol=2e-4)


def test_distance_predictor_registry_adapters():
    """PNADistancePredictor / Net3DDistancePredictor resolve from configs by
    the reference class names (pna_distance_predictor.py:16,
    net3d_distance_predictor.py:15)."""
    import jax.random as jr
    from infomax3d_tpu.models import MODEL_REGISTRY
    b2, b3 = build_batches()
    m = MODEL_REGISTRY["PNADistancePredictor"](
        hidden_dim=16, aggregators=["mean", "max"], scalers=["identity"],
        propagation_depth=1)
    vs = m.init(jr.key(0), b2, b3, deterministic=True)
    d = m.apply(vs, b2, b3, deterministic=True, mutable=["batch_stats"])[0]
    assert d.shape == (b3.num_edges, 1)
    assert np.isfinite(np.asarray(d)[np.asarray(b3.edge_mask)]).all()

    m2 = MODEL_REGISTRY["Net3DDistancePredictor"](
        hidden_dim=16, readout_aggregators=["mean", "max"],
        propagation_depth=1, fourier_encodings=4)
    vs2 = m2.init(jr.key(0), b3, deterministic=True)
    lat, dist = m2.apply(vs2, b3, deterministic=True,
                         mutable=["batch_stats"])[0]
    assert lat.shape == (b3.num_graphs, 32)
    assert dist.shape == (b3.num_edges,)
