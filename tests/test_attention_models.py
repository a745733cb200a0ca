"""SAN / TransformerPlain / PNATransformer / DistancePredictor tests."""
import jax
import jax.numpy as jnp
import numpy as np

from infomax3d_tpu.data.loader import get_collate
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import SAN, DistancePredictor, PNATransformer, TransformerPlain

MAXN = 32


def dense_items(num=5, seed=0, with_targets=False):
    ds = SyntheticMolecules(num, seed=seed, num_targets=2)
    items = []
    for i in range(num):
        it = {"graph2d": ds.graph2d(i)}
        if with_targets:
            it["targets"] = ds.targets[i]
        items.append(it)
    return items


def test_san_forward_and_padding():
    collate = get_collate("san_collate")
    items = dense_items()
    b1 = collate(items, BucketSpec(5, 0, 0), max_nodes=MAXN)["graph"]
    b2 = collate(items, BucketSpec(8, 0, 0), max_nodes=MAXN + 8)["graph"]
    model = SAN(GT_out_dim=24, readout_hidden_dim=24,
                readout_aggregators=["mean", "max"], target_dim=6,
                GT_hidden_dim=24, GT_n_heads=4, GT_layers=2, LPE_n_heads=2,
                LPE_layers=1, LPE_dim=8, gamma=0.1, full_graph=True)
    vs = model.init(jax.random.key(0), b1, deterministic=True)
    o1, _ = model.apply(vs, b1, deterministic=False, mutable=["batch_stats"])
    o2, _ = model.apply(vs, b2, deterministic=False, mutable=["batch_stats"])
    assert o1.shape == (5, 6)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2)[:5], rtol=2e-4,
                               atol=2e-4)


def test_san_real_edges_matter():
    """Real-vs-fake channel: permuting bond structure must change output."""
    collate = get_collate("san_collate")
    items = dense_items()
    b = collate(items, BucketSpec(5, 0, 0), max_nodes=MAXN)["graph"]
    model = SAN(GT_out_dim=24, readout_hidden_dim=24,
                readout_aggregators=["mean"], target_dim=4, GT_hidden_dim=24,
                GT_n_heads=4, GT_layers=1, LPE_n_heads=2, LPE_layers=1,
                LPE_dim=8, gamma=0.5, full_graph=True, batch_norm=False)
    vs = model.init(jax.random.key(0), b, deterministic=True)
    out = model.apply(vs, b, deterministic=True)
    b_noedges = b.replace(real_edge_mask=jnp.zeros_like(b.real_edge_mask))
    out2 = model.apply(vs, b_noedges, deterministic=True)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4


def test_transformer_plain():
    collate = get_collate("padded_collate_positional_encoding")
    items = dense_items(with_targets=True)
    b = collate(items, BucketSpec(6, 0, 0), max_nodes=MAXN)["graph"]
    model = TransformerPlain(hidden_dim=32, target_dim=2, nhead=4,
                             dim_feedforward=64, propagation_depth=2,
                             pos_enc_dim=16)
    vs = model.init(jax.random.key(0), b, deterministic=True)
    out, _ = model.apply(vs, b, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (6, 2)
    assert np.isfinite(np.asarray(out)).all()
    assert "targets" in b.extras


def test_pna_transformer():
    ds = SyntheticMolecules(5, seed=0)
    graphs = [ds.graph2d(i) for i in range(5)]
    b = to_graph_batch(batch_graphs(graphs, BucketSpec(5, 160, 512)))
    model = PNATransformer(hidden_dim=24, target_dim=8,
                           aggregators=["mean", "max"], scalers=["identity"],
                           readout_aggregators=["mean", "max"], max_nodes=MAXN,
                           nhead=4, dim_feedforward=48, propagation_depth=2)
    vs = model.init(jax.random.key(0), b, deterministic=True)
    out, _ = model.apply(vs, b, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (5, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_flat_dense_roundtrip():
    from infomax3d_tpu.models.transformer import dense_to_flat, flat_to_dense
    ds = SyntheticMolecules(4, seed=1)
    graphs = [ds.graph2d(i) for i in range(4)]
    g = to_graph_batch(batch_graphs(graphs, BucketSpec(4, 130, 400)))
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_nodes, 7)).astype(np.float32))
    dense = flat_to_dense(h, g, MAXN)
    back = dense_to_flat(dense, g)
    m = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(back)[m], np.asarray(h)[m], rtol=1e-6)


def test_distance_predictor():
    ds = SyntheticMolecules(4, seed=2)
    g2 = [ds.graph2d(i) for i in range(4)]
    g3 = [ds.graph3d(i) for i in range(4)]
    nb = BucketSpec(4, 130, 400)
    g = to_graph_batch(batch_graphs(g2, nb))
    pairs = to_graph_batch(batch_graphs(g3, BucketSpec(4, 130, 4096)))
    pna_args = dict(hidden_dim=24, aggregators=["mean", "max"],
                    scalers=["identity"], propagation_depth=2,
                    mid_batch_norm=True, last_batch_norm=True, dropout=0.0)
    for dn in (True, False):
        model = DistancePredictor(pna_args=pna_args, target_dim=1,
                                  distance_net=dn, transformer_layer=True,
                                  nhead=4, max_nodes=MAXN)
        vs = model.init(jax.random.key(0), g, pairs, deterministic=True)
        out, _ = model.apply(vs, g, pairs, deterministic=False,
                             mutable=["batch_stats"])
        assert out.shape == (pairs.num_edges, 1)
        assert np.isfinite(np.asarray(out)).all()
        if dn:
            assert (np.asarray(out) >= 0).all()   # softplus output


def test_distance_predictor_trainer(tmp_path):
    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.train.trainer import DistancePredictorTrainer

    class DS:
        def __init__(self):
            self.ds = SyntheticMolecules(16, seed=0)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"graph2d": self.ds.graph2d(i), "graph3d": self.ds.graph3d(i)}

    loader = GraphDataLoader(DS(), 8, "pairwise_distance_collate",
                             bucket=BucketSpec(8, 256, 1024), prefetch=0,
                             collate_kwargs={"bucket3d": BucketSpec(8, 256, 8192)})
    pna_args = dict(hidden_dim=16, aggregators=["mean", "max"],
                    scalers=["identity"], propagation_depth=1,
                    mid_batch_norm=True, last_batch_norm=True, dropout=0.0)
    model = DistancePredictor(pna_args=pna_args, target_dim=1,
                              distance_net=True, transformer_layer=False,
                              max_nodes=MAXN)
    tr = DistancePredictorTrainer(
        {"model": model},
        dict(num_epochs=3, patience=10, minimum_epochs=0, log_iterations=1,
             val_per_batch=True, optimizer="Adam", optimizer_params={"lr": 5e-3},
             lr_scheduler=None, transfer_layers=[], frozen_layers=[],
             exclude_from_transfer=[], models_to_save=[], checkpoint=None),
        metrics={}, main_metric="loss", run_dir=str(tmp_path / "dp"),
        loss_name="L1Loss", use_tensorboard=False)
    result = tr.train(loader, loader)
    assert np.isfinite(result["L1Loss"])
    import json, os
    losses = [json.loads(l)["L1Loss"]
              for l in open(os.path.join(tr.run_dir, "metrics.jsonl"))
              if json.loads(l)["split"] == "train"]
    assert losses[-1] < losses[0]


def test_dense_egnn():
    from infomax3d_tpu.data.loader import get_collate
    from infomax3d_tpu.models import DenseEGNN
    ds = SyntheticMolecules(4, seed=1)
    items = [{"graph2d": ds.graph2d(i), "targets": ds.targets[i]}
             for i in range(4)]
    b = get_collate("egnn_padded_collate")(items, BucketSpec(4, 0, 0),
                                           max_nodes=MAXN)["graph"]
    model = DenseEGNN(in_node_nf=9, hidden_dim=24, target_dim=3, n_layers=2)
    vs = model.init(jax.random.key(0), b)
    out = model.apply(vs, b)
    assert out.shape == (4, 3)
    assert np.isfinite(np.asarray(out)).all()
    # E(3) invariance of the scalar readout under rotation (h-channel only)
    import jax.numpy as jnp
    theta = 0.5
    R = jnp.asarray(np.array([[np.cos(theta), -np.sin(theta), 0],
                              [np.sin(theta), np.cos(theta), 0],
                              [0, 0, 1.0]], np.float32))
    b_rot = b.replace(coords=b.coords @ R.T)
    out_rot = model.apply(vs, b_rot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rot),
                               rtol=1e-4, atol=1e-4)
