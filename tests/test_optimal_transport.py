"""GeoMol OT conformer model + trainer tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infomax3d_tpu.data.geomol_featurize import geomol_featurize
from infomax3d_tpu.data.loader import GraphDataLoader, get_collate
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec
from infomax3d_tpu.models import OptimalTransportModel

HP = dict(hidden_dim=16, random_vec_dim=4, random_vec_std=1.0,
          global_transformer=False, loss_type="implicit_mle",
          teacher_force=False, random_alpha=False, n_true_confs=2,
          n_model_confs=3, encoder={"n_head": 2}, coord_pred={"n_layers": 1},
          d_mlp={"n_layers": 1}, h_mol_mlp={"n_layers": 1},
          alpha_mlp={"n_layers": 1}, c_mlp={"n_layers": 1})
GNN = dict(hidden_dim=16, aggregators=["mean", "max"], scalers=["identity"],
           propagation_depth=1, pretrans_layers=1, posttrans_layers=1)


def make_batch(num=3, seed=0):
    ds = SyntheticMolecules(num, seed=seed, n_min=5, n_max=10,
                            num_conformers=2)
    items = []
    for i in range(num):
        items.append({"graph2d": ds.graph2d(i),
                      "conformers3d": [dict(coords=ds.mols[i]["conformers"][c])
                                       for c in range(2)]})
    return get_collate("ot_collate")(items, BucketSpec(num, 64, 256),
                                     n_true_confs=2, n_neighborhoods=40,
                                     n_pairs=40)


def test_geomol_featurize():
    ds = SyntheticMolecules(1, seed=0, n_min=8, n_max=12)
    f = geomol_featurize(ds.graph2d(0))
    assert (f["nbh_mask"].sum(1) >= 2).all()        # only degree>1 centers
    if len(f["dp"]):
        assert (f["x_map"].sum(1) == 1).all()
        assert (f["y_map"].sum(1) == 1).all()


def test_ot_model_forward():
    batch = make_batch()
    g = batch["graph"]
    model = OptimalTransportModel(hyperparams=HP, gnn_params=GNN)
    vs = model.init({"params": jax.random.key(0), "random": jax.random.key(1)},
                    g, deterministic=True)
    loss = model.apply(vs, g, deterministic=True,
                       rngs={"random": jax.random.key(2)})
    assert np.isfinite(float(loss))
    cost = model.apply(vs, g, deterministic=True,
                       rngs={"random": jax.random.key(2)},
                       return_cost_matrix=True)
    assert cost.shape == (2, 3, g.num_graphs)
    # present (true-conf, graph) combos have finite cost; absent are BIG
    pm = np.asarray(g.extras["pos_mask"])
    c = np.asarray(cost)
    for i in range(g.num_graphs):
        for t in range(2):
            if pm[i, t] and np.asarray(g.graph_mask)[i]:
                assert c[t, :, i].max() < 1e8


def test_exact_emd():
    from infomax3d_tpu.train.trainer import exact_emd
    cost = np.array([[0.0, 1.0], [1.0, 0.0]])
    plan = exact_emd(cost, np.ones(2) / 2, np.ones(2) / 2)
    np.testing.assert_allclose(plan, [[0.5, 0.0], [0.0, 0.5]], atol=1e-8)
    # rectangular
    cost = np.array([[0.0, 5.0, 1.0]])
    plan = exact_emd(cost, np.ones(1), np.ones(3) / 3)
    np.testing.assert_allclose(plan.sum(), 1.0, atol=1e-8)
    np.testing.assert_allclose(plan[0], [1 / 3, 1 / 3, 1 / 3], atol=1e-8)


@pytest.mark.parametrize("loss_type", ["implicit_mle", "ot_emd"])
def test_ot_trainer(tmp_path, loss_type):
    from infomax3d_tpu.train.trainer import OptimalTransportTrainer

    class DS:
        def __init__(self):
            self.ds = SyntheticMolecules(8, seed=0, n_min=5, n_max=10,
                                         num_conformers=2)

        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"graph2d": self.ds.graph2d(i),
                    "conformers3d": [dict(coords=self.ds.mols[i]["conformers"][c])
                                     for c in range(2)]}

    hp = dict(HP, loss_type=loss_type)
    model = OptimalTransportModel(hyperparams=hp, gnn_params=GNN)
    loader = GraphDataLoader(
        DS(), 4, "ot_collate", bucket=BucketSpec(4, 64, 256), prefetch=0,
        collate_kwargs=dict(n_true_confs=2, n_neighborhoods=48, n_pairs=48))
    tr = OptimalTransportTrainer(
        {"model": model},
        dict(num_epochs=2, patience=10, minimum_epochs=0, log_iterations=1,
             val_per_batch=True, optimizer="Adam",
             optimizer_params={"lr": 1e-3}, lr_scheduler=None,
             num_epochs_local_only=1, transfer_layers=[], frozen_layers=[],
             exclude_from_transfer=[], models_to_save=[], checkpoint=None),
        metrics={}, main_metric="loss", run_dir=str(tmp_path / loss_type),
        loss_name="ot_loss", use_tensorboard=False)
    res = tr.train(loader, loader)
    assert np.isfinite(res["ot_loss"])
