"""Batch samplers + linear probe tests."""
import numpy as np

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.data.samplers import (
    ConstantNumberAtomsCategorical, ConstantNumberAtomsChunks,
)
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec


def test_chunks_sampler_minimizes_padding():
    rng = np.random.default_rng(0)
    n_atoms = rng.integers(4, 40, size=200)
    s = ConstantNumberAtomsChunks(n_atoms, batch_size=16, drop_last=True)
    batches = list(iter(s))
    assert all(len(b) == 16 for b in batches)
    spreads = [n_atoms[b].max() - n_atoms[b].min() for b in batches]
    assert np.mean(spreads) < 6          # near-uniform sizes within batch
    flat = sorted(i for b in batches for i in b)
    assert len(set(flat)) == len(flat)   # no repeats


def test_categorical_sampler_half_cluster():
    rng = np.random.default_rng(0)
    n_atoms = rng.integers(4, 10, size=300)
    s = ConstantNumberAtomsCategorical(n_atoms, batch_size=20, seed=1)
    b = next(iter(s))
    first_half = n_atoms[b[:10]]
    assert len(set(first_half.tolist())) <= 2   # drawn from one size cluster


def test_sampler_in_loader():
    ds = SyntheticMolecules(64, seed=0)

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"graph2d": ds.graph2d(i), "targets": ds.targets[i]}

    n_atoms = [m["node_feat"].shape[0] for m in ds.mols]
    sampler = ConstantNumberAtomsChunks(n_atoms, batch_size=16, drop_last=True)
    loader = GraphDataLoader(DS(), 16, "graph_collate",
                             bucket=BucketSpec(16, 512, 2048), prefetch=0,
                             batch_sampler=sampler, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(sampler)


def test_linear_probe(tmp_path):
    import json
    from infomax3d_tpu.losses import LOSS_REGISTRY
    from infomax3d_tpu.models import PNA, Net3D
    from infomax3d_tpu.train.trainer import SelfSupervisedTrainer

    ds = SyntheticMolecules(48, seed=0, num_targets=1)

    class DS:
        def __len__(self):
            return 48

        def __getitem__(self, i):
            return {"graph2d": ds.graph2d(i), "graph3d": ds.graph3d(i),
                    "targets": ds.targets[i]}

    mk = lambda s: GraphDataLoader(
        DS(), 16, "contrastive_collate", bucket=BucketSpec(16, 512, 2048),
        drop_last=True, seed=s, prefetch=0,
        collate_kwargs={"bucket3d": BucketSpec(16, 512, 16384)})
    tr = SelfSupervisedTrainer(
        {"model": PNA(hidden_dim=16, target_dim=8,
                      aggregators=["mean", "max"], scalers=["identity"],
                      readout_aggregators=["mean"], propagation_depth=1,
                      readout_layers=1, readout_batchnorm=False),
         "model3d": Net3D(hidden_dim=12, target_dim=8,
                          readout_aggregators=["mean"], propagation_depth=1,
                          readout_layers=1, readout_batchnorm=False,
                          fourier_encodings=4)},
        dict(num_epochs=2, patience=10, minimum_epochs=0, log_iterations=100,
             val_per_batch=True, optimizer="Adam",
             optimizer_params={"lr": 1e-3}, lr_scheduler=None,
             eval_per_epochs=1, linear_probing_samples=32,
             transfer_layers=[], frozen_layers=[], exclude_from_transfer=[],
             models_to_save=[], checkpoint=None),
        metrics={}, main_metric="loss", run_dir=str(tmp_path / "probe"),
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        use_tensorboard=False)
    tr.train(mk(0), mk(1))
    recs = [json.loads(l) for l in open(tmp_path / "probe" / "metrics.jsonl")]
    assert any("linear_probe_mae" in r for r in recs)
