"""Trainer smoke tests: every trainer flavor runs a few epochs on synthetic
molecules and its loss must go DOWN (SURVEY.md §4 item 3)."""
import json
import os

import numpy as np
import pytest

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import PNA, BYOLWrapper, Critic, Net3D
from infomax3d_tpu.train.metrics import get_metric
from infomax3d_tpu.train.trainer import (
    TRAINER_REGISTRY, BYOLTrainer, GraphCLTrainer, PhilosophyTrainer,
    SelfSupervisedAETrainer, SelfSupervisedAlternatingTrainer,
    SelfSupervisedTrainer, Trainer,
)

N_MOL, BATCH = 32, 8
PNA_SMALL = dict(hidden_dim=24, target_dim=16,
                 aggregators=["mean", "max", "min", "std"],
                 scalers=["identity", "amplification", "attenuation"],
                 readout_aggregators=["min", "max", "mean"],
                 mid_batch_norm=True, last_batch_norm=True,
                 readout_batchnorm=True, batch_norm_momentum=0.93,
                 propagation_depth=2, readout_layers=1, pretrans_layers=1,
                 posttrans_layers=1)
NET3D_SMALL = dict(hidden_dim=16, target_dim=16,
                   readout_aggregators=["min", "max", "mean"], batch_norm=True,
                   readout_batchnorm=True, batch_norm_momentum=0.93,
                   node_wise_output_layers=0, message_net_layers=1,
                   update_net_layers=1, reduce_func="mean",
                   fourier_encodings=4, propagation_depth=1, readout_layers=1)

BUCKET2D = BucketSpec(BATCH, 256, 1024)
BUCKET3D = BucketSpec(BATCH, 256, 8192)


class _Dataset:
    def __init__(self, num=N_MOL, seed=0, targets=1):
        self.ds = SyntheticMolecules(num, seed=seed, num_targets=targets)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return {"graph2d": self.ds.graph2d(i), "graph3d": self.ds.graph3d(i),
                "targets": self.ds.targets[i]}


def base_args(**over):
    args = dict(num_epochs=3, patience=50, minimum_epochs=0, log_iterations=2,
                val_per_batch=True, optimizer="Adam",
                optimizer_params={"lr": 5e-3}, lr_scheduler=None,
                transfer_layers=[], frozen_layers=[], exclude_from_transfer=[],
                models_to_save=[], checkpoint=None)
    args.update(over)
    return args


def first_last_train_loss(run_dir):
    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["split"] == "train":
                key = [k for k in rec if k.endswith("Loss") or k == "NTXent"
                       or "Xent" in k or k.endswith("loss_total")]
                losses.append(rec.get("loss_total",
                                      rec.get(key[0]) if key else None))
    losses = [l for l in losses if l is not None]
    return losses[0], losses[-1]


def contrastive_loaders(seed=0):
    ds = _Dataset()
    mk = lambda s: GraphDataLoader(ds, BATCH, "contrastive_collate",
                                   bucket=BUCKET2D, drop_last=True, seed=s,
                                   prefetch=0,
                                   collate_kwargs={"bucket3d": BUCKET3D})
    return mk(seed), mk(seed + 1)


def test_supervised_trainer(tmp_path):
    ds = _Dataset(targets=2)
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=BUCKET2D,
                             prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    tr = Trainer({"model": model}, base_args(num_epochs=4),
                 metrics={"mae": get_metric("mae")}, main_metric="loss",
                 run_dir=str(tmp_path / "sup"), loss_name="L1Loss",
                 use_tensorboard=False)
    result = tr.train(loader, loader)
    assert "mae" in result and np.isfinite(result["mae"])
    # loss must decrease over training
    with open(os.path.join(tr.run_dir, "metrics.jsonl")) as f:
        train_losses = [json.loads(l)["L1Loss"] for l in f
                        if json.loads(l)["split"] == "train"]
    assert train_losses[-1] < train_losses[0]
    # checkpoints written
    assert os.path.exists(os.path.join(tr.run_dir, "best_checkpoint.pt"))
    assert os.path.exists(os.path.join(tr.run_dir, "train_arguments.yaml"))


def test_supervised_partial_batch_masking(tmp_path):
    """27 molecules with batch 8 -> final partial batch exercises masking."""
    ds = _Dataset(targets=1)
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=BUCKET2D,
                             indices=np.arange(27), prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 1, "propagation_depth": 1})
    tr = Trainer({"model": model}, base_args(num_epochs=1),
                 metrics={}, main_metric="loss",
                 run_dir=str(tmp_path / "pb"), loss_name="L1Loss",
                 use_tensorboard=False)
    res = tr.train(loader, loader)
    assert np.isfinite(res["L1Loss"])


def test_contrastive_trainer(tmp_path):
    tl, vl = contrastive_loaders()
    tr = SelfSupervisedTrainer(
        {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)},
        base_args(num_epochs=4),
        metrics={"positive_similarity": get_metric("positive_similarity"),
                 "contrastive_accuracy": get_metric("contrastive_accuracy")},
        main_metric="loss", run_dir=str(tmp_path / "ssl"),
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        use_tensorboard=False)
    result = tr.train(tl, vl)
    assert np.isfinite(result["NTXent"])
    with open(os.path.join(tr.run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_losses = [r["NTXent"] for r in recs if r["split"] == "train"]
    assert train_losses[-1] < train_losses[0]
    assert any("positive_similarity" in r for r in recs)


def test_alternating_trainer(tmp_path):
    tl, vl = contrastive_loaders()
    tr = SelfSupervisedAlternatingTrainer(
        {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)},
        base_args(num_epochs=2), metrics={}, main_metric="loss",
        run_dir=str(tmp_path / "alt"),
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        use_tensorboard=False)
    result = tr.train(tl, vl)
    assert np.isfinite(result["NTXent"])


def test_byol_trainer(tmp_path):
    tl, vl = contrastive_loaders()
    w2 = BYOLWrapper(model_type="PNA", model_parameters=PNA_SMALL,
                     metric_dim=16, predictor_hidden_size=32)
    w3 = BYOLWrapper(model_type="Net3D", model_parameters=NET3D_SMALL,
                     metric_dim=16, predictor_hidden_size=32)
    tr = BYOLTrainer(
        {"model": w2, "model3d": w3}, base_args(num_epochs=2), metrics={},
        main_metric="loss", run_dir=str(tmp_path / "byol"),
        loss_func=LOSS_REGISTRY["CosineSimilarityLoss"](),
        loss_name="CosineSimilarityLoss", use_tensorboard=False)
    result = tr.train(tl, vl)
    assert np.isfinite(result["CosineSimilarityLoss"])
    # teacher must differ from student after EMA steps
    import jax
    t = jax.tree_util.tree_leaves(tr.state.extra["teacher"])
    s = jax.tree_util.tree_leaves(
        {k: BYOLTrainer._strip_predictor(tr.state.params[k])
         for k in ("model", "model3d")})
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(t, s)]
    assert max(diffs) > 0


def test_ae_trainer(tmp_path):
    from infomax3d_tpu.models.net3d_vae import Net3DAE
    tl, vl = contrastive_loaders()
    ae3d = Net3DAE(**{**NET3D_SMALL, "encoder_depth": 1, "decoder_depth": 1})
    # AE latent = hidden_dim * len(readout_aggregators) = 48; match 2D side
    tr = SelfSupervisedAETrainer(
        {"model": PNA(**{**PNA_SMALL, "target_dim": 48}), "model3d": ae3d},
        base_args(num_epochs=2), metrics={}, main_metric="loss",
        run_dir=str(tmp_path / "ae"),
        loss_func=LOSS_REGISTRY["NTXentAE"](tau=0.1), loss_name="NTXentAE",
        use_tensorboard=False)
    result = tr.train(tl, vl)
    assert np.isfinite(result["NTXentAE"])
    with open(os.path.join(tr.run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("reconstruction_loss" in r for r in recs)


def test_graphcl_trainer(tmp_path):
    ds = _Dataset()
    mk = lambda s: GraphDataLoader(ds, BATCH, "graphcl_collate", bucket=BUCKET2D,
                                   drop_last=True, seed=s, prefetch=0)
    tr = GraphCLTrainer(
        {"model": PNA(**PNA_SMALL)}, base_args(num_epochs=2), metrics={},
        main_metric="loss", run_dir=str(tmp_path / "gcl"),
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        use_tensorboard=False)
    result = tr.train(mk(0), mk(1))
    assert np.isfinite(result["NTXent"])


def test_philosophy_trainer(tmp_path):
    tl, vl = contrastive_loaders()
    tr = PhilosophyTrainer(
        {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL),
         "critic": Critic(metric_dim=16, hidden_dim=32, repeats=2)},
        base_args(num_epochs=2, critic_in_dim=16), metrics={},
        main_metric="loss", run_dir=str(tmp_path / "phil"),
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        critic_loss=LOSS_REGISTRY["CriticLoss"](), use_tensorboard=False)
    result = tr.train(tl, vl)
    assert np.isfinite(result["NTXent"])


def test_checkpoint_resume(tmp_path):
    ds = _Dataset(targets=1)
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=BUCKET2D,
                             prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 1, "propagation_depth": 1})
    run1 = str(tmp_path / "ck1")
    tr = Trainer({"model": model}, base_args(num_epochs=2), metrics={},
                 main_metric="loss", run_dir=run1, loss_name="L1Loss",
                 use_tensorboard=False)
    tr.train(loader, loader)
    steps_before = tr.optim_steps

    tr2 = Trainer({"model": model},
                  base_args(num_epochs=3,
                            checkpoint=os.path.join(run1, "last_checkpoint.pt")),
                  metrics={}, main_metric="loss", run_dir=str(tmp_path / "ck2"),
                  loss_name="L1Loss", use_tensorboard=False)
    tr2.train(loader, loader)
    assert tr2.start_epoch == 3
    assert tr2.optim_steps > steps_before
