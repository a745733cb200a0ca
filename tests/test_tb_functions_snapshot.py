"""Figure hooks + model-source snapshot (reference parity items):

- `tensorboard_functions: [singular_values]` config key runs the
  singular-value spectrum hook during train logging and on the first val
  batch (reference trainer.py:143-151 + commons/utils.py:113-124).
- The trainer snapshots the model class source into the run dir next to the
  checkpoints (reference trainer.py:264-270).
"""
import json
import os

import numpy as np

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.train.metrics import get_metric
from infomax3d_tpu.train.trainer import Trainer
from infomax3d_tpu.models import PNA

from test_trainers import BUCKET2D, PNA_SMALL, _Dataset, base_args


def test_singular_values_hook_and_source_snapshot(tmp_path):
    ds = _Dataset(targets=2)
    loader = GraphDataLoader(ds, 8, "graph_collate", bucket=BUCKET2D,
                             prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    tr = Trainer({"model": model},
                 base_args(num_epochs=1,
                           tensorboard_functions=["singular_values"]),
                 metrics={"mae": get_metric("mae")}, main_metric="loss",
                 run_dir=str(tmp_path / "tb"), loss_name="L1Loss",
                 use_tensorboard=False)
    tr.train(loader, loader)

    # figure hook wrote spectra for both splits
    fig_path = os.path.join(tr.run_dir, "figures.jsonl")
    assert os.path.exists(fig_path)
    recs = [json.loads(l) for l in open(fig_path)]
    splits = {r["split"] for r in recs}
    assert {"train", "val"} <= splits
    for r in recs:
        assert r["name"] == "singular_values"
        vals = np.array(r["values"])
        assert vals.ndim == 1 and len(vals) >= 1
        # spectrum is a percentage of the nuclear norm
        assert abs(vals.sum() - 100.0) < 1e-6

    # spectrum math: % singular values of the CENTERED matrix (pca_lowrank)
    import torch
    from infomax3d_tpu.train.logging import tensorboard_singular_value_plot

    class _Cap:
        def log_spectrum(self, name, values, step, split):
            self.values = np.asarray(values)

    x = np.random.default_rng(0).normal(size=(40, 6)).astype(np.float32)
    cap = _Cap()
    tensorboard_singular_value_plot(x, None, cap, 0, "train")
    _, s_ref, _ = torch.pca_lowrank(torch.from_numpy(x), q=6)
    s_ref = 100 * s_ref / s_ref.sum()
    np.testing.assert_allclose(cap.values, s_ref.numpy(), rtol=1e-4)

    # model class source snapshot (reference trainer.py:264-270)
    snap = os.path.join(tr.run_dir, "pna.py")
    assert os.path.exists(snap)
    src = open(snap).read()
    assert src.lstrip().startswith("class PNA")


def test_no_hooks_by_default(tmp_path):
    ds = _Dataset(targets=1)
    loader = GraphDataLoader(ds, 8, "graph_collate", bucket=BUCKET2D,
                             prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 1, "propagation_depth": 1})
    tr = Trainer({"model": model}, base_args(num_epochs=1), metrics={},
                 main_metric="loss", run_dir=str(tmp_path / "nohook"),
                 loss_name="L1Loss", use_tensorboard=False)
    tr.train(loader, loader)
    assert not os.path.exists(os.path.join(tr.run_dir, "figures.jsonl"))


def test_real_tensorboard_writer(tmp_path):
    """use_tensorboard=True exercises the actual torch SummaryWriter
    (installed here): event files appear in the run dir and scalars land."""
    ds = _Dataset(targets=2)
    loader = GraphDataLoader(ds, 8, "graph_collate", bucket=BUCKET2D,
                             prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    tr = Trainer({"model": model}, base_args(num_epochs=1),
                 metrics={"mae": get_metric("mae")}, main_metric="loss",
                 run_dir=str(tmp_path / "tb_on"), loss_name="L1Loss",
                 use_tensorboard=True)
    tr.train(loader, loader)
    import glob as _glob
    events = _glob.glob(os.path.join(tr.run_dir, "events.out.tfevents.*"))
    assert events, "SummaryWriter wrote no event files"
    assert os.path.getsize(events[0]) > 0
