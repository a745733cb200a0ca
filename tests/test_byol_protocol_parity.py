"""Free-running BYOL-protocol accuracy parity vs the mounted reference.

Companion to `test_full_protocol_parity.py` (the contrastive north star):
same dataset, same fine-tune stage, but the PRE-TRAIN phase runs the BYOL
protocol end to end in both frameworks with no state resync:

  1. BYOL pre-train — both networks wrapped in BYOLwrapper
     (trainer/byol_wrapper.py:12-53: student + frozen deepcopy teacher +
     predictor MLP), CosineSimilarityLoss pairing
     loss(pred2d_student, proj3d_teacher) + loss(proj2d_teacher,
     pred3d_student) (trainer/byol_trainer.py:10-19), Adam, warmup ->
     plateau, and the reference's after_optim_step quirk: ONLY the 2D
     wrapper's teacher is EMA-updated (byol_trainer.py:24) — the 3D teacher
     stays frozen at init;
  2. transfer — 'gnn' keys minus 'batch_norm'/'teacher', BYOL 'student.'
     prefix stripped (train.py:220-224);
  3. fine-tune + final denormalized MAE — identical stage to the
     contrastive parity test (shared helpers).

torch side: the REAL reference BYOLwrapper + CosineSimilarityLoss with the
trainer hot loop written out as byol_trainer.py runs it.  jax side: the
production BYOLTrainer (in-jit teacher EMA, teacher BN in train mode) and
`cli.train.transfer_pretrained` on the saved best checkpoint.

Tolerance: pre-registered the same way as the contrastive test — the mean
final MAE over >= 3 shared-init seed pairs must agree within the pooled
seed-to-seed spread max(spread_T, spread_J, 5% of mean).  Measured on CPU
at the committed scale: T = [0.16582, 0.20473, 0.20105],
J = [0.16534, 0.18156, 0.22397] -> means 0.19054 vs 0.19029, diff 0.00025,
tol 0.05863 (spread_J); mean-predictor baseline 0.40740 — both systems cut
the naive error by ~2.1x, so agreement at the mean is not vacuous.
"""
import copy

import numpy as np
import pytest
import torch

import test_layer_golden_ext  # noqa: F401  (canonical reference stubs)
from test_trajectory_golden import _torch_graphs, _torch_graphs3d  # noqa: E402
from test_full_protocol_parity import (  # noqa: E402
    B, HP2D, HP3D, PLATEAU_PRE, PRE_EPOCHS, PRE_LR, PRE_WARMUP, SEEDS,
    _chunks, _dataset, _jax_finetune, _mk_loader, _specs, _torch_finetune)

import sys

sys.path.insert(0, "/root/reference")
import trainer.byol_wrapper as _ref_bw  # noqa: E402
from trainer.byol_wrapper import BYOLwrapper as RefBYOLwrapper  # noqa: E402
from commons.losses import CosineSimilarityLoss as RefCosine  # noqa: E402
from trainer.lr_schedulers import WarmUpWrapper as RefWarmUp  # noqa: E402
from models.pna import PNA as RefPNA  # noqa: E402
from models.net3d import Net3D as RefNet3D  # noqa: E402

sys.path.pop(0)

# the test stubs register `models` as a bare package (no __init__ star-import
# — it would pull torch_geometric), so BYOLwrapper's `globals()[model_type]`
# lookup needs the classes planted explicitly
_ref_bw.PNA, _ref_bw.Net3D = RefPNA, RefNet3D

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from infomax3d_tpu.losses import LOSS_REGISTRY  # noqa: E402
from infomax3d_tpu.models.byol import BYOLWrapper  # noqa: E402
from infomax3d_tpu.train.torch_interop import convert_state_dict  # noqa: E402
from infomax3d_tpu.train.trainer import BYOLTrainer  # noqa: E402

MA_DECAY = 0.9          # few pre-train steps here; 0.99 would leave the
METRIC_DIM = 16         # teacher numerically indistinguishable from init
BYOL_KW = dict(predictor_layers=1, predictor_hidden_size=24,
               predictor_batchnorm=True, metric_dim=METRIC_DIM)


def _ref_wrappers(seed):
    """Reference BYOLwrapper pair from one torch seed (the shared init)."""
    torch.manual_seed(seed)
    w2 = RefBYOLwrapper(model_type="PNA", model_parameters=HP2D,
                        ma_decay=MA_DECAY, **BYOL_KW)
    w3 = RefBYOLwrapper(model_type="Net3D", model_parameters=HP3D,
                        node_dim=0, edge_dim=1, ma_decay=MA_DECAY, **BYOL_KW)
    return w2, w3


# ------------------------------------------------------------- torch side
def _torch_protocol(seed, ds, y_norm, mean, std, slices):
    sl_pre, sl_preval, _, _ = slices
    w2, w3 = _ref_wrappers(seed)
    loss_fn = RefCosine()
    optim = torch.optim.Adam(
        [p for p in list(w2.parameters()) + list(w3.parameters())
         if p.requires_grad], lr=PRE_LR)
    sched = RefWarmUp(optim, "ReduceLROnPlateau",
                      warmup_steps=[PRE_WARMUP], **PLATEAU_PRE)

    def batch(idx):
        return (_torch_graphs([ds.graph2d(i) for i in idx]),
                _torch_graphs3d([ds.graph3d(i) for i in idx]))

    def byol_loss(g2, g3):
        # byol_trainer.py:10-19 (nodes_per_graph unused by CosineSimilarity)
        pred2_s, proj2_t = w2(g2)
        pred3_s, proj3_t = w3(g3)
        return loss_fn(pred2_s, proj3_t) + loss_fn(proj2_t, pred3_s)

    tr_c, va_c = _chunks(sl_pre), _chunks(sl_preval)
    best_val, best_sd = np.inf, None
    for epoch in range(1, PRE_EPOCHS + 1):
        w2.train(), w3.train()
        for c in tr_c:
            optim.zero_grad()
            byol_loss(*batch(c)).backward()
            optim.step()
            w2.ma_teacher_update()      # byol_trainer.py:24 — 2D ONLY
            if sched._step < sched.total_warmup_steps:
                sched.step()
        w2.eval(), w3.eval()
        with torch.no_grad():
            val = float(np.mean([float(byol_loss(*batch(c))) for c in va_c]))
        sched.step(metrics=val)
        if val <= best_val:
            best_val, best_sd = val, copy.deepcopy(w2.state_dict())
    return _torch_finetune(seed, ds, y_norm, mean, std, slices, best_sd)


# --------------------------------------------------------------- jax side
def _sync_byol_init(tr, w2, w3):
    """Convert the torch BYOLwrapper inits (student + predictor params/BN
    stats; teacher == deepcopy-of-student) into the flax state once."""
    params = dict(tr.state.params)
    stats = dict(tr.state.batch_stats)
    for key, ref in (("model", w2), ("model3d", w3)):
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        fp, fs, rep = convert_state_dict(
            sd, flatten_dict(params[key]),
            flatten_dict(tr.state.batch_stats[key]))
        assert not rep["missing"], f"{key}: unmatched {rep['missing'][:4]}"
        params[key] = unflatten_dict(
            {p: jnp.asarray(v) for p, v in fp.items()})
        stats[key] = unflatten_dict(
            {p: jnp.asarray(v) for p, v in fs.items()})
    tr.state = tr.state.replace(
        params=params, batch_stats=stats,
        opt_state=tr._init_opt_state(params),
        # teacher trees re-materialized from the synced students — identical
        # to the reference's deepcopy-at-construction (byol_wrapper.py:28)
        extra=tr._init_extra(params, stats))


def _jax_protocol(seed, ds, y_norm, mean, std, slices, run_root):
    sl_pre, sl_preval, _, _ = slices
    w2, w3 = _ref_wrappers(seed)       # the SAME torch init
    spec2, spec3 = _specs(ds)
    loader = _mk_loader(ds, y_norm, spec2)

    pre_args = dict(num_epochs=PRE_EPOCHS, patience=10 ** 6,
                    minimum_epochs=0, log_iterations=10 ** 6,
                    val_per_batch=True, optimizer="Adam",
                    optimizer_params={"lr": PRE_LR},
                    lr_scheduler="WarmUpWrapper",
                    lr_scheduler_params=dict(
                        wrapped_scheduler="ReduceLROnPlateau",
                        warmup_steps=[PRE_WARMUP], **PLATEAU_PRE),
                    transfer_layers=[], frozen_layers=[],
                    exclude_from_transfer=[], models_to_save=[],
                    checkpoint=None, bf16_compute=False)
    pre_dir = str(run_root / f"byol_pre_{seed}")
    tr = BYOLTrainer(
        {"model": BYOLWrapper(model_type="PNA", model_parameters=HP2D,
                              **BYOL_KW),
         "model3d": BYOLWrapper(model_type="Net3D", model_parameters=HP3D,
                                **BYOL_KW)},
        pre_args, metrics={}, main_metric="loss", run_dir=pre_dir,
        loss_func=LOSS_REGISTRY["CosineSimilarityLoss"](),
        loss_name="CosineSimilarityLoss", ma_decay=MA_DECAY,
        scheduler_step_per_batch=False, use_tensorboard=False, seed=seed)
    tr_loader = loader(sl_pre, "contrastive_collate", bucket3d=spec3)
    tr.init_state(next(iter(tr_loader)))
    _sync_byol_init(tr, w2, w3)
    tr.train(tr_loader, loader(sl_preval, "contrastive_collate",
                               bucket3d=spec3))
    return _jax_finetune(seed, ds, y_norm, mean, std, slices, run_root,
                         f"{pre_dir}/best_checkpoint.pt")


@pytest.mark.slow
def test_byol_protocol_final_mae_parity(tmp_path):
    ds, y_norm, mean, std, slices = _dataset()
    maes_t, maes_j = [], []
    for seed in SEEDS:
        maes_t.append(_torch_protocol(seed, ds, y_norm, mean, std, slices))
        maes_j.append(_jax_protocol(seed, ds, y_norm, mean, std, slices,
                                    tmp_path))
        print(f"seed {seed}: torch MAE {maes_t[-1]:.5f}  "
              f"jax MAE {maes_j[-1]:.5f}")
    maes_t, maes_j = np.asarray(maes_t), np.asarray(maes_j)

    baseline = float(np.mean(np.abs(y_norm[slices[3]] * std)))
    assert maes_t.mean() < 0.6 * baseline, (maes_t, baseline)
    assert maes_j.mean() < 0.6 * baseline, (maes_j, baseline)

    spread_t = maes_t.max() - maes_t.min()
    spread_j = maes_j.max() - maes_j.min()
    tol = max(spread_t, spread_j, 0.05 * maes_t.mean())
    diff = abs(maes_t.mean() - maes_j.mean())
    print(f"means: torch {maes_t.mean():.5f} jax {maes_j.mean():.5f} "
          f"diff {diff:.5f} tol {tol:.5f} "
          f"(spread_t {spread_t:.5f}, spread_j {spread_j:.5f})")
    assert diff <= tol, (
        f"BYOL-protocol final MAE disagrees beyond seed noise: torch "
        f"{maes_t} vs jax {maes_j} (diff {diff:.5f} > tol {tol:.5f})")
