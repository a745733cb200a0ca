"""Free-running OGB-classification protocol parity vs the mounted reference.

Third free-running protocol (after the contrastive and BYOL north stars):
the reference's OGB fine-tune configuration (configs/28.yml — OGBGNN gin,
BCEWithLogitsLoss, ReduceLROnPlateau mode=max) under the ogbg driver's
rules (train.py:428-453): main_metric = the dataset's OGB evaluator score
(rocauc), main_metric_goal = 'max', val_per_batch = False (epoch-level
concatenated predictions).  Both frameworks train OGBGNN from the SAME
torch init with no resync and must converge to the same best-val rocauc.

torch side: the REAL reference OGBGNN (models/gin.py:17-81) with the
trainer hot loop written out exactly as trainer.py:69-110 runs it
(max-goal tie-improves best checkpoint, early stopping, epoch-level
metric).  jax side: the production Trainer with main_metric_goal='max',
val_per_batch=False and a bare ReduceLROnPlateau — a config surface no
other free-running test exercises.

The rocauc itself is computed by THIS repo's OGBEvaluator on both sides
(ogb isn't installed here; the metric math is already golden vs sklearn +
an ogb emulation in tests/test_ogb_metrics_golden.py, and using one
deterministic metric on both trajectories isolates the thing under test —
the training system).

Tolerance: same pre-registration scheme as the other protocol tests —
mean best-val rocauc over >= 3 shared-init seed pairs agrees within
max(spread_T, spread_J, 2% of mean).  Measured on CPU at the committed
scale the agreement is EXACT per seed (rocauc is rank-based and quantized
on the 60-sample val split, and both trajectories converge to the same
ranking): T = J = [0.78039, 0.85098, 0.77843], diff 0.00000, tol 0.07255;
chance level is 0.5, so agreement is not vacuous.
"""
import copy

import numpy as np
import pytest
import torch

import test_layer_golden_ext  # noqa: F401  (canonical reference stubs)
from test_layer_golden_ext import DGLSim  # noqa: E402
from test_full_protocol_parity import _JaxView  # noqa: E402

import sys

sys.path.insert(0, "/root/reference")
import models.gin as _ref_gin  # noqa: E402
from models.gin import OGBGNN as RefOGBGNN  # noqa: E402

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from infomax3d_tpu.data.loader import GraphDataLoader  # noqa: E402
from infomax3d_tpu.data.synthetic import SyntheticMolecules  # noqa: E402
from infomax3d_tpu.graphs.batch import BucketSpec  # noqa: E402
from infomax3d_tpu.losses import LOSS_REGISTRY  # noqa: E402
from infomax3d_tpu.models.gin import OGBGNN  # noqa: E402
from infomax3d_tpu.train.metrics import get_metric  # noqa: E402
from infomax3d_tpu.train.torch_interop import convert_state_dict  # noqa: E402
from infomax3d_tpu.train.trainer import Trainer  # noqa: E402


class _SumPooling:
    """Functional stand-in for dgl.nn.pytorch.SumPooling (per-graph node
    sum) — the stub registry only carries inert placeholder classes."""

    def __call__(self, g, feat):
        outs, o = [], 0
        for n in g.batch_n:
            outs.append(feat[o:o + n].sum(0))
            o += n
        return torch.stack(outs)


_ref_gin.SumPooling = _SumPooling


class BatchedDGLSim(DGLSim):
    """DGLSim (local_scope, tuple message fns) + dgl.batch semantics."""

    def __init__(self, src, dst, n_nodes, batch_n):
        super().__init__(src, dst, n_nodes)
        self.batch_n = list(batch_n)


# ---------------------------------------------------------------- protocol
HID, LAYERS, B = 32, 2, 16
N_TR, N_VAL = 192, 64
LR = 1e-3
EPOCHS, PATIENCE = 30, 6
PLATEAU = dict(mode="max", factor=0.5, patience=3)  # configs/28.yml:36-40
SEEDS = (21, 22, 23)
MODEL_KW = dict(target_dim=1, num_layers=LAYERS, hidden_dim=HID,
                gnn_type="gin", virtual_node=False, dropout=0.0,
                graph_pooling="sum")


def _chunks(sl):
    idx = list(range(sl.start, sl.stop))
    return [idx[k:k + B] for k in range(0, len(idx), B)
            if len(idx[k:k + B]) == B]


def _dataset():
    """Binary labels from a learnable graph function: logistic score of the
    chirality-column projection + edge density, median-split for balance."""
    total = N_TR + N_VAL
    ds = SyntheticMolecules(total, seed=31, n_min=6, n_max=14)
    rng = np.random.default_rng(131)
    w = rng.normal(scale=1.0, size=8).astype(np.float32)
    scores = []
    for i in range(total):
        m = ds.graph2d(i)
        scores.append(float(np.mean(w[m["node_feat"][:, 1]]))
                      + 0.3 * m["senders"].shape[0] / m["node_feat"].shape[0])
    scores = np.asarray(scores, np.float32)
    y = (scores > np.median(scores)).astype(np.float32)[:, None]
    return ds, y, (slice(0, N_TR), slice(N_TR, total))


ROCAUC = get_metric("ogb_evaluator", d_name="synthetic", metric="rocauc",
                    num_tasks=1)


# ------------------------------------------------------------- torch side
def _torch_graphs(mols):
    offs = np.cumsum([0] + [m["node_feat"].shape[0] for m in mols])
    src = np.concatenate([m["senders"] + o for m, o in zip(mols, offs)])
    dst = np.concatenate([m["receivers"] + o for m, o in zip(mols, offs)])
    g = BatchedDGLSim(src, dst, int(offs[-1]),
                      [m["node_feat"].shape[0] for m in mols])
    g.ndata["feat"] = torch.as_tensor(
        np.concatenate([m["node_feat"] for m in mols]), dtype=torch.long)
    g.edata["feat"] = torch.as_tensor(
        np.concatenate([m["edge_feat"] for m in mols]), dtype=torch.long)
    return g


def _torch_protocol(seed, ds, y, slices):
    sl_tr, sl_val = slices
    torch.manual_seed(seed)
    model = RefOGBGNN(**MODEL_KW)
    init_sd = copy.deepcopy(model.state_dict())
    loss_fn = torch.nn.BCEWithLogitsLoss()
    optim = torch.optim.Adam(model.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(optim, **PLATEAU)

    def batch(idx):
        return _torch_graphs([ds.graph2d(i) for i in idx]), \
            torch.tensor(y[idx])

    tr_c, va_c = _chunks(sl_tr), _chunks(sl_val)

    def val_rocauc():
        # val_per_batch=False: epoch-level concatenation (trainer.py:156-160)
        model.eval()
        with torch.no_grad():
            preds, targs = [], []
            for c in va_c:
                g, t = batch(c)
                preds.append(model(g))
                targs.append(t)
        return float(ROCAUC(np.concatenate([p.numpy() for p in preds]),
                            np.concatenate([t.numpy() for t in targs])))

    best_score, best_sd, no_improve = -np.inf, None, 0
    for epoch in range(1, EPOCHS + 1):
        model.train()
        for c in tr_c:
            g, t = batch(c)
            optim.zero_grad()
            loss_fn(model(g), t).backward()
            optim.step()
        score = val_rocauc()
        sched.step(metrics=score)
        # max goal, ties improve (trainer.py:91-97)
        if score >= best_score:
            best_score, best_sd, no_improve = score, \
                copy.deepcopy(model.state_dict()), 0
        else:
            no_improve += 1
        if no_improve >= PATIENCE:
            break
    model.load_state_dict(best_sd)
    return val_rocauc(), init_sd


# --------------------------------------------------------------- jax side
def _sync_init(tr, init_sd):
    """Overlay the torch OGBGNN init onto the flax state.  The stub ogb
    encoders name their tables `embedding_list`; real ogb (and therefore
    torch_interop's candidate keys) use `atom/bond_embedding_list` —
    rename before converting."""
    sd = {}
    for k, v in init_sd.items():
        if ".embedding_list." in k:
            kind = "atom" if "atom_encoder" in k else "bond"
            k = k.replace(".embedding_list.", f".{kind}_embedding_list.")
        sd[k] = v.detach().numpy()
    params = dict(tr.state.params)
    stats = dict(tr.state.batch_stats)
    fp, fs, rep = convert_state_dict(
        sd, flatten_dict(params["model"]),
        flatten_dict(stats.get("model", {})))
    assert not rep["missing"], f"unmatched flax leaves: {rep['missing'][:6]}"
    assert not rep["unused"], f"unused torch keys: {rep['unused'][:6]}"
    params["model"] = unflatten_dict({p: jnp.asarray(v)
                                      for p, v in fp.items()})
    stats["model"] = unflatten_dict({p: jnp.asarray(v)
                                     for p, v in fs.items()})
    tr.state = tr.state.replace(params=params, batch_stats=stats,
                                opt_state=tr._init_opt_state(params))


def _jax_protocol(seed, ds, y, slices, run_root, init_sd):
    sl_tr, sl_val = slices
    n = max(sum(ds.graph2d(i)["node_feat"].shape[0] for i in c)
            for c in _chunks(slice(0, len(ds)))) + 8
    e = max(sum(ds.graph2d(i)["senders"].shape[0] for i in c)
            for c in _chunks(slice(0, len(ds)))) + 8
    spec = BucketSpec(B, n, e)

    def loader(sl):
        return GraphDataLoader(_JaxView(ds, y, sl), B, "graph_collate",
                               bucket=spec, shuffle=False, drop_last=True,
                               prefetch=0)

    args = dict(num_epochs=EPOCHS, patience=PATIENCE, minimum_epochs=0,
                log_iterations=10 ** 6, val_per_batch=False,
                optimizer="Adam", optimizer_params={"lr": LR},
                lr_scheduler="ReduceLROnPlateau",
                lr_scheduler_params=dict(PLATEAU),
                transfer_layers=[], frozen_layers=[],
                exclude_from_transfer=[], models_to_save=[],
                checkpoint=None, bf16_compute=False)
    tr = Trainer({"model": OGBGNN(**MODEL_KW)}, args,
                 metrics={"rocauc": ROCAUC}, main_metric="rocauc",
                 main_metric_goal="max",
                 run_dir=str(run_root / f"ogb_{seed}"),
                 loss_func=LOSS_REGISTRY["BCEWithLogitsLoss"](),
                 loss_name="BCEWithLogitsLoss",
                 scheduler_step_per_batch=False, use_tensorboard=False,
                 seed=seed)
    tr_loader = loader(sl_tr)
    tr.init_state(next(iter(tr_loader)))
    _sync_init(tr, init_sd)
    result = tr.train(tr_loader, loader(sl_val))
    return float(result["rocauc"])


@pytest.mark.parametrize("vn,pooling", [
    (True, "sum"), (False, "attention"), (True, "attention")])
def test_ogbgnn_torch_conversion_lossless(vn, pooling):
    """Every OGBGNN variant's torch state_dict (GIN Sequential mlps,
    virtual-node mlp list + embedding, attention gate_nn, GCN root_emb)
    converts onto the flax tree with zero missing and zero unused keys —
    the reference's config-28 fine-tune-from-.pt workflow is lossless."""
    torch.manual_seed(0)
    ref = RefOGBGNN(target_dim=2, num_layers=3, hidden_dim=12,
                    gnn_type="gin", virtual_node=vn, dropout=0.0,
                    graph_pooling=pooling)
    sd = {}
    for k, v in ref.state_dict().items():
        if ".embedding_list." in k:     # stub encoders; real ogb names below
            kind = "atom" if "atom_encoder" in k else "bond"
            k = k.replace(".embedding_list.", f".{kind}_embedding_list.")
        sd[k] = v.detach().numpy()
    mine = OGBGNN(target_dim=2, num_layers=3, hidden_dim=12, gnn_type="gin",
                  virtual_node=vn, dropout=0.0, graph_pooling=pooling)
    from infomax3d_tpu.graphs.batch import (batch_graphs, to_graph_batch)
    ds = SyntheticMolecules(4, seed=1)
    g = to_graph_batch(batch_graphs([ds.graph2d(i) for i in range(4)],
                                    BucketSpec(4, 80, 300)))
    vs = mine.init(jax.random.key(0), g, deterministic=True)
    _, _, rep = convert_state_dict(sd, flatten_dict(vs["params"]),
                                   flatten_dict(vs.get("batch_stats", {})))
    assert not rep["missing"], rep["missing"][:6]
    assert not rep["unused"], rep["unused"][:6]


@pytest.mark.slow
def test_ogb_protocol_best_rocauc_parity(tmp_path):
    ds, y, slices = _dataset()
    aucs_t, aucs_j = [], []
    for seed in SEEDS:
        auc_t, init_sd = _torch_protocol(seed, ds, y, slices)
        aucs_t.append(auc_t)
        aucs_j.append(_jax_protocol(seed, ds, y, slices, tmp_path, init_sd))
        print(f"seed {seed}: torch rocauc {aucs_t[-1]:.5f}  "
              f"jax rocauc {aucs_j[-1]:.5f}")
    aucs_t, aucs_j = np.asarray(aucs_t), np.asarray(aucs_j)

    # both must actually discriminate (chance = 0.5)
    assert aucs_t.mean() > 0.75, aucs_t
    assert aucs_j.mean() > 0.75, aucs_j

    spread_t = aucs_t.max() - aucs_t.min()
    spread_j = aucs_j.max() - aucs_j.min()
    tol = max(spread_t, spread_j, 0.02 * aucs_t.mean())
    diff = abs(aucs_t.mean() - aucs_j.mean())
    print(f"means: torch {aucs_t.mean():.5f} jax {aucs_j.mean():.5f} "
          f"diff {diff:.5f} tol {tol:.5f} "
          f"(spread_t {spread_t:.5f}, spread_j {spread_j:.5f})")
    assert diff <= tol, (
        f"OGB-protocol best rocauc disagrees beyond seed noise: torch "
        f"{aucs_t} vs jax {aucs_j} (diff {diff:.5f} > tol {tol:.5f})")
