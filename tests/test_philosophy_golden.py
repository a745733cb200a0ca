"""PhilosophyTrainer 3-player dynamics golden vs the reference hot loop.

The philosophy trainer is the one training flavor whose per-step dynamics
were covered only by self-consistency smoke tests.  This pins its exact
reference semantics (trainer/philosophy_trainer.py:18-46):

  peasant_loss      = loss_func(view2d, view3d)        -> 2D model only
  philosopher_loss  = peasant_loss - critic_loss       -> 3D model only
  critic_loss       = critic_loss_func(view3d, recon)  -> critic only

with ALL THREE gradients computed at the ORIGINAL parameters (the torch
side backwards through one retained graph with `inputs=` restrictions;
updates are applied sequentially but never re-forward), three independent
Adams with the reference's param-group convention (batch_norm group gets
weight_decay 0, philosophy_trainer.py:105-121), and BN running stats
advanced exactly once per batch.

torch side: REAL reference PNA + Net3D + RegularizationLoss (its
variance/covariance regularizer tail active by default) + CriticLoss, and
the critic mirrored with the reference's own MLP (the upstream
`BasicCritic` lives in models/legacy/ and is UNREACHABLE from train.py —
`globals()['BasicCritic']` raises because models/__init__ imports the
empty legacy package; this repo registers a simplified deterministic
critic under that name, documented in models/byol.py, and the torch
harness mirrors it with reference base_layers.MLP so the TRAINER dynamics
are what is compared).  jax side: the production PhilosophyTrainer jitted
step, from the converted torch init, free-running (no resync).

Assertions: (1) a step-0 per-player GRADIENT parity probe at the exact
synced state — the clean dynamics object (post-Adam params are not
elementwise comparable after free-running, see test_trajectory_golden's
notes); (2) all three losses track over 8 free steps on fresh batches
within fp32 drift; (3) the peasant loss improves on both sides.
"""
import sys

import numpy as np
import pytest
import torch

import test_layer_golden_ext  # noqa: F401  (canonical reference stubs)
from test_trajectory_golden import _torch_graphs, _torch_graphs3d  # noqa: E402
from test_full_protocol_parity import HP2D, HP3D  # noqa: E402

sys.path.insert(0, "/root/reference")
from models.pna import PNA as RefPNA  # noqa: E402
from models.net3d import Net3D as RefNet3D  # noqa: E402
from models.base_layers import MLP as RefMLP  # noqa: E402
from commons.losses import (  # noqa: E402
    CriticLoss as RefCriticLoss, RegularizationLoss as RefRegLoss)

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from infomax3d_tpu.data.synthetic import SyntheticMolecules  # noqa: E402
from infomax3d_tpu.graphs.batch import (  # noqa: E402
    BucketSpec, batch_graphs, to_graph_batch)
from infomax3d_tpu.losses import LOSS_REGISTRY  # noqa: E402
from infomax3d_tpu.models import PNA, Net3D  # noqa: E402
from infomax3d_tpu.models.byol import Critic  # noqa: E402
from infomax3d_tpu.train.torch_interop import convert_state_dict  # noqa: E402
from infomax3d_tpu.train.trainer import PhilosophyTrainer  # noqa: E402

B, STEPS = 8, 8
TARGET = HP2D["target_dim"]          # 16
CRITIC_KW = dict(metric_dim=TARGET, hidden_dim=24, layers=2, repeats=2,
                 dropout=0.0)
LR, WD = 1e-3, 1e-4


class TorchCritic(torch.nn.Module):
    """Torch mirror of this repo's Critic (models/byol.py): MLP z ->
    metric_dim*repeats, reshaped [B, metric_dim, repeats] — built from the
    reference's own base_layers.MLP so init/forward math is upstream's."""

    def __init__(self, metric_dim, hidden_dim, layers, repeats, dropout):
        super().__init__()
        self.repeats = repeats
        self.metric_dim = metric_dim
        self.mlp = RefMLP(in_dim=metric_dim, hidden_size=hidden_dim,
                          out_dim=metric_dim * repeats, layers=layers,
                          dropout=dropout)

    def forward(self, z):
        return self.mlp(z).view(z.shape[0], self.metric_dim, self.repeats)


def _param_groups(module):
    """Reference initialize_optimizer convention
    (philosophy_trainer.py:105-121): batch_norm params with weight_decay 0,
    everything else with the configured decay."""
    bn = [v for k, v in module.named_parameters() if "batch_norm" in k]
    normal = [v for k, v in module.named_parameters()
              if "batch_norm" not in k]
    return [{"params": bn, "weight_decay": 0}, {"params": normal}]


@pytest.mark.slow
def test_philosophy_three_player_dynamics_golden(tmp_path):
    torch.manual_seed(17)
    ref2d = RefPNA(**HP2D)
    ref3d = RefNet3D(node_dim=0, edge_dim=1, **HP3D)
    ref_critic = TorchCritic(**CRITIC_KW)
    peasant_fn = RefRegLoss()            # variance/covariance regs active
    critic_fn = RefCriticLoss()
    optim = torch.optim.Adam(_param_groups(ref2d), lr=LR, weight_decay=WD)
    optim3d = torch.optim.Adam(_param_groups(ref3d), lr=LR, weight_decay=WD)
    optim_c = torch.optim.Adam(_param_groups(ref_critic), lr=LR,
                               weight_decay=WD)

    ds = SyntheticMolecules(STEPS * B, seed=5, n_min=6, n_max=14)
    batches_t = [([ds.graph2d(i) for i in range(k * B, (k + 1) * B)],
                  [ds.graph3d(i) for i in range(k * B, (k + 1) * B)])
                 for k in range(STEPS)]

    # ---- jax side: production trainer from the converted torch init
    args = dict(num_epochs=1, patience=50, minimum_epochs=0,
                log_iterations=10 ** 6, val_per_batch=True,
                optimizer="Adam",
                optimizer_params={"lr": LR, "weight_decay": WD},
                lr_scheduler=None, lr_scheduler_params={},
                transfer_layers=[], frozen_layers=[],
                exclude_from_transfer=[], models_to_save=[],
                checkpoint=None, bf16_compute=False, critic_in_dim=TARGET)
    tr = PhilosophyTrainer(
        {"model": PNA(**HP2D), "model3d": Net3D(**HP3D),
         "critic": Critic(**CRITIC_KW)},
        args, metrics={}, main_metric="loss", run_dir=str(tmp_path),
        loss_func=LOSS_REGISTRY["RegularizationLoss"](),
        loss_name="RegularizationLoss",
        critic_loss=LOSS_REGISTRY["CriticLoss"](),
        scheduler_step_per_batch=False, use_tensorboard=False)

    n2 = max(sum(m["node_feat"].shape[0] for m in ms)
             for ms, _ in batches_t) + 8
    e2 = max(sum(m["senders"].shape[0] for m in ms)
             for ms, _ in batches_t) + 8
    k2 = max(int(np.bincount(m["receivers"]).max())
             for ms, _ in batches_t for m in ms)
    nmax2 = max(m["node_feat"].shape[0] for ms, _ in batches_t for m in ms)
    e3 = max(sum(m["senders"].shape[0] for m in ms3)
             for _, ms3 in batches_t) + 8
    spec2 = BucketSpec(B, n2, e2, max_deg=k2, csr=True, nmax=nmax2)
    spec3 = BucketSpec(B, n2, e3)
    batches_j = [{"graph2d": to_graph_batch(batch_graphs(ms, spec2)),
                  "graph3d": to_graph_batch(batch_graphs(ms3, spec3))}
                 for ms, ms3 in batches_t]
    tr.init_state(batches_j[0])

    params = dict(tr.state.params)
    stats = dict(tr.state.batch_stats)
    for key, ref in (("model", ref2d), ("model3d", ref3d),
                     ("critic", ref_critic)):
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        fp, fs, rep = convert_state_dict(
            sd, flatten_dict(params[key]),
            flatten_dict(tr.state.batch_stats[key]))
        assert not rep["missing"], f"{key}: unmatched {rep['missing'][:4]}"
        params[key] = unflatten_dict({p: jnp.asarray(v)
                                      for p, v in fp.items()})
        stats[key] = unflatten_dict({p: jnp.asarray(v)
                                     for p, v in fs.items()})
    tr.state = tr.state.replace(params=params, batch_stats=stats,
                                opt_state=tr._init_opt_state(params))

    step_fn, _ = tr._steps_for(batches_j[0])
    rng = jax.random.key(0)

    # ---- step-0 gradient-routing probe at the exact synced state: the
    # clean dynamics object (post-Adam params are NOT elementwise
    # comparable after free-running — Adam normalizes fp/zero-grad noise
    # into +-lr walks, see test_trajectory_golden's design notes)
    def player_grad(key):
        def f(pp):
            p = dict(tr.state.params)
            p[key] = pp
            pl, phl, cl, _, _, _ = tr._forward(
                p, tr.state.batch_stats, batches_j[0], rng, True)
            return {"model": pl, "model3d": phl, "critic": cl}[key]
        return jax.grad(f)(tr.state.params[key])

    grads_j = {k: player_grad(k) for k in ("model", "model3d", "critic")}

    # ---- free-run both sides
    ref2d.train(), ref3d.train(), ref_critic.train()
    losses_t, losses_j = [], []
    for t in range(STEPS):
        ms, ms3 = batches_t[t]
        g2 = _torch_graphs(ms)
        g3 = _torch_graphs3d(ms3)
        view2d = ref2d(g2)
        view3d = ref3d(g3)
        recon = ref_critic(view3d)
        critic_loss = critic_fn(view3d, recon)
        peasant_loss = peasant_fn(view2d, view3d)
        philosopher_loss = peasant_loss - critic_loss
        # philosophy_trainer.py:31-46 — sequential steps, one retained graph
        peasant_loss.backward(inputs=list(ref2d.parameters()),
                              retain_graph=True)
        optim.step()
        philosopher_loss.backward(inputs=list(ref3d.parameters()),
                                  retain_graph=True)
        optim3d.step()
        critic_loss.backward(inputs=list(ref_critic.parameters()))
        optim_c.step()
        if t == 0:
            # per-player torch grads (captured before zero_grad): peasant
            # -> 2D, philosopher -> 3D, critic loss -> critic
            for key, ref in (("model", ref2d), ("model3d", ref3d),
                             ("critic", ref_critic)):
                g_sd = {n: p.grad.detach().numpy()
                        for n, p in ref.named_parameters()
                        if p.grad is not None}
                gt, _, _ = convert_state_dict(
                    g_sd, flatten_dict(tr.state.params[key]), {})
                flat_gj = flatten_dict(grads_j[key])
                gscale = max(np.abs(v).max() for v in gt.values())
                for path, want in gt.items():
                    got = np.asarray(flat_gj[path], np.float32)
                    err = np.abs(got - want)
                    tol = 5e-4 * gscale + 2e-3 * np.abs(want)
                    assert (err <= tol).all(), \
                        (f"{key} grad {'/'.join(path)} mismatch: max "
                         f"{err.max():.2e}, scale {gscale:.2e}")
        optim.zero_grad(), optim3d.zero_grad(), optim_c.zero_grad()
        losses_t.append((float(peasant_loss.detach()),
                         float(philosopher_loss.detach()),
                         float(critic_loss.detach())))

        tr._loss_fn_extra = tr.state.extra
        tr.state, pl, aux = step_fn(tr.state, batches_j[t],
                                    tr._full_lr_vectors(), rng)
        losses_j.append((float(pl),
                         float(aux.extra_losses["philosopher_loss"]),
                         float(aux.extra_losses["CriticLoss"])))

    losses_t, losses_j = np.asarray(losses_t), np.asarray(losses_j)
    print("peasant torch", losses_t[:, 0], "\npeasant jax  ", losses_j[:, 0])
    print("critic torch ", losses_t[:, 2], "\ncritic jax   ", losses_j[:, 2])
    # free-running fp32 drift stays far below these over 8 steps; any
    # routing error (wrong player updated, grads after an update, double
    # BN advance, wd on BN) diverges orders of magnitude faster
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-3)
    # the adversarial game actually ran: peasant improved on both sides
    assert losses_t[-1, 0] < losses_t[0, 0]
    assert losses_j[-1, 0] < losses_j[0, 0]
