"""Golden parity for LR scheduling vs the reference WarmUpWrapper + torch
ReduceLROnPlateau, driven over real optimizer param groups."""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
from trainer.lr_schedulers import WarmUpWrapper as RefWarmUpWrapper  # noqa: E402

sys.path.pop(0)

from infomax3d_tpu.train.schedulers import (  # noqa: E402
    LRController, ReduceLROnPlateau, WarmUpController,
)


def make_ref(warmup_steps, lrs, interpolation="linear", **wrapped):
    params = [torch.nn.Parameter(torch.zeros(2)) for _ in lrs]
    groups = [{"params": [p], "lr": lr} for p, lr in zip(params, lrs)]
    optim = torch.optim.Adam(groups, lr=lrs[0])
    wrapped.setdefault("mode", "min")
    return RefWarmUpWrapper(optim, "ReduceLROnPlateau", warmup_steps,
                            interpolation=interpolation, **wrapped), optim


@pytest.mark.parametrize("warmup_steps,interp", [
    ([7], "linear"),
    ([7], "cosine"),
    ([5, 3, 4], "linear"),   # ordered warmup: groups unlock sequentially
    ([0, 2], "linear"),
])
def test_warmup_parity(warmup_steps, interp):
    lrs = [1e-3, 5e-4, 2e-4][: max(len(warmup_steps), 2)]
    if len(warmup_steps) > len(lrs):
        lrs = lrs + [1e-4] * (len(warmup_steps) - len(lrs))
    ref, optim = make_ref(warmup_steps, lrs, interpolation=interp,
                          factor=0.5, patience=1, cooldown=0, threshold=1e-4)
    ours = WarmUpController(lrs, warmup_steps, "ReduceLROnPlateau",
                            interpolation=interp, factor=0.5, patience=1,
                            cooldown=0, threshold=1e-4, mode="min")
    metric_seq = [5.0, 4.0, 4.0, 4.0, 3.0, 3.0, 3.0, 3.0, 5.0, 5.0, 5.0, 2.0,
                  2.0, 2.0, 2.0, 2.0]
    total_warm = sum(warmup_steps)
    for step in range(total_warm + len(metric_seq)):
        m = metric_seq[step - total_warm] if step >= total_warm else None
        ref.step(metrics=m)
        ours.step(metrics=m)
        ref_lrs = [g["lr"] for g in optim.param_groups]
        np.testing.assert_allclose(ours.lrs, ref_lrs, rtol=1e-10,
                                   err_msg=f"step {step}")


def test_reduce_on_plateau_vs_torch():
    p = torch.nn.Parameter(torch.zeros(2))
    optim = torch.optim.SGD([p], lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optim, mode="min", factor=0.6, patience=2, cooldown=3, threshold=1e-3,
        min_lr=1e-4)
    ours = ReduceLROnPlateau([0.1], mode="min", factor=0.6, patience=2,
                             cooldown=3, threshold=1e-3, min_lr=1e-4)
    rng = np.random.default_rng(3)
    metric = 10.0
    for i in range(60):
        metric = metric + float(rng.normal(scale=0.5)) - 0.05
        tsched.step(metric)
        ours.step(metric)
        assert abs(optim.param_groups[0]["lr"] - ours.lrs[0]) < 1e-12, i


def test_lr_controller_flow():
    c = LRController([1e-3], "WarmUpWrapper",
                     dict(warmup_steps=[3], wrapped_scheduler="ReduceLROnPlateau",
                          factor=0.5, patience=0, mode="min"),
                     step_per_batch=False)
    # warmup advances per batch even when step_per_batch=False (reference
    # after_optim_step warmup carve-out)
    for _ in range(3):
        c.after_optim_step()
    np.testing.assert_allclose(c.lrs, [1e-3])
    c.after_epoch(5.0)
    c.after_epoch(6.0)  # worse -> patience 0 -> halve
    np.testing.assert_allclose(c.lrs, [5e-4])
    sd = c.state_dict()
    c2 = LRController([1e-3], "WarmUpWrapper",
                      dict(warmup_steps=[3], wrapped_scheduler="ReduceLROnPlateau",
                           factor=0.5, patience=0, mode="min"),
                      step_per_batch=False)
    c2.load_state_dict(sd)
    assert c2.lrs == c.lrs


@pytest.mark.parametrize("anneal", ["linear", "cos"])
def test_onecycle_vs_torch(anneal):
    """OneCycleLR golden vs torch (configs/transformer.yml wraps it inside
    WarmUpWrapper with anneal_strategy linear)."""
    from infomax3d_tpu.train.schedulers import OneCycleLR

    lrs = [1e-3, 5e-4]
    params = [torch.nn.Parameter(torch.zeros(2)) for _ in lrs]
    groups = [{"params": [p], "lr": lr} for p, lr in zip(params, lrs)]
    optim = torch.optim.Adam(groups, lr=lrs[0])
    torch_sched = torch.optim.lr_scheduler.OneCycleLR(
        optim, max_lr=2e-4, epochs=4, steps_per_epoch=10,
        anneal_strategy=anneal, cycle_momentum=False)
    ours = OneCycleLR(lrs, max_lr=2e-4, epochs=4, steps_per_epoch=10,
                      anneal_strategy=anneal)
    np.testing.assert_allclose(
        ours.lrs, [g["lr"] for g in optim.param_groups], rtol=1e-6)
    for _ in range(39):
        optim.step()
        torch_sched.step()
        ours.step()
        np.testing.assert_allclose(
            ours.lrs, [g["lr"] for g in optim.param_groups], rtol=1e-5,
            err_msg=f"step {torch_sched.last_epoch}")
