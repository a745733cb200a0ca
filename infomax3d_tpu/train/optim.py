"""Grouped optimizer with host-controlled per-group learning rates.

Replicates reference `Trainer.initialize_optimizer` (trainer/trainer.py:216-238):
params are partitioned into ordered groups

    0. batch_norm   (weight_decay forced to 0)
    1. new
    2. transferred  (optional, custom ``transferred_lr``)
    3. frozen       (optional, lr == 0)

The group ORDER matters: it is the unlock order of the WarmUpController's
ordered warmup.  Group membership is decided by parameter tree paths (the
JAX-native analogue of the reference's state-dict key substring matching).

TPU-native design: the LR is never baked into the optimizer.  ``update`` takes
a ``group_lrs`` vector (traced argument — LR changes never recompile); each
leaf's update is scaled by its group's current LR.  torch Adam semantics:
coupled weight decay added to the gradient BEFORE the Adam moments, bias
correction as in torch.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

GROUP_ORDER = ("batch_norm", "new", "transferred", "frozen")


def path_to_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def label_params(
    params,
    transfer_layers: Sequence[str] = (),
    exclude_from_transfer: Sequence[str] = (),
    frozen_layers: Sequence[str] = (),
    batch_norm_token: str = "BatchNorm",
):
    """Build a pytree of group indices (into GROUP_ORDER) matching the
    reference's substring rules, and the list of active group names."""
    def classify(path, _leaf):
        s = path_to_str(path)
        if any(f in s for f in frozen_layers):
            return 3
        transferred = (any(t in s for t in transfer_layers)
                       and not any(x in s for x in exclude_from_transfer))
        if transferred:
            return 2
        if batch_norm_token in s:
            return 0
        return 1

    labels = jax.tree_util.tree_map_with_path(classify, params)
    present = sorted({int(x) for x in jax.tree_util.tree_leaves(labels)})
    return labels, [GROUP_ORDER[i] for i in present]


class GroupedOptState(NamedTuple):
    inner: Any
    count: jnp.ndarray


class GroupedOptimizer:
    """Optimizer core (adam/adamw/sgd) + per-group LR scaling at update time."""

    def __init__(self, labels, name: str = "Adam",
                 lr: float = 1e-3, weight_decay: float = 0.0,
                 betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                 momentum: float = 0.0, transferred_lr: Optional[float] = None,
                 **_ignored):
        self.labels = labels
        self.name = name
        self.weight_decay = weight_decay
        b1, b2 = betas
        if name.lower() in ("adam", "adamw"):
            self.core = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
        elif name.lower() == "sgd":
            self.core = (optax.trace(decay=momentum) if momentum
                         else optax.identity())
        else:
            raise KeyError(f"unknown optimizer '{name}'")
        self.decoupled = name.lower() == "adamw"
        # per-group start LRs in GROUP_ORDER positions (frozen = 0)
        self.start_lrs = [lr, lr, transferred_lr if transferred_lr is not None else lr,
                          0.0]

    def group_start_lrs(self, active_groups: Sequence[str]) -> List[float]:
        return [self.start_lrs[GROUP_ORDER.index(g)] for g in active_groups]

    def init(self, params) -> GroupedOptState:
        return GroupedOptState(inner=self.core.init(params),
                               count=jnp.zeros([], jnp.int32))

    def update(self, grads, state: GroupedOptState, params,
               group_lrs: jnp.ndarray) -> Tuple[Any, GroupedOptState]:
        """group_lrs: [4] vector indexed by GROUP_ORDER position."""
        wd = self.weight_decay
        if wd and not self.decoupled:
            # torch coupled weight decay: grad += wd * param (not for bn group)
            grads = jax.tree_util.tree_map(
                lambda g, p, lbl: g + wd * p if lbl != 0 else g,
                grads, params, self.labels)
        updates, inner = self.core.update(grads, state.inner, params)
        if wd and self.decoupled:
            updates = jax.tree_util.tree_map(
                lambda u, p, lbl: u + wd * p if lbl != 0 else u,
                updates, params, self.labels)
        updates = jax.tree_util.tree_map(
            lambda u, lbl: -group_lrs[lbl] * u, updates, self.labels)
        return updates, GroupedOptState(inner=inner, count=state.count + 1)


def build_optimizer(params, args_like: Dict) -> Tuple[GroupedOptimizer, List[str]]:
    """Assemble optimizer + group labels from a reference-style config dict
    (optimizer, optimizer_params, transfer_layers, frozen_layers, ...)."""
    labels, active = label_params(
        params,
        transfer_layers=args_like.get("transfer_layers", ()) or (),
        exclude_from_transfer=args_like.get("exclude_from_transfer", ()) or (),
        frozen_layers=args_like.get("frozen_layers", ()) or (),
    )
    op = dict(args_like.get("optimizer_params", {}) or {})
    betas = tuple(op.pop("betas", (0.9, 0.999)))
    opt = GroupedOptimizer(
        labels, name=args_like.get("optimizer", "Adam"),
        lr=op.pop("lr", 1e-3), weight_decay=op.pop("weight_decay", 0.0),
        betas=betas, eps=op.pop("eps", 1e-8), momentum=op.pop("momentum", 0.0),
        transferred_lr=args_like.get("transferred_lr"), **op)
    return opt, active
