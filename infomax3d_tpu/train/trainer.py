"""Training engine — TPU-native re-design of reference `trainer/*.py`.

Shape of the design (vs the reference's eager epoch loop):

* each trainer flavor defines ONE pure ``loss_fn(params, batch_stats, batch,
  step, rng) -> (loss, AuxOut)``; the base class jits a fused
  forward+backward+optimizer-update step per (bucket-shape, mode) pair —
  compile once, then every batch is a single device call,
* learning rates are host-controlled per group (`LRController`, exact
  WarmUpWrapper + ReduceLROnPlateau parity) and flow in as a traced vector —
  no recompiles on LR changes,
* batch-norm running stats live in the state and are updated functionally,
* host loop does: early stopping on the main metric, best/last checkpoints,
  epoch-milestone snapshots (`models_to_save`), JSONL/TensorBoard logging —
  the exact contract of reference `Trainer.train` (trainer/trainer.py:69-109).

Mesh-parallel training wraps the same step functions with shardings
(see `parallel/`).
"""
from __future__ import annotations

import math
import os
import shutil
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from infomax3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from infomax3d_tpu.train.logging import RunLogger
from infomax3d_tpu.train.optim import GROUP_ORDER, GroupedOptimizer, label_params
from infomax3d_tpu.train.schedulers import LRController
from infomax3d_tpu.train.state import TrainState
from infomax3d_tpu.utils.setup import enable_persistent_compilation_cache


class AuxOut(NamedTuple):
    predictions: jnp.ndarray
    targets: jnp.ndarray
    extra_losses: Dict[str, jnp.ndarray]


def _elementwise_supervised_loss(name: str, pred, target, valid):
    """Masked supervised losses: padded graph rows / NaN labels excluded,
    value identical to the reference's unpadded computation.  Under data
    parallelism the sum/count aggregate across shards so the value equals the
    global-batch loss."""
    if name in ("L1Loss", "MAE"):
        per = jnp.abs(pred - jnp.where(valid, target, 0.0))
    elif name in ("MSELoss",):
        per = (pred - jnp.where(valid, target, 0.0)) ** 2
    elif name in ("BCEWithLogitsLoss", "OGBNanLabelBCEWithLogitsLoss"):
        t = jnp.where(valid, target, 0.0)
        per = jax.nn.relu(pred) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    elif name in ("OGBNanLabelMSELoss",):
        per = (pred - jnp.where(valid, target, 0.0)) ** 2
    else:
        raise KeyError(f"unsupported supervised loss '{name}'")
    total = jnp.sum(jnp.where(valid, per, 0.0))
    count = valid.sum()
    from infomax3d_tpu.parallel.context import cross_replica_axis
    axis = cross_replica_axis()
    if axis is not None:
        total = jax.lax.psum(total, axis)
        count = jax.lax.psum(count, axis)
    return total / jnp.maximum(count, 1)


class Trainer:
    """Supervised trainer (reference base `Trainer`)."""

    MODEL_KEYS = ("model",)
    # bf16 compute (train/precision.py) applies unless a flavor opts out
    supports_bf16 = True

    def __init__(self, models: Dict[str, Any], args: Dict, metrics: Dict[str, Any],
                 main_metric: str, run_dir: str,
                 loss_func: Any = None, loss_name: str = "MSELoss",
                 main_metric_goal: str = "min",
                 scheduler_step_per_batch: bool = True,
                 seed: int = 0, mesh=None, tp_mesh=None,
                 use_tensorboard: bool = True):
        self.models = models
        self.args = args
        self.metrics = metrics
        if mesh is not None and loss_func is not None:
            from infomax3d_tpu.parallel.collectives import CrossDeviceLoss
            loss_func = CrossDeviceLoss(loss_func, mesh.axis_names[0])
        self.loss_func = loss_func
        self.loss_name = loss_name
        self.main_metric = loss_name if main_metric == "loss" else main_metric
        self.main_metric_goal = main_metric_goal
        from infomax3d_tpu.train.precision import resolve_compute_dtype
        self.compute_dtype = resolve_compute_dtype(
            args.get("bf16_compute", "auto")) if self.supports_bf16 else None
        if self.compute_dtype is not None:
            # gate the fused bf16 stats kernel on a real on-chip compile —
            # a Mosaic rejection degrades to csr_multi_reduce, not a crash
            from infomax3d_tpu.ops.pallas.spmm import preflight_stats_kernel
            preflight_stats_kernel()
        self.run_dir = run_dir
        self.mesh = mesh
        # tensor parallelism is a LAYOUT, not a step rewrite: params (and
        # every param-shaped tree) are column-sharded over tp_mesh's 'model'
        # axis and the ordinary jit step auto-partitions via GSPMD
        # (parallel/tp.py); mutually exclusive with the shard_map mesh
        self.tp_mesh = tp_mesh
        if tp_mesh is not None and mesh is not None and \
                "model" not in getattr(mesh, "axis_names", ()):
            raise ValueError(
                "tp_mesh (GSPMD model sharding) composes with the shard_map "
                "step only through ONE (data, model) mesh: pass the same "
                "mesh as both `mesh` and `tp_mesh` — the step is then "
                "manual over 'data' (shard_map axis_names) while GSPMD "
                "propagates the 'model' layout")
        os.makedirs(run_dir, exist_ok=True)
        enable_persistent_compilation_cache()
        self.logger = RunLogger(run_dir, use_tensorboard=use_tensorboard)
        from infomax3d_tpu.train.logging import TENSORBOARD_FUNCTIONS
        self.tensorboard_functions = {
            name: TENSORBOARD_FUNCTIONS[name]
            for name in (args.get("tensorboard_functions") or [])
            if name in TENSORBOARD_FUNCTIONS}
        self.rng = jax.random.key(seed)
        self._step_cache: Dict[Any, Callable] = {}
        self._metric_cache: Dict[Any, Callable] = {}

        self.state: Optional[TrainState] = None
        self.optims: Dict[str, GroupedOptimizer] = {}
        self.lr_controllers: Dict[str, LRController] = {}
        self.active_groups: Dict[str, Sequence[str]] = {}
        self.scheduler_step_per_batch = scheduler_step_per_batch
        self.start_epoch = 1
        self.optim_steps = 0
        self.best_val_score = -math.inf if main_metric_goal == "max" else math.inf

    # ------------------------------------------------------------------ init
    def single_shard(self, batch):
        """DP loaders stack one padded sub-batch per shard on a leading
        axis; parameters init from a single shard.  Only for loader-fed
        batches — init_state itself takes an unstacked example."""
        if self.mesh is not None and "data" in self.mesh.axis_names \
                and self.mesh.shape["data"] > 1:
            batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        if self.args.get("node_shards", 1) > 1:
            # node-sharded batches carry a [k] shard-stack axis; parameter
            # shapes init from shard 0's local view (outside shard_map the
            # partition context is unset, so gathers/readout fall through
            # to the plain local paths — values unused, only shapes matter)
            batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        return batch

    def init_state(self, example_batch) -> TrainState:
        params, batch_stats = {}, {}
        for key in self.MODEL_KEYS:
            self.rng, sub = jax.random.split(self.rng)
            variables = self._init_model(key, sub, example_batch)
            params[key] = variables["params"]
            batch_stats[key] = variables.get("batch_stats", {})
        self._build_optimizers(params)
        opt_state = self._init_opt_state(params)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state,
                                step=jnp.zeros([], jnp.int32),
                                extra=self._init_extra(params, batch_stats))
        if self.tp_mesh is not None:
            from infomax3d_tpu.parallel.tp import tp_shard_tree
            self.state = tp_shard_tree(self.state, self.tp_mesh)
        self._snapshot_model_source()
        if self.args.get("checkpoint"):
            self._load(self.args["checkpoint"])
        return self.state

    def _snapshot_model_source(self):
        """Copy each model class's source into the run dir (reference
        trainer.py:264-270 snapshots the class source next to the
        checkpoints so a run records exactly what it trained)."""
        import inspect
        for key in self.MODEL_KEYS:
            model = self.models.get(key)
            if model is None:
                continue
            try:
                cls = type(model)
                source = inspect.getsource(cls)
                file_name = os.path.basename(inspect.getfile(cls))
            except (OSError, TypeError):
                continue
            with open(os.path.join(self.run_dir, file_name), "w") as f:
                f.write(source)

    def run_tensorboard_functions(self, preds, targets, step: int,
                                  data_split: str):
        """Configured figure hooks (reference run_tensorboard_functions,
        trainer.py:201-203) — e.g. `tensorboard_functions: [singular_values]`."""
        for fn in self.tensorboard_functions.values():
            fn(preds, targets, self.logger, step, data_split)

    def _init_model(self, key, rng, batch):
        return self.models[key].init(rng, batch["graph"], deterministic=True)

    def _init_extra(self, params, batch_stats):
        return None

    def _build_optimizers(self, params):
        """Reference param groups (trainer.py:216-238) over the joint tree."""
        labels, active = label_params(
            params,
            transfer_layers=self.args.get("transfer_layers") or (),
            exclude_from_transfer=self.args.get("exclude_from_transfer") or (),
            frozen_layers=self.args.get("frozen_layers") or (),
        )
        op = dict(self.args.get("optimizer_params", {}) or {})
        betas = tuple(op.pop("betas", (0.9, 0.999)))
        opt = GroupedOptimizer(
            labels, name=self.args.get("optimizer", "Adam"),
            lr=op.pop("lr", 1e-3), weight_decay=op.pop("weight_decay", 0.0),
            betas=betas, eps=op.pop("eps", 1e-8), momentum=op.pop("momentum", 0.0),
            transferred_lr=self.args.get("transferred_lr"))
        self.optims["main"] = opt
        self.active_groups["main"] = active
        self.lr_controllers["main"] = LRController(
            opt.group_start_lrs(active),
            self.args.get("lr_scheduler"),
            self.args.get("lr_scheduler_params"),
            step_per_batch=self.scheduler_step_per_batch)

    def _init_opt_state(self, params):
        return self.optims["main"].init(params)

    def _full_lr_vector(self, name="main") -> jnp.ndarray:
        """Map the controller's per-active-group lrs into GROUP_ORDER slots."""
        full = np.zeros(len(GROUP_ORDER), np.float32)
        for g, lr in zip(self.active_groups[name], self.lr_controllers[name].lrs):
            full[GROUP_ORDER.index(g)] = lr
        return jnp.asarray(full)

    # ------------------------------------------------------------- loss core
    def loss_fn(self, params, batch_stats, batch, step, rng, train: bool):
        g = batch["graph"]
        out = self._apply(self.models["model"], params["model"],
                          batch_stats["model"], g, train, rng)
        pred, new_stats = out
        targets = g.extras["targets"]
        valid = (~jnp.isnan(targets)) & g.graph_mask[:, None]
        loss = _elementwise_supervised_loss(self.loss_name, pred, targets, valid)
        return loss, AuxOut(pred, targets, {}), {"model": new_stats}

    def _cast_in(self, tree):
        """bf16-compute boundary: params / float batch inputs f32 -> bf16."""
        if self.compute_dtype is None:
            return tree
        from infomax3d_tpu.train.precision import cast_floats
        return cast_floats(tree, self.compute_dtype)

    def _cast_out(self, tree):
        """Model outputs back to f32 so losses/metrics run full precision."""
        if self.compute_dtype is None:
            return tree
        from infomax3d_tpu.train.precision import cast_floats
        return cast_floats(tree, jnp.float32)

    def _apply(self, model, params, batch_stats, graph, train, rng,
               method=None, **kw):
        params = self._cast_in(params)
        graph = self._cast_in(graph)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            def fwd(variables, graph):
                return model.apply(variables, graph, deterministic=False,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": rng}, method=method,
                                   **kw)
            if self.args.get("remat"):
                # `remat: true` — rematerialize the forward in the backward
                # pass (jax.checkpoint, save-nothing policy): activation HBM
                # drops to O(inputs + outputs) per model at the cost of one
                # extra forward of FLOPs — the standard trade for batch /
                # depth scaling on HBM-limited chips.  Gradients are
                # IDENTICAL (same primals, same cotangent math).
                fwd = jax.checkpoint(fwd)
            out, mut = fwd(variables, graph)
            return self._cast_out(out), mut.get("batch_stats", batch_stats)
        out = model.apply(variables, graph, deterministic=True, method=method, **kw)
        return self._cast_out(out), batch_stats

    # ------------------------------------------------------------- jit steps
    def _make_train_step(self):
        if self.mesh is not None:
            return self._make_parallel_step(train=True)
        optim = self.optims["main"]

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, group_lrs, rng):
            # flavors whose loss_fn reads auxiliary state (BYOL teacher
            # params/stats) pick it up from this trace-local stash
            self._loss_fn_extra = state.extra

            def lf(params):
                loss, aux, new_stats = self.loss_fn(
                    params, state.batch_stats, batch, state.step, rng, True)
                return loss, (aux, new_stats)

            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                lf, has_aux=True)(state.params)
            updates, opt_state = optim.update(grads, state.opt_state,
                                              state.params, group_lrs)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            # loss_fn may return updates for state.extra under the reserved
            # "_extra" key (e.g. BYOL teacher running BN stats)
            extra_upd = new_stats.pop("_extra", None) \
                if isinstance(new_stats, dict) else None
            new_state = state.replace(
                params=params, opt_state=opt_state, batch_stats=new_stats,
                step=state.step + 1,
                extra=state.extra if extra_upd is None
                else {**(state.extra or {}), **extra_upd})
            new_state = self._post_update(new_state)
            return new_state, loss, aux

        return step_fn

    def _post_update(self, state: TrainState) -> TrainState:
        return state

    def _make_eval_step(self):
        if self.mesh is not None:
            return self._make_parallel_step(train=False)

        @jax.jit
        def step_fn(state: TrainState, batch, rng):
            self._loss_fn_extra = state.extra
            loss, aux, _ = self.loss_fn(state.params, state.batch_stats, batch,
                                        state.step, rng, False)
            return loss, aux

        return step_fn

    # ----------------------------------------------------- data-parallel step
    def _make_parallel_step(self, train: bool):
        """shard_map'd data-parallel step over the 'data' mesh axis.

        Batches arrive with a leading device axis [n_dev, ...] (loader
        `n_shards`); params/state replicated.  Inside the shard each device
        computes its local forward; global coupling happens through (i)
        CrossDeviceLoss all_gather for contrastive objectives, (ii) psum'd
        masked BN statistics and supervised loss sums, (iii) psum'd gradients
        — so loss values and parameter updates are identical to single-device
        training on the concatenated batch.
        """
        from jax.sharding import PartitionSpec as P
        from infomax3d_tpu.graphs.batch import GraphBatch
        from infomax3d_tpu.parallel.context import (
            using_cross_replica_axis, using_edge_partition_axis,
            using_node_partition_axis)
        axis = self.mesh.axis_names[0]
        data_sharded = self.mesh.shape[axis] > 1
        # optional second mesh axis: graph parallelism over 'graph' — either
        # edge-partitioned (batches replicated, each device slices its edge
        # shard in-step; aggregations complete via psum/pmax — see
        # parallel/edge_partition.py) or node-sharded (`node_shards` config:
        # the LOADER stacks host-partitioned batches [k, ...]; sender
        # gathers halo-exchange ghosts, receiver-owned aggregations complete
        # locally — see parallel/node_partition.py::shard_graph_batch)
        g_axis = ("graph" if "graph" in self.mesh.axis_names
                  and self.mesh.shape["graph"] > 1 else None)
        node_mode = g_axis is not None and \
            self.args.get("node_shards", 1) > 1
        grad_axes = (axis,) + ((g_axis,) if g_axis else ())
        optim = self.optims["main"] if train else None

        def _shard_edges(b):
            if g_axis is None or node_mode:
                return b
            from infomax3d_tpu.parallel.edge_partition import shard_batch_edges
            k = self.mesh.shape["graph"]
            return jax.tree_util.tree_map(
                lambda v: (shard_batch_edges(v, k, g_axis)
                           if isinstance(v, GraphBatch) else v), b,
                is_leaf=lambda v: isinstance(v, GraphBatch))

        def core(state, batch, group_lrs, rng):
            self._loss_fn_extra = state.extra
            local = batch
            if data_sharded:
                local = jax.tree_util.tree_map(lambda a: a[0], local)
            if node_mode:
                # node-sharded batches carry one more leading axis (the
                # shard stack built host-side by shard_graph_batch)
                local = jax.tree_util.tree_map(lambda a: a[0], local)
            local = _shard_edges(local)
            # fold only the DATA index: graph-axis replicas must draw the
            # same dropout masks for the replicated node-space compute
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            with using_cross_replica_axis(axis), \
                    using_edge_partition_axis(None if node_mode else g_axis), \
                    using_node_partition_axis(g_axis if node_mode else None):
                if not train:
                    loss, aux, _ = self.loss_fn(state.params, state.batch_stats,
                                                local, state.step, rng, False)
                    return jax.lax.pmean(loss, axis), aux

                def lf(params):
                    loss, aux, new_stats = self.loss_fn(
                        params, state.batch_stats, local, state.step, rng, True)
                    return loss, (aux, new_stats)

                (loss, (aux, new_stats)), grads = jax.value_and_grad(
                    lf, has_aux=True)(state.params)
            # per-device losses are identical (global loss via collectives);
            # JAX's collective transposes differentiate the per-device SUM,
            # so pmean recovers d(loss)/d(params) exactly.  Under edge
            # partitioning the same argument covers the graph axis: summing
            # the k per-replica losses scales every cotangent by k (psum
            # transpose), and pmean over the graph axis divides it back —
            # for edge-side params (each shard's k-scaled local
            # contribution) and node-side params (k identical full grads)
            # alike.
            grads = jax.lax.pmean(grads, grad_axes)
            updates, opt_state = optim.update(grads, state.opt_state,
                                              state.params, group_lrs)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            extra_upd = new_stats.pop("_extra", None) \
                if isinstance(new_stats, dict) else None
            new_state = state.replace(
                params=params, opt_state=opt_state, batch_stats=new_stats,
                step=state.step + 1,
                extra=state.extra if extra_upd is None
                else {**(state.extra or {}), **extra_upd})
            new_state = self._post_update(new_state)
            return new_state, jax.lax.pmean(loss, axis), aux

        # node mode: the batch carries a [k] shard-stack axis (after the
        # optional [d] data axis); aux outputs are REPLICATED over the graph
        # axis (psum-completed readouts), so they only shard over data
        if node_mode:
            batch_spec = P(axis, g_axis) if data_sharded else P(g_axis)
        else:
            batch_spec = P(axis) if data_sharded else P()
        aux_spec = P(axis) if data_sharded else P()
        if train:
            in_specs = (P(), batch_spec, P(), P())
            out_specs = (P(), P(), aux_spec)
            donate = (0,)
        else:
            core_eval = lambda state, batch, rng: core(state, batch, None, rng)
            in_specs = (P(), batch_spec, P())
            out_specs = (P(), aux_spec)
            donate = ()

        fn = core if train else core_eval
        sm_kwargs = {}
        if "model" in self.mesh.axis_names:
            # hybrid DP x TP: shard_map is MANUAL only over the data axis;
            # the 'model' axis stays auto so GSPMD propagates the params'
            # column shardings (parallel/tp.py) and inserts the TP
            # collectives — layouts compose with the explicit DP contracts
            sm_kwargs["axis_names"] = {a for a in self.mesh.axis_names
                                       if a != "model"}
        mapped = jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False,
                               **sm_kwargs)
        return jax.jit(mapped, donate_argnums=donate)

    def _steps_for(self, batch):
        key = jax.tree_util.tree_structure(batch)
        shapes = tuple(x.shape for x in jax.tree_util.tree_leaves(batch))
        ck = (key, shapes)
        if ck not in self._step_cache:
            self._step_cache[ck] = (self._make_train_step(),
                                    self._make_eval_step())
        return self._step_cache[ck]

    # ---------------------------------------------------------------- epochs
    def _host_filter(self, batch, aux: AuxOut):
        """Pull real rows to host for metric accumulation (handles the
        leading device axis of parallel batches by flattening)."""
        mask = np.asarray(batch["graph"].graph_mask)
        if self.args.get("node_shards", 1) > 1 and mask.ndim >= 2:
            # node-sharded batches replicate graph arrays over the shard
            # stack axis; predictions carry no such axis — take one copy
            mask = mask[..., 0, :]
        mask = mask.reshape(-1)
        preds = np.asarray(aux.predictions)
        targets = np.asarray(aux.targets)
        preds = preds.reshape(mask.shape[0], *preds.shape[-1:])
        targets = targets.reshape(mask.shape[0], *targets.shape[-1:])
        return preds[mask], targets[mask]

    def _eval_metrics(self, preds, targets, val=False) -> Dict[str, float]:
        res = {
            "mean_pred": float(np.mean(preds)),
            "std_pred": float(np.std(preds, ddof=1)) if preds.size > 1 else 0.0,
            "mean_targets": float(np.nanmean(targets)),
            "std_targets": float(np.nanstd(targets, ddof=1)) if targets.size > 1 else 0.0,
        }
        # metric math runs on the host CPU backend: tiny [B, D] arrays — eager
        # dispatch to the TPU (through a tunnel on some deployments) costs far
        # more than the FLOPs
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            jp = jnp.asarray(np.asarray(preds))
            jt = jnp.asarray(np.asarray(targets))
            for key, metric in self.metrics.items():
                if getattr(metric, "val_only", False) and not val:
                    continue
                try:
                    res[key] = float(metric(jp, jt))
                except Exception:
                    res[key] = float("nan")
        return res

    def train_epoch(self, loader, epoch: int) -> None:
        log_iterations = self.args.get("log_iterations", 20)
        for i, batch in enumerate(loader):
            train_step, _ = self._steps_for(batch)
            self.rng, sub = jax.random.split(self.rng)
            self.state, loss, aux = train_step(self.state, batch,
                                               self._full_lr_vector(), sub)
            self.optim_steps += 1
            self._after_optim_step()
            if self.optim_steps % log_iterations == 0:
                preds, targets = self._host_filter(batch, aux)
                m = self._eval_metrics(preds, targets)
                m[self.loss_name] = float(loss)
                for k, v in aux.extra_losses.items():
                    m[k] = float(v)
                for gi, lr in enumerate(self.lr_controllers["main"].lrs):
                    m[f"lr_param_group_{gi}"] = lr
                self.logger.log(m, "train", self.optim_steps, epoch)
                self.run_tensorboard_functions(preds, targets,
                                               self.optim_steps, "train")

    def _after_optim_step(self):
        for c in self.lr_controllers.values():
            c.after_optim_step()

    def evaluate_epoch(self, loader, epoch: int = 0) -> Dict[str, float]:
        """Validation pass.  Aggregation mirrors the reference: per-batch
        averaged metrics when `val_per_batch` (contrastive probes), else
        whole-epoch metrics on concatenated predictions (OGB evaluators)."""
        val_per_batch = self.args.get("val_per_batch", True)
        if len(loader) == 0:
            raise ValueError(
                "evaluation loader yields no batches — the split is smaller "
                "than the batch size (contrastive loaders drop partial "
                "batches; shrink batch_size or grow the split)")
        totals: Dict[str, float] = {}
        n_batches = 0
        all_preds, all_targets = [], []
        epoch_loss = 0.0
        for batch in loader:
            _, eval_step = self._steps_for(batch)
            self.rng, sub = jax.random.split(self.rng)
            loss, aux = eval_step(self.state, batch, sub)
            n_batches += 1
            epoch_loss += float(loss)
            preds, targets = self._host_filter(batch, aux)
            if n_batches == 1:  # reference: figure hooks on the first val batch
                self.run_tensorboard_functions(preds, targets,
                                               self.optim_steps, "val")
            if val_per_batch:
                m = self._eval_metrics(preds, targets, val=True)
                m[self.loss_name] = float(loss)
                for k, v in aux.extra_losses.items():
                    m[k] = float(v)
                for k, v in m.items():
                    totals[k] = totals.get(k, 0.0) + v
            else:
                all_preds.append(preds)
                all_targets.append(targets)
        if val_per_batch:
            return {k: v / max(n_batches, 1) for k, v in totals.items()}
        preds = np.concatenate(all_preds, axis=0)
        targets = np.concatenate(all_targets, axis=0)
        m = self._eval_metrics(preds, targets, val=True)
        m[self.loss_name] = epoch_loss / max(n_batches, 1)
        return m

    def train(self, train_loader, val_loader) -> Dict[str, float]:
        """Full fit loop with early stopping — reference Trainer.train."""
        if self.state is None:
            self.init_state(self.single_shard(next(iter(train_loader))))
        patience = self.args.get("patience", 20)
        minimum_epochs = self.args.get("minimum_epochs", 0)
        num_epochs = self.args.get("num_epochs", 10)
        models_to_save = self.args.get("models_to_save", []) or []
        epochs_no_improve = 0

        eval_per_epochs = self.args.get("eval_per_epochs", 0)
        for epoch in range(self.start_epoch, num_epochs + 1):
            self.train_epoch(train_loader, epoch)
            metrics = self.evaluate_epoch(val_loader, epoch)
            if eval_per_epochs > 0 and epoch % eval_per_epochs == 0:
                self.run_per_epoch_evaluations(val_loader, epoch)
            val_score = metrics.get(self.main_metric, float("nan"))
            for name, c in self.lr_controllers.items():
                c.after_epoch(val_score)
            self.logger.log(metrics, "val", self.optim_steps, epoch)
            val_loss = metrics.get(self.loss_name, float("nan"))
            print(f"[Epoch {epoch}] {self.main_metric}: {val_score:.6f} "
                  f"val loss: {val_loss:.6f}")

            improved = (val_score >= self.best_val_score
                        if self.main_metric_goal == "max"
                        else val_score <= self.best_val_score)
            if improved:
                epochs_no_improve = 0
                self.best_val_score = val_score
                self.save_checkpoint(epoch, "best_checkpoint.pt")
            else:
                epochs_no_improve += 1
            self.save_checkpoint(epoch, "last_checkpoint.pt")

            if epochs_no_improve >= patience and epoch >= minimum_epochs:
                print(f"Early stopping after {epoch} epochs; best epoch was "
                      f"{epoch - epochs_no_improve}.")
                break
            if epoch in models_to_save:
                shutil.copyfile(os.path.join(self.run_dir, "best_checkpoint.pt"),
                                os.path.join(self.run_dir,
                                             f"best_checkpoint_{epoch}epochs.pt"))
        # reload best and evaluate (reference trainer.py:106-109)
        best = os.path.join(self.run_dir, "best_checkpoint.pt")
        if os.path.exists(best):
            self._load(best, restore_host=False)
        return self.evaluation(val_loader, "val_best_checkpoint")

    def run_per_epoch_evaluations(self, loader, epoch: int):
        """Hook for expensive periodic evaluations (reference
        run_per_epoch_evaluations, trainer.py:66-67)."""

    def evaluation(self, loader, data_split: str = "") -> Dict[str, float]:
        metrics = self.evaluate_epoch(loader)
        with open(os.path.join(self.run_dir,
                               f"evaluation_{data_split}.txt"), "w") as f:
            for k, v in metrics.items():
                f.write(f"{k}: {v}\n")
        return metrics

    # ----------------------------------------------------------- checkpoints
    def save_checkpoint(self, epoch: int, name: str):
        host = {
            "epoch": epoch,
            "best_val_score": self.best_val_score,
            "optim_steps": self.optim_steps,
            "scheduler_state_dict": {k: c.state_dict()
                                     for k, c in self.lr_controllers.items()},
        }
        save_checkpoint(os.path.join(self.run_dir, name), self.state, host)
        cfg_path = os.path.join(self.run_dir, "train_arguments.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(_yamlable(self.args), f)

    def _load(self, path: str, restore_host: bool = True):
        self.state, host = load_checkpoint(path, self.state)
        if restore_host and host:
            self.start_epoch = host.get("epoch", 0) + 1
            self.best_val_score = host.get("best_val_score", self.best_val_score)
            self.optim_steps = host.get("optim_steps", 0)
            sds = host.get("scheduler_state_dict") or {}
            for k, sd in sds.items():
                if k in self.lr_controllers and sd is not None:
                    self.lr_controllers[k].load_state_dict(sd)


def _yamlable(obj):
    if isinstance(obj, dict):
        return {k: _yamlable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yamlable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


# ===========================================================================
# contrastive trainer family
# ===========================================================================

class SelfSupervisedTrainer(Trainer):
    """2D-vs-3D contrastive (reference trainer/self_supervised_trainer.py)."""

    MODEL_KEYS = ("model", "model3d")

    def _init_model(self, key, rng, batch):
        graph = batch["graph2d"] if key == "model" else batch["graph3d"]
        return self.models[key].init(rng, graph, deterministic=True)

    def _loss_kwargs(self, batch):
        g2 = batch["graph2d"]
        inner = getattr(self.loss_func, "loss", self.loss_func)
        if "Local" in type(inner).__name__:
            kw = dict(node_graph=g2.node_graph, node_mask=g2.node_mask)
            if self.mesh is not None:
                kw["_n_graphs_local"] = g2.num_graphs
            return kw
        return {}

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r2, r3 = jax.random.split(rng)
        z1, s2 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["graph2d"], train, r2)
        z2, s3 = self._apply(self.models["model3d"], params["model3d"],
                             batch_stats["model3d"], batch["graph3d"], train, r3)
        loss = self.loss_func(z1, z2, **self._loss_kwargs(batch))
        return loss, AuxOut(z1, z2, {}), {"model": s2, "model3d": s3}

    def _host_filter(self, batch, aux: AuxOut):
        return np.asarray(aux.predictions), np.asarray(aux.targets)

    def run_per_epoch_evaluations(self, loader, epoch: int):
        """Linear probe: least-squares fit of targets from 2D embeddings
        (reference self_supervised_trainer.py:52-76)."""
        n_samples = self.args.get("linear_probing_samples", 500)
        reps, targets = [], []
        for batch in loader:
            _, eval_step = self._steps_for(batch)
            self.rng, sub = jax.random.split(self.rng)
            _, aux = eval_step(self.state, batch, sub)
            z = np.asarray(aux.predictions)
            t = batch["graph2d"].extras.get("targets")
            if t is None:
                return
            reps.append(z)
            targets.append(np.asarray(t)[: z.shape[0]])
            if sum(r.shape[0] for r in reps) >= n_samples:
                break
        X = np.concatenate(reps, axis=0)
        y = np.concatenate(targets, axis=0)
        if X.shape[0] < X.shape[1]:
            raise ValueError(
                f"linear_probing_samples {X.shape[0]} < metric dim "
                f"{X.shape[1]}; linear probing cannot be used.")
        sol, *_ = np.linalg.lstsq(X, y, rcond=None)
        mae = float(np.abs(X @ sol - y).mean())
        self.logger.log({"linear_probe_mae": mae}, "val", self.optim_steps,
                        epoch)


class SelfSupervisedAlternatingTrainer(SelfSupervisedTrainer):
    """Gradients alternate sides each optim step
    (self_supervised_alternating_trainer.py:10-22)."""

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r2, r3 = jax.random.split(rng)
        z1, s2 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["graph2d"], train, r2)
        z2, s3 = self._apply(self.models["model3d"], params["model3d"],
                             batch_stats["model3d"], batch["graph3d"], train, r3)
        even = (step % 2) == 0
        z1a = jnp.where(even, 1.0, 0.0) * z1 + \
            jnp.where(even, 0.0, 1.0) * jax.lax.stop_gradient(z1)
        z2a = jnp.where(even, 1.0, 0.0) * jax.lax.stop_gradient(z2) + \
            jnp.where(even, 0.0, 1.0) * z2
        # loss argument order also swaps on odd steps in the reference
        loss_even = self.loss_func(z1a, z2a, **self._loss_kwargs(batch))
        loss_odd = self.loss_func(z2a, z1a, **self._loss_kwargs(batch))
        loss = jnp.where(even, loss_even, loss_odd)
        return loss, AuxOut(z1, z2, {}), {"model": s2, "model3d": s3}


class SelfSupervisedAETrainer(SelfSupervisedTrainer):
    """Contrastive + distance reconstruction; model3d returns
    (embedding, distance_preds) (self_supervised_ae_trainer.py:14-30)."""

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r2, r3 = jax.random.split(rng)
        z1, s2 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["graph2d"], train, r2)
        (z2, dist_pred), s3 = self._apply(
            self.models["model3d"], params["model3d"], batch_stats["model3d"],
            batch["graph3d"], train, r3)
        g3 = batch["graph3d"]
        lc, lr_ = self.loss_func(z1, z2, distances=g3.edge_dist,
                                 distance_pred=dist_pred, mask=g3.edge_mask)
        return lc + lr_, AuxOut(z1, z2, {"contrastive_loss": lc,
                                         "reconstruction_loss": lr_}), \
            {"model": s2, "model3d": s3}


class NoisyNegativesTrainer(SelfSupervisedTrainer):
    """3D view carries extra noised conformers appended as negatives
    (noisy_negatives_trainer.py); the loss (NTXentExtraNegatives) handles
    the split."""

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r2, r3, rn = jax.random.split(rng, 3)
        z1, s2 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["graph2d"], train, r2)
        z2, s3 = self._apply(self.models["model3d"], params["model3d"],
                             batch_stats["model3d"], batch["graph3d"], train, r3)
        zn, s3b = self._apply(self.models["model3d"], params["model3d"],
                              s3, batch["noisy3d"], train, rn)
        z2full = jnp.concatenate([z2, zn], axis=0)
        loss = self.loss_func(z1, z2full, **self._loss_kwargs(batch))
        return loss, AuxOut(z1, z2full, {}), {"model": s2, "model3d": s3b}


class GraphCLTrainer(Trainer):
    """Same model on two augmented 2D views (graphcl_trainer.py:11-15)."""

    MODEL_KEYS = ("model",)

    def _init_model(self, key, rng, batch):
        return self.models[key].init(rng, batch["view1"], deterministic=True)

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r1, r2 = jax.random.split(rng)
        z1, s1 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["view1"], train, r1)
        z2, s2 = self._apply(self.models["model"], params["model"],
                             s1, batch["view2"], train, r2)
        loss = self.loss_func(z1, z2)
        return loss, AuxOut(z1, z2, {}), {"model": s2}

    def _host_filter(self, batch, aux: AuxOut):
        return np.asarray(aux.predictions), np.asarray(aux.targets)


class BYOLTrainer(SelfSupervisedTrainer):
    """BYOL student/teacher with EMA (byol_trainer.py + byol_wrapper.py).

    Teacher parameters AND teacher BatchNorm running stats live in
    state.extra; the teacher forward runs in TRAIN mode during training —
    `torch.no_grad()` in the reference (byol_wrapper.py:50-52) disables
    autograd but not BN batch-statistics mode, so the teacher normalizes
    with batch stats and keeps updating its own running buffers.  Params are
    EMA-updated INSIDE the jitted step (`_post_update`) — the TPU-native
    version of `ma_teacher_update` after each optimizer step; teacher stats
    flow back through the reserved "_extra" key of the stats tree.  Uses the
    base (and parallel shard_map) step machinery.
    """

    def __init__(self, *a, ma_decay: float = 0.99, ema_all: bool = False,
                 **kw):
        super().__init__(*a, **kw)
        self.ma_decay = ma_decay
        # reference-exact: after_optim_step calls ONLY
        # `self.model.ma_teacher_update()` (byol_trainer.py:24) — the 3D
        # wrapper's teacher stays frozen at its deepcopy-of-init state for
        # the whole run.  That is almost certainly an upstream oversight
        # (BYOL prescribes EMA on every teacher), but it is the behavior a
        # reference user gets, so it is the default here; `byol_ema_all:
        # true` opts into the symmetric update on both teachers.
        self.ema_keys = self.MODEL_KEYS if ema_all else ("model",)

    def _init_extra(self, params, batch_stats):
        # teacher = materialized copy of each student's trunk + its BN
        # buffers (reference deepcopy, byol_wrapper.py:28; copies, not
        # aliases: the step donates its input buffers)
        return jax.tree_util.tree_map(jnp.copy, {
            "teacher": {k: self._strip_predictor(params[k])
                        for k in self.MODEL_KEYS},
            "teacher_stats": {k: self._strip_predictor(batch_stats[k])
                              for k in self.MODEL_KEYS}})

    @staticmethod
    def _strip_predictor(p):
        return {k: v for k, v in p.items() if k != "predictor"}

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        r2, r3 = jax.random.split(rng)
        mdl2, mdl3 = self.models["model"], self.models["model3d"]
        (pred2_s, proj2_t), s2, t2 = self._apply_byol(
            mdl2, params["model"], batch_stats["model"],
            batch["graph2d"], train, r2, teacher_key="model")
        (pred3_s, proj3_t), s3, t3 = self._apply_byol(
            mdl3, params["model3d"], batch_stats["model3d"],
            batch["graph3d"], train, r3, teacher_key="model3d")
        loss = (self.loss_func(pred2_s, jax.lax.stop_gradient(proj3_t)) +
                self.loss_func(jax.lax.stop_gradient(proj2_t), pred3_s))
        new_stats = {"model": s2, "model3d": s3,
                     "_extra": {"teacher_stats": {"model": t2, "model3d": t3}}}
        return loss, AuxOut(pred2_s, pred3_s, {}), new_stats

    def _apply_byol(self, model, params, batch_stats, graph, train, rng,
                    teacher_key):
        rng_s, rng_t = jax.random.split(rng)
        (pred_s, _), new_stats = self._apply(model, params, batch_stats, graph,
                                             train, rng_s)
        extra = self._loss_fn_extra
        tp = dict(params)
        tp.update(extra["teacher"][teacher_key])
        t_stats = dict(batch_stats)
        t_stats.update(extra["teacher_stats"][teacher_key])
        # train mode: batch-stat normalization + running-buffer update, like
        # the reference teacher under torch.no_grad (byol_wrapper.py:50-52);
        # gradients cannot flow — teacher params are not in the diff'd tree
        # and the caller stop_gradients the projection
        (_, proj_t), t_new = self._apply(model, tp, t_stats, graph, train,
                                         rng_t)
        t_keep = self._strip_predictor(t_new) if train \
            else extra["teacher_stats"][teacher_key]
        return (pred_s, proj_t), new_stats, t_keep

    def _post_update(self, state: TrainState) -> TrainState:
        decay = self.ma_decay
        teacher = dict(state.extra["teacher"])
        for k in self.ema_keys:
            teacher[k] = jax.tree_util.tree_map(
                lambda t, s: t * decay + s * (1.0 - decay),
                teacher[k], self._strip_predictor(state.params[k]))
        return state.replace(extra={**state.extra, "teacher": teacher})


class PhilosophyTrainer(SelfSupervisedTrainer):
    """3-player adversarial training (philosophy_trainer.py): peasant loss
    trains the 2D model, philosopher loss (peasant - critic) trains the 3D
    model, critic loss trains the critic.  Three optimizers, one jitted step
    computing all three gradient sets."""

    MODEL_KEYS = ("model", "model3d", "critic")

    def __init__(self, *a, critic_loss=None, **kw):
        super().__init__(*a, **kw)
        self.critic_loss_func = critic_loss

    def _init_model(self, key, rng, batch):
        if key == "critic":
            z = jnp.zeros((batch["graph2d"].num_graphs,
                           self.args.get("critic_in_dim", 256)))
            return self.models[key].init(rng, z, deterministic=True)
        return super()._init_model(key, rng, batch)

    def _build_optimizers(self, params):
        op = dict(self.args.get("optimizer_params", {}) or {})
        betas = tuple(op.pop("betas", (0.9, 0.999)))
        lr = op.pop("lr", 1e-3)
        wd = op.pop("weight_decay", 0.0)
        for key in self.MODEL_KEYS:
            labels, active = label_params({key: params[key]})
            opt = GroupedOptimizer(labels, name=self.args.get("optimizer", "Adam"),
                                   lr=lr, weight_decay=wd, betas=betas)
            self.optims[key] = opt
            self.active_groups[key] = active
            self.lr_controllers[key] = LRController(
                opt.group_start_lrs(active), self.args.get("lr_scheduler"),
                self.args.get("lr_scheduler_params"),
                step_per_batch=self.scheduler_step_per_batch)

    def _init_opt_state(self, params):
        return {k: self.optims[k].init({k: params[k]}) for k in self.MODEL_KEYS}

    def _full_lr_vectors(self):
        return {k: super(PhilosophyTrainer, self)._full_lr_vector(k)
                for k in self.MODEL_KEYS}

    def _forward(self, params, batch_stats, batch, rng, train):
        r2, r3 = jax.random.split(rng)
        z1, s2 = self._apply(self.models["model"], params["model"],
                             batch_stats["model"], batch["graph2d"], train, r2)
        z2, s3 = self._apply(self.models["model3d"], params["model3d"],
                             batch_stats["model3d"], batch["graph3d"], train, r3)
        recon, sc = self._apply(self.models["critic"], params["critic"],
                                batch_stats["critic"], z2, train, rng)
        critic_loss = self.critic_loss_func(z2, recon)
        peasant_loss = self.loss_func(z1, z2, **self._loss_kwargs(batch))
        philosopher_loss = peasant_loss - critic_loss
        return (peasant_loss, philosopher_loss, critic_loss, z1, z2,
                {"model": s2, "model3d": s3, "critic": sc})

    def _make_train_step(self):
        optims = self.optims

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, group_lrs, rng):
            def peasant(pm):
                p = dict(state.params); p["model"] = pm
                pl, _, _, z1, z2, stats = self._forward(
                    p, state.batch_stats, batch, rng, True)
                return pl, (z1, z2, stats)

            def philosopher(pm3):
                p = dict(state.params); p["model3d"] = pm3
                pl, phl, _, _, _, _ = self._forward(
                    p, state.batch_stats, batch, rng, True)
                return phl, pl

            def critic(pc):
                p = dict(state.params); p["critic"] = pc
                _, _, cl, _, _, _ = self._forward(
                    p, state.batch_stats, batch, rng, True)
                return cl

            (pl, (z1, z2, stats)), g_model = jax.value_and_grad(
                peasant, has_aux=True)(state.params["model"])
            (phl, _), g_model3d = jax.value_and_grad(
                philosopher, has_aux=True)(state.params["model3d"])
            cl, g_critic = jax.value_and_grad(critic)(state.params["critic"])

            new_params, new_opt = {}, {}
            for key, grads in (("model", g_model), ("model3d", g_model3d),
                               ("critic", g_critic)):
                upd, new_opt[key] = optims[key].update(
                    {key: grads}, state.opt_state[key],
                    {key: state.params[key]}, group_lrs[key])
                new_params[key] = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params[key], upd[key])
            aux = AuxOut(z1, z2, {"philosopher_loss": phl,
                                  type(self.critic_loss_func).__name__: cl})
            return state.replace(params=new_params, opt_state=new_opt,
                                 batch_stats=stats, step=state.step + 1), pl, aux

        return step_fn

    def _make_eval_step(self):
        @jax.jit
        def step_fn(state: TrainState, batch, rng):
            pl, phl, cl, z1, z2, _ = self._forward(
                state.params, state.batch_stats, batch, rng, False)
            return pl, AuxOut(z1, z2, {"philosopher_loss": phl,
                                       type(self.critic_loss_func).__name__: cl})

        return step_fn

    def train_epoch(self, loader, epoch: int):
        log_iterations = self.args.get("log_iterations", 20)
        for i, batch in enumerate(loader):
            train_step, _ = self._steps_for(batch)
            self.rng, sub = jax.random.split(self.rng)
            self.state, loss, aux = train_step(self.state, batch,
                                               self._full_lr_vectors(), sub)
            self.optim_steps += 1
            self._after_optim_step()
            if self.optim_steps % log_iterations == 0:
                preds, targets = self._host_filter(batch, aux)
                m = self._eval_metrics(preds, targets)
                m[self.loss_name] = float(loss)
                for k, v in aux.extra_losses.items():
                    m[k] = float(v)
                self.logger.log(m, "train", self.optim_steps, epoch)


class DistancePredictorTrainer(Trainer):
    """Pre-training baseline: predict all pairwise 3D distances from the 2D
    graph (reference DistancePredictor path; batch = graph + pair view with
    true distances)."""

    def _init_model(self, key, rng, batch):
        return self.models[key].init(rng, batch["graph"], batch["pairs"],
                                     deterministic=True)

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        g, pairs = batch["graph"], batch["pairs"]
        variables = {"params": self._cast_in(params["model"]),
                     "batch_stats": batch_stats["model"]}
        g_c = self._cast_in(g)
        if train:
            pred, mut = self.models["model"].apply(
                variables, g_c, pairs, deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": rng})
            new_stats = mut.get("batch_stats", batch_stats["model"])
        else:
            pred = self.models["model"].apply(variables, g_c, pairs,
                                              deterministic=True)
            new_stats = batch_stats["model"]
        pred = self._cast_out(pred)
        target = pairs.edge_dist[:, None]
        valid = pairs.edge_mask[:, None]
        loss = _elementwise_supervised_loss(self.loss_name, pred, target, valid)
        return loss, AuxOut(pred, target, {}), {"model": new_stats}

    def _host_filter(self, batch, aux: AuxOut):
        mask = np.asarray(batch["pairs"].edge_mask)
        return (np.asarray(aux.predictions)[mask],
                np.asarray(aux.targets)[mask])


def exact_emd(cost: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact optimal-transport plan for small histograms (the reference uses
    POT's ot.emd; here scipy's HiGHS LP — molecules have <=10x10 plans)."""
    from scipy.optimize import linprog
    nt, nm = cost.shape
    c = cost.reshape(-1)
    A_eq = np.zeros((nt + nm, nt * nm))
    for i in range(nt):
        A_eq[i, i * nm:(i + 1) * nm] = 1.0
    for j in range(nm):
        A_eq[nt + j, j::nm] = 1.0
    b_eq = np.concatenate([a, b])
    res = linprog(c, A_eq=A_eq[:-1], b_eq=b_eq[:-1], bounds=(0, None),
                  method="highs")
    return res.x.reshape(nt, nm)


class OptimalTransportTrainer(Trainer):
    # conformer geometry (Kabsch/dihedral) is rounding-sensitive; keep f32
    supports_bf16 = False
    """GeoMol conformer-generation training (reference
    trainer/optimal_transport_trainer.py:11-67): loss computed inside the
    model; gradient clip 10; `ignore_neighbors` (local-only losses) for the
    first `num_epochs_local_only` epochs.

    loss_type='ot_emd' runs two passes: a no-grad jit pass produces the
    [T, C, G] cost tensor, the exact EMD plans are solved host-side on the
    detached costs (reference semantics: plans are constants), then the grad
    pass minimizes sum(plan * cost).
    """

    GRAD_CLIP = 10.0

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._epoch = 1

    def _init_model(self, key, rng, batch):
        return self.models[key].init(
            {"params": rng, "random": jax.random.fold_in(rng, 7)},
            batch["graph"], deterministic=True)

    @property
    def _ignore_neighbors(self):
        return self._epoch < self.args.get("num_epochs_local_only", 1)

    def loss_fn(self, params, batch_stats, batch, step, rng, train):
        model = self.models["model"]
        variables = {"params": params["model"],
                     "batch_stats": batch_stats["model"]}
        rngs = {"random": rng, "dropout": jax.random.fold_in(rng, 3)}
        kw = dict(ignore_neighbors=self._ignore_neighbors)
        if batch.get("_ot_plans") is not None:
            kw["ot_plans"] = batch["_ot_plans"]
        if train:
            loss, mut = model.apply(variables, batch["graph"],
                                    deterministic=False,
                                    mutable=["batch_stats"], rngs=rngs, **kw)
            new_stats = mut.get("batch_stats", batch_stats["model"])
        else:
            loss = model.apply(variables, batch["graph"], deterministic=True,
                               rngs=rngs, **kw)
            new_stats = batch_stats["model"]
        z = jnp.zeros((batch["graph"].num_graphs, 1))
        return loss, AuxOut(z, z, {}), {"model": new_stats}

    def _make_train_step(self):
        optim = self.optims["main"]

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, group_lrs, rng):
            def lf(params):
                loss, aux, new_stats = self.loss_fn(
                    params, state.batch_stats, batch, state.step, rng, True)
                return loss, (aux, new_stats)

            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                lf, has_aux=True)(state.params)
            # reference clips the grad norm at 10 (optimal_transport_trainer)
            gnorm = jnp.sqrt(sum(jnp.sum(x * x) for x in
                                 jax.tree_util.tree_leaves(grads)))
            scale = jnp.minimum(1.0, self.GRAD_CLIP / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda x: x * scale, grads)
            updates, opt_state = optim.update(grads, state.opt_state,
                                              state.params, group_lrs)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 batch_stats=new_stats,
                                 step=state.step + 1), loss, aux

        return step_fn

    def _cost_fn(self, batch, rng):
        if not hasattr(self, "_cost_jit"):
            def cf(params, batch_stats, graph, rng, ignore):
                return self.models["model"].apply(
                    {"params": params["model"],
                     "batch_stats": batch_stats["model"]},
                    graph, deterministic=True,
                    rngs={"random": rng}, ignore_neighbors=ignore,
                    return_cost_matrix=True)
            self._cost_jit = jax.jit(cf, static_argnums=(4,))
        return self._cost_jit(self.state.params, self.state.batch_stats,
                              batch["graph"], rng, self._ignore_neighbors)

    def _attach_ot_plans(self, batch, rng):
        if self.models["model"].hyperparams.get("loss_type") != "ot_emd":
            return batch
        cost = np.asarray(self._cost_fn(batch, rng))     # [T, C, G]
        g = batch["graph"]
        pos_mask = np.asarray(g.extras["pos_mask"])      # [G, T]
        gmask = np.asarray(g.graph_mask)
        T, C, G = cost.shape
        plans = np.zeros((G, T, C), np.float32)
        for i in range(G):
            if not gmask[i]:
                continue
            nt = int(pos_mask[i].sum())
            if nt == 0:
                continue
            M = cost[:nt, :, i]
            M = np.max(np.abs(M)) + M
            plan = exact_emd(M, np.ones(nt) / nt, np.ones(C) / C)
            plans[i, :nt] = plan
        return dict(batch, _ot_plans=jnp.asarray(plans))

    def train_epoch(self, loader, epoch):
        self._epoch = epoch
        log_iterations = self.args.get("log_iterations", 20)
        for i, batch in enumerate(loader):
            self.rng, sub = jax.random.split(self.rng)
            batch = self._attach_ot_plans(batch, sub)
            train_step, _ = self._steps_for(batch)
            self.state, loss, aux = train_step(self.state, batch,
                                               self._full_lr_vector(), sub)
            self.optim_steps += 1
            self._after_optim_step()
            if self.optim_steps % log_iterations == 0:
                self.logger.log({self.loss_name: float(loss)}, "train",
                                self.optim_steps, epoch)

    def evaluate_epoch(self, loader, epoch=0):
        total, n = 0.0, 0
        for batch in loader:
            self.rng, sub = jax.random.split(self.rng)
            batch = self._attach_ot_plans(batch, sub)
            _, eval_step = self._steps_for(batch)
            loss, aux = eval_step(self.state, batch, sub)
            total += float(loss)
            n += 1
        return {self.loss_name: total / max(n, 1)}


TRAINER_REGISTRY = {
    "default": Trainer,
    "contrastive": SelfSupervisedTrainer,
    "alternating": SelfSupervisedAlternatingTrainer,
    "autoencoder": SelfSupervisedAETrainer,
    "byol": BYOLTrainer,
    "philosophy": PhilosophyTrainer,
    "graphcl_trainer": GraphCLTrainer,
    "noisy_negatives": NoisyNegativesTrainer,
    "distance_predictor": DistancePredictorTrainer,
    "optimal_transport": OptimalTransportTrainer,
}
