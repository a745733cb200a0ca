"""Distributed equivalence tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 4): sharded contrastive/supervised training must match
single-device training on the concatenated batch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import PNA, Net3D
from infomax3d_tpu.parallel import CrossDeviceLoss, make_mesh
from infomax3d_tpu.train.trainer import SelfSupervisedTrainer, Trainer

NDEV = 8
BATCH = 16
PNA_SMALL = dict(hidden_dim=16, target_dim=12,
                 aggregators=["mean", "max", "min", "std"],
                 scalers=["identity", "amplification", "attenuation"],
                 readout_aggregators=["min", "max", "mean"],
                 mid_batch_norm=True, last_batch_norm=True,
                 readout_batchnorm=True, batch_norm_momentum=0.93,
                 propagation_depth=2, readout_layers=1, pretrans_layers=1,
                 posttrans_layers=1)
NET3D_SMALL = dict(hidden_dim=12, target_dim=12,
                   readout_aggregators=["min", "max", "mean"], batch_norm=True,
                   readout_batchnorm=True, batch_norm_momentum=0.93,
                   node_wise_output_layers=0, message_net_layers=1,
                   update_net_layers=1, reduce_func="mean",
                   fourier_encodings=4, propagation_depth=1, readout_layers=1)
# per-shard shapes identical so the single-device batch is the concat of shards
B2 = BucketSpec(BATCH, NDEV * 64, NDEV * 256)
B3 = BucketSpec(BATCH, NDEV * 64, NDEV * 2048)


class DS:
    def __init__(self, num=BATCH * 2, seed=0):
        self.ds = SyntheticMolecules(num, seed=seed, num_targets=2)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return {"graph2d": self.ds.graph2d(i), "graph3d": self.ds.graph3d(i),
                "targets": self.ds.targets[i]}


def args(**over):
    a = dict(num_epochs=1, patience=10, minimum_epochs=0, log_iterations=1000,
             val_per_batch=True, optimizer="Adam", optimizer_params={"lr": 1e-3},
             lr_scheduler=None, transfer_layers=[], frozen_layers=[],
             exclude_from_transfer=[], models_to_save=[], checkpoint=None)
    a.update(over)
    return a


def _sharded_and_single_batches(collate, kwargs=None):
    """Same molecules, same per-shard layout: single-device batch built by
    concatenating the shard sub-batches so padding layout matches exactly."""
    ds = DS()
    sharded_loader = GraphDataLoader(ds, BATCH, collate, bucket=B2,
                                     shuffle=False, n_shards=NDEV, prefetch=0,
                                     collate_kwargs=kwargs or {})
    sharded = next(iter(sharded_loader))
    single = jax.tree_util.tree_map(
        lambda a: np.concatenate(list(a), axis=0) if a.ndim > 1 or True else a,
        sharded)

    # graph/node indices are shard-local; offset them to make the concatenated
    # batch a valid single graph batch
    def fix(gb_sh, gb_cat):
        nd, g_loc = gb_sh.graph_mask.shape
        n_loc = gb_sh.node_mask.shape[1]
        e_loc = gb_sh.edge_mask.shape[1]
        n_glob, g_glob = nd * n_loc, nd * g_loc
        node_off = np.repeat(np.arange(nd) * n_loc, e_loc)
        graph_off = np.repeat(np.arange(nd) * g_loc, n_loc)
        egraph_off = np.repeat(np.arange(nd) * g_loc, e_loc)
        emask = np.asarray(gb_cat.edge_mask)
        nmask = np.asarray(gb_cat.node_mask)
        # padding indices are locally out-of-range; keep them globally
        # out-of-range after the offset (else they hit the next shard)
        senders = np.where(emask, np.asarray(gb_cat.senders) + node_off, n_glob)
        receivers = np.where(emask, np.asarray(gb_cat.receivers) + node_off, n_glob)
        node_graph = np.where(nmask, np.asarray(gb_cat.node_graph) + graph_off,
                              g_glob)
        edge_graph = np.where(emask, np.asarray(gb_cat.edge_graph) + egraph_off,
                              g_glob)
        return gb_cat.replace(senders=jnp.asarray(senders.astype(np.int32)),
                              receivers=jnp.asarray(receivers.astype(np.int32)),
                              node_graph=jnp.asarray(node_graph.astype(np.int32)),
                              edge_graph=jnp.asarray(edge_graph.astype(np.int32)))

    for key in list(single.keys()):
        single[key] = fix(sharded[key], single[key])
    return sharded, single


def test_contrastive_parallel_matches_single():
    mesh = make_mesh(NDEV)
    sharded, single = _sharded_and_single_batches(
        "contrastive_collate", {"bucket3d": B3})

    models = {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)}
    common = dict(metrics={}, main_metric="loss",
                  loss_name="NTXent", use_tensorboard=False)

    tr_s = SelfSupervisedTrainer(models, args(), run_dir="/tmp/par_s",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 **common)
    tr_p = SelfSupervisedTrainer(models, args(), run_dir="/tmp/par_p",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 mesh=mesh, **common)

    tr_s.init_state(single)
    tr_p.init_state(jax.tree_util.tree_map(lambda a: a[0], sharded))
    # identical initial params (copied: the steps donate their state buffers)
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    tr_p.state = tr_p.state.replace(params=cp(tr_s.state.params),
                                    batch_stats=cp(tr_s.state.batch_stats))

    step_s, eval_s = tr_s._steps_for(single)
    step_p, eval_p = tr_p._steps_for(sharded)

    rng = jax.random.key(7)
    lrs = tr_s._full_lr_vector()
    st_s, loss_s, aux_s = step_s(tr_s.state, single, lrs, rng)
    st_p, loss_p, aux_p = step_p(tr_p.state, sharded, lrs, rng)

    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-4,
                               err_msg="sharded NT-Xent != single-device")
    # batch-norm running stats must match (global masked statistics)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.batch_stats),
                    jax.tree_util.tree_leaves(st_p.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)
    # psum'd sharded gradients must equal single-device gradients.
    # (comparing post-Adam params is ill-conditioned: near-zero grads give
    # sign-dependent +-lr first steps)
    _assert_grads_match(tr_s, tr_p, single, sharded, mesh)


def _assert_grads_match(tr_s, tr_p, single, sharded, mesh, run_dir="/tmp/par_g1"):
    from jax.sharding import PartitionSpec as P
    from infomax3d_tpu.parallel.context import using_cross_replica_axis
    rng = jax.random.key(11)
    # state was donated by the step above; rebuild fresh
    tr_s2 = type(tr_s)(tr_s.models, tr_s.args, metrics={}, main_metric="loss",
                       run_dir=run_dir, loss_func=tr_s.loss_func,
                       loss_name=tr_s.loss_name, use_tensorboard=False)
    tr_s2.init_state(single)
    params = tr_s2.state.params
    stats = tr_s2.state.batch_stats

    g_single = jax.grad(lambda p: tr_s2.loss_fn(p, stats, single,
                                                jnp.zeros([], jnp.int32),
                                                rng, True)[0])(params)

    def shard_grads(p, batch):
        local = jax.tree_util.tree_map(lambda a: a[0], batch)
        with using_cross_replica_axis("data"):
            g = jax.grad(lambda pp: tr_p.loss_fn(pp, stats, local,
                                                 jnp.zeros([], jnp.int32),
                                                 rng, True)[0])(p)
        return jax.lax.pmean(g, "data")

    g_shard = jax.jit(jax.shard_map(shard_grads, mesh=mesh,
                                    in_specs=(P(), P("data")), out_specs=P(),
                                    check_vma=False))(params, sharded)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_single),
                            jax.tree_util.tree_leaves(g_shard)):
        a, b = np.asarray(a), np.asarray(b)
        # fp32 noise scales with the leaf's gradient magnitude; biases feeding
        # straight into BatchNorm have true gradient 0 (pure fp-order noise,
        # observed up to ~2e-4) — the 5e-4 floor covers those.  3e-4: the
        # lazy BN folds (AffinePart) route stat gradients through per-shard
        # column reductions whose fp order differs from single-device
        # (observed 2.24e-4 relative on a pretrans kernel — reduction-order
        # noise, not a psum bug, which would be O(1) off)
        scale = max(np.abs(a).max(), np.abs(b).max())
        tol = max(3e-4 * scale, 5e-4)
        assert np.abs(a - b).max() <= tol, \
            f"{path}: maxdiff {np.abs(a - b).max():.2e} > {tol:.2e}"


def test_supervised_parallel_matches_single():
    mesh = make_mesh(NDEV)
    sharded, single = _sharded_and_single_batches("graph_collate")
    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    common = dict(metrics={}, main_metric="loss", loss_name="L1Loss",
                  use_tensorboard=False)
    tr_s = Trainer({"model": model}, args(), run_dir="/tmp/par_ss", **common)
    tr_p = Trainer({"model": model}, args(), run_dir="/tmp/par_pp", mesh=mesh,
                   **common)
    tr_s.init_state(single)
    tr_p.init_state(jax.tree_util.tree_map(lambda a: a[0], sharded))
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    tr_p.state = tr_p.state.replace(params=cp(tr_s.state.params),
                                    batch_stats=cp(tr_s.state.batch_stats))
    rng = jax.random.key(3)
    lrs = tr_s._full_lr_vector()
    step_s, _ = tr_s._steps_for(single)
    step_p, _ = tr_p._steps_for(sharded)
    st_s, loss_s, _ = step_s(tr_s.state, single, lrs, rng)
    st_p, loss_p, _ = step_p(tr_p.state, sharded, lrs, rng)
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-4)
    _assert_grads_match(tr_s, tr_p, single, sharded, mesh, run_dir="/tmp/par_g2")


def test_cross_device_loss_gather():
    """CrossDeviceLoss under shard_map == loss on the concatenated batch."""
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(0)
    z1 = rng.normal(size=(NDEV * 4, 8)).astype(np.float32)
    z2 = rng.normal(size=(NDEV * 4, 8)).astype(np.float32)
    base = LOSS_REGISTRY["NTXent"](tau=0.2)
    expect = float(base(jnp.asarray(z1), jnp.asarray(z2)))
    wrapped = CrossDeviceLoss(base, "data")

    def f(a, b):
        return wrapped(a, b)

    got = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")),
                                out_specs=P(), check_vma=False))(z1, z2)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_edge_partitioned_segment_sum():
    """Edge-sharded SpMM == single-device segment_sum (the edge-partition
    parallel mode of BASELINE.md)."""
    from jax.sharding import PartitionSpec as P
    from infomax3d_tpu.parallel.edge_partition import (
        edge_partitioned_segment_sum, partition_edges, shard_edge_arrays,
    )
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(0)
    E, N, D = 4096, 512, 16
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    edge_graph = rng.integers(0, 64, size=E).astype(np.int32)
    edge_mask = rng.random(E) < 0.9
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    msgs[~edge_mask] = 0.0
    receivers_m = np.where(edge_mask, receivers, N + 7)

    shard_of_edge = partition_edges(edge_graph, edge_mask, NDEV)
    loads = np.bincount(shard_of_edge[edge_mask], minlength=NDEV)
    assert loads.max() - loads.min() <= loads.mean() * 0.3 + 64  # balanced

    arrays = dict(senders=receivers_m, receivers=receivers_m, msgs=msgs,
                  edge_mask=edge_mask)
    sharded = shard_edge_arrays(arrays, shard_of_edge, NDEV,
                                ["receivers", "msgs"])

    def f(m, r):
        return edge_partitioned_segment_sum(m[0], r[0], N, "data")

    got = jax.jit(jax.shard_map(f, mesh=mesh,
                                in_specs=(P("data"), P("data")),
                                out_specs=P(), check_vma=False))(
        sharded["msgs"], sharded["receivers"])
    expect = jax.ops.segment_sum(jnp.asarray(msgs),
                                 jnp.asarray(receivers_m), num_segments=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5,
                               atol=1e-5)
