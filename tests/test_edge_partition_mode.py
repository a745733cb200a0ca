"""Edge-partitioned graph parallelism as a TRAINING MODE (SURVEY.md §2.7/§5):
a second 'graph' mesh axis shards each batch's edge set inside the train step
(parallel/edge_partition.py::shard_batch_edges); edge->node aggregations
complete local partials with psum/pmax over that axis.  Equality contract:
losses / gradients / train-mode activations identical to single-device
training on the same batch.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.graphs.batch import BucketSpec, GraphBatch
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import PNA, Net3D
from infomax3d_tpu.parallel import make_mesh
from infomax3d_tpu.train.trainer import SelfSupervisedTrainer, Trainer

from test_parallel import (DS, NET3D_SMALL, PNA_SMALL, args,
                           _sharded_and_single_batches)

NDEV = 8
BATCH = 16
# edge capacities divisible by every graph_shards factor used below
B2 = BucketSpec(BATCH, 512, 2048)
B3 = BucketSpec(BATCH, 512, 16384)


def _graph_mesh(n_data, n_graph):
    return make_mesh(n_data * n_graph, axis_names=("data", "graph"),
                     shape=(n_data, n_graph))


def test_shard_batch_edges_round_robin_covers_all_edges():
    """Union of per-device edge shards == full edge set, disjoint."""
    from infomax3d_tpu.parallel.edge_partition import shard_batch_edges
    ds = DS()
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=B2,
                             shuffle=False, n_shards=1, prefetch=0)
    batch = next(iter(loader))
    g = batch["graph"]
    k = 4
    mesh = _graph_mesh(1, k)

    def f(gb):
        loc = shard_batch_edges(gb, k, "graph")
        # recount each edge's receiver contribution; psum == global degree
        deg = jax.ops.segment_sum(
            jnp.ones_like(loc.receivers, jnp.float32), loc.receivers,
            num_segments=gb.num_nodes)
        return jax.lax.psum(deg, "graph"), loc.edge_mask.sum()[None]

    deg_got, n_local = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(),), out_specs=(P(), P("graph")),
        check_vma=False))(g)
    deg_want = jax.ops.segment_sum(jnp.ones_like(g.receivers, jnp.float32),
                                   g.receivers, num_segments=g.num_nodes)
    np.testing.assert_array_equal(np.asarray(deg_got), np.asarray(deg_want))
    # real edges split evenly (round-robin over a front-packed layout)
    counts = np.asarray(n_local)
    assert counts.sum() == int(np.asarray(g.edge_mask).sum())
    assert counts.max() - counts.min() <= 1


def _copy_state(dst, src):
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    dst.state = dst.state.replace(params=cp(src.state.params),
                                  batch_stats=cp(src.state.batch_stats))


def _grads(trainer, batch, rng):
    stats = trainer.state.batch_stats
    return jax.grad(lambda p: trainer.loss_fn(
        p, stats, batch, jnp.zeros([], jnp.int32), rng, True)[0])(
        trainer.state.params)


def _grads_partitioned(trainer, batch, rng, mesh, n_graph):
    from infomax3d_tpu.parallel.context import (using_cross_replica_axis,
                                                using_edge_partition_axis)
    from infomax3d_tpu.parallel.edge_partition import shard_batch_edges
    stats = trainer.state.batch_stats

    def f(p, b):
        local = jax.tree_util.tree_map(
            lambda v: (shard_batch_edges(v, n_graph, "graph")
                       if isinstance(v, GraphBatch) else v), b,
            is_leaf=lambda v: isinstance(v, GraphBatch))
        with using_cross_replica_axis("data"), \
                using_edge_partition_axis("graph"):
            g = jax.grad(lambda pp: trainer.loss_fn(
                pp, stats, local, jnp.zeros([], jnp.int32), rng, True)[0])(p)
        return jax.lax.pmean(g, ("data", "graph"))

    return jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P(), P()),
                                 out_specs=P(), check_vma=False))(
        trainer.state.params, batch)


def _assert_tree_close(a_tree, b_tree, rtol=2e-4, floor=5e-4):
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(a_tree),
                            jax.tree_util.tree_leaves(b_tree)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max())
        tol = max(rtol * scale, floor)
        assert np.abs(a - b).max() <= tol, \
            f"{path}: maxdiff {np.abs(a - b).max():.2e} > {tol:.2e}"


def test_pure_edge_partition_contrastive_matches_single():
    """(1 data, 8 graph) mesh, PNA+Net3D NT-Xent: same batch fed to both a
    single-device trainer and the edge-partitioned trainer."""
    mesh = _graph_mesh(1, NDEV)
    ds = DS()
    loader = GraphDataLoader(ds, BATCH, "contrastive_collate", bucket=B2,
                             shuffle=False, n_shards=1, prefetch=0,
                             collate_kwargs={"bucket3d": B3})
    batch = next(iter(loader))

    models = {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)}
    common = dict(metrics={}, main_metric="loss", loss_name="NTXent",
                  use_tensorboard=False)
    tr_s = SelfSupervisedTrainer(models, args(), run_dir="/tmp/ep_s",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 **common)
    tr_p = SelfSupervisedTrainer(models, args(), run_dir="/tmp/ep_p",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 mesh=mesh, **common)
    tr_s.init_state(batch)
    tr_p.init_state(batch)
    _copy_state(tr_p, tr_s)

    rng = jax.random.key(5)
    g_single = _grads(tr_s, batch, rng)
    g_part = _grads_partitioned(tr_p, batch, rng, mesh, NDEV)
    # grads need extra headroom: PNA's std aggregator at degree-1 nodes sits
    # on the relu(s2/deg - mean^2) + EPS knife edge where s2 - mean^2 is
    # pure rounding noise and the backward multiplies by 1/std ~ 1/sqrt(EPS)
    # — the partition's different f32 reduction order shifts that noise
    # (observed maxdiff ~3e-4 relative on pretrans kernels)
    _assert_tree_close(g_single, g_part, rtol=8e-4, floor=5e-4)

    lrs = tr_s._full_lr_vector()
    step_s, _ = tr_s._steps_for(batch)
    step_p, _ = tr_p._steps_for(batch)
    st_s, loss_s, _ = step_s(tr_s.state, batch, lrs, rng)
    st_p, loss_p, _ = step_p(tr_p.state, batch, lrs, rng)
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-4)
    # running BN stats: edge-space stats exact; node-space running var keeps
    # mean/var but shifts the count/(count-1) unbiased correction (count is
    # inflated k-fold on the replicated axis) -> 1e-2 tolerance
    for a, b in zip(jax.tree_util.tree_leaves(st_s.batch_stats),
                    jax.tree_util.tree_leaves(st_p.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1.2e-2,
                                   atol=2e-5)


def test_combined_data_graph_mesh_supervised_matches_single():
    """(4 data, 2 graph) mesh, supervised PNA L1: DP sharding + edge
    partitioning together."""
    n_data, n_graph = 4, 2
    mesh = _graph_mesh(n_data, n_graph)
    import test_parallel as tp
    old = tp.NDEV
    tp.NDEV = n_data
    try:
        sharded, single = _sharded_and_single_batches("graph_collate")
    finally:
        tp.NDEV = old

    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    common = dict(metrics={}, main_metric="loss", loss_name="L1Loss",
                  use_tensorboard=False)
    tr_s = Trainer({"model": model}, args(), run_dir="/tmp/ep_ss", **common)
    tr_p = Trainer({"model": model}, args(), run_dir="/tmp/ep_pp", mesh=mesh,
                   **common)
    tr_s.init_state(single)
    tr_p.init_state(jax.tree_util.tree_map(lambda a: a[0], sharded))
    _copy_state(tr_p, tr_s)

    rng = jax.random.key(9)
    g_single = _grads(tr_s, single, rng)

    def grads_dp_ep(p, b):
        from infomax3d_tpu.parallel.context import (
            using_cross_replica_axis, using_edge_partition_axis)
        from infomax3d_tpu.parallel.edge_partition import shard_batch_edges
        stats = tr_p.state.batch_stats
        local = jax.tree_util.tree_map(lambda a: a[0], b)
        local = jax.tree_util.tree_map(
            lambda v: (shard_batch_edges(v, n_graph, "graph")
                       if isinstance(v, GraphBatch) else v), local,
            is_leaf=lambda v: isinstance(v, GraphBatch))
        with using_cross_replica_axis("data"), \
                using_edge_partition_axis("graph"):
            g = jax.grad(lambda pp: tr_p.loss_fn(
                pp, stats, local, jnp.zeros([], jnp.int32), rng, True)[0])(p)
        return jax.lax.pmean(g, ("data", "graph"))

    g_part = jax.jit(jax.shard_map(
        grads_dp_ep, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_vma=False))(tr_p.state.params, sharded)
    _assert_tree_close(g_single, g_part)

    lrs = tr_s._full_lr_vector()
    step_s, _ = tr_s._steps_for(single)
    step_p, _ = tr_p._steps_for(sharded)
    st_s, loss_s, _ = step_s(tr_s.state, single, lrs, rng)
    st_p, loss_p, _ = step_p(tr_p.state, sharded, lrs, rng)
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-4)


def test_trainer_step_via_cli_mesh_path():
    """End-to-end: run_training-style mesh construction ((1, 2) graph mesh)
    drives a full trainer train_epoch without error."""
    n_graph = 2
    mesh = _graph_mesh(1, n_graph)
    ds = DS()
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=B2,
                             shuffle=False, n_shards=1, prefetch=0)
    model = PNA(**{**PNA_SMALL, "target_dim": 2})
    tr = Trainer({"model": model}, args(num_epochs=1), run_dir="/tmp/ep_cli",
                 metrics={}, main_metric="loss", loss_name="L1Loss",
                 mesh=mesh, use_tensorboard=False)
    batch = next(iter(loader))
    tr.init_state(batch)
    step, evl = tr._steps_for(batch)
    st, loss, _ = step(tr.state, batch, tr._full_lr_vector(), jax.random.key(0))
    assert np.isfinite(float(loss))
    l2, aux = evl(st, batch, jax.random.key(1))
    assert np.isfinite(float(l2))
