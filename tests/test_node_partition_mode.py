"""Node-sharded halo partitioning as a TRAINING MODE (VERDICT r4 item 4).

`node_shards: k` in the config partitions every batch's NODE set over the
'graph' mesh axis host-side (parallel/node_partition.py::shard_graph_batch):
per-device node/edge arrays genuinely shrink ~1/k, sender gathers
halo-exchange ghost rows via ppermute (ops/mailbox.py::_node_partition_ext),
receiver-owned aggregations complete locally with NO collective, and the
graph readout / masked-BN statistics psum their per-shard partials
(ops/segment.py::graph_readout, models/base.py).  Equality contract: losses
/ gradients / BN statistics match single-device training on the same batch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import run_training
from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.data.synthetic import write_synthetic_cache
from infomax3d_tpu.graphs.batch import BucketSpec, GraphBatch
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import PNA, Net3D
from infomax3d_tpu.parallel import make_mesh
from infomax3d_tpu.parallel.node_partition import shard_graph_batch
from infomax3d_tpu.train.trainer import SelfSupervisedTrainer

from test_parallel import DS, NET3D_SMALL, PNA_SMALL, args
from test_edge_partition_mode import _assert_tree_close, _copy_state, _grads

NDEV = 8
BATCH = 16
B2 = BucketSpec(BATCH, 512, 2048)
B3 = BucketSpec(BATCH, 512, 16384)


def _graph_mesh(n_data, n_graph):
    return make_mesh(n_data * n_graph, axis_names=("data", "graph"),
                     shape=(n_data, n_graph))


def _node_batch(batch, k):
    return jax.tree_util.tree_map(
        lambda v: shard_graph_batch(v, k) if isinstance(v, GraphBatch) else v,
        batch, is_leaf=lambda v: isinstance(v, GraphBatch))


def _grads_node_partitioned(trainer, nbatch, rng, mesh):
    from infomax3d_tpu.parallel.context import (using_cross_replica_axis,
                                                using_node_partition_axis)
    stats = trainer.state.batch_stats

    def f(p, b):
        local = jax.tree_util.tree_map(lambda a: a[0], b)
        with using_cross_replica_axis("data"), \
                using_node_partition_axis("graph"):
            g = jax.grad(lambda pp: trainer.loss_fn(
                pp, stats, local, jnp.zeros([], jnp.int32), rng, True)[0])(p)
        return jax.lax.pmean(g, ("data", "graph"))

    return jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P(), P("graph")),
                                 out_specs=P(), check_vma=False))(
        trainer.state.params, nbatch)


def test_shard_graph_batch_covers_all_edges_and_shrinks():
    """Per-shard arrays are ~1/k of the batch; the union of receiver-owned
    edge shards is exactly the real edge set."""
    ds = DS()
    loader = GraphDataLoader(ds, BATCH, "graph_collate", bucket=B2,
                             shuffle=False, n_shards=1, prefetch=0)
    g = next(iter(loader))["graph"]
    k = 4
    nb = _node_batch({"graph": g}, k)["graph"]
    assert nb.node_feat.shape[0] == k
    assert nb.node_feat.shape[1] <= g.num_nodes // k + 8     # genuine 1/k
    # every real edge appears exactly once across shards, keyed by the
    # GLOBAL id of its local receiver
    got = []
    Nl = nb.node_mask.shape[1]
    for s in range(k):
        em = np.asarray(nb.edge_mask[s])
        rl = np.asarray(nb.receivers[s])[em]
        ng = np.asarray(nb.node_graph[s])
        assert (rl < Nl).all()
        got.append(rl + s * Nl)
        # owned-node graph ids match the full batch's
        nm = np.asarray(nb.node_mask[s])
        np.testing.assert_array_equal(
            ng[nm], np.asarray(g.node_graph)[s * Nl:s * Nl + nm.sum()])
    want = np.sort(np.asarray(g.receivers)[np.asarray(g.edge_mask)])
    np.testing.assert_array_equal(np.sort(np.concatenate(got)), want)


def test_node_partition_contrastive_grads_match_single():
    """(1 data, 8 graph) mesh, PNA+Net3D NT-Xent: node-sharded batch vs the
    identical single-device batch — losses and gradients equal."""
    mesh = _graph_mesh(1, NDEV)
    ds = DS()
    loader = GraphDataLoader(ds, BATCH, "contrastive_collate", bucket=B2,
                             shuffle=False, n_shards=1, prefetch=0,
                             collate_kwargs={"bucket3d": B3})
    batch = next(iter(loader))
    nbatch = _node_batch(batch, NDEV)

    models = {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)}
    common = dict(metrics={}, main_metric="loss", loss_name="NTXent",
                  use_tensorboard=False)
    tr_s = SelfSupervisedTrainer(models, args(), run_dir="/tmp/np_s",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 **common)
    tr_p = SelfSupervisedTrainer(models, args(node_shards=NDEV),
                                 run_dir="/tmp/np_p",
                                 loss_func=LOSS_REGISTRY["NTXent"](tau=0.1),
                                 mesh=mesh, **common)
    tr_s.init_state(batch)
    tr_p.init_state(tr_p.single_shard(nbatch))
    _copy_state(tr_p, tr_s)

    rng = jax.random.key(5)
    g_single = _grads(tr_s, batch, rng)
    g_part = _grads_node_partitioned(tr_p, nbatch, rng, mesh)
    # same fp headroom as the edge-partition equality test: the partition
    # reduces in a different f32 order and PNA's std backward amplifies
    # rounding noise 1/sqrt(EPS) at degree-1 nodes
    _assert_tree_close(g_single, g_part, rtol=8e-4, floor=5e-4)

    lrs = tr_s._full_lr_vector()
    step_s, _ = tr_s._steps_for(batch)
    step_p, _ = tr_p._steps_for(nbatch)
    st_s, loss_s, _ = step_s(tr_s.state, batch, lrs, rng)
    st_p, loss_p, _ = step_p(tr_p.state, nbatch, lrs, rng)
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-4)
    # node-sharded BN counts are GENUINELY split (unlike edge partitioning's
    # replicated node rows), so running statistics — including the
    # count/(count-1) unbiased correction — match exactly up to fp noise
    for a, b in zip(jax.tree_util.tree_leaves(st_s.batch_stats),
                    jax.tree_util.tree_leaves(st_p.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


# --------------------------------------------------------------- config path
@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("npdata")
    write_synthetic_cache(str(root / "QM9" / "processed.npz"),
                          num=96, num_targets=19, seed=23)
    return str(root)


def _cfg(tmp_path, **over):
    base = dict(
        dataset="qm9", targets=["homo"], model_type="PNA",
        model_parameters=dict(hidden_dim=16, target_dim=1,
                              aggregators=["mean", "max", "min", "std"],
                              scalers=["identity"],
                              readout_aggregators=["min", "max", "mean"],
                              propagation_depth=2, readout_layers=1,
                              readout_batchnorm=False),
        loss_func="L1Loss", metrics=["mae"], main_metric="mae",
        batch_size=16, num_train=48, num_epochs=2, patience=5,
        minimum_epochs=0, log_iterations=-1, use_tensorboard=False,
        eval_per_epochs=0, logdir=str(tmp_path), seed=123,
        bf16_compute=False)
    base.update(over)
    return load_config(None, base)


def test_node_shards_yaml_run_matches_replicated(data_root, tmp_path,
                                                 monkeypatch):
    """`node_shards: 4` trains through run_training on the virtual mesh and
    the final metric matches the unsharded run (same seed, same batches)."""
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    res_np = run_training(_cfg(tmp_path / "np", node_shards=4))
    assert np.isfinite(res_np["mae"])
    res_1 = run_training(_cfg(tmp_path / "rep"))
    np.testing.assert_allclose(res_np["mae"], res_1["mae"],
                               rtol=2e-3, atol=5e-5)


@pytest.mark.slow
def test_node_shards_combined_with_data_parallel(data_root, tmp_path,
                                                 monkeypatch):
    """(2 data x 4 graph): DP sharding and node partitioning compose from
    the config surface."""
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    res = run_training(_cfg(tmp_path / "dpnp", node_shards=4, n_shards=2,
                            batch_size=8))
    assert np.isfinite(res["mae"])


@pytest.mark.slow
def test_node_shards_qmugs_conformer_protocol(tmp_path_factory, monkeypatch,
                                              tmp_path):
    """The multi-conformer flagship (pre-train_QMugs.yml: conformer_collate,
    C=3 molecule-major packing, NTXentMultiplePositives) trains under
    node_shards — the conformer 3D batch is a pure GraphBatch, so the same
    shard-stack wrapper applies."""
    from infomax3d_tpu.cli.config import load_config
    from infomax3d_tpu.cli.train import train
    from infomax3d_tpu.data.synthetic import write_synthetic_cache
    root = tmp_path_factory.mktemp("npqmugs")
    write_synthetic_cache(str(root / "QMugs" / "processed.npz"),
                          num=160, num_conformers=3, seed=31)
    monkeypatch.setenv("INFOMAX3D_DATA", str(root))
    args = load_config("configs_clean/pre-train_QMugs.yml", dict(
        num_epochs=1, patience=1, use_tensorboard=False, eval_per_epochs=0,
        log_iterations=-1, logdir=str(tmp_path), batch_size=8, num_train=24,
        node_shards=4))
    res = train(args)
    assert np.isfinite(res["NTXentMultiplePositives"])
