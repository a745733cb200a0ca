"""`remat: true` — rematerialized forward (jax.checkpoint) in the trainers.

Scaling lever for HBM-limited chips: activations are recomputed in the
backward pass instead of being saved, so per-step activation memory drops
to O(inputs + outputs) per model at the cost of one extra forward of
FLOPs.  Contract: gradients and losses are IDENTICAL to the non-remat
step (same primals, same cotangent math — jax.checkpoint changes only
what is saved), which is what these tests pin.
"""
import numpy as np

import jax
import jax.numpy as jnp

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.graphs.batch import BucketSpec
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import PNA, Net3D
from infomax3d_tpu.train.trainer import SelfSupervisedTrainer

from test_parallel import DS, NET3D_SMALL, PNA_SMALL, args

BATCH = 8
B2 = BucketSpec(BATCH, 256, 1024)
B3 = BucketSpec(BATCH, 256, 8192)


def _grads(tr, batch, rng):
    stats = tr.state.batch_stats
    return jax.grad(lambda p: tr.loss_fn(
        p, stats, batch, jnp.zeros([], jnp.int32), rng, True)[0])(
        tr.state.params)


def test_remat_gradients_identical():
    loader = GraphDataLoader(DS(), BATCH, "contrastive_collate", bucket=B2,
                             shuffle=False, prefetch=0,
                             collate_kwargs={"bucket3d": B3})
    batch = next(iter(loader))
    models = {"model": PNA(**PNA_SMALL), "model3d": Net3D(**NET3D_SMALL)}
    common = dict(metrics={}, main_metric="loss", loss_name="NTXent",
                  use_tensorboard=False,
                  loss_func=LOSS_REGISTRY["NTXent"](tau=0.1))
    tr = SelfSupervisedTrainer(models, args(), run_dir="/tmp/remat_off",
                               **common)
    tr_r = SelfSupervisedTrainer(models, args(remat=True),
                                 run_dir="/tmp/remat_on", **common)
    tr.init_state(batch)
    tr_r.init_state(batch)
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    tr_r.state = tr_r.state.replace(params=cp(tr.state.params),
                                    batch_stats=cp(tr.state.batch_stats))

    rng = jax.random.key(7)
    g0 = _grads(tr, batch, rng)
    g1 = _grads(tr_r, batch, rng)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the remat step really runs (a full train step, loss finite and equal)
    lrs = tr._full_lr_vector()
    step0, _ = tr._steps_for(batch)
    step1, _ = tr_r._steps_for(batch)
    _, l0, _ = step0(tr.state, batch, lrs, rng)
    _, l1, _ = step1(tr_r.state, batch, lrs, rng)
    np.testing.assert_allclose(float(l0), float(l1), rtol=0, atol=0)

    # and checkpointing is actually in the traced graph: the remat jaxpr
    # carries a remat/checkpoint call that the plain one doesn't
    stats = tr_r.state.batch_stats
    jaxpr = str(jax.make_jaxpr(lambda p: tr_r.loss_fn(
        p, stats, batch, jnp.zeros([], jnp.int32), rng, True)[0])(
        tr_r.state.params))
    assert "remat" in jaxpr or "checkpoint" in jaxpr
