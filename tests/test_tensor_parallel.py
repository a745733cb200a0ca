"""Tensor-parallel `model` mesh axis (parallel/tp.py): a PNA forward+grad
with column-sharded kernels over a (data=2, model=4) virtual mesh must match
the single-device result exactly-ish (GSPMD may reassociate reductions —
tolerances are fp32-tight)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import PNA
from infomax3d_tpu.parallel.tp import make_tp_mesh, tp_shard_params, tp_spec_for
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _batch():
    ds = SyntheticMolecules(16, seed=3)
    mols = [ds.graph2d(i) for i in range(16)]
    return to_graph_batch(batch_graphs(mols, BucketSpec(16, 512, 1024)))


def test_spec_assignment():
    assert tp_spec_for("k", np.zeros((64, 128)), 4) == P(None, "model")
    assert tp_spec_for("b", np.zeros((128,)), 4) == P("model")
    assert tp_spec_for("odd", np.zeros((64, 65)), 4) == P()
    assert tp_spec_for("scalar", np.zeros(()), 4) == P()


def test_tp_forward_and_grad_match_single_device():
    model = PNA(hidden_dim=32, target_dim=16,
                aggregators=["mean", "max"], scalers=["identity"],
                readout_aggregators=["mean"], mid_batch_norm=False,
                last_batch_norm=False, readout_batchnorm=False,
                propagation_depth=2, readout_layers=1, pretrans_layers=1,
                posttrans_layers=1)
    g = _batch()
    variables = model.init(jax.random.key(0), g, deterministic=True)
    params = variables["params"]

    def loss_fn(p):
        z = model.apply({"params": p}, g, deterministic=True)
        return jnp.sum(z ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_tp_mesh(2, 4)
    p_tp = tp_shard_params(params, mesh)
    # at least one leaf must actually be model-sharded
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding.spec, p_tp),
        is_leaf=lambda s: isinstance(s, P))
    assert any("model" in (s or ()) for s in shardings)

    with mesh:
        tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(p_tp)
    np.testing.assert_allclose(float(tp_loss), float(ref_loss),
                               rtol=2e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        ref_grads, tp_grads)
