"""bf16 compute mode (train/precision.py): parity vs fp32 within bf16
tolerance, fp32 master state preserved, kernels dtype-generic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.train.precision import cast_floats, resolve_compute_dtype


def _batch(num=32, csr=False, seed=0):
    ds = SyntheticMolecules(num, seed=seed)
    kw = dict(max_deg=8, csr=True) if csr else {}
    return to_graph_batch(batch_graphs(
        [ds.graph2d(i) for i in range(num)],
        BucketSpec(num, 768, 2048, **kw)))


def test_cast_floats_selectivity():
    tree = {"a": jnp.ones(3, jnp.float32), "b": jnp.ones(3, jnp.int32),
            "c": jnp.ones(3, jnp.bool_)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32 and out["c"].dtype == jnp.bool_


def test_resolve_compute_dtype():
    assert resolve_compute_dtype(False) is None
    assert resolve_compute_dtype(True) == jnp.bfloat16
    # on the CPU test backend 'auto' keeps full precision
    assert resolve_compute_dtype("auto") is None


def test_pna_forward_bf16_parity():
    from infomax3d_tpu.models import PNA
    g = _batch()
    m = PNA(hidden_dim=64, target_dim=32, aggregators=["mean", "max", "min", "std"],
            scalers=["identity", "amplification", "attenuation"],
            readout_aggregators=["min", "max", "mean"], propagation_depth=3,
            readout_layers=1, readout_batchnorm=True)
    v = m.init(jax.random.key(0), g)
    out32 = m.apply(v, g, deterministic=True)
    vb = cast_floats(v, jnp.bfloat16)
    outb = m.apply(vb, cast_floats(g, jnp.bfloat16), deterministic=True)
    assert outb.dtype == jnp.bfloat16
    rel = (jnp.abs(outb.astype(jnp.float32) - out32)
           / (jnp.abs(out32) + 1e-2)).max()
    assert float(rel) < 0.08, f"bf16 drift too large: {float(rel)}"


def test_pallas_csr_bf16_matches_fp32(rng):
    from infomax3d_tpu.ops.pallas.spmm import pna_csr_aggregate
    g = _batch(csr=True)
    E = int(g.senders.shape[0])
    msgs = jnp.asarray(rng.normal(size=(E, 128)).astype(np.float32))
    row_ptr = g.extras["csr_row_ptr"]
    K = g.extras["mb_in_edges"].shape[1]
    aggs = ["mean", "max", "min", "std"]
    # baseline: f32 kernel on bf16-ROUNDED inputs — isolates kernel-path
    # drift from the mode's intrinsic input rounding (sum/sumsq upcast the
    # window in-register, so they must match this baseline almost exactly)
    msgs_r = msgs.astype(jnp.bfloat16).astype(jnp.float32)
    h32 = pna_csr_aggregate(msgs_r, row_ptr, g.receivers, K, aggs,
                            interpret=True)
    hb = pna_csr_aggregate(msgs.astype(jnp.bfloat16), row_ptr, g.receivers,
                           K, aggs, interpret=True)
    assert hb.dtype == jnp.bfloat16
    err = (jnp.abs(hb.astype(jnp.float32) - h32)
           / (jnp.abs(h32) + 0.05)).max()
    # only the final bf16 store rounds (plus bf16 one-hot selection)
    assert float(err) < 0.01, float(err)


def test_trainer_bf16_step_keeps_fp32_master(tmp_path):
    from infomax3d_tpu.losses import get_loss
    from infomax3d_tpu.models import PNA, Net3D
    from infomax3d_tpu.train.trainer import SelfSupervisedTrainer
    from infomax3d_tpu.data.loader import get_collate

    ds = SyntheticMolecules(32, seed=3)
    items = [{"graph2d": ds.graph2d(i), "graph3d": ds.graph3d(i)}
             for i in range(16)]
    batch = get_collate("contrastive_collate")(
        items, BucketSpec(16, 512, 2048),
        bucket3d=BucketSpec(16, 512, 16384))

    def build(bf16):
        models = dict(
            model=PNA(hidden_dim=32, target_dim=16, aggregators=["mean"],
                      scalers=["identity"], readout_aggregators=["mean"],
                      propagation_depth=2, readout_layers=1,
                      readout_batchnorm=False),
            model3d=Net3D(hidden_dim=16, target_dim=16, propagation_depth=1,
                          readout_aggregators=["mean"], readout_layers=1,
                          readout_batchnorm=False, batch_norm=False))
        args = dict(optimizer="Adam", optimizer_params={"lr": 1e-3},
                    lr_scheduler=None, lr_scheduler_params=None,
                    frozen_layers=[], transferred_lr=None,
                    bf16_compute=bf16, metrics=[], patience=5)
        tr = SelfSupervisedTrainer(
            models, args, metrics={}, main_metric="loss",
            run_dir=str(tmp_path / f"r{bf16}"), loss_func=get_loss("NTXent"),
            loss_name="NTXent", use_tensorboard=False)
        tr.init_state(batch)
        return tr

    tr32, trb = build(False), build(True)
    assert trb.compute_dtype == jnp.bfloat16
    step32 = tr32._make_train_step()
    stepb = trb._make_train_step()
    lrs = tr32._full_lr_vector()
    k = jax.random.key(0)
    before = jax.tree_util.tree_map(np.asarray, trb.state.params)
    s32, loss32, _ = step32(tr32.state, batch, lrs, k)
    sb, lossb, _ = stepb(trb.state, batch, lrs, k)
    # master params remain fp32 after a bf16 step
    leaves = jax.tree_util.tree_leaves(sb.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert np.isfinite(float(lossb))
    assert abs(float(lossb) - float(loss32)) < 0.12 * abs(float(loss32)) + 0.05
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), before, sb.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
