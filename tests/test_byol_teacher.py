"""BYOL teacher semantics (reference trainer/byol_wrapper.py:38-53):
`torch.no_grad()` around the teacher forward disables autograd but NOT train
mode, so the teacher's BatchNorm normalizes with BATCH statistics and keeps
updating the TEACHER's own running buffers.  These tests pin that behavior
(the round-1 deviation ran the teacher in eval mode) and BYOL under the
data-parallel mesh (the round-1 custom step ignored the mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from infomax3d_tpu.data.loader import GraphDataLoader
from infomax3d_tpu.graphs.batch import BucketSpec
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models import BYOLWrapper
from infomax3d_tpu.parallel import make_mesh
from infomax3d_tpu.train.trainer import BYOLTrainer

from test_trainers import NET3D_SMALL, PNA_SMALL, _Dataset, base_args

BATCH = 8
B2 = BucketSpec(BATCH, 256, 1024)
B3 = BucketSpec(BATCH, 256, 8192)


def _mk_trainer(tmp_path, mesh=None, name="b", **kw):
    w2 = BYOLWrapper(model_type="PNA", model_parameters=PNA_SMALL,
                     predictor_layers=1, metric_dim=16,
                     predictor_batchnorm=True)
    w3 = BYOLWrapper(model_type="Net3D", model_parameters=NET3D_SMALL,
                     predictor_layers=1, metric_dim=16)
    return BYOLTrainer(
        {"model": w2, "model3d": w3}, base_args(), metrics={},
        main_metric="loss", run_dir=str(tmp_path / name),
        loss_func=LOSS_REGISTRY["CosineSimilarityLoss"](),
        loss_name="CosineSimilarityLoss",
        ma_decay=0.9, mesh=mesh, use_tensorboard=False, **kw)


def _loader(n_shards=1):
    return GraphDataLoader(_Dataset(), BATCH, "contrastive_collate",
                           bucket=B2, shuffle=False, prefetch=0,
                           n_shards=n_shards,
                           collate_kwargs={"bucket3d": B3})


def _flat(tree):
    return jax.tree_util.tree_leaves(tree)


def test_teacher_running_stats_update_in_train_mode(tmp_path):
    tr = _mk_trainer(tmp_path)
    batch = next(iter(_loader()))
    tr.init_state(batch)
    t_stats0 = jax.tree_util.tree_map(np.asarray,
                                      tr.state.extra["teacher_stats"])
    teacher0 = jax.tree_util.tree_map(np.asarray, tr.state.extra["teacher"])
    params0 = jax.tree_util.tree_map(np.asarray, {
        k: BYOLTrainer._strip_predictor(tr.state.params[k])
        for k in tr.MODEL_KEYS})

    step, _ = tr._steps_for(batch)
    st, loss, _ = step(tr.state, batch, tr._full_lr_vector(),
                       jax.random.key(0))
    assert np.isfinite(float(loss))

    # teacher BN buffers moved (train-mode teacher forward updates them)
    moved = [np.abs(np.asarray(a) - b).max()
             for a, b in zip(_flat(st.extra["teacher_stats"]),
                             _flat(t_stats0))]
    assert max(moved) > 1e-6, "teacher running stats did not update"

    # teacher params EMA — reference-exact: after_optim_step updates ONLY
    # the 2D wrapper's teacher (byol_trainer.py:24 calls
    # `self.model.ma_teacher_update()` and never touches model3d), so
    # t1 = 0.9 * t0 + 0.1 * student_after_step for "model" while the
    # "model3d" teacher stays frozen at its deepcopy-of-init state
    student1 = {k: BYOLTrainer._strip_predictor(st.params[k])
                for k in tr.MODEL_KEYS}
    want = dict(teacher0)
    want["model"] = jax.tree_util.tree_map(
        lambda t, s: 0.9 * t + 0.1 * np.asarray(s),
        teacher0["model"], student1["model"])
    for a, b in zip(_flat(st.extra["teacher"]), _flat(want)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)
    # params0 proves the student moved, so a frozen 3D teacher is a real
    # assertion (not vacuous equality of two untouched trees)
    moved3d = [np.abs(np.asarray(a) - b).max()
               for a, b in zip(_flat(student1["model3d"]),
                               _flat(params0["model3d"]))]
    assert max(moved3d) > 0

    # eval step leaves extra untouched (teacher runs eval mode there)
    _, evl = tr._steps_for(batch)
    evl(st, batch, jax.random.key(1))  # must not crash; extra not returned


def test_byol_ema_all_updates_both_teachers(tmp_path):
    """`byol_ema_all: true` opts into the symmetric BYOL update (the
    theoretically-intended behavior the reference's after_optim_step
    forgot for model3d): BOTH teachers EMA toward their students."""
    tr = _mk_trainer(tmp_path, name="ba", ema_all=True)
    batch = next(iter(_loader()))
    tr.init_state(batch)
    teacher0 = jax.tree_util.tree_map(np.asarray, tr.state.extra["teacher"])
    step, _ = tr._steps_for(batch)
    st, _, _ = step(tr.state, batch, tr._full_lr_vector(), jax.random.key(0))
    student1 = {k: BYOLTrainer._strip_predictor(st.params[k])
                for k in tr.MODEL_KEYS}
    want = jax.tree_util.tree_map(lambda t, s: 0.9 * t + 0.1 * np.asarray(s),
                                  teacher0, student1)
    for a, b in zip(_flat(st.extra["teacher"]), _flat(want)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)


def test_teacher_uses_batch_stats_not_running(tmp_path):
    """The teacher projection in train mode must equal a train-mode forward
    with the teacher's params/stats — NOT the eval-mode (running-average)
    forward (the round-1 deviation)."""
    tr = _mk_trainer(tmp_path, name="b2")
    batch = next(iter(_loader()))
    tr.init_state(batch)
    params = tr.state.params["model"]
    stats = tr.state.batch_stats["model"]
    extra = tr.state.extra
    model = tr.models["model"]

    rng = jax.random.key(3)
    r2, _ = jax.random.split(rng)
    _, rng_t = jax.random.split(r2)
    tr._loss_fn_extra = extra
    (_, proj_t), _, _ = tr._apply_byol(model, params, stats,
                                       batch["graph2d"], True, r2,
                                       teacher_key="model")

    tp = dict(params)
    tp.update(extra["teacher"]["model"])
    t_stats = dict(stats)
    t_stats.update(extra["teacher_stats"]["model"])
    (_, want_train), _ = model.apply(
        {"params": tp, "batch_stats": t_stats}, batch["graph2d"],
        deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": rng_t})
    (_, want_eval) = model.apply(
        {"params": tp, "batch_stats": t_stats}, batch["graph2d"],
        deterministic=True)
    np.testing.assert_allclose(np.asarray(proj_t), np.asarray(want_train),
                               rtol=1e-5, atol=1e-6)
    # and it differs from the eval-mode forward (fresh init: running stats
    # are the 0/1 defaults, far from batch statistics)
    assert np.abs(np.asarray(proj_t) - np.asarray(want_eval)).max() > 1e-3


def test_byol_under_data_parallel_mesh(tmp_path):
    """BYOL now rides the shared parallel step: one DP step on the 8-device
    mesh must match the single-device step on the concatenated batch."""
    NDEV = 4
    mesh = make_mesh(NDEV, axis_names=("data",))
    b2 = BucketSpec(BATCH, NDEV * 64, NDEV * 256)
    b3 = BucketSpec(BATCH, NDEV * 64, NDEV * 2048)
    sharded_loader = GraphDataLoader(_Dataset(num=16), BATCH,
                                     "contrastive_collate", bucket=b2,
                                     shuffle=False, prefetch=0,
                                     n_shards=NDEV,
                                     collate_kwargs={"bucket3d": b3})
    sharded = next(iter(sharded_loader))

    tr = _mk_trainer(tmp_path, mesh=mesh, name="bp")
    tr.init_state(jax.tree_util.tree_map(lambda a: a[0], sharded))
    step, _ = tr._steps_for(sharded)
    st, loss, _ = step(tr.state, sharded, tr._full_lr_vector(),
                       jax.random.key(0))
    assert np.isfinite(float(loss))
    # teacher state updated through the parallel step too
    leaves = _flat(st.extra["teacher_stats"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
