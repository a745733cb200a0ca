"""`model_shards` config-surface tensor parallelism (VERDICT r2 item 6).

A YAML-style args dict with ``model_shards: 2`` must train through
`run_training` on the virtual 8-device CPU mesh with params column-sharded
over the 'model' axis (GSPMD), and the training trajectory must match the
unsharded run (layout changes must not change math).
"""
import numpy as np
import pytest

import jax

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import run_training
from infomax3d_tpu.data.synthetic import write_synthetic_cache


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tpdata")
    write_synthetic_cache(str(root / "QM9" / "processed.npz"),
                          num=96, num_targets=19, seed=21)
    return str(root)


def _args(tmp_path, model_shards):
    return load_config(None, dict(
        dataset="qm9", targets=["homo"], model_type="PNA",
        model_parameters=dict(hidden_dim=16, target_dim=1,
                              aggregators=["mean", "max"],
                              scalers=["identity"],
                              readout_aggregators=["mean"],
                              propagation_depth=2, readout_layers=1,
                              readout_batchnorm=False),
        loss_func="L1Loss", metrics=["mae"], main_metric="mae",
        batch_size=16, num_train=48, num_epochs=2, patience=5,
        minimum_epochs=0, log_iterations=-1, use_tensorboard=False,
        eval_per_epochs=0, logdir=str(tmp_path), seed=123,
        model_shards=model_shards, bf16_compute=False))


def test_model_shards_trains_and_matches_replicated(data_root, tmp_path,
                                                    monkeypatch):
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    res_tp = run_training(_args(tmp_path / "tp", 2))
    assert np.isfinite(res_tp["mae"])
    res_1 = run_training(_args(tmp_path / "rep", 1))
    # same seed, same batches: the GSPMD layout must not change the math
    # beyond reduction-order noise
    np.testing.assert_allclose(res_tp["mae"], res_1["mae"],
                               rtol=5e-4, atol=5e-5)


def test_model_shards_params_carry_model_axis(data_root, tmp_path,
                                              monkeypatch):
    """grad/param shardings carry the 'model' axis end-to-end: probe the
    trainer state directly after init."""
    from infomax3d_tpu.cli.train import (build_dataset, build_models,
                                         make_loaders, resolve_collate,
                                         resolve_fast_paths)
    from infomax3d_tpu.parallel.tp import make_tp_mesh, tp_shard_tree
    from infomax3d_tpu.train.trainer import Trainer

    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    args = _args(tmp_path, 2)
    resolve_collate(args)
    ds = build_dataset(args)
    resolve_fast_paths(args)
    models = build_models(args, ds)
    tp_mesh = make_tp_mesh(1, 2)
    tr = Trainer(models, args, metrics={}, main_metric="loss",
                 run_dir=str(tmp_path / "probe"), loss_name="L1Loss",
                 tp_mesh=tp_mesh, use_tensorboard=False)
    loader, _, _ = make_loaders(args, ds)
    batch = next(iter(loader))
    tr.init_state(batch)
    sharded = [
        p for p in jax.tree_util.tree_leaves(tr.state.params)
        if "model" in str(getattr(p.sharding, "spec", ""))]
    assert len(sharded) >= 4, f"only {len(sharded)} param leaves sharded"
    # one optimizer step keeps the layout and produces sharded updates
    step, _ = tr._steps_for(batch)
    state2, loss, _ = step(tr.state, batch, tr._full_lr_vector(),
                           jax.random.key(0))
    assert np.isfinite(float(loss))
    sharded2 = [
        p for p in jax.tree_util.tree_leaves(state2.params)
        if "model" in str(getattr(p.sharding, "spec", ""))]
    assert len(sharded2) >= 4


def test_combined_data_model_shards_matches_replicated(data_root, tmp_path,
                                                       monkeypatch):
    """`n_shards: 2, model_shards: 2` (VERDICT r4 item 5): ONE (data, model)
    mesh — the shard_map step is manual over 'data' (axis_names) while
    GSPMD propagates the 'model' column shardings — and the final metric
    matches the DP-only run bit-for-bit (the TP layout must not change the
    math; DP-vs-single equality itself is proven on identical batches in
    test_parallel — run_training's DP loader chunks batches differently
    from the single-device loader, so DP-only is the right control here)."""
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    args = _args(tmp_path / "dptp", 2)
    args["n_shards"] = 2
    args["batch_size"] = 8
    res = run_training(args)
    assert np.isfinite(res["mae"])
    args_dp = _args(tmp_path / "dponly", 1)
    args_dp["n_shards"] = 2
    args_dp["batch_size"] = 8
    res_dp = run_training(args_dp)
    np.testing.assert_allclose(res["mae"], res_dp["mae"],
                               rtol=5e-4, atol=5e-5)


def test_model_shards_excludes_graph_meshes(data_root, tmp_path,
                                            monkeypatch):
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    args = _args(tmp_path, 2)
    args["graph_shards"] = 2
    with pytest.raises(ValueError, match="model_shards"):
        run_training(args)
