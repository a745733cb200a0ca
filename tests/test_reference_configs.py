"""Every reference `configs_clean/*.yml` loads and runs >=1 training step
through this framework (VERDICT round-1 item 1).

Raw chemistry data is unavailable in this environment, so each dataset name
is backed by a tiny synthetic cache written in the reference's processed
flat-array layout (`write_synthetic_cache`); the protocol surface exercised
is real: YAML -> load_config -> build_dataset -> splits (incl. scaffold) ->
collate -> models -> trainer -> metrics.
"""
import glob
import os

import numpy as np
import pytest

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import build_dataset, run_training, train
from infomax3d_tpu.data.synthetic import write_synthetic_cache

CONFIG_DIR = "configs_clean"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic caches for every dataset family the reference configs use."""
    root = tmp_path_factory.mktemp("refdata")
    write_synthetic_cache(str(root / "QM9" / "processed.npz"),
                          num=300, num_targets=19, seed=1)
    write_synthetic_cache(str(root / "QMugs" / "processed.npz"),
                          num=260, num_conformers=3, seed=2)
    write_synthetic_cache(str(root / "GEOM_Drugs" / "processed.npz"),
                          num=260, num_conformers=5, seed=3)
    write_synthetic_cache(str(root / "file_loader_qm9" / "processed.npz"),
                          num=80, num_conformers=10, seed=4,
                          n_min=4, n_max=12)
    write_synthetic_cache(str(root / "ogbg_molfreesolv" / "processed.npz"),
                          num=140, num_targets=1, seed=5, split="scaffold")
    write_synthetic_cache(str(root / "bace_geomol" / "processed.npz"),
                          num=120, num_targets=1, seed=6,
                          float_features=True, split="random")
    return str(root)


@pytest.fixture()
def env_data(data_root, monkeypatch):
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    return data_root


def _small(overrides):
    base = dict(num_epochs=1, patience=1, use_tensorboard=False,
                eval_per_epochs=0, log_iterations=-1)
    base.update(overrides)
    return base


def test_pretrain_qm9_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_QM9.yml", _small(dict(
        logdir=str(tmp_path), batch_size=16, num_train=48)))
    assert args["dataset"] == "qm9"      # default, not set by the YAML
    res = train(args)
    assert np.isfinite(res["NTXent"])


def test_tune_qm9_homo_config_with_transfer(env_data, tmp_path):
    pre = load_config(f"{CONFIG_DIR}/pre-train_QM9.yml", _small(dict(
        logdir=str(tmp_path / "pre"), batch_size=16, num_train=32)))
    train(pre)
    ckpts = glob.glob(str(tmp_path / "pre" / "*" / "best_checkpoint.pt"))
    assert ckpts
    args = load_config(f"{CONFIG_DIR}/tune_QM9_homo.yml", _small(dict(
        logdir=str(tmp_path / "tune"), batch_size=16, num_train=32,
        pretrain_checkpoint=ckpts[0])))
    assert args["transfer_layers"] == ["gnn"]
    res = train(args)
    assert np.isfinite(res["mae_denormalized"])
    # qm9_properties expands into the per-task denormalized MAE
    assert "homo" in res


@pytest.mark.slow
def test_pretrain_qmugs_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_QMugs.yml", _small(dict(
        logdir=str(tmp_path), batch_size=8, num_train=24)))
    assert args["num_conformers"] == 3
    res = train(args)
    assert np.isfinite(res["NTXentMultiplePositives"])


@pytest.mark.slow
def test_pretrain_geom_drugs_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_GEOM-Drugs.yml", _small(dict(
        logdir=str(tmp_path), batch_size=8, num_train=24)))
    assert args["dataset"] == "drugs" and args["num_conformers"] == 5
    res = train(args)
    assert np.isfinite(res["NTXentMultiplePositives"])


@pytest.mark.slow
def test_tune_freesolv_config_scaffold_multiseed(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/tune_freesolv.yml", _small(dict(
        logdir=str(tmp_path), batch_size=16, minimum_epochs=0,
        pretrain_checkpoint=None, multithreaded_seeds=[1, 2])))
    assert args["dataset"] == "ogbg-molfreesolv"
    agg = train(args)
    assert any(k.startswith("ogbg-molfreesolv") for k in agg)
    assert os.path.exists(os.path.join(
        str(tmp_path), "multiple_seed_validation_statistics.txt"))


@pytest.mark.slow
def test_distance_predictor_baseline_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_distance_predictor_baseline.yml",
                       _small(dict(logdir=str(tmp_path), batch_size=8,
                                   num_train=24)))
    res = train(args)
    assert np.isfinite(res["L1Loss"])      # val loss (main_metric: 'loss')
    assert np.isfinite(res["mean_predictor_loss"])


@pytest.mark.slow
def test_graphcl_baseline_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_graphCL_baseline.yml",
                       _small(dict(logdir=str(tmp_path), batch_size=16,
                                   num_train=32)))
    assert args["collate_function"] == "NodeDropCollate"
    assert args["collate_params"] == {"drop_ratio": 0.2}
    res = train(args)
    assert np.isfinite(res["NTXent"])


@pytest.mark.slow
def test_optimal_transport_baseline_config(env_data, tmp_path):
    args = load_config(f"{CONFIG_DIR}/pre-train_Optimal_Transport_baseline.yml",
                       _small(dict(logdir=str(tmp_path), batch_size=4,
                                   num_train=8, num_conformers=3)))
    # shrink the conformer counts for test speed, keeping the model shape
    args["model_parameters"]["hyperparams"]["n_model_confs"] = 3
    args["model_parameters"]["hyperparams"]["n_true_confs"] = 3
    assert args["dataset"] == "file_loader_qm9"
    assert args["model_parameters"]["gnn_model"] == "PNAGNNRandomEdgeUpdate"
    res = train(args)
    # main_metric 'loss' is tracked under the loss function's name
    assert np.isfinite(res["MSELoss"])


def test_fingerprint_inference_config(env_data, tmp_path):
    from infomax3d_tpu.cli.inference import run_inference
    pre = load_config(f"{CONFIG_DIR}/pre-train_QM9.yml", _small(dict(
        logdir=str(tmp_path / "pre"), batch_size=16, num_train=32)))
    train(pre)
    ckpts = glob.glob(str(tmp_path / "pre" / "*" / "best_checkpoint.pt"))
    smiles_txt = tmp_path / "smiles.txt"
    smiles_txt.write_text("CCO\nc1ccccc1\nCC(=O)O\n")
    args = load_config(f"{CONFIG_DIR}/fingerprint_inference.yml", dict(
        checkpoint=ckpts[0], smiles_txt_path=str(smiles_txt),
        output_path=str(tmp_path / "fp.npy")))
    fps = run_inference(args)
    assert fps.shape == (3, 256)
    assert np.isfinite(np.asarray(fps)).all()


@pytest.mark.slow
def test_geomol_finetune_dispatch(env_data, tmp_path):
    """bace_geomol & friends: dispatchable, pre-split, OGB metric wired."""
    args = load_config(None, _small(dict(
        dataset="bace_geomol", logdir=str(tmp_path), batch_size=16,
        loss_func="BCEWithLogitsLoss", model_type="GeomolGNNWrapper",
        model_parameters=dict(hidden_dim=16, depth=2, n_layers=1,
                              readout_layers=1, readout_batchnorm=False),
        metrics=["rsquared"], collate_function="pytorch_geometric_collate",
        trainer="default", num_epochs=1)))
    res = train(args)
    assert any(k.startswith("ogbg-molbace") for k in res)


@pytest.mark.slow
def test_train_sampler_wiring(env_data, tmp_path):
    from infomax3d_tpu.cli.train import make_loaders
    args = load_config(f"{CONFIG_DIR}/pre-train_QM9.yml", _small(dict(
        logdir=str(tmp_path), batch_size=16, num_train=64,
        train_sampler="ConstantNumberAtomsChunks")))
    from infomax3d_tpu.cli.train import build_dataset, resolve_fast_paths
    ds = build_dataset(args)
    resolve_fast_paths(args)
    tr, va, te = make_loaders(args, ds)
    assert tr.batch_sampler is not None
    batch = next(iter(tr))
    assert "graph2d" in batch and "graph3d" in batch
    # chunked sampler batches have near-constant atom counts
    sizes_per_batch = [
        np.ptp(np.asarray([ds.node_counts()[i] for i in chunk]))
        for chunk in list(tr.batch_sampler)[:5]]
    assert np.mean(sizes_per_batch) <= 6
