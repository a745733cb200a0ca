"""CLI fast-path knobs: csr buckets (Pallas kernel, interpret mode on CPU)
and the dense-3D contrastive path (Net3DDense swap)."""
import numpy as np
import pytest

from infomax3d_tpu.cli.config import DEFAULTS


def _args(tmp_path, **over):
    args = dict(DEFAULTS)
    args.update(
        experiment_name="fastpath", dataset="synthetic",
        dataset_params={"num": 48, "n_max": 14}, num_epochs=1, batch_size=16,
        num_train=32, log_iterations=100, patience=5,
        logdir=str(tmp_path), metrics=["mae"], main_metric="mae",
        targets=["t0"], loss_func="L1Loss", optimizer="Adam",
        optimizer_params={"lr": 1e-3}, lr_scheduler=None,
        model_type="PNA",
        model_parameters=dict(
            target_dim=1, hidden_dim=16, readout_hidden_dim=16,
            readout_layers=1, propagation_depth=1,
            aggregators=["mean", "max", "min", "std"],
            scalers=["identity", "amplification", "attenuation"],
            readout_aggregators=["min", "max", "mean"]),
    )
    args.update(over)
    return args


def test_csr_buckets_end_to_end(tmp_path):
    from infomax3d_tpu.cli.train import run_training
    res = run_training(_args(tmp_path, csr_buckets=True))
    assert np.isfinite(res["mae"])


def test_dense_3d_contrastive_end_to_end(tmp_path):
    from infomax3d_tpu.cli.train import run_training
    args = _args(
        tmp_path, dense_3d=True, csr_buckets=False,
        dataset_params={"num": 96, "n_max": 14}, batch_size=8, num_train=48,
        collate_function="contrastive_collate", trainer="contrastive",
        loss_func="NTXent", loss_params={"tau": 0.1}, metrics=[],
        main_metric="loss", model3d_type="Net3D",
        model3d_parameters=dict(
            target_dim=16, hidden_dim=12, readout_hidden_dim=12,
            node_wise_output_layers=0, message_net_layers=1,
            update_net_layers=1, propagation_depth=1, readout_layers=1,
            fourier_encodings=4, readout_aggregators=["min", "max", "mean"]),
    )
    res = run_training(args)
    assert np.isfinite(res["NTXent"])


def test_auto_resolution_off_on_cpu():
    from infomax3d_tpu.cli.train import resolve_fast_paths
    args = dict(DEFAULTS, collate_function="contrastive_collate",
                model3d_type="Net3D")
    resolve_fast_paths(args)
    # tests run on the CPU backend -> auto means off
    assert args["_csr"] is False
    assert args["_dense_3d"] is False


def test_dense3d_model_swap():
    from infomax3d_tpu.cli.train import build_models
    from infomax3d_tpu.models.net3d import Net3D, Net3DDense
    args = dict(DEFAULTS, model_type="PNA",
                model_parameters=dict(
                    target_dim=1, hidden_dim=16,
                    aggregators=["mean"], scalers=["identity"],
                    readout_aggregators=["mean"]),
                model3d_type="Net3D",
                model3d_parameters=dict(
                    target_dim=1, hidden_dim=12,
                    readout_aggregators=["mean"]),
                _dense_3d=True)
    models = build_models(args)
    assert isinstance(models["model3d"], Net3DDense)
    args["_dense_3d"] = False
    models = build_models(args)
    assert isinstance(models["model3d"], Net3D)
