"""End-to-end CLI tests: pre-train -> transfer -> fine-tune via the
reference-schema YAML configs (call stack 3.1/3.2 of SURVEY.md)."""
import glob
import os

import numpy as np
import pytest

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import run_training, train


def test_config_defaults_and_append_quirk(tmp_path):
    cfg = tmp_path / "c.yml"
    cfg.write_text("metrics:\n  - mae\nbatch_size: 7\n")
    args = load_config(str(cfg))
    assert args["batch_size"] == 7
    assert args["metrics"] == ["mae"]          # appended to empty default
    assert args["trainer"] == "contrastive"    # untouched default


def test_pretrain_then_finetune(tmp_path):
    pre = load_config("configs_clean/pre-train_synthetic.yml",
                      dict(logdir=str(tmp_path / "runs"), num_epochs=2,
                           use_tensorboard=False))
    res = train(pre)
    assert np.isfinite(res["NTXent"])
    ckpts = glob.glob(str(tmp_path / "runs" / "*" / "best_checkpoint.pt"))
    assert ckpts, "pre-training produced no checkpoint"

    tune = load_config("configs_clean/tune_synthetic.yml",
                       dict(logdir=str(tmp_path / "runs2"), num_epochs=2,
                            pretrain_checkpoint=ckpts[0],
                            use_tensorboard=False))
    res2 = train(tune)
    assert np.isfinite(res2["mae_denormalized"])
    assert any(k.startswith("test_") for k in res2)


def test_multiseed(tmp_path):
    pre = load_config("configs_clean/pre-train_synthetic.yml",
                      dict(logdir=str(tmp_path / "ms"), num_epochs=1,
                           multithreaded_seeds=[1, 2], use_tensorboard=False,
                           dataset_params={"num": 256, "n_max": 16},
                           batch_size=16, num_train=64))
    agg = train(pre)
    assert any(k.endswith("_mean") for k in agg)
    assert os.path.exists(
        os.path.join(str(tmp_path / "ms"),
                     "multiple_seed_validation_statistics.txt"))


def test_config_merge_semantics(tmp_path):
    """Reference get_arguments semantics (train.py:615-641): YAML lists
    APPEND onto defaults (the quirk), programmatic overrides REPLACE.
    Appending overrides once turned multithreaded_seeds=[1, 2] into
    [1..6, 1, 2] whose duplicate seeds raced on one run dir."""
    from infomax3d_tpu.cli.config import load_config

    args = load_config("configs_clean/tune_freesolv.yml")
    assert args["multithreaded_seeds"] == [1, 2, 3, 4, 5, 6]
    args = load_config("configs_clean/tune_freesolv.yml",
                       dict(multithreaded_seeds=[1, 2]))
    assert args["multithreaded_seeds"] == [1, 2]
