"""The reference's full experiment-config surface (`configs/` — 90 YAMLs,
reference `configs/*.yml`) resolves through this framework, and a
representative subset spanning every trainer/collate/model family not
already exercised by the `configs_clean` tests runs >=1 training step.

Two layers:

* resolution — every vendored config loads through `load_config` and every
  name it uses (model_type, model3d_type, loss_func, collate_function,
  trainer, lr_scheduler, dataset) resolves in this framework's registries;
  the dataset dispatch is proven reachable by asserting `build_dataset`
  fails with a *missing-cache* error, never an unknown-name KeyError.
* execution — one train step per distinct (trainer, collate, model) combo
  on synthetic caches written in the reference's processed layout.

Upstream-broken configs are skip-listed with the reason (the reference's
reflection registry cannot resolve them either).
"""
import glob
import os

import numpy as np
import pytest
import yaml

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import build_dataset, train
from infomax3d_tpu.data.loader import get_collate
from infomax3d_tpu.data.synthetic import write_synthetic_cache
from infomax3d_tpu.losses import LOSS_REGISTRY
from infomax3d_tpu.models.registry import get_model_class
from infomax3d_tpu.train.schedulers import WRAPPED_SCHEDULERS
from infomax3d_tpu.train.trainer import TRAINER_REGISTRY

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

# configs the reference itself cannot run (its models/__init__.py skips
# legacy/, so globals()[model_type] NameErrors):
SKIP = {
    "continue.yml": "bare checkpoint pointer into a run dir the reference "
                    "does not ship (reference configs/continue.yml)",
    "contrastive_training_pna_self_attention_readout.yml":
        "PNASelfAttentionReadout lives in models/legacy/ which the "
        "reference never exports (models/__init__.py skips legacy)",
}

ALL_CONFIGS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, "*.yml")))

SUPERVISED_LOSSES = {"L1Loss", "MSELoss", "BCEWithLogitsLoss"}

# metric names the reference's own metrics_dict lookup (train.py:336)
# KeyErrors on — configs listing them are runnable there only by luck of
# the dispatch path; we skip the name like build_metrics does
UPSTREAM_BROKEN_METRICS = {"0.yml": {"f1_contrastive"}}

# resolvable only with a dataset in hand (denormalization stats)
DATASET_DEPENDENT_METRICS = {"qm9_properties", "mae_denormalized",
                             "mse_denormalized"}


def test_vendored_surface_complete():
    """Every reference experiment YAML is vendored."""
    ref = sorted(os.path.basename(p)
                 for p in glob.glob("/root/reference/configs/*.yml"))
    if not ref:
        pytest.skip("reference mount unavailable")
    assert set(ref) <= set(ALL_CONFIGS)


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_resolves(name, tmp_path, monkeypatch):
    if name in SKIP:
        pytest.skip(SKIP[name])
    args = load_config(os.path.join(CONFIG_DIR, name))

    get_model_class(args["model_type"])
    if args.get("model3d_type"):
        get_model_class(args["model3d_type"])
    assert args["loss_func"] in LOSS_REGISTRY or \
        args["loss_func"] in SUPERVISED_LOSSES
    get_collate(args["collate_function"])
    assert args["trainer"] in TRAINER_REGISTRY

    from infomax3d_tpu.cli.train import build_metrics
    ms = [m for m in args["metrics"]
          if m not in DATASET_DEPENDENT_METRICS
          and m not in UPSTREAM_BROKEN_METRICS.get(name, set())]
    built = build_metrics({**args, "metrics": ms})
    assert set(built) == set(ms), f"unresolved metrics: {set(ms) - set(built)}"
    sched = args.get("lr_scheduler")
    assert sched in (None, "WarmUpWrapper") or sched in WRAPPED_SCHEDULERS

    # dataset dispatch reachable: with an empty data root the failure must
    # be a missing cache (FileNotFoundError/OSError), never an unknown-name
    # KeyError out of build_dataset
    monkeypatch.setenv("INFOMAX3D_DATA", str(tmp_path))
    if args["dataset"] != "synthetic":
        with pytest.raises((FileNotFoundError, OSError)):
            build_dataset(args)


@pytest.fixture(scope="module")
def full_data_root(tmp_path_factory):
    """A small synthetic cache for EVERY dataset name any config uses."""
    root = tmp_path_factory.mktemp("alldata")
    ogbg = ("molbace molbbbp molclintox molesol molfreesolv molhiv mollipo "
            "molmuv molpcba molsider moltox21 moltoxcast").split()
    targets = {"molpcba": 128, "molclintox": 2, "moltox21": 12,
               "moltoxcast": 617, "molmuv": 17, "molsider": 27}
    for i, n in enumerate(ogbg):
        write_synthetic_cache(str(root / f"ogbg_{n}" / "processed.npz"),
                              num=60, num_targets=targets.get(n, 1),
                              seed=100 + i, split="scaffold")
    write_synthetic_cache(str(root / "QM9" / "processed.npz"),
                          num=80, num_targets=19, seed=120)
    write_synthetic_cache(str(root / "QM9_rdkit" / "processed.npz"),
                          num=60, num_targets=19, num_conformers=3, seed=121)
    write_synthetic_cache(str(root / "qm9_geomol" / "processed.npz"),
                          num=60, num_targets=19, num_conformers=3, seed=122)
    write_synthetic_cache(str(root / "QMugs" / "processed.npz"),
                          num=60, num_conformers=3, seed=123)
    write_synthetic_cache(str(root / "GEOM_Drugs" / "processed.npz"),
                          num=60, num_conformers=5, seed=124)
    write_synthetic_cache(str(root / "GEOM_QM9" / "processed.npz"),
                          num=60, num_conformers=5, seed=125)
    write_synthetic_cache(str(root / "pcqm4m" / "processed.npz"),
                          num=60, num_targets=1, seed=126, split="random")
    for n in ("file_loader_qm9", "file_loader_drugs", "ot_pyg_geom_qm9"):
        write_synthetic_cache(str(root / n / "processed.npz"),
                              num=30, num_conformers=10, seed=127,
                              n_min=4, n_max=12)
    return str(root)


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_builds(name, full_data_root, monkeypatch, tmp_path):
    """Beyond name resolution: every config constructs its dataset, splits,
    metrics, and MODELS (flax dataclass validation of model_parameters)
    through the real build path."""
    if name in SKIP:
        pytest.skip(SKIP[name])
    raw = yaml.safe_load(open(os.path.join(CONFIG_DIR, name))) or {}
    if raw.get("checkpoint") and "model_type" not in raw:
        pytest.skip("checkpoint-resume pointer into a run dir the reference "
                    "does not ship (model params live in its "
                    "train_arguments.yaml)")
    monkeypatch.setenv("INFOMAX3D_DATA", full_data_root)
    from infomax3d_tpu.cli.train import (apply_dataset_protocol,
                                         build_dataset, build_metrics,
                                         build_models, make_splits,
                                         resolve_collate, resolve_fast_paths)
    args = load_config(os.path.join(CONFIG_DIR, name),
                       dict(logdir=str(tmp_path), num_train=16,
                            batch_size=8, num_conformers=min(
                                3, yaml.safe_load(open(os.path.join(
                                    CONFIG_DIR, name))).get(
                                        "num_conformers", 1) or 1),
                            pretrain_checkpoint=None))
    resolve_collate(args)
    ds = build_dataset(args)
    apply_dataset_protocol(args, ds)
    ms = [m for m in args["metrics"]
          if m not in UPSTREAM_BROKEN_METRICS.get(name, set())]
    build_metrics({**args, "metrics": ms}, ds)
    resolve_fast_paths(args)
    tr, va, te = make_splits(args, ds)
    assert len(tr) > 0 and len(va) > 0
    models = build_models(args, ds)
    assert "model" in models
    if args.get("model3d_type"):
        assert "model3d" in models

    # host data path: loaders build and yield one collated batch (catches
    # bucket sizing / collate-contract mismatches for every config, not
    # just the step-tested combos)
    from infomax3d_tpu.cli.train import make_loaders
    train_loader, _, _ = make_loaders(args, ds)
    batch = next(iter(train_loader))
    assert isinstance(batch, dict) and batch


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("expdata")
    write_synthetic_cache(str(root / "QM9" / "processed.npz"),
                          num=200, num_targets=19, seed=11)
    write_synthetic_cache(str(root / "QM9_rdkit" / "processed.npz"),
                          num=120, num_targets=19, num_conformers=3, seed=12)
    write_synthetic_cache(str(root / "QMugs" / "processed.npz"),
                          num=260, num_conformers=3, seed=13)
    write_synthetic_cache(str(root / "GEOM_Drugs" / "processed.npz"),
                          num=260, num_conformers=5, seed=14)
    write_synthetic_cache(str(root / "ogbg_molhiv" / "processed.npz"),
                          num=120, num_targets=1, seed=15, split="scaffold")
    write_synthetic_cache(str(root / "ogbg_molpcba" / "processed.npz"),
                          num=120, num_targets=128, seed=16, split="scaffold",
                          nan_targets=True)
    write_synthetic_cache(str(root / "ot_pyg_geom_qm9" / "processed.npz"),
                          num=40, num_conformers=10, seed=17,
                          n_min=4, n_max=12)
    write_synthetic_cache(str(root / "file_loader_drugs" / "processed.npz"),
                          num=40, num_conformers=10, seed=18,
                          n_min=4, n_max=12)
    write_synthetic_cache(str(root / "file_loader_qm9" / "processed.npz"),
                          num=40, num_conformers=10, seed=20,
                          n_min=4, n_max=12)
    write_synthetic_cache(str(root / "ogbg_molesol" / "processed.npz"),
                          num=120, num_targets=1, seed=19, split="scaffold")
    return str(root)


@pytest.fixture()
def env_data(data_root, monkeypatch):
    monkeypatch.setenv("INFOMAX3D_DATA", data_root)
    return data_root


def _run(name, tmp_path, **overrides):
    base = dict(num_epochs=1, patience=1, minimum_epochs=0,
                use_tensorboard=False, eval_per_epochs=0, log_iterations=-1,
                logdir=str(tmp_path), multithreaded_seeds=[],
                pretrain_checkpoint=None)
    base.update(overrides)
    args = load_config(os.path.join(CONFIG_DIR, name), base)
    return args, train(args)


@pytest.mark.slow
def test_step_byol(env_data, tmp_path):
    args, res = _run("byol.yml", tmp_path, batch_size=16, num_train=32)
    assert args["trainer"] == "byol"
    assert np.isfinite(res["CosineSimilarityLoss"])


@pytest.mark.slow
def test_step_net3dae_autoencoder(env_data, tmp_path):
    args, res = _run("contrastive_training_Net3DAE.yml", tmp_path,
                     batch_size=8, num_train=24)
    # train() canonicalizes the alias (custom_collate.py:52-62)
    assert args["collate_function"] in ("contrastive_vae_collate",
                                        "contrastive_collate_ae")
    assert np.isfinite(res["NTXentAE"])


@pytest.mark.slow
def test_step_pna_original_molhiv_snorm(env_data, tmp_path):
    args, res = _run("pna_original_molhiv.yml", tmp_path,
                     batch_size=16, num_train=48)
    # train() canonicalizes the alias (snorm always rides in GraphBatch)
    assert args["collate_function"] in ("s_norm_graph_collate",
                                        "graph_collate")
    assert any(k.startswith("ogbg-molhiv") for k in res)


@pytest.mark.slow
def test_step_pnatransformer_ogbg(env_data, tmp_path):
    args, res = _run("pnatransformer_ogbg.yml", tmp_path,
                     batch_size=16, num_train=48)
    assert args["model_type"] == "PNATransformer"
    assert any(k.startswith("ogbg-molhiv") for k in res)


@pytest.mark.slow
def test_step_san_ogbg(env_data, tmp_path):
    args, res = _run("san_ogbg.yml", tmp_path, batch_size=16, num_train=48)
    assert "san_graph" in [str(r) for r in args["required_data"]]
    assert any(k.startswith("ogbg-molhiv") for k in res)


@pytest.mark.slow
def test_step_sphere_net_smp(env_data, tmp_path):
    args, res = _run("sphere_net.yml", tmp_path, batch_size=8, num_train=16)
    assert args["model_type"] == "SMP"
    assert np.isfinite(res["L1Loss"])


@pytest.mark.slow
def test_step_smp_rdkit_conformers(env_data, tmp_path):
    """SMP on the RDKit-conformer QM9 cache (configs/SMP_rdkit_conformers.yml
    -> dataset qm9_rdkit, reference qm9_dataset_rdkit_conformers.py)."""
    args, res = _run("SMP_rdkit_conformers.yml", tmp_path,
                     batch_size=8, num_train=16)
    assert args["dataset"] == "qm9_rdkit"
    assert np.isfinite(res["L1Loss"])


@pytest.mark.slow
def test_step_transformer_plain(env_data, tmp_path):
    args, res = _run("transformer.yml", tmp_path, batch_size=16, num_train=32)
    assert args["model_type"] == "TransformerPlain"
    assert np.isfinite(res["L1Loss"])


@pytest.mark.slow
def test_step_pcba_nan_masked_multitask(env_data, tmp_path):
    args, res = _run("pcba_tune_pna.yml", tmp_path,
                     batch_size=16, num_train=48)
    assert args["loss_func"] == "OGBNanLabelMSELoss"
    assert any(k.startswith("ogbg-molpcba") for k in res)


@pytest.mark.slow
def test_step_kl_multiple_positives(env_data, tmp_path):
    args, res = _run("contrastive_training_multiple_positives_kl_div_loss.yml",
                     tmp_path, batch_size=8, num_train=16)
    assert args["dataset"] == "qmugs"
    assert np.isfinite(res["KLDivergenceMultiplePositives"])


@pytest.mark.slow
def test_step_ot_pyg_in_memory(env_data, tmp_path):
    args, res = _run("ot_pyg_in_memory.yml", tmp_path, batch_size=2,
                     num_train=6, num_conformers=3)
    args2 = yaml.safe_load(open(os.path.join(CONFIG_DIR,
                                             "ot_pyg_in_memory.yml")))
    assert args2["dataset"] == "ot_pyg_geom_qm9"
    assert np.isfinite(res["MSELoss"])


@pytest.mark.slow
def test_step_random_conformer_pretrain(env_data, tmp_path):
    args, res = _run("12.yml", tmp_path, batch_size=8, num_train=24)
    assert "complete_graph_random_conformer" in \
        [str(r) for r in args["required_data"]]
    assert np.isfinite(res["NTXent"])


def test_conformer_collate_cap_consistency(env_data, tmp_path):
    """collate_params.num_conformers caps BOTH the packing and the bucket:
    the molecule-major [B*C] layout the multiple-positive losses reshape
    must tile exactly (a served-vs-packed mismatch would silently assign
    conformers to the wrong molecules)."""
    from infomax3d_tpu.cli.train import (build_dataset, make_loaders,
                                         resolve_collate, resolve_fast_paths)
    args = load_config(None, dict(
        dataset="drugs", batch_size=4, num_train=12, num_epochs=1,
        num_conformers=5, collate_function="ConformerCollate",
        collate_params={"num_conformers": 2},
        required_data=["dgl_graph", "conformations"],
        model_type="PNA", loss_func="NTXentMultiplePositives",
        logdir=str(tmp_path)))
    resolve_collate(args)
    ds = build_dataset(args)
    assert ds.num_conformers == 5          # served (cache stores 5)
    resolve_fast_paths(args)
    tr, _, _ = make_loaders(args, ds)
    b = next(iter(tr))
    g2, g3 = b["graph2d"], b["graph3d"]
    # bucket sized for the EFFECTIVE count (2): C = G3 / G2
    assert g3.graph_mask.shape[0] == 2 * g2.graph_mask.shape[0]
    # packing is molecule-major: graph slots 0,1 belong to molecule 0 —
    # real graphs fill the first 2*n_real slots contiguously
    n_real = int(np.asarray(g2.graph_mask).sum())
    assert int(np.asarray(g3.graph_mask).sum()) == 2 * n_real


@pytest.mark.slow
def test_step_dp_sharded_from_config(env_data, tmp_path):
    """`n_shards: 2` through the YAML->run_training path builds the mesh and
    trains on the virtual CPU devices (trainer-level DP equality lives in
    test_parallel.py; this proves the CLI wiring)."""
    args, res = _run("contrastive_training.yml", tmp_path,
                     batch_size=16, num_train=48, n_shards=2)
    assert np.isfinite(res["NTXent"])


@pytest.mark.slow
def test_step_edge_partitioned_from_config(env_data, tmp_path):
    """`graph_shards: 2` (edge-partitioned graph parallelism) through the
    same path — 2-axis (data, graph) mesh from the config."""
    args, res = _run("contrastive_training.yml", tmp_path,
                     batch_size=16, num_train=48, n_shards=2,
                     graph_shards=2)
    assert np.isfinite(res["NTXent"])


def test_bucket_ladder_wiring(env_data, tmp_path):
    """`bucket_ladder: true` routes plain flat collates through per-batch
    bucket selection (graphs/batch.py::make_bucket_ladder) and still
    trains."""
    from infomax3d_tpu.cli.train import (build_dataset, make_loaders,
                                         resolve_fast_paths)
    args = load_config(os.path.join(CONFIG_DIR, "gin_ogb.yml"), dict(
        num_epochs=1, patience=1, minimum_epochs=0, use_tensorboard=False,
        eval_per_epochs=0, log_iterations=-1, logdir=str(tmp_path),
        batch_size=16, multithreaded_seeds=[], pretrain_checkpoint=None,
        bucket_ladder=True, csr_buckets=False))
    ds = build_dataset(args)
    resolve_fast_paths(args)
    tr, _, _ = make_loaders(args, ds)
    assert tr.ladder and len(tr.ladder) >= 2 and tr.bucket is None
    b = next(iter(tr))
    assert "graph" in b
    res = train(args)
    assert any(k.startswith("ogbg-molpcba") for k in res)


@pytest.mark.slow
def test_step_ot_gin_virtualnode(env_data, tmp_path):
    """OT generation with the virtual-node GIN random backbone
    (configs/ot_gin.yml: gnn_model GNN_node_VirtualnodeRandom)."""
    args = load_config(os.path.join(CONFIG_DIR, "ot_gin.yml"), dict(
        num_epochs=1, patience=1, minimum_epochs=0, use_tensorboard=False,
        eval_per_epochs=0, log_iterations=-1, logdir=str(tmp_path),
        batch_size=2, num_train=6, num_conformers=3, multithreaded_seeds=[],
        pretrain_checkpoint=None))
    args["model_parameters"]["hyperparams"]["n_model_confs"] = 3
    args["model_parameters"]["hyperparams"]["n_true_confs"] = 3
    assert args["model_parameters"]["gnn_model"] == "GNN_node_VirtualnodeRandom"
    res = train(args)
    assert np.isfinite(res["MSELoss"])


@pytest.mark.slow
def test_step_tune_from_ot_transfer(env_data, tmp_path, capsys):
    """OT pre-train (GeomolGNNOGBFeat backbone) -> checkpoint -> transfer
    `gnn.` into GeomolGNNWrapperOGBFeat fine-tune on ogbg-molesol
    (configs/ot_geomol_gnn.yml -> configs/tune_from_ot_geomol_gnn.yml;
    reference transfer path train.py:207-231)."""
    pre = load_config(os.path.join(CONFIG_DIR, "ot_geomol_gnn.yml"), dict(
        num_epochs=1, patience=1, minimum_epochs=0, use_tensorboard=False,
        eval_per_epochs=0, log_iterations=-1, logdir=str(tmp_path / "pre"),
        batch_size=2, num_train=6, num_conformers=3, multithreaded_seeds=[],
        pretrain_checkpoint=None))
    pre["model_parameters"]["hyperparams"]["n_model_confs"] = 3
    pre["model_parameters"]["hyperparams"]["n_true_confs"] = 3
    # match the tune config's backbone width so the weights line up
    pre["model_parameters"]["gnn_params"] = dict(hidden_dim=25, depth=3,
                                                 n_layers=2)
    assert pre["model_parameters"]["gnn_model"] == "GeomolGNNOGBFeat"
    train(pre)
    ckpts = glob.glob(str(tmp_path / "pre" / "*" / "best_checkpoint.pt"))
    assert ckpts
    capsys.readouterr()
    args, res = _run("tune_from_ot_geomol_gnn.yml", tmp_path / "tune",
                     batch_size=16, pretrain_checkpoint=ckpts[0])
    assert args["transfer_layers"] == ["gnn."]
    assert any(k.startswith("ogbg-molesol") for k in res)
    # the dotted 'gnn.' token actually landed weights — and not just the
    # atom/bond encoder tables: the GeomolGNN message-passing stack under
    # the NESTED 'gnn' submodule must land too (the root-anchored rename
    # must not touch inner 'gnn' path elements).  12 encoder tables +
    # node/edge inits (3 Dense x 2 each) + edge model (3 lin + mlp) +
    # node model (2 mlps) + epsilons > 30 tensors.
    import re
    m = re.search(r"transferred (\d+) parameter tensors",
                  capsys.readouterr().out)
    assert m and int(m.group(1)) >= 30, (m and m.group(0))


@pytest.mark.slow
def test_step_net3d_distance_predictor(env_data, tmp_path):
    args, res = _run("net3d_info_experiment.yml", tmp_path,
                     batch_size=16, num_train=32)
    assert args["model_type"] == "Net3DDistancePredictor"
    assert np.isfinite(res["MSELoss"])
