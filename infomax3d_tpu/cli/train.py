"""Training entry point — the reference `train.py` CLI re-designed for TPU.

Usage:  python -m infomax3d_tpu.cli.train --config=configs_clean/pre-train_QM9.yml

Reference parity: YAML schema, dataset dispatch, split protocol
(`get_random_indices` with numpy seed 123, first 100k model pool, 10% test),
metric dictionary names, trainer selection, pre-trained-weight transfer with
substring filtering, multi-seed runs, test evaluation.  The `device` flag is
ignored (we run on whatever JAX platform is active); `dataset: synthetic`
runs everything without chemistry data.
"""
from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.data.splits import (
    get_idx_split, get_random_indices, reference_split_indices,
)
from infomax3d_tpu.utils.setup import enable_persistent_compilation_cache, seed_all


def build_metrics(args: Dict[str, Any], dataset=None) -> Dict[str, Any]:
    """Reference metrics_dict (train.py:237-269) + dataset-specific additions."""
    from infomax3d_tpu.train import metrics as M
    table = {
        "rsquared": M.Rsquared(),
        "mae": M.MAE(),
        "pearsonr": M.PearsonR(),
        "pcqm4m": M.PCQM4MEvaluatorWrapper(),
        "conformer_3d_variance": M.Conformer3DVariance(),
        "conformer_2d_variance": M.Conformer2DVariance(),
        "positive_similarity": M.PositiveSimilarity(),
        "positive_similarity_multiple_positives_separate2d":
            M.PositiveSimilarityMultiplePositivesSeparate2d(),
        "positive_prob": M.PositiveProb(),
        "negative_prob": M.NegativeProb(),
        "negative_similarity": M.NegativeSimilarity(),
        "negative_similarity_multiple_positives_separate2d":
            M.NegativeSimilarityMultiplePositivesSeparate2d(),
        "contrastive_accuracy": M.ContrastiveAccuracy(threshold=0.5009),
        "true_negative_rate": M.TrueNegativeRate(threshold=0.5009),
        "true_positive_rate": M.TruePositiveRate(threshold=0.5009),
        "uniformity": M.Uniformity(t=2),
        "alignment": M.Alignment(alpha=2),
        "batch_variance": M.BatchVariance(),
        "dimension_covariance": M.DimensionCovariance(),
    }
    ogb_metrics = {
        "ogbg-molhiv": ("rocauc", 1), "ogbg-molpcba": ("ap", 128),
        "ogbg-molbace": ("rocauc", 1), "ogbg-molbbbp": ("rocauc", 1),
        "ogbg-molclintox": ("rocauc", 2), "ogbg-moltoxcast": ("rocauc", 617),
        "ogbg-moltox21": ("rocauc", 12), "ogbg-mollipo": ("rmse", 1),
        "ogbg-molmuv": ("ap", 17), "ogbg-molsider": ("rocauc", 27),
        "ogbg-molfreesolv": ("rmse", 1), "ogbg-molesol": ("rmse", 1),
    }
    for name, (metric, tasks) in ogb_metrics.items():
        table[name] = M.OGBEvaluator(d_name=name, metric=metric, num_tasks=tasks)
    wanted = {}
    for name in args["metrics"]:
        if name == "mean_predictor_loss":
            # reference train.py:265: MeanPredictorLoss(loss_func(**params))
            from infomax3d_tpu.losses import get_loss
            wanted[name] = M.MeanPredictorLoss(
                get_loss(args["loss_func"], **(args.get("loss_params") or {})))
        elif name == "qm9_properties" and dataset is not None and \
                getattr(dataset, "targets_mean", None) is not None:
            # reference train.py:600-605: one denormalized-L1 per target task
            for ti, task in enumerate(getattr(dataset, "target_tasks", [])):
                wanted[task] = M.QM9SingleTargetDenormalizedL1(
                    task_index=ti, means=dataset.targets_mean,
                    stds=dataset.targets_std,
                    ev2mev=getattr(dataset, "ev2mev", None))
        elif name in table:
            wanted[name] = table[name]
        elif name == "mae_denormalized" and dataset is not None and \
                getattr(dataset, "targets_mean", None) is not None:
            wanted[name] = M.QM9DenormalizedL1(
                means=dataset.targets_mean, stds=dataset.targets_std,
                ev2mev=getattr(dataset, "ev2mev", None))
        elif name == "mse_denormalized" and dataset is not None and \
                getattr(dataset, "targets_mean", None) is not None:
            wanted[name] = M.QM9DenormalizedL2(
                means=dataset.targets_mean, stds=dataset.targets_std,
                ev2mev=getattr(dataset, "ev2mev", None))
    if args["main_metric"] == "mae_denormalized" and \
            "mae_denormalized" not in wanted and dataset is not None and \
            getattr(dataset, "targets_mean", None) is not None:
        from infomax3d_tpu.train.metrics import QM9DenormalizedL1
        wanted["mae_denormalized"] = QM9DenormalizedL1(
            means=dataset.targets_mean, stds=dataset.targets_std,
            ev2mev=getattr(dataset, "ev2mev", None))
    return wanted


# all geomol fine-tune dataset names the reference dispatches
# (train.py:290-312)
GEOMOL_FINETUNE_SETS = (
    "bace_geomol", "bbbp_geomol", "bace_geomol_random", "bbbp_geomol_random",
    "esol_geomol", "lipo_geomol", "bace_geomol_qm9_featurization",
    "bbbp_geomol_qm9_featurization", "esol_geomol_qm9_featurization",
    "lipo_geomol_qm9_featurization",
)


def build_dataset(args: Dict[str, Any]):
    """Dataset dispatch, name-compatible with the reference
    (`train.py:271-287` routing into the per-family drivers
    `train.py:289-612`).  Every family resolves to a prebuilt flat .npz
    cache under $INFOMAX3D_DATA (built by data/preprocess.py); the
    file_loader_* names stream GEOM pickles directly when RDKit is present
    (data/file_loader.py), else fall back to their cache."""
    from infomax3d_tpu.data.cached import (
        CachedMoleculeDataset, GeomolFineTuneDataset, QM9Dataset,
        SyntheticDataset,
    )
    name = args["dataset"]
    if name == "molhiv":
        # configs/pna_original_simple_molhiv.yml — falls through every
        # branch of the reference's routing (train.py:271-286, returns
        # None); evident intent is the ogbg-molhiv benchmark
        name = args["dataset"] = "ogbg-molhiv"
    params = dict(args.get("dataset_params") or {})
    data_dir = os.environ.get("INFOMAX3D_DATA", "dataset")
    needs_conformers = any("conform" in str(r) for r in args["required_data"]) \
        or "conformer" in args["collate_function"].lower()
    n_conf = args["num_conformers"] if needs_conformers else 1
    if needs_conformers:
        # configs may size the conformer set on the collate instead
        # (configs/contrastive_training_multiple_positives.yml:
        # collate_params.num_conformers)
        n_conf = max(n_conf,
                     int((args.get("collate_params") or {})
                         .get("num_conformers", 0)))
    if any(str(r) == "complete_graph_random_conformer"
           for r in args["required_data"]):
        # reference qmugs_dataset.py:187-193 — one uniformly sampled stored
        # conformer per access (multi-conformer contrastive augmentation)
        params.setdefault("random_conformer", True)
        n_conf = 1
    if name == "synthetic":
        params.setdefault("num", 2000)
        params.setdefault("num_targets", max(len(args["targets"]), 1))
        params.setdefault("num_conformers", n_conf)
        return SyntheticDataset(**params)
    if name in GEOMOL_FINETUNE_SETS:
        return GeomolFineTuneDataset(
            os.path.join(data_dir, name, "processed.npz"), name)
    if name in ("qm9", "qm9_rdkit", "qm9_neuralconf"):
        # qm9_rdkit/_neuralconf differ only in where the conformers came
        # from (reference qm9_dataset_rdkit_conformers.py /
        # _geomol_conformers.py) -> separate caches, same serving code
        sub = {"qm9": "QM9", "qm9_rdkit": "QM9_rdkit",
               "qm9_neuralconf": "QM9_neuralconf"}[name]
        return QM9Dataset(os.path.join(data_dir, sub, "processed.npz"),
                          target_tasks=args["targets"] or ["homo"],
                          num_conformers=n_conf)
    if name in ("qm9_geomol_feat", "qm9_geomol"):
        # GeoMol featurization of QM9 (reference qm9_geomol_featurization.py)
        # — float chemprop-style features stored in the cache itself
        return QM9Dataset(os.path.join(data_dir, "qm9_geomol", "processed.npz"),
                          target_tasks=args["targets"] or ["homo"],
                          num_conformers=n_conf)
    if name in ("file_loader_qm9", "file_loader_drugs", "ot_pyg_geom_qm9"):
        # ot_pyg_geom_qm9 (reference datasets/pyg_geomol_geom_qm9.py) is the
        # in-memory variant of file_loader_qm9: same GEOM-QM9 pickles, same
        # GeoMol featurization — one serving path here
        pickle_root = os.path.join(
            data_dir, "GEOM_drugs" if name.endswith("drugs") else "GEOM_qm9")
        try:
            from infomax3d_tpu.data.file_loader import GeomFileLoader
            if os.path.exists(os.path.join(
                    pickle_root,
                    f"summary_{'qm9' if name.endswith('qm9') else 'drugs'}.json")):
                return GeomFileLoader(
                    pickle_root,
                    split="qm9" if name.endswith("qm9") else "drugs",
                    num_conformers=args["num_conformers"], **params)
        except ImportError:
            pass
        return CachedMoleculeDataset(
            os.path.join(data_dir, name, "processed.npz"),
            num_conformers=args["num_conformers"], **params)
    cache_names = {"qmugs": "QMugs", "drugs": "GEOM_Drugs",
                   "geom_qm9": "GEOM_QM9", "zinc": "ZINC"}
    if name in cache_names:
        return CachedMoleculeDataset(
            os.path.join(data_dir, cache_names[name], "processed.npz"),
            num_conformers=n_conf, **params)
    if name.startswith("ogbg") or name == "pcqm4m":
        return CachedMoleculeDataset(
            os.path.join(data_dir, name.replace("-", "_"), "processed.npz"),
            **params)
    raise KeyError(f"unknown dataset '{name}'")


def apply_dataset_protocol(args: Dict[str, Any], dataset) -> None:
    """Per-family arg mutations the reference drivers perform before
    building the trainer:

    * ogbg (`train.py:448-452`): main_metric = dataset name (OGB
      evaluator), whole-epoch metric eval, goal min iff rmse.
    * geomol fine-tune sets (`train.py:340-344`): main_metric = the
      matching ogbg-mol* evaluator.
    * pcqm4m (`train.py:419-421`): main_metric = pcqm4m MAE, goal min.
    """
    name = args["dataset"]
    if name.startswith("ogbg"):
        if name not in args["metrics"]:
            args["metrics"] = list(args["metrics"]) + [name]
        args["main_metric"] = name
        args["val_per_batch"] = False
        rmse = name in ("ogbg-mollipo", "ogbg-molfreesolv", "ogbg-molesol")
        args["main_metric_goal"] = "min" if rmse else "max"
    elif name in GEOMOL_FINETUNE_SETS:
        metric_name = dataset.ogb_metric_name
        if metric_name not in args["metrics"]:
            args["metrics"] = list(args["metrics"]) + [metric_name]
        args["main_metric"] = metric_name
        args["val_per_batch"] = False
        rmse = metric_name in ("ogbg-mollipo", "ogbg-molfreesolv",
                               "ogbg-molesol")
        args["main_metric_goal"] = "min" if rmse else "max"
    elif name == "pcqm4m":
        if "pcqm4m" not in args["metrics"]:
            args["metrics"] = list(args["metrics"]) + ["pcqm4m"]
        args["main_metric"] = "pcqm4m"
        args["main_metric_goal"] = "min"


def resolve_fast_paths(args: Dict[str, Any]) -> None:
    """Resolve the TPU fast-path knobs once (consumed by build_models and
    make_loaders):

    * ``csr_buckets``: 'auto' | True | False — receiver-sorted CSR buckets
      engage the Pallas fused aggregation kernel (ops/pallas/spmm.py) for
      flat-graph collates.  'auto' = on for non-CPU backends.
    * ``dense_3d``: 'auto' | True | False — the 3D contrastive side uses the
      dense complete-graph layout + Net3DDense (scatter-free; parameters are
      interchangeable with Net3D).  'auto' = on for non-CPU backends when
      model3d_type is Net3D and the collate is contrastive_collate.
    """
    import jax
    on_accel = jax.default_backend() != "cpu"
    if args.get("graph_shards", 1) > 1 or args.get("node_shards", 1) > 1:
        # edge-partitioned mode shards the FLAT edge arrays inside the step
        # (parallel/edge_partition.py drops csr/mailbox extras at trace
        # time) and Net3DDense's [G, M, M] layout has no flat edge axis —
        # keep both fast paths off so every model runs the XLA segment path
        # that carries the psum completion.  Node-sharded mode
        # (parallel/node_partition.py) likewise: its local indices replace
        # the full-ordering csr/mailbox extras, and its receiver-owned
        # reductions ride the same XLA segment path (completing locally).
        args["csr_buckets"] = False
        args["dense_3d"] = False
    csr = args.get("csr_buckets", "auto")
    flat_collates = {
        "graph_collate", "graph_only_collate", "contrastive_collate",
        "contrastive_collate_ae", "conformer_collate", "graphcl_collate",
        "node_drop_3d_collate", "node_drop_2d3d_collate",
        "noised_distances_collate", "noised_coordinates_collate",
    }
    args["_csr"] = (csr is True or (csr == "auto" and on_accel)) and \
        args.get("collate_function") in flat_collates
    d3 = args.get("dense_3d", "auto")
    eligible = (args.get("model3d_type") in ("Net3D", "Net3DDense") and
                args.get("collate_function") == "contrastive_collate")
    args["_dense_3d"] = (d3 is True or (d3 == "auto" and on_accel)) and eligible


def _adapt_model_params(cls, mp: Dict[str, Any], dataset=None) -> Dict[str, Any]:
    """Reference configs carry dims flax infers (node_dim/edge_dim/
    hidden_edge_dim, set programmatically by reference train.py:166-231) and
    assorted stale keys — every reference model constructor takes **kwargs
    and silently swallows unknowns (e.g. `models/pna_original.py:124`
    ignores `readout_batchnorm` from configs/pna_original_molhiv.yml), so
    unknown keys are dropped here with the same semantics.  When a declared
    dim field isn't in the config, infer it from the data like the reference
    does (`train_geomol` passes node_dim=data[0][0].z.shape[1])."""
    import dataclasses
    mp = dict(mp)
    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
        mp = {k: v for k, v in mp.items() if k in fields}
    else:
        fields = set()
    if dataset is not None and ("node_dim" in fields or "edge_dim" in fields):
        try:
            g0 = dataset[0]["graph2d"]
            if "node_dim" in fields and "node_dim" not in mp \
                    and g0["node_feat"].ndim == 2:
                mp["node_dim"] = int(g0["node_feat"].shape[1])
            if "edge_dim" in fields and "edge_dim" not in mp \
                    and g0.get("edge_feat") is not None \
                    and g0["edge_feat"].ndim == 2:
                mp["edge_dim"] = int(g0["edge_feat"].shape[1])
        except (KeyError, IndexError, TypeError):
            pass
    return mp


def build_models(args: Dict[str, Any], dataset=None) -> Dict[str, Any]:
    from infomax3d_tpu.models import get_model_class
    models: Dict[str, Any] = {}
    from infomax3d_tpu.models import BYOLWrapper

    def _byol_wrap(type_name, params, ds=None):
        """BYOL configs name the wrapper itself as the model
        (configs/byol.yml: model_type 'BYOLwrapper' with the wrapped
        model_type/model_parameters nested inside, reference
        trainer/byol_wrapper.py:17-29); build the wrapper around the
        inner class with both parameter dicts adapted."""
        inner_type = params.get("model_type", type_name)
        inner = _adapt_model_params(get_model_class(inner_type),
                                    params.get("model_parameters") or
                                    ({} if inner_type != type_name else params),
                                    ds)
        wp = _adapt_model_params(BYOLWrapper, params)
        wp.update(model_type=inner_type, model_parameters=inner)
        return BYOLWrapper(**wp)

    model_cls = get_model_class(args["model_type"])
    if args["model_type"] == "BYOLwrapper" or (args["trainer"] == "byol" and
                                               model_cls is not BYOLWrapper):
        models["model"] = _byol_wrap(args["model_type"],
                                     args.get("model_parameters") or {},
                                     dataset)
    else:
        mp = _adapt_model_params(model_cls, args.get("model_parameters") or {},
                                 dataset)
        models["model"] = model_cls(**mp)
    if args.get("model3d_type"):
        from infomax3d_tpu.models import get_model_class as _g
        if args["model3d_type"] == "BYOLwrapper" or \
                (args["trainer"] == "byol" and
                 _g(args["model3d_type"]) is not BYOLWrapper):
            models["model3d"] = _byol_wrap(args["model3d_type"],
                                           args.get("model3d_parameters") or {})
        else:
            m3_cls = _g(args["model3d_type"])
            mp3 = _adapt_model_params(m3_cls,
                                      args.get("model3d_parameters") or {})
            # reference builds every 3D net with node_dim=0 (no input node
            # features) and edge_dim = the distance width (train.py:166-171)
            import dataclasses as _dc
            f3 = {f.name for f in _dc.fields(m3_cls)} \
                if _dc.is_dataclass(m3_cls) else set()
            if "node_dim" in f3:
                mp3.setdefault("node_dim", 0)
            if "edge_dim" in f3:
                mp3.setdefault("edge_dim", 1)
            m3_type = args["model3d_type"]
            if args.get("_dense_3d") and m3_type == "Net3D":
                m3_type = "Net3DDense"       # parameter-compatible fast path
            models["model3d"] = get_model_class(m3_type)(**mp3)
    if args.get("critic_type"):
        cp = dict(args.get("critic_parameters") or {})
        models["critic"] = get_model_class(args["critic_type"])(**cp)
    return models


def transfer_pretrained(state, args: Dict[str, Any]):
    """Pre-trained weight transfer (reference load_model, train.py:207-231):
    copy parameters whose tree path contains any `transfer_layers` substring
    and none of `exclude_from_transfer`; BYOL 'student' prefixes stripped;
    `transfer_3d` loads the 3D network's weights instead."""
    from flax import serialization
    from flax.traverse_util import flatten_dict, unflatten_dict
    import jax.numpy as jnp

    from infomax3d_tpu.train import torch_interop

    if torch_interop.is_torch_checkpoint(args["pretrain_checkpoint"]):
        # reference-format .pt checkpoint (trainer.py:252-280 payload):
        # convert the torch state_dict onto this state's flax tree; the
        # root renames happen on the torch key strings, then the same
        # transfer_layers filtering below applies unchanged
        payload = torch_interop.load_torch_payload(args["pretrain_checkpoint"])
        sd_key = ("model3d_state_dict" if args.get("transfer_3d")
                  else "model_state_dict")
        sd = torch_interop.rename_torch_keys(payload.get(sd_key) or {})
        renamed, flat_sstats_t, _ = torch_interop.convert_state_dict(
            sd, flatten_dict(state.params["model"]),
            flatten_dict(state.batch_stats.get("model", {})), verbose=True)
        raw = None
    else:
        with open(args["pretrain_checkpoint"], "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        src_key = "model3d" if args.get("transfer_3d") else "model"
        src = raw.get("params", {}).get(src_key, {})
        if "student" in src:                       # BYOL wrapper checkpoint
            src = src["student"]
        flat_src = flatten_dict(src)
        # reference renames '^gnn.'/'^gnn2.' -> 'node_gnn.' (train.py:220 —
        # ANCHORED at the root: a nested 'gnn' submodule like the Geomol
        # backbone's keeps its name)
        renamed = {}
        for path, v in flat_src.items():
            if path and path[0] in ("gnn", "gnn2"):
                path = ("node_gnn",) + path[1:]
            renamed[path] = v
    # reference tokens are substrings of torch's dot-joined names
    # (configs/tune_from_ot_geomol_gnn.yml: 'gnn.'); our paths join with '/'
    transfer = [t.replace(".", "/") for t in (args["transfer_layers"] or [])]
    exclude = [t.replace(".", "/") for t in
               (args["exclude_from_transfer"] or [])] + ["teacher"]
    params = state.params
    flat_dst = flatten_dict(params["model"])
    n_hit = 0
    for path, v in flat_dst.items():
        s = "/".join(path)
        # reference BN modules are attributes named 'batch_norm'
        # (base_layers.py:83) — spell ours the same way so config tokens
        # like exclude_from_transfer: [batch_norm] keep their meaning
        s = s + "|" + s.replace("MaskedBatchNorm", "batch_norm")
        if any(t in s for t in transfer) and not any(x in s for x in exclude):
            if path in renamed and renamed[path].shape == v.shape:
                flat_dst[path] = jnp.asarray(renamed[path])
                n_hit += 1
    print(f"transferred {n_hit} parameter tensors from "
          f"{args['pretrain_checkpoint']}")
    params = dict(params)
    params["model"] = unflatten_dict(flat_dst)
    # transfer batch stats for the same subtrees
    if raw is None:                            # torch checkpoint path
        flat_sstats = flat_sstats_t
    else:
        src_stats = raw.get("batch_stats", {}).get(src_key, {})
        if "student" in src_stats:
            src_stats = src_stats["student"]
        flat_sstats = {(("node_gnn",) + k[1:] if k and k[0] in ("gnn", "gnn2")
                        else k): v
                       for k, v in flatten_dict(src_stats).items()}
    bstats = dict(state.batch_stats)
    flat_bdst = flatten_dict(bstats["model"])
    for path, v in flat_bdst.items():
        s = "/".join(path)
        s = s + "|" + s.replace("MaskedBatchNorm", "batch_norm")
        if any(t in s for t in transfer) and not any(x in s for x in exclude):
            if path in flat_sstats and flat_sstats[path].shape == v.shape:
                flat_bdst[path] = jnp.asarray(flat_sstats[path])
    bstats["model"] = unflatten_dict(flat_bdst)
    return state.replace(params=params, batch_stats=bstats)


def make_splits(args: Dict[str, Any], dataset):
    """(train_idx, val_idx, test_idx) per the reference's per-family
    protocol: scaffold `get_idx_split` for OGB sets (train.py:428-440),
    stored splits for pre-split sets (ZINC, geomol fine-tune, pcqm4m),
    family-parameterized random splits otherwise (data/splits.py)."""
    name = args["dataset"]
    n = len(dataset)
    if name.startswith("ogbg"):
        split = get_idx_split(dataset, getattr(dataset, "cache_dir", None))
        if args.get("force_random_split"):
            # reference train.py:436-440 re-randomizes keeping the scaffold
            # split's sizes (upstream assigns split_idx['train'] three times
            # — a bug; we implement the evident intent, COVERAGE.md dev.#7)
            all_idx = get_random_indices(n, args["seed_data"])
            nt, nv = len(split["train"]), len(split["valid"])
            split = {"train": all_idx[:nt], "valid": all_idx[nt:nt + nv],
                     "test": all_idx[nt + nv:]}
        return split["train"], split["valid"], split["test"]
    stored = getattr(dataset, "split_indices", None)
    if stored:
        tr = stored["train"]
        if name == "pcqm4m" and args["num_train"] > 0:
            tr = tr[: args["num_train"]]     # reference train.py:402
        return tr, stored["valid"], stored["test"]
    return reference_split_indices(args, n)


def make_loaders(args: Dict[str, Any], dataset, mesh=None):
    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.graphs.batch import BucketSpec

    train_idx, val_idx, test_idx = make_splits(args, dataset)

    bs = args["batch_size"]
    nodes = dataset.node_counts()
    mean_nodes = float(nodes.mean())
    max_n = int(nodes.max())

    def _cap(per_mol, granularity, slack=1.1, n_sigma=5.0):
        """Static bucket size covering a random batch of `bs` molecules with
        overwhelming probability: mean + n_sigma x batch std + one max-size
        molecule, rounded up to the XLA-friendly granularity."""
        per_mol = np.asarray(per_mol, np.float64)
        need = (bs * per_mol.mean() * slack
                + n_sigma * np.sqrt(bs) * per_mol.std() + per_mol.max())
        return int(np.ceil(need / granularity) * granularity)

    n_cap = _cap(nodes, 256)
    e2_cap = _cap(dataset.edge_counts(), 512)
    e3_cap = _cap(nodes * (nodes - 1), 2048)
    if args.get("_csr") and hasattr(dataset, "max_in_degree"):
        bucket = BucketSpec(bs, n_cap, e2_cap,
                            max_deg=int(dataset.max_in_degree()), csr=True,
                            nmax=max_n)
    else:
        bucket = BucketSpec(bs, n_cap, e2_cap, nmax=max_n)
    bucket3d = BucketSpec(bs, n_cap, e3_cap, nmax=max_n)

    collate = args["collate_function"]
    ckw = dict(args.get("collate_params") or {})
    if collate == "smp_collate":
        # the radius graph (cutoff 5 Å, reference
        # spherical_message_passing.py:271) is denser than the bond graph
        # but usually far sparser than the complete graph — measure a
        # sample's edge/triplet counts and size with 2x headroom instead of
        # the O(n^3) worst case (a tail batch that still overflows raises
        # 'triplet bucket too small': set collate_params.n_triplets)
        from infomax3d_tpu.data.smp_featurize import smp_featurize
        cutoff = float(ckw.get("cutoff", 5.0))
        sample = np.linspace(0, len(dataset) - 1,
                             num=min(32, len(dataset))).astype(int)
        se, st = [], []
        for i in sample:
            it = dataset[int(i)]
            mol = it["graph2d"] if "coords" in it["graph2d"] else it["graph3d"]
            f = smp_featurize(mol["coords"], cutoff=cutoff)
            se.append(len(f["senders"]))
            st.append(int(f["tri_count"]))
        e_smp = _cap(np.asarray(se, np.float64), 512, slack=2.0)
        bucket = BucketSpec(bs, n_cap, min(e_smp, e3_cap), nmax=max_n)
        ckw.setdefault("n_triplets",
                       int(_cap(np.asarray(st, np.float64), 2048, slack=2.0)))
    contrastive = collate in ("contrastive_collate", "conformer_collate",
                              "contrastive_collate_ae")
    if collate == "conformer_collate":
        # ONE effective conformer count for the packing AND the bucket: the
        # served count (dataset clamps to what the cache stores) further
        # capped by collate_params.num_conformers — a mismatch would break
        # the molecule-major [B*C] packing the multi-positive losses reshape
        C = max(int(getattr(dataset, "num_conformers",
                            args["num_conformers"])), 1)
        if ckw.get("num_conformers"):
            C = min(C, int(ckw["num_conformers"]))
        ckw["num_conformers"] = C
        ckw.setdefault("bucket3d", BucketSpec(bs * C, n_cap * C, e3_cap * C))
    elif contrastive or collate == "pairwise_distance_collate":
        ckw.setdefault("bucket3d", bucket3d)
        if collate == "pairwise_distance_collate" and any(
                str(r) == "complete_graph3d" for r in args["required_data"]):
            ckw.setdefault("graph_3d", True)
    if args.get("_dense_3d") and collate == "contrastive_collate":
        ckw.setdefault("dense_3d", True)
        ckw.setdefault("max_nodes3d", max_n)
    if collate in ("san_collate", "padded_collate_positional_encoding",
                   "egnn_padded_collate", "molhiv_padded_collate"):
        ckw.setdefault("max_nodes", max(args["max_nodes"], max_n))
    if collate == "ot_collate":
        # the OT model's conformer-count hyperparams size the batch arrays
        # (reference pre-train_Optimal_Transport_baseline.yml:66-75)
        hp = (args.get("model_parameters") or {}).get("hyperparams") or {}
        ckw.setdefault("n_true_confs",
                       int(hp.get("n_true_confs", args["num_conformers"])))
    n_shards = args.get("n_shards", 1)

    # `bucket_ladder: true` picks a per-batch bucket from a small ladder of
    # static shapes (graphs/batch.py::make_bucket_ladder) instead of one
    # worst-case bucket — less padding per step at the cost of a few extra
    # XLA compiles.  Only for the plain flat collates (the csr fast path and
    # the multi-view collates carry fixed per-bucket extras).
    ladder = None
    if args.get("bucket_ladder") and not args.get("_csr") and \
            collate in ("graph_collate", "graph_only_collate") and \
            n_shards == 1:
        from infomax3d_tpu.graphs.batch import make_bucket_ladder
        ladder = make_bucket_ladder(bs, nodes, dataset.edge_counts(),
                                    nmax=max_n)
        bucket = None

    node_shards = args.get("node_shards", 1)
    if node_shards > 1:
        # node-sharded mode (parallel/node_partition.py): re-emit every
        # GraphBatch as a [k, ...] shard stack.  Pads are STATIC per bucket
        # so all batches of a bucket share one XLA compilation: per-shard
        # edges at 1.5x the even split (whole-molecule contiguous ranges
        # imbalance mildly), halo at one max-size molecule per round (a
        # contiguous range cuts at most one molecule per boundary).
        # Overridable via node_el_pad / node_halo_pad on overflow.
        from infomax3d_tpu.data.loader import get_collate
        from infomax3d_tpu.graphs.batch import GraphBatch
        from infomax3d_tpu.parallel.node_partition import shard_graph_batch
        base_collate = collate if callable(collate) else get_collate(collate)
        halo_pad = int(args.get("node_halo_pad") or
                       int(np.ceil(max_n / 8) * 8))

        def _shard(v):
            if not isinstance(v, GraphBatch):
                return v
            el_pad = int(args.get("node_el_pad") or
                         int(np.ceil(v.num_edges * 1.5 / node_shards / 8) * 8))
            return shard_graph_batch(v, node_shards, el_pad, halo_pad)

        def node_collate(items, *cargs, **kw):
            import jax
            return jax.tree_util.tree_map(
                _shard, base_collate(items, *cargs, **kw),
                is_leaf=lambda v: isinstance(v, GraphBatch))

        collate = node_collate

    def mk(indices, shuffle, seed, batch_sampler=None):
        return GraphDataLoader(dataset, bs, collate, bucket=bucket,
                               shuffle=shuffle, drop_last=contrastive,
                               seed=seed, indices=indices, ladder=ladder,
                               collate_kwargs=ckw, n_shards=n_shards,
                               batch_sampler=batch_sampler)

    sampler = None
    if args.get("train_sampler"):
        # reference train.py:470-473/535-540: the train loader uses a
        # size-clustered batch sampler (ConstantNumberAtomsCategorical /
        # Chunks) — on TPU this doubles as the padding minimizer
        from infomax3d_tpu.data import samplers as S
        sampler_cls = getattr(S, args["train_sampler"], None)
        if sampler_cls is None:
            raise KeyError(f"unknown train_sampler '{args['train_sampler']}'")
        sampler = sampler_cls(dataset.node_counts(), bs, indices=train_idx,
                              seed=args["seed"],
                              drop_last=contrastive or n_shards > 1)

    return (mk(train_idx, True, args["seed"], batch_sampler=sampler),
            mk(val_idx, False, args["seed"] + 1),
            mk(test_idx, False, args["seed"] + 2))


def resolve_collate(args: Dict[str, Any]) -> None:
    """Canonicalize the config's collate name and apply the routing rules
    the reference encodes in its dataset return types:

    * reference YAML collate aliases -> canonical registry names,
    * `san_graph` in required_data keeps graph_collate upstream because the
      dataset return type already carries the LapPE (qm9_dataset.py:
      285-304); here the LapPE assembly lives in san_collate,
    * OT configs batch raw pyg Data whose GeoMol featurization rides along
      (pyg_graph_only_collate, configs/ot_geomol_gnn.yml); here the
      neighborhood/dihedral index arrays are assembled by ot_collate,
    * reference SMP extracts triplets on-device (spherical_encoding.py:
      276-330); here triplet/angle featurization is host-side in
      smp_collate (data/smp_featurize.py)."""
    from infomax3d_tpu.data.loader import COLLATE_ALIASES
    args["collate_function"] = COLLATE_ALIASES.get(
        args["collate_function"], args["collate_function"])
    if any(str(r) == "san_graph" for r in args["required_data"]) and \
            args["collate_function"] == "graph_collate":
        args["collate_function"] = "san_collate"
    if args["trainer"] == "optimal_transport" and \
            args["collate_function"] in ("graph_only_collate",
                                         "graph_collate"):
        args["collate_function"] = "ot_collate"
    if args["model_type"] == "SMP" and \
            args["collate_function"] == "graph_collate":
        args["collate_function"] = "smp_collate"


def run_training(args: Dict[str, Any]) -> Dict[str, float]:
    import jax
    enable_persistent_compilation_cache()
    seed_all(args["seed"])
    from infomax3d_tpu.losses import get_loss
    from infomax3d_tpu.train.trainer import TRAINER_REGISTRY

    resolve_collate(args)
    dataset = build_dataset(args)
    apply_dataset_protocol(args, dataset)
    metrics = build_metrics(args, dataset)
    resolve_fast_paths(args)
    models = build_models(args, dataset)

    mesh = None
    tp_mesh = None
    n_shards = args.get("n_shards", 1)
    graph_shards = args.get("graph_shards", 1)
    node_shards = args.get("node_shards", 1)
    model_shards = args.get("model_shards", 1)
    if graph_shards > 1 and node_shards > 1:
        raise ValueError("graph_shards (edge partitioning) and node_shards "
                         "(node-sharded halo partitioning) both claim the "
                         "'graph' mesh axis — pick one")
    if node_shards > 1:
        if args.get("collate_function") not in (
                "graph_collate", "graph_only_collate", "contrastive_collate",
                "contrastive_collate_ae", "conformer_collate"):
            raise ValueError("node_shards currently supports the pure-"
                             "GraphBatch collates (graph_collate, "
                             "graph_only_collate, contrastive_collate[_ae], "
                             "conformer_collate)")
        if (args.get("model_parameters") or {}).get("pairwise_distances"):
            raise NotImplementedError(
                "node_shards: PNA pairwise_distances gathers coords by "
                "sender inside the model (models/pna.py) — ghost "
                "coordinates are not exchanged on that path yet")
    if model_shards > 1:
        # tensor parallelism (parallel/tp.py): params column-sharded over a
        # (data, model) mesh's 'model' axis, GSPMD propagates the layout.
        # Composes with data parallelism on ONE (n_shards, model_shards)
        # mesh: the trainer's shard_map step is manual over 'data' only
        # (axis_names) while 'model' stays auto for GSPMD.  The graph-
        # partitioned modes still exclude it (three-axis meshes untested).
        if graph_shards > 1 or node_shards > 1:
            raise ValueError("model_shards cannot combine with graph_shards/"
                             "node_shards — pick one graph-parallel mode")
        from infomax3d_tpu.parallel.tp import make_tp_mesh
        tp_mesh = make_tp_mesh(n_shards, model_shards)
        if n_shards > 1:
            mesh = tp_mesh
    elif n_shards > 1 or graph_shards > 1 or node_shards > 1:
        from infomax3d_tpu.parallel import make_mesh
        k = graph_shards if graph_shards > 1 else node_shards
        if k > 1:
            # (data, graph) mesh: DP over 'data'; over 'graph' either
            # edge-partitioned parallelism (parallel/edge_partition.py —
            # node arrays replicated) or node-sharded halo partitioning
            # (parallel/node_partition.py — per-device arrays ~1/k), for
            # models whose edge->node aggregation routes through
            # ops.mailbox.edge_aggregate / pna_aggregate (PNA family,
            # Net3D, GIN/GCN, EGNN)
            mesh = make_mesh(n_shards * k,
                             axis_names=("data", "graph"),
                             shape=(n_shards, k))
        else:
            mesh = make_mesh(n_shards)

    loss_name = args["loss_func"]
    supervised_losses = ("L1Loss", "MSELoss", "BCEWithLogitsLoss",
                         "OGBNanLabelBCEWithLogitsLoss", "OGBNanLabelMSELoss")
    loss_func = None if loss_name in supervised_losses else \
        get_loss(loss_name, **(args.get("loss_params") or {}))

    # reference get_trainer (train.py:166-204): the SSL trainer flavor only
    # applies when a 3D model exists; otherwise the base supervised Trainer
    # (or graphcl / distance_predictor)
    if args.get("model3d_type"):
        trainer_cls = TRAINER_REGISTRY[args["trainer"]]
    elif args["trainer"] in ("graphcl_trainer", "distance_predictor",
                             "optimal_transport"):
        trainer_cls = TRAINER_REGISTRY[args["trainer"]]
    elif args["collate_function"] == "pairwise_distance_collate":
        # reference runs DistancePredictor pre-train through the plain
        # Trainer whose forward unpacks the (graph, pairs) tuple
        # (train.py:199, models/distance_predictor.py); our batch-dict
        # equivalent lives in DistancePredictorTrainer
        trainer_cls = TRAINER_REGISTRY["distance_predictor"]
    else:
        trainer_cls = TRAINER_REGISTRY["default"]
    run_dir = os.path.join(
        args["logdir"],
        f"{args['model_type']}_{args['dataset']}_{args['experiment_name']}_"
        f"{args['seed']}_{datetime.now().strftime('%d-%m_%H-%M-%S')}")
    # second-resolution names collide for same-seed runs launched together
    # (the reference would share the dir and race its checkpoints); claim a
    # unique dir atomically
    base_run_dir, n_dup = run_dir, 1
    while True:
        try:
            os.makedirs(run_dir)
            break
        except FileExistsError:
            run_dir = f"{base_run_dir}_{n_dup}"
            n_dup += 1
    kw: Dict[str, Any] = {}
    if args["trainer"] == "philosophy":
        kw["critic_loss"] = get_loss(args["critic_loss"],
                                     **(args.get("critic_loss_params") or {}))
    if args["trainer"] == "byol":
        kw["ma_decay"] = (args.get("model_parameters") or {}).get("ma_decay", 0.99)
        # reference-exact default: EMA only the 2D teacher
        # (byol_trainer.py:24); `byol_ema_all: true` updates both
        kw["ema_all"] = bool(args.get("byol_ema_all", False))
    trainer = trainer_cls(
        models, args, metrics=metrics, main_metric=args["main_metric"],
        run_dir=run_dir, loss_func=loss_func, loss_name=loss_name,
        main_metric_goal=args["main_metric_goal"],
        scheduler_step_per_batch=args["scheduler_step_per_batch"],
        seed=args["seed"], mesh=mesh, tp_mesh=tp_mesh,
        use_tensorboard=args.get("use_tensorboard", True))

    train_loader, val_loader, test_loader = make_loaders(args, dataset, mesh)
    if args.get("pretrain_checkpoint"):
        first = trainer.single_shard(next(iter(train_loader)))
        trainer.init_state(first)
        trainer.state = transfer_pretrained(trainer.state, args)

    val_metrics = trainer.train(train_loader, val_loader)
    result = dict(val_metrics)
    if args["eval_on_test"] and len(test_loader.indices) > 0:
        test_metrics = trainer.evaluation(test_loader, "test")
        result.update({f"test_{k}": v for k, v in test_metrics.items()})
    return result


def train(args: Dict[str, Any]):
    """Reference __main__ behavior incl. multi-seed thread pool
    (train.py:647-698)."""
    seeds = args.get("multithreaded_seeds") or []
    if seeds:
        results = []
        with ThreadPoolExecutor(max_workers=len(seeds)) as ex:
            futures = []
            for s in seeds:
                a = dict(args)
                a["seed"] = s
                a["multithreaded_seeds"] = []
                futures.append(ex.submit(run_training, a))
            results = [f.result() for f in futures]
        agg = {}
        keys = set().union(*[r.keys() for r in results])
        for k in keys:
            vals = np.array([r[k] for r in results if k in r], dtype=np.float64)
            agg[f"{k}_mean"] = float(np.nanmean(vals))
            agg[f"{k}_std"] = float(np.nanstd(vals))
            agg[f"{k}_stderr"] = float(np.nanstd(vals) / np.sqrt(len(vals)))
        out_path = os.path.join(args["logdir"],
                                "multiple_seed_validation_statistics.txt")
        os.makedirs(args["logdir"], exist_ok=True)
        with open(out_path, "w") as f:
            for k in sorted(agg):
                f.write(f"{k}: {agg[k]}\n")
        print(agg)
        return agg
    return run_training(args)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    known, unknown = p.parse_known_args(argv)
    overrides: Dict[str, Any] = {}
    if known.checkpoint:
        overrides["checkpoint"] = known.checkpoint
    for tok in unknown:
        if tok.startswith("--") and "=" in tok:
            k, v = tok[2:].split("=", 1)
            try:
                import ast
                overrides[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                overrides[k] = v
    args = load_config(known.config, overrides)
    return train(args)


if __name__ == "__main__":
    main()
