"""Fingerprint inference — reference `inference.py:169-220`.

Reads molecules (SMILES txt with RDKit available, else a prebuilt cache or
synthetic set), loads a trained checkpoint, runs the 2D model, saves the
embedding matrix as `fingerprints.npy` beside the input.

Usage:
  python -m infomax3d_tpu.cli.inference --config=configs_clean/fingerprint_inference.yml
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List

import numpy as np

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import build_dataset, build_models
from infomax3d_tpu.utils.setup import enable_persistent_compilation_cache


class SmilesDataset:
    """SMILES txt -> OGB-featurized graphs on the fly (reference
    InferenceDataset, datasets/inference_dataset.py:23-100).  Uses RDKit
    when available, else the pure-Python kernel in data/chem.py."""

    def __init__(self, path: str):
        with open(path) as f:
            self.smiles = [ln.strip() for ln in f if ln.strip()]
        try:
            from rdkit import Chem
            from infomax3d_tpu.data.preprocess import mol_to_arrays

            def featurize(s):
                arr = mol_to_arrays(Chem.MolFromSmiles(s))
                return dict(node_feat=arr["atom_features"],
                            senders=arr["edge_index"][0].astype(np.int32),
                            receivers=arr["edge_index"][1].astype(np.int32),
                            edge_feat=arr["edge_features"])
        except ImportError:
            from infomax3d_tpu.data.chem import smiles_to_graph as featurize
        self.graphs = [featurize(s) for s in self.smiles]

    def __len__(self):
        return len(self.graphs)

    def node_counts(self):
        return np.array([g["node_feat"].shape[0] for g in self.graphs])

    def edge_counts(self):
        return np.array([max(g["senders"].shape[0], 1) for g in self.graphs])

    def __getitem__(self, i):
        return {"graph2d": self.graphs[i]}


def inference(args: Dict[str, Any]) -> np.ndarray:
    import jax
    from flax import serialization
    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.graphs.batch import BucketSpec

    enable_persistent_compilation_cache()
    if args.get("smiles_txt_path") and os.path.exists(args["smiles_txt_path"]):
        dataset = SmilesDataset(args["smiles_txt_path"])
    else:
        dataset = build_dataset(args)
    models = build_models(args)
    model = models["model"]

    bs = args["batch_size"]
    nodes = dataset.node_counts()
    n_cap = int(np.ceil(bs * float(nodes.mean()) * 1.3 / 256) * 256) + int(nodes.max())
    e_cap = int(np.ceil(bs * float(dataset.edge_counts().mean()) * 1.35 / 512) * 512)
    loader = GraphDataLoader(dataset, bs, "graph_only_collate",
                             bucket=BucketSpec(bs, n_cap, e_cap),
                             shuffle=False, prefetch=2)

    first = next(iter(loader))
    rng = jax.random.key(0)
    variables = model.init(rng, first["graph"], deterministic=True)
    if args.get("checkpoint"):
        with open(args["checkpoint"], "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables = {"params": raw["params"]["model"],
                     "batch_stats": raw.get("batch_stats", {}).get("model", {})}

    @jax.jit
    def fwd(variables, g):
        return model.apply(variables, g, deterministic=True)

    chunks: List[np.ndarray] = []
    for batch in loader:
        z = fwd(variables, batch["graph"])
        mask = np.asarray(batch["graph"].graph_mask)
        chunks.append(np.asarray(z)[mask])
    fingerprints = np.concatenate(chunks, axis=0)[: len(dataset)]
    out = args.get("output_path")
    if not out:
        out_dir = args.get("output_dir") or "dataset"
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "fingerprints.npy")
    np.save(out, fingerprints)
    print(f"saved {fingerprints.shape} fingerprints to {out}")
    return fingerprints


run_inference = inference   # public name used by tests/docs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    known, _ = p.parse_known_args(argv)
    overrides = {}
    if known.checkpoint:
        overrides["checkpoint"] = known.checkpoint
    args = load_config(known.config, overrides)
    return inference(args)


if __name__ == "__main__":
    main()
