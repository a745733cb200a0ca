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


def smiles_dataset(path: str):
    """SMILES txt -> OGB-featurized graphs (needs RDKit, host-side prep)."""
    try:
        from rdkit import Chem  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "RDKit is required to featurize SMILES on the fly; prebuild a "
            "dataset cache instead (dataset_params.path) or install rdkit "
            "in the data-prep environment.") from e
    raise NotImplementedError(
        "SMILES featurization pipeline ships with the preprocessing tools; "
        "this environment has no RDKit so only cached datasets are served.")


def inference(args: Dict[str, Any]) -> np.ndarray:
    import jax
    from flax import serialization
    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.graphs.batch import BucketSpec

    enable_persistent_compilation_cache()
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
    fingerprints = np.concatenate(chunks, axis=0)
    out_dir = args.get("output_dir") or "dataset"
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "fingerprints.npy")
    np.save(out, fingerprints)
    print(f"saved {fingerprints.shape} fingerprints to {out}")
    return fingerprints


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
