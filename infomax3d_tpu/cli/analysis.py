"""Embedding analysis — singular-value spectra of model fingerprints
(reference `singular_value_plots.py:1-110` + tensorboard_singular_value_plot,
`commons/utils.py:113-121`).

Usage:
  python -m infomax3d_tpu.cli.analysis --config=<cfg> --checkpoint=<ckpt.pt>
Writes `singular_values.json` (and a matplotlib PNG if available) into the
output directory.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.inference import inference


def singular_value_spectrum(embeddings: np.ndarray) -> np.ndarray:
    z = embeddings - embeddings.mean(axis=0, keepdims=True)
    s = np.linalg.svd(z, compute_uv=False)
    return 100.0 * s / s.sum()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    known, _ = p.parse_known_args(argv)
    overrides = {}
    if known.checkpoint:
        overrides["checkpoint"] = known.checkpoint
    args = load_config(known.config, overrides)
    fingerprints = inference(args)
    spectrum = singular_value_spectrum(fingerprints)
    out_dir = args.get("output_dir") or "dataset"
    payload = {"singular_values_pct": spectrum.tolist(),
               "cumsum_pct": np.cumsum(spectrum).tolist(),
               "n_samples": int(fingerprints.shape[0]),
               "dim": int(fingerprints.shape[1])}
    with open(os.path.join(out_dir, "singular_values.json"), "w") as f:
        json.dump(payload, f, indent=2)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].plot(spectrum)
        axes[0].set_title("singular values (%)")
        axes[1].plot(np.cumsum(spectrum))
        axes[1].set_title("cumulative (%)")
        fig.savefig(os.path.join(out_dir, "singular_values.png"), dpi=120)
    except ImportError:
        pass
    print(f"top-5 singular values (%): {np.round(spectrum[:5], 2).tolist()}")
    return payload


if __name__ == "__main__":
    main()
