"""Run logging: JSONL always; TensorBoard when available (the reference's
observability contract — scalars per split + hparams table,
trainer/trainer.py:185-203 — with a machine-readable JSONL next to it)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def log(self, metrics: Dict[str, float], split: str, step: int, epoch: int):
        rec = {"split": split, "step": int(step), "epoch": int(epoch),
               "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("split", "time"):
                    continue
                try:
                    self._tb.add_scalar(f"{k}/{split}", float(v), step)
                except (TypeError, ValueError):
                    pass

    def log_hparams(self, hparams: Dict):
        with open(os.path.join(self.run_dir, "hparams.json"), "w") as f:
            json.dump({k: str(v) for k, v in hparams.items()}, f, indent=2)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
