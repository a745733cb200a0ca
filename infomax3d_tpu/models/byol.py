"""BYOL wrapper + critic modules (reference trainer/byol_wrapper.py:12-53,
models/legacy critic used by the PhilosophyTrainer).

The torch reference keeps teacher parameters inside the module with
`requires_grad=False` and mutates them via `ma_teacher_update`.  TPU-native
version: this module holds ONLY the student + predictor; the teacher is a
separate parameter tree in `TrainState.extra`, EMA-updated inside the jitted
train step (see `train/trainer.py::BYOLTrainer`, which also mirrors the
reference's train-mode teacher BN — batch-stat normalization with the
teacher's own running buffers carried in `extra` — and its quirk of
EMA-updating only the 2D wrapper's teacher, byol_trainer.py:24).  The
teacher forward is the same module applied with the teacher's 'student'
subtree.
"""
from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from infomax3d_tpu.models.base import MLP
from infomax3d_tpu.models.registry import get_model_class, register_model


@register_model("BYOLwrapper")
class BYOLWrapper(nn.Module):
    model_type: str
    model_parameters: Dict[str, Any]
    predictor_layers: int = 1
    predictor_hidden_size: int = 256
    predictor_batchnorm: bool = False
    metric_dim: int = 256

    @nn.compact
    def __call__(self, graph, deterministic: bool = True):
        student = get_model_class(self.model_type)(
            **self.model_parameters, name="student")
        projection = student(graph, deterministic=deterministic)
        if self.predictor_layers > 0:
            prediction = MLP(out_dim=self.metric_dim,
                             hidden_size=self.predictor_hidden_size,
                             mid_batch_norm=self.predictor_batchnorm,
                             layers=self.predictor_layers,
                             name="predictor")(projection,
                                               deterministic=deterministic)
        else:
            prediction = projection
        return prediction, projection


@register_model("Critic")
class Critic(nn.Module):
    """Reconstructs the 3D embedding `repeats` times from itself — the
    adversarial reconstruction player of the PhilosophyTrainer.  Output
    [B, metric_dim, repeats] to match CriticLoss (commons/losses.py:33-42)."""
    metric_dim: int = 256
    hidden_dim: int = 256
    layers: int = 2
    repeats: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        out = MLP(out_dim=self.metric_dim * self.repeats,
                  hidden_size=self.hidden_dim, layers=self.layers,
                  dropout=self.dropout,
                  name="mlp")(z, deterministic=deterministic)
        return out.reshape(z.shape[0], self.metric_dim, self.repeats)
