"""Metrics — jnp re-implementations of reference `trainer/metrics.py` plus
host-side evaluator equivalents for OGB (rocauc/ap/rmse) since `ogb` is a
data-prep-only dependency.

All jnp metrics are pure functions usable inside jit; evaluator-style metrics
(`OGBEvaluator`) run host-side on the concatenated epoch predictions
(`val_per_batch=False` path of the reference trainer).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infomax3d_tpu.losses.contrastive import cov_loss, uniformity_loss

METRIC_REGISTRY: Dict[str, Callable] = {}


def register_metric(name):
    def deco(cls):
        METRIC_REGISTRY[name] = cls
        return cls
    return deco


def get_metric(name: str, **params):
    if name not in METRIC_REGISTRY:
        raise KeyError(f"unknown metric '{name}'; known: {sorted(METRIC_REGISTRY)}")
    return METRIC_REGISTRY[name](**params)


def _cos_sim_matrix(x1, x2):
    sim = jnp.einsum("ik,jk->ij", x1, x2)
    n1 = jnp.linalg.norm(x1, axis=1)
    n2 = jnp.linalg.norm(x2, axis=1)
    return sim / (n1[:, None] * n2[None, :])


# ---------------------------------------------------------------------------
# regression metrics
# ---------------------------------------------------------------------------

@register_metric("mae")
class MAE:
    def __call__(self, preds, targets, **kw):
        return jnp.mean(jnp.abs(preds - targets))


@register_metric("rsquared")
class Rsquared:
    def __call__(self, preds, targets, **kw):
        total = jnp.sum((targets - targets.mean()) ** 2)
        residual = jnp.sum((targets - preds) ** 2)
        return 1.0 - residual / total


@register_metric("pearsonr")
class PearsonR:
    def __call__(self, preds, targets, **kw):
        sx = preds - preds.mean(axis=0)
        sy = targets - targets.mean(axis=0)
        sigx = jnp.sqrt(jnp.sum(sx ** 2, axis=0))
        sigy = jnp.sqrt(jnp.sum(sy ** 2, axis=0))
        p = jnp.sum(sx * sy, axis=0) / (sigx * sigy + 1e-8)
        return jnp.clip(p, -1.0, 1.0).mean()


@register_metric("mean_predictor_loss")
class MeanPredictorLoss:
    def __init__(self, loss_func=None):
        self.loss_func = loss_func or (lambda p, t: jnp.mean((p - t) ** 2))

    def __call__(self, x1, targets, **kw):
        return self.loss_func(jnp.full_like(targets, targets.mean()), targets)


def denormalize(normalized, means, stds, ev2mev=None):
    """reference trainer/metrics.py:82-86 — undo target normalization and
    convert energies eV -> meV."""
    out = normalized * stds[None, :] + means[None, :]
    if ev2mev is not None:
        out = out * ev2mev[None, :]
    return out


@register_metric("qm9_denormalized_l1")
class QM9DenormalizedL1:
    def __init__(self, means=None, stds=None, ev2mev=None, dataset=None):
        if dataset is not None:
            means, stds = dataset.targets_mean, dataset.targets_std
            ev2mev = getattr(dataset, "ev2mev", None)
        self.means = jnp.asarray(means)
        self.stds = jnp.asarray(stds)
        self.ev2mev = None if ev2mev is None else jnp.asarray(ev2mev)

    def _denorm(self, x):
        return denormalize(x, self.means, self.stds, self.ev2mev)

    def __call__(self, preds, targets, **kw):
        return jnp.mean(jnp.abs(self._denorm(preds) - self._denorm(targets)))


@register_metric("qm9_denormalized_l2")
class QM9DenormalizedL2(QM9DenormalizedL1):
    def __call__(self, preds, targets, **kw):
        return jnp.mean((self._denorm(preds) - self._denorm(targets)) ** 2)


@register_metric("qm9_single_target_denormalized_l1")
class QM9SingleTargetDenormalizedL1(QM9DenormalizedL1):
    def __init__(self, task_index=0, **kw):
        super().__init__(**kw)
        self.task_index = task_index

    def __call__(self, preds, targets, **kw):
        p = self._denorm(preds)[:, self.task_index]
        t = self._denorm(targets)[:, self.task_index]
        return jnp.mean(jnp.abs(p - t))


# ---------------------------------------------------------------------------
# contrastive probes (trainer/metrics.py:161-463)
# ---------------------------------------------------------------------------

@register_metric("dimension_covariance")
class DimensionCovariance:
    def __call__(self, x1, x2, pos_mask=None, **kw):
        return cov_loss(x1) + cov_loss(x2)


@register_metric("batch_variance")
class BatchVariance:
    def __call__(self, x1, x2, pos_mask=None, **kw):
        return x1.std(axis=0, ddof=1).mean() + x2.std(axis=0, ddof=1).mean()


@register_metric("alignment")
class Alignment:
    def __init__(self, alpha=2):
        self.alpha = alpha

    def __call__(self, x1, x2, pos_mask=None, **kw):
        if x1.shape != x2.shape and pos_mask is None:
            x2 = x2[: x1.shape[0]]
        return jnp.mean(jnp.linalg.norm(x1 - x2, axis=1) ** self.alpha)


@register_metric("uniformity")
class Uniformity:
    def __init__(self, t=2):
        self.t = t

    def __call__(self, x1, x2, pos_mask=None, **kw):
        return uniformity_loss(x1, x2)


class _SimThresholdMetric:
    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def _parts(self, x1, x2, pos_mask):
        b = x1.shape[0]
        if x1.shape != x2.shape and pos_mask is None:
            x2 = x2[:b]
        sim = _cos_sim_matrix(x1, x2)
        preds = (sim + 1) / 2 > self.threshold
        if pos_mask is None:
            pos_mask = jnp.eye(b)
        neg_mask = 1 - pos_mask
        num_pos = b
        num_neg = b * (x2.shape[0] - 1)
        tp = num_pos - jnp.count_nonzero(
            (preds.astype(jnp.int32) - pos_mask) * pos_mask)
        tn = num_neg - jnp.count_nonzero(
            ((~preds).astype(jnp.int32) - neg_mask) * neg_mask)
        return tp / num_pos, tn / num_neg


@register_metric("true_positive_rate")
class TruePositiveRate(_SimThresholdMetric):
    def __call__(self, x1, x2, pos_mask=None, **kw):
        return self._parts(x1, x2, pos_mask)[0]


@register_metric("true_negative_rate")
class TrueNegativeRate(_SimThresholdMetric):
    def __call__(self, x1, x2, pos_mask=None, **kw):
        return self._parts(x1, x2, pos_mask)[1]


@register_metric("contrastive_accuracy")
class ContrastiveAccuracy(_SimThresholdMetric):
    def __call__(self, x1, x2, pos_mask=None, **kw):
        tp, tn = self._parts(x1, x2, pos_mask)
        return (tp + tn) / 2


@register_metric("positive_similarity")
class PositiveSimilarity:
    def __call__(self, x1, x2, pos_mask=None, **kw):
        if x1.shape != x2.shape and pos_mask is None:
            x2 = x2[: x1.shape[0]]
        if pos_mask is not None:
            sim = _cos_sim_matrix(x1, x2)
            pos = (pos_mask * sim).sum(axis=1)
        else:
            pos = jnp.sum(x1 * x2, axis=1) / (
                jnp.linalg.norm(x1, axis=1) * jnp.linalg.norm(x2, axis=1))
        return jnp.mean((pos + 1) / 2)


@register_metric("negative_similarity")
class NegativeSimilarity:
    def __call__(self, x1, x2, pos_mask=None, **kw):
        b = x1.shape[0]
        if x1.shape != x2.shape and pos_mask is None:
            x2 = x2[:b]
        sim = _cos_sim_matrix(x1, x2)
        if pos_mask is not None:
            pos = (pos_mask * sim).sum(axis=1)
        else:
            pos = jnp.diag(sim)
        neg = (sim.sum(axis=1) - pos) / (b - 1)
        return jnp.mean((neg + 1) / 2)


@register_metric("positive_similarity_multiple_positives_separate_2d")
class PositiveSimilarityMultiplePositivesSeparate2d:
    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        z2 = z2.reshape(b, -1, d)
        pos = jnp.sum(z1 * z2, axis=2)
        pos = pos / (jnp.linalg.norm(z1, axis=2) * jnp.linalg.norm(z2, axis=2))
        return jnp.mean((pos.sum(axis=1) + 1) / 2)


@register_metric("negative_similarity_multiple_positives_separate_2d")
class NegativeSimilarityMultiplePositivesSeparate2d:
    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        c = z1.shape[1]
        z2 = z2.reshape(b, -1, d)
        sim = jnp.einsum("ilk,juk->ijlu", z1, z2)
        sim = sim / jnp.einsum("il,ju->ijlu", jnp.linalg.norm(z1, axis=2),
                               jnp.linalg.norm(z2, axis=2))
        sim = sim.reshape(b, b, -1).sum(axis=2)
        neg = (sim.sum(axis=1) - jnp.diag(sim)) / (c ** 2 * (b - 1))
        return jnp.mean((neg + 1) / 2)


@register_metric("conformer_3d_variance")
class Conformer3DVariance:
    def __init__(self, normalize=False):
        self.norm = normalize

    def __call__(self, z1, z2, pos_mask=None, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z2 = z2.reshape(b, -1, d)
        if self.norm:
            z2 = z2 / jnp.linalg.norm(z2, axis=2, keepdims=True)
        return z2.var(axis=1, ddof=1).mean()


@register_metric("conformer_2d_variance")
class Conformer2DVariance:
    def __init__(self, normalize=False):
        self.norm = normalize

    def __call__(self, z1, z2, pos_mask=None, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        if self.norm:
            z1 = z1 / jnp.linalg.norm(z1, axis=2, keepdims=True)
        return jnp.exp(z1[:, 1, :]).mean()


@register_metric("positive_prob")
class PositiveProb:
    def _kernel(self, z1, z2):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        mu, std = z1[:, 0, :], jnp.exp(z1[:, 1, :] / 2)
        # reference quirk (metrics.py:350): conformers stacked graph-major
        z2 = jnp.transpose(z2.reshape(-1, b, d), (1, 0, 2))
        diff = z2[None, :, :, :] - mu[:, None, None, :]
        s = std[:, None, None, :]
        log_prob = -0.5 * (diff / s) ** 2 - jnp.log(s) - 0.5 * math.log(2 * math.pi)
        return jnp.mean(jnp.exp(log_prob), axis=(2, 3))

    def __call__(self, z1, z2, pos_mask=None, **kw):
        return jnp.mean(jnp.diag(self._kernel(z1, z2)))


@register_metric("negative_prob")
class NegativeProb(PositiveProb):
    def __call__(self, z1, z2, pos_mask=None, **kw):
        k = self._kernel(z1, z2)
        return jnp.mean(k.sum(axis=1) - jnp.diag(k))


# ---------------------------------------------------------------------------
# host-side evaluator metrics (OGB equivalents; numpy)
# ---------------------------------------------------------------------------

def roc_auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), ties handled by average ranks."""
    y_true = np.asarray(y_true).astype(np.float64)
    y_score = np.asarray(y_score).astype(np.float64)
    n_pos = (y_true == 1).sum()
    n_neg = (y_true == 0).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = y_score[order]
    i = 0
    r = 1.0
    n = len(y_score)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i:j + 1]] = avg
        r += j - i + 1
        i = j + 1
    sum_pos = ranks[y_true == 1].sum()
    return float((sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def average_precision_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AP with sklearn's grouped-threshold semantics (tied scores form one
    precision/recall point), matching `ogb.graphproppred.Evaluator._eval_ap`
    which delegates to sklearn.  AP = sum_i (R_i - R_{i-1}) * P_i over
    distinct-score thresholds in descending order."""
    y_true = np.asarray(y_true).astype(np.float64)
    y_score = np.asarray(y_score).astype(np.float64)
    n_pos = (y_true == 1).sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-y_score, kind="mergesort")
    yt = y_true[order]
    ys = y_score[order]
    # last index of each tied-score group == the threshold evaluation points
    last = np.r_[np.nonzero(np.diff(ys))[0], len(ys) - 1]
    tp = np.cumsum(yt)[last]
    precision = tp / (last + 1.0)
    recall = tp / n_pos
    return float(np.sum(np.diff(np.r_[0.0, recall]) * precision))


@register_metric("ogb_evaluator")
class OGBEvaluator:
    """OGB graph-prop evaluator equivalent (reference trainer/metrics.py:104-115):
    NaN-masked per-task rocauc/ap/rmse/acc averaged over tasks with at least
    one positive and one negative label.  `val_only` for rocauc matches the
    reference (skip during training batches).
    """

    is_host_metric = True

    def __init__(self, d_name: str = "", metric: str = "rocauc", num_tasks: int = 1):
        self.metric = metric
        self.num_tasks = num_tasks
        self.val_only = metric == "rocauc"

    def __call__(self, preds, targets, **kw):
        y_pred = np.asarray(preds)
        y_true = np.asarray(targets)
        if y_pred.ndim == 1:
            y_pred = y_pred[:, None]
        if y_true.ndim == 1:
            y_true = y_true[:, None]
        if y_pred.shape[1] != self.num_tasks:
            return float("nan")
        vals = []
        for t in range(y_true.shape[1]):
            mask = ~np.isnan(y_true[:, t])
            yt, yp = y_true[mask, t], y_pred[mask, t]
            if self.metric == "rmse":
                vals.append(float(np.sqrt(np.mean((yt - yp) ** 2))))
            elif self.metric == "mae":
                vals.append(float(np.mean(np.abs(yt - yp))))
            elif self.metric == "rocauc":
                if (yt == 1).any() and (yt == 0).any():
                    vals.append(roc_auc_score(yt, yp))
            elif self.metric == "ap":
                if (yt == 1).any() and (yt == 0).any():
                    vals.append(average_precision_score(yt, yp))
            elif self.metric == "acc":
                vals.append(float(np.mean((yp > 0.5) == yt)))
            else:
                raise ValueError(f"unknown OGB metric {self.metric}")
        if not vals:
            raise RuntimeError(
                "No positively labeled data available. Cannot compute metric.")
        return float(np.mean(vals))


@register_metric("pcqm4m_evaluator")
class PCQM4MEvaluatorWrapper:
    is_host_metric = True
    val_only = False

    def __call__(self, preds, targets, **kw):
        y_pred = np.asarray(preds).squeeze()
        y_true = np.asarray(targets).squeeze()
        return float(np.mean(np.abs(y_pred - y_true)))


# YAML-facing aliases: reference configs use these metric list names
# (e.g. configs_clean/pre-train_QM9.yml:15-24) resolved in train.py:237-269.
METRIC_REGISTRY.setdefault("positive_similarity_multiple_positives_separate_2d",
                           PositiveSimilarityMultiplePositivesSeparate2d)
