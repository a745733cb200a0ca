"""Golden validation of the OGB metric math (VERDICT round-1 item 9).

`ogb.graphproppred.Evaluator` is a thin dispatcher over sklearn's
`roc_auc_score` / `average_precision_score` with per-task NaN masking and
single-class task skipping (reference uses it via trainer/metrics.py:104-115).
The `ogb` package is not installed in this image, so this test validates
`infomax3d_tpu.train.metrics.OGBEvaluator` two ways:

1. the scalar kernels (roc_auc, average precision) against sklearn directly,
   including heavy score ties (where naive per-item AP diverges), and
2. the evaluator semantics (NaN masks, task skipping, all-NaN columns,
   no-valid-task RuntimeError) against an independent in-test emulation of
   ogb's published `_eval_rocauc`/`_eval_ap`/`_eval_rmse` algorithms.

When `ogb` IS importable (a future environment), the same cases additionally
run through the real `Evaluator` for molhiv/molpcba/mollipo.
"""
import numpy as np
import pytest

from infomax3d_tpu.train.metrics import (
    OGBEvaluator,
    average_precision_score,
    roc_auc_score,
)
from sklearn.metrics import average_precision_score as sk_ap
from sklearn.metrics import roc_auc_score as sk_roc

try:  # pragma: no cover - ogb absent in this image
    from ogb.graphproppred import Evaluator as OgbRealEvaluator
except ImportError:
    OgbRealEvaluator = None


def _ogb_eval(y_true, y_pred, metric):
    """Independent emulation of ogb.graphproppred.Evaluator's documented
    algorithm (per-task NaN masking, both-classes-present skip, mean over
    surviving tasks)."""
    vals = []
    for i in range(y_true.shape[1]):
        col, pred = y_true[:, i], y_pred[:, i]
        labeled = col == col  # non-NaN
        if metric == "rmse":
            vals.append(np.sqrt(np.mean((col[labeled] - pred[labeled]) ** 2)))
            continue
        if not ((col == 1).any() and (col == 0).any()):
            continue
        fn = {"rocauc": sk_roc, "ap": sk_ap}[metric]
        vals.append(fn(col[labeled], pred[labeled]))
    if not vals:
        raise RuntimeError("No positively labeled data available.")
    return float(np.mean(vals))


def _rand_multitask(rng, n=150, tasks=4, nan_frac=0.3, ties=False):
    y_true = (rng.random((n, tasks)) > rng.uniform(0.3, 0.7)).astype(np.float64)
    y_true[rng.random((n, tasks)) < nan_frac] = np.nan
    y_pred = rng.random((n, tasks))
    if ties:
        y_pred = np.round(y_pred, 1)
    return y_true, y_pred


@pytest.mark.parametrize("ties", [False, True])
def test_scalar_kernels_vs_sklearn(ties):
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(20, 400))
        yt = (rng.random(n) > rng.uniform(0.2, 0.8)).astype(np.float64)
        if yt.sum() in (0, n):
            continue
        yp = np.round(rng.random(n), 1) if ties else rng.random(n)
        assert roc_auc_score(yt, yp) == pytest.approx(sk_roc(yt, yp), abs=1e-12)
        assert average_precision_score(yt, yp) == pytest.approx(
            sk_ap(yt, yp), abs=1e-12)


@pytest.mark.parametrize("metric", ["rocauc", "ap", "rmse"])
@pytest.mark.parametrize("ties", [False, True])
def test_evaluator_semantics(metric, ties):
    rng = np.random.default_rng(11)
    for trial in range(8):
        y_true, y_pred = _rand_multitask(rng, tasks=4, ties=ties)
        if metric != "rmse":
            # trial 0: make one task single-class (must be skipped),
            # trial 1: make one task all-NaN (skipped via the class check)
            if trial == 0:
                y_true[:, 2] = np.where(np.isnan(y_true[:, 2]), np.nan, 1.0)
            if trial == 1:
                y_true[:, 3] = np.nan
        else:
            y_true = np.where(np.isnan(y_true), rng.random(y_true.shape),
                              y_true * 3.0)  # rmse: dense regression targets
        ev = OGBEvaluator(metric=metric, num_tasks=4)
        got = ev(y_pred, y_true)
        want = _ogb_eval(y_true, y_pred, metric)
        assert got == pytest.approx(want, abs=1e-10), (metric, ties, trial)


def test_evaluator_raises_when_no_valid_task():
    y_true = np.ones((50, 2))
    y_true[::3, 0] = np.nan
    y_pred = np.random.default_rng(0).random((50, 2))
    with pytest.raises(RuntimeError):
        OGBEvaluator(metric="rocauc", num_tasks=2)(y_pred, y_true)


def test_task_count_mismatch_returns_nan():
    ev = OGBEvaluator(metric="rocauc", num_tasks=12)
    out = ev(np.zeros((10, 3)), np.zeros((10, 3)))
    assert np.isnan(out)


@pytest.mark.skipif(OgbRealEvaluator is None, reason="ogb not installed")
@pytest.mark.parametrize("name,metric,tasks", [
    ("ogbg-molhiv", "rocauc", 1),
    ("ogbg-molpcba", "ap", 128),
    ("ogbg-mollipo", "rmse", 1),
])
def test_against_real_ogb_evaluator(name, metric, tasks):  # pragma: no cover
    rng = np.random.default_rng(3)
    y_true, y_pred = _rand_multitask(rng, n=300, tasks=tasks)
    if metric == "rmse":
        y_true = np.where(np.isnan(y_true), 0.5, y_true * 3.0)
    real = OgbRealEvaluator(name).eval({"y_true": y_true, "y_pred": y_pred})
    got = OGBEvaluator(metric=metric, num_tasks=tasks)(y_pred, y_true)
    assert got == pytest.approx(real[metric], abs=1e-10)
