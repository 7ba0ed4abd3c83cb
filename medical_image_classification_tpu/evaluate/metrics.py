"""Evaluation metric suite: accuracy, macro P/R/specificity/F1, OvR AUC.

Pure-numpy rebuild of `/root/reference/test_all_index.py:43-90` (which uses
sklearn): confusion-matrix macro metrics + rank-statistic one-vs-rest AUC,
plus parameter counting and CSV export.
"""

from __future__ import annotations

import csv
from typing import Dict, Optional, Sequence

import numpy as np


def confusion_matrix(y_true, y_pred, num_classes: int) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (np.asarray(y_true), np.asarray(y_pred)), 1)
    return cm


def _safe_div(a, b):
    return np.divide(a, b, out=np.zeros_like(a, dtype=np.float64),
                     where=b != 0)


def roc_auc_ovr(y_true, scores) -> float:
    """Macro one-vs-rest AUC via the Mann-Whitney rank statistic
    (equivalent to sklearn's roc_auc_score(..., multi_class='ovr'))."""
    y_true = np.asarray(y_true)
    scores = np.asarray(scores, dtype=np.float64)
    aucs = []
    for c in range(scores.shape[1]):
        pos = y_true == c
        n_pos, n_neg = pos.sum(), (~pos).sum()
        if n_pos == 0 or n_neg == 0:
            continue
        order = scores[:, c].argsort(kind="mergesort")
        ranks = np.empty(len(order), dtype=np.float64)
        ranks[order] = np.arange(1, len(order) + 1)
        # average ranks for ties
        s = scores[:, c]
        _, inv, counts = np.unique(s, return_inverse=True, return_counts=True)
        cum = np.cumsum(counts)
        avg = (cum - (counts - 1) / 2.0)
        ranks = avg[inv]
        auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        aucs.append(auc)
    return float(np.mean(aucs)) if aucs else float("nan")


def classification_metrics(y_true, y_pred, scores=None,
                           num_classes: Optional[int] = None) -> Dict[str, float]:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    nc = num_classes or int(max(y_true.max(), y_pred.max()) + 1)
    cm = confusion_matrix(y_true, y_pred, nc)
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    tn = cm.sum() - tp - fp - fn
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)            # sensitivity
    specificity = _safe_div(tn, tn + fp)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    out = {
        "accuracy": float(tp.sum() / max(cm.sum(), 1)),
        "precision_macro": float(precision.mean()),
        "recall_macro": float(recall.mean()),
        "specificity_macro": float(specificity.mean()),
        "f1_macro": float(f1.mean()),
    }
    if scores is not None:
        out["auc_ovr_macro"] = roc_auc_ovr(y_true, scores)
    return out


def count_parameters(params) -> int:
    import jax
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def metrics_to_csv(path: str, metrics: Dict[str, float],
                   extra: Optional[Dict] = None):
    """CSV export matching the reference's pandas dump
    (`test_all_index.py:84-90`)."""
    row = dict(metrics)
    if extra:
        row.update(extra)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        w.writerow(row)
