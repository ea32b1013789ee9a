"""Evaluation metrics (host-side numpy/sklearn, exactly as the reference).

Parity: reference /root/reference/utils/used_metrics.py:12-41, including its
transposed-confusion-matrix convention: `confusion_matrix(predictions, target)`
puts predictions on rows, so specificity = cm[0,0]/(cm[0,0]+cm[1,0]) reads
TN / (TN + FN-as-row) in that transposed layout. Kept verbatim so reported
numbers are comparable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.metrics import confusion_matrix, roc_auc_score


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def find_vals(predictions: np.ndarray, target: np.ndarray) -> Tuple[float, float]:
    """Specificity / sensitivity with the reference's transposed-CM convention
    (used_metrics.py:30-41)."""
    pred_labels = np.argmax(predictions, axis=1)
    # labels=[0, 1] forces a 2x2 matrix even when a tiny eval set collapses to
    # one class (identical values otherwise)
    cm = confusion_matrix(pred_labels, target, labels=[0, 1])
    with np.errstate(invalid="ignore"):
        specificity = cm[0, 0] / (cm[0, 0] + cm[1, 0])
        sensitivity = cm[1, 1] / (cm[1, 1] + cm[0, 1])
    return float(specificity), float(sensitivity)


def roc_auc(predictions: np.ndarray, target: np.ndarray) -> Tuple[float, float, float]:
    """(auc, specificity, sensitivity) from raw logits (used_metrics.py:12-19)."""
    specificity, sensitivity = find_vals(predictions, target)
    probs = _softmax(np.asarray(predictions, dtype=np.float64))
    target = np.asarray(target).astype(int)
    one_hot = np.eye(2)[target]
    try:
        auc = float(roc_auc_score(one_hot, probs))
    except ValueError:  # single-class eval set (degenerate tiny splits)
        auc = 0.5
    return auc, specificity, sensitivity


def acc_pred(predictions: np.ndarray, target: np.ndarray) -> float:
    preds = np.argmax(predictions, axis=1)
    return float((preds == np.asarray(target)).sum() / len(target))
