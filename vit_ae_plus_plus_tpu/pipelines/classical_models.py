"""Classical ML evaluation suite on extracted SSL features.

Parity: reference /root/reference/bootstrap/utils/classical_models.py:12-103 —
SVM / RandomForest / LogisticRegression with RandomizedSearchCV over the same
small grids (random_state=42, class_weight balanced), registry by name,
predict_proba outputs. Pure sklearn host-side work — this is deliberately NOT
TPU code (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn import svm
from sklearn.ensemble import RandomForestClassifier
from sklearn.linear_model import LogisticRegression
from sklearn.model_selection import RandomizedSearchCV

PARAM_GRIDS = {
    "svm": {"C": [0.1, 1, 5, 10], "kernel": ["linear", "rbf"]},
    "rf": {
        "n_estimators": [50, 100, 150, 200],
        "criterion": ["gini", "entropy"],
        "class_weight": ["balanced", "balanced_subsample"],
    },
    "linear": {
        "solver": ["newton-cg", "lbfgs", "liblinear", "sag"],
        "penalty": ["l2", None],
        "max_iter": [200, 500, 1000],
    },
}


def _estimator(method: str):
    if method == "svm":
        return svm.SVC(probability=True, random_state=42, class_weight="balanced")
    if method == "rf":
        return RandomForestClassifier(random_state=42)
    if method == "linear":
        return LogisticRegression(random_state=42, class_weight="balanced")
    raise ValueError(f"invalid method {method!r}")


def execute_models(
    train_features: np.ndarray,
    train_label: np.ndarray,
    test_features: np.ndarray,
    *methods: str,
    verbose: int = 0,
) -> Dict[str, np.ndarray]:
    """Fit each method with RandomizedSearchCV and return predict_proba on the
    test features (classical_models.py:96-103)."""
    results = {}
    for method in methods:
        grid = RandomizedSearchCV(
            _estimator(method), PARAM_GRIDS[method], refit=True, verbose=verbose,
            random_state=42,
        )
        grid.fit(train_features, train_label)
        results[method] = grid.predict_proba(test_features)
    return results
