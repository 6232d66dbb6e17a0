"""Classification metrics vs sklearn with zero_division=0 over a fixed label
universe (SURVEY §2.3 A4, utils/metrics.py:6-32 in reference)."""

from __future__ import annotations

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import (  # noqa: E402
    accuracy_score,
    precision_score,
    recall_score,
    f1_score,
)

from detecting_and_addressing_change_spark.operators.metrics import (  # noqa: E402
    classification_metrics,
)


def test_matches_sklearn_with_absent_classes(spark):
    rng = np.random.RandomState(1)
    n_classes = 7  # classes 5, 6 never predicted; 6 never appears at all
    y = rng.randint(0, 6, size=400)
    pred = np.where(rng.rand(400) < 0.7, y, rng.randint(0, 5, size=400))
    labels = np.arange(n_classes)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(y, pred)], "label int, pred int"
    )
    got = classification_metrics(df, n_classes).collect()[0]
    assert got["accuracy"] == pytest.approx(accuracy_score(y, pred))
    assert got["precision"] == pytest.approx(
        precision_score(y, pred, labels=labels, average="macro",
                        zero_division=0)
    )
    assert got["recall"] == pytest.approx(
        recall_score(y, pred, labels=labels, average="macro", zero_division=0)
    )
    assert got["macro_f1"] == pytest.approx(
        f1_score(y, pred, labels=labels, average="macro", zero_division=0)
    )
