"""Regression tests for the round-4 review fixes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_dlit_nonfinite_literals_parse(spark):
    """_dlit must emit plan-buildable SQL for inf/-inf/NaN (degenerate
    fitted stats), not 'infD' parse errors."""
    from detecting_and_addressing_change_spark.operators.nb import _dlit

    row = spark.sql(
        "SELECT %s AS pinf, %s AS ninf, %s AS nan"
        % (_dlit(float("inf")), _dlit(float("-inf")), _dlit(float("nan")))
    ).collect()[0]
    assert row["pinf"] == float("inf")
    assert row["ninf"] == float("-inf")
    assert math.isnan(row["nan"])


def test_pooled_features_models_dedupes_repeated_model(spark):
    """The A==B control experiment must not union two copies of every
    row: a repeated model yields exactly one tagged frame."""
    from detecting_and_addressing_change_spark.pipelines import (
        pooled_features_models,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(8)],
        "doc_id long, text string",
    )
    pooled = pooled_features_models(docs, ("BERT", "BERT"), dim=4)
    assert pooled.count() == 8
    assert pooled.filter(F.col("model") == "BERT").count() == 8


def test_tagged_embedder_unknown_backend_raises_value_error(spark):
    import pytest

    from detecting_and_addressing_change_spark.operators.embedder import (
        embed_documents_tagged,
    )

    docs = spark.createDataFrame(
        [(0, "a b", "BERT")], "doc_id long, text string, model string"
    )
    with pytest.raises(ValueError, match="unknown backend"):
        embed_documents_tagged(docs, dim=4, backend="bogus")
