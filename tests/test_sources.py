"""Text-corpus source (S1/J1) and idempotent pair cache (S4)."""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture()
def corpus_files():
    with tempfile.TemporaryDirectory() as tmp:
        x = os.path.join(tmp, "X.txt")
        y = os.path.join(tmp, "Y.txt")
        with open(x, "w") as f:
            f.write("Hello   World\n<b>tagged</b> Doc two\nthird DOC\n")
        with open(y, "w") as f:
            f.write(" 0\n2\n 1 \n")
        yield x, y


def test_load_text_corpus_aligns_and_cleans(spark, corpus_files):
    from detecting_and_addressing_change_spark.sources.text_corpus import (
        corpus_stats,
        load_text_corpus,
    )

    x, y = corpus_files
    df = load_text_corpus(spark, x, y).orderBy("doc_id")
    rows = df.collect()
    assert [(r["doc_id"], r["text"], r["label"]) for r in rows] == [
        (0, "hello world", 0),
        (1, "tagged doc two", 2),
        (2, "third doc", 1),
    ]
    assert corpus_stats(df) == {"n_documents": 3, "n_classes": 3}


def test_pair_cache_idempotent(spark):
    from detecting_and_addressing_change_spark.sources.pair_cache import (
        build_or_load,
    )

    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return spark.range(5).selectExpr("id", "id * 2 AS v")

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "pairs")
        a = build_or_load(spark, path, builder)
        assert a.count() == 5
        b = build_or_load(spark, path, builder)
        assert b.count() == 5
        assert calls["n"] == 1  # second call loaded, not rebuilt


def test_build_adaptation_pairs(spark):
    from detecting_and_addressing_change_spark.sources.pair_cache import (
        build_adaptation_pairs,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha gamma"),
            (1, "beta alpha delta"),
            (2, "alpha beta beta"),
        ],
        "doc_id long, text string",
    )
    pairs = build_adaptation_pairs(
        docs, "SCIBERT", "BERT", dim=4, top_k=3
    ).orderBy("rank").collect()
    # counts: alpha=4, beta=4, gamma=1, delta=1 -> third place tie broken
    # by word asc (SURVEY §8 Q6): 'delta' < 'gamma'
    assert [r["word"] for r in pairs] == ["alpha", "beta", "delta"]
    assert all(len(r["source"]) == 4 and len(r["target"]) == 4 for r in pairs)
    # source/target come from different embedding functions
    assert pairs[0]["source"] != pairs[0]["target"]


def test_events_ts_loads_as_timestamp(spark):
    """Regression (round-2 verdict #1): the driver's testdata generation
    switched events.ts from parquet TIMESTAMP(NANOS) to timestamp[us];
    load_table must branch on the loaded dtype instead of unconditionally
    applying the nanos workaround (which threw DATATYPE_MISMATCH on a
    TIMESTAMP_NTZ column and broke every events-reading surface)."""
    from pyspark.sql import types as T

    from detecting_and_addressing_change_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    row = ev.orderBy("event_id").select("ts").first()
    assert row["ts"] is not None
    # and the frame is actually scannable end-to-end
    assert ev.count() > 0
