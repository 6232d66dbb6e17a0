"""Persisted incremental MinHash index (VERDICT r5 task #4): append-then-
query must equal the batch path from scratch; appending known content must
sign nothing new; probe finds planted dups without re-signing the index."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.dedup import (
    minhash_dedup_edges,
)
from detecting_and_addressing_change_spark.operators.minhash_index import (
    append_to_minhash_index,
    build_minhash_index,
    minhash_index_edges,
    minhash_index_probe,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill with great interest today"
    )
    rows = []
    for i in range(30):
        if i % 7 == 0:
            rows.append((i, base))  # exact-dup family
        elif i % 7 == 1:
            rows.append((i, base.replace("great", f"word{i}")))  # near dups
        else:
            rows.append(
                (
                    i,
                    f"unique document number {i} discussing spark adaptive "
                    f"query execution and shuffle partition tuning topic{i}",
                )
            )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _edge_set(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_append_then_query_equals_batch_rebuild(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_minhash_index(corpus.filter(F.col("doc_id") < 20), path)
    append_to_minhash_index(corpus.filter(F.col("doc_id") >= 20), path)
    got = _edge_set(minhash_index_edges(spark, path))
    want = _edge_set(minhash_dedup_edges(corpus))
    assert got == want and want  # non-trivial: dups are planted


def test_append_of_known_texts_signs_nothing(spark, corpus, tmp_path):
    path = str(tmp_path / "idx2")
    build_minhash_index(corpus, path)
    n_sigs = spark.read.parquet(f"{path}/sigs").count()
    # re-ingest byte-identical content under new ids
    dup_batch = corpus.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    append_to_minhash_index(dup_batch, path)
    assert spark.read.parquet(f"{path}/sigs").count() == n_sigs
    assert spark.read.parquet(f"{path}/docs").count() == 60
    # and the edge set still matches the batch path over the union
    got = _edge_set(minhash_index_edges(spark, path))
    want = _edge_set(minhash_dedup_edges(corpus.unionByName(dup_batch)))
    assert got == want


def test_probe_finds_planted_dups_pre_append(spark, corpus, tmp_path):
    path = str(tmp_path / "idx3")
    build_minhash_index(corpus, path)
    base_text = corpus.filter(F.col("doc_id") == 0).first()["text"]
    batch = spark.createDataFrame(
        [
            (900, base_text),  # exact dup of the planted family
            (901, base_text.replace("today", "tonight")),  # near dup
            (902, "entirely novel content about nothing indexed before x"),
        ],
        "doc_id long, text string",
    )
    hits = minhash_index_probe(spark, path, batch).collect()
    by_batch = {}
    for r in hits:
        by_batch.setdefault(r["batch_id"], set()).add(
            (r["index_id"], r["via"])
        )
    assert (0, "exact") in by_batch[900]
    assert any(via == "band" for _, via in by_batch[901])
    assert 902 not in by_batch or all(
        via == "band" for _, via in by_batch.get(902, set())
    )
