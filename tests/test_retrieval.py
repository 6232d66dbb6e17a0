"""RAG retrieval build (retrieval.py): chunk boundaries match the x63
query, an exact-text query retrieves its own chunk at cosine 1.0, and
hits resolve back to source documents."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.retrieval import (
    build_text_index,
    chunk_documents,
    search_text,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_chunk_documents_matches_x63_contract(spark):
    """Same boundaries as the x63 query: per chunk, n_words and the md5
    fingerprint of the retained text agree."""
    from detecting_and_addressing_change_spark.queries import QUERIES

    docs = load_table(spark, SF, "documents")
    x63 = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["fingerprint"])
        for r in QUERIES["x63_doc_chunking"](spark, SF).collect()
    }
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(docs).collect()
    }
    assert got.keys() == x63.keys()
    import hashlib

    for key, text in got.items():
        n_words, fp = x63[key]
        assert len(text.split(" ")) == n_words, key
        assert hashlib.md5(text.encode()).hexdigest()[:8] == fp, key


def test_exact_text_query_retrieves_its_chunk(spark):
    docs = load_table(spark, SF, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        build_text_index(docs, f"{tmp}/idx")
        chunks = spark.read.parquet(f"{tmp}/idx/chunks")
        probe = chunks.orderBy("chunk_id").limit(3).collect()
        hits = search_text(
            spark, f"{tmp}/idx", [r["chunk_text"] for r in probe], k=3
        ).collect()
    by_q = {}
    for h in hits:
        by_q.setdefault(h["query_id"], []).append(h)
    assert set(by_q) == {0, 1, 2}
    for qid, r in enumerate(probe):
        top = min(by_q[qid], key=lambda h: h["rnk"])
        # the top hit IS the probed chunk's text at cosine 1.0 (identical
        # text -> identical pooled vector; ties share the same text)
        assert top["cosine"] == 1.0, qid
        assert top["chunk_text"] == r["chunk_text"], qid
