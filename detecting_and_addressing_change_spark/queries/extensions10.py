"""Round-6 extension queries: incremental dedup index lifecycle (x76+).

Reference parity note: the reference never persists dedup state (it has no
dedup at all); this family is the LLM-data-pipeline north star — the
production lifecycle of the x04 near-dup machinery on a growing corpus.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .extensions import _minhash_guarded_edges_oracle
from .registry import query


# --------------------------------------------------------------------------
# X76 — incremental near-dup dedup: build index on the base corpus, append
# an ingest batch, query edges from stored signatures. The oracle is the
# BATCH re-run from scratch over the full corpus (x04's guarded edge
# semantics) — hash-equality proves append-then-query == rebuild.
# --------------------------------------------------------------------------
@query(
    "x76_incremental_dedup",
    oracle=_minhash_guarded_edges_oracle() + "SELECT a_id, b_id FROM edges",
)
def x76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup (VERDICT r5 task #4): the corpus arrives
    in two waves (doc_id % 5 == 4 is the 'new ingest' batch). The first
    wave builds a persisted MinHash index (operators/minhash_index.py:
    docs/ digests + one signature row per DISTINCT text); the second wave
    APPENDS — signing only digests the index has never seen — and the
    guarded edge set (exact-dup chains + tier/capped representative band
    pairs) is then computed from stored state alone, with no text re-read
    and no re-signing of the base corpus. The DuckDB oracle recomputes
    the same edges from scratch over the full table, so the hash match IS
    the append==rebuild proof. Plan: append = one digest anti-join + the
    minhash pipeline over the novel slice only; edges = one digest window
    + the x04 capped self-join over signature-derived bands."""
    from ..operators.minhash_index import (
        append_to_minhash_index,
        build_minhash_index,
        minhash_index_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="mhidx_x76_")
    build_minhash_index(docs.filter(F.col("doc_id") % 5 != 4), path)
    append_to_minhash_index(docs.filter(F.col("doc_id") % 5 == 4), path)
    return minhash_index_edges(spark, path)
