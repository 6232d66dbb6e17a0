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


# --------------------------------------------------------------------------
# X77 — per-source document cap (crawl anti-domination sampling)
# --------------------------------------------------------------------------
_X77_CAP = 20


@query(
    "x77_source_cap",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             (doc_id % 2147483648) * 1103515245 % 2147483648 % 1000000
               AS hv
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY hv, doc_id) AS rk
      FROM h
    )
    SELECT source, doc_id, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= {_X77_CAP}
    """,
)
def x77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the crawl pipeline's anti-domination rule
    (C4/RefinedWeb-style: no single domain may flood the mixture): each
    source keeps its cap=20 documents with the smallest deterministic LCG
    hash — a uniform, reproducible-without-RNG sample, tie-broken by
    doc_id — so re-runs, engines, and partitionings all pick the same
    survivors. Plan: the selection is the SALTED two-phase top-k
    (operators/topk.py, q57's machinery) on the negated hash, so a heavy
    source never funnels through one window task at 100 TB; the salt only
    routes work, the result is exact top-k and thus salt-independent —
    which is why the oracle can ignore it."""
    from ..functions.hashing import lcg_bucket
    from ..operators.topk import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        (-lcg_bucket(F.col("doc_id"), 1_000_000)).alias("neg_hv"),
    )
    kept = topk_per_group(
        h,
        group_cols=["source"],
        order_col="neg_hv",
        k=_X77_CAP,
        tiebreak_cols=("doc_id",),
        rank_col="rk",
    )
    return kept.select("source", "doc_id", F.col("rk").cast("int").alias("rk"))
