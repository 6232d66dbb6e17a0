"""Round-7 extension queries: ANN quality harness (x83), exact
prefix-filter similarity join (x84), CMS join-size estimation (x86),
quantized-recall (x87), MinHash recall audit (x88), HLL register rollup
(x89 — which since round 16 also carries the folded x85 distinct-sketch
verdict columns; x85's standalone row is de-registered).

Reference parity note: the reference has none of these (no ANN, no
similarity join, exact single-node counting only); they are
LLM-data-pipeline / 100 TB-shape additions — the recall harness every ANN
deployment runs before trusting an index, the exact-threshold complement
to the probabilistic MinHash dedup, the mergeable-sketch form of
COUNT(DISTINCT) whose shuffle is m longs per group instead of the
distinct-value stream, and the sketch algebra a planner consults before
paying for a 100 TB shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .extensions8 import N_CENTROIDS, N_ITER, _kmeans_ctes
from .registry import query

# --------------------------------------------------------------------------
# X83 — ANN recall@k harness: IVF top-k vs exact brute-force ground truth.
# recall = |IVF hits among the exact top-k| / k per query. Both rankings
# are deterministic (unrounded cosine desc, cand_id tiebreak), so an
# APPROXIMATE index's quality report is itself hash-checkable.
# --------------------------------------------------------------------------
_X83_K = 5
_X83_NPROBE = 2

_X83_ORACLE = f"""
    WITH {_kmeans_ctes(N_CENTROIDS, N_ITER)},
    q AS (
      SELECT vec_id AS query_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dist, cent_id) AS r
        FROM dF WHERE vec_id BETWEEN 100 AND 109) t
      WHERE r <= {_X83_NPROBE}
    ),
    cand AS (
      SELECT DISTINCT q.query_id, a.vec_id AS cand_id
      FROM q JOIN aF a ON q.cell = a.cell AND a.vec_id <> q.query_id
    ),
    ex AS (
      SELECT vec_id, GENERATE_SUBSCRIPTS(emb, 1) AS d, UNNEST(emb) AS v
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
    idots AS (
      SELECT cand.query_id, cand.cand_id, SUM(a.v * b.v) AS dot
      FROM cand
      JOIN ex a ON a.vec_id = cand.query_id
      JOIN ex b ON b.vec_id = cand.cand_id AND a.d = b.d
      GROUP BY cand.query_id, cand.cand_id
    ),
    ivf_top AS (
      SELECT query_id, cand_id FROM (
        SELECT i.query_id, i.cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY i.query_id
                 ORDER BY i.dot / (nq.nrm * nc.nrm) DESC, i.cand_id) AS rnk
        FROM idots i
        JOIN norms nq ON i.query_id = nq.vec_id
        JOIN norms nc ON i.cand_id = nc.vec_id) t
      WHERE rnk <= {_X83_K}
    ),
    bdots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.v * b.v) AS dot
      FROM ex a JOIN ex b ON a.d = b.d AND a.vec_id <> b.vec_id
      WHERE a.vec_id BETWEEN 100 AND 109
      GROUP BY a.vec_id, b.vec_id
    ),
    exact_top AS (
      SELECT query_id, cand_id FROM (
        SELECT d.query_id, d.cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.cand_id) AS rnk
        FROM bdots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.cand_id = nc.vec_id) t
      WHERE rnk <= {_X83_K}
    )
    SELECT e.query_id,
           CAST(COUNT(i.cand_id) AS INT) AS n_hit,
           FLOOR(COUNT(i.cand_id) / {_X83_K}.0 * 10000.0 + 0.5) / 10000.0
             AS recall_at_k
    FROM exact_top e
    LEFT JOIN ivf_top i
      ON i.query_id = e.query_id AND i.cand_id = e.cand_id
    GROUP BY e.query_id
"""


@query("x83_ann_recall", oracle=_X83_ORACLE)
def x83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@5 evaluation: for queries 100-109, the fitted-k-means
    IVF index (x59's machinery, nprobe=2) is scored against exact
    brute-force cosine ground truth over the full corpus. This is the
    harness a production ANN deployment runs on a QUERY SAMPLE before
    trusting an index — ground truth is exact (crossJoin on the sampled
    queries only, broadcast; never all-pairs), recall is hits/k.

    At 100 TB: ground truth cost is |sample| * corpus narrow scans (the
    documented exact-baseline shape of operators/similarity.py:35); the
    IVF side is the partition-pruned probe. Both rankings break ties
    deterministically, so recall itself is oracle-hashable."""
    from ..operators.kmeans import kmeans_ivf_topk
    from ..operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    pred = (F.col("vec_id") >= 100) & (F.col("vec_id") <= 109)
    ivf = kmeans_ivf_topk(
        emb,
        pred,
        n_centroids=N_CENTROIDS,
        n_iter=N_ITER,
        k=_X83_K,
        nprobe=_X83_NPROBE,
    )
    exact = brute_force_topk(emb, emb.filter(pred), k=_X83_K)
    # ONE evaluation of the exact ground truth (r17): the former
    # semi-join + separate qids = exact.distinct() + left join computed
    # the whole brute-force subtree — the |sample| x corpus scan, the
    # scoring, the rank window — TWICE (guide §7.2 duplicated subtrees;
    # Spark does not dedupe common subplans). A left join with a hit
    # marker aggregated per query is the oracle's own shape
    # (exact_top LEFT JOIN ivf_top .. GROUP BY e.query_id): every exact
    # query id yields a row, count() skips the nulls of misses, and the
    # IVF side still evaluates once.
    # PRECONDITION (ADVICE r17): count("__hit") equals the semi-join
    # cardinality only because BOTH top-k inputs are unique on
    # (query_id, cand_id) — brute_force_topk and kmeans_ivf_topk
    # tie-break with row_number, so each side emits each pair at most
    # once. A rank()-based top-k or a multi-probe union without dedup
    # on the approximate side would overcount n_hit (recall > 1) where
    # the old semi-join could not; keep row_number/distinct semantics
    # on both sides if either operator changes.
    n_hit = F.col("n_hit")
    return (
        exact.select("query_id", "cand_id")
        .join(
            ivf.select("query_id", "cand_id").withColumn(
                "__hit", F.lit(1)
            ),
            ["query_id", "cand_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("__hit").alias("n_hit"))
        .select(
            "query_id",
            n_hit.cast("int").alias("n_hit"),
            portable_round(n_hit / F.lit(float(_X83_K)), 4).alias(
                "recall_at_k"
            ),
        )
    )


# --------------------------------------------------------------------------
# X84 — exact set-similarity join via prefix filtering. The oracle verifies
# WITHOUT the prefix filter (full inverted-index join over shared shingles)
# — the hash match is an empirical losslessness proof of the filter.
# --------------------------------------------------------------------------
_X84_T = 0.5

_X84_ORACLE = f"""
    WITH dg AS (
      SELECT doc_id, text, md5(text) AS dgst FROM documents
    ),
    lab AS (
      SELECT doc_id, text,
             MIN(doc_id) OVER (PARTITION BY dgst) AS keeper
      FROM dg
    ),
    chains AS (
      SELECT keeper AS a_id, doc_id AS b_id FROM lab WHERE doc_id <> keeper
    ),
    reps AS (SELECT doc_id, text FROM lab WHERE doc_id = keeper),
    toks AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM reps)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
      SELECT a_id, b_id,
             CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jr
      FROM inter
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
    )
    SELECT a_id, b_id, 1.0 AS jaccard FROM chains
    UNION ALL
    SELECT a_id, b_id, FLOOR(jr * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM scored WHERE jr >= {_X84_T}
"""


@query("x84_prefix_jaccard_join", oracle=_X84_ORACLE)
def x84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-threshold set-similarity self-join (SSJoin with prefix
    filtering, operators/setjoin.py): every pair of documents whose
    3-gram shingle sets have Jaccard >= 0.5 — the exact complement to the
    probabilistic MinHash path (a band collision can miss a true pair;
    this cannot). Exact-dup groups contribute star edges at 1.0, near-dup
    pairs are reported between representatives, matching the guarded
    dedup-family semantics. The oracle joins on ALL shared shingles with
    no prefix filter, so hash equality doubles as a losslessness proof of
    the prefix optimization."""
    from ..operators.setjoin import prefix_jaccard_join

    docs = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_join(docs, threshold=_X84_T, shingle_size=3)


# --------------------------------------------------------------------------
# X85 (folded into x89, round 16): the grouped-HLL estimate-vs-exact
# report (est_distinct / rel_err / zero_regs over the same p=6 register
# table at the same grouping) was a standalone query through r15 (green
# rows r07-r15); its columns now ride x89's register machinery — the
# direct estimate there IS x85's estimate, so the sweep pays one
# register build instead of two (VERDICT r15 #2 consolidation plan).
# --------------------------------------------------------------------------
_X85_P = 6


# --------------------------------------------------------------------------
# X86 — CMS join-size estimation: the sketch algebra a cost-based planner
# consults before committing to a shuffle join. est = MIN_j sum_p
# A[j][p]*B[j][p] over the two sides' count-min sketches of the join key;
# scored in-query against the exact join cardinality.
# --------------------------------------------------------------------------
_X86_D = 3
_X86_W = 16384

_X86_ORACLE = f"""
    WITH ka AS (
      SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    kb AS (
      SELECT o_orderkey AS k, COUNT(*) AS cnt FROM orders GROUP BY 1
    ),
    ha AS (
      SELECT cnt,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS hx,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS hy
      FROM ka
    ),
    hb AS (
      SELECT cnt,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS hx,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS hy
      FROM kb
    ),
    ca AS (
      SELECT j.g AS j, (hx + j.g * hy) % {_X86_W} AS p,
             CAST(SUM(cnt) AS BIGINT) AS ct
      FROM ha, generate_series(0, {_X86_D - 1}) j(g) GROUP BY 1, 2
    ),
    cb AS (
      SELECT j.g AS j, (hx + j.g * hy) % {_X86_W} AS p,
             CAST(SUM(cnt) AS BIGINT) AS ct
      FROM hb, generate_series(0, {_X86_D - 1}) j(g) GROUP BY 1, 2
    ),
    prod AS (
      SELECT ca.j, SUM(ca.ct * cb.ct) AS row_est
      FROM ca JOIN cb ON ca.j = cb.j AND ca.p = cb.p
      GROUP BY ca.j
    ),
    exact AS (
      SELECT COUNT(*) AS exact_rows
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST((SELECT MIN(row_est) FROM prod) AS BIGINT) AS est_rows,
           exact_rows,
           FLOOR(CAST((SELECT MIN(row_est) FROM prod) AS DOUBLE)
                 / exact_rows * 10000.0 + 0.5) / 10000.0 AS over_ratio
    FROM exact
"""


@query("x86_join_size_estimate", oracle=_X86_ORACLE)
def x86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from count-min sketches of the two join
    sides (operators/sketches.py cms_inner_product): the estimate a
    planner would use to choose broadcast vs shuffle vs skew handling
    BEFORE paying for the join. Each side's sketch is one
    map-side-combinable pass; the inner product is a d*w-row broadcast
    join; the exact join runs alongside purely to score the estimate
    (over_ratio >= 1 by construction — CMS collisions only add).

    Width note: the inner product's additive error is ~N_a*N_b/w, so w
    must scale with the PRODUCT of the sides' row counts, not with key
    cardinality as in point queries — w=16384 holds the observed
    over_ratio near 2 at sf0.01 (w=1024 gave 15.6x: the error term, not
    a bug). At 100 TB a planner sizes w from the sides' row-count
    estimates; the sketch stays broadcastable for any sane w (d*w rows,
    ~400 KB here)."""
    from ..operators.sketches import cms_cells, cms_inner_product

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    est = cms_inner_product(
        cms_cells(li, "l_orderkey", _X86_D, _X86_W),
        cms_cells(orders, "o_orderkey", _X86_D, _X86_W),
        _X86_D,
    )
    exact = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(F.count("*").alias("exact_rows"))
    )
    return est.crossJoin(exact).select(
        "est_rows",
        "exact_rows",
        portable_round(
            F.col("est_rows").cast("double") / F.col("exact_rows"), 4
        ).alias("over_ratio"),
    )


# --------------------------------------------------------------------------
# X87 — embedding-quantization recall: rank by cosine over int fixed-point
# (scale 1000) quantized vectors, score against exact float ground truth.
# Completes the compression story x29 starts: x29 SHRINKS the vectors,
# x87 measures what that costs in retrieval quality.
# --------------------------------------------------------------------------
_X87_K = 5

_X87_ORACLE = f"""
    WITH ex AS (
      SELECT vec_id, GENERATE_SUBSCRIPTS(emb, 1) AS d, UNNEST(emb) AS v
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    ),
    exq AS (
      SELECT vec_id, d, CAST(FLOOR(v * 1000.0 + 0.5) AS BIGINT) AS qv
      FROM ex
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
    qnorms AS (
      SELECT vec_id, SQRT(SUM(CAST(qv * qv AS DOUBLE))) AS nrm
      FROM exq GROUP BY vec_id
    ),
    fdots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.v * b.v) AS dot
      FROM ex a JOIN ex b ON a.d = b.d AND a.vec_id <> b.vec_id
      WHERE a.vec_id BETWEEN 100 AND 109
      GROUP BY a.vec_id, b.vec_id
    ),
    qdots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
             SUM(a.qv * b.qv) AS qdot
      FROM exq a JOIN exq b ON a.d = b.d AND a.vec_id <> b.vec_id
      WHERE a.vec_id BETWEEN 100 AND 109
      GROUP BY a.vec_id, b.vec_id
    ),
    exact_top AS (
      SELECT query_id, cand_id FROM (
        SELECT d.query_id, d.cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.cand_id) AS rnk
        FROM fdots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.cand_id = nc.vec_id) t
      WHERE rnk <= {_X87_K}
    ),
    quant_top AS (
      SELECT query_id, cand_id FROM (
        SELECT d.query_id, d.cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY CAST(d.qdot AS DOUBLE) / (nq.nrm * nc.nrm) DESC,
                          d.cand_id) AS rnk
        FROM qdots d
        JOIN qnorms nq ON d.query_id = nq.vec_id
        JOIN qnorms nc ON d.cand_id = nc.vec_id) t
      WHERE rnk <= {_X87_K}
    )
    SELECT e.query_id,
           CAST(COUNT(q.cand_id) AS INT) AS n_hit,
           FLOOR(COUNT(q.cand_id) / {_X87_K}.0 * 10000.0 + 0.5) / 10000.0
             AS recall_at_k
    FROM exact_top e
    LEFT JOIN quant_top q
      ON q.query_id = e.query_id AND q.cand_id = e.cand_id
    GROUP BY e.query_id
"""


@query("x87_quantized_recall", oracle=_X87_ORACLE)
def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality cost of int fixed-point embedding quantization
    (scale 1000, the x29/k-means quantizer): exact top-5 by QUANTIZED
    cosine vs exact top-5 by float cosine for queries 100-109. The
    quantized dot products are exact int64 (bit-identical across engines
    and partitionings); only the final norm division is float, same as
    every cosine ranking in the engine. At 100 TB quantization is what
    makes the candidate vectors fit executor memory — this harness tells
    you what it costs in recall BEFORE you deploy it."""
    from ..operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    pred = (F.col("vec_id") >= 100) & (F.col("vec_id") <= 109)
    qemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1000.0 + 0.5).cast(
                "double"
            ),
        ).alias("embedding"),
    )
    quant = brute_force_topk(qemb, qemb.filter(pred), k=_X87_K)
    exact = brute_force_topk(emb, emb.filter(pred), k=_X87_K)
    # ONE evaluation of the float ground truth (r17, same rewrite as
    # x83): the former semi-join + qids = exact.distinct() + left join
    # computed the brute-force subtree twice; the left join with a hit
    # marker aggregated per query is the oracle's own shape.
    n_hit = F.col("n_hit")
    return (
        exact.select("query_id", "cand_id")
        .join(
            quant.select("query_id", "cand_id").withColumn(
                "__hit", F.lit(1)
            ),
            ["query_id", "cand_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("__hit").alias("n_hit"))
        .select(
            "query_id",
            n_hit.cast("int").alias("n_hit"),
            portable_round(n_hit / F.lit(float(_X87_K)), 4).alias(
                "recall_at_k"
            ),
        )
    )


# --------------------------------------------------------------------------
# X88 — MinHash recall audit: the guarded probabilistic edge set (x04
# machinery) scored against EXACT Jaccard ground truth (x84 machinery),
# bucketed by similarity band. Closes the loop between the engine's two
# near-dup paths: the exact join is the oracle for the probabilistic one.
# --------------------------------------------------------------------------
def minhash_recall_audit(
    docs: DataFrame,
    threshold: float = 0.5,
    sample_pct: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded recall audit of the guarded MinHash edge set against exact
    shingle-Jaccard ground truth (the x88 harness as a reusable
    operator). ``sample_pct`` bounds BOTH operands to a deterministic
    md5 hash-sample of the corpus (``md5_pct_col(id) < pct``): the audit
    then estimates the banding scheme's r-b recall curve from the sample
    alone, so its cost — including the exact truth side — scales with
    the sample, not the corpus, which is what makes it runnable at
    100 TB (VERDICT r7 #2). The sampled audit is EXACTLY the full audit
    of the sampled subcorpus (parity-tested), every piece of it
    recomputable by any engine from the id hash.

    Plan (r17, guide §1.2 step 1): BOTH operands ride ONE exact-dup
    collapse + ONE materialized distinct-shingle table — the truth side
    is ``prefix_jaccard_join``'s pipeline over it, the found side is
    ``minhash_dedup_edges``'s banding with signatures computed from the
    same token table (bit-identical, see
    ``dedup.minhash_signatures_from_tokens``) — instead of each side
    re-scanning and re-collapsing the corpus independently (measured
    sf0.1: 4.69 -> ~3.1 s benched). The found edge set is distinct by
    construction (chains' b_ids are non-keepers, rep pairs' ids are
    keepers, and ``minhash_candidate_pairs`` ends in a distinct), so no
    extra distinct pass is paid."""
    from ..functions.hashing import md5_pct_col
    from ..operators.dedup import (
        minhash_bands,
        minhash_candidate_pairs,
        minhash_signatures_from_tokens,
    )
    from ..operators.setjoin import (
        _exact_candidates,
        _prefix_table,
        _tokenize,
        _verify,
    )

    if sample_pct is not None:
        docs = docs.filter(md5_pct_col(F.col(id_col)) < sample_pct)
    chains, toks = _tokenize(docs, "text", id_col, 3)
    prefix = _prefix_table(toks, id_col, threshold)
    cand = _exact_candidates(prefix, id_col, threshold)
    truth = chains.select(
        "a_id", "b_id", F.lit(1.0).alias("jaccard")
    ).unionByName(_verify(toks, cand, threshold, id_col))
    sigs = minhash_signatures_from_tokens(toks, id_col, num_hashes=8)
    bands = minhash_bands(
        sigs, id_col=id_col, num_hashes=8, rows_per_band=2, carry_sig=True
    )
    found = chains.unionByName(
        minhash_candidate_pairs(bands, id_col=id_col, bucket_cap=64)
    )
    marked = truth.join(
        found.withColumn("__hit", F.lit(1)), ["a_id", "b_id"], "left"
    )
    band = (
        F.when(F.col("jaccard") >= 0.9, F.lit("hi_0.9_1.0"))
        .when(F.col("jaccard") >= 0.7, F.lit("mid_0.7_0.9"))
        .otherwise(F.lit("lo_0.5_0.7"))
    )
    return marked.groupBy(band.alias("band")).agg(
        F.count("*").cast("int").alias("n_true"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("int").alias("n_hit"),
        portable_round(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            / F.count("*").cast("double"),
            4,
        ).alias("recall"),
    )


def _recall_audit_tail() -> str:
    """Truth-side + scoring CTE tail shared by the x88 (full) and x91
    (sampled) oracles; expects ``reps``/``chains``/``edges`` defined."""
    return """,
    toksx AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM reps)
    ),
    sizesx AS (SELECT doc_id, COUNT(*) AS n FROM toksx GROUP BY doc_id),
    interx AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
      FROM toksx a JOIN toksx b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
      SELECT a_id, b_id, 1.0 AS jac FROM chains
      UNION ALL
      SELECT a_id, b_id,
             FLOOR(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1000000.0 + 0.5)
               / 1000000.0 AS jac
      FROM interx
      JOIN sizesx sa ON sa.doc_id = interx.a_id
      JOIN sizesx sb ON sb.doc_id = interx.b_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
    ),
    marked AS (
      SELECT t.jac, CASE WHEN e.a_id IS NULL THEN 0 ELSE 1 END AS hit
      FROM truth t
      LEFT JOIN (SELECT DISTINCT a_id, b_id FROM edges) e
        ON e.a_id = t.a_id AND e.b_id = t.b_id
    )
    SELECT CASE WHEN jac >= 0.9 THEN 'hi_0.9_1.0'
                WHEN jac >= 0.7 THEN 'mid_0.7_0.9'
                ELSE 'lo_0.5_0.7' END AS band,
           CAST(COUNT(*) AS INT) AS n_true,
           CAST(SUM(hit) AS INT) AS n_hit,
           FLOOR(SUM(hit) / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5)
             / 10000.0 AS recall
    FROM marked
    GROUP BY 1
    """


def _x88_oracle() -> str:
    from .extensions import _minhash_guarded_edges_oracle

    return _minhash_guarded_edges_oracle() + _recall_audit_tail()


@query("x88_minhash_recall_audit", oracle=_x88_oracle())
def x88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the guarded MinHash near-dup edge set, measured against
    EXACT shingle-Jaccard ground truth (the x84 prefix join) and bucketed
    by true similarity — the empirical r-b curve check (8 hashes, 4
    bands of 2: theoretical recall 1-(1-s^2)^4, so ~0.68 at s=0.5 rising
    to ~1 at s=0.9) that tells a pipeline owner whether the banding
    scheme matches their dedup threshold BEFORE a 100 TB run. Both
    operands are the engine's own production paths; at scale the truth
    side runs on a SAMPLE (``minhash_recall_audit(sample_pct=...)``,
    attested as x91) — here the corpus is small enough to audit
    exhaustively."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_recall_audit(docs, threshold=0.5, sample_pct=None)


# --------------------------------------------------------------------------
# X89 — HLL register ROLLUP: registers stored at fine granularity
# ((l_returnflag, l_linestatus)) answer the coarse (l_returnflag) distinct
# question by MAX-merging — without touching raw data again. The payoff of
# a mergeable sketch over exact COUNT(DISTINCT): exact per-cell distinct
# counts canNOT be rolled up (overlap is lost), registers can, losslessly.
# --------------------------------------------------------------------------
def _x89_oracle() -> str:
    from ..operators.hll import HASH_BITS, _alpha

    p = _X85_P
    m = 1 << p
    w_bits = HASH_BITS - p
    s_shift = w_bits + 1
    num = float(_alpha(m)) * float(m * m) * float(1 << s_shift)
    return f"""
    WITH rh AS (
      SELECT l_returnflag AS flag, l_linestatus AS status,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM lineitem
    ),
    rbr AS (
      SELECT flag, status, h // {1 << w_bits} AS bucket,
             CASE WHEN h % {1 << w_bits} = 0 THEN {w_bits + 1}
                  ELSE {w_bits + 1} - length(bin(h % {1 << w_bits}))
             END AS rank
      FROM rh
    ),
    fine AS (
      SELECT flag, status, bucket, MAX(rank) AS reg
      FROM rbr GROUP BY flag, status, bucket
    ),
    rolled AS (
      SELECT flag, bucket, MAX(reg) AS reg FROM fine GROUP BY flag, bucket
    ),
    rollagg AS (
      SELECT flag, SUM((1::BIGINT << ({s_shift} - reg))) AS s_nz,
             COUNT(*) AS nz
      FROM rolled GROUP BY flag
    ),
    rollest AS (
      SELECT flag,
             {num!r} / CAST(s_nz + ({m} - nz) * (1::BIGINT << {s_shift})
                            AS DOUBLE) AS est
      FROM rollagg
    ),
    direg AS (
      SELECT flag, bucket, MAX(rank) AS reg FROM rbr GROUP BY flag, bucket
    ),
    diagg AS (
      SELECT flag, SUM((1::BIGINT << ({s_shift} - reg))) AS s_nz,
             COUNT(*) AS nz
      FROM direg GROUP BY flag
    ),
    diest AS (
      SELECT flag,
             {num!r} / CAST(s_nz + ({m} - nz) * (1::BIGINT << {s_shift})
                            AS DOUBLE) AS est,
             CAST({m} - nz AS INT) AS zero_regs
      FROM diagg
    ),
    exq AS (
      SELECT l_returnflag AS flag,
             COUNT(DISTINCT l_orderkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT r.flag AS l_returnflag,
           FLOOR(r.est * 10000.0 + 0.5) / 10000.0 AS est_rollup,
           FLOOR(d.est * 10000.0 + 0.5) / 10000.0 AS est_direct,
           CAST(e.exact_distinct AS INT) AS exact_distinct,
           FLOOR((d.est - e.exact_distinct) / e.exact_distinct
                 * 10000.0 + 0.5) / 10000.0 AS rel_err,
           d.zero_regs
    FROM rollest r
    JOIN diest d ON d.flag = r.flag
    JOIN exq e ON e.flag = r.flag
    """


@query("x89_hll_rollup", oracle=_x89_oracle())
def x89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch rollup: per-(l_returnflag, l_linestatus) HLL registers are
    MAX-merged up to l_returnflag and estimated, alongside the estimate
    computed directly from raw rows — est_rollup == est_direct EXACTLY
    (MAX over a partition refinement is MAX), which is the property that
    makes register tables a storable pre-aggregation: at 100 TB you
    persist registers per (source, day) once and answer ANY coarser
    distinct question by merging m longs per cell, no raw-data pass.
    Exact per-cell COUNT(DISTINCT)s cannot do this (overlap across cells
    is lost at aggregation time).

    Carries the former x85_hll_distinct verdict columns since round 16
    (rel_err of the direct estimate vs the exact count, and the direct
    register table's zero_regs): the direct estimate here IS x85's
    estimate — same p=6 register arithmetic, same grouping — so the
    consolidated row attests both contracts off ONE register build
    (VERDICT r15 #2; x85 green history r07-r15)."""
    from ..operators.hll import hll_distinct, hll_estimate, hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    fine = hll_registers(
        li, "l_orderkey", ["l_returnflag", "l_linestatus"], p=_X85_P
    )
    rolled = fine.groupBy("l_returnflag", "bucket").agg(
        F.max("reg").alias("reg")
    )
    est_roll = hll_estimate(rolled, ["l_returnflag"], p=_X85_P).select(
        "l_returnflag", portable_round(F.col("est"), 4).alias("est_rollup")
    )
    est_dir = hll_distinct(
        li, "l_orderkey", ["l_returnflag"], p=_X85_P
    ).select(
        "l_returnflag",
        portable_round(F.col("est"), 4).alias("est_direct"),
        F.col("est").alias("est_raw"),
        "zero_regs",
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("int").alias("exact_distinct")
    )
    return (
        est_roll.join(est_dir, "l_returnflag")
        .join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "est_rollup",
            "est_direct",
            "exact_distinct",
            portable_round(
                (F.col("est_raw") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
            "zero_regs",
        )
    )
