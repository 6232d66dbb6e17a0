"""Exact set-similarity join with prefix filtering (SSJoin/PPJoin family).

The MinHash path (operators/dedup.py) is probabilistic: band collisions
can MISS a true near-dup pair. This operator is the exact-threshold
complement — every pair with shingle-set Jaccard >= t is returned, no
recall loss — using the prefix-filtering principle (Chaudhuri et al.
ICDE'06, Bayardo et al. WWW'07): order each set's tokens by ascending
global document frequency; a qualifying pair must share a token inside
both members' short df-ordered prefixes (asymmetric lengths — see the
role comment in the implementation).
Joining on PREFIX tokens only — each document's globally rarest tokens —
prunes the candidate space the way the full inverted-index self-join
(ngram_jaccard_pairs) cannot: stop-shingles shared by everything never
enter the join.

Scale shape at 100 TB:
- exact-duplicate collapse first (dedup.collapse_exact — the shared
  hot-bucket defense): byte-identical boilerplate collapses to one
  representative before any token work, so mass duplicates cost one
  digest window, not a quadratic token join;
- document frequency = one token groupBy; prefix selection = one
  row_number window per document;
- the candidate join runs on prefix tokens whose fan-out is their global
  df — and df-ORDERING concentrates the prefix on the rare tail, so the
  per-token join groups stay narrow (a token that is globally common is
  in a document's prefix only when nearly all its tokens are common);
- the size filter t*max(|x|,|y|) <= min(|x|,|y|) (a Jaccard necessary
  condition) prunes candidates before verification;
- verification touches candidate pairs only.

The result keeps the guarded dedup-family semantics: exact-dup groups
contribute their keeper->member star edges (jaccard 1.0), never all
quadratic within-group pairs; near-dup pairs are reported between
representatives. The DuckDB oracle for x84 verifies WITHOUT the prefix
filter (full inverted-index join), so the hash match is an empirical
proof of the filter's losslessness on top of the unit tests.

Honest cost model (measured at 10x, BENCH_NOTES round 7): candidate
generation is Theta(sum over prefix tokens of df(w)^2) — the same term
that governs every published parallel SSJoin (Vernica SIGMOD'10). On
corpora whose token space grows with the corpus (real crawls) prefix dfs
stay flat and the join is ~linear; on LOW-ENTROPY corpora the shingle
space saturates, dfs grow with the corpus, and the exact join goes
super-linear — by nature, not by plan. When exactness is not required at
that scale, the linear alternative is the guarded MinHash candidate path
(operators/dedup.py) feeding the same exact verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..functions.text import word_ngrams_col
from ..sources.tables import spread_small_input
from .dedup import collapse_exact


def prefix_jaccard_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_size: int = 3,
) -> DataFrame:
    """DataFrame[a_id, b_id, jaccard]: all pairs with word-``shingle_size``-
    gram set Jaccard >= ``threshold`` (a_id < b_id), exact-dup star edges
    included at jaccard 1.0.

    ``threshold`` should be exactly representable in binary (0.5, 0.25,
    0.75) so the >= comparison is engine-portable without rounding."""
    chains, reps = collapse_exact(df, text_col, id_col)
    toks = spread_small_input(reps).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_col(F.col(text_col), shingle_size))
        ).alias("w"),
    )
    # materialize the tokenized corpus ONCE: six downstream branches
    # (df-counts, sizes, both prefix sides, both verify sides) consume it,
    # and Spark does not dedupe common subplans — without this the
    # collapse window + shingle explode re-runs per branch (observed: 30
    # Exchanges at sf0.01 vs 13 after). localCheckpoint (the repo's
    # materialize-once idiom, operators/graph.py:16) also truncates the
    # digest-window lineage out of every downstream stage.
    toks = toks.localCheckpoint(eager=True)
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("n"))
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    # Asymmetric prefixes (Bayardo et al. WWW'07 all-pairs): order pair
    # roles by (n, id) — the lexicographically smaller doc PROBES, the
    # larger INDEXES — and each role needs only its own overlap lower
    # bound:
    #   probe side x (nx <= ny):  i >= t/(1+t)*(nx+ny) >= 2t/(1+t)*nx
    #     -> probe prefix  nx - ceil(2t/(1+t)*nx) + 1   (~n/3 at t=0.5)
    #   index side y:             i >= t*ny  (given the size filter)
    #     -> index prefix  ny - ceil(t*ny) + 1          (~n/2 at t=0.5)
    # Join rows drop from sum(df_sym^2) to sum(df_probe * df_index). The
    # 1e-9 guard keeps float ceil from overshooting the exact rational
    # bound when 2t/(1+t)*n lands on an integer (which would shorten a
    # prefix below the theorem's length and lose pairs).
    probe_frac = 2.0 * threshold / (1.0 + threshold)
    li = F.col("n") - F.ceil(
        F.lit(threshold) * F.col("n") - F.lit(1e-9)
    ) + 1
    lp = F.col("n") - F.ceil(
        F.lit(probe_frac) * F.col("n") - F.lit(1e-9)
    ) + 1
    prefix = (
        toks.join(dfreq, "w")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy(id_col).orderBy("df", "w")),
        )
        .join(sizes, id_col)
        .filter(F.col("rk") <= li)
        .select(
            F.col(id_col), "w", "n", "rk", (F.col("rk") <= lp).alias("__pr")
        )
    )
    a = prefix.filter(F.col("__pr")).select(
        F.col(id_col).alias("a_id"),
        "w",
        F.col("n").alias("na"),
        F.col("rk").alias("pa"),
    )
    b = prefix.select(
        F.col(id_col).alias("b_id"),
        "w",
        F.col("n").alias("nb"),
        F.col("rk").alias("pb"),
    )
    # PPJoin positional filters (Xiao et al. VLDB'08), exact: both bounds
    # come free from the groupBy that dedups the candidate pairs, and both
    # rest on ORDER CONSISTENCY — shared tokens appear in the same relative
    # order in every document under the one global (df, w) sort, so
    #   (1) no shared token precedes the FIRST shared prefix token in
    #       either document: i <= 1 + min(na - pa1, nb - pb1);
    #   (2) every shared token not counted in the prefix intersection
    #       follows the LAST shared prefix token in BOTH documents:
    #       i <= cnt + min(na - paL, nb - pbL).
    # Jaccard >= t needs i >= t*(na+nb)/(1+t); pairs whose upper bounds
    # cannot reach it are dropped BEFORE the verification join — on
    # low-entropy corpora (tiny shingle spaces) most spurious one-token
    # collisions die here. Pruning is internal and lossless, so the
    # DuckDB oracle needs no mirror.
    required = F.lit(threshold) * (F.col("na") + F.col("nb")) / F.lit(
        1.0 + threshold
    )
    cand = (
        a.join(b, "w")
        .filter(
            # role order: probe side strictly (n, id)-smaller
            (
                (F.col("na") < F.col("nb"))
                | (
                    (F.col("na") == F.col("nb"))
                    & (F.col("a_id") < F.col("b_id"))
                )
            )
            # Jaccard >= t  =>  t * max <= min; na <= nb by role order
            & (F.lit(threshold) * F.col("nb") <= F.col("na"))
        )
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(
            F.count("*").alias("cnt"),
            F.min("pa").alias("pa1"),
            F.min("pb").alias("pb1"),
            F.max("pa").alias("paL"),
            F.max("pb").alias("pbL"),
        )
        .filter(
            (
                1
                + F.least(
                    F.col("na") - F.col("pa1"), F.col("nb") - F.col("pb1")
                )
                >= required
            )
            & (
                F.col("cnt")
                + F.least(
                    F.col("na") - F.col("paL"), F.col("nb") - F.col("pbL")
                )
                >= required
            )
        )
        .select("a_id", "b_id", "na", "nb")
    )
    # verify: exact intersection size over the FULL token sets of the
    # candidate pairs only
    ta = toks.select(F.col(id_col).alias("a_id"), "w")
    tb = toks.select(F.col(id_col).alias("b_id"), "w")
    inter = (
        cand.join(ta, "a_id")
        .join(tb, ["b_id", "w"])
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    # role ids are ordered by (n, id), not by id — normalize the output
    # pair to (smaller id, larger id), the declared orientation
    verified = inter.filter(
        F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
        >= F.lit(threshold)
    ).select(
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
        portable_round(
            F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
        ).alias("jaccard"),
    )
    return chains.select(
        "a_id", "b_id", F.lit(1.0).alias("jaccard")
    ).unionByName(verified)
