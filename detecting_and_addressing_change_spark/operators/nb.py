"""Incremental Gaussian Naive Bayes as relational sufficient statistics
(SURVEY §2.3 A7).

Reference: sklearn ``GaussianNB.partial_fit`` called per micro-batch
(``models/wos_train_nb.py:49,55,78``). GaussianNB's per-class, per-dimension
state is (count, mean, variance) — exactly a distributed aggregation:

    groupBy(label) -> count, mean(x_d), var_pop(x_d)  per dimension d

The count/mean/M2 merge is associative and order-independent, so the result
is EXACT regardless of partitioning — a textbook map-side-combinable agg
(SURVEY §4.3). Fit state lives in a small DataFrame (n_classes x dim);
predict broadcast-joins it and computes the Gaussian log-likelihood with
higher-order array functions, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATS_SCHEMA = T.StructType(
    [
        T.StructField("label", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("vars", T.ArrayType(T.DoubleType())),
    ]
)


def nb_fit(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Fit: DataFrame[label, cnt, means: array<double>, vars: array<double>].

    features is array<numeric>. With ``dim`` known (it is a schema contract
    everywhere this engine runs), the per-dimension count/sum/sum-of-squares
    run as 2*dim+1 UNROLLED aggregate expressions in ONE groupBy(label) —
    no row explosion, one shuffle, map-side partial agg collapsing each
    partition to n_classes rows of 2*dim+1 doubles. Without ``dim`` the
    posexplode fallback computes the same statistics in two shuffles.
    mean = s1/n, var = s2/n - mean^2 (population variance, matching
    sklearn's internal update). Summation ORDER differs between the paths
    (floating sums are partition-order-dependent in any distributed agg);
    every consumer compares at the prediction/rounded level, which both
    paths satisfy identically."""
    if dim is not None:
        aggs = [F.count("*").alias("cnt")]
        for d in range(1, dim + 1):
            x = F.element_at(F.col(features_col), d).cast("double")
            aggs.append(F.sum(x).alias(f"__s1_{d}"))
            aggs.append(F.sum(x * x).alias(f"__s2_{d}"))
        g = df.groupBy(F.col(label_col).alias("label")).agg(*aggs)
        means = [F.col(f"__s1_{d}") / F.col("cnt") for d in range(1, dim + 1)]
        variances = [
            F.col(f"__s2_{d}") / F.col("cnt") - m * m
            for d, m in zip(range(1, dim + 1), means)
        ]
        return g.select(
            "label",
            "cnt",
            F.array(*means).alias("means"),
            F.array(*variances).alias("vars"),
        )
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(features_col)).alias("d", "v"),
    ).select("label", "d", F.col("v").cast("double").alias("v"))

    per_dim = exploded.groupBy("label", "d").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    per_dim = per_dim.select(
        "label",
        "n",
        F.struct(
            "d",
            (F.col("s1") / F.col("n")).alias("mean"),
            (
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
            ).alias("var"),
        ).alias("stat"),
    )
    assembled = per_dim.groupBy("label").agg(
        F.max("n").alias("cnt"),
        F.array_sort(F.collect_list("stat")).alias("stats"),
    )
    return assembled.select(
        "label",
        "cnt",
        F.transform("stats", lambda s: s["mean"]).alias("means"),
        F.transform("stats", lambda s: s["var"]).alias("vars"),
    )


def nb_merge(stats_a: DataFrame, stats_b: DataFrame) -> DataFrame:
    """Merge two fitted stats tables (the partial_fit across micro-batches):
    exact count/mean/M2 combine, order-independent."""
    a = stats_a.select(
        "label",
        F.col("cnt").alias("cnt_a"),
        F.col("means").alias("m_a"),
        F.col("vars").alias("v_a"),
    )
    b = stats_b.select(
        "label",
        F.col("cnt").alias("cnt_b"),
        F.col("means").alias("m_b"),
        F.col("vars").alias("v_b"),
    )
    joined = a.join(b, "label", "full")
    # null-safe: a side may be missing a class
    cnt_a = F.coalesce(F.col("cnt_a"), F.lit(0))
    cnt_b = F.coalesce(F.col("cnt_b"), F.lit(0))
    n = cnt_a + cnt_b
    m_a = F.coalesce(F.col("m_a"), F.col("m_b"))
    m_b2 = F.coalesce(F.col("m_b"), F.col("m_a"))
    v_a = F.coalesce(F.col("v_a"), F.col("v_b"))
    v_b2 = F.coalesce(F.col("v_b"), F.col("v_a"))
    mean = F.zip_with(m_a, m_b2, lambda x, y: (cnt_a * x + cnt_b * y) / n)
    # combined M2: M2 = M2a + M2b + delta^2 * na*nb/n  (per dimension)
    var = F.zip_with(
        F.zip_with(v_a, v_b2, lambda va, vb: cnt_a * va + cnt_b * vb),
        F.zip_with(m_a, m_b2, lambda x, y: (x - y) * (x - y)),
        lambda m2s, d2: (m2s + d2 * cnt_a * cnt_b / n) / n,
    )
    return joined.select(
        "label", n.alias("cnt"), mean.alias("means"), var.alias("vars")
    )


def nb_collect_stats(stats: DataFrame) -> list:
    """Materialize a fit-stats plan driver-side (n_classes x dim — always
    tiny). Callers scoring several frames against ONE fit should collect
    once and pass the rows to each ``nb_predict``; otherwise every predict
    re-runs the whole fit aggregation (and whatever lineage feeds it)."""
    return stats.collect()


def nb_predict(
    df: DataFrame,
    stats,
    features_col: str = "features",
    var_smoothing: float = 1e-9,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Predict: broadcast-join the (tiny) stats table against every row and
    take argmax over class log-posteriors:

        log P(y) + sum_d [ -0.5 log(2 pi var_yd) - (x_d - mu_yd)^2 / (2 var_yd) ]

    sklearn adds var_smoothing = eps * max(var) to every variance; replicated
    here (computed from the stats table) so fit/predict matches sklearn
    exactly on the same data.

    ``stats`` is either the fit-stats DataFrame or a pre-collected row list
    from :func:`nb_collect_stats` (plus the stats schema is reconstructed
    from the rows)."""
    import math

    # stats is n_classes x dim — always driver-small. Collect it ONCE and
    # rebuild a local DataFrame: one job instead of (persist + agg job +
    # broadcast-build job), and no cached RDD left behind for the caller
    # to leak.
    if isinstance(stats, DataFrame):
        rows = stats.collect()
        schema = stats.schema
    else:
        rows = list(stats)
        schema = STATS_SCHEMA
    total = sum(r["cnt"] for r in rows)
    per_class_max = [max(r["vars"]) for r in rows if r["vars"]]
    max_var = max(per_class_max) if per_class_max else None
    eps = var_smoothing * float(max_var if max_var is not None else 1.0)
    stats_local = df.sparkSession.createDataFrame(rows, schema)

    st = F.broadcast(
        stats_local.select(
            F.col("label").alias("nb_label"),
            (F.log(F.col("cnt") / F.lit(float(total)))).alias("log_prior"),
            "means",
            F.transform("vars", lambda v: v + F.lit(eps)).alias("vars_s"),
        )
    )
    # Per-dim arithmetic is UNROLLED over element_at instead of written as
    # zip_with/aggregate lambdas: higher-order array functions evaluate
    # interpreted (outside whole-stage codegen), and this expression runs
    # once per (row x class) — the hottest expression in the pipeline. The
    # fold order (d = 1..dim, left to right) is unchanged, so results stay
    # bit-identical to the SQL oracles.
    dim = len(rows[0]["means"]) if rows else 0
    log_lik = F.lit(0.0)
    for d in range(1, dim + 1):
        x = F.element_at(F.col(features_col), d).cast("double")
        m = F.element_at(F.col("means"), d)
        v = F.element_at(F.col("vars_s"), d)
        log_lik = log_lik + (
            -0.5 * F.log(2.0 * math.pi * v) - (x - m) * (x - m) / (2.0 * v)
        )

    scored = df.crossJoin(st).withColumn(
        "log_post", F.col("log_prior") + log_lik
    )
    # argmax over classes per row, window-free: max of a (log_post, -label)
    # struct is lexicographic, so ties pick the LOWEST label — sklearn's
    # argmax-first semantics.
    keys = [F.col(c) for c in id_cols]
    best = F.max(
        F.struct(
            F.col("log_post").alias("lp"), (-F.col("nb_label")).alias("neg")
        )
    ).alias("best")
    return scored.groupBy(*keys).agg(best).select(
        *id_cols,
        (-F.col("best.neg")).cast("int").alias("pred"),
        F.col("best.lp").alias("max_log_post"),
    )
