"""Incremental Gaussian Naive Bayes as relational sufficient statistics
(SURVEY §2.3 A7).

Reference: sklearn ``GaussianNB.partial_fit`` called per micro-batch
(``models/wos_train_nb.py:49,55,78``). GaussianNB's per-class, per-dimension
state is (count, mean, variance) — exactly a distributed aggregation:

    groupBy(label) -> count, mean(x_d), var_pop(x_d)  per dimension d

The count/mean/M2 merge is associative and order-independent, so the result
is EXACT regardless of partitioning — a textbook map-side-combinable agg
(SURVEY §4.3). Fit state lives in a small DataFrame (n_classes x dim);
predict folds it into the plan: a ZERO-shuffle narrow map with the class
statistics as expression literals when n_classes x dim is small, a
broadcast join + per-row argmax re-aggregation when the unrolled
expression would outgrow Catalyst. Either way, all JVM-side.
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
    """Predict: ZERO-shuffle narrow map. The stats table is driver-small by
    construction (n_classes x dim), so every class's log-posterior

        log P(y) + sum_d [ -0.5 log(2 pi var_yd) - (x_d - mu_yd)^2 / (2 var_yd) ]

    is unrolled into a plain whole-stage-codegen expression with the class's
    means/variances/prior folded in as double literals, and the argmax is
    ``greatest`` over (log_post, -label) structs — lexicographic, so ties
    pick the LOWEST label (sklearn argmax-first). No crossJoin with the
    class table, no groupBy re-aggregation: at 100 TB the previous shape
    shuffled rows x classes; this one shuffles NOTHING.

    sklearn adds var_smoothing = eps * max(var) to every variance;
    replicated here so fit/predict matches sklearn exactly on the same data.

    ``stats`` is either the fit-stats DataFrame or a pre-collected row list
    from :func:`nb_collect_stats`. Consumers compare at the prediction /
    rounded level (summation-order ulps differ from the previous
    crossJoin form, exactly as they do between any two partitionings)."""
    import math

    rows = stats.collect() if isinstance(stats, DataFrame) else list(stats)
    if not rows:
        raise ValueError("nb_predict: empty stats — fit saw no data")
    total = sum(r["cnt"] for r in rows)
    per_class_max = [max(r["vars"]) for r in rows if r["vars"]]
    max_var = max(per_class_max) if per_class_max else None
    eps = var_smoothing * float(max_var if max_var is not None else 1.0)

    dim = len(rows[0]["means"])
    if len(rows) * dim > 256:
        # a fully-unrolled projection with n_classes*dim literal terms blows
        # up Catalyst analysis (thousands of nodes) and splits codegen; past
        # this point the broadcast-join form plans faster and its shuffle is
        # only the per-row argmax re-aggregation
        return _nb_predict_bcast(
            df, rows, total, eps, dim, features_col, id_cols
        )
    class_structs = []
    for r in sorted(rows, key=lambda r: r["label"]):
        lp = F.lit(math.log(r["cnt"] / float(total)))
        for d in range(dim):
            v = float(r["vars"][d]) + eps
            m = float(r["means"][d])
            x = F.element_at(F.col(features_col), d + 1).cast("double")
            lp = lp + (
                F.lit(-0.5 * math.log(2.0 * math.pi * v))
                - (x - F.lit(m)) * (x - F.lit(m)) / F.lit(2.0 * v)
            )
        class_structs.append(
            F.struct(
                lp.alias("lp"), F.lit(-int(r["label"])).alias("neg")
            )
        )
    best = (
        class_structs[0]
        if len(class_structs) == 1
        else F.greatest(*class_structs)
    )
    return df.select(
        *id_cols,
        (-best["neg"]).cast("int").alias("pred"),
        best["lp"].alias("max_log_post"),
    )


def _nb_predict_bcast(
    df: DataFrame,
    rows: list,
    total,
    eps: float,
    dim: int,
    features_col: str,
    id_cols: tuple[str, ...],
) -> DataFrame:
    """Broadcast-join predict for large n_classes x dim: rows x classes
    scored via one per-dim unrolled expression over the (tiny, broadcast)
    class table, argmax re-aggregated per row. One shuffle of
    rows x classes key/struct pairs — the price of a plannable expression
    when the fully-unrolled narrow form would exceed Catalyst's comfort."""
    import math

    stats_local = df.sparkSession.createDataFrame(rows, STATS_SCHEMA)
    st = F.broadcast(
        stats_local.select(
            F.col("label").alias("nb_label"),
            (F.log(F.col("cnt") / F.lit(float(total)))).alias("log_prior"),
            "means",
            F.transform("vars", lambda v: v + F.lit(eps)).alias("vars_s"),
        )
    )
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
