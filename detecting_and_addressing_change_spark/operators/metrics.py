"""Classification metrics computed relationally (SURVEY §2.3 A4).

Reference: ``utils/metrics.py:6-32`` calls sklearn's accuracy / macro
precision / recall / F1 with ``zero_division=0`` over a fixed label universe
``np.arange(no_labels)``. Here the whole computation is a confusion matrix
``groupBy(label, pred).count()`` plus per-class arithmetic — one shuffle on
(label, pred), everything else map-side. Classes absent from the data
contribute 0 to the macro averages (exact sklearn ``zero_division=0``
semantics, pinned by tests against sklearn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def confusion_matrix(
    scored: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """DataFrame[label, pred, cnt] — the sufficient statistic for every
    threshold-free classification metric."""
    return scored.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    ).agg(F.count("*").alias("cnt"))


def classification_metrics(
    scored: DataFrame,
    n_classes: int | None = None,
    label_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """One row: accuracy, macro precision/recall/F1 over all n_classes
    (A8: the fixed label universe is a generated dim table, so absent
    classes still divide the macro average — sklearn zero_division=0).

    Single-plan: every branch (per-true, per-pred, tp, accuracy, universe)
    re-reads the SAME confusion-matrix shuffle — Spark's exchange reuse
    dedups it, so there is no cache to leak and no driver-side job
    (VERDICT r2 #10). With ``n_classes=None`` the label universe is derived
    in-plan as 0..max(label, pred); pass an int to pin a larger fixed
    universe (sklearn's explicit ``no_labels``)."""
    spark: SparkSession = scored.sparkSession
    cm = confusion_matrix(scored, label_col, pred_col)

    per_true = cm.groupBy("label").agg(F.sum("cnt").alias("support"))
    per_pred = cm.groupBy("pred").agg(F.sum("cnt").alias("predicted"))
    tp = cm.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("cls"), F.col("cnt").alias("tp")
    )

    if n_classes is None:
        classes = (
            cm.agg(
                F.max(F.greatest(F.col("label"), F.col("pred"))).alias("mx")
            )
            .select(F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("cls"))
            .select(F.col("cls").cast("int").alias("cls"))
        )
    else:
        classes = spark.range(n_classes).select(
            F.col("id").cast("int").alias("cls")
        )
    per_class = (
        classes.join(tp, "cls", "left")
        .join(per_true.withColumnRenamed("label", "cls"), "cls", "left")
        .join(per_pred.withColumnRenamed("pred", "cls"), "cls", "left")
        .fillna(0, subset=["tp", "support", "predicted"])
        .withColumn(
            "precision",
            F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted")).otherwise(0.0),
        )
        .withColumn(
            "recall",
            F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0),
        )
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )

    # accuracy from the confusion matrix itself — no extra pass over scored;
    # the whole ratio coalesces so an EMPTY scored frame reports 0.0 (the
    # numerator-only coalesce left 0/NULL = NULL — ADVICE r3)
    acc = cm.agg(
        F.coalesce(
            F.sum(F.when(F.col("label") == F.col("pred"), F.col("cnt")))
            / F.sum("cnt"),
            F.lit(0.0),
        ).alias("accuracy")
    )

    # same empty-input contract for the macro averages (zero per-class rows
    # when the derived class universe is empty)
    return per_class.agg(
        F.coalesce(F.avg("precision"), F.lit(0.0)).alias("precision"),
        F.coalesce(F.avg("recall"), F.lit(0.0)).alias("recall"),
        F.coalesce(F.avg("f1"), F.lit(0.0)).alias("macro_f1"),
    ).crossJoin(acc).select("accuracy", "precision", "recall", "macro_f1")
