"""CSV / JSONL sources (sources/files.py): explicit-schema round-trips,
corrupt-row quarantine, FAILFAST contract mode."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.sources.files import (
    quarantine_split,
    read_csv,
    read_jsonl,
)

CSV_SCHEMA = "id BIGINT, name STRING, score DOUBLE"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    (d / "part1.csv").write_text(
        "id,name,score\n1,alpha,0.5\n2,beta,1.5\nnot-a-number,gamma,2.0\n"
    )
    (d / "part2.csv").write_text("id,name,score\n4,delta,3.25\n")
    return str(d)


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    (d / "a.jsonl").write_text(
        '{"id": 1, "name": "alpha", "score": 0.5}\n'
        '{"id": 2, "name": "beta", "score": 1.5}\n'
        "this is not json\n"
    )
    return str(d)


def test_csv_permissive_quarantine(spark, csv_dir):
    df = read_csv(spark, csv_dir, CSV_SCHEMA)
    clean, bad = quarantine_split(df)
    assert clean.count() == 3
    assert {r.name for r in clean.collect()} == {"alpha", "beta", "delta"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "gamma" in bad_rows[0]["_corrupt"]  # raw line kept for triage


def test_csv_failfast_raises(spark, csv_dir):
    with pytest.raises(Exception):
        read_csv(spark, csv_dir, CSV_SCHEMA, strict=True).collect()


def test_csv_types_enforced(spark, csv_dir):
    clean, _ = quarantine_split(read_csv(spark, csv_dir, CSV_SCHEMA))
    assert dict(clean.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
    }
    assert clean.filter(F.col("score") > 1.0).count() == 2


def test_jsonl_permissive_quarantine(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, CSV_SCHEMA)
    clean, bad = quarantine_split(df)
    assert clean.count() == 2
    assert bad.count() == 1


def test_parquet_schema_evolution(spark, tmp_path):
    """Old files lack the later-added column: merged read nulls it for old
    vintages, pins the target schema, and refuses silently-vanished
    columns."""
    import pytest
    from pyspark.sql import types as T

    from detecting_and_addressing_change_spark.sources.files import (
        read_parquet_evolved,
    )

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(v1)
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.parquet(v2)

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    got = read_parquet_evolved(spark, [v1, v2], target)
    assert [f.name for f in got.schema.fields] == ["id", "name", "score"]
    rows = sorted(map(tuple, got.collect()))
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", 0.5)]

    bad = T.StructType([T.StructField("renamed_id", T.LongType())])
    with pytest.raises(ValueError, match="renamed_id"):
        read_parquet_evolved(spark, [v1, v2], bad)
