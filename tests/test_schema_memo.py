"""Footer-schema memo (sources/tables.py — guide §1.2/§6: a bare
``spark.read.parquet`` fires a schema-inference job per call; the memo
makes every table/fixture reference after the first in a session
job-free while returning byte-identical frames)."""

from __future__ import annotations

from detecting_and_addressing_change_spark.sources.tables import (
    _FOOTER_SCHEMAS,
    forget_footer_schemas,
    load_table,
    read_parquet_cached_schema,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _jobs_fired(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(tag))


def test_load_table_schema_matches_inference(spark):
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        via_memo = load_table(spark, SF_SMOKE, name)
        bare = spark.read.parquet(f"{SF_SMOKE}/{name}.parquet")
        if name == "events":
            # load_table normalizes ts (nanos/NTZ -> session timestamp);
            # compare the raw footer schema instead
            assert (
                _FOOTER_SCHEMAS[
                    (spark.sparkContext.applicationId, SF_SMOKE, name)
                ]
                == bare.schema
            )
        else:
            assert via_memo.schema == bare.schema
        # values identical through the memoized read
        assert via_memo.count() == bare.count()


def test_load_table_second_reference_fires_no_job(spark):
    load_table(spark, SF_SMOKE, "orders")  # prime the memo
    n = _jobs_fired(
        spark, "memo-probe", lambda: load_table(spark, SF_SMOKE, "orders")
    )
    assert n == 0, "memoized load_table must not fire inference jobs"


def test_read_parquet_cached_schema_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(100).selectExpr(
        "id", "cast(id as string) s", "id * 2.5 d"
    ).write.parquet(p)
    first = read_parquet_cached_schema(spark, p)
    bare = spark.read.parquet(p)
    assert first.schema == bare.schema
    assert sorted(r.id for r in first.collect()) == list(range(100))
    n = _jobs_fired(
        spark,
        "memo-probe-2",
        lambda: read_parquet_cached_schema(spark, p).schema,
    )
    assert n == 0
    forget_footer_schemas(p)
    key = (spark.sparkContext.applicationId, "", p)
    assert key not in _FOOTER_SCHEMAS
