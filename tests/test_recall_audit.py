"""Sample-bounded recall audit (extensions11.minhash_recall_audit):
the sampled audit must BE the full audit of the sampled subcorpus —
no separate code path, no estimator drift (VERDICT r7 #2 done-criterion).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.functions.hashing import (
    md5_pct_col,
)
from detecting_and_addressing_change_spark.queries.extensions11 import (
    minhash_recall_audit,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while a cat "
        "watches from the windowsill with mild interest every day"
    )
    rows = []
    for i in range(60):
        if i % 6 == 0:
            rows.append((i, base))
        elif i % 6 == 1:
            rows.append((i, base.replace("mild", f"keen{i}")))
        else:
            rows.append(
                (
                    i,
                    f"doc {i} has its own vocabulary about topic {i} with "
                    f"plenty of words to shingle cleanly line {i} end {i}",
                )
            )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["band"], r["n_true"], r["n_hit"], r["recall"]) for r in df.collect()
    )


@pytest.mark.parametrize("pct", [40, 60, 100])
def test_sampled_audit_equals_full_audit_of_sample(spark, docs, pct):
    sampled = minhash_recall_audit(docs, threshold=0.5, sample_pct=pct)
    manual = minhash_recall_audit(
        docs.filter(md5_pct_col(F.col("doc_id")) < pct),
        threshold=0.5,
        sample_pct=None,
    )
    got, want = _rows(sampled), _rows(manual)
    assert got == want
    if pct == 100:
        assert got == _rows(
            minhash_recall_audit(docs, threshold=0.5, sample_pct=None)
        )
    assert sum(r[1] for r in got) > 0  # non-vacuous on this fixture


def test_sample_is_deterministic_and_proportionate(spark, docs):
    a = docs.filter(md5_pct_col(F.col("doc_id")) < 50).count()
    b = docs.filter(md5_pct_col(F.col("doc_id")) < 50).count()
    assert a == b
    assert 0 < a < 60  # neither empty nor everything
