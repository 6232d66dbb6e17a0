"""Property tests for the x46/x47 run-length fold helpers: multiplicity
and singleton statistics computed by a single linear ``aggregate`` fold
over a sorted array must match a plain Counter on randomized inputs,
including the edge shapes (empty array, all-equal, singletons at both
ends of the sort order)."""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.queries.extensions7 import (
    _max_multiplicity,
    _singleton_count,
    _word_grams,
)

VOCAB = ["a", "b", "c", "dd", "e", "ff", "g"]


def _random_arrays(seed: int, n: int) -> list[list[str]]:
    rng = np.random.RandomState(seed)
    out = [
        [],  # empty
        ["a"],  # single element
        ["a"] * 7,  # all equal
        ["a", "b"],  # all singletons
    ]
    for _ in range(n):
        k = int(rng.randint(0, 30))
        out.append([VOCAB[i] for i in rng.randint(0, len(VOCAB), size=k)])
    return out


def test_fold_stats_match_counter(spark):
    arrays = _random_arrays(17, 200)
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "id long, w array<string>"
    )
    got = {
        r["id"]: (r["mm"], r["sc"])
        for r in df.select(
            "id",
            _max_multiplicity(F.array_sort("w")).alias("mm"),
            _singleton_count(F.array_sort("w")).alias("sc"),
        ).collect()
    }
    for i, a in enumerate(arrays):
        c = Counter(a)
        expected_mm = max(c.values()) if c else 0
        expected_sc = sum(1 for v in c.values() if v == 1)
        assert got[i] == (expected_mm, expected_sc), (i, a)


def test_word_grams_match_python(spark):
    arrays = _random_arrays(23, 100)
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "id long, w array<string>"
    )
    for k in (2, 3, 5):
        got = {
            r["id"]: r["g"]
            for r in df.select(
                "id", _word_grams(F.col("w"), k).alias("g")
            ).collect()
        }
        for i, a in enumerate(arrays):
            expected = [
                " ".join(a[j : j + k]) for j in range(len(a) - k + 1)
            ]
            assert got[i] == expected, (i, k, a)


def test_winsorize_approx_tolerance_vs_exact(spark):
    """x56's approx_percentile scale path: at accuracy=10000 on sf0.01
    the sketch bounds must land close enough to the exact R-7 percentiles
    that the winsorized mean agrees to ~0.1% and the clamp counts stay
    within the sketch's rank-error budget (~n/accuracy per tail)."""
    from detecting_and_addressing_change_spark.queries.extensions7 import (
        winsorized_stats,
    )
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    exact = {r["l_returnflag"]: r for r in winsorized_stats(li).collect()}
    approx = {
        r["l_returnflag"]: r
        for r in winsorized_stats(li, approx=True).collect()
    }
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a = approx[k]
        assert a["n"] == e["n"]
        assert abs(a["w_mean"] - e["w_mean"]) / e["w_mean"] < 1e-3, k
        # rank error of the sketch bounds: n/accuracy rows per tail
        slack = max(4, 2 * e["n"] // 10000)
        assert abs(a["n_lo"] - e["n_lo"]) <= slack, k
        assert abs(a["n_hi"] - e["n_hi"]) <= slack, k
