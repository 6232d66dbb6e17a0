"""Skew-handling join strategies (SURVEY §4.3 / driver north star:
"skewed keys hurt ... salting for skew").

AQE's skew-join handles most cases at runtime (enabled in session.py); this
module provides the EXPLICIT salting strategy for the cases AQE can't fix:
a broadcast-ineligible dimension joined on a key whose distribution is known
to be pathological (e.g., the null/default key, or a celebrity entity).

    salted_join(facts, dim, key, n_salts):
        facts gain a random salt in [0, n_salts);
        dim is exploded n_salts times (one row per salt);
        join on (key, salt) -> the hot key's rows spread over n_salts tasks.

The dim-side explosion multiplies the small side only — the classic
trade: n_salts x dim-size extra shuffle for an n_salts-way split of the
hottest reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join facts⋈dim on `key`, salted n_salts ways.

    The fact-side salt uses a deterministic spread (pmod of a per-row hash)
    rather than rand() so results are reproducible; any row-unique column
    combination works as the hash input — monotonically_increasing_id is
    partition-stable here because the salt only needs to SPREAD, not to be
    stable across runs."""
    f = facts.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total, descending — what
    you look at before deciding between broadcast, AQE, and salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.desc("cnt"))
        .limit(top_n)
    )
