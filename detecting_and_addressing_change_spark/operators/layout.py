"""Z-order (Morton) data layout — multi-column clustering for scan pruning.

A 100 TB table queried by TWO selective columns cannot be sorted by both;
interleaving their bits gives one clustering key whose ranges are small in
BOTH dimensions, so parquet row-group min/max stats (and range partition
boundaries) prune scans for either predicate — the published design behind
Delta/Iceberg's OPTIMIZE ZORDER. Everything here is exact int64 bit
arithmetic (shifts, masks, or), identical in Spark and DuckDB, so the
layout key itself is oracle-checkable (x67).

``morton_col`` interleaves two 16-bit keys with the standard
mask-and-shift bit spreading (each step doubles the gaps; 4 steps spread
16 bits across 32). ``write_zordered`` range-repartitions on the key and
writes with in-file sort — one shuffle, tight stats in both dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of c so bit i lands at position 2*i."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def spread16_sql(expr: str) -> str:
    """The same spreading as SQL text (for oracles)."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_MASKS:
        x = f"((({x} | ({x} << {shift}))) & {mask})"
    return x


def morton_col(a: Column, b: Column) -> Column:
    """Morton/Z-order key of two 16-bit keys: a's bits at even positions,
    b's at odd — exact int64, engine-portable."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def morton_sql(a_expr: str, b_expr: str) -> str:
    return f"({spread16_sql(a_expr)} | ({spread16_sql(b_expr)} << 1))"


def norm16_col(c: Column, minv: Column, maxv: Column) -> Column:
    """Scale a column to [0, 65536) over its OWN value range — mandatory
    before interleaving: a small-domain column's raw bits are all low
    bits, so un-normalized Morton splits would cluster on the wide column
    only (Delta's ZORDER normalizes via range-partition ids the same
    way). FLOOR of the double quotient is exact here: the numerator
    (x-min)*65536 is < 2^48 (exactly representable) and the true quotient
    is at least 2^-32 from any integer it doesn't equal, far beyond the
    7e-12 division error — so both engines floor to the same long for any
    32-bit-range key."""
    # force LONG arithmetic on the bounds too: int-typed literals for a
    # full-32-bit range make `maxv - minv + 1` overflow int32 under ANSI
    # (hypothesis-found in round 7; long columns from real min/max aggs
    # were never affected)
    lo, hi = minv.cast("long"), maxv.cast("long")
    return F.floor(
        (c.cast("long") - lo) * 65536 / (hi - lo + 1)
    ).cast("long")


def norm16_sql(expr: str, min_expr: str, max_expr: str) -> str:
    return (
        f"CAST(FLOOR((({expr}) - ({min_expr})) * 65536.0 "
        f"/ (({max_expr}) - ({min_expr}) + 1)) AS BIGINT)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Morton key of (a_col, b_col): range
    repartition on the key (one shuffle; disjoint key ranges per file)
    plus in-file sort, so every file's min/max stats are tight in BOTH
    columns."""
    bounds = df.agg(
        F.min(a_col).alias("amin"),
        F.max(a_col).alias("amax"),
        F.min(b_col).alias("bmin"),
        F.max(b_col).alias("bmax"),
    ).collect()[0]  # 4 scalars — driver-small by construction
    z = morton_col(
        norm16_col(
            F.col(a_col),
            F.lit(int(bounds["amin"])),
            F.lit(int(bounds["amax"])),
        ),
        norm16_col(
            F.col(b_col),
            F.lit(int(bounds["bmin"])),
            F.lit(int(bounds["bmax"])),
        ),
    )
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(num_files, "__z")
        if num_files
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(
        path
    )
