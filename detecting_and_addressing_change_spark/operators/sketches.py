"""Distributed sketch operators: Bloom-filter join pre-filter, count-min
sketch, and deterministic stratified (reservoir-style) sampling.

These are the scale workhorses a 100 TB training-data pipeline leans on:

- **Bloom pre-filter** — the "runtime filter" pattern: build a tiny bitset
  from the small side of a selective join and apply it map-side on the big
  probe side BEFORE any shuffle, so the shuffle moves only rows that can
  possibly match (plus a bounded false-positive tail). Spark's AQE injects
  the same structure automatically for some plans
  (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator makes
  it explicit, deterministic, and oracle-checkable.
- **Count-min sketch** — fixed-size (depth x width) heavy-hitter counting:
  cell updates are a pure groupBy (map-side combinable), the sketch itself
  is O(depth*width) regardless of corpus size, so it broadcasts.
- **Stratified top-n by hash priority** — the distributed equivalent of
  per-stratum reservoir sampling (Efraimidis-Spirakis A-Res with a
  deterministic priority): rank rows inside each stratum by a stable hash
  and keep the n smallest. Same sample every run, every engine.

All hashes are the engine-portable md5 / Kirsch-Mitzenmacher pair
(`functions/hashing.py::km_hash_pair_cols`), so every sketch is
bit-reproducible in DuckDB SQL and can sit on the oracle gate.

The reference has no sketch surface (SURVEY §1.2); this module belongs to
the LLM-pipeline extension family (SURVEY §2.9 x-series).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import km_hash_pair_cols


def key_hash_pair(key: Column) -> tuple[Column, Column]:
    """Portable (hx, hy) 32-bit pair for an arbitrary (castable) key:
    md5 of its canonical string form, split into two ints."""
    return km_hash_pair_cols(key.cast("string"))


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------
def bloom_build(keys: DataFrame, key_col: str, m: int = 4096, k: int = 4) -> DataFrame:
    """Build the Bloom bitset as a DataFrame of DISTINCT set bit positions
    `p` (0 <= p < m). k positions per key via Kirsch-Mitzenmacher
    h_j = (hx + j*hy) mod m. At most m rows — broadcastable by
    construction; at 100 TB the build side aggregates map-side first
    (distinct positions), so the driver never sees raw keys."""
    hx, hy = key_hash_pair(F.col(key_col))
    with_h = keys.select(hx.alias("hx"), hy.alias("hy"))
    j = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("j")
    return (
        with_h.select("hx", "hy", j)
        .select(((F.col("hx") + F.col("j") * F.col("hy")) % m).alias("p"))
        .distinct()
    )


def bloom_prefilter(
    probe: DataFrame, probe_key: str, bloom: DataFrame, m: int = 4096, k: int = 4
) -> DataFrame:
    """Filter `probe` to rows whose key passes the Bloom filter (all k bit
    positions set). Implemented as k chained **broadcast LEFT SEMI joins**
    — entirely map-side, zero shuffle of the probe table, which is the
    whole point of a runtime filter at scale. No false negatives."""
    hx, hy = key_hash_pair(F.col(probe_key))
    out = probe.withColumn("_bx", hx).withColumn("_by", hy)
    for j in range(k):
        pj = (F.col("_bx") + F.lit(j) * F.col("_by")) % m
        out = (
            out.withColumn("_bp", pj)
            .join(F.broadcast(bloom), F.col("_bp") == bloom["p"], "left_semi")
        )
    return out.drop("_bx", "_by", "_bp")


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------
def cms_cells(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Count-min sketch cells `(j, p, cell_total)` from an item stream.
    One exact groupBy per item first (map-side combinable), then the
    (depth x width)-bounded cell aggregation — the sketch is O(d*w) rows
    no matter the input size, so it broadcasts to every executor."""
    counts = items.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    hx, hy = key_hash_pair(F.col("item"))
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    return (
        counts.select("cnt", hx.alias("hx"), hy.alias("hy"))
        .select("cnt", "hx", "hy", j)
        .select(
            "j",
            ((F.col("hx") + F.col("j") * F.col("hy")) % width).alias("p"),
            "cnt",
        )
        .groupBy("j", "p")
        .agg(F.sum("cnt").alias("cell_total"))
    )


def cms_estimate(
    items: DataFrame, item_col: str, cells: DataFrame, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Point-query the sketch: estimate(item) = MIN_j cells[j][h_j(item)].
    `cells` is tiny -> broadcast hash join; the min-over-depth is a
    groupBy on the (already distinct) item."""
    hx, hy = key_hash_pair(F.col("item"))
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probed = (
        items.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", hx.alias("hx"), hy.alias("hy"))
        .select("item", "hx", "hy", j)
        .select("item", "j", ((F.col("hx") + F.col("j") * F.col("hy")) % width).alias("p"))
    )
    return (
        probed.join(F.broadcast(cells), ["j", "p"])
        .groupBy("item")
        .agg(F.min("cell_total").alias("est"))
    )


def cms_inner_product(
    cells_a: DataFrame, cells_b: DataFrame, depth: int = 3
) -> DataFrame:
    """Equi-join SIZE estimate from two count-min sketches over the join
    keys (Cormode & Muthukrishnan 2005, §4.2): for each row j the inner
    product sum_p A[j][p] * B[j][p] overestimates |A join B| (colliding
    keys only ever ADD), so the MIN over rows is the estimate — an upper
    bound in expectation within eps * N_a * N_b.

    One row out: DataFrame[est_rows long]. The sketch algebra is what a
    cost-based planner would consult BEFORE running a shuffle join at
    100 TB: each side's sketch is one map-side-combinable pass, O(d*w)
    rows each, and the product is a d*w-row broadcast join — the estimate
    costs nothing at the scale where the answer matters. All arithmetic
    is exact int64 (counts * counts summed), hence oracle-hashable."""
    a = cells_a.select("j", "p", F.col("cell_total").alias("ca"))
    b = cells_b.select("j", "p", F.col("cell_total").alias("cb"))
    per_row = (
        a.join(b, ["j", "p"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("row_est"))
    )
    return per_row.agg(F.min("row_est").alias("est_rows"))


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------
def stratified_topn(
    df: DataFrame, stratum_col: str, key_col: str, n: int
) -> DataFrame:
    """Per-stratum deterministic sample: the n rows with the smallest hash
    priority (hx of the key, key as tie-break) in each stratum — the
    distributed form of reservoir sampling with a stable priority. One
    shuffle on the stratum; at very large strata swap the row_number window
    for a two-phase partial top-n (same result, bounded memory)."""
    hx, _ = key_hash_pair(F.col(key_col))
    w = Window.partitionBy(stratum_col).orderBy(hx.asc(), F.col(key_col).asc())
    return (
        df.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= n)
    )
