"""Training-shard export: seeded epoch shuffle -> token-budgeted shard
assignment -> manifest (+ the partitioned write) — the trainer-facing
OUTPUT side of the curation pipeline (WebDataset / streaming-loader
shard layout).

The reference's training loop consumes its corpus as an in-memory
iterator (``streams/loaders.py``); at 100 TB the equivalent contract is
"a directory of size-balanced shards in a deterministic, seeded epoch
order, plus a manifest the loader can trust". Three pieces, all exact
int64 arithmetic so the whole layout is DuckDB-oracle-checkable:

- **Seeded epoch order** (:func:`epoch_order_col`): a Knuth
  multiplicative mix ``((id + seed*40503) % 2^20) * 2654435761 % 2^32``.
  The seed lands INSIDE the multiplicand (adding it after the multiply
  would shift every key by the same constant and change almost no
  relative order); the golden-ratio multiplier then scrambles the
  shifted values, so a new seed is a genuinely new permutation (every
  position moves — pinned in tests). The key needs MIXING, not
  uniqueness — ties break on the id itself — so the id is first reduced
  mod 2^20, which also keeps the multiply inside int64 at any
  conceivable id range (2^20 x 2654435761 < 2^52). Epoch re-shuffles
  are one range-shuffle, the floor for any true global shuffle.
- **Shard assignment** (:func:`assign_shards`): lay the weighted stream
  (token counts) end-to-end in epoch order and cut at ``budget``
  boundaries — a document belongs to the shard holding its START
  offset (same straddle rule as x53 sequence packing; the loader pads
  or spills at read time). The running offset uses
  :func:`..operators.order.global_cumsum` — range-partition +
  per-partition sums + broadcast offsets — NOT a single-partition
  window, so the plan survives a 100 TB token stream.
- **Manifest** (:func:`shard_manifest`): one tiny groupBy row per shard
  (doc count, token sum, id span, an exact weighted checksum) — what a
  loader verifies before trusting a shard directory.

:func:`write_shards` materializes the layout: one hash shuffle on
shard_id (each shard lands in exactly one task -> one file per shard
directory), ``partitionBy("shard_id")`` parquet, manifest alongside.

Relation to :func:`..curation.build_training_shards`: that is the
one-shot corpus MATERIALIZATION (curate -> encode -> pack -> write) in
doc_id order; this module adds the between-epoch layer on top of any
such corpus — a new seeded permutation per epoch and the manifest
contract a remote loader verifies — without re-running curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .order import global_cumsum

# Knuth multiplicative constant + a small odd mixer for the seed; the id
# is reduced mod 2^20 first so the product stays far inside int64.
_MIX_A = 2654435761
_SEED_MIX = 40503
_ID_MOD = 1 << 20
_HASH_MOD = 1 << 32


def epoch_order_col(id_col: Column | str, seed: int) -> Column:
    """Deterministic seeded shuffle key (exact int64, engine-portable)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        ((c + F.lit(int(seed) * _SEED_MIX)) % _ID_MOD) * _MIX_A
    ) % _HASH_MOD


def epoch_order_sql(id_expr: str, seed: int) -> str:
    """The same key as SQL text (for oracles)."""
    return (
        f"(((({id_expr}) + {int(seed) * _SEED_MIX}) % {_ID_MOD}) "
        f"* {_MIX_A}) % {_HASH_MOD}"
    )


def rendezvous_shard_col(
    id_col: Column | str, n_shards: int
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment — the
    CONSISTENT layout: shard(id) = argmax over s of mix(id, s). When the
    shard count changes n -> n+1, only the ids whose new shard WINS the
    argmax move (expected n/(n+1) of rows stay put), versus ``id % n``
    where almost everything moves. Exact int64 mix (same reduction
    discipline as :func:`epoch_order_col`), ties broken to the HIGHEST
    shard id via lexicographic (weight, shard) max — identical in Spark
    (array_max over struct) and SQL (ORDER BY w DESC, s DESC LIMIT 1),
    so the layout is oracle-checkable. The expression is ONE constant
    struct-array + array_max (the k-means table-route pattern): O(1)
    expression tree at any shard count, zero-shuffle narrow map."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    pairs = F.array(
        *[
            F.struct(
                (
                    (
                        ((c % _ID_MOD) * 31 + F.lit(int(s) * _SEED_MIX + 1))
                        % _ID_MOD
                    )
                    * _MIX_A
                    % _HASH_MOD
                ).alias("w"),
                F.lit(int(s)).alias("s"),
            )
            for s in range(int(n_shards))
        ]
    )
    return F.array_max(pairs)["s"].cast("long")


def rendezvous_shard_sql(id_expr: str, n_shards: int) -> str:
    """The same assignment as SQL text (DuckDB list-lambda argmax)."""
    return (
        f"(SELECT s FROM ("
        f"SELECT UNNEST(range({int(n_shards)})) AS s) "
        f"ORDER BY (((({id_expr}) % {_ID_MOD}) * 31 + s * {_SEED_MIX}"
        f" + 1) % {_ID_MOD}) * {_MIX_A} % {_HASH_MOD} DESC, s DESC"
        f" LIMIT 1)"
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    seed: int = 0,
) -> DataFrame:
    """Assign every row a ``shard_id`` under the seeded epoch order and
    the token ``budget`` (start-offset straddle rule). Adds
    ``epoch_key`` (the shuffle key) and ``shard_id``; keeps input
    columns. ``weight_col`` must be integral, non-null, >= 0."""
    keyed = df.withColumn("epoch_key", epoch_order_col(id_col, seed))
    cum = global_cumsum(
        keyed,
        [F.asc("epoch_key"), F.asc(id_col)],
        weight_col,
        out_col="__cum",
    )
    strt = F.col("__cum") - F.col(weight_col)
    return cum.withColumn(
        "shard_id", F.floor(strt / int(budget)).cast("long")
    ).drop("__cum")


def shard_manifest(assigned: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """One row per shard: the loader-verifiable layout summary."""
    w = F.col(weight_col).cast("long")
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("n_tokens"),
        F.min(id_col).cast("long").alias("min_id"),
        F.max(id_col).cast("long").alias("max_id"),
        F.sum(F.col(id_col).cast("long") * w).alias("checksum"),
    )


def write_shards(
    assigned: DataFrame,
    path: str,
    id_col: str,
    weight_col: str,
    max_parallel_files: int = 200,
    data_format: str = "parquet",
) -> DataFrame:
    """Write the shard layout: ``{path}/data`` partitioned by shard_id
    (hash-repartitioned on shard_id first, so each shard directory is
    written by exactly one task -> one file), and ``{path}/manifest``
    parquet. ``data_format`` is ``parquet`` (default) or ``json``
    (JSONL — the common trainer interchange format; same layout, same
    manifest). Returns the manifest DataFrame."""
    if data_format not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {data_format!r}")
    n_shards = assigned.agg(
        (F.max("shard_id") + 1).alias("n")
    ).collect()[0]["n"]
    n_parts = max(1, min(int(max_parallel_files), int(n_shards)))
    (
        assigned.repartition(n_parts, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(data_format)
        .save(f"{path}/data")
    )
    manifest = shard_manifest(assigned, id_col, weight_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/manifest"
    )
    return manifest


def read_shards(
    spark,
    path: str,
    id_col: str,
    weight_col: str,
    data_format: str = "parquet",
    shard_ids: list[int] | None = None,
) -> DataFrame:
    """Manifest-VERIFIED shard read — the loader side of the contract.

    Recomputes each selected shard's (n_docs, n_tokens, checksum) from
    the data files and raises if any disagrees with the stored manifest
    (a truncated transfer, partial overwrite, or stale manifest fails
    loudly BEFORE training consumes the corpus). ``shard_ids`` prunes
    the read to those partition directories (partition-pruned scan —
    verification cost scales with what is read, not the corpus).
    Returns the data DataFrame for the selected shards."""
    data = spark.read.format(data_format).load(f"{path}/data")
    manifest = spark.read.parquet(f"{path}/manifest")
    if shard_ids is not None:
        ids = [int(s) for s in shard_ids]
        data = data.filter(F.col("shard_id").isin(ids))
        manifest = manifest.filter(F.col("shard_id").isin(ids))
    w = F.col(weight_col).cast("long")
    recomputed = data.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("n_tokens"),
        F.sum(F.col(id_col).cast("long") * w).alias("checksum"),
    )
    m = {
        int(r["shard_id"]): r
        for r in manifest.select(
            "shard_id", "n_docs", "n_tokens", "checksum"
        ).collect()
    }
    bad: list[str] = []
    seen: set[int] = set()
    for r in recomputed.collect():
        sid = int(r["shard_id"])
        seen.add(sid)
        exp = m.get(sid)
        if exp is None:
            bad.append(f"shard {sid}: present on disk, not in manifest")
            continue
        for colname in ("n_docs", "n_tokens", "checksum"):
            if int(r[colname]) != int(exp[colname]):
                bad.append(
                    f"shard {sid}: {colname} {int(r[colname])} != "
                    f"manifest {int(exp[colname])}"
                )
    missing = sorted(set(m) - seen)
    if missing:
        bad.append(f"shards in manifest but missing on disk: {missing}")
    if bad:
        raise AssertionError(
            "shard layout failed manifest verification: " + "; ".join(bad)
        )
    return data
