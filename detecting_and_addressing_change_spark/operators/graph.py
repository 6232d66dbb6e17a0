"""Connected components over candidate-pair edges — dedup cluster
resolution.

MinHash/SimHash candidate PAIRS are not yet a dedup decision: near-dup
relations are transitive in practice (A~B, B~C => one cluster), so the
keep-one-per-cluster step needs the connected components of the pair
graph. This is the step that turns the x03/x04 candidate machinery into
an actual "drop 30% of the corpus" pipeline.

Algorithm: iterative hash-min label propagation — every node starts
labeled with its own id; each round, every node takes the MIN of its own
label and its neighbors' labels; converged when no label changes. Rounds
= graph diameter (near-dup clusters are tiny and star-like, so 2-4
rounds in practice). Each round is one join + one groupBy — both shuffle
on the node id, so the partitioning is REUSED across rounds rather than
recomputed. `localCheckpoint` truncates the growing lineage each round
(without it, round N's plan contains all N-1 predecessors and planning
time explodes).

At 100 TB-scale graphs with long chains, swap hash-min for the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same DataFrame primitives, provably
O(log^2 n) rounds; hash-min is the right default for the short-diameter
dedup-cluster shape.

Deterministic output (min node id per component) => DuckDB-oracle
checkable via a recursive-CTE transitive closure (x23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int = 30,
) -> DataFrame:
    """Label every node with the MIN node id of its connected component.

    `nodes`: one row per node (isolated nodes keep their own id as
    label). `edges`: undirected pairs (each stored once is fine).
    Returns DataFrame[node, lbl]."""
    # materialize the symmetrized edge list ONCE — without this, every
    # hash-min round re-executes the upstream pipeline that produced the
    # pairs (for dedup that is the whole MinHash band/join cascade)
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("node")).withColumn(
        "lbl", F.col("node")
    )
    # labels only ever DECREASE, so the label sum is a strictly monotone
    # convergence witness: unchanged sum <=> fixpoint. One scalar agg per
    # round instead of a join+count. decimal accumulator so the witness
    # cannot overflow at 1e9+-node graphs.
    prev_sum = None
    for _ in range(max_iter):
        # push each node's label to its neighbors, then take the min of
        # {own label} ∪ {neighbor labels}
        pushed = sym.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "lbl")
        labels = (
            labels.union(pushed)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    nodes: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame[doc_id, cluster_id, is_canonical]: component label per
    document; the canonical survivor of each cluster is its min-id
    member (deterministic, engine-portable)."""
    labels = connected_components(nodes, pairs, id_col, "a_id", "b_id")
    return labels.select(
        F.col("node").alias(id_col),
        F.col("lbl").alias("cluster_id"),
        (F.col("node") == F.col("lbl")).alias("is_canonical"),
    )
