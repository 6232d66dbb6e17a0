"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The classic BPE fit (Sennrich et al. 2016): start from characters, count
adjacent symbol pairs over the corpus, merge the most frequent pair,
repeat. The published algorithm's scale trick carries over directly: the
fit operates on the DISTINCT-WORD vocabulary weighted by word counts —
ONE corpus-sized aggregation up front, after which every merge round
touches only the vocab table (corpus-size-independent):

- pair counting: explode each vocab word's adjacent symbol pairs weighted
  by its count → one map-side-combinable groupBy(pair) per round; the
  argmax pair (ties: lexicographically smallest, deterministic) is a
  1-row collect.
- merge application: a left-to-right SQL fold over each word's symbol
  array (greedy non-overlapping, the BPE contract) — O(1) expression
  size, no Python in the loop; `localCheckpoint` truncates the growing
  lineage per round (the graph.py pattern).

Encoding applies the ranked merge list greedily per word (lowest rank
first) inside one mapInPandas with a per-word memo — corpora are
Zipfian, so each distinct word is encoded once per partition. Fit and
encode are both pinned against a pure-Python reference implementation in
tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _merge_pair_col(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — one fold,
    O(1) expression size."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc: Column, x: Column) -> Column:
        n = F.size(acc)
        last = F.element_at(acc, -1)
        do_merge = (n > 0) & (last == la) & (x == lb)
        return F.when(
            do_merge,
            F.concat(F.slice(acc, 1, n - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def _fit_local(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side fit over a SMALL weighted vocabulary — identical
    semantics (count desc, pair asc ties, greedy left-to-right merge) to
    the distributed loop; the parity test pins them against each other."""
    from collections import Counter

    vocab = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def bpe_fit(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    small_vocab_threshold: int = 100_000,
) -> list[tuple[str, str]]:
    """Train BPE merges on the corpus; returns the ordered merge list.

    Adaptive like ``graph.dedup_clusters``: the weighted DISTINCT-word
    vocabulary is aggregated once (the only corpus-sized step); when it
    is driver-small (<= ``small_vocab_threshold`` words) the merge loop
    runs locally on the collected vocab — n_merges rounds of
    fixed-latency Spark jobs buy nothing on a table that fits in memory.
    Above the threshold the distributed loop runs (pair counts = one
    map-side-combinable groupBy per round, merges = an O(1)-size SQL
    fold); ``small_vocab_threshold=0`` forces it, and the parity test
    pins both paths to the same merge list."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    if words.count() <= small_vocab_threshold:
        return _fit_local(
            {r["word"]: int(r["cnt"]) for r in words.collect()}, n_merges
        )
    vocab = words.select(
        F.split(F.col("word"), "").alias("symbols"), "cnt"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        s = F.col("symbols")
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(s, 1, F.size(s) - 1),
                    F.slice(s, 2, F.size(s) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "cnt",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_pair_col(F.col("symbols"), a, b).alias("symbols"),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encode: repeatedly merge the lowest-rank
    eligible pair."""
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL non-overlapping occurrences of that pair, left to
        # right (the fit's fold applies the merge corpus-wide the same
        # way)
        a, b = syms[best], syms[best + 1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame[<id_col> (long), tokens array<string>, n_tokens] — the
    ranked merge list applied greedily per word; Zipfian memo per
    partition. The id column keeps its input NAME (long-typed ids
    assumed, as everywhere in the engine)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                out: list[str] = []
                for w in (t or "").split(" "):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    from ..sources.tables import spread_small_input

    return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        fn, schema
    )
