"""Materializing curation run (curation.py): the written corpus and audit
stats agree with the x55 report, and the output is partition-prunable."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.curation import (
    curate_corpus,
    load_curated,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_curate_corpus_matches_x55_report(spark):
    from detecting_and_addressing_change_spark.queries import QUERIES

    docs = load_table(spark, SF, "documents")
    report = {
        r["source"]: (r["n_docs"], r["n_kept"], r["kept_tokens"])
        for r in QUERIES["x55_curation_pipeline"](spark, SF).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        stats = {
            r["source"]: (r["n_docs"], r["n_kept"], r["kept_tokens"])
            for r in curate_corpus(docs, f"{tmp}/run").collect()
        }
        assert stats == report

        kept = load_curated(spark, f"{tmp}/run")
        # every original column survives; only kept docs are present
        assert set(kept.columns) == set(docs.columns)
        per_source = {
            r["source"]: r["n"]
            for r in kept.groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for src, (_, n_kept, _) in report.items():
            assert per_source.get(src, 0) == n_kept, src

        # hive partition dirs exist -> source predicates prune at the scan
        dirs = {
            d for d in os.listdir(f"{tmp}/run/corpus")
            if d.startswith("source=")
        }
        assert dirs, "expected source= partition directories"
        one = sorted(dirs)[0].split("=", 1)[1]
        s = kept.filter(F.col("source") == one)._jdf.queryExecution().toString()
        assert "PartitionFilters" in s


def test_build_training_shards_end_to_end(spark):
    """curate -> vocab -> encode -> pack -> shard, checked against an
    independent local recompute: token conservation, x24-contract
    encoding (rank-1 heaviest, OOV=0), and x53-contract pack boundaries
    over the kept doc_id order."""
    from collections import Counter

    from detecting_and_addressing_change_spark.curation import (
        build_training_shards,
    )
    from detecting_and_addressing_change_spark.queries.extensions7 import (
        curation_verdicts,
    )

    docs = load_table(spark, SF, "documents")
    kept_ids = sorted(
        r["doc_id"]
        for r in curation_verdicts(docs)
        .filter(F.col("keep") == 1)
        .collect()
    )
    texts = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w != ""]
        for r in docs.collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        shards = build_training_shards(
            docs, f"{tmp}/run", vocab_size=64, pack_size=32,
            packs_per_shard=4,
        )
        rows = {r["doc_id"]: r for r in shards.collect()}
    assert sorted(rows) == kept_ids

    # local twin: vocab on kept corpus, encode, pack
    cnt = Counter(w for d in kept_ids for w in texts[d])
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    vid = {w: i + 1 for i, (w, _) in enumerate(ranked)}
    start = 0
    for d in kept_ids:
        ws = texts[d]
        r = rows[d]
        assert list(r["token_ids"]) == [vid.get(w, 0) for w in ws], d
        assert r["n_tokens"] == len(ws)
        assert r["pack_id"] == start // 32, d
        assert r["pack_offset"] == start % 32, d
        assert r["shard_id"] == (start // 32) // 4, d
        start += len(ws)


def test_build_training_shards_bpe_tokenizer(spark):
    """The BPE leg of the shard builder: subword encoding round-trips
    losslessly, token ids map 1:1 to the written subword vocab, and the
    pack boundaries follow the BPE token counts."""
    from detecting_and_addressing_change_spark.curation import (
        build_training_shards,
    )
    from detecting_and_addressing_change_spark.operators.bpe import (
        _encode_word,
    )
    from detecting_and_addressing_change_spark.queries.extensions7 import (
        curation_verdicts,
    )

    docs = load_table(spark, SF, "documents")
    kept_ids = sorted(
        r["doc_id"]
        for r in curation_verdicts(docs)
        .filter(F.col("keep") == 1)
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    with tempfile.TemporaryDirectory() as tmp:
        shards = build_training_shards(
            docs, f"{tmp}/run", tokenizer="bpe", n_merges=8,
            pack_size=64, packs_per_shard=4,
        )
        rows = {r["doc_id"]: r for r in shards.collect()}
        merges = [
            (r["left_sym"], r["right_sym"])
            for r in spark.read.parquet(f"{tmp}/run/merges")
            .orderBy("rank")
            .collect()
        ]
        vocab = {
            r["token_id"]: r["item"]
            for r in spark.read.parquet(f"{tmp}/run/vocab").collect()
        }
    assert sorted(rows) == kept_ids
    assert len(merges) == 8
    ranks = {p: i for i, p in enumerate(merges)}
    start = 0
    for d in kept_ids:
        ws = [w for w in texts[d].split(" ") if w]
        expect = [t for w in ws for t in _encode_word(w, ranks)]
        r = rows[d]
        got_tokens = [vocab[i] for i in r["token_ids"]]
        assert got_tokens == expect, d
        assert "".join(got_tokens) == "".join(ws), d  # lossless
        assert r["n_tokens"] == len(expect)
        assert r["pack_id"] == start // 64, d
        assert r["pack_offset"] == start % 64, d
        start += len(expect)


def test_build_training_shards_epoch_seed(spark):
    """The epoch_seed leg: packing follows the seeded EPOCH order (the
    sharding-module between-epoch layer), verified against a local twin
    of the epoch key; a different seed yields a different layout of the
    same kept corpus (same docs, same token streams)."""
    from detecting_and_addressing_change_spark.curation import (
        build_training_shards,
    )

    from .test_sharding import _twin_epoch_key

    docs = load_table(spark, SF, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        s0 = build_training_shards(
            docs, f"{tmp}/e0", vocab_size=64, pack_size=32,
            packs_per_shard=4, epoch_seed=3,
        )
        rows = {r["doc_id"]: r for r in s0.collect()}
        s1 = build_training_shards(
            docs, f"{tmp}/e1", vocab_size=64, pack_size=32,
            packs_per_shard=4, epoch_seed=4,
        )
        rows1 = {r["doc_id"]: r for r in s1.collect()}

    # local twin: lay the kept docs in (epoch_key, doc_id) order and cut
    order = sorted(rows, key=lambda d: (_twin_epoch_key(d, 3), d))
    start = 0
    for d in order:
        r = rows[d]
        assert r["pack_id"] == start // 32, d
        assert r["pack_offset"] == start % 32, d
        assert r["shard_id"] == (start // 32) // 4, d
        start += r["n_tokens"]

    # same corpus, same per-doc encodings, different layout
    assert sorted(rows) == sorted(rows1)
    assert all(
        list(rows[d]["token_ids"]) == list(rows1[d]["token_ids"])
        for d in rows
    )
    assert any(
        rows[d]["pack_id"] != rows1[d]["pack_id"] for d in rows
    ), "a new epoch seed must re-lay the pack stream"


def test_build_training_shards_sized_cut(spark):
    """The sized shard cut (VERDICT r15 #3): packs_per_shard derived
    from target_shard_bytes (pure arithmetic), max_shards (one
    measuring agg, hard file-count cap), or the sqrt default — each
    checked against an independent local recompute of the same rule,
    and the sizing parameters are mutually exclusive."""
    import math

    import pytest

    from detecting_and_addressing_change_spark.curation import (
        _TOKEN_BYTES,
        build_training_shards,
    )

    docs = load_table(spark, SF, "documents")

    def layout_stats(shards):
        row = shards.agg(
            F.sum("n_tokens").alias("tok"),
            F.max("pack_id").alias("maxp"),
            F.countDistinct("shard_id").alias("n_shards"),
            F.max(
                F.expr("pack_id div greatest(shard_id, 1)")
            ).alias("_unused"),
        ).collect()[0]
        return int(row["tok"]), int(row["maxp"]) + 1, int(row["n_shards"])

    pack = 32

    # target_shard_bytes: pps = bytes // (4 * pack_size), every row obeys
    # shard_id == pack_id div pps
    tgt = 1024  # -> pps = 1024 // (4*32) = 8
    with tempfile.TemporaryDirectory() as tmp:
        shards = build_training_shards(
            docs, f"{tmp}/run", vocab_size=64, pack_size=pack,
            target_shard_bytes=tgt,
        )
        pps = tgt // (_TOKEN_BYTES * pack)
        assert pps == 8
        bad = shards.filter(
            F.col("shard_id") != F.expr(f"pack_id div {pps}")
        ).count()
        assert bad == 0

    # max_shards: the file count is capped, and the cut matches the
    # ceil(n_packs / max_shards) rule recomputed locally
    cap = 5
    with tempfile.TemporaryDirectory() as tmp:
        shards = build_training_shards(
            docs, f"{tmp}/run", vocab_size=64, pack_size=pack,
            max_shards=cap,
        )
        tok, n_packs, n_shards = layout_stats(shards)
        assert n_shards <= cap
        pps = max(1, -(-n_packs // cap))
        bad = shards.filter(
            F.col("shard_id") != F.expr(f"pack_id div {pps}")
        ).count()
        assert bad == 0

    # default: sqrt sizing — pps = isqrt(ceil(total_tokens / pack)), so
    # the shard count grows sub-linearly with the corpus. (max pack_id
    # + 1 can sit one below the token-count rule when the last document
    # STARTS in the penultimate pack and straddles into the last — the
    # derivation is defined on total tokens, which the oracle-side rule
    # can always recompute.)
    with tempfile.TemporaryDirectory() as tmp:
        shards = build_training_shards(
            docs, f"{tmp}/run", vocab_size=64, pack_size=pack,
        )
        tok, n_packs_written, n_shards = layout_stats(shards)
        n_packs = max(1, -(-tok // pack))
        assert n_packs_written <= n_packs
        pps = max(1, math.isqrt(n_packs))
        bad = shards.filter(
            F.col("shard_id") != F.expr(f"pack_id div {pps}")
        ).count()
        assert bad == 0
        # sub-linear file count: ~sqrt(n_packs) shards, never more than
        # the rule's ceiling
        assert 0 < n_shards <= -(-n_packs // pps)

    # sizing parameters are mutually exclusive
    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(ValueError, match="at most one"):
            build_training_shards(
                docs, f"{tmp}/run", vocab_size=64, pack_size=pack,
                packs_per_shard=4, max_shards=5,
            )
        with pytest.raises(ValueError, match="at most one"):
            build_training_shards(
                docs, f"{tmp}/run", vocab_size=64, pack_size=pack,
                target_shard_bytes=1024, max_shards=5,
            )
