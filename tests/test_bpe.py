"""BPE tokenizer (operators/bpe.py): the distributed fit reproduces an
independent pure-Python reference merge-for-merge on real corpus data,
encoding round-trips losslessly, and the Spark encode matches the local
encoder doc-for-doc."""

from __future__ import annotations

from collections import Counter

from detecting_and_addressing_change_spark.operators.bpe import (
    _encode_word,
    bpe_encode,
    bpe_fit,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_MERGES = 12


def _fit_reference(word_counts: dict[str, int], n_merges: int):
    """Independent BPE fit: pair counts over the weighted vocab, argmax
    with (count desc, pair asc) ties, greedy left-to-right merge."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _word_counts(spark):
    docs = load_table(spark, SF, "documents")
    wc: Counter = Counter()
    texts = {}
    for r in docs.collect():
        texts[r["doc_id"]] = r["text"]
        for w in r["text"].split(" "):
            if w:
                wc[w] += 1
    return wc, texts


def test_fit_matches_reference(spark):
    docs = load_table(spark, SF, "documents")
    wc, _ = _word_counts(spark)
    expected = _fit_reference(dict(wc), N_MERGES)
    # default: adaptive local path (vocab is driver-small here)
    assert bpe_fit(docs, n_merges=N_MERGES) == expected
    # forced DISTRIBUTED loop (pair-count groupBy + SQL-fold merges):
    # bit-identical merge list
    assert (
        bpe_fit(docs, n_merges=N_MERGES, small_vocab_threshold=0)
        == expected
    )
    assert len(expected) == N_MERGES  # corpus learns them all


def test_encode_matches_local_and_roundtrips(spark):
    docs = load_table(spark, SF, "documents")
    wc, texts = _word_counts(spark)
    merges = bpe_fit(docs, n_merges=N_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    assert got.keys() == texts.keys()
    for d, text in texts.items():
        words = [w for w in text.split(" ") if w]
        expect = [t for w in words for t in _encode_word(w, ranks)]
        toks, n = got[d]
        assert toks == expect, d
        assert n == len(expect)
        # lossless: tokens concatenate back to the original words
        assert "".join(toks) == "".join(words), d
        # merges actually compress (chars -> fewer symbols)
        assert n <= sum(len(w) for w in words)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=0, max_size=12),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"), ("ab", "c")]),
)
@settings(max_examples=20, deadline=None)
def test_merge_fold_matches_python(spark, syms, pair):
    """The SQL merge fold == the reference greedy left-to-right merge on
    arbitrary symbol sequences, including overlap chains (a,a on 'aaa')
    and merged-symbol inputs ('ab' colliding with a merge producing
    'ab')."""
    from pyspark.sql import functions as F

    from detecting_and_addressing_change_spark.operators.bpe import (
        _merge_pair_col,
    )

    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    df = spark.createDataFrame([(syms,)], "symbols array<string>")
    got = df.select(
        _merge_pair_col(F.col("symbols"), a, b).alias("m")
    ).collect()[0]["m"]
    assert list(got) == out, (syms, pair)


def test_distributed_loop_engages_at_realistic_vocab_width(spark):
    """VERDICT r5 task #8: the distributed merge loop must run IN CI at a
    vocabulary width that actually trips the adaptive threshold (>100k
    distinct words), not only when forced with threshold=0. 150k generated
    distinct words (shared character structure so pair counts stay >= 2
    through every round): the DEFAULT-threshold fit must take the
    distributed path and reproduce the independent reference fit
    merge-for-merge, completing every requested round."""
    from pyspark.sql import functions as F

    n_words, n_merges = 150_000, 6
    docs = spark.range(n_words).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("start"), F.col("id").cast("string"), F.lit("end"))
        .alias("text"),
    )
    # default threshold (100k) — the 150k vocab engages the distributed
    # branch by COUNT, which is the point of the test
    merges = bpe_fit(docs, n_merges=n_merges)
    assert len(merges) == n_merges  # no early break: every round ran
    wc = {f"start{i}end": 1 for i in range(n_words)}
    assert merges == _fit_reference(wc, n_merges)
