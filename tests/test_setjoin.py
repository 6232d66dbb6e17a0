"""Prefix-filter exact set-similarity join (operators/setjoin.py):
losslessness vs a brute-force all-pairs reference, exact-dup star-edge
semantics, and the pruning the prefix actually buys."""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.setjoin import (
    _prefix_table,
    _tokenize,
    adaptive_jaccard_join,
    prefix_jaccard_join,
    ssjoin_candidate_volume,
)


def _shingles(text, n=3):
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _brute_pairs(rows, t, n=3):
    """All rep-pairs with Jaccard >= t + exact-dup star edges, straight
    from the definition."""
    by_text = {}
    for i, txt in rows:
        by_text.setdefault(txt, []).append(i)
    chains = set()
    reps = []
    for txt, ids in by_text.items():
        ids.sort()
        reps.append((ids[0], txt))
        chains.update((ids[0], m) for m in ids[1:])
    out = set(chains)
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(reps), 2):
        sa, sb = _shingles(ta, n), _shingles(tb, n)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= t:
            out.add((ia, ib))
    return out


@pytest.fixture(scope="module")
def corpus_rows():
    base = (
        "the quick brown fox jumps over the lazy dog while a cat "
        "watches from the windowsill with mild interest every day"
    )
    rows = []
    for i in range(40):
        if i % 8 == 0:
            rows.append((i, base))  # exact-dup family
        elif i % 8 == 1:
            rows.append((i, base.replace("mild", f"keen{i}")))  # near dup
        elif i % 8 == 2:
            rows.append((i, base.replace("quick brown", f"slow grey{i}")))
        else:
            rows.append(
                (
                    i,
                    f"document {i} covers shuffle partition tuning and "
                    f"adaptive execution in distributed engines topic {i} "
                    f"with its own unrelated vocabulary line {i}",
                )
            )
    return rows


def test_lossless_vs_brute_force(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    for t in (0.25, 0.5, 0.75):
        got = {
            (r["a_id"], r["b_id"])
            for r in prefix_jaccard_join(df, threshold=t).collect()
        }
        want = _brute_pairs(corpus_rows, t)
        assert got == want, f"threshold {t}"
        assert want  # non-trivial fixture


def test_exact_dups_are_star_edges_only(spark):
    rows = [(i, "same same same text body here repeated") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = prefix_jaccard_join(df, threshold=0.5).collect()
    # 5 star edges from keeper 0, never 15 quadratic within-group pairs
    assert sorted((r["a_id"], r["b_id"]) for r in got) == [
        (0, i) for i in range(1, 6)
    ]
    assert all(r["jaccard"] == 1.0 for r in got)


def test_short_docs_do_not_crash_or_pair(spark):
    rows = [(0, "one two"), (1, "one two"), (2, "three"), (3, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"])
        for r in prefix_jaccard_join(df, threshold=0.5).collect()
    }
    # docs 0/1 are exact dups (chain); no shingle pairs exist otherwise
    assert got == {(0, 1)}


def test_prefix_prunes_candidate_space(spark, corpus_rows):
    """The join input must be the PREFIX tokens only — materially fewer
    rows than the full token explode the naive inverted index would join
    (here prefix length ~ n/2 + 1 at t=0.5)."""
    from pyspark.sql import Window
    from detecting_and_addressing_change_spark.functions.text import (
        word_ngrams_col,
    )
    from detecting_and_addressing_change_spark.operators.dedup import (
        collapse_exact,
    )

    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    _, reps = collapse_exact(df)
    toks = reps.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams_col(F.col("text"), 3))
        ).alias("w"),
    )
    full = toks.count()
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    prefix = (
        toks.join(dfreq, "w")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "w")
            ),
        )
        .join(sizes, "doc_id")
        .filter(F.col("rk") <= F.col("n") - F.ceil(0.5 * F.col("n")) + 1)
    )
    assert prefix.count() < 0.65 * full


def test_candidate_volume_is_exact_prejoin_count(spark, corpus_rows):
    """The pre-flight estimate must equal the ACTUAL row count of the
    unfiltered prefix candidate join — it is a measurement, not a model."""
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    _, toks = _tokenize(df, "text", "doc_id", 3)
    prefix = _prefix_table(toks, "doc_id", 0.5)
    vol = ssjoin_candidate_volume(prefix, "doc_id").collect()[0][
        "candidate_volume"
    ]
    a = prefix.filter(F.col("__pr")).select(
        F.col("doc_id").alias("a_id"), "w"
    )
    b = prefix.select(F.col("doc_id").alias("b_id"), "w")
    assert vol == a.join(b, "w").count()


def test_adaptive_auto_routes_by_budget(spark, corpus_rows):
    """auto picks exact under a generous budget, minhash under a zero
    budget; the reported volume is identical either way, and the exact
    route's output is byte-identical to prefix_jaccard_join."""
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    want = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in prefix_jaccard_join(df, threshold=0.5).collect()
    }
    pe, ie = adaptive_jaccard_join(df, budget_rows=10**12, route="auto")
    pm, im = adaptive_jaccard_join(df, budget_rows=0, route="auto")
    assert ie["route"] == "exact" and im["route"] == "minhash"
    assert ie["candidate_volume"] == im["candidate_volume"] > 0
    got_e = {(r["a_id"], r["b_id"], r["jaccard"]) for r in pe.collect()}
    assert got_e == want
    # the fixture's true pairs are all well above the 32-band knee and the
    # hashes are deterministic md5, so the fallback finds every one here
    got_m = {(r["a_id"], r["b_id"], r["jaccard"]) for r in pm.collect()}
    assert got_m == want


def test_routing_audit_modes_matches_per_mode_audits(spark, corpus_rows):
    """r17: x90's ssjoin_routing_audit_modes shares one tokenize/prefix/
    volume pass (and, over budget, one pipeline run) across its two mode
    rows — the rows must stay exactly what two independent
    ssjoin_routing_audit calls produce, in both budget regimes."""
    from detecting_and_addressing_change_spark.operators.setjoin import (
        ssjoin_routing_audit,
        ssjoin_routing_audit_modes,
    )

    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    for budget in (10**12, 0):  # exact route / forced-minhash regime
        got = {
            r["mode"]: tuple(r)[1:]
            for r in ssjoin_routing_audit_modes(
                df, threshold=0.5, budget_rows=budget
            ).collect()
        }
        assert sorted(got) == ["auto", "forced_minhash"]
        want_auto = tuple(
            ssjoin_routing_audit(
                df, threshold=0.5, budget_rows=budget, route="auto"
            ).collect()[0]
        )
        want_forced = tuple(
            ssjoin_routing_audit(
                df, threshold=0.5, budget_rows=budget, route="minhash"
            ).collect()[0]
        )
        assert got["auto"] == want_auto
        assert got["forced_minhash"] == want_forced


def test_adaptive_forced_route_overrides_budget(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    _, info = adaptive_jaccard_join(df, budget_rows=0, route="exact")
    assert info["route"] == "exact"
    with pytest.raises(ValueError):
        adaptive_jaccard_join(df, route="bogus")


def test_default_budget_derives_from_shuffle_partitions(spark, corpus_rows):
    """VERDICT r9 #6: the default budget is cluster-shaped —
    shuffle-partition count x the per-task candidate-row budget — so the
    routing threshold scales with the session instead of a constant."""
    from detecting_and_addressing_change_spark.operators.setjoin import (
        _BUDGET_ROWS_PER_TASK,
        default_budget_rows,
    )

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert default_budget_rows(spark) == parts * _BUDGET_ROWS_PER_TASK
    # budget_rows=None resolves to the derived default and reports it
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    _, info = adaptive_jaccard_join(df, route="auto")
    assert info["budget_rows"] == parts * _BUDGET_ROWS_PER_TASK
    # the tiny test corpus is far under any real budget -> exact route
    assert info["route"] == "exact"


try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        t=st.sampled_from([0.25, 0.5, 0.75]),
        n_docs=st.integers(4, 18),
    )
    def test_lossless_on_random_low_entropy_corpora(spark, seed, t, n_docs):
        """Adversarial regime for the prefix filter: documents drawn from
        a TINY vocabulary, so shingle dfs are high, ties in the (df, w)
        global order are common, and docs share most tokens — any
        order-consistency bug in the positional bounds loses pairs here
        first. Must equal brute force exactly."""
        import random

        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d", "e"]
        rows = []
        for i in range(n_docs):
            L = rng.randint(3, 14)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(L))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["a_id"], r["b_id"])
            for r in prefix_jaccard_join(df, threshold=t).collect()
        }
        assert got == _brute_pairs(rows, t), (seed, t, rows)

    @settings(max_examples=6, deadline=None)
    @given(seed=st.integers(0, 10_000), n_docs=st.integers(6, 14))
    def test_routing_never_changes_pairs_high_entropy(spark, seed, n_docs):
        """VERDICT r7 #1 done-criterion: on high-entropy corpora (per-doc
        vocabularies, near-dup pairs well above the banding knee) the
        MinHash-candidate route returns EXACTLY the exact route's pair
        set — the regime where the fallback is the right answer is the
        regime where it loses nothing. Miss probability at j~0.7 with 32
        bands of 2 is ~1e-10 and the hash family is deterministic, so
        this is a stable property, not a flaky one."""
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n_docs):
            words = [f"w{seed}x{i}y{j}" for j in range(20)]
            rng.shuffle(words)
            rows.append((2 * i, " ".join(words)))
            if i % 2 == 0:  # high-similarity partner: one word swapped
                words = list(words)
                words[rng.randrange(20)] = f"alt{seed}z{i}"
                rows.append((2 * i + 1, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pe, ie = adaptive_jaccard_join(df, route="exact")
        pm, im = adaptive_jaccard_join(df, route="minhash")
        assert ie["candidate_volume"] == im["candidate_volume"]
        se = {(r["a_id"], r["b_id"], r["jaccard"]) for r in pe.collect()}
        sm = {(r["a_id"], r["b_id"], r["jaccard"]) for r in pm.collect()}
        assert se == sm and len(se) >= n_docs // 2, (seed, rows)


def test_verify_ignores_toks_column_order(spark):
    """ADVICE r8: ``_verify`` must take the id column by NAME, not infer
    it from ``toks.columns[0]`` — a toks frame with (w, id) order must
    verify identically to the canonical (id, w) order."""
    from detecting_and_addressing_change_spark.operators.setjoin import (
        _verify,
    )

    toks = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (2, "d")],
        "doc_id long, w string",
    )
    cand = spark.createDataFrame(
        [(1, 2, 3, 3)], "a_id long, b_id long, na long, nb long"
    )
    expected = [(1, 2, 0.5)]
    got = sorted(
        map(tuple, _verify(toks, cand, 0.5, "doc_id").collect())
    )
    assert got == expected
    reordered = toks.select("w", "doc_id")
    got2 = sorted(
        map(tuple, _verify(reordered, cand, 0.5, "doc_id").collect())
    )
    assert got2 == expected
