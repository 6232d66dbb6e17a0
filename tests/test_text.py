"""clean_text parity with the reference's regex pipeline
(utils/formatting.py:7-36) + text-analysis expression checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.functions.text import (
    char_ngrams_col,
    clean_text_col,
    lang_id_col,
    token_count_col,
    word_ngrams_col,
)


def run_col(spark, col, rows, schema="text string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_clean_text_rules(spark):
    cases = [
        ("Hello <br/> World", "hello world"),
        ("A <div>tag</div> soup", "a tag soup"),
        ('click <a href="http://x">here</a> now', "click here now"),
        ("  many   spaces\t here ", "many spaces here"),
        ("MiXeD CaSe", "mixed case"),
    ]
    out = run_col(
        spark, clean_text_col(F.col("text")), [(c[0],) for c in cases]
    )
    assert out == [c[1] for c in cases]


def test_word_ngrams(spark):
    out = run_col(
        spark,
        word_ngrams_col(F.col("text"), 3),
        [("a b c d",), ("a b",), ("",)],
    )
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []
    assert out[2] == []


def test_char_ngrams(spark):
    out = run_col(
        spark, char_ngrams_col(F.col("text"), 3), [("abcd",), ("ab",)]
    )
    assert out[0] == ["abc", "bcd"]
    assert out[1] == []


def test_token_count(spark):
    out = run_col(
        spark, token_count_col(F.col("text")), [("a b c",), ("one",)]
    )
    assert out == [3, 1]


def test_lang_id(spark):
    out = run_col(
        spark,
        lang_id_col(F.col("text")),
        [
            ("the cat sat of the mat and it is that",),
            ("der hund und die katze ist ein tier",),
            ("xyzzy qwerty",),
        ],
    )
    assert out == ["en", "de", "unk"]


def test_cdc_chunking_is_shift_resistant(spark):
    """The CDC property x82 exists for: inserting words near the start
    re-fingerprints only the chunks around the edit — chunks after the
    next surviving boundary are byte-identical. Fixed-stride chunking
    (x63's shape) would shift EVERY downstream window instead."""
    from detecting_and_addressing_change_spark.queries.extensions10 import (
        x82,
    )
    from detecting_and_addressing_change_spark.queries.registry import (
        QUERIES,
    )

    import numpy as np

    rng = np.random.RandomState(5)
    # aperiodic content (periodic text collapses distinct fingerprints and
    # makes set overlap meaningless)
    base_words = [f"v{rng.randint(0, 97)}" for _ in range(240)]
    edited = base_words[:10] + ["inserted", "new", "words"] + base_words[10:]

    def fps(words):
        import tempfile

        df = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
            return [
                r["fingerprint"]
                for r in QUERIES["x82_cdc_chunks"](spark, tmp)
                .orderBy("chunk_idx")
                .collect()
            ]

    a, b = fps(base_words), fps(edited)
    shared = len(set(a) & set(b))
    # everything after the edit's chunk re-synchronizes: at least 70% of
    # the original chunks survive byte-identical
    assert shared >= 0.7 * len(set(a)), (shared, len(set(a)), len(set(b)))
    assert x82.__doc__  # silence unused import
