"""Pluggable embedder interface (SURVEY §2.2 R3 / §2.7 U7).

Reference: HuggingFace tokenizer + transformer forward, truncation at 512,
selecting one hidden state (``constants/transformers.py:32-52``); three
model families BERT / SciBERT / DistilBERT (``:12-19``). The Spark surface
is ``mapInPandas``: text column in, ``array<array<float>>`` token embeddings
out, with per-partition model initialization (cold-start amortized over the
partition, SURVEY §7 'what's hard' #4).

Backends:
- ``hash``  — deterministic hash embedder (FIXTURES.md §2's formula:
  emb(word, model)[d] = frac(sin(hash31(word, model, d))) * 2 - 1). Fully
  reproducible across runs/partitions; distinct "models" are distinct
  functions of the text, which is what the drift experiments need (swapping
  the embedding space mid-stream IS the abrupt-drift simulation, SURVEY §0
  item 6a).
- ``hf``    — real transformers, gated behind an import-try (not available
  in this container; the interface is the contract).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("model", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.ArrayType(T.FloatType()))),
        T.StructField("seq_len", T.IntegerType()),
    ]
)


_M31 = 2_147_483_647


def _hash31(word: str, model: str, d: int) -> int:
    h = 7
    for ch in f"{model}:{word}:{d}":
        h = (h * 31 + ord(ch)) % _M31
    return h


def _word_vec(
    word: str, model: str, dim: int, memo: dict[str, list[float]]
) -> list[float]:
    """One word's embedding, memoized. The polyhash is sequential over the
    string, so the shared ``f"{model}:{word}:"`` prefix is hashed once and
    only the digits of ``d`` are folded in per dimension — bit-identical to
    ``_hash31`` (the q39/x36 SQL oracles pin the exact values). Memoization
    matters because corpora are Zipfian: at sf0.1 the documents table has
    ~60x more word occurrences than distinct words."""
    v = memo.get(word)
    if v is None:
        h0 = 7
        for ch in f"{model}:{word}:":
            h0 = (h0 * 31 + ord(ch)) % _M31
        v = []
        for d in range(dim):
            h = h0
            for ch in str(d):
                h = (h * 31 + ord(ch)) % _M31
            v.append(math.modf(math.sin(h))[0] * 2 - 1)
        memo[word] = v
    return v


def hash_embed_tokens(
    text: str,
    model: str,
    dim: int,
    max_seq_len: int = 512,
    _memo: dict[str, list[float]] | None = None,
) -> list[list[float]]:
    """Per-token deterministic embedding; truncates at max_seq_len exactly
    like the reference tokenizer (constants/transformers.py:45)."""
    memo = _memo if _memo is not None else {}
    words = text.split(" ")[:max_seq_len]
    return [_word_vec(w, model, dim, memo) for w in words]


def embed_documents(
    docs: DataFrame,
    model: str = "BERT",
    dim: int = 8,
    max_seq_len: int = 512,
    backend: str = "hash",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """S3/R3: text -> ragged token-embedding arrays via mapInPandas.
    Returns DataFrame[doc_id, model, tokens, seq_len]."""
    if backend == "hash":

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # per-partition init would go here for a real model; for the
            # hash backend it's the word-vector memo (vocabulary is shared
            # across every doc in the partition)
            memo: dict[str, list[float]] = {}
            for pdf in batches:
                toks = [
                    hash_embed_tokens(t or "", model, dim, max_seq_len, memo)
                    for t in pdf[text_col]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col].values,
                        "model": [model] * len(pdf),
                        "tokens": toks,
                        "seq_len": [len(t) for t in toks],
                    }
                )

        from ..sources.tables import spread_small_input

        # model inference is the dominant cost (SURVEY §4.3) and is
        # embarrassingly parallel: never let a single-file scan serialize it
        return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
            fn, EMBED_SCHEMA
        )

    if backend == "mini":
        # deterministic numpy attention encoder (operators/transformer.py)
        # — the transformer COMPUTE graph under hash weights; contextual
        # token states where the hash backend is bag-of-words.
        # POOLING CAVEAT: pool 'mini' states with first_token_pool_col,
        # not mean_pool_col — final-LayerNorm states nearly cancel under
        # mean pooling (cross-class distance 0.009 mean vs 0.35 first-
        # token; see operators/transformer.py module docstring).
        from .transformer import transformer_embed_documents

        return transformer_embed_documents(
            docs,
            model=model,
            dim=dim,
            max_seq_len=max_seq_len,
            text_col=text_col,
            id_col=id_col,
        )

    if backend == "hf":
        _require_hf()  # raises unless torch+transformers are installed
        from ..sources.tables import spread_small_input

        return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
            _hf_embed_fn(model, dim, max_seq_len, text_col, id_col),
            EMBED_SCHEMA,
        )
    raise ValueError(f"unknown backend {backend!r}")


def embed_documents_tagged(
    docs: DataFrame,
    dim: int = 8,
    max_seq_len: int = 512,
    backend: str = "hash",
    text_col: str = "text",
    id_col: str = "doc_id",
    model_col: str = "model",
) -> DataFrame:
    """Multi-model variant of :func:`embed_documents`: ``docs`` carries a
    per-row ``model`` column (typically a union of model-tagged copies), so
    N embedding spaces materialize in ONE mapInPandas job instead of N
    sequential jobs — at 100 TB this halves the number of full-corpus
    passes for the two-space drift experiments, and on local[32] it lets
    both models' rows share the same task wave. Bit-identical per row to
    the single-model path (same hash, same per-model memo)."""
    if backend == "hf":
        # raised FIRST (before any torch availability check): installing
        # torch does NOT activate this entry point — the multi-model
        # per-partition model cache is not wired. embed_documents has the
        # live hf path; run it once per model instead.
        raise NotImplementedError(
            "hf backend: multi-model tagged embedding is not wired (a "
            "per-partition model CACHE keyed by the row's model column); "
            "run embed_documents(backend='hf') once per model instead"
        )
    elif backend != "hash":
        raise ValueError(f"unknown backend {backend!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memos: dict[str, dict[str, list[float]]] = {}
        for pdf in batches:
            toks = [
                hash_embed_tokens(
                    t or "", m, dim, max_seq_len, memos.setdefault(m, {})
                )
                for t, m in zip(pdf[text_col], pdf[model_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "model": pdf[model_col].values,
                    "tokens": toks,
                    "seq_len": [len(t) for t in toks],
                }
            )

    from ..sources.tables import spread_small_input

    return spread_small_input(
        docs.select(id_col, text_col, model_col)
    ).mapInPandas(fn, EMBED_SCHEMA)


POOLED_SCHEMA = T.StructType(
    [
        T.StructField("model", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def pooled_embed_documents_tagged(
    docs: DataFrame,
    dim: int = 8,
    max_seq_len: int = 512,
    backend: str = "hash",
    text_col: str = "text",
    id_col: str = "doc_id",
    model_col: str = "model",
) -> DataFrame:
    """Fused R3+R9: embed AND mean-pool inside one mapInPandas.

    ``mean_pool_col(embed_documents_tagged(...))`` ships every ragged
    ``array<array<float>>`` token matrix through Arrow only for the JVM to
    immediately fold it away — for mean-pooled consumers (the q39/q59/q60
    drift pipelines, q61 mapping) that transfer dominates the embed stage.
    This fused path transfers ``dim`` doubles per row instead of
    ``seq_len x dim`` floats, cutting the Arrow volume ~seq_len-fold.

    Bit-identical to the two-step plan by construction: token vectors are
    rounded through float32 exactly like the EMBED_SCHEMA Arrow cast, then
    accumulated left-to-right in float64 per dimension — the same fold
    ``mean_pool_col``'s ``F.aggregate`` performs — and divided by the token
    count. Pinned by tests/test_arrays.py::test_fused_pooling_bit_identical.
    """
    if backend == "hf":
        # raised regardless of torch availability — install does not
        # activate THIS entry point (only embed_documents is wired)
        raise NotImplementedError(
            "hf backend: fused pooled embedding is not wired (pool the "
            "embed_documents(backend='hf') token vectors via "
            "functions.arrays instead)"
        )
    elif backend != "hash":
        raise ValueError(f"unknown backend {backend!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memos: dict[str, dict[str, np.ndarray]] = {}

        def vec32(word: str, model: str) -> np.ndarray:
            memo = memos.setdefault(model, {})
            v = memo.get(word)
            if v is None:
                v = np.asarray(
                    _word_vec(word, model, dim, {}), dtype=np.float32
                )
                memo[word] = v
            return v

        for pdf in batches:
            feats = []
            for t, m in zip(pdf[text_col], pdf[model_col]):
                words = (t or "").split(" ")[:max_seq_len]
                # left-to-right float64 fold over float32 token vectors:
                # numpy upcasts each float32 addend exactly like
                # x.cast("double"), and the per-token loop preserves the
                # non-associative FP order the HOF fold (and the DuckDB
                # oracle's list fold) uses
                acc = np.zeros(dim, dtype=np.float64)
                for w in words:
                    acc += vec32(w, m)
                feats.append(acc / len(words))
            yield pd.DataFrame(
                {
                    "model": pdf[model_col].values,
                    "doc_id": pdf[id_col].values,
                    "features": feats,
                }
            )

    from ..sources.tables import spread_small_input

    return spread_small_input(
        docs.select(id_col, text_col, model_col)
    ).mapInPandas(fn, POOLED_SCHEMA)


# reference constants/transformers.py:12-19: BERT/DistilBERT load from the
# hub; SciBERT loads the same checkpoint the repo vendors locally, whose
# public hub id is allenai/scibert_scivocab_uncased.
HF_CHECKPOINTS = {
    "BERT": "bert-base-uncased",
    "SCIBERT": "allenai/scibert_scivocab_uncased",
    "DISTILBERT": "distilbert-base-uncased",
}


def hf_available() -> bool:
    """True when the real HF backend can run: ``pip install torch
    transformers`` is the exact activation step (no code change needed —
    the wiring below is live, tests/test_hf_seam.py exercises it against
    a stub today and runs it for real the day torch appears)."""
    try:
        import transformers  # noqa: F401
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


def _hf_embed_fn(
    model: str,
    dim: int,
    max_seq_len: int,
    text_col: str,
    id_col: str,
):
    """The mapInPandas worker for backend='hf': loads tokenizer + model
    ONCE per partition (cold-start amortized over the partition's rows,
    the same contract as the reference's per-process Transformer init,
    ``constants/transformers.py:29-30``), tokenizes with truncation at
    ``max_seq_len`` (``:46``), one no-grad forward per row, and emits the
    last hidden state's token vectors TRUNCATED to the first ``dim``
    channels so the output schema matches the hash backend's (pass
    dim=hidden_size for the full vectors). Returned separately from
    ``embed_documents`` so the seam is unit-testable against a stubbed
    torch/transformers without a worker process."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import torch
        from transformers import AutoModel, AutoTokenizer

        ckpt = HF_CHECKPOINTS.get(model, model)
        tokenizer = AutoTokenizer.from_pretrained(ckpt)
        mdl = AutoModel.from_pretrained(ckpt)
        mdl.eval()
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                enc = tokenizer(
                    t or "",
                    truncation=True,
                    max_length=max_seq_len,
                    return_tensors="pt",
                )
                with torch.no_grad():
                    hidden = mdl(**enc).last_hidden_state
                arr = np.asarray(hidden)[0]  # (seq, hidden)
                if arr.shape[1] < dim:
                    raise ValueError(
                        f"hf backend: requested dim={dim} exceeds the "
                        f"model's hidden size {arr.shape[1]} — vectors "
                        "would silently come out short; pass dim <= "
                        "hidden_size"
                    )
                toks.append(
                    [row[:dim].astype(np.float32).tolist() for row in arr]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "model": [model] * len(pdf),
                    "tokens": toks,
                    "seq_len": [len(t) for t in toks],
                }
            )

    return fn


def _require_hf() -> None:
    if not hf_available():
        raise NotImplementedError(
            "HF backend requires transformers+torch: pip install torch "
            "transformers. The wiring is live (operators/embedder.py:"
            "_hf_embed_fn) — install is the only activation step."
        )


def materialize_embeddings(
    docs: DataFrame, out_path: str, models: tuple[str, ...] = ("BERT",),
    dim: int = 8,
) -> None:
    """S3 sink: embed once, persist as parquet partitioned by model — the
    reference's transform_data.py materialization (its profiler shows the
    55% wall-time win, SURVEY §6) as a partition-pruned table."""
    frames = None
    for m in models:
        df = embed_documents(docs, model=m, dim=dim)
        frames = df if frames is None else frames.unionByName(df)
    frames.write.mode("overwrite").partitionBy("model").parquet(out_path)
