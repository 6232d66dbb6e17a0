"""Deterministic, engine-portable hashing primitives.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` differ, so every hash
that participates in the oracle contract is built from primitives both
engines implement identically: integer arithmetic and ``md5`` hex digests
(SURVEY §2.8 Q22 note).

Used by: the deterministic train/test split (O3, SURVEY §2.5), MinHash
signatures, SimHash fingerprints, and rolling document fingerprints — the
dedup family of the LLM-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2_147_483_648  # 2^31
LCG_A = 1_103_515_245


def lcg_bucket(key: Column, n_buckets: int) -> Column:
    """Portable integer hash-bucket: ((key % 2^31) * A) % 2^31 % n.
    Stays within int64 (max intermediate ~2.4e18 < 2^63), so it is exact —
    and identical — in Spark (ANSI) and DuckDB."""
    return (key % M31) * LCG_A % M31 % F.lit(n_buckets)


def hash_split_col(key: Column, n_buckets: int = 5, test_bucket: int = 0) -> Column:
    """O3 deterministic train/test split (SURVEY §2.5): replaces the
    reference's random ``train_test_split`` (streams/stream_data.py:92-94)
    with a stable hash so epochs never re-split (SURVEY §8 Q9)."""
    return lcg_bucket(key, n_buckets) == test_bucket


def md5_minhash_col(shingle: Column, perm: int) -> Column:
    """One MinHash 'permutation': the first 8 hex chars of
    md5('<perm>:' || shingle). Lexicographic MIN over these hex strings is a
    valid min-wise hash and computes identically in Spark and DuckDB."""
    return F.substring(F.md5(F.concat(F.lit(f"{perm}:"), shingle)), 1, 8)


def md5_u16_col(s: Column) -> Column:
    """First 16 bits of md5(s) as an integer — the per-feature hash for
    SimHash. conv(hex, 16, 10) is available in Spark; the oracle uses
    DuckDB's from_hex/CAST equivalent arithmetic."""
    return F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("int")


def rolling_hash_col(text: Column, window: int = 8, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the character stream (document
    fingerprinting, winnowing-style). Returns the MIN of all window hashes —
    a single stable fingerprint per document. ascii() of each char; folds
    left-to-right, exact int64 arithmetic (mod keeps products < 2^60)."""
    chars = F.split(text, "")
    n = F.size(chars)
    cnt = F.greatest(n - (window - 1), F.lit(1))
    window_hash = lambda i: F.aggregate(  # noqa: E731
        F.slice(chars, i, window),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
    hashes = F.transform(F.sequence(F.lit(1), cnt), window_hash)
    return F.array_min(hashes)
