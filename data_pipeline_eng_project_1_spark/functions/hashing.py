"""Portable deterministic hashing — identical results on Spark and DuckDB.

Everything is built on md5 (bit-identical in both engines) because the
oracle comparison demands cross-engine reproducibility; Spark-native
xxhash64/hash have no DuckDB counterpart. All derived integers stay within
60 bits so they are exactly representable as signed BIGINT on both sides.

At scale these run inside whole-stage codegen (md5 + string ops are JVM
intrinsics); no UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_int(s: Column, hex_digits: int = 15) -> Column:
    """First `hex_digits` hex chars of md5(s) as a non-negative BIGINT.

    DuckDB mirror: CAST('0x' || substr(md5(s), 1, n) AS BIGINT).
    15 hex digits = 60 bits: always positive in a signed 64-bit int.
    """
    return F.conv(F.substring(F.md5(s), 1, hex_digits), 16, 10).cast("long")


def seeded_md5(seed: int, s: Column) -> Column:
    """md5 of 'seed:value' — a family of independent hash functions.

    DuckDB mirror: md5(seed || ':' || s).
    """
    return F.md5(F.concat(F.lit(f"{seed}:"), s))


def py_hex_int(s: str, hex_digits: int = 15) -> int:
    """Driver-side twin of hex_int, for precomputing plan constants (e.g.
    LSH hyperplane weights) that both the Spark plan and the oracle SQL
    embed as literals."""
    return int(hashlib.md5(s.encode()).hexdigest()[:hex_digits], 16)


def collided_hash_keys(vocab: DataFrame, col: str) -> DataFrame:
    """xxhash64 values shared by more than one distinct ``col`` value of
    ``vocab`` (ONE ROW PER VALUE expected — a term dictionary, not a
    posting list), as a single-column frame ``h`` — normally EMPTY.

    This is what turns the 8-byte-key trick of the PPJoin index
    (operators/dedup.py::jaccard_pairs_prefix) into a PROVABLY exact
    equi-join for operators whose joined rows feed an aggregate directly
    (no downstream verify step to absorb collisions, e.g. the TF-IDF
    cosine partial sums): broadcast-mark the rows under a collided hash
    and carry the original string ONLY for those (null otherwise), then
    join on the hash with a null-safe residual equality on the carried
    string — a no-op for uniquely-hashed keys (hash identity == value
    identity, zero string bytes shuffled) and exact string equality for
    the collided sliver. The detection aggregate runs on the KB-scale
    dictionary, not the postings."""
    return (vocab.select(F.xxhash64(F.col(col)).alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1).select("h"))
