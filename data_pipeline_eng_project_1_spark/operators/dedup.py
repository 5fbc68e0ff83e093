"""Deduplication operators for document corpora.

The reference pipeline has no dedup at all — its at-least-once file intake
can silently double-load rows (SURVEY.md §2.7, dags/utils.py:107 mints a
fresh uuid per run). This module provides the dedup ladder a training-data
pipeline needs, each rung cheaper-per-candidate than the last:

  exact fingerprint  →  SimHash        →  MinHash-LSH     →  pairwise verify
  (hash groupBy)        (per-doc int)     (banded buckets)   (only candidates)

Scale design (the 100 TB story):
- fingerprint/simhash/minhash signatures are per-row column algebra — narrow,
  no shuffle, embarrassingly parallel.
- LSH banding turns O(n²) pair search into `explode(bands)` + an equi-join on
  the band key: only docs sharing a band collide. The band join is the one
  shuffle; a hot band (thousands of identical docs) is AQE skew-join
  territory, and the band key space can be widened (more bands, fewer rows
  per band) to shed load.
- exact verification (Jaccard over shingle sets) runs ONLY on candidate
  pairs, never all pairs.

Every operator is pure `pyspark.sql.functions` column algebra (codegen,
no UDFs) and has an exact DuckDB mirror (plans/llm_ops.py) — hashing goes
through functions/hashing.py (md5-based, cross-engine identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.functions import hashing, texts

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def add_fingerprint(df: DataFrame, text_col: str = "text",
                    out: str = "fingerprint") -> DataFrame:
    """md5 over normalized text (lowercase, alnum+space, collapsed runs)."""
    return df.withColumn(out, texts.fingerprint(F.col(text_col)))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Hash groupBy (one shuffle on the fingerprint), then a self-semi-join to
    recover full rows. At 100 TB: shuffle is on the 32-char digest, uniform
    by construction — no skew unless true mass duplication, which is exactly
    the rows it removes.
    """
    keep = (
        add_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Shingles + exact Jaccard (the verifier; also usable standalone at small n)
# ---------------------------------------------------------------------------


def shingled(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """(id, sh: array<string> distinct word n-grams, sz: int)."""
    return df.select(
        F.col(id_col).alias("id"),
        texts.word_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("sz", F.size("sh"))


def jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """All pairs with Jaccard(sh_a, sh_b) >= threshold via inverted index:
    explode shingles → equi-join on shingle → count shared = |A∩B| →
    |A∪B| = sz_a + sz_b - inter.

    The join shuffles on the shingle value; a stop-shingle appearing in k
    docs contributes k² pair-rows, so at scale frequent shingles should be
    dropped first (df.filter on a doc-frequency join) — standard inverted-
    index pruning. Candidates never materialize the full O(n²) space.
    """
    ex = sh.select("id", "sz", F.explode("sh").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(sh_col: Column, num_hashes: int = 8) -> Column:
    """array<string> of `num_hashes` minhashes: element i is the
    lexicographic min of md5('i:' || shingle) over the shingle set.

    Hex-string min is equivalent to numeric min of the 128-bit hash —
    and string ordering is identical across engines, so this is exactly
    mirrorable in the DuckDB oracle.
    """
    return F.array(*[
        F.array_min(F.transform(sh_col, lambda s, i=i: hashing.seeded_md5(i, s)))
        for i in range(num_hashes)
    ])


def lsh_bands(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, key:string>> — signature split into bands;
    docs agreeing on ALL rows of any band become candidates."""
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.element_at(sig_col, b * rows_per_band + r + 1)
                for r in range(rows_per_band)
            ]).alias("key"),
        )
        for b in range(bands)
    ])


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        num_hashes: int = 8, bands: int = 4,
                        threshold: float = 0.8) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidate generation + exact
    Jaccard verification. Returns (id_a, id_b, jaccard >= threshold).

    With 4 bands × 2 rows, a pair at Jaccard j collides with probability
    1-(1-j²)⁴ — ≈1 for j≥0.8, ≈0.15 for j=0.2; the verify step removes the
    false positives exactly.
    """
    rows_per_band = num_hashes // bands
    sh = shingled(df, id_col, text_col, n)
    banded = (
        sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .select("id", F.explode(lsh_bands(F.col("sig"), bands, rows_per_band))
                .alias("bk"))
        .select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sha = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                    F.col("sz").alias("sz_a"))
    shb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("sz").alias("sz_b"))
    verified = (
        cand.join(sha, "id_a").join(shb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex digits of md5 -> always positive in a BIGINT
SIMHASH_BANDS = 4  # 4 × 15-bit bands: recall-complete for hamming <= 3


def simhash(text_col: Column, bits: int = SIMHASH_BITS) -> Column:
    """`bits`-bit SimHash over whitespace tokens (with multiplicity).

    Token hash = first bits/4 hex chars of md5 as int; simhash bit i is the
    sign of Σ_tokens (2·bit_i(h) − 1). Single-pass array algebra: ONE md5
    per token, one aggregate() fold carrying the per-bit sums as an array
    accumulator, then a second fold packing signs into the integer — no
    shuffle, no UDF, exact DuckDB mirror (plans/llm_ops.py).
    """
    hex_digits = bits // 4
    toks = texts.tokens(text_col)
    hs = F.transform(toks, lambda t: hashing.hex_int(t, hex_digits))
    # Unrolled per-bit deltas (shift amounts must be python ints), folded in
    # ONE pass over the token hashes with an array accumulator.
    bit_sums = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
                for i in range(bits)
            ]),
            lambda a, d: a + d,
        ),
    )
    # Pack sign bits: 2^i via pow — exact for i < 63 (powers of two are
    # exact doubles). The exponent is a column, so shiftleft (int-only
    # in the Python API) is not usable here.
    return F.aggregate(
        F.zip_with(
            bit_sums, F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda s, i: F.when(s > 0, F.pow(F.lit(2.0), i).cast("long"))
                          .otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  bits: int = SIMHASH_BITS,
                  bands: int = SIMHASH_BANDS) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale.

    Split the simhash into `bands` equal-width keys; by pigeonhole a pair
    with Hamming distance ≤ bands-1 agrees exactly on at least one band, so
    candidate generation by per-band equi-join has FULL recall for
    max_hamming ≤ bands-1 (asserted below); bit_count(xor) verifies exactly.
    Same explode+join shape as MinHash-LSH: one shuffle on the band key.
    """
    assert max_hamming <= bands - 1, "banding loses recall beyond bands-1"
    width = bits // bands
    mask = (1 << width) - 1
    s = df.select(F.col(id_col).alias("id"),
                  simhash(F.col(text_col), bits).alias("sh"))
    banded = s.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("sh", b * width).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.9) -> DataFrame:
    """Pairs of vectors with cosine >= threshold (exact, all-pairs).

    This is the verification-grade variant: O(n²) dot products in codegen.
    At 100 TB you never run this raw — operators/similarity.py provides the
    random-hyperplane LSH bucketing that prunes the pair space first; this
    exact form is what runs inside each bucket.
    """
    from data_pipeline_eng_project_1_spark.functions import vectors

    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                vectors.cosine(F.col("a.v"), F.col("b.v")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
