"""Text functions for document pipelines — native column algebra.

Tokenization is a plain single-space split (the fixture corpus is
space-joined word soup); `tokenize_words` is the general regex variant.
Every function here has an exact DuckDB-SQL equivalent, which is what makes
the text-analysis queries oracle-checkable (plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small function-word list used for stopword ratios and the language-ID
#: heuristic. Must stay in sync with the oracle SQL literals.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: Function-word profiles for the language-ID heuristic, in preference
#: order (ties resolve to the earlier language). Mirrored verbatim in the
#: DuckDB oracle (plans/llm_ops.py).
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "to", "in", "is")),
    ("es", ("el", "la", "de", "que", "y", "en", "un")),
    ("fr", ("le", "la", "et", "les", "des", "un", "une")),
    ("de", ("der", "die", "und", "das", "ein", "zu", "ist")),
    ("zh", ("de", "le", "shi", "zai", "he", "you", "wo")),
)

#: BPE-ish chunking: greedy runs of 1-4 word chars approximate subword
#: token counts without a vocab. Same regex in the oracle.
BPE_CHUNK_RE = "[a-z0-9]{1,4}"


def chunk_spans(text: Column, size: int = 512, step: int = 384) -> Column:
    """Overlapping character-window chunks of ``text`` as
    ``array<struct<chunk_start:int, chunk:string>>``.

    Native column algebra (sequence → transform → substr): the fan-out runs
    inside whole-stage codegen in the scan stage, no Python and no shuffle.
    ``step < size`` gives ``size - step`` characters of overlap between
    consecutive chunks — the standard context-window chunking for training
    corpora. Empty/null text yields an empty array (``sequence`` would
    reject a negative range under ANSI).
    """
    starts = F.sequence(F.lit(0), F.length(text) - 1, F.lit(step))
    spans = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("chunk_start"),
            text.substr(s + 1, F.lit(size)).alias("chunk"),
        ),
    )
    empty = F.array().cast("array<struct<chunk_start:int,chunk:string>>")
    return F.when(F.length(text) > 0, spans).otherwise(empty)


def tokens(text: Column) -> Column:
    """Split on single spaces, dropping empty tokens."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def tokenize_words(text: Column) -> Column:
    """Regex word tokenizer (lowercased) for free-form text."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are function words — crude fluency signal."""
    toks = tokens(text)
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stops).cast("double") / F.size(toks).cast("double")


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-space chars / token count."""
    toks = tokens(text)
    chars = F.length(F.regexp_replace(text, " ", ""))
    return chars.cast("double") / F.size(toks).cast("double")


def normalize(text: Column) -> Column:
    """Dedup normalization: lowercase, strip non [a-z0-9 ], collapse runs of
    whitespace, trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of normalized text)."""
    return F.md5(normalize(text))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams as array<string> (for Jaccard/MinHash).

    Built with sequence+transform+substring — stays in codegen, no UDF.
    """
    t = normalize(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased) — a crude
    boilerplate/markup signal."""
    t = F.lower(text)
    kept = F.length(F.regexp_replace(t, "[^a-z0-9 ]", ""))
    return (F.length(t) - kept).cast("double") / F.length(t).cast("double")


def bpe_ish_count(text: Column) -> Column:
    """Subword-ish token count: number of greedy 1-4 char alnum chunks."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_CHUNK_RE), 0)) \
        .cast("long")


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4,
                        base: int = 257, mod: int = 2147483647) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every ``k``-char gram of the normalized text
    with a polynomial rolling-hash family (h = Σ c·B^i mod M, computed
    as a left fold per gram — k is constant, so per-position cost is
    O(k) and the whole pass is linear), then keep the MINIMUM hash of
    each window of ``w`` consecutive gram hashes. The distinct minima
    are the document's fingerprint set: winnowing guarantees any shared
    substring of length >= k + w - 1 contributes at least one COMMON
    fingerprint between two documents, at ~2/(w+1) the density of full
    k-gram shingling — the sub-document rolling-hash rung next to the
    word-shingle and span-grid fingerprints.

    Returns a sorted distinct array<long>; empty for docs shorter than
    k + w - 1 normalized chars. The identical integer arithmetic runs
    on DuckDB via list_reduce/list_slice (see the registered oracle),
    pinned bit-exact by the fp-set md5 in the graded query. B=257 > any
    code point of the [a-z0-9 ] normalized alphabet; M = 2^31 - 1
    keeps acc*B + c < 2^63 (exact int64 on both engines).

    USE ``winnow_fingerprint_table`` for real frames: this Column form
    nests the gram-hash array inside the window lambda, and Catalyst's
    interpreted higher-order functions re-evaluate inlined
    subexpressions PER ELEMENT — O(n²·k) per doc (measured: minutes on
    a 500-doc fixture vs ~1 s staged). It is kept as the semantic
    reference and for single-expression contexts."""
    norm = normalize(text)
    codes = F.transform(
        F.filter(F.split(norm, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"))
    gh = gram_hashes(codes, k, base, mod)
    return winnow_mins(gh, w)


def _guarded_idx(n: Column) -> Column:
    # sequence(1, 0) counts DOWN in Spark: short docs must yield an
    # EMPTY index array, not [1, 0]
    return F.when(n >= 1, F.sequence(F.lit(1), n)) \
            .otherwise(F.array().cast("array<int>"))


def char_codes(text: Column) -> Column:
    """Normalized text → array<long> of character codes (the winnowing
    alphabet): scan-side, exact mirror of the oracle's
    ``list_transform(regexp_split_to_array(norm, ''), ascii)``."""
    norm = normalize(text)
    return F.transform(
        F.filter(F.split(norm, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"))


def gram_hashes(codes: Column, k: int = 8, base: int = 257,
                mod: int = 2147483647) -> Column:
    """Polynomial hash of every k-gram of a code array; k is constant so
    the pass is O(n·k). ``codes`` should be a MATERIALIZED attribute (see
    winnow_fingerprint_table) — an inline expression here re-evaluates
    per gram.

    The per-position hash is an UNROLLED Horner chain of ``element_at``
    reads (k is a plan-time constant), not an inner
    ``aggregate(slice(...))`` fold: higher-order lambdas are interpreted
    (CodegenFallback), and the fold form allocates a k-element ArrayData
    copy plus k nested lambda frames per position — measured 2.0 s →
    1.15 s at sf0.1 for the identical integers (the mod after every
    multiply-add keeps the accumulator < 2^31, so the chain never
    overflows long). Same result, same order, bit-exact vs the
    list_reduce oracle spelling."""
    n_g = F.size(codes) - k + 1

    def _horner(i: Column) -> Column:
        acc: Column = F.lit(0).cast("long")
        for j in range(k):
            acc = ((acc * base
                    + F.element_at(codes, (i + F.lit(j)).cast("int")))
                   % mod)
        return acc

    return F.transform(_guarded_idx(n_g), _horner)


def winnow_mins(gh: Column, w: int = 4) -> Column:
    """Distinct sorted minima of each w-window of gram hashes — the
    winnowing selection. ``gh`` should be a materialized attribute.
    The window min is an unrolled ``least`` over w ``element_at`` reads
    (w is a plan-time constant) for the same no-slice-allocation reason
    as gram_hashes."""
    mins = F.transform(
        _guarded_idx(F.size(gh) - w + 1),
        lambda j: F.least(*[F.element_at(gh, (j + F.lit(t)).cast("int"))
                            for t in range(w)]))
    return F.array_sort(F.array_distinct(mins))


def luhn_valid_sql(digits_expr: str, n_digits: int) -> str:
    """SQL text for a Luhn checksum validation of an ``n_digits``-long
    digit string (credit-card PANs): from the RIGHT, odd positions count
    as-is, even positions double with a 9-subtraction above 9, and the
    total must be ≡ 0 (mod 10). Pure fold algebra — scan-side codegen on
    Spark, list_sum on DuckDB — so PII card redaction can be gated on
    ACTUAL validity instead of redacting every 16-digit run (the classic
    false-positive source: order ids, timestamps, hashes). The unrolled
    CASE/substr/CAST spelling parses identically on Spark (F.expr) and
    DuckDB, so ONE string serves the query and its oracle — parity by
    construction."""
    terms = []
    for i in range(n_digits):  # i = 0-based position from the right
        # TRY_CAST (both engines): a missing candidate ('' slices) must
        # yield NULL -> not-valid, not an ANSI cast error — AND does not
        # short-circuit expression evaluation in Spark.
        d = f"TRY_CAST(substr({digits_expr}, {n_digits - i}, 1) AS INT)"
        if i % 2 == 1:
            terms.append(f"(CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 "
                         f"ELSE 2*{d} END)")
        else:
            terms.append(d)
    return "((" + " + ".join(terms) + ") % 10 = 0)"


def _in_set(words: tuple[str, ...]):
    # Factory (not a default arg) so the returned lambda stays unary —
    # F.filter treats a 2-arg lambda as (element, index).
    return lambda t: t.isin(*words)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language function-word hit counts (with multiplicity)."""
    return lang_scores_of(tokenize_words(text))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of function-word profile hits; ties
    resolve in LANG_PROFILES order; zero hits everywhere → 'und'.

    Row-expression form — re-tokenizes once per language profile; for bulk
    scoring use lang_id_of over a materialized tokenize_words column."""
    return lang_id_of(tokenize_words(text))


def word_shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a pre-materialized token-array column.

    The token column MUST be an attribute materialized behind a projection
    or exchange boundary — higher-order functions are interpreted and share
    no subexpressions, so inlining `tokens(text)` here re-runs the split for
    every shingle index: O(tokens²) work per document. See
    operators/dedup.py::tokenized for the canonical shape.

    The per-index ``concat_ws(slice(...))`` is deliberately NOT unrolled
    into per-element ``element_at`` reads (the gram_hashes trick):
    measured at sf0.1, the unrolled form is ~0.3 s faster for consumers
    that read ``sh`` as an array (the Jaccard verify path) but ~2×
    SLOWER end-to-end for the explode-heavy consumers
    (corpus_decontamination / corpus_pipeline_end_to_end went 5.6 s →
    10 s for the pair) — the slice allocation is cheaper than the extra
    interpreted element_at evals once the generator path dominates.
    """
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as array<string> (row-expression form; for bulk
    shingling prefer word_shingles_of over materialized tokens)."""
    return word_shingles_of(tokens(text), n)


def stopword_ratio_of(toks: Column) -> Column:
    """stopword_ratio over a materialized token array."""
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stops).cast("double") / F.size(toks).cast("double")


def avg_token_len_of(toks: Column, text: Column) -> Column:
    """avg_token_len over a materialized token array."""
    chars = F.length(F.regexp_replace(text, " ", ""))
    return chars.cast("double") / F.size(toks).cast("double")


def lang_scores_of(wtoks: Column) -> list[tuple[str, Column]]:
    """lang_scores over a materialized word-token array."""
    return [
        (lang, F.size(F.filter(wtoks, _in_set(words))))
        for lang, words in LANG_PROFILES
    ]


def argmax_label(scores: list[tuple[str, Column]], default: str = "und") -> Column:
    """Label of the max score; ties resolve to the EARLIER list entry; all
    scores <= 0 → default. The when-chain references each score column
    several times, so pass cheap attributes (pre-computed score columns)
    for bulk use, not filter expressions.
    """
    best: Column = F.lit(default)
    best_score: Column = F.lit(0)
    # Reverse order + >= comparison => earlier entries win ties.
    for label, score in reversed(scores):
        best = F.when(score >= best_score, F.lit(label)).otherwise(best)
        best_score = F.when(score >= best_score, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit(default))


def lang_id_of(wtoks: Column) -> Column:
    """lang_id over a materialized word-token array."""
    return argmax_label(lang_scores_of(wtoks))


#: Default linear quality-classifier weights (the fasttext-gate stand-in):
#: trained weights ship as a different literal map, not a different plan.
DEFAULT_QUALITY_WEIGHTS = {"bias": -0.2, "stop": 3.0, "punct": -2.0,
                           "alen": -0.15, "lntok": 0.1}


def quality_score_of(text: Column, toks: Column,
                     weights: dict | None = None) -> Column:
    """Linear quality-classifier score = sigmoid(w . features) over the
    curation feature vector (stopword ratio, punctuation ratio, mean
    token length, log token count). Pure scan-side column algebra —
    shared by the batch quality_classifier_score query and the streaming
    quality gate so both apply the identical model. ``toks`` must be a
    materialized token-array attribute (same contract as
    word_shingles_of); callers must filter size(toks) > 0 first."""
    w = weights or DEFAULT_QUALITY_WEIGHTS
    stop_r = (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
              * F.lit(1.0) / F.size(toks))
    punct_r = ((F.length(F.lower(text))
                - F.length(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")))
               * F.lit(1.0) / F.length(text))
    alen = (F.length(F.regexp_replace(text, " ", "")) * F.lit(1.0)
            / F.size(toks))
    z = (F.lit(w["bias"]) + F.lit(w["stop"]) * stop_r
         + F.lit(w["punct"]) * punct_r + F.lit(w["alen"]) * alen
         + F.lit(w["lntok"]) * F.log(F.size(toks).cast("double")))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


#: Gear table for content-defined chunking: one deterministic 31-bit value
#: per character of the normalized alphabet [a-z0-9 ], derived from md5 so
#: both engines (and the sequential test reference) can rebuild it.
CDC_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def _cdc_gear() -> dict[str, int]:
    from data_pipeline_eng_project_1_spark.functions.hashing import py_hex_int

    return {c: py_hex_int(f"gear:{c}", 7) % 2147483648 for c in CDC_ALPHABET}


def cdc_boundaries(text: Column, avg: int = 64, min_len: int = 32,
                   max_len: int = 128) -> Column:
    """Content-defined chunk boundaries (FastCDC/gear-style) over the
    NORMALIZED text, as a sorted array<int> of chunk START offsets
    (0-based, always starting with 0 for non-empty text).

    Rolling gear hash h = (2h + gear[c]) mod 2^31 — shift-out-free: a
    character's influence halves each step and is gone after 31 chars,
    so boundaries depend only on a bounded trailing window. A position
    ends a chunk when h % avg == 0 and the chunk has >= min_len chars;
    max_len forces a cut. That is the dedup-stable chunking property
    fixed-stride spans (dedup_exact_spans) cannot have: INSERTING text
    shifts every downstream stride boundary, but gear boundaries
    re-synchronize within ~31 chars + min_len, so unchanged tails keep
    identical chunks (and identical chunk hashes) — the primitive behind
    storage dedup and incremental-crawl chunk reuse.

    One interpreted O(n) fold per document (aggregate with a struct
    accumulator — the winnowing precedent; all arithmetic stays under
    2^32 so ANSI never overflows). The same fold spells in DuckDB as
    list_reduce for an r8 oracle; tests cross-check a sequential Python
    reference and the resynchronization property.
    """
    gear = _cdc_gear()
    # literal lookup array indexed by ascii code (codes 32..122 cover the
    # normalized alphabet; anything else contributes 0 — normalize()
    # guarantees it never occurs)
    table = [0] * 123
    for c, g in gear.items():
        table[ord(c)] = g
    gear_arr = F.array(*[F.lit(g) for g in table])
    codes = char_codes(text)
    zero = F.struct(
        F.lit(0).cast("long").alias("h"),
        F.lit(0).cast("int").alias("run"),
        F.array(F.lit(0).cast("int")).alias("bounds"),
        F.lit(0).cast("int").alias("pos"))

    def step(acc, c):
        h = ((acc["h"] * 2 + F.element_at(gear_arr, (c + 1).cast("int")))
             % 2147483648)
        run = acc["run"] + 1
        pos = acc["pos"] + 1
        cut = ((run >= min_len) & (h % avg == 0)) | (run >= max_len)
        return F.struct(
            F.when(cut, F.lit(0).cast("long")).otherwise(h).alias("h"),
            F.when(cut, F.lit(0)).otherwise(run).cast("int").alias("run"),
            F.when(cut & (pos < F.size(codes)),
                   F.array_append(acc["bounds"], pos.cast("int")))
             .otherwise(acc["bounds"]).alias("bounds"),
            pos.cast("int").alias("pos"))

    out = F.aggregate(codes, zero, step)
    return F.when(F.size(codes) > 0, out["bounds"]) \
            .otherwise(F.array().cast("array<int>"))
