"""LLM-training-data pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — each registered with an exactly-mirrored
DuckDB oracle (SURVEY.md §2.8; these are extensions beyond the reference,
which has no dedup/similarity/text ops at all).

Oracle-parity ground rules (beyond plans/queries.py's):
- all hashing is md5-based (functions/hashing.py) — bit-identical across
  engines; derived ints stay within 60 bits (signed-BIGINT-safe);
- tokenization / shingling / normalization SQL mirrors the Spark column
  algebra operation-for-operation (same regexes, same slice bounds);
- LSH plane weights and hash seeds are Python-computed constants embedded
  as literals in BOTH the Spark plan and the oracle SQL;
- approximate operators (MinHash-LSH, SimHash banding, hyperplane ANN) are
  deterministic, so the oracle mirrors the ALGORITHM (same candidates, same
  misses), not an idealized exact answer — except simhash banding, whose
  pigeonhole guarantee makes the banded result provably equal to the
  all-pairs answer the oracle computes;
- round() boundary caveat (probed r8, pinned in
  tests/test_text_ops.py::test_round_convention_agreement...): both
  engines round half away from zero, but a double whose SHORTEST
  DECIMAL form ends in 5 at scale+1 while the binary value sits below
  (e.g. 1.005 at scale 2) rounds UP on Spark (BigDecimal.valueOf goes
  through the shortest decimal) and DOWN on DuckDB (binary value).
  Measure-zero for computed aggregates — never put such a LITERAL on a
  rounded output path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.functions import hashing, texts
from data_pipeline_eng_project_1_spark.operators import (
    dedup,
    multimodal,
    relational,
    similarity,
)
from data_pipeline_eng_project_1_spark.plans.registry import register as _register
from data_pipeline_eng_project_1_spark.sources import catalog


def _t(spark: SparkSession, sf_dir: str, name: str):
    return catalog.load_table(spark, name, sf_dir)


# Within-query materialization switch (r17). True (production/bench): a
# frame read k times by one query is localCheckpoint'ed so the diamond
# above it plans the derivation once instead of 2^k times. False: plans
# stay pure lineage — used by the plan audits (tests/test_plans.py) and
# scripts/plan_dump.py to inspect/dump the full pre-materialization plan
# without hiding subtrees behind Scan ExistingRDD, and without running
# the heavy upstream jobs just to print a plan. NOTE on timing: under
# AQE even ``localCheckpoint(eager=False)`` executes every upstream
# shuffle map stage at DataFrame BUILD time (the r4 lesson pinned in
# dedup.connected_components) — bench timings stay honest because
# bench.py times builder+action together in one span.
MATERIALIZE = True


def _ckpt(df):
    """Materialize an intra-query reused frame (no-op when MATERIALIZE
    is off). Local checkpoints live on executor storage — fine for these
    within-query aggregate-sized frames; a corpus-sized frame would want
    persist(MEMORY_AND_DISK) or a reliable checkpoint instead (r16
    verdict note)."""
    if MATERIALIZE:
        return df.localCheckpoint(eager=False)
    return df


def _spread(df):
    """Round-robin repartition to full parallelism before CPU-dense row
    work: text corpora land as few fat parquet files (1 row-group = 1
    split), which would pin regex/hash-heavy scans to a handful of cores
    regardless of cluster size. Gated on the scan's input-file count
    (``dedup.scan_width`` — JVM-side, no ``df.rdd`` plan conversion) so a
    real many-file corpus (thousands of splits at 100 TB) is NOT
    re-shuffled — the parallelism is already there and the exchange would
    move every raw text byte for nothing."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if dedup.scan_width(df) >= n:
        return df
    return df.repartition(n)


# --- shared SQL fragments (DuckDB) -----------------------------------------

#: whitespace tokens, empty strings dropped == texts.tokens
SQL_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"
#: lowercase word tokens == texts.tokenize_words
SQL_WTOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
#: normalized text == texts.normalize
SQL_NORM = ("trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
            " ' +', ' ', 'g'))")
#: distinct word 3-grams == texts.word_shingles(n=3)
SQL_SHINGLES = f"""list_distinct(list_transform(
      generate_series(1, greatest(len({SQL_TOKS}) - 2, 1)),
      i -> array_to_string(list_slice({SQL_TOKS}, i, i + 2), ' ')))"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

@_register(
    "dedup_exact",
    f"""
    WITH fp AS (
      SELECT doc_id, source, md5({SQL_NORM}) AS fingerprint
      FROM documents
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint)
    SELECT source, count(*) AS n_kept
    FROM fp JOIN keep USING (doc_id)
    GROUP BY source
    """,
    doc="exact dedup: md5 fingerprint of normalized text, keep min-id row "
        "per fingerprint (hash groupBy + semi join)",
)
def _q_dedup_exact(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    return dedup.dedup_exact(d).groupBy("source").agg(F.count("*").alias("n_kept"))


@_register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    ex AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / (sz_a + sz_b - inter), 4) AS jaccard
    FROM pairs
    WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.8
    """,
    doc="n-gram Jaccard near-dup pairs via prefix-filtered inverted index "
        "(SSJoin/PPJoin-style: only sz-ceil(t*sz)+1 shingles indexed, "
        "lossless for Jaccard>=t, exact array_intersect verify)",
)
def _q_dedup_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = dedup.shingled(d)
    return (
        # stop_df_cap engaged explicitly (the at-scale form); exact on
        # these fixtures — max prefix doc-frequency 22 < 50, so the
        # all-pairs oracle comparison is unaffected (asserted in tests).
        dedup.jaccard_pairs_prefix(sh, 0.8, stop_df_cap=50)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


@_register(
    "dedup_components",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    ex AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id,
           CAST(min(lbl) AS BIGINT) AS component,
           CAST(CASE WHEN min(lbl) = id THEN 1 ELSE 0 END AS INTEGER)
               AS is_canonical
    FROM reach GROUP BY id
    """,
    doc="cluster-level dedup: connected components over near-dup pairs "
        "(Jaccard>=0.5) by min-label propagation, keep the min-id doc per "
        "component. The oracle replays the closure as a recursive CTE; the "
        "Spark side is the distributed Pregel-style loop "
        "(operators/dedup.py::connected_components). Graded on the FULL "
        "corpus — r3 graded a doc_id%2 slice to halve the bill, but a "
        "sliced query silently changes the output contract (cross-parity "
        "edges never exercised), so r4 restores the full-corpus form.",
)
def _q_dedup_components(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = dedup.shingled(d)
    pairs = dedup.jaccard_pairs_prefix(sh, 0.5).select("id_a", "id_b")
    nodes = d.select(F.col("doc_id").alias("id"))
    comp = dedup.connected_components(nodes, pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
        (F.col("comp") == F.col("id")).cast("int").alias("is_canonical"),
    )


@_register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    ex AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id AS doc_id, min(lbl) AS component
             FROM reach GROUP BY id),
    q AS (SELECT doc_id, len({SQL_TOKS}) AS q FROM documents),
    ranked AS (
      SELECT component, doc_id, q,
             row_number() OVER (PARTITION BY component
                                ORDER BY q DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS n
      FROM comp JOIN q USING (doc_id)
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(n AS BIGINT) AS n_members,
           doc_id AS kept_doc_id,
           CAST(q AS BIGINT) AS kept_tokens
    FROM ranked WHERE rn = 1
    """,
    doc="quality-aware canonical selection: near-dup components "
        "(Jaccard>=0.5, same closure as dedup_components) each keep their "
        "BEST member — most tokens, min-id tiebreak — instead of the "
        "blind min-id pick: in production curation the canonical doc "
        "should be the longest/cleanest copy, not whichever crawled "
        "first. Spark side: hybrid connected_components + one "
        "groupBy(component).agg(min(struct(-q, id))) argmax — an "
        "aggregate, not a window, so components of any size reduce "
        "map-side; the oracle replays the closure recursively and the "
        "argmax as a row_number window.",
)
def _q_dedup_keep_best(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = dedup.shingled(d)
    pairs = dedup.jaccard_pairs_prefix(sh, 0.5).select("id_a", "id_b")
    nodes = d.select(F.col("doc_id").alias("id"))
    comp = dedup.connected_components(nodes, pairs)
    qual = d.select(F.col("doc_id").alias("id"),
                    texts.n_tokens(F.col("text")).alias("q"))
    return (
        comp.join(qual, "id")
        .groupBy(F.col("comp").cast("long").alias("component"))
        .agg(F.count("*").alias("n_members"),
             F.min(F.struct((-F.col("q")).alias("nq"),
                            F.col("id").alias("kid"))).alias("m"))
        .select("component", "n_members",
                F.col("m.kid").alias("kept_doc_id"),
                (-F.col("m.nq")).cast("long").alias("kept_tokens"))
    )


@_register(
    "corpus_leakage_safe_split",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    ex AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id AS doc_id, min(lbl) AS component
             FROM reach GROUP BY id)
    SELECT doc_id,
           CAST(component AS BIGINT) AS component,
           CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, component,
             CAST('0x' || substr(md5('split:' ||
                                     CAST(component AS VARCHAR)), 1, 15)
                  AS BIGINT) % 10 AS b
      FROM comp
    )
    """,
    doc="leakage-safe train/val/test assignment: near-dup components "
        "(Jaccard>=0.5, the dedup_components closure) are split as UNITS "
        "— the md5 bucket is keyed on the COMPONENT id, so near-"
        "duplicates can never straddle train and eval (the classic "
        "contamination bug a doc-keyed random split commits: the eval "
        "set silently contains near-copies of training docs). "
        "Deterministic 80/10/10 via the same integer-exact md5 rule the "
        "sampling family uses; Spark side is hybrid "
        "connected_components + scan-side bucket algebra.",
)
def _q_corpus_leakage_safe_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = dedup.shingled(d)
    pairs = dedup.jaccard_pairs_prefix(sh, 0.5).select("id_a", "id_b")
    nodes = d.select(F.col("doc_id").alias("id"))
    comp = dedup.connected_components(nodes, pairs)
    b = hashing.hex_int(
        F.concat(F.lit("split:"), F.col("comp").cast("string"))) % 10
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
         .alias("split"),
    )


@_register(
    "dedup_exact_spans",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    sp AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(
               list_slice(toks, (i-1)*16 + 1, (i-1)*16 + 16), ' ') AS span
      FROM t, unnest(generate_series(1, len(toks) // 16)) AS u(i)
    ),
    st AS (
      SELECT span, count(*) AS c,
             min(doc_id * 1000000 + pos) AS first_key
      FROM sp GROUP BY span
    )
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           CAST(sum(CASE WHEN c > 1
                          AND sp.doc_id * 1000000 + sp.pos <> first_key
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_spans,
           round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS dup_ratio
    FROM sp JOIN st USING (span)
    GROUP BY sp.doc_id
    """,
    doc="exact-substring (span-level) dedup stats — the sub-document rung "
        "of the ladder (Lee et al. 2022 granularity): non-overlapping "
        "16-token spans, corpus-wide frequency + canonical-first-occurrence "
        "scrub accounting per doc (operators/dedup.py::span_stats). The "
        "oracle replays spans/frequency/first-occurrence in SQL; the "
        "lexicographic (doc_id, pos) first-occurrence tiebreak is encoded "
        "as min(doc_id*1e6 + pos), identical while pos < 1e6 (spans per "
        "doc = tokens/16, orders of magnitude below). Docs shorter than "
        "one span have no row in either engine.",
)
def _q_dedup_exact_spans(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.span_stats(d, k=16).select(
        F.col("id").alias("doc_id"),
        "n_spans", "n_dup_spans", "n_removed_spans", "dup_ratio")


@_register(
    "dedup_exact_spans_staggered",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    sp AS (
      SELECT doc_id, (i-1)*16 AS pos,
             array_to_string(
               list_slice(toks, (i-1)*16 + 1, (i-1)*16 + 16), ' ') AS span
      FROM t, unnest(generate_series(1, len(toks) // 16)) AS u(i)
      UNION ALL
      SELECT doc_id, 8 + (i-1)*16 AS pos,
             array_to_string(
               list_slice(toks, 8 + (i-1)*16 + 1, 8 + (i-1)*16 + 16),
               ' ') AS span
      FROM t, unnest(generate_series(1, (len(toks) - 8) // 16)) AS u(i)
    ),
    st AS (
      SELECT span, count(*) AS c,
             min(doc_id * 1000000 + pos) AS first_key
      FROM sp GROUP BY span
    )
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           CAST(sum(CASE WHEN c > 1
                          AND sp.doc_id * 1000000 + sp.pos <> first_key
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_spans,
           round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS dup_ratio
    FROM sp JOIN st USING (span)
    GROUP BY sp.doc_id
    """,
    doc="staggered span-level exact-substring dedup stats: two interleaved "
        "stride-16 grids (offsets 0 and 8) share one corpus-wide "
        "frequency/first-occurrence universe, so any duplicated run of "
        ">= 24 tokens contains a full span of SOME offset — halving the "
        "stride-k boundary blind spot for the same three-shuffle shape "
        "(operators/dedup.py::span_stats offsets=(0,8); the single-grid "
        "form is dedup_exact_spans). pos is the token START (unique "
        "across grids), and the oracle's min(doc_id*1e6 + pos) tiebreak "
        "replays the (doc, pos) canonical pick exactly.",
)
def _q_dedup_exact_spans_staggered(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.span_stats(d, k=16, offsets=(0, 8)).select(
        F.col("id").alias("doc_id"),
        "n_spans", "n_dup_spans", "n_removed_spans", "dup_ratio")


def _minhash_oracle(num_hashes: int = 8, bands: int = 4,
                    threshold: float = 0.8) -> str:
    rows = num_hashes // bands
    mh_cols = ",\n             ".join(
        f"list_min(list_transform(s, x -> md5('{i}:' || x))) AS mh{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n      UNION ALL\n      ".join(
        "SELECT id, {b} AS band, {key} AS key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    sigs AS (
      SELECT id, s,
             {mh_cols}
      FROM sh
    ),
    bands AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(sa.s, sb.s)) * 1.0
               / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS j
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, round(j, 4) AS jaccard
    FROM verified WHERE j >= {threshold}
    """


def _incremental_oracle(num_hashes: int = 8, bands: int = 4,
                        threshold: float = 0.8) -> str:
    rows = num_hashes // bands
    mh_cols = ",\n             ".join(
        f"list_min(list_transform(s, x -> md5('{i}:' || x))) AS mh{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n      UNION ALL\n      ".join(
        "SELECT id, {b} AS band, {key} AS key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    sigs AS (
      SELECT id, s,
             {mh_cols}
      FROM sh
    ),
    bands AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.id AS id, b.id AS rid
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key
       AND a.id % 2 = 1 AND b.id % 2 = 0
    ),
    near AS (
      SELECT DISTINCT c.id
      FROM cand c JOIN sh sa ON sa.id = c.id JOIN sh sb ON sb.id = c.rid
      WHERE len(list_intersect(sa.s, sb.s)) * 1.0
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
            >= {threshold}
    ),
    fp AS (SELECT doc_id, md5({SQL_NORM}) AS fingerprint FROM documents),
    exact AS (
      SELECT f.doc_id FROM fp f
      WHERE f.doc_id % 2 = 1
        AND f.fingerprint IN (SELECT fingerprint FROM fp
                              WHERE doc_id % 2 = 0)
    )
    SELECT d.doc_id AS id,
           e.doc_id IS NOT NULL AS is_known_exact,
           v.id IS NOT NULL AS is_known_near
    FROM documents d
    LEFT JOIN exact e ON e.doc_id = d.doc_id
    LEFT JOIN near v ON v.id = d.doc_id
    WHERE d.doc_id % 2 = 1
    """


@_register(
    "dedup_incremental",
    _incremental_oracle(),
    doc="continuous-ingestion dedup: the odd-id half of the corpus plays "
        "the INCOMING batch, the even-id half the EXISTING corpus; each "
        "incoming doc is flagged is_known_exact (normalized-text md5 "
        "fingerprint present in the existing side) and is_known_near "
        "(MinHash-LSH band collision against existing docs, then exact "
        "Jaccard >= 0.8 verification — the flag means actually-near, at "
        "LSH recall). This is the op a production pipeline runs per new "
        "crawl batch instead of re-deduplicating the whole corpus: batch-"
        "linear work against precomputable content-addressed signatures "
        "(operators/dedup.py::incremental_dedup_flags).",
)
def _q_dedup_incremental(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    incoming = d.filter(F.col("doc_id") % 2 == 1)
    existing = d.filter(F.col("doc_id") % 2 == 0)
    return dedup.incremental_dedup_flags(incoming, existing)


@_register(
    "dedup_containment",
    f"""
    WITH sh AS (
      SELECT doc_id AS id, {SQL_SHINGLES} AS s FROM documents
    ),
    ex AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / LEAST(sz_a, sz_b), 4) AS containment
    FROM pairs
    WHERE inter * 1.0 / LEAST(sz_a, sz_b) >= 0.9
    """,
    doc="containment (asymmetric near-dup) detection: pairs where the "
        "SMALLER doc's shingles are >=90% contained in the larger's — "
        "the quote/wrapper/boilerplate-inclusion case Jaccard "
        "structurally misses at size mismatch (a doc fully quoted inside "
        "one 10x larger has J ~ 0.1 but containment 1.0). Spark side is "
        "the asymmetric prefix-filtered form (only the small side's "
        "~10% prefix is indexed against the large side's full index — "
        "lossless by the containment pigeonhole, exact verify on "
        "candidates; operators/dedup.py::containment_pairs); the oracle "
        "replays the direct all-pairs inverted-index aggregate.",
)
def _q_dedup_containment(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = dedup.shingled(d)
    return dedup.containment_pairs(sh, 0.9)


@_register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    doc="MinHash(8)-LSH(4 bands×2) candidates + exact Jaccard verify; "
        "md5-seeded hash family, deterministic across engines",
)
def _q_dedup_minhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        dedup.minhash_dedup_pairs(d, num_hashes=8, bands=4, threshold=0.8)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _simhash_oracle_expr(bits: int = dedup.SIMHASH_BITS) -> str:
    """Per-bit sign sums over md5-derived token hashes, packed to a BIGINT."""
    hd = bits // 4
    hs = (f"list_transform({SQL_TOKS}, "
          f"t -> CAST('0x' || substr(md5(t), 1, {hd}) AS BIGINT))")
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {i}) & 1) * 2 - 1)) > 0"
        f" THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
        for i in range(bits)
    )
    return f"SELECT doc_id, {terms} AS simhash FROM (SELECT doc_id, {hs} AS hs FROM documents)"


@_register(
    "dedup_simhash",
    f"""
    WITH sims AS ({_simhash_oracle_expr()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sims a JOIN sims b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="60-bit SimHash near-dup pairs, hamming<=3; Spark side uses 4×15-bit "
        "banding (recall-complete by pigeonhole ⇒ equals the oracle's "
        "all-pairs scan)",
)
def _q_dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        dedup.simhash_pairs(d, max_hamming=3)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


@_register(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
    doc="embedding-cosine near-dup pairs: exact all-pairs via blocked numpy "
        "GEMM (applyInPandas); the LSH-pruned scale path is "
        "similarity_ann_lsh",
)
def _q_dedup_embedding(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        dedup.embedding_dup_pairs_blocked(e, threshold=0.4)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


_SEMDEDUP_COS = ("list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v,"
                 " a.v)) * sqrt(list_dot_product(b.v, b.v)))")
_SEMDEDUP_CCOS = ("list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v,"
                  " e.v)) * sqrt(list_dot_product(c.cv, c.cv)))")


@_register(
    "dedup_semantic",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16
    ),
    ca AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid, row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SEMDEDUP_CCOS} DESC, c.cid) AS r
        FROM e CROSS JOIN cells c
      ) WHERE r = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM ca a JOIN ca b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_SEMDEDUP_COS} >= 0.4
    )
    SELECT vec_id AS id, CAST(cid AS INTEGER) AS cell,
           vec_id IN (SELECT vec_id FROM dups) AS is_dup
    FROM ca
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the "
        "embedding space (head-sample cells for the oracle; "
        "ivf_train_kmeans in production), mark any vector with a lower-id "
        "within-cell neighbor at cosine >= 0.4 as a duplicate — the "
        "within-cell self-join bounds the quadratic term at "
        "N²/num_cells, the accepted recall loss being cross-cell pairs",
)
def _q_dedup_semantic(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(e, threshold=0.4, num_cells=16, dim=64)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@_register(
    "similarity_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS match_id,
             list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM e p JOIN e c ON p.vec_id < 5 AND p.vec_id <> c.vec_id
    )
    SELECT probe_id, match_id, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, match_id) AS rank
      FROM scored
    )
    WHERE rank <= 10
    """,
    doc="brute-force exact cosine top-k (probe side broadcast; per-probe "
        "window top-k)",
)
def _q_similarity_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    return (
        similarity.topk_cosine(probes, e, k=10, dim=64)
        .select("probe_id", "match_id", F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"))
    )


@_register(
    "similarity_filtered_topk",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS match_id,
             list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
      WHERE c.label % 3 = 0
    )
    SELECT probe_id, match_id, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, match_id) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    doc="metadata-filtered vector search (the standard vector-DB feature: "
        "predicate + top-k in one query): exact cosine top-5 over only "
        "the corpus vectors whose label passes the filter. Spark-first "
        "design is pure COMPOSITION — the predicate is a DataFrame "
        "filter, so Catalyst pushes it into the parquet scan "
        "(PushedFilters on label; pre-filter strategy, exact recall at "
        "selectivity-proportional cost) before the broadcast-probe "
        "re-rank; contrast with post-filter ANN, which loses recall when "
        "the filter is selective. The same composition works in front of "
        "the IVF/LSH/PQ paths via their corpus argument (pass centroids "
        "explicitly so the quantizer stays corpus-wide).",
)
def _q_similarity_filtered_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("label") % 3 == 0)
    return (
        similarity.topk_cosine(probes, corpus, k=5, dim=64)
        .select("probe_id", "match_id", F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"))
    )


def _ann_oracle(num_tables: int = 8, planes_per_table: int = 4,
                dim: int = 64, k: int = 5, n_probes: int = 20) -> str:
    planes = similarity.hyperplanes(num_tables * planes_per_table, dim)

    def sig_terms(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, "
            f"{[float(x) for x in planes[t * planes_per_table + j]]}::DOUBLE[])"
            f" > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(planes_per_table)
        )

    sig_union = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {t} AS tbl, {sig_terms(t)} AS sig FROM e"
        for t in range(num_tables)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    sigs AS (
      {sig_union}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS match_id
      FROM sigs p JOIN sigs c ON p.tbl = c.tbl AND p.sig = c.sig
      WHERE p.vec_id < {n_probes} AND p.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT probe_id, match_id,
             list_dot_product(pe.v, ce.v)
               / (sqrt(list_dot_product(pe.v, pe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))) AS cos
      FROM cand
      JOIN e pe ON pe.vec_id = cand.probe_id
      JOIN e ce ON ce.vec_id = cand.match_id
    )
    SELECT probe_id, match_id, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, match_id) AS rank
      FROM scored
    )
    WHERE rank <= {k}
    """


def _ivf_oracle(k: int = 5, nprobe: int = 3, num_cells: int = 16,
                n_probes: int = 20) -> str:
    cos = ("list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v))"
           " * sqrt(list_dot_product(c.cv, c.cv)))")
    assign = f"""
      SELECT vec_id, v, cid, row_number() OVER (
               PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cid) AS r
      FROM e CROSS JOIN cells c
    """
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {num_cells}
    ),
    ca AS (SELECT vec_id, v, cid FROM ({assign}) WHERE r = 1),
    pa AS (SELECT vec_id, v, cid FROM ({assign}) WHERE r <= {nprobe}
           AND vec_id < {n_probes}),
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS match_id,
             list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM pa p JOIN ca c ON p.cid = c.cid AND p.vec_id <> c.vec_id
    )
    SELECT probe_id, match_id, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, match_id) AS rank
      FROM scored
    )
    WHERE rank <= {k}
    """


@_register(
    "similarity_ann_ivf",
    _ivf_oracle(),
    doc="approximate top-k via IVF cells: fixed-COUNT deterministic "
        "centroids (16 smallest-id vectors — driver-side metadata, "
        "O(N·C) scan-side assignment at any corpus size), corpus vector "
        "lives in its nearest cell, probe searches its 3 nearest cells "
        "(recall@10 floor tested), exact cosine re-rank within — the "
        "coarse-quantizer scale path next to the LSH one",
)
def _q_similarity_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20)
    return (
        similarity.ivf_topk_cosine(probes, e, k=5, nprobe=3, num_cells=16,
                                   dim=64)
        .select("probe_id", "match_id", F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"))
    )


@_register(
    "similarity_ann_lsh",
    _ann_oracle(),
    doc="approximate top-k via multi-table LSH: 8 tables × 4 md5-derived "
        "hyperplanes, candidate = any-table bucket collision, exact cosine "
        "re-rank of the deduplicated union (recall ~0.7 @ k=5 vs ~0.02 for "
        "one 8-plane table — see test_similarity recall floor); oracle "
        "mirrors the same algorithm with the same plane constants",
)
def _q_similarity_ann(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20)
    return (
        similarity.lsh_topk_cosine(probes, e, k=5, num_tables=8,
                                   planes_per_table=4, dim=64)
        .select("probe_id", "match_id", F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"))
    )


@_register(
    "corpus_cluster_balance",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8
    ),
    ca AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid, row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.cv)
                            / (sqrt(list_dot_product(e.v, e.v))
                               * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                          c.cid) AS r
        FROM e CROSS JOIN cells c
      ) WHERE r = 1
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell,
           CAST(pick_rank AS INTEGER) AS pick_rank
    FROM (
      SELECT vec_id, cid AS cell, row_number() OVER (
               PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick_rank
      FROM ca
    )
    WHERE pick_rank <= 32
    """,
    doc="cluster-balanced (diversity) sampling: assign every embedding to "
        "its nearest of 8 deterministic head-sample centroids (the shared "
        "O(N*C) broadcast-assignment scan), then keep up to 32 vectors per "
        "cell by a seeded-uniform md5-of-id rule — the embedding-space "
        "counterpart of corpus_mixture_sample's source balancing (a raw "
        "uniform sample mirrors the corpus's topic skew; per-cell quotas "
        "flatten it — the cluster-balancing step of SemDeDup/DSIR-style "
        "curation). Every step is deterministic (head centroids, exact "
        "cosine argmax with the (cos DESC, cid) tiebreak, md5 pick), so "
        "the oracle replays the full selection and the result hash-checks. "
        "GRADED ON THE SCALE FORM: the Spark side runs method='threshold' "
        "— salted two-level exact selection of each cell's quota-th-"
        "smallest (md5, id) key + broadcast threshold filter, so the "
        "corpus never funnels through num_cells window reducers — while "
        "the oracle replays the identical selection via its window "
        "formulation (same rows by the k-th-order-statistic/sort-prefix "
        "equivalence, pinned by "
        "tests/test_similarity.py::test_cluster_balanced_sample_threshold_"
        "matches_window); operators/similarity.py::cluster_balanced_sample",
)
def _q_corpus_cluster_balance(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        similarity.cluster_balanced_sample(e, quota=32, num_cells=8, dim=64,
                                           method="threshold")
        .select(F.col("id").alias("vec_id"),
                F.col("cell").cast("long").alias("cell"),
                F.col("pick_rank").cast("int").alias("pick_rank"))
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_SQL_STOPS = "['" + "','".join(texts.STOPWORDS) + "']"


@_register(
    "text_quality",
    f"""
    SELECT doc_id,
           CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '{texts.BPE_CHUNK_RE}'))
                AS BIGINT) AS bpe_tokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / len({SQL_TOKS}), 4) AS avg_token_len,
           round(len(list_filter({SQL_TOKS},
                     t -> list_contains({_SQL_STOPS}, t))) * 1.0
                 / len({SQL_TOKS}), 4) AS stopword_ratio,
           round((length(lower(text))
                  - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
                 * 1.0 / length(text), 4) AS punct_ratio,
           (len({SQL_TOKS}) BETWEEN 20 AND 1000)
             AND (len(list_filter({SQL_TOKS},
                      t -> list_contains({_SQL_STOPS}, t))) * 1.0
                  / len({SQL_TOKS})) BETWEEN 0.01 AND 0.6 AS keep
    FROM documents
    """,
    doc="per-doc quality scoring: token counts (whitespace + BPE-ish regex), "
        "avg token length, stopword/punctuation ratios, keep flag",
)
def _q_text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toked = dedup.tokenized(d, "doc_id", "text", extra_cols=("text",))
    text, toks = F.col("text"), F.col("__toks")
    pre = toked.select(
        F.col("id").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        texts.bpe_ish_count(text).alias("bpe_tokens"),
        texts.avg_token_len_of(toks, text).alias("_avg"),
        texts.stopword_ratio_of(toks).alias("_stop"),
        texts.punct_ratio(text).alias("_punct"),
    )
    return pre.select(
        "doc_id", "n_tokens", "bpe_tokens",
        F.round("_avg", 4).alias("avg_token_len"),
        F.round("_stop", 4).alias("stopword_ratio"),
        F.round("_punct", 4).alias("punct_ratio"),
        (F.col("n_tokens").between(20, 1000)
         & F.col("_stop").between(0.01, 0.6)).alias("keep"),
    )


@_register(
    "corpus_curation",
    f"""
    WITH fp AS (
      SELECT doc_id, source, lang, text, md5({SQL_NORM}) AS f FROM documents
    ),
    canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
    q AS (
      SELECT doc_id, source, lang,
             len({SQL_TOKS}) AS n_tokens,
             len(regexp_extract_all(lower(text), '{texts.BPE_CHUNK_RE}'))
                 AS bpe_tokens,
             len(list_filter({SQL_TOKS}, t -> list_contains({_SQL_STOPS}, t)))
                 * 1.0 / len({SQL_TOKS}) AS stop_r
      FROM fp
    )
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)   AS total_tokens,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe
    FROM q JOIN canon USING (doc_id)
    WHERE n_tokens BETWEEN 20 AND 1000 AND stop_r BETWEEN 0.01 AND 0.6
    GROUP BY source, lang
    """,
    doc="end-to-end corpus curation: exact-dedup to canonical docs, quality "
        "gate (length + stopword-ratio), then the token budget per "
        "(source, lang) — the composition a training-data pipeline runs "
        "before sharding. Two shuffles total: fingerprint groupBy and the "
        "final aggregation; the quality math rides the dedup exchange.",
)
def _q_corpus_curation(spark, sf_dir):
    # ONE gated hash-spread shared by both dedup_exact branches (r17):
    # the r16 shape paid an RR spread + tokenized's id-hash barrier —
    # two full-text exchanges whose second bought nothing (the final
    # groupBy keys on (source, lang), not id; CollapseProject keeps the
    # multi-referenced __toks alias materialized without a barrier).
    # It was also the c8>c32 inversion VERDICT flagged: 32-way task
    # fan-out on three exchanges of a 5000-doc corpus is pure
    # scheduling overhead. Same-session A/B at sf0.1: 1.45 -> 1.20 s
    # (0.83x), output frame-diff identical (100/100 rows); c8/c32
    # re-measured in OPTIMIZATION_r17.md.
    d = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    if dedup.scan_width(d) < n:
        d = d.repartition(n, "doc_id")
    kept = dedup.dedup_exact(d)
    text, toks = F.col("text"), F.col("__toks")
    toked = kept.select(texts.tokens(text).alias("__toks"),
                        "text", "source", "lang")
    pre = toked.select(
        "source", "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        texts.bpe_ish_count(text).alias("bpe_tokens"),
        texts.stopword_ratio_of(toks).alias("_stop"),
    )
    return (
        pre.filter(F.col("n_tokens").between(20, 1000)
                   & F.col("_stop").between(0.01, 0.6))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("bpe_tokens").cast("long").alias("total_bpe"),
        )
    )


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\d{3}-\\d{3}-\\d{4}"
_PII_IP = "\\d+\\.\\d+\\.\\d+\\.\\d+"

#: The synthesis rule (fixtures carry no PII, so each doc deterministically
#: embeds some, in column algebra shared — as a RULE, not code — with the
#: oracle). Replacement order matters only for overlap; these three
#: patterns are disjoint by construction.
_PII_SQL_AUG = (
    "text"
    " || (CASE WHEN doc_id % 3 = 0 THEN ' contact user'"
    " || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)"
    " || (CASE WHEN doc_id % 4 = 0 THEN ' call 555-123-4567' ELSE '' END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) ELSE '' END)"
)


@_register(
    "pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_SQL_AUG} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INTEGER)
               AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS INTEGER) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g')) AS scrub_md5
    FROM aug
    WHERE doc_id % 3 = 0 OR doc_id % 4 = 0 OR doc_id % 5 = 0
    """,
    doc="PII detection + redaction (email/phone/IPv4) — the scrub gate "
        "every training-data pipeline runs before tokenization. Counts via "
        "regexp_count, redaction as a chained regexp_replace, all "
        "scan-side codegen (zero shuffles before the driver's compare); "
        "the md5 of the scrubbed text proves byte-exact redaction across "
        "engines, not just matching counts. Fixtures carry no PII, so "
        "each doc embeds synthetic PII first via a deterministic column-"
        "algebra rule the oracle replays (it shares the rule, not the "
        "regex engine).",
)
def _q_pii_scrub(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com"))).otherwise(""),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" call 555-123-4567")).otherwise(""),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" from 10.0.0."),
                        (F.col("doc_id") % 256).cast("string"))).otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>"),
        _PII_IP, "<IP>")
    return (
        d.filter((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 4 == 0)
                 | (F.col("doc_id") % 5 == 0))
        .select("doc_id", aug.alias("t"))
        .select(
            "doc_id",
            F.regexp_count("t", F.lit(_PII_EMAIL)).cast("int")
             .alias("n_emails"),
            F.regexp_count("t", F.lit(_PII_PHONE)).cast("int")
             .alias("n_phones"),
            F.regexp_count("t", F.lit(_PII_IP)).cast("int").alias("n_ips"),
            F.md5(F.encode(scrubbed, "UTF-8")).alias("scrub_md5"),
        )
    )


@_register(
    "text_bigram_pmi",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    uni AS (SELECT unnest(toks) AS w FROM t),
    uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT sum(c) AS n FROM uc),
    bi AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ),
    bc AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    nb AS (SELECT sum(c) AS n FROM bc),
    scored AS (
      SELECT w1 || ' ' || w2 AS bigram,
             bc.c AS n_pair,
             round(ln((bc.c * 1.0 / nb.n)
                      / ((u1.c * 1.0 / nu.n) * (u2.c * 1.0 / nu.n))),
                   4) AS pmi
      FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2
      CROSS JOIN nu CROSS JOIN nb
      WHERE bc.c >= 5
    )
    SELECT bigram, CAST(n_pair AS BIGINT) AS n_pair, pmi
    FROM scored ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc="collocation mining: top-20 corpus bigrams by pointwise mutual "
        "information (min support 5) — the phrase-discovery signal "
        "tokenizer/vocab pipelines compute corpus-wide. Shape: one "
        "scan-side bigram fan-out (adjacent-token structs, linear in "
        "tokens), two hash aggs (bigram and unigram counts, partial "
        "map-side), two equi-joins of the bigram table against the "
        "unigram counts, and a global top-20 (TakeOrderedAndProject — "
        "never a full sort at scale). Both engines spell the PMI "
        "arithmetic identically (c*1.0/N divisions then ln), and "
        "round-before-rank makes the cutoff tie deterministic via the "
        "(pmi, bigram) order.",
)
def _q_text_bigram_pmi(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    t = d.select(texts.tokens(F.col("text")).alias("toks"))
    uc = (t.select(F.explode("toks").alias("w"))
          .groupBy("w").agg(F.count("*").alias("c")))
    nu = uc.agg(F.sum("c").alias("nu"))
    bi = (
        t.filter(F.size("toks") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2")))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    nb = bc.agg(F.sum("c").alias("nb"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bc.filter(F.col("c") >= 5)
        .join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c").cast("long").alias("n_pair"),
            F.round(F.log(
                (F.col("c") * F.lit(1.0) / F.col("nb"))
                / ((F.col("c1") * F.lit(1.0) / F.col("nu"))
                   * (F.col("c2") * F.lit(1.0) / F.col("nu")))), 4)
             .alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(20)


#: x*ln(x) with the 0*ln(0)=0 convention, spelled identically in both
#: engines so the LLR entropy terms agree to the bit.
_SQL_XLX = "CASE WHEN {x} > 0 THEN {x} * ln({x}) ELSE 0.0 END"


@_register(
    "text_collocation_llr",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    bi AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ),
    bc AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    r1 AS (SELECT w1, sum(c) AS r FROM bc GROUP BY w1),
    c2 AS (SELECT w2, sum(c) AS s FROM bc GROUP BY w2),
    nb AS (SELECT sum(c) AS n FROM bc),
    cells AS (
      SELECT bc.w1, bc.w2, bc.c,
             bc.c * 1.0 AS k11,
             (r1.r - bc.c) * 1.0 AS k12,
             (c2.s - bc.c) * 1.0 AS k21,
             (nb.n - r1.r - c2.s + bc.c) * 1.0 AS k22,
             nb.n * 1.0 AS n
      FROM bc JOIN r1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nb
      WHERE bc.c >= 5
    ),
    scored AS (
      SELECT w1 || ' ' || w2 AS bigram,
             CAST(c AS BIGINT) AS n_pair,
             round(2.0 * ({_SQL_XLX.format(x='k11')}
                        + {_SQL_XLX.format(x='k12')}
                        + {_SQL_XLX.format(x='k21')}
                        + {_SQL_XLX.format(x='k22')}
                        - {_SQL_XLX.format(x='(k11 + k12)')}
                        - {_SQL_XLX.format(x='(k21 + k22)')}
                        - {_SQL_XLX.format(x='(k11 + k21)')}
                        - {_SQL_XLX.format(x='(k12 + k22)')}
                        + {_SQL_XLX.format(x='n')}), 4) AS llr
      FROM cells
    )
    SELECT bigram, n_pair, llr
    FROM scored ORDER BY llr DESC, bigram LIMIT 20
    """,
    doc="top-20 collocations by Dunning's log-likelihood ratio (min "
        "support 5) — the statistically-sound sibling of "
        "text_bigram_pmi: PMI explodes for rare pairs (two hapaxes "
        "co-occurring once score maximally), while the G^2 likelihood "
        "ratio weighs evidence MASS, which is why production phrase "
        "miners (Mahout collocations, phrase-vocab builders) rank by "
        "LLR. The 2x2 contingency margins come from the bigram table "
        "itself (rows sum to N exactly); the entropy form 2*(sum "
        "xlx(cells) - xlx(row/col margins) + xlx(N)) is spelled "
        "term-for-term identically in both engines with the "
        "0*ln(0)=0 guard, and round-before-rank keeps the top-20 "
        "cutoff deterministic. Plan: the PMI pipeline's shape — "
        "scan-side bigram fan-out, hash aggs for counts and margins, "
        "vocab-keyed joins (broadcast when bounded), TakeOrdered "
        "top-20 — with one extra margin aggregate.",
)
def _q_text_collocation_llr(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    t = d.select(texts.tokens(F.col("text")).alias("toks"))
    bi = (
        t.filter(F.size("toks") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2")))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    # Materialize the bigram-count table once (r16): bc is read FOUR
    # times (row marginals, column marginals, grand total, scored) and
    # each reference re-planned the whole explode+count derivation.
    # Lazy localCheckpoint (upstream stages run at build time under AQE,
    # inside run_query's timed span — see _ckpt): 1.54 -> 0.93 s (0.60x)
    # same-session A/B at sf0.1, oracle parity re-proven at
    # sf0.001 + sf0.01.
    bc = _ckpt(bi.groupBy("w1", "w2").agg(F.count("*").alias("c")))
    r1 = bc.groupBy("w1").agg(F.sum("c").alias("r"))
    c2 = bc.groupBy("w2").agg(F.sum("c").alias("s"))
    nb = bc.agg(F.sum("c").alias("n"))

    def xlx(x):
        return F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0))

    k11 = F.col("c") * F.lit(1.0)
    k12 = (F.col("r") - F.col("c")) * F.lit(1.0)
    k21 = (F.col("s") - F.col("c")) * F.lit(1.0)
    k22 = (F.col("n") - F.col("r") - F.col("s") + F.col("c")) * F.lit(1.0)
    n = F.col("n") * F.lit(1.0)
    llr = F.lit(2.0) * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(k11 + k12) - xlx(k21 + k22)
        - xlx(k11 + k21) - xlx(k12 + k22) + xlx(n))
    scored = (
        bc.filter(F.col("c") >= 5)
        .join(r1, "w1").join(c2, "w2")
        .crossJoin(F.broadcast(nb))
        .select(F.concat_ws(" ", "w1", "w2").alias("bigram"),
                F.col("c").cast("long").alias("n_pair"),
                F.round(llr, 4).alias("llr"))
    )
    return scored.orderBy(F.col("llr").desc(), "bigram").limit(20)


def _pagerank_oracle(iters: int = 4, d: float = 0.85) -> str:
    """Unrolled power-method PageRank: one CTE pair (contributions, next
    ranks) per iteration, spelling the SAME float operations as the
    Spark side — (1.0 - 0.85)/n and 0.85*x as literal expressions — so
    the doubles agree to the bit before the final round(6)."""
    blocks = [
        "nodes AS (SELECT s_suppkey AS id FROM supplier)",
        "nn AS (SELECT count(*) AS n FROM supplier)",
        """edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    )""",
        "outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        blocks.append(
            f"""c{i} AS (
      SELECT e.dst, sum(r.r / o.deg) AS s
      FROM edges e JOIN outdeg o ON e.src = o.src
      JOIN r{i-1} r ON r.id = e.src
      GROUP BY e.dst
    )""")
        blocks.append(
            f"""r{i} AS (
      SELECT nodes.id,
             (1.0 - {d}) / nn.n + {d} * COALESCE(c{i}.s, 0.0) AS r
      FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = nodes.id
    )""")
    return ("WITH " + ",\n    ".join(blocks)
            + f"\n    SELECT id AS s_suppkey, round(r, 6) AS rank"
              f" FROM r{iters}")


@_register(
    "supplier_pagerank",
    _pagerank_oracle(),
    doc="link-graph authority scoring (the corpus-curation quality "
        "signal: rank hosts/sources by centrality before sampling, "
        "Common Crawl-style) as fixed-iteration power-method PageRank "
        "over the supplier co-purchase graph (suppliers sharing an "
        "order, distinct directed pairs — per-order fan-out is bounded "
        "by lines-per-order, never quadratic in the table). FOUR "
        "unrolled iterations of r' = (1-d)/N + d*sum(r/outdeg) as ONE "
        "lazy job — per-iteration shuffles aggregate on dst (a celebrity "
        "node is a reducer, not a join blowup), dangling mass absorbed "
        "so the recurrence is exactly mirrorable; the oracle unrolls the "
        "same iterations as chained CTEs with identical float spelling "
        "(operators/graph.py::pagerank).",
)
def _q_supplier_pagerank(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.operators import graph

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    # Edge derivation WITHOUT a fact-table self-join: collect each
    # order's distinct supplier set (collect_set dedups in-aggregate, so
    # ONE shuffle on l_orderkey with map-side partial sets — a separate
    # pre-distinct would shuffle the same rows twice on essentially the
    # same key; per-order sets are bounded by lines-per-order), fan out
    # the ordered pairs with TWO NATIVE explodes + a codegen'd predicate
    # (the nested transform/filter/struct lambda chain this replaces was
    # interpreted CodegenFallback — building ~6M structs per-element in
    # the interpreter cost ~40% of the derivation; Generate is
    # whole-stage codegen), then distinct. Same edges as the
    # lineitem⋈lineitem formulation the oracle replays, one less
    # full-table shuffle+join.
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.collect_set("l_suppkey").alias("ss")))
    # Adjacency-set derivation (r16): aggregate the directed pairs into
    # per-src neighbor SETS — collect_set dedups in-aggregate, so the
    # ONE src-keyed exchange replaces the r15 shape's pair-distinct
    # exchange AND the separate out-degree groupBy+join (deg comes free
    # as size(nbrs), shipped on the edge rows for pagerank to use).
    # Measured same-session at sf0.1: derivation+checkpoint 1.82 →
    # 1.45 s (0.80×), with the edge⋈deg frame row-for-row identical to
    # the r15 mirrored-half form (asserted offline on the full sf0.1
    # edge set, 907,176 rows).
    pairs = (per_order.select(F.explode("ss").alias("src"), "ss")
             .select("src", F.explode("ss").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    adj = pairs.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    edges = adj.select("src", F.explode("nbrs").alias("dst"),
                       F.size("nbrs").alias("deg"))
    nodes = sup.select(F.col("s_suppkey").alias("id"))
    pr = graph.pagerank(nodes, edges, iters=4, damping=0.85, deg_col="deg")
    return pr.select(F.col("id").alias("s_suppkey"),
                     F.round("rank", 6).alias("rank"))


_CARD_RE = "[0-9]{16}"
_LUHN = texts.luhn_valid_sql("cand", 16)


@_register(
    "pii_creditcard_luhn",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' card 411111111111111' ||
                       CAST(doc_id % 10 AS VARCHAR) || ' on file'
                  ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' order 1234567890 ref' ELSE '' END AS t
      FROM documents
      WHERE doc_id % 3 = 0 OR doc_id % 7 = 0
    ),
    cands AS (
      SELECT doc_id, t,
             len(regexp_extract_all(t, '{_CARD_RE}')) AS n_cards,
             regexp_extract(t, '{_CARD_RE}') AS cand
      FROM aug
    )
    SELECT doc_id,
           CAST(n_cards AS INTEGER) AS n_cards,
           CAST(CASE WHEN n_cards > 0 AND {_LUHN}
                     THEN 1 ELSE 0 END AS INTEGER) AS n_valid,
           md5(CASE WHEN n_cards > 0 AND {_LUHN}
                    THEN replace(t, cand, '<CARD>') ELSE t END) AS scrub_md5
    FROM cands
    """,
    doc="Luhn-validated credit-card PII redaction: detect 16-digit runs, "
        "validate the Luhn checksum with pure fold algebra (the SAME "
        "unrolled SQL string runs on both engines — "
        "functions/texts.py::luhn_valid_sql), and redact only VALID PANs "
        "— plain all-digit-run redaction mangles order ids and hashes, "
        "the classic PII-scrub false positive. Fixtures carry no cards, "
        "so docs embed a synthetic 15-digit prefix + (doc_id%10) check "
        "digit — valid for exactly one residue, so the validator must "
        "actually discriminate per row — and a 10-digit decoy run that "
        "must NOT match. All scan-side codegen, zero shuffles; the md5 "
        "of the scrubbed text proves byte-exact redaction.",
)
def _q_pii_creditcard_luhn(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" card 411111111111111"),
                        (F.col("doc_id") % 10).cast("string"),
                        F.lit(" on file"))).otherwise(""),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" order 1234567890 ref")).otherwise(""),
    )
    return (
        d.filter((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 7 == 0))
        .select("doc_id", aug.alias("t"))
        .select(
            "doc_id", "t",
            F.size(F.regexp_extract_all("t", F.lit(_CARD_RE), F.lit(0)))
             .alias("n_cards"),
            F.regexp_extract("t", _CARD_RE, 0).alias("cand"),
        )
        .select(
            "doc_id",
            F.col("n_cards").cast("int").alias("n_cards"),
            F.when((F.col("n_cards") > 0) & F.expr(_LUHN), 1).otherwise(0)
             .cast("int").alias("n_valid"),
            F.md5(F.encode(
                F.when((F.col("n_cards") > 0) & F.expr(_LUHN),
                       F.replace("t", "cand", F.lit("<CARD>")))
                 .otherwise(F.col("t")), "UTF-8")).alias("scrub_md5"),
        )
    )


@_register(
    "corpus_importance_sample",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             LEAST(len({SQL_TOKS}), 256) AS wt
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, source, wt,
             CASE WHEN CAST('0x' || substr(md5('imp:' ||
                                            CAST(doc_id AS VARCHAR)), 1, 6)
                       AS BIGINT) * 256 < 16777216 * wt
                  THEN 1 ELSE 0 END AS kept
      FROM w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN kept = 1 THEN wt ELSE 0 END) AS BIGINT)
               AS kept_weight,
           CAST(min(CASE WHEN kept = 1 THEN doc_id END) AS BIGINT)
               AS min_kept_id
    FROM flagged GROUP BY source
    """,
    doc="importance (weighted) sampling: each doc keeps with probability "
        "proportional to a per-doc weight — here min(tokens, 256)/256, "
        "the stand-in for any quality/likelihood-ratio score (the "
        "DSIR-style primitive next to the family's uniform-quota forms: "
        "stratified = per-class, mixture = per-source, cluster-balance = "
        "per-embedding-cell, importance = per-DOC score). The keep rule "
        "is integer-exact and deterministic — md5 6-hex bucket * 256 < "
        "16^6 * weight, no float thresholds, so both engines replay the "
        "identical selection; scan-side algebra + one per-source agg.",
)
def _q_corpus_importance_sample(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    wt = F.least(texts.n_tokens(F.col("text")), F.lit(256)).cast("long")
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("imp:"), F.col("doc_id").cast("string"))),
        1, 6), 16, 10).cast("long")
    kept = (bucket * 256 < F.lit(16777216) * F.col("wt")).cast("int")
    return (
        d.select("doc_id", "source", wt.alias("wt"))
        .withColumn("kept", kept)
        .groupBy("source")
        .agg(F.count("*").alias("n_total"),
             F.sum("kept").cast("long").alias("n_kept"),
             F.sum(F.when(F.col("kept") == 1, F.col("wt")).otherwise(0))
              .cast("long").alias("kept_weight"),
             F.min(F.when(F.col("kept") == 1, F.col("doc_id")))
              .cast("long").alias("min_kept_id"))
    )


@_register(
    "corpus_temperature_mixture",
    """
    WITH counts AS (SELECT source, count(*) AS n
                    FROM documents GROUP BY source),
    tot AS (SELECT sum(pow(n, 0.3)) AS z, sum(n) AS big_n FROM counts),
    quota AS (
      SELECT source,
             round(3 * big_n * pow(n, 0.3) / z / n, 6) AS q
      FROM counts CROSS JOIN tot
    ),
    perdoc AS (
      SELECT d.doc_id, d.source,
             CAST(floor(q.q) AS BIGINT)
               + CASE WHEN CAST('0x' || substr(md5('tmix:' ||
                            CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                          % 1000000
                        < CAST(round((q.q - floor(q.q)) * 1000000, 0)
                               AS BIGINT)
                      THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN quota q USING (source)
    )
    SELECT doc_id, source,
           CAST(n_copies AS INTEGER) AS n_copies,
           CAST(u.i AS INTEGER) AS copy_idx
    FROM perdoc, unnest(generate_series(0, n_copies - 1)) AS u(i)
    WHERE n_copies > 0
    """,
    doc="temperature-scaled mixture with deterministic replication (the "
        "XLM-R / multilingual-LM upsampling rule): source share p_s "
        "∝ n_s^alpha with alpha=0.3 flattens the natural distribution "
        "so low-resource sources train more than their raw share; the "
        "epoch budget (3x corpus size) times p_s yields a per-DOC copy "
        "quota whose integer part replicates every doc and whose "
        "fractional part keeps one extra copy per doc via the seeded-md5 "
        "1e-6 grid rule — no RNG, identical replay on both engines, and "
        "float-boundary-safe because the quota is rounded to the grid "
        "BEFORE the compare. This completes the sampling family's "
        "UP-sampling side (stratified/mixture/domain-cap/importance all "
        "only down-sample). Scale shape: source stats are a tiny "
        "aggregate broadcast back onto the scan; replication is a "
        "scan-side explode of a bounded sequence (fan-out = per-source "
        "quota, by construction ~epoch budget / corpus), so the only "
        "shuffle in the whole plan is the partial+final source count.",
)
def _q_corpus_temperature_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum(F.pow("n", F.lit(0.3))).alias("z"),
                     F.sum("n").alias("big_n"))
    quota = (
        counts.crossJoin(F.broadcast(tot))
        .select("source",
                F.round(F.lit(3) * F.col("big_n") * F.pow("n", F.lit(0.3))
                        / F.col("z") / F.col("n"), 6).alias("q"))
    )
    bucket = hashing.hex_int(
        F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))) % 1000000
    frac_grid = F.round((F.col("q") - F.floor("q")) * 1000000, 0).cast("long")
    n_copies = (F.floor("q").cast("long")
                + F.when(bucket < frac_grid, 1).otherwise(0))
    return (
        d.join(F.broadcast(quota), "source")
        .select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select("doc_id", "source",
                F.col("n_copies").cast("int").alias("n_copies"),
                F.explode(F.sequence(
                    F.lit(0), (F.col("n_copies") - 1).cast("int")))
                 .alias("copy_idx"))
        .withColumn("copy_idx", F.col("copy_idx").cast("int"))
    )


@_register(
    "corpus_shard_export",
    """
    WITH k AS (
      SELECT doc_id,
             md5('shard:' || CAST(doc_id AS VARCHAR)) AS key,
             CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                 1, 15) AS BIGINT) % 16 AS shard
      FROM documents
    )
    SELECT doc_id,
           CAST(shard AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY key, doc_id) AS INTEGER) AS pos
    FROM k
    """,
    doc="deterministic training-shard export plan: every doc gets a "
        "seeded-md5 key; the shard is the key's value mod n_shards and "
        "pos is the doc's rank within its shard under the key order — "
        "i.e. a reproducible GLOBAL pseudo-random shuffle of the corpus "
        "into equal shards, the step that feeds sequence packing and "
        "training readers (a corpus read in storage order is ordered by "
        "crawl/source and trains badly; seeded md5 gives a shuffle that "
        "re-runs byte-identically for resumable jobs). Scale shape: the "
        "md5 keying is scan-side; the per-shard row_number window is NOT "
        "a reducer funnel because n_shards grows with the corpus so one "
        "shard == one output file's worth of rows (~hundreds of MB) — "
        "the per-shard sort IS the ordered shard write, inherent to "
        "emitting shuffled shards, and uniform md5 keys balance shard "
        "sizes to within sampling noise.",
)
def _q_corpus_shard_export(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    seed = F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))
    k = d.select(
        "doc_id",
        F.md5(seed).alias("key"),
        (hashing.hex_int(seed) % 16).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return k.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("int").alias("pos"))


@_register(
    "corpus_mixture_sample",
    """
    WITH tot AS (SELECT source, count(*) AS n_total
                 FROM documents GROUP BY source),
    s AS (SELECT count(*) AS n_src FROM tot),
    kept AS (
      SELECT d.source, d.doc_id
      FROM documents d JOIN tot USING (source) CROSS JOIN s
      WHERE (CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                  1, 15) AS BIGINT) % 1000000)
            * s.n_src * tot.n_total < 1000000 * 200
    )
    SELECT t.source, t.n_total,
           count(k.doc_id)              AS n_kept,
           CAST(min(k.doc_id) AS BIGINT) AS min_kept_id
    FROM tot t LEFT JOIN kept k ON t.source = k.source
    GROUP BY t.source, t.n_total
    """,
    doc="source-balanced mixture sampling (the data-mixing step of LLM "
        "pre-training): each source gets an equal share of a 200-doc "
        "budget, i.e. per-source keep rate min(1, (T/S)/n_s). The keep "
        "decision is a deterministic md5 bucket compared in PURE INTEGER "
        "arithmetic (bucket·S·n_s < 1e6·T) — no float thresholds, so the "
        "sample is bit-portable across engines and re-runs (general-alpha "
        "temperature mixing would put sqrt/pow on the threshold; the "
        "integer form trades that generality for exactness). Plan: one "
        "tiny per-source agg broadcast back over the scan, filter rides "
        "the scan, one final agg.",
)
def _q_corpus_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    tot = d.groupBy("source").agg(F.count("*").alias("n_total"))
    nsrc = tot.select(F.count("*").alias("n_src"))
    bucket6 = hashing.hex_int(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000000
    kept = (
        d.join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(nsrc))
        .filter(bucket6 * F.col("n_src") * F.col("n_total")
                < F.lit(1000000) * F.lit(200))
        .select("source", "doc_id")
    )
    return (
        tot.join(kept.groupBy("source")
                     .agg(F.count("*").alias("__k"),
                          F.min("doc_id").cast("long").alias("min_kept_id")),
                 "source", "left")
        .select("source", "n_total",
                F.coalesce(F.col("__k"), F.lit(0)).alias("n_kept"),
                "min_kept_id")
    )


@_register(
    "stratified_sample",
    """
    WITH b AS (
      SELECT doc_id, source, lang,
             CAST('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT source, lang, count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_id
    FROM b
    WHERE bucket < (CASE lang WHEN 'en' THEN 50
                              WHEN 'fr' THEN 20
                              ELSE 10 END)
    GROUP BY source, lang
    """,
    doc="deterministic stratified sampling for class rebalancing: per-row "
        "keep decision = md5 bucket of the id vs a per-stratum rate — no "
        "RNG state, so the sample is reproducible across runs/retries and "
        "engine-portable (unlike sample()/TABLESAMPLE, which are "
        "seed+partition dependent). Pure scan-side filter: no shuffle "
        "until the audit aggregation.",
)
def _q_stratified_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bucket = hashing.hex_int(
        F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))) % 100
    rate = (F.when(F.col("lang") == "en", 50)
             .when(F.col("lang") == "fr", 20)
             .otherwise(10))
    return (
        d.filter(bucket < rate)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_sampled"),
             F.min("doc_id").cast("long").alias("min_id"))
    )


def _langid_oracle() -> str:
    score = {
        lang: (f"len(list_filter({SQL_WTOKS}, t -> list_contains("
               f"['" + "','".join(words) + "'], t)))")
        for lang, words in texts.LANG_PROFILES
    }
    langs = [lang for lang, _ in texts.LANG_PROFILES]
    cases = []
    for i, lang in enumerate(langs):
        later = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cond = " AND ".join([*later, f"s_{lang} > 0"])
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "\n             ".join(cases)
    score_cols = ",\n             ".join(
        f"{expr} AS s_{lang}" for lang, expr in score.items())
    return f"""
    WITH scores AS (
      SELECT lang,
             {score_cols}
      FROM documents
    )
    SELECT lang,
           CASE {case_sql}
                ELSE 'und' END AS pred,
           count(*) AS n
    FROM scores
    GROUP BY 1, 2
    """


@_register(
    "text_langid",
    _langid_oracle(),
    doc="heuristic language ID (function-word profiles, earlier profile "
        "wins ties) → confusion counts vs the fixture lang column",
)
def _q_text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    wt = _spread(
        d.select("lang", texts.tokenize_words(F.col("text")).alias("__wt")))
    scored = wt.select(
        "lang",
        *[s.alias(f"s_{lang}")
          for lang, s in texts.lang_scores_of(F.col("__wt"))],
    )
    pred = texts.argmax_label(
        [(lang, F.col(f"s_{lang}")) for lang, _ in texts.LANG_PROFILES])
    return (
        scored.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "text_token_topk",
    f"""
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest({SQL_TOKS}) AS t FROM documents)
    GROUP BY t
    ORDER BY n DESC, t
    LIMIT 20
    """,
    doc="corpus term frequencies: explode tokens → hash agg → global top-k",
)
def _q_text_token_topk(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(texts.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@_register(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5({SQL_NORM}) AS fingerprint,
           CAST(length({SQL_NORM}) AS BIGINT) AS norm_len
    FROM documents
    """,
    doc="per-doc deterministic fingerprint of normalized text",
)
def _q_text_fingerprint(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    norm = texts.normalize(F.col("text"))
    return d.select(
        "doc_id",
        texts.fingerprint(F.col("text")).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@_register(
    "text_winnow_fingerprint",
    f"""
    WITH c AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array({SQL_NORM}, ''),
                            x -> CAST(ascii(x) AS BIGINT)) AS codes
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(codes) - 8 + 1),
               i -> list_reduce(
                      list_prepend(CAST(0 AS BIGINT), codes[i:i+7]),
                      (acc, x) -> (acc * 257 + x) % 2147483647)) AS gh
      FROM c WHERE len(codes) >= 11
    ),
    m AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               generate_series(1, len(gh) - 4 + 1),
               j -> list_min(gh[j:j+3])))) AS fps
      FROM g
    )
    SELECT doc_id,
           CAST(len(fps) AS INTEGER) AS n_fp,
           fps[1] AS fp_min, fps[-1] AS fp_max,
           md5(array_to_string(fps, ',')) AS fp_md5
    FROM m
    """,
    doc="winnowing fingerprints (Schleimer et al. / MOSS — the "
        "rolling-hash rung of document fingerprinting): every 8-char "
        "gram of the normalized text hashed with an exact polynomial "
        "family (base 257 mod 2^31-1, int64-exact on both engines), "
        "then the minimum of each 4-hash window; the distinct minima "
        "are the fingerprint set — any shared substring >= 11 chars "
        "guarantees a common fingerprint at ~2/(w+1) the density of "
        "full shingling. All scan-side array algebra; the fp-set md5 "
        "proves the SETS are byte-identical cross-engine, not just "
        "their summary stats (functions/texts.py::winnow_fingerprints).",
)
def _q_text_winnow_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = texts.normalize(F.col("text"))
    return (
        dedup.winnow_fingerprint_table(
            d.filter(F.length(norm) >= 11), k=8, w=4)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.size("fps").cast("int").alias("n_fp"),
            F.element_at("fps", 1).alias("fp_min"),
            F.element_at("fps", -1).alias("fp_max"),
            F.md5(F.encode(F.concat_ws(",", F.transform(
                "fps", lambda x: x.cast("string"))), "UTF-8"))
             .alias("fp_md5"),
        )
    )


@_register(
    "dedup_winnow_pairs",
    f"""
    WITH c AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array({SQL_NORM}, ''),
                            x -> CAST(ascii(x) AS BIGINT)) AS codes
      FROM documents
    ),
    g AS (
      SELECT doc_id, list_transform(generate_series(1, len(codes) - 8 + 1),
               i -> list_reduce(
                      list_prepend(CAST(0 AS BIGINT), codes[i:i+7]),
                      (acc, x) -> (acc * 257 + x) % 2147483647)) AS gh
      FROM c WHERE len(codes) >= 11
    ),
    m AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, len(gh) - 4 + 1),
               j -> list_min(gh[j:j+3]))) AS fps
      FROM g
    ),
    ex0 AS (SELECT doc_id, unnest(fps) AS fp FROM m),
    keep AS (SELECT fp FROM ex0 GROUP BY fp HAVING count(*) <= 200),
    ex AS (SELECT doc_id, fp FROM ex0 JOIN keep USING (fp)),
    nf AS (SELECT doc_id, count(*) AS nf FROM ex GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(n_shared AS INTEGER) AS n_shared,
           round(n_shared * 1.0 / LEAST(na.nf, nb.nf), 4) AS overlap
    FROM p JOIN nf na ON p.id_a = na.doc_id
           JOIN nf nb ON p.id_b = nb.doc_id
    WHERE n_shared >= 3
      AND n_shared * 1.0 / LEAST(na.nf, nb.nf) >= 0.5
    """,
    doc="MOSS-style near-dup/plagiarism pairs over the NOISE-CAPPED "
        "winnowed index: fingerprints appearing in > 200 documents are "
        "boilerplate (MOSS's noise threshold) and are excluded from "
        "both the shared count and each doc's denominator; a pair "
        "matches when the shared RARE fingerprints number >= 3 and "
        "cover >= 50% of the smaller doc's rare set. The cap is the "
        "scale guard the r6 uncapped form lacked: measured at sf0.1 "
        "ONE boilerplate fingerprint sat in 3813 of 5000 docs and the "
        "raw self-join emitted 191M candidate rows (sum of df^2); the "
        "cap bounds any key's fan-out at cap^2 and cuts the join to "
        "6.2M rows (31x) while the n_shared >= 3 floor keeps "
        "tiny-denominator docs from matching on one lucky rare gram. "
        "Unlike the Jaccard ops' recall-preserving stop-shingle cap, "
        "this cap is part of the MEASURE (the oracle replays it "
        "exactly): overlap is DEFINED over rare fingerprints, which is "
        "what makes the measure robust to boilerplate in the first "
        "place. At 100 TB the absolute 200 becomes a corpus-relative "
        "df quantile; the df aggregation shuffles on the same fp key "
        "as the candidate join, so the exchange is reused, not added.",
)
def _q_dedup_winnow_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = texts.normalize(F.col("text"))
    # materialize: the fp equi-join's pushed isnotnull predicate would
    # otherwise re-inline the winnow expressions into the scan stage
    # (see winnow_fingerprint_table docstring)
    wft = dedup.winnow_fingerprint_table(
        d.filter(F.length(norm) >= 11), k=8, w=4, materialize=True)
    ex0 = wft.select("id", F.explode("fps").alias("fp"))
    # Measured-NEGATIVE (r17, on the earlier self-join shape):
    # checkpointing the capped posting list / nf aggregate made the
    # query SLOWER (ex+nf ckpt 4.33 s vs 2.64 s plain, nf-only 3.40 vs
    # 2.12 s) — the printed duplication was collapsed at RUNTIME by AQE
    # shuffle-stage reuse, so checkpoints only added build-time jobs.
    # The tfidf checkpoints survive their own A/B (re-proven r17) —
    # the difference is tfidf's diamond duplicates SCAN+explode work
    # below its FIRST exchange, which stage reuse cannot share.
    # Measured-NEGATIVE (r17): the corpus_source_overlap adjacency-set
    # form (fp-keyed collect_set + double-explode i<j fan-out, cap on
    # set size) measured 2.96 -> 3.33 s at sf0.1, interleaved
    # median-of-5, output-identical — collect_set is an
    # ObjectHashAggregate over up-to-200-element sets and the explode
    # fan emits 2x the pair rows pre-filter, while the self-join it
    # replaced is whole-stage-codegen'd and its posting exchange is
    # already AQE-reused across both sides. The trick wins on
    # source_overlap (sets bounded by #sources, ~5) and loses here
    # (sets up to the 200 cap).
    keep = (ex0.groupBy("fp").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= 200).select("fp"))
    ex = ex0.join(keep, "fp")
    nf = ex.groupBy("id").agg(F.count("*").alias("nf"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    scored = (
        pairs
        .join(nf.select(F.col("id").alias("id_a"),
                        F.col("nf").alias("nf_a")), "id_a")
        .join(nf.select(F.col("id").alias("id_b"),
                        F.col("nf").alias("nf_b")), "id_b")
    )
    overlap = F.col("n_shared") / F.least("nf_a", "nf_b")
    return (
        scored.filter(overlap >= 0.5)
        .select("id_a", "id_b",
                F.col("n_shared").cast("int").alias("n_shared"),
                F.round(overlap, 4).alias("overlap"))
    )


@_register(
    "doc_chunks",
    """
    SELECT doc_id,
           CAST(s AS INTEGER) AS chunk_start,
           substr(text, CAST(s AS INTEGER) + 1, 512) AS chunk,
           CAST(length(substr(text, CAST(s AS INTEGER) + 1, 512)) AS BIGINT)
             AS chunk_len
    FROM documents,
         unnest(generate_series(0, length(text) - 1, 384)) AS t(s)
    WHERE length(text) > 0
    """,
    doc="context-window chunking for training corpora: overlapping "
        "512-char windows every 384 chars (128 overlap), native "
        "sequence→transform→substr→explode so the fan-out stays in "
        "whole-stage codegen in the scan stage — no Python, no shuffle. "
        "functions/udtfs.py carries the UDTF twin for imperative chunkers",
)
def _q_doc_chunks(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(texts.chunk_spans(F.col("text"), 512, 384)).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.chunk").alias("chunk"),
            F.length("c.chunk").cast("long").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

@_register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           upper(hex(encode(substr(text, 1, 4)))) AS head_hex,
           CASE WHEN starts_with(upper(hex(encode(substr(text, 1, 4)))), '89504E47')
                THEN 'PNG'
                WHEN starts_with(upper(hex(encode(substr(text, 1, 4)))), 'FFD8FF')
                THEN 'JPEG'
                WHEN starts_with(upper(hex(encode(substr(text, 1, 4)))), '52494646')
                THEN 'RIFF'
                ELSE 'UNKNOWN' END AS modality
    FROM documents
    """,
    doc="binary-payload metadata (byte length + magic-byte sniff) as pure "
        "column algebra — no decoder needed, so no Python workers; the "
        "mapInPandas decode template lives in operators/multimodal.py. "
        "Fixture payload = utf-8 encoded text, so the oracle mirrors with "
        "encode(); ascii corpus ⇒ char slice == byte slice",
)
def _q_multimodal_meta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    payload = multimodal.with_binary_payload(d)
    meta = multimodal.extract_binary_meta_native(payload)
    return multimodal.sniff_modality(meta).select(
        "doc_id", "byte_len", "head_hex", "modality")


@_register(
    "multimodal_frames",
    """
    WITH p AS (
        SELECT doc_id,
               upper(hex(encode(text)))                        AS h,
               greatest(octet_length(encode(text)) - 16, 0)    AS n
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           CAST(unnest(range(4)) AS INTEGER) AS frame_idx,
           substring(h, ((n * unnest(range(4))) // 3) * 2 + 1, 32) AS frame_hex
    FROM p
    """,
    doc="frame sampling over binary payloads: mapInPandas fan-out (1 row → "
        "4 fixed-size byte slices at even offsets). The slicer is the "
        "deterministic stand-in for a keyframe decoder; the oracle replays "
        "the same slicing in the hex domain (DuckDB has no blob substring), "
        "proving the Python batch body's offset math exactly. Payload bytes "
        "never shuffle — the fan-out runs in the scan stage.",
)
def _q_multimodal_frames(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    payload = multimodal.with_binary_payload(d)
    frames = multimodal.sample_frames(payload, n_frames=4, frame_bytes=16)
    return frames.select(
        "doc_id", "frame_idx",
        F.upper(F.hex("frame")).alias("frame_hex"),
    )


@_register(
    "multimodal_decode",
    """
    SELECT doc_id,
           CAST(length(text) % 13 + 4 AS INTEGER) AS width,
           CAST(doc_id % 7 + 2 AS INTEGER)        AS height,
           'RGB'                                  AS mode
    FROM documents WHERE doc_id % 10 = 0
    """,
    doc="real image decode over binary payloads: each doc synthesizes a "
        "valid binary-PPM payload (header + w*h*3 raw bytes, dims derived "
        "from text length / doc id in column algebra), and "
        "operators/multimodal.py::decode_image parses the actual bytes in "
        "an Arrow batch body (numpy header/struct parsing — the same "
        "parser handles uncompressed 24-bit BMP). The oracle recomputes "
        "the dims from the synthesis rule only — it shares no parsing "
        "code, so a green row proves the byte-level round-trip. Decode "
        "runs in the scan stage; payload bytes never shuffle.",
)
def _q_multimodal_decode(spark, sf_dir):
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 10 == 0)
         .select("doc_id", F.length("text").alias("tl")))
    w = (F.col("tl") % 13 + 4).cast("int")
    h = (F.col("doc_id") % 7 + 2).cast("int")
    payload = F.encode(
        F.concat(F.lit("P6 "), w.cast("string"), F.lit(" "),
                 h.cast("string"), F.lit(" 255\n"),
                 F.repeat(F.lit("x"), w * h * 3)),
        "UTF-8")
    img = d.select("doc_id", payload.alias("content"))
    return multimodal.decode_image(img)


@_register(
    "text_unigram_logprob",
    f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_WTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    vocab AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
    tot AS (SELECT sum(c) AS total, count(*) AS v FROM vocab)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * ln((c + 1.0) / (total + v))) / sum(tf), 4)
               AS avg_logprob
    FROM tf JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="unigram-LM quality proxy (the CCNet-style perplexity filter, with "
        "the corpus itself as the LM): add-one-smoothed unigram "
        "log-probability averaged per token; low scores flag "
        "gibberish/rare-token documents for the curation gate. Plan: one "
        "explode→(doc,term) hash-agg, a term-keyed agg for the vocab, a "
        "two-scalar broadcast (total tokens + vocab size), one term-keyed "
        "join back, one doc-keyed agg — no per-token state leaves the "
        "scan stage, and in production the LM side is just a different "
        "(static, broadcastable) vocab table",
)
def _q_text_unigram_logprob(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(texts.tokenize_words(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = vocab.agg(F.sum("c").alias("total"), F.count("*").alias("v"))
    return (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf")
                      * F.log((F.col("c") + F.lit(1.0))
                              / (F.col("total") + F.col("v"))))
                / F.sum("tf"), 4).alias("avg_logprob"),
        )
    )


@_register(
    "text_tfidf_topterms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_WTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    WHERE rank <= 3
    """,
    doc="TF-IDF top-3 terms per document: one explode→hash-agg for tf, a "
        "second agg over (already doc-distinct) tf rows for df, corpus size "
        "as a broadcast scalar — idf never materializes a per-doc-pair "
        "anything, so the whole plan is two partial+final aggs, one "
        "term-keyed join, and one doc-keyed window. Ordering uses the "
        "ROUNDED score so ulp-level ln() drift between engines cannot flip "
        "ranks; ties break on the term itself",
)
def _q_text_tfidf(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(texts.tokenize_words(F.col("text"))).alias("term"))
    # tf feeds BOTH df and the scored join (r17): materialized once so
    # the tokenize+explode+aggregate subtree plans once, not per
    # consumer (the tfidf_cosine_pairs posting-list rule); ndocs counts
    # the RAW table — repartitioning text just to count rows was a
    # gratuitous exchange.
    tf = _ckpt(toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = _t(spark, sf_dir, "documents").select(
        F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf",
                F.col("rank").cast("int").alias("rank"))
    )


@_register(
    "doc_packing",
    f"""
    WITH t AS (
      SELECT doc_id, source, len({SQL_TOKS}) AS n_tokens FROM documents
    ),
    runs AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id
      FROM runs
    )
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed GROUP BY source, pack_id
    """,
    doc="sequence packing for pre-training batches: greedy in-order "
        "assignment of docs to fixed token-budget packs (budget 2048) — a "
        "doc starts a new pack when the running total crosses the budget "
        "(start-offset rule: pack = floor(tokens-before-doc / budget), so "
        "assignment is exact integer math, deterministic, and identical "
        "in both engines). One window + one agg, both reusing a single "
        "hash shuffle on `source`; at 100 TB the pack key is "
        "(shard, source) so every partition packs independently — the "
        "same recipe production tokenizers use for sharded corpora",
)
def _q_doc_packing(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    t = d.select("doc_id", "source",
                 F.size(texts.tokens(F.col("text"))).alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = t.select(
        "source", "doc_id", "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
        .cast("long").alias("pack_id"),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("pack_tokens"),
             F.min("doc_id").cast("long").alias("first_doc"),
             F.max("doc_id").cast("long").alias("last_doc"))
    )


@_register(
    "text_repetition",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t, len({SQL_TOKS}) AS n FROM documents
    ),
    grams AS (
      SELECT doc_id, n,
             greatest(n - 2, 0) AS total3,
             CASE WHEN n >= 3 THEN len(list_distinct(list_transform(
                    generate_series(1, n - 2),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))))
                  ELSE 0 END AS distinct3
      FROM toks
    ),
    uni AS (
      SELECT doc_id, max(c) AS top_uni FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    )
    SELECT g.doc_id,
           round(CASE WHEN total3 > 0
                      THEN 1.0 - distinct3 * 1.0 / total3 ELSE 0 END, 4)
               AS dup_3gram_ratio,
           round(top_uni * 1.0 / n, 4) AS top_unigram_frac,
           (CASE WHEN total3 > 0
                 THEN 1.0 - distinct3 * 1.0 / total3 ELSE 0 END) <= 0.3
             AND top_uni * 1.0 / n <= 0.2 AS keep
    FROM grams g JOIN uni USING (doc_id)
    WHERE n > 0
    """,
    doc="repetition quality signals (the Gopher-rules family): duplicate "
        "3-gram ratio (1 - distinct/total, WITH multiplicity) and top "
        "unigram fraction, plus the keep gate. The n-gram side is pure "
        "scan-side array algebra over the materialized token array; the "
        "unigram mode is one explode + two hash aggs on the doc id — no "
        "pairwise anything, shuffle rows ≈ distinct (doc, token)",
)
def _q_text_repetition(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toked = dedup.tokenized(d, "doc_id", "text")
    t, n = F.col("__toks"), F.size(F.col("__toks"))
    idx = F.sequence(F.lit(1), n - 2)
    grams3 = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(t, i, 3)))
    base = toked.select(
        F.col("id").alias("doc_id"), t.alias("t"), n.alias("n"),
        F.greatest(n - 2, F.lit(0)).alias("total3"),
        F.when(n >= 3, F.size(F.array_distinct(grams3)))
         .otherwise(F.lit(0)).alias("distinct3"),
    ).filter(F.col("n") > 0)
    uni = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("top_uni"))
    )
    dup = F.when(F.col("total3") > 0,
                 1.0 - F.col("distinct3") / F.col("total3")).otherwise(0.0)
    frac = F.col("top_uni") / F.col("n")
    return (
        base.join(uni, "doc_id")
        .select(
            "doc_id",
            F.round(dup, 4).alias("dup_3gram_ratio"),
            F.round(frac, 4).alias("top_unigram_frac"),
            ((dup <= 0.3) & (frac <= 0.2)).alias("keep"),
        )
    )


@_register(
    "corpus_decontamination",
    f"""
    WITH sh AS (
      SELECT doc_id, source, {SQL_SHINGLES} AS s FROM documents
    ),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0
    ),
    train AS (
      SELECT doc_id, source, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0
    ),
    hits AS (
      SELECT doc_id, source, count(*) AS n_hits
      FROM train JOIN bench USING (g)
      GROUP BY doc_id, source
    )
    SELECT t.source,
           count(DISTINCT t.doc_id) AS n_train_docs,
           count(DISTINCT h.doc_id) AS n_contaminated,
           CAST(coalesce(sum(one_hits), 0) AS BIGINT) AS total_hits
    FROM (SELECT DISTINCT doc_id, source FROM train) t
    LEFT JOIN (SELECT doc_id, n_hits AS one_hits FROM hits) h USING (doc_id)
    GROUP BY t.source
    """,
    doc="benchmark decontamination: flag training docs sharing any word "
        "3-gram with a held-out benchmark set (stand-in: doc_id % 50 = 0), "
        "the overlap check every pre-training pipeline runs before "
        "shipping data. Plan: one shingle pass feeds both sides "
        "(ReuseExchange), the benchmark n-gram set is DISTINCT + "
        "broadcastable (eval suites are tiny next to the corpus), and the "
        "probe is a broadcast hash join in the train scan — at 100 TB the "
        "corpus streams once, shuffling only per-doc hit counts. The "
        "exact-match n-gram criterion is the standard (GPT-3/PaLM-style) "
        "13-gram rule scaled to the fixture's 3-grams",
)
def _q_corpus_decontamination(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # source rides the shingle frame (extra_cols) — no self-join to
    # re-attach it; the doc roster `t` comes straight from the raw table,
    # so shingling is evaluated for exactly the two sides that need
    # n-grams (bench + train), not three.
    sh = dedup.shingled(d, extra_cols=("source",))
    bench = (sh.filter(F.col("id") % 50 == 0)
             .select(F.explode("sh").alias("g")).distinct())
    train = (sh.filter(F.col("id") % 50 != 0)
             .select("id", F.explode("sh").alias("g")))
    hits = (
        train.join(F.broadcast(bench), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    t = (d.filter(F.col("doc_id") % 50 != 0)
         .select(F.col("doc_id").alias("id"), "source"))
    # t is one row per doc and hits is <=1 row per doc, so plain counts
    # suffice — no countDistinct, no Expand in the final agg.
    return (
        t.join(hits, "id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.count(F.when(F.col("n_hits").isNotNull(), F.lit(1)))
             .alias("n_contaminated"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long")
             .alias("total_hits"),
        )
    )


@_register(
    "corpus_pipeline_end_to_end",
    f"""
    WITH fp AS (
      SELECT doc_id, source, text, md5({SQL_NORM}) AS f FROM documents
    ),
    canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
    deduped AS (
      SELECT fp.doc_id, source, text,
             {SQL_TOKS} AS toks, len({SQL_TOKS}) AS n_tokens
      FROM fp JOIN canon USING (doc_id)
    ),
    quality AS (
      SELECT doc_id, source, text, n_tokens
      FROM deduped
      WHERE n_tokens BETWEEN 20 AND 1000
        AND len(list_filter(toks, t -> list_contains({_SQL_STOPS}, t)))
            * 1.0 / n_tokens BETWEEN 0.01 AND 0.6
    ),
    sh AS (SELECT doc_id, source, n_tokens, {SQL_SHINGLES} AS s
           FROM quality),
    bench AS (
      SELECT DISTINCT unnest({SQL_SHINGLES}) AS g
      FROM documents WHERE doc_id % 50 = 0
    ),
    contaminated AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest(s) AS g FROM sh) t JOIN bench USING (g)
    ),
    clean AS (
      SELECT doc_id, source, n_tokens FROM sh
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND doc_id % 50 <> 0
    ),
    runs AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM clean
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           count(DISTINCT CAST((cum - n_tokens) // 2048 AS BIGINT)) AS n_packs
    FROM runs GROUP BY source
    """,
    doc="the capstone composition a training-data pipeline ships: exact "
        "dedup (md5-fingerprint canonical) → quality gate (length + "
        "stopword ratio) → benchmark decontamination (broadcast 3-gram "
        "probe, anti join) → token-budget sequence packing → per-source "
        "data card (docs / tokens / packs). Shuffle ledger: fingerprint "
        "groupBy, one shingle-probe broadcast join + anti join, one "
        "window+agg pair sharing the source key — every stage is the "
        "already-audited operator, composed lazily so Catalyst pipelines "
        "the scans and AQE sizes each exchange. Measured tradeoff: "
        "persisting the post-quality-gate frame (the curated-corpus "
        "checkpoint a production pipeline writes between stages) is 3x "
        "faster on REPEATED execution (2.7 s -> 0.9 s warm sf0.1, the "
        "tokenize lambdas run once) but adds ~10% to a one-shot run - "
        "this one-shot-graded form stays lazy by choice",
)
def _q_corpus_pipeline(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    kept = dedup.dedup_exact(d)
    toked = dedup.tokenized(kept, "doc_id", "text",
                            extra_cols=("source",))
    toks = F.col("__toks")
    quality = (
        toked.select(F.col("id").alias("doc_id"), "source",
                     toks.alias("toks"),
                     F.size(toks).cast("long").alias("n_tokens"),
                     texts.stopword_ratio_of(toks).alias("_stop"))
        .filter(F.col("n_tokens").between(20, 1000)
                & F.col("_stop").between(0.01, 0.6))
    )
    # Measured-NEGATIVE (r17, VERDICT item 6): lazy-checkpointing the
    # gated `quality` frame so the sh/clean branches fan out of one
    # materialization — 1.53 s vs 1.14 s plain, same-session interleaved
    # median-of-5 at sf0.1. Same class as the dedup_winnow_pairs pin:
    # AQE runtime shuffle-stage reuse already executes the duplicated
    # tokenize chain once per exchange, so the checkpoint only adds
    # build-time jobs; and the r16 aggregate-form rewrite stays
    # measured-negative too (it lost scan pushdown, 1.14x worse).
    sh = quality.select(
        "doc_id", "source", "n_tokens",
        texts.word_shingles_of(F.col("toks"), 3).alias("s"))
    bench_toked = dedup.tokenized(d.filter(F.col("doc_id") % 50 == 0))
    bench = (bench_toked
             .select(F.explode(texts.word_shingles_of(F.col("__toks"), 3))
                     .alias("g")).distinct())
    hits = (
        sh.select("doc_id", F.explode("s").alias("g"))
        .join(F.broadcast(bench), "g")
        .select("doc_id").distinct()
    )
    # Branch off `quality`, not `sh`: the anti-join side needs only
    # (doc_id, source, n_tokens), so re-evaluating the shingle lambda —
    # the expensive interpreted step — for it would be pure waste.
    clean = (
        quality.filter(F.col("doc_id") % 50 != 0)
        .join(hits, "doc_id", "left_anti")
        .select("doc_id", "source", "n_tokens")
    )
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = clean.select(
        "source", "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
        .cast("long").alias("pack_id"))
    return (
        runs.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("total_tokens"),
             F.countDistinct("pack_id").alias("n_packs"))
    )


@_register(
    "similarity_ann_pq",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS match_id,
             list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM e p JOIN e c ON p.vec_id < 20 AND p.vec_id <> c.vec_id
    )
    SELECT probe_id, match_id, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank,
           TRUE AS pq_recall_ge_04
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, match_id) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    doc="product-quantization ANN, hash-checkable derived form (the "
        "approx_distinct_custkeys pattern — iterative k-means codebook "
        "training is not SQL-expressible, so the oracle asserts the EXACT "
        "side plus a recall boolean): pq_train fits per-subspace codebooks "
        "driver-side on a bounded deterministic seeded sample (kilobytes of "
        "metadata), the corpus is scanned once in 32x-compressed code space "
        "(ADC via Arrow-batched gather), a mult*k shortlist per probe is "
        "re-ranked with exact cosine, and the output is the in-engine EXACT "
        "top-5 per probe plus pq_recall_ge_04 = (|PQ top-5 ∩ exact top-5| "
        ">= 2). Every step is seeded/deterministic, so the boolean is "
        "stable WITH MARGIN: at shortlist_mult=160 the measured min "
        "overlap is 5/5 (sf0.001), 5/5 (sf0.01), 4/5 (sf0.1) — two whole "
        "hits above the asserted floor at every SF (r4 ran mult=40, whose "
        "sf0.1 floor EQUALED the threshold — zero margin). The wide "
        "shortlist is a grading cost only: it is scored in 32x-compressed "
        "code space, and production callers use pq_topk_rerank's "
        "default mult. The oracle computes the exact side and asserts TRUE",
)
def _q_similarity_pq(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    books = similarity.pq_train(e)
    probes = e.filter(F.col("vec_id") < 20)
    # Measured-NEGATIVE (r17): _ckpt-materializing `exact` (read twice:
    # recall-hit join + final select) measured 1.20 -> 1.31 s at sf0.1,
    # interleaved median-of-5 — the extra build-time job barrier costs
    # more than the duplicated top-k subtree, whose probe side is a
    # 20-row broadcast and whose shuffle stages AQE already reuses.
    exact = similarity.topk_cosine(probes, e, k=5, dim=64)
    pq = (similarity.pq_topk_rerank(probes, e, books, k=5, shortlist_mult=160)
          .select("probe_id", "match_id"))
    hits = (exact.select("probe_id", "match_id")
            .join(pq, ["probe_id", "match_id"])
            .groupBy("probe_id").agg(F.count("*").alias("__n_hit")))
    return (
        exact.join(F.broadcast(hits), "probe_id", "left")
        .select("probe_id", "match_id", F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"),
                (F.coalesce(F.col("__n_hit"), F.lit(0)) >= 2)
                .alias("pq_recall_ge_04"))
    )


# ---------------------------------------------------------------------------
# Round-7 additions: entropy scoring, snapshot CDC, per-domain caps
# ---------------------------------------------------------------------------

@_register(
    "text_char_entropy",
    f"""
    WITH c AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array({SQL_NORM}, ''),
                         x -> x != '') AS ch
      FROM documents
    ),
    s AS (
      SELECT doc_id, ch, len(ch) AS n,
             list_sort(list_distinct(ch)) AS d
      FROM c WHERE len(ch) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_norm,
           CAST(len(d) AS INTEGER) AS n_unique_chars,
           round(-list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(d,
                 x -> (len(list_filter(ch, y -> y = x)) * 1.0 / n)
                      * log2(len(list_filter(ch, y -> y = x)) * 1.0 / n))),
             (a, b) -> a + b), 4) AS entropy
    FROM s
    """,
    doc="character-distribution Shannon entropy per document — the "
        "classic gibberish/low-quality detector (base64 blobs and "
        "key-mash score far from prose's ~4.1 bits/char; repeated-char "
        "spam scores near 0): H = -sum p(c) log2 p(c) over the "
        "normalized [a-z0-9 ] alphabet. Pure scan-side column algebra: "
        "the char array is one projection attribute, the <=37-symbol "
        "distinct alphabet keeps the count pass O(37 n) per doc, and no "
        "shuffle ever sees a row — at 100 TB this is a free rider on "
        "the curation scan. The distinct alphabet is SORTED on both "
        "engines so the entropy fold adds terms in the same order "
        "(bit-identical accumulate before the round).",
)
def _q_text_char_entropy(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    ch = F.filter(F.split(texts.normalize(F.col("text")), ""),
                  lambda c: c != "")
    base = d.select("doc_id", ch.alias("ch")).filter(F.size("ch") > 0)
    n = F.size("ch")
    dist = F.array_sort(F.array_distinct(F.col("ch")))
    def _p(x):
        return (F.size(F.filter(F.col("ch"), lambda y: y == x))
                * F.lit(1.0) / n)
    terms = F.transform(dist, lambda x: _p(x) * F.log2(_p(x)))
    return base.select(
        "doc_id",
        n.cast("long").alias("n_chars_norm"),
        F.size(dist).cast("int").alias("n_unique_chars"),
        F.round(-F.aggregate(terms, F.lit(0.0), lambda a, b: a + b), 4)
         .alias("entropy"),
    )


#: Snapshot-diff synthesis rule (fixtures ship one corpus snapshot, so the
#: second is derived deterministically — shared as a RULE with the oracle,
#: the pii_creditcard_luhn pattern): snapshot A drops doc_id % 13 == 0
#: (docs "added later"), snapshot B drops doc_id % 11 == 0 (docs
#: "removed") and revises text for doc_id % 7 == 0 (docs "changed").
_SNAP_REV = " rev2"


@_register(
    "corpus_snapshot_diff",
    f"""
    WITH a AS (
      SELECT doc_id, md5(text) AS old_md5 FROM documents
      WHERE doc_id % 13 != 0
    ),
    b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || '{_SNAP_REV}'
                      ELSE text END) AS new_md5
      FROM documents WHERE doc_id % 11 != 0
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           a.old_md5, b.new_md5
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.old_md5 <> b.new_md5
    """,
    doc="corpus snapshot diff (CDC between two corpus versions): "
        "content-hash compare over a full outer join on the primary key, "
        "emitting added/removed/changed rows — the incremental-refresh "
        "primitive that turns a monthly recrawl into a delta pipeline "
        "(downstream dedup/index stages reprocess only the delta). "
        "Scale shape: ONE pk-keyed shuffle join of (pk, md5) pairs — "
        "text never moves, only 16-byte digests; with both snapshots "
        "bucketed by pk (sources/bucketed.py) the exchanges vanish "
        "entirely. The second snapshot is synthesized from the fixture "
        "by the deterministic rule above, mirrored in the oracle.",
)
def _q_corpus_snapshot_diff(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    a = (d.filter(F.col("doc_id") % 13 != 0)
         .select("doc_id", F.md5("text").alias("old_md5")))
    b = (d.filter(F.col("doc_id") % 11 != 0)
         .select("doc_id",
                 F.md5(F.when(F.col("doc_id") % 7 == 0,
                              F.concat(F.col("text"), F.lit(_SNAP_REV)))
                       .otherwise(F.col("text"))).alias("new_md5")))
    diff = a.join(b, "doc_id", "full_outer")
    status = (F.when(F.col("old_md5").isNull(), "added")
              .when(F.col("new_md5").isNull(), "removed")
              .otherwise("changed"))
    return (diff.select("doc_id", status.alias("status"),
                        "old_md5", "new_md5")
            .filter(F.col("old_md5").isNull() | F.col("new_md5").isNull()
                    | (F.col("old_md5") != F.col("new_md5"))))


@_register(
    "corpus_domain_cap",
    """
    SELECT doc_id, source, CAST(pick_rank AS INTEGER) AS pick_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
      FROM documents
    )
    WHERE pick_rank <= 15
    """,
    doc="per-domain document cap (keep <= 15 docs per source, "
        "seeded-uniform pick): the anti-domination quota every web-scale "
        "corpus applies — a few giant domains otherwise swallow the "
        "token budget. The GRADED plan is the production "
        "method='threshold' form of operators/relational.py::"
        "capped_per_key (salted two-level order-statistic + broadcast "
        "threshold filter, no per-domain sort — a domain holding 30% of "
        "a 100 TB crawl is never a single sorting reducer); the oracle "
        "replays the selection as the equivalent row_number window, "
        "identical because the quota-th order statistic's prefix equals "
        "the sort's prefix and the md5-of-id key is cross-engine.",
)
def _q_corpus_domain_cap(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.operators import relational

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return (relational.capped_per_key(
                d, key="source", id_col="doc_id", quota=15,
                method="threshold")
            .select("doc_id", "source",
                    F.col("pick_rank").cast("int").alias("pick_rank")))


@_register(
    "similarity_knn_graph",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, nbr, round(cos, 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos DESC, nbr) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    doc="exact k-nearest-neighbor graph (k=5, cosine) over the whole "
        "embedding corpus — the backbone for graph-based semantic dedup "
        "and kNN classification; unlike similarity_topk's bounded probe "
        "set, EVERY vector is a probe, so the broadcast-probe plan is "
        "unusable and the blocked-GEMM + per-block partial top-k shape "
        "is the production path (operators/similarity.py::knn_graph: "
        "shuffle volume num_blocks x corpus, candidate volume n*blocks*k "
        "scalars — the n x n matrix never materializes). Ranking runs on "
        "the raw doubles with an id tiebreak, same contract as the green "
        "similarity_topk; the oracle replays the full quadratic join.",
)
def _q_similarity_knn_graph(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        similarity.knn_graph(e, k=5, num_blocks=8)
        .select(F.col("id").alias("vec_id"), "nbr",
                F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"))
    )


#: kNN-graph CTE blocks shared by the graph-analytics oracles: the exact
#: quadratic replay of similarity.knn_graph(k=5) producing directed edges
#: g(vec_id, nbr). Kept as a fragment so triangle counting and label
#: propagation mirror the SAME edge set the Spark side computes.
_SQL_KNN_EDGES = """e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings),
    scored AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    g AS (
      SELECT vec_id, nbr FROM (
        SELECT vec_id, nbr, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, nbr) AS rank
        FROM scored)
      WHERE rank <= 5
    )"""


@_register(
    "similarity_graph_triangles",
    f"""
    WITH {_SQL_KNN_EDGES},
    und AS (
      SELECT DISTINCT least(vec_id, nbr) AS a, greatest(vec_id, nbr) AS b
      FROM g
    ),
    deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
      GROUP BY id
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pern AS (
      SELECT id, count(*) AS n FROM (
        SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
        UNION ALL SELECT z AS id FROM tri)
      GROUP BY id
    )
    SELECT deg.id AS vec_id, CAST(deg.deg AS BIGINT) AS deg,
           CAST(COALESCE(pern.n, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN deg.deg > 1
                      THEN 2.0 * COALESCE(pern.n, 0)
                           / (deg.deg * (deg.deg - 1))
                      ELSE 0.0 END, 4) AS clustering
    FROM deg LEFT JOIN pern ON pern.id = deg.id
    """,
    doc="per-node triangle counts and local clustering coefficient over "
        "the symmetrized k=5 cosine kNN graph — the semantic-cluster "
        "density signal (a doc whose neighbors are also mutual neighbors "
        "sits in a tight template/boilerplate cluster; lone bridges "
        "score 0). The kNN substrate keeps the graph SPARSE by "
        "construction (<= k*n directed edges), so triangle work is "
        "bounded no matter how dense the raw similarity structure is. "
        "Counting is the degree-ordered node-iterator (Suri & "
        "Vassilvitskii): edges oriented low-(deg,id) -> high, wedges "
        "fan out only from out-edges (outdeg <= O(sqrt(E)) after "
        "orientation — the curse-of-the-last-reducer fix), one join "
        "closes wedges against the oriented edge list; edges shuffle as "
        "bare id pairs, payloads never move "
        "(operators/graph.py::triangle_counts). The oracle replays the "
        "same triangle set from the canonical id-ordered enumeration — "
        "both orientations enumerate each triangle exactly once.",
)
def _q_similarity_graph_triangles(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.operators import graph

    e = _t(spark, sf_dir, "embeddings")
    g = similarity.knn_graph(e, k=5, num_blocks=8)
    und = (
        g.select(F.least("id", "nbr").alias("a"),
                 F.greatest("id", "nbr").alias("b"))
        .distinct()
    )
    tc = graph.triangle_counts(und)
    lcc = F.when(
        F.col("deg") > 1,
        F.lit(2.0) * F.col("n_triangles")
        / (F.col("deg") * (F.col("deg") - F.lit(1)))).otherwise(0.0)
    return tc.select(
        F.col("id").alias("vec_id"), F.col("deg").cast("long").alias("deg"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.round(lcc, 4).alias("clustering"))


@_register(
    "similarity_label_propagation",
    f"""
    WITH {_SQL_KNN_EDGES},
    votes AS (
      SELECT g.vec_id, nb.label AS nbr_label, count(*) AS v
      FROM g JOIN embeddings nb ON nb.vec_id = g.nbr
      GROUP BY g.vec_id, nb.label
    ),
    top AS (
      SELECT vec_id, nbr_label, v, row_number() OVER (
        PARTITION BY vec_id ORDER BY v DESC, nbr_label) AS rn
      FROM votes
    )
    SELECT t.vec_id, emb.label AS label,
           CAST(t.nbr_label AS INTEGER) AS new_label,
           CAST(t.v AS BIGINT) AS n_votes,
           emb.label <> t.nbr_label AS changed
    FROM top t JOIN embeddings emb ON emb.vec_id = t.vec_id
    WHERE t.rn = 1
    """,
    doc="one synchronous round of kNN label propagation (the "
        "semi-supervised labeling primitive: push sparse human/classifier "
        "labels across the semantic neighbor graph to label the whole "
        "corpus): each vector's proposed label is the plurality vote of "
        "its k=5 nearest neighbors' labels, ties broken by smallest "
        "label — fully deterministic, so rounds can chain. Plan shape "
        "per round: one join of the kNN edge list against the (id, "
        "label) frame (k rows per node — output-scale, never n^2), one "
        "(node, label) count aggregate with map-side partials, one "
        "k-bounded window to pick the argmax. At 100 TB the edge list "
        "is materialized once (it is the expensive artifact — "
        "knn_graph's blocked GEMM) and each propagation round costs "
        "only the two cheap shuffles above.",
)
def _q_similarity_label_propagation(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    g = similarity.knn_graph(e, k=5, num_blocks=8)
    votes = (
        g.join(e.select(F.col("vec_id").alias("nbr"),
                        F.col("label").alias("nbr_label")), "nbr")
        .groupBy("id", "nbr_label").agg(F.count("*").alias("v"))
    )
    w = Window.partitionBy("id").orderBy(F.col("v").desc(), "nbr_label")
    top = (votes.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1))
    return (
        top.join(e.select(F.col("vec_id").alias("id"), "label"), "id")
        .select(F.col("id").alias("vec_id"), "label",
                F.col("nbr_label").cast("int").alias("new_label"),
                F.col("v").cast("long").alias("n_votes"),
                (F.col("label") != F.col("nbr_label")).alias("changed"))
    )


@_register(
    "similarity_link_prediction",
    f"""
    WITH {_SQL_KNN_EDGES},
    und AS (
      SELECT DISTINCT least(vec_id, nbr) AS a, greatest(vec_id, nbr) AS b
      FROM g
    ),
    adj AS (
      SELECT a AS u, b AS x FROM und
      UNION ALL SELECT b AS u, a AS x FROM und
    ),
    deg AS (SELECT u AS id, count(*) AS deg FROM adj GROUP BY u),
    cn AS (
      SELECT w1.x AS a, w2.x AS b, count(*) AS common
      FROM adj w1 JOIN adj w2 ON w1.u = w2.u AND w1.x < w2.x
      GROUP BY w1.x, w2.x
    ),
    cand AS (
      SELECT cn.* FROM cn
      WHERE NOT EXISTS (SELECT 1 FROM und
                        WHERE und.a = cn.a AND und.b = cn.b)
    )
    SELECT c.a AS vec_a, c.b AS vec_b,
           CAST(c.common AS BIGINT) AS common,
           round(c.common * 1.0 / (da.deg + db.deg - c.common), 4)
             AS jaccard
    FROM cand c
    JOIN deg da ON da.id = c.a JOIN deg db ON db.id = c.b
    ORDER BY round(c.common * 1.0 / (da.deg + db.deg - c.common), 4) DESC,
             c.a, c.b
    LIMIT 50
    """,
    doc="common-neighbor link prediction over the symmetrized k=5 kNN "
        "graph: the 50 strongest NON-edges by neighborhood Jaccard — "
        "pairs the metric's top-k missed but the topology implies, the "
        "candidate generator for kNN-graph densification and for "
        "stitching dedup clusters that LSH banding split. Wedge pairs "
        "fan out from each shared neighbor (the triangle wedge join, "
        "kept open), aggregate map-side by pair, anti-join the edge "
        "list, and score against the degree frame "
        "(operators/graph.py::link_prediction_jaccard — per-center "
        "cost deg^2 with the hub df-cap documented there); the global "
        "top-50 is a TakeOrdered over per-partition heads, never a "
        "full sort. Jaccard is rounded to 4dp BEFORE ranking on both "
        "engines so the order compares the same numbers it outputs.",
)
def _q_similarity_link_prediction(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.operators import graph

    e = _t(spark, sf_dir, "embeddings")
    g = similarity.knn_graph(e, k=5, num_blocks=8)
    und = (
        g.select(F.least("id", "nbr").alias("a"),
                 F.greatest("id", "nbr").alias("b"))
        .distinct()
    )
    lp = graph.link_prediction_jaccard(und)
    return (
        lp.select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"),
                  F.col("common").cast("long").alias("common"),
                  F.round("jaccard", 4).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "vec_a", "vec_b")
        .limit(50)
    )


@_register(
    "text_bigram_lm_perplexity",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    bi AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    c1 AS (SELECT w, count(*) AS c FROM
             (SELECT unnest(toks) AS w FROM t) GROUP BY w),
    tot AS (SELECT count(*) AS n FROM (SELECT unnest(toks) FROM t)),
    scored AS (
      SELECT bi.doc_id,
             ln(0.7 * (c2.c * 1.0 / c1a.c) + 0.3 * (c1b.c * 1.0 / tot.n))
               AS lp
      FROM bi
      JOIN (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2) c2
        USING (w1, w2)
      JOIN c1 c1a ON bi.w1 = c1a.w
      JOIN c1 c1b ON bi.w2 = c1b.w
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 4) AS avg_logprob,
           round(exp(-avg(lp)), 4) AS perplexity
    FROM scored GROUP BY doc_id
    """,
    doc="interpolated bigram-LM perplexity per document (the hierarchical "
        "rung above text_unigram_logprob, the CCNet-style quality "
        "filter): P(w2|w1) = 0.7 * c(w1 w2)/c(w1) + 0.3 * c(w2)/N with "
        "the corpus itself as the LM; documents whose token transitions "
        "surprise the corpus LM (high perplexity) flag gibberish and "
        "boilerplate-mangled text. Plan: bigrams come from one "
        "scan-side array transform + explode (no self-join on "
        "position), counts are two partial+final hash-aggs keyed on "
        "the bigram/word, scoring is word-keyed equi-joins back "
        "(broadcast when the vocab is bounded, shuffle co-partitioned "
        "when it is web-scale), then ONE doc-keyed agg. ln/exp drift "
        "is absorbed by round-4 on the per-doc AVERAGE, the "
        "unigram_logprob precedent.",
)
def _q_text_bigram_lm_perplexity(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    tok = d.select("doc_id", texts.tokens(F.col("text")).alias("__toks"))
    n_t = F.size("__toks")
    bigr = (
        tok.filter(n_t >= 2)
        .select("doc_id", F.explode(F.transform(
            F.sequence(F.lit(1), n_t - 1),
            lambda i: F.struct(
                F.element_at("__toks", i.cast("int")).alias("w1"),
                F.element_at("__toks", (i + F.lit(1)).cast("int"))
                 .alias("w2")))).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"),
                F.col("bg.w2").alias("w2"))
    )
    # Measured-NEGATIVE (r17): _ckpt-materializing bigr (read by c2 +
    # scored) and c1 (joined twice), with tot folded to sum(c1.c),
    # measured 1.19 -> 1.46 s at sf0.1, interleaved median-of-5 — AQE
    # runtime shuffle-stage reuse already executes the duplicated
    # tokenize/fan-out subtrees once per exchange, so the checkpoints
    # only add sequential build-time job barriers (the winnow_pairs /
    # ann_pq pin class).
    uni = tok.select(F.explode("__toks").alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("c"))
    tot = uni.agg(F.count("*").alias("n"))
    c2 = bigr.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    lp = F.log(F.lit(0.7) * (F.col("c2") * F.lit(1.0) / F.col("c1a"))
               + F.lit(0.3) * (F.col("c1b") * F.lit(1.0) / F.col("n")))
    scored = (
        bigr.join(c2, ["w1", "w2"])
        .join(c1.select(F.col("w").alias("w1"), F.col("c").alias("c1a")),
              "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("c1b")),
              "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.round(F.avg("lp"), 4).alias("avg_logprob"),
             F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"))
    )


@_register(
    "text_heavy_hitters",
    f"""
    WITH w AS (SELECT unnest({SQL_TOKS}) AS token FROM documents),
    tot AS (SELECT count(*) AS n FROM w),
    c AS (SELECT token, count(*) AS cnt FROM w GROUP BY token)
    SELECT token, CAST(cnt AS BIGINT) AS cnt,
           round(cnt * 1.0 / n, 6) AS share
    FROM c CROSS JOIN tot
    WHERE cnt * 30 > n
    """,
    doc="frequent-token heavy hitters (count > N/30) via a per-batch "
        "top-s candidate sketch + exact candidate recount — the "
        "SpaceSaving/Misra-Gries shape: a token with global count > N/s "
        "must, by pigeonhole, exceed n_b/s in SOME batch, where it "
        "cannot miss that batch's exact top-s (fewer than s tokens can "
        "each exceed n_b/s) — so the merged candidate set provably "
        "contains every true heavy hitter, and the exact recount + "
        "threshold makes the OUTPUT deterministic no matter how rows "
        "were batched. Scale story: the final aggregate shuffles ONLY "
        "candidate-token rows (<= s per batch), never the full vocab — "
        "at 100 TB the vocab-wide groupBy this replaces is the "
        "bottleneck; the threshold compare is exact integer algebra "
        "(cnt*s > N), immune to float drift. The oracle replays the "
        "exact definition the sketch provably converges to.",
)
def _q_text_heavy_hitters(spark, sf_dir):
    import pandas as pd

    s = 30
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(F.explode(texts.tokens(F.col("text"))).alias("token"))

    def batch_tops(it):
        for pdf in it:
            vc = pdf["token"].value_counts().head(s)
            yield pd.DataFrame({"token": vc.index})

    cand = toks.mapInPandas(batch_tops, "token string").distinct()
    # total token count from the cheap per-doc size sum — one narrow scan,
    # not a second explode
    tot = d.agg(F.sum(F.size(texts.tokens(F.col("text")))).alias("n"))
    exact = (toks.join(F.broadcast(cand), "token")
             .groupBy("token").agg(F.count("*").alias("cnt")))
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * s > F.col("n"))
        .select("token", F.col("cnt").cast("long").alias("cnt"),
                F.round(F.col("cnt") * F.lit(1.0) / F.col("n"), 6)
                 .alias("share"))
    )


@_register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id)
               AS to_type
      FROM events
    ),
    c AS (SELECT from_type, to_type, count(*) AS n FROM seq
          WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM c
    """,
    doc="behavioral Markov chain: per-user event-sequence transition "
        "counts and conditional probabilities P(next | current) — the "
        "session-model primitive behind next-event prediction and "
        "anomaly scoring. ONE window (lead over user_id ordered by "
        "exact epoch-millis with the event_id tiebreak) + one "
        "state-pair aggregate; the transition matrix is "
        "|event_types|^2 rows, so the normalizing window runs on a "
        "5x5 frame — at 100 TB the only full-data pass is the "
        "user-keyed window, the same exchange every sessionization "
        "query already pays.",
)
def _q_events_markov_transitions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"))
    c = (seq.filter(F.col("to_type").isNotNull())
         .groupBy("from_type", "to_type").agg(F.count("*").alias("n")))
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wn), 4).alias("p"))


#: Quality-classifier weights (a stand-in for a distilled fasttext-style
#: linear model): literal constants shared by the Spark plan and the
#: oracle, applied to the text_quality feature set.
#: The linear quality-classifier weights live with the shared scoring
#: column (functions/texts.py::quality_score_of) so the batch query and
#: the streaming quality gate apply the identical model; alias kept for
#: the oracle f-strings below.
_QC_W = texts.DEFAULT_QUALITY_WEIGHTS


#: Count-min sketch geometry: d independent md5-seeded hash rows of w
#: buckets. Small enough that the counter frame is broadcastable, large
#: enough that the top-probe overestimates stay modest at fixture scale.
_CMS_D, _CMS_W = 4, 256


@_register(
    "events_count_min_sketch",
    f"""
    WITH rows_ AS (
      SELECT user_id, s.s AS seed,
             CAST('0x' || substr(md5('cms' || s.s || ':' ||
                  CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % {_CMS_W}
               AS bucket
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1}))
                              AS s) s
    ),
    counters AS (
      SELECT seed, bucket, count(*) AS c FROM rows_ GROUP BY seed, bucket
    ),
    truth AS (
      SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id
      ORDER BY count(*) DESC, user_id LIMIT 10
    ),
    probe AS (
      SELECT t.user_id, t.true_count, s.s AS seed,
             CAST('0x' || substr(md5('cms' || s.s || ':' ||
                  CAST(t.user_id AS VARCHAR)), 1, 15) AS BIGINT) % {_CMS_W}
               AS bucket
      FROM truth t CROSS JOIN (SELECT unnest(generate_series(0,
                               {_CMS_D - 1})) AS s) s
    )
    SELECT p.user_id,
           CAST(max(p.true_count) AS BIGINT) AS true_count,
           CAST(min(c.c) AS BIGINT) AS cms_estimate,
           CAST(min(c.c) - max(p.true_count) AS BIGINT) AS overestimate
    FROM probe p JOIN counters c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.user_id
    """,
    doc=f"count-min sketch accuracy audit: build a {_CMS_D}x{_CMS_W} CMS "
        "over event user_ids with md5-seeded rows (deterministic, so "
        "both engines build the IDENTICAL sketch), then estimate the 10 "
        "true-heaviest users and report estimate vs truth — CMS "
        "guarantees estimate >= truth, with overestimates bounded by "
        "collision mass. This is the MERGEABLE frequency sketch next to "
        "text_heavy_hitters' candidate-recount form: counters are a "
        "partial+final agg to d*w cells, so 100 TB of events reduce "
        "map-side to a KB-scale frame that unions across "
        "partitions/days by cell-wise addition — the streaming/"
        "cross-shard path the exact groupBy can't take. (The AUDIT "
        "derives the counters from the per-user truth aggregate it "
        "must compute anyway — sum(cnt) per cell is the identical "
        "sketch, hashed once per user, one shared exchange.) "
        "Probing joins "
        f"the 10x{_CMS_D} probe rows against the broadcast counter "
        "frame; min-over-rows is the CMS read.",
)
def _q_events_count_min_sketch(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("seed")

    def bucket(uid_col):
        return (hashing.hex_int(
            F.concat(F.lit("cms"), F.col("seed").cast("string"),
                     F.lit(":"), uid_col.cast("string"))) % _CMS_W)

    # The audit pays for the exact per-user aggregate anyway (truth), so
    # the counters are derived FROM it: sum(cnt) per (seed, bucket) is
    # identical to counting raw events per cell, but hashes each USER
    # 4x instead of each EVENT 4x, and both branches reuse one exchange.
    # (A production ingest sketch skips the user-keyed exchange entirely
    # and folds raw events map-side into d*w cells — see the doc above;
    # this shape is specific to the audit, where truth is mandatory.)
    per_user = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    counters = (per_user.select("user_id", "cnt", seeds)
                .select("cnt", "seed", bucket(F.col("user_id"))
                        .alias("bucket"))
                .groupBy("seed", "bucket")
                .agg(F.sum("cnt").alias("c")))
    truth = (per_user.withColumnRenamed("cnt", "true_count")
             .orderBy(F.col("true_count").desc(), "user_id").limit(10))
    probe = (truth.select("user_id", "true_count", seeds)
             .select("user_id", "true_count", "seed",
                     bucket(F.col("user_id")).alias("bucket")))
    return (
        probe.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.max("true_count").cast("long").alias("true_count"),
             F.min("c").cast("long").alias("cms_estimate"),
             (F.min("c") - F.max("true_count")).cast("long")
             .alias("overestimate"))
    )


def _kcenter_oracle(k: int = 8, dim: int = 64) -> str:
    """Unrolled greedy k-center: one (distance, argmax) CTE pair per
    round, the pagerank-unroll pattern. The squared-L2 fold
    list_sum(list_transform(...)) sums dims left-to-right — the same
    order as the Spark side's aggregate() fold, so the selection
    arithmetic agrees to the bit."""
    def dist(a: str, b: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {dim}), "
                f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")

    blocks = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT e.vec_id, e.v, {dist('e.v', 'c.v')} AS dmin "
        f"FROM e CROSS JOIN c0 c)",
    ]
    for i in range(1, k):
        blocks.append(
            f"m{i} AS (SELECT vec_id, v, dmin FROM d{i} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)")
        if i < k - 1:
            blocks.append(
                f"d{i + 1} AS (SELECT d.vec_id, d.v, "
                f"least(d.dmin, {dist('d.v', 'c.v')}) AS dmin "
                f"FROM d{i} d CROSS JOIN m{i} c)")
    selects = ["SELECT 0 AS rank, vec_id, 0.0 AS sel_dist FROM c0"]
    selects += [
        f"SELECT {i} AS rank, vec_id, round(dmin, 4) AS sel_dist FROM m{i}"
        for i in range(1, k)
    ]
    return ("WITH " + ",\n    ".join(blocks) + "\n    "
            + "\n    UNION ALL ".join(selects))


@_register(
    "corpus_kcenter_coreset",
    _kcenter_oracle(),
    doc="greedy k-center coreset (Gonzalez farthest-point, k=8) over the "
        "embedding corpus: the seed is the smallest id, each later pick "
        "is the point farthest (squared L2) from the selected set — the "
        "2-approximate diversity cover that seeds active learning and "
        "picks maximally-spread exemplars for eval/annotation budgets; "
        "the decreasing sel_dist column IS the coverage-radius curve. "
        "Spark side (operators/similarity.py::kcenter_select, "
        "method='running'): a persisted (id, v, dmin) frame where each "
        "round folds in ONLY the newest center "
        "(dmin = least(dmin, dist)) as a scan-side codegen fold over "
        "one literal vector (no join/shuffle; the ivf inlined-centroid "
        "pattern) plus a TakeOrdered(1) — O(k) folds per point and "
        "constant per-round expression size; driver traffic is k*dim "
        "floats of bounded metadata. The oracle unrolls the same "
        "running-min recurrence as CTE pairs (the pagerank pattern) "
        "with the identical left-to-right dim fold, so selection ties "
        "can only break on the shared id tiebreak.",
)
def _q_corpus_kcenter_coreset(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    out = similarity.kcenter_select(e, "embedding", "vec_id", k=8)
    return out.select("rank", "vec_id",
                      F.round("sel_dist", 4).alias("sel_dist"))


@_register(
    "text_ngram_novelty",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({SQL_SHINGLES}) AS g
      FROM documents
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
    novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel
      FROM (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
      GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(p.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
           round(coalesce(n.n_novel, 0) * 1.0 / p.n_shingles, 4) AS novelty
    FROM per_doc p LEFT JOIN novel n ON n.doc_id = p.doc_id
    """,
    doc="per-document n-gram novelty in corpus order: the fraction of a "
        "doc's distinct 3-shingles whose FIRST corpus occurrence (min "
        "doc_id) is this doc — the marginal-information curve that "
        "tells a crawl pipeline when a source has gone stale (novelty "
        "for late docs decays toward template-only) and ranks docs for "
        "dedup-aware curriculum ordering. Plan: because a doc's "
        "shingles are DISTINCT, the novel count per doc needs no join "
        "back to the posting list — it is a second aggregate OVER the "
        "first-occurrence frame (min doc_id per shingle, then count "
        "per winning doc), so the only shingle-keyed exchange is the "
        "min-aggregate itself (a boilerplate shingle in a billion docs "
        "is one reducer AGGREGATING, never a self-join; the r7 debut "
        "shape joined firsts back on the shingle key and cost 7.2 s at "
        "sf0.1 — this shape answers in ~3 s full-sweep steady state, "
        "linear in shingle volume per docs/SCALING.md). Denominators are the "
        "precomputed sz=size(sh) column on the shared shingled frame — "
        "no second explode — and the final join is per-doc (tiny) with "
        "novel-less docs restored via coalesce(0). No windows, no "
        "sorts.",
)
def _q_text_ngram_novelty(spark, sf_dir):
    # no _spread: shingled() itself hash-spreads the raw under-split scan
    base = dedup.shingled(_t(spark, sf_dir, "documents"))
    # BOTH counts come off ONE exploded frame (exactly the oracle's
    # shape: per_doc = count per doc after unnest). The r15 form read
    # the denominator from the precomputed sz column behind a
    # filter(sz > 0), which planned as a SECOND scan→spread→tokenize
    # branch with the whole shingle pipeline substituted into the
    # pushed-down filter — a duplicate single-split evaluation worth
    # ~half the query (r16 same-session A/B: 2.39 s → 1.09 s, oracle
    # parity re-proven at sf0.001 + sf0.01). filter(sz > 0) ≡ "explodes
    # to ≥ 1 row": sz is -1 for null text and ≥ 1 otherwise (the
    # shingle transform always emits at least one element), so the
    # groupBy over the exploded rows keeps exactly the same docs with
    # n_shingles == sz.
    sh = base.select(F.col("id").alias("doc_id"), F.explode("sh").alias("g"))
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("__nsh"))
    novel = (sh.groupBy("g").agg(F.min("doc_id").alias("doc_id"))
             .groupBy("doc_id").agg(F.count("*").alias("n_novel")))
    return (
        per_doc.join(novel, "doc_id", "left")
        .select("doc_id",
                F.col("__nsh").cast("long").alias("n_shingles"),
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("long")
                .alias("n_novel"),
                F.round(F.coalesce(F.col("n_novel"), F.lit(0))
                        * F.lit(1.0) / F.col("__nsh"), 4)
                .alias("novelty"))
    )


@_register(
    "quality_classifier_score",
    f"""
    WITH f AS (
      SELECT doc_id,
             len({SQL_TOKS}) AS n_tokens,
             len(list_filter({SQL_TOKS},
                 t -> list_contains({_SQL_STOPS}, t))) * 1.0
               / len({SQL_TOKS}) AS stop_r,
             (length(lower(text))
              - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
               * 1.0 / length(text) AS punct_r,
             length(replace(text, ' ', '')) * 1.0
               / len({SQL_TOKS}) AS alen
      FROM documents WHERE len({SQL_TOKS}) > 0
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-({_QC_W['bias']}
                 + {_QC_W['stop']} * stop_r
                 + {_QC_W['punct']} * punct_r
                 + {_QC_W['alen']} * alen
                 + {_QC_W['lntok']} * ln(n_tokens)))), 4) AS score,
           1.0 / (1.0 + exp(-({_QC_W['bias']}
                 + {_QC_W['stop']} * stop_r
                 + {_QC_W['punct']} * punct_r
                 + {_QC_W['alen']} * alen
                 + {_QC_W['lntok']} * ln(n_tokens)))) >= 0.5 AS keep
    FROM f
    """,
    doc="model-based quality scoring (the fasttext-classifier stage of "
        "CCNet/RefinedWeb-style curation, distilled to a linear model "
        "whose weights ship as broadcast literals): score = "
        "sigmoid(w . features) over the text_quality feature vector "
        "(stopword ratio, punctuation ratio, mean token length, log "
        "token count), keep = score >= 0.5. Pure scan-side codegen — "
        "swapping in real trained weights changes ONE literal map, not "
        "the plan; at 100 TB the scoring pass rides the same corpus "
        "scan as every other curation signal. The oracle replays the "
        "identical arithmetic spelling, so the round-4 score and the "
        "boolean gate are cross-engine stable.",
)
def _q_quality_classifier_score(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toked = dedup.tokenized(d, "doc_id", "text", extra_cols=("text",))
    score = texts.quality_score_of(F.col("text"), F.col("__toks"))
    return (toked.filter(F.size("__toks") > 0)
            .select(F.col("id").alias("doc_id"),
                    F.round(score, 4).alias("score"),
                    (score >= 0.5).alias("keep")))


#: Shared oracle CTE for the calibration/Wilson audits: the distilled
#: quality-classifier score (rounded to 4dp BEFORE binning so bucket
#: assignment is cross-engine exact) and the rule-gate label the score
#: stands in for (corpus_curation's gate).
_SCORED_DOCS_CTE = f"""
f AS (
  SELECT len({SQL_TOKS}) AS n_tokens,
         len(list_filter({SQL_TOKS},
             t -> list_contains({_SQL_STOPS}, t))) * 1.0
           / len({SQL_TOKS}) AS stop_r,
         (length(lower(text))
          - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
           * 1.0 / length(text) AS punct_r,
         length(replace(text, ' ', '')) * 1.0
           / len({SQL_TOKS}) AS alen
  FROM documents WHERE len({SQL_TOKS}) > 0
),
q AS (
  SELECT round(1.0 / (1.0 + exp(-({_QC_W['bias']}
           + {_QC_W['stop']} * stop_r
           + {_QC_W['punct']} * punct_r
           + {_QC_W['alen']} * alen
           + {_QC_W['lntok']} * ln(n_tokens)))), 4) AS score,
         CASE WHEN n_tokens BETWEEN 20 AND 1000
               AND stop_r BETWEEN 0.01 AND 0.6
              THEN 1 ELSE 0 END AS y
  FROM f
)
"""


@_register(
    "docs_quality_calibration",
    f"""
    WITH {_SCORED_DOCS_CTE},
    b AS (SELECT list_distinct(quantile_cont(score,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS bs
          FROM q),
    a AS (SELECT 1 + len(list_filter(b.bs, x -> x < score)) AS bucket,
                 score, y
          FROM q, b),
    g AS (SELECT bucket, count(*) AS n, sum(score) AS ssum,
                 sum(y) AS n_pos,
                 sum((score - y) * (score - y)) AS sq
          FROM a GROUP BY 1),
    s AS (SELECT bucket, n, n_pos,
                 ssum / n AS avg_s,
                 n_pos * 1.0 / n AS obs,
                 sum(abs(n_pos * 1.0 / n - ssum / n) * n) OVER ()
                   / sum(n) OVER () AS ece,
                 sum(sq) OVER () / sum(n) OVER () AS brier
          FROM g)
    SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(avg_s, 6) AS avg_score,
           round(obs, 6) AS obs_rate,
           round(obs - avg_s, 6) AS gap,
           round(ece, 6) AS ece_total,
           round(brier, 6) AS brier_total
    FROM s
    """,
    doc="reliability-diagram calibration audit (ECE + Brier) of the "
        "distilled quality classifier against the rule gate it stands "
        "in for — the companion to the graded ROC/AUC (AUC measures "
        "RANKING; this measures whether a score of 0.8 MEANS 80% "
        "gate-pass probability). The score is rounded to 4dp BEFORE "
        "binning so bucket assignment is cross-engine exact. Scale "
        "shape (roc_auc_binned verbatim): ONE percentile aggregate "
        "(approx_percentile at 100 TB, same plan) broadcast as "
        "boundaries, scan-side strictly-below bucket fold, ONE "
        "partial+final bucket aggregate carrying (n, score sum, "
        "positives, squared error) together; the ECE/Brier windows run "
        "over the <= 10-row AGGREGATE frame — no global sort, no rank "
        "pass; null scores/labels raise in-plan "
        "(operators/relational.py::calibration_bins).",
)
def _q_docs_quality_calibration(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toked = dedup.tokenized(d, "doc_id", "text", extra_cols=("text",))
    toks, text = F.col("__toks"), F.col("text")
    # calibration_bins reads the scored frame twice (percentile
    # boundaries + bucketing) — materialize the narrow (score, y) rows
    # once so the tokenize/score pass plans once (r17).
    base = _ckpt(toked.filter(F.size("__toks") > 0).select(
        F.round(texts.quality_score_of(text, toks), 4).alias("score"),
        (F.size(toks).between(20, 1000)
         & texts.stopword_ratio_of(toks).between(0.01, 0.6)).alias("y")))
    return relational.calibration_bins(base, "score", F.col("y"), bins=10)


@_register(
    "docs_wilson_quality",
    f"""
    WITH q AS (SELECT source,
                 CASE WHEN len({SQL_TOKS}) BETWEEN 20 AND 1000
                       AND len(list_filter({SQL_TOKS},
                           t -> list_contains({_SQL_STOPS}, t))) * 1.0
                         / len({SQL_TOKS}) BETWEEN 0.01 AND 0.6
                      THEN 1 ELSE 0 END AS ok
               FROM documents WHERE len({SQL_TOKS}) > 0),
    a AS (SELECT source, count(*) AS n, sum(ok) AS n_pass
          FROM q GROUP BY 1)
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(n_pass AS BIGINT) AS n_pass,
           round(n_pass * 1.0 / n, 6) AS pass_rate,
           round((n_pass * 1.0 / n + 1.96 * 1.96 / (2 * n)
                  - 1.96 * sqrt((n_pass * 1.0 / n)
                                * (1 - n_pass * 1.0 / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_lower
    FROM a
    """,
    doc="per-source quality-gate pass rate with the Wilson score "
        "interval's LOWER bound at z=1.96 — the statistically honest "
        "way to gate sources on a boolean outcome when sizes differ "
        "wildly: a 3/3 source does NOT outrank a 950/1000 one (plain "
        "rate says it does; the Wilson lower bound says 0.44 vs "
        "0.936). Null gate flags count as failures (the conservative "
        "reading for a gate). Scale shape: scan-side predicate + ONE "
        "partial+final (source) aggregate; the Wilson algebra is a "
        "projection over the per-source frame — nothing else moves "
        "(operators/relational.py::wilson_pass_rate).",
)
def _q_docs_wilson_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toked = dedup.tokenized(d, "doc_id", "text",
                            extra_cols=("text", "source"))
    toks = F.col("__toks")
    base = toked.filter(F.size("__toks") > 0).select(
        "source",
        (F.size(toks).between(20, 1000)
         & texts.stopword_ratio_of(toks).between(0.01, 0.6)).alias("ok"))
    return relational.wilson_pass_rate(base, "source", F.col("ok"), z=1.96)


@_register(
    "multimodal_phash_dedup",
    """
    WITH imgs AS (
      SELECT doc_id,
             CAST(doc_id % 6 + 4 AS INTEGER) AS w,
             CAST(doc_id % 4 + 2 AS INTEGER) AS h
      FROM documents WHERE doc_id % 5 = 0
    ),
    px AS (
      SELECT doc_id, w, h,
             (p % w) AS x, (p // w) AS y,
             (48 + ((doc_id % 16) * 31 + (3*p + 1) * 7) % 64)
           + (48 + ((doc_id % 16) * 31 + (3*p + 2) * 7) % 64)
           + (48 + ((doc_id % 16) * 31 + (3*p + 3) * 7) % 64) AS lum
      FROM imgs, unnest(generate_series(0, w * h - 1)) AS t(p)
    ),
    blk AS (
      SELECT doc_id, w, h,
             (CASE WHEN y >= h // 2 THEN 2 ELSE 0 END
              + CASE WHEN x >= w // 2 THEN 1 ELSE 0 END) AS b,
             sum(lum) AS s, count(*) AS c
      FROM px GROUP BY doc_id, w, h,
             (CASE WHEN y >= h // 2 THEN 2 ELSE 0 END
              + CASE WHEN x >= w // 2 THEN 1 ELSE 0 END)
    ),
    tot AS (SELECT doc_id, sum(s) AS st, sum(c) AS ct
            FROM blk GROUP BY doc_id),
    hashes AS (
      SELECT blk.doc_id, blk.w, blk.h,
             CAST(sum(CASE WHEN s * ct > st * c
                           THEN 1 << b ELSE 0 END) AS INTEGER) AS phash
      FROM blk JOIN tot ON blk.doc_id = tot.doc_id
      GROUP BY blk.doc_id, blk.w, blk.h
    ),
    g AS (SELECT w, h, phash, count(*) AS n_dups,
                 min(doc_id) AS canonical
          FROM hashes GROUP BY w, h, phash)
    SELECT hashes.doc_id,
           hashes.w AS width, hashes.h AS height, hashes.phash,
           CAST(g.n_dups AS INTEGER) AS n_dups,
           CAST(hashes.doc_id = g.canonical AS INTEGER) AS is_canonical
    FROM hashes JOIN g ON hashes.w = g.w AND hashes.h = g.h
                      AND hashes.phash = g.phash
    """,
    doc="image near-dup detection by perceptual hash: every fifth doc "
        "synthesizes a real binary-PPM payload whose PIXELS vary by a "
        "deterministic doc_id%16 rule (so visually identical images "
        "recur across docs), operators/multimodal.py::image_ahash "
        "DECODES the actual bytes (numpy PPM parser, Arrow batches, "
        "bytes never shuffle) and computes the 2x2 average-hash with "
        "exact integer cross-multiplications, and duplicate groups fall "
        "out of a plain (w, h, phash) groupBy — hash-join dedup over "
        "images, no pairwise pixel compares. The oracle recomputes the "
        "hash from the SYNTHESIS RULE alone (shared as column algebra, "
        "never as parsing code), so a green row proves the byte-level "
        "encode->decode->hash round-trip end to end.",
)
def _q_multimodal_phash_dedup(spark, sf_dir):
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 5 == 0)
         .select("doc_id"))
    w = (F.col("doc_id") % 6 + 4).cast("int")
    h = (F.col("doc_id") % 4 + 2).cast("int")
    code = lambda i: (F.lit(48)
                      + ((F.col("doc_id") % 16) * 31 + i * 7) % 64)
    body = F.concat_ws("", F.transform(
        F.sequence(F.lit(1), (w * h * 3).cast("int")),
        lambda i: F.char(code(i))))
    payload = F.encode(
        F.concat(F.lit("P6 "), w.cast("string"), F.lit(" "),
                 h.cast("string"), F.lit(" 255\n"), body), "UTF-8")
    imgs = d.select("doc_id", payload.alias("content"))
    hashes = multimodal.image_ahash(imgs)
    g = (hashes.groupBy("width", "height", "phash")
         .agg(F.count("*").cast("int").alias("n_dups"),
              F.min("doc_id").alias("canonical")))
    return (
        hashes.join(g, ["width", "height", "phash"])
        .select("doc_id", "width", "height", "phash", "n_dups",
                (F.col("doc_id") == F.col("canonical")).cast("int")
                .alias("is_canonical"))
    )


def _bpe_oracle(rounds: int = 5) -> str:
    """Unrolled-CTE oracle for text_bpe_vocab (the _pagerank_oracle
    pattern: the iterative algorithm is replayed as ``rounds`` chained
    CTEs with identical tie-break and merge spelling)."""
    blocks = [
        f"""w AS (
      SELECT word, count(*) AS cnt FROM
        (SELECT unnest({SQL_TOKS}) AS word FROM documents)
      GROUP BY word
    ),
    s0 AS (
      SELECT word, cnt,
             array_to_string(list_filter(
               regexp_split_to_array(word, ''), x -> x != ''), ' ') AS seq
      FROM w
    )"""]
    for r in range(1, rounds + 1):
        blocks.append(f"""p{r} AS (
      SELECT sy[i] || ' ' || sy[i + 1] AS pair, sum(cnt) AS c
      FROM (SELECT cnt, string_split(seq, ' ') AS sy FROM s{r-1}),
           unnest(generate_series(1, len(sy) - 1)) AS u(i)
      GROUP BY sy[i] || ' ' || sy[i + 1]
    ),
    win{r} AS (
      SELECT pair, c FROM p{r} ORDER BY c DESC, pair LIMIT 1
    ),
    s{r} AS (
      SELECT word, cnt,
             trim(replace(' ' || seq || ' ', ' ' || pair || ' ',
                          ' ' || replace(pair, ' ', '') || ' ')) AS seq
      FROM s{r-1} CROSS JOIN win{r}
    )""")
        blocks.append(f"""o{r} AS (
      SELECT {r} AS round, pair,
             replace(pair, ' ', '') AS merged, c FROM win{r}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT * FROM o{r}" for r in range(1, rounds + 1))
    return ("WITH " + ",\n    ".join(blocks)
            + f"\n    SELECT CAST(round AS INTEGER) AS round, pair, merged,"
              f" CAST(c AS BIGINT) AS cnt FROM ({unions})")


@_register(
    "text_bpe_vocab",
    _bpe_oracle(),
    doc="BPE tokenizer-vocabulary induction at corpus scale (the "
        "Sennrich et al. byte-pair-encoding training loop, 5 unrolled "
        "merge rounds): symbol-pair counts aggregate over the WORD "
        "FREQUENCY table — the classic trick that makes BPE corpus-size-"
        "independent (a 100 TB crawl has ~1e8 distinct words, so every "
        "round is one word-keyed scan of the compact (word, count) "
        "frame, never of the raw corpus) — and each round's winner "
        "(max count, lexicographic tie-break) is ONE ROW, so the loop "
        "collects it eagerly and applies the merge as a LITERAL "
        "left-to-right replace on the space-joined symbol string "
        "(identical greedy semantics on both engines). That keeps each "
        "round a single small job over the persisted word frame and "
        "makes the final result 5 literal rows — the r7-debut form "
        "instead built one lazy plan whose 5-branch union re-derived "
        "the whole replace chain per branch through 5 broadcast joins "
        "(2.7 s -> ~1 s at sf0.1). The per-round driver round-trip is "
        "a scalar, the same bounded-metadata budget as the k-means "
        "trainer; the oracle unrolls the same rounds as chained CTEs "
        "with the identical argmax and replace spelling. Output: "
        "(round, pair, merged, cnt) — the learned merge table, which "
        "IS the tokenizer.",
)
def _q_text_bpe_vocab(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    w = (d.select(F.explode(texts.tokens(F.col("text"))).alias("word"))
         .groupBy("word").agg(F.count("*").alias("cnt"))
         .persist())
    seq = F.concat_ws(" ", F.filter(F.split(F.col("word"), ""),
                                    lambda c: c != ""))
    s = w.select("cnt", seq.alias("seq"))
    rows = []
    for r in range(1, 6):
        sy = F.split(F.col("seq"), " ")
        pairs = (
            s.select("cnt", F.explode(F.transform(
                texts._guarded_idx(F.size(sy) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(sy, i.cast("int")),
                    F.element_at(sy, (i + F.lit(1)).cast("int")))))
             .alias("pair"))
            .groupBy("pair").agg(F.sum("cnt").alias("c"))
        )
        win = (pairs.agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                        F.col("pair").alias("p"))).alias("m"))
               .select(F.col("m.p").alias("pair"),
                       (-F.col("m.nc")).alias("c"))
               .collect())
        if not win or win[0]["pair"] is None:
            break
        pair, cnt = win[0]["pair"], win[0]["c"]
        merged = pair.replace(" ", "")
        rows.append((r, pair, merged, int(cnt)))
        s = s.select("cnt", F.trim(F.replace(
            F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
            F.lit(f" {pair} "), F.lit(f" {merged} "))).alias("seq"))
    w.unpersist()
    return spark.createDataFrame(
        rows, "round int, pair string, merged string, cnt long")


# ---------------------------------------------------------------------------
# Embedding compression / dimensionality reduction
# ---------------------------------------------------------------------------

_SQ_LEVELS = 255.0  # int8 code range 0..255


@_register(
    "embedding_quantize_int8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    st AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    q AS (
      SELECT vec_id, v, mn, mx,
             CASE WHEN mx > mn THEN
               list_transform(v, x ->
                 CAST(round((x - mn) * 255.0 / (mx - mn)) AS INTEGER))
             ELSE list_transform(v, x -> 0) END AS c
      FROM st
    )
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           round((mx - mn) / 255.0, 6) AS scale,
           md5(array_to_string(c, ',')) AS codes_md5,
           round(sqrt(list_sum(list_transform(
                 generate_series(1, len(v)),
                 i -> (v[i] - (mn + c[i] * (mx - mn) / 255.0))
                    * (v[i] - (mn + c[i] * (mx - mn) / 255.0))))
                 / len(v)), 6) AS rmse
    FROM q
    """,
    doc="per-vector scalar int8 quantization (the 4x embedding-storage "
        "compressor every 100 TB vector corpus ships before ANN "
        "indexing): code_i = round((x_i - min) * 255 / (max - min)), "
        "per-vector min/max scale. Pure scan-side array algebra — one "
        "pass, zero shuffles, codes never leave the row. The md5 over "
        "the code array proves BYTE-EXACT quantizer agreement with the "
        "oracle (not just close floats), and the round-trip RMSE column "
        "is the compression-quality audit. Uniform half-up rounding "
        "agrees across engines because the scaled values are "
        "non-negative; the dequantized error fold mirrors the oracle's "
        "sequential list_sum order term-for-term.",
)
def _q_embedding_quantize_int8(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.functions import vectors

    e = _t(spark, sf_dir, "embeddings")
    v = vectors.as_double(F.col("embedding"))
    st = e.select("vec_id", v.alias("v"),
                  F.array_min(v).alias("mn"), F.array_max(v).alias("mx"))
    mn, mx = F.col("mn"), F.col("mx")
    codes = F.when(
        mx > mn,
        F.transform("v", lambda x: F.round((x - mn) * F.lit(255.0)
                                           / (mx - mn)).cast("int"))
    ).otherwise(F.transform("v", lambda x: F.lit(0)))
    q = st.select("vec_id", "v", "mn", "mx", codes.alias("c"))
    err = F.zip_with(
        "v", "c",
        lambda x, ci: (x - (mn + ci * (mx - mn) / F.lit(255.0)))
                    * (x - (mn + ci * (mx - mn) / F.lit(255.0))))
    return q.select(
        "vec_id",
        F.size("v").cast("int").alias("n_dims"),
        F.round((mx - mn) / F.lit(255.0), 6).alias("scale"),
        F.md5(F.encode(F.array_join(
            F.transform("c", lambda x: x.cast("string")), ","),
            "UTF-8")).alias("codes_md5"),
        F.round(F.sqrt(
            F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
            / F.size("v")), 6).alias("rmse"),
    )


#: Rademacher projection constants: out_dims x in_dims signs derived from
#: md5 parity driver-side (functions/hashing.py::py_hex_int) and embedded
#: as literals in BOTH the Spark plan and the oracle SQL — the LSH-plane
#: pattern. Scale 1/sqrt(out_dims) repr-round-trips to the same double.
_RP_IN, _RP_OUT = 64, 8
_RP_SIGNS = [
    [1.0 if hashing.py_hex_int(f"rp:{j}:{i}") % 2 == 0 else -1.0
     for i in range(_RP_IN)]
    for j in range(_RP_OUT)
]
_RP_SCALE = repr(1.0 / (_RP_OUT ** 0.5))


def _rp_oracle() -> str:
    ys = ",\n             ".join(
        f"round(list_dot_product(v, ["
        + ", ".join(str(s) for s in _RP_SIGNS[j])
        + f"]::DOUBLE[]) * {_RP_SCALE}, 4) AS y{j}"
        for j in range(_RP_OUT))
    raw = [f"list_dot_product(v, ["
           + ", ".join(str(s) for s in _RP_SIGNS[j])
           + f"]::DOUBLE[]) * {_RP_SCALE}" for j in range(_RP_OUT)]
    pn = " + ".join(f"({y}) * ({y})" for y in raw)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
             {ys},
           round(sqrt(list_dot_product(v, v)), 4) AS orig_norm,
           round(sqrt({pn}), 4) AS proj_norm,
           round(sqrt({pn}) / sqrt(list_dot_product(v, v)), 4) AS distortion
    FROM e
    """


@_register(
    "embedding_random_projection",
    _rp_oracle(),
    doc="Johnson-Lindenstrauss dimensionality reduction 64 -> 8 via a "
        "seeded Rademacher (+-1) projection: y_j = <v, s_j> / sqrt(8) "
        "with sign matrix derived from md5 parity DRIVER-SIDE and "
        "shipped as plan literals to both engines (the LSH hyperplane "
        "pattern) — no randomness at execution time, bit-reproducible "
        "across runs and engines. One scan, zero shuffles; at 100 TB "
        "the projection rides the corpus scan and cuts every downstream "
        "ANN/dedup GEMM's FLOPs and shuffle bytes 8x. The distortion "
        "column (proj_norm / orig_norm) is the JL quality audit the "
        "epsilon bound speaks about. Sequential-fold dot products mirror "
        "list_dot_product order; round(4) on every output is the proven "
        "cross-engine tolerance for 64-term double sums.",
)
def _q_embedding_random_projection(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    y_raw = []
    for j in range(_RP_OUT):
        arr = "array(" + ", ".join(
            f"{s}D" for s in _RP_SIGNS[j]) + ")"
        fold = (f"aggregate(zip_with(v, {arr}, (x, y) -> x * y), "
                f"CAST(0 AS DOUBLE), (acc, x) -> acc + x) * {_RP_SCALE}")
        y_raw.append(fold)
    pn = " + ".join(f"({y}) * ({y})" for y in y_raw)
    on = "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), " \
         "CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    return base.select(
        "vec_id",
        *[F.expr(f"round({y}, 4)").alias(f"y{j}")
          for j, y in enumerate(y_raw)],
        F.expr(f"round({on}, 4)").alias("orig_norm"),
        F.expr(f"round(sqrt({pn}), 4)").alias("proj_norm"),
        F.expr(f"round(sqrt({pn}) / {on}, 4)").alias("distortion"),
    )


@_register(
    "embedding_covariance",
    """
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT unnest(generate_series(0, 63)) AS d),
    cnt AS (SELECT count(*) AS n FROM e),
    sums AS (
      SELECT d.d AS d, sum(v[d.d + 1]) AS s
      FROM e CROSS JOIN dims d GROUP BY d.d
    ),
    pairs AS (SELECT a.d AS i, b.d AS j FROM dims a
              JOIN dims b ON b.d >= a.d),
    sxy AS (
      SELECT p.i, p.j, sum(v[p.i + 1] * v[p.j + 1]) AS sxy
      FROM e CROSS JOIN pairs p GROUP BY p.i, p.j
    )
    SELECT CAST(x.i AS INTEGER) AS i, CAST(x.j AS INTEGER) AS j,
           CAST(cnt.n AS BIGINT) AS n,
           round((x.sxy - si.s * sj.s / cnt.n) / (cnt.n - 1), 6) + 0.0
             AS cov
    FROM sxy x
    JOIN sums si ON si.d = x.i JOIN sums sj ON sj.d = x.j
    CROSS JOIN cnt
    """,
    doc="exact 64x64 feature covariance of the embedding corpus in one "
        "pass — the statistic behind PCA/whitening, embedding-drift "
        "monitors, and OPQ rotation training. The Spark plan is the "
        "map-side-combine shape (operators/similarity.py::"
        "covariance_matrix): every Arrow batch collapses to a D^2 "
        "partial Gram + per-dim sums IN the scan task via one BLAS "
        "call, so only O(partitions * D^2) scalars ever shuffle and "
        "the (i, j)-keyed final agg touches megabytes at any corpus "
        "scale; the mean correction finishes as column algebra, no "
        "collect. The oracle replays the same non-centered-Gram "
        "formula from a quadratic unnest — affordable at fixture "
        "scale, and the 6dp round absorbs cross-engine sum-order ulps.",
)
def _q_embedding_covariance(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        similarity.covariance_matrix(e, "embedding", dim=64)
        .select("i", "j", "n",
                # + 0.0 collapses IEEE -0.0 to +0.0 (a round() output for
                # tiny negatives) so both engines emit one zero sign
                (F.round("cov", 6) + F.lit(0.0)).alias("cov"))
    )


# ---------------------------------------------------------------------------
# Corpus composition / pairing / multimodal audio dedup
# ---------------------------------------------------------------------------

@_register(
    "corpus_source_overlap",
    f"""
    WITH sh AS (
      SELECT DISTINCT source, unnest({SQL_SHINGLES}) AS g FROM documents
    ),
    sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    ix AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(inter AS BIGINT) AS n_shared,
           round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
    FROM ix JOIN sz sa ON sa.source = ix.source_a
            JOIN sz sb ON sb.source = ix.source_b
    """,
    doc="cross-source contamination matrix: pairwise Jaccard overlap of "
        "the DISTINCT word-3-shingle vocabularies of every source pair — "
        "the audit run before mixing corpora (two 'independent' crawls "
        "sharing half their shingles would double-count on mixture "
        "weights and leak across train/eval splits). Scale shape: one "
        "scan shingles every doc, a (source, shingle) DISTINCT "
        "aggregate collapses the corpus to its per-source vocabulary "
        "(the only full-data shuffle), and the shingle-keyed self-join "
        "fan-out is bounded by #sources^2 PER SHINGLE no matter how "
        "often the shingle occurs in raw text — a boilerplate phrase in "
        "a billion docs is one vocabulary row per source, so the "
        "pair-count aggregate is O(V * S^2) worst case, never "
        "corpus-quadratic; the S x S result frame is tiny at any scale.",
)
def _q_corpus_source_overlap(spark, sf_dir):
    # Adjacency-set form (r17 — the supplier_pagerank derivation trick):
    # ONE g-keyed collect_set aggregate replaces the r16 shape's
    # (source, g) DISTINCT aggregate + vocabulary self-join on g —
    # collect_set dedups in-aggregate (map-side partials), the per-g
    # source set is bounded by #sources, and the pair fan-out is a
    # scan-side double-explode of each sorted set's i<j pairs (exactly
    # the source_a < source_b join predicate). Per-query exchanges:
    # spread + g-agg + sz-agg + pair-agg, vs spread + distinct-agg +
    # 2 self-join exchanges + pair-agg — and the self-join's vocabulary
    # fan-out never materializes. Same-session A/B at sf0.1: 1.33 ->
    # 0.94 s (0.70x), output frame-diff identical (190/190 rows).
    d = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    if dedup.scan_width(d) < n:  # ONE gated spread (the shingled() rule),
        d = d.repartition(n, "doc_id")  # not RR + id-barrier (2 exchanges)
    toked = d.select("source", texts.tokens(F.col("text")).alias("__toks"))
    ex = toked.select("source",
                      F.explode(texts.word_shingles_of(F.col("__toks")))
                      .alias("g"))
    ss = ex.groupBy("g").agg(F.array_sort(F.collect_set("source"))
                             .alias("ss"))
    sz = (ss.select(F.explode("ss").alias("source"))
          .groupBy("source").agg(F.count("*").alias("n")))
    pairs = (
        ss.filter(F.size("ss") >= 2)
        .select(F.explode(F.expr(
            "flatten(transform(ss, (a, i) -> "
            "transform(slice(ss, i + 2, size(ss) - i - 1), "
            "b2 -> struct(a AS sa, b2 AS sb))))")).alias("p"))
        .select(F.col("p.sa").alias("source_a"),
                F.col("p.sb").alias("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("inter")))
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select("source_a", "source_b",
                F.col("inter").cast("long").alias("n_shared"),
                F.round(F.col("inter") * F.lit(1.0)
                        / (F.col("na") + F.col("nb") - F.col("inter")), 4)
                 .alias("jaccard"))
    )


_NEG_BUCKETS, _NEG_K = 16, 3


@_register(
    "corpus_negative_sampling",
    f"""
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)),
                                 1, 15) AS BIGINT) AS hv
      FROM documents
    ),
    pos AS (
      SELECT doc_id, hv, hv % {_NEG_BUCKETS} AS bucket,
             row_number() OVER (PARTITION BY hv % {_NEG_BUCKETS}
                                ORDER BY hv, doc_id) AS rk,
             count(*) OVER (PARTITION BY hv % {_NEG_BUCKETS}) AS bs
      FROM h
    ),
    want AS (
      SELECT doc_id, bucket, bs, rk, j,
             (rk - 1 + j) % bs + 1 AS tgt
      FROM pos, unnest(generate_series(1, {_NEG_K})) AS t(j)
    )
    SELECT w.doc_id, CAST(w.j AS INTEGER) AS neg_rank,
           p2.doc_id AS neg_id
    FROM want w JOIN pos p2
      ON p2.bucket = w.bucket AND p2.rk = w.tgt
    WHERE p2.doc_id <> w.doc_id
    """,
    doc="deterministic negative sampling for contrastive training: each "
        "anchor doc gets k=3 pseudo-random negatives by walking a "
        "seeded-md5 hash ring WITHIN one of 16 hash buckets — "
        "reproducible across runs/engines (no RNG at execution time), "
        "uniform because the ring order is a keyed hash, and "
        "collision-free per anchor by construction (successive ring "
        "positions). Scale shape: the window sorts run PER BUCKET (the "
        "global-ring form would funnel the corpus through ONE sorted "
        "partition — the known window scale-killer), and the "
        "anchor->target resolution is a bucket+position equi-join, so "
        "every stage shuffles on bounded keys; raise the bucket count "
        "with corpus size to cap per-reducer sort volume.",
)
def _q_corpus_negative_sampling(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        hashing.hex_int(
            F.concat(F.lit("neg:"), F.col("doc_id").cast("string")))
        .alias("hv"))
    w = Window.partitionBy("bucket").orderBy("hv", "doc_id")
    pos = (h.withColumn("bucket", F.col("hv") % _NEG_BUCKETS)
           .withColumn("rk", F.row_number().over(w))
           .withColumn("bs", F.count("*").over(
               Window.partitionBy("bucket"))))
    want = (pos.select(
        "doc_id", "bucket", "bs", "rk",
        F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("j"))
        .withColumn("tgt", (F.col("rk") - 1 + F.col("j")) % F.col("bs") + 1))
    p2 = pos.select(F.col("bucket").alias("bucket2"),
                    F.col("rk").alias("rk2"),
                    F.col("doc_id").alias("neg_id"))
    return (
        want.join(p2, (F.col("bucket") == F.col("bucket2"))
                  & (F.col("tgt") == F.col("rk2")))
        .filter(F.col("neg_id") != F.col("doc_id"))
        .select("doc_id", F.col("j").cast("int").alias("neg_rank"), "neg_id")
    )


#: Audio synthesis constants shared by the Spark plan (real WAV bytes)
#: and the oracle (sample-rule replay): 1600 mono PCM16 frames at 8 kHz,
#: sample p of doc d = 256 * ((d % 5) * 20 + (p * 7) % 13).
_AU_N, _AU_RATE, _AU_WIN = 1600, 8000, 800


def _au_header() -> str:
    import struct as _s

    hdr = (b"RIFF" + _s.pack("<I", 36 + 2 * _AU_N) + b"WAVE"
           + b"fmt " + _s.pack("<I", 16)
           + _s.pack("<HHIIHH", 1, 1, _AU_RATE, 2 * _AU_RATE, 2, 16)
           + b"data" + _s.pack("<I", 2 * _AU_N))
    return hdr.decode("latin-1")


@_register(
    "multimodal_audio_fp_dedup",
    f"""
    WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, p // {_AU_WIN} AS w,
             (256.0 * ((doc_id % 5) * 20 + (p * 7) % 13)) / 32768.0 AS x
      FROM a, unnest(generate_series(0, {_AU_N - 1})) AS t(p)
    ),
    wrms AS (
      SELECT doc_id, w,
             CAST(least(floor(sqrt(sum(x * x) / {_AU_WIN}.0) * 64), 63)
                  AS INTEGER) AS code
      FROM px GROUP BY doc_id, w
    ),
    fp AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_windows,
             md5(string_agg(code::VARCHAR, ',' ORDER BY w)) AS fp_md5
      FROM wrms GROUP BY doc_id
    ),
    g AS (SELECT fp_md5, count(*) AS n_dups, min(doc_id) AS canonical
          FROM fp GROUP BY fp_md5)
    SELECT fp.doc_id, fp.n_windows, fp.fp_md5,
           CAST(g.n_dups AS INTEGER) AS n_dups,
           CAST(fp.doc_id = g.canonical AS INTEGER) AS is_canonical
    FROM fp JOIN g USING (fp_md5)
    """,
    doc="audio near-dup detection by acoustic fingerprint: every third "
        "doc synthesizes a REAL RIFF/WAVE PCM16 payload (byte-exact "
        "header built driver-side, samples by a deterministic doc_id%5 "
        "rule so identical clips recur), "
        "operators/multimodal.py::audio_fingerprint DECODES the actual "
        "bytes (numpy chunk-walk WAV parser, Arrow batches, bytes never "
        "shuffle), quantizes the 100 ms RMS envelope to 64 levels, and "
        "duplicate groups fall out of a hash groupBy on the code-string "
        "md5 — the audio analogue of multimodal_phash_dedup. The "
        "envelope math is drift-free by construction (dyadic-rational "
        "sample squares sum exactly in float64 under any order), so the "
        "oracle reproduces the codes from the synthesis rule alone and "
        "a green row proves the encode->parse->fingerprint round-trip.",
)
def _q_multimodal_audio_fp_dedup(spark, sf_dir):
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 3 == 0)
         .select("doc_id"))
    # The doc_id%5 synthesis rule admits only 5 DISTINCT payloads, so the
    # WAV bytes are built ONCE driver-side (KB-scale literals, same
    # bounded-metadata budget as the PQ codebooks) and picked per row by
    # residue — the r7 debut form instead ran a 1600-element char-concat
    # transform per ROW, ~2.6M JVM string ops at sf0.1 that profiled as
    # half the query's cost. The DECODE path stays per-row real work:
    # every clip's bytes still parse through the numpy WAV chunk walker.
    variants = [
        _au_header() + "".join(
            chr(0) + chr(v * 20 + (p * 7) % 13) for p in range(_AU_N))
        for v in range(5)
    ]
    payload = F.encode(
        F.element_at(F.array(*[F.lit(s) for s in variants]),
                     (F.col("doc_id") % 5 + 1).cast("int")),
        "ISO-8859-1")
    clips = d.select("doc_id", payload.alias("content"))
    fp = multimodal.audio_fingerprint(clips)
    fpm = fp.select("doc_id", "n_windows",
                    F.md5(F.encode("fp", "UTF-8")).alias("fp_md5"))
    g = (fpm.groupBy("fp_md5")
         .agg(F.count("*").cast("int").alias("n_dups"),
              F.min("doc_id").alias("canonical")))
    return (
        fpm.join(g, "fp_md5")
        .select("doc_id", "n_windows", "fp_md5", "n_dups",
                (F.col("doc_id") == F.col("canonical")).cast("int")
                .alias("is_canonical"))
    )


@_register(
    "text_tfidf_cosine_pairs",
    f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_WTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT doc_id, term, df, n_docs * 0.1 AS cap,
             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    norm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    wn AS (
      SELECT w.doc_id, w.term, w.df, w.cap, w.w / n.nrm AS u
      FROM w JOIN norm n ON n.doc_id = w.doc_id WHERE n.nrm > 0
    ),
    half AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(sum(a.u * b.u), 4) AS cosine,
             count(*) AS shared_terms
      FROM wn a JOIN wn b ON a.term = b.term AND a.doc_id < b.doc_id
      WHERE a.df >= 2 AND a.df <= a.cap AND b.df >= 2 AND b.df <= b.cap
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT * FROM half WHERE cosine >= 0.25
      UNION ALL
      SELECT doc_b, doc_a, cosine, shared_terms FROM half
      WHERE cosine >= 0.25
    )
    SELECT doc_a AS doc_id, doc_b AS nearest_doc, cosine,
           CAST(shared_terms AS BIGINT) AS shared_terms
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_a
                                   ORDER BY cosine DESC, doc_b) AS rn
      FROM pairs
    ) WHERE rn = 1
    """,
    doc="sparse TF-IDF cosine similarity join via an inverted index: "
        "per-doc L2-normalized tf-idf weights (smooth idf "
        "ln((N+1)/(df+1)), rounded to 6 before use so ulp-level ln() "
        "drift cannot propagate), posting lists self-joined on the TERM "
        "(never doc x doc), partial sums of u_a*u_b reduce map-side into "
        "the pair aggregate, and each doc keeps its single NEAREST "
        "neighbor (rounded cosine >= 0.25, doc-keyed top-1 window over "
        "the mirrored half-matrix) so output is one row per doc, not "
        "O(pairs). The lexical complement to dedup_embedding_cosine "
        "(dense GEMM) and dedup_ngram_jaccard (set overlap): same "
        "bucket-join scale shape — cost is sum over terms of "
        "df^2, so the hot spots are stop-terms, and the join carries "
        "BOTH prunes: df=1 terms (cannot form a pair — exactness-"
        "preserving) and the stop-term cap df <= 0.1*N (the "
        "approximation dial that makes the shape scale: on the fixture "
        "corpus it is output-invariant — planted near-dups share RARE "
        "terms — while cutting candidate postings 4.5M -> 625 at "
        "sf0.01 and 448M -> 62k at sf0.1; without it the join is "
        "quadratic in corpus size, measured as a >15-min bench "
        "timeout at sf0.1). Norms still cover ALL terms, so reported "
        "cosines are true-cosine lower bounds restricted to "
        "discriminative terms, not renormalized ones. The candidate "
        "join ships xxhash64 term keys (8-byte shuffle keys — the "
        "jaccard join's trick), made PROVABLY exact by the vocabulary's "
        "collided-hash frame (hashing.collided_hash_keys; empty on the "
        "fixtures and astronomically rare at any scale): a posting "
        "carries its term string only under a collided hash, and a "
        "null-safe residual equality decides those rows — uniquely-"
        "hashed postings ship zero string bytes. Norms divide once per "
        "posting, so the join ships already-normalized weights.",
)
def _q_text_tfidf_cosine_pairs(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(texts.tokenize_words(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = d.select(F.count("*").alias("n_docs"))
    w = (tf.join(dfreq, "term")
         .crossJoin(F.broadcast(ndocs))
         .select("doc_id", "term", "df",
                 (F.col("n_docs") * 0.1).alias("cap"),
                 F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0)
                                             / (F.col("df") + 1.0)), 6)
                 .alias("w")))
    norm = (w.groupBy("doc_id")
            .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    wn = (w.join(norm, "doc_id").filter(F.col("nrm") > 0)
          .select("doc_id", "term", "df", "cap",
                  (F.col("w") / F.col("nrm")).alias("u")))
    # The inverted-index self-join ships xxhash64 term keys (8-byte
    # longs, no strings through the shuffle — the jaccard_pairs_prefix
    # trick). Unlike the Jaccard op there is NO downstream verify to
    # absorb a collision (the joined rows feed the cosine sum directly),
    # so exactness comes from the vocabulary's collided hashes
    # (hashing.collided_hash_keys — normally EMPTY): a posting carries
    # its term string ONLY when its hash is collided (null otherwise,
    # zero shuffle bytes), and the join adds a null-safe residual
    # compare that is a no-op for uniquely-hashed keys and exact string
    # equality for collided ones.
    coll = hashing.collided_hash_keys(dfreq, "term")
    joinable = (
        wn.filter((F.col("df") >= 2) & (F.col("df") <= F.col("cap")))
        .withColumn("h", F.xxhash64("term"))
        .join(F.broadcast(coll.withColumn("__coll", F.lit(True))),
              "h", "left")
        .select("doc_id", "h", "u",
                F.when(F.col("__coll"), F.col("term")).alias("t2")))
    # Materialize the posting list before the self-join (r16): the
    # a/b diamond otherwise re-plans the WHOLE tf/df/norm derivation
    # per reference — the r15 plan held 75 shuffle exchanges, 92
    # aggregates and 28 document scans from the 2^k lineage fan-out.
    # A derived frame read k times should be materialized once (the
    # pagerank-edges rule); the lazy localCheckpoint's upstream stages
    # run at build time under AQE, inside run_query's timed span (see
    # _ckpt). Measured same-session A/B at sf0.1 (together with the
    # half-matrix checkpoint below):
    # 2.38 -> 1.82 s (0.76x), oracle parity re-proven at both SFs.
    joinable = _ckpt(joinable)
    a = joinable.select(F.col("doc_id").alias("doc_a"), "h",
                        F.col("t2").alias("ta"), F.col("u").alias("ua"))
    b = joinable.select(F.col("doc_id").alias("doc_b"), "h",
                        F.col("t2").alias("tb"), F.col("u").alias("ub"))
    half = (
        a.join(b, "h")
        .filter((F.col("doc_a") < F.col("doc_b"))
                & F.col("ta").eqNullSafe(F.col("tb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 4).alias("cosine"),
             F.count("*").alias("shared_terms"))
        .filter(F.col("cosine") >= 0.25)
    )
    # same rule for the mirrored union: half is read twice
    half = _ckpt(half)
    pairs = half.unionByName(
        half.select(F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"),
                    "cosine", "shared_terms"))
    nb = Window.partitionBy("doc_a").orderBy(F.col("cosine").desc(), "doc_b")
    return (
        pairs.withColumn("rn", F.row_number().over(nb))
        .filter(F.col("rn") == 1)
        .select(F.col("doc_a").alias("doc_id"),
                F.col("doc_b").alias("nearest_doc"),
                "cosine", "shared_terms")
    )


@_register(
    "corpus_weighted_reservoir",
    """
    WITH w AS (
      SELECT doc_id, greatest(n_chars, 1) AS wt,
             (CAST('0x' || substr(md5('wres:' || CAST(doc_id AS VARCHAR)),
                                  1, 15) AS BIGINT) + 1.0)
               / 1152921504606846977.0 AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, CAST(wt AS BIGINT) AS wt,
             round(-ln(u) / wt, 6) AS es_key
      FROM w
    )
    SELECT CAST(row_number() OVER (ORDER BY es_key, doc_id) AS INTEGER)
             AS rank,
           doc_id, wt, es_key
    FROM keyed ORDER BY es_key, doc_id LIMIT 25
    """,
    doc="weighted reservoir sampling without replacement (Efraimidis-"
        "Spirakis A-Res): each doc draws a deterministic uniform "
        "u=md5(doc_id)-based in (0,1], scores key=-ln(u)/weight "
        "(weight = n_chars, any importance score works), and the "
        "k=25 SMALLEST keys ARE a weighted sample without replacement "
        "— the one-pass, mergeable primitive behind 'give me k docs "
        "biased toward length/quality' that Bernoulli importance "
        "sampling (corpus_importance_sample) cannot do, because it "
        "fixes k exactly and never draws a doc twice. Plan: scan-side "
        "key algebra + TakeOrdered(k) — per-partition top-k heaps "
        "merge on the driver, no global sort, no shuffle of the "
        "corpus; at 100 TB every task ships exactly k candidate rows. "
        "Keys are ROUNDED to 6 before ranking (doc_id tiebreak) so "
        "ulp-level ln() drift between engines cannot flip the cutoff; "
        "u comes from 15 md5 hex digits + 1 over 2^60 + 1 — integer-"
        "exact, never zero.",
)
def _q_corpus_weighted_reservoir(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.functions import hashing

    d = _t(spark, sf_dir, "documents")
    wt = F.greatest(F.col("n_chars"), F.lit(1))
    u = ((hashing.hex_int(
        F.concat(F.lit("wres:"), F.col("doc_id").cast("string"))) + 1.0)
        / F.lit(1152921504606846977.0))
    keyed = d.select("doc_id", wt.cast("long").alias("wt"),
                     F.round(-F.log(u) / wt, 6).alias("es_key"))
    top = keyed.orderBy("es_key", "doc_id").limit(25)
    rk = Window.orderBy("es_key", "doc_id")
    return top.select(
        F.row_number().over(rk).cast("int").alias("rank"),
        "doc_id", "wt", "es_key")


@_register(
    "text_kl_drift",
    f"""
    WITH toks AS (
      SELECT doc_id % 2 AS side, unnest({SQL_WTOKS}) AS term
      FROM documents
    ),
    cnt AS (
      SELECT term,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cp,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cq
      FROM toks GROUP BY term
    ),
    tot AS (SELECT sum(cp) AS np, sum(cq) AS nq, count(*) AS v FROM cnt),
    probs AS (
      SELECT (cp + 1.0) / (np + v) AS p, (cq + 1.0) / (nq + v) AS q
      FROM cnt CROSS JOIN tot
    )
    SELECT round(sum(p * ln(p / q)), 6) AS kl_pq,
           round(sum(q * ln(q / p)), 6) AS kl_qp,
           round(sum(0.5 * p * ln(p / (0.5 * p + 0.5 * q))
                     + 0.5 * q * ln(q / (0.5 * p + 0.5 * q))), 6) AS js,
           CAST(max(v) AS BIGINT) AS vocab,
           CAST(max(np) AS BIGINT) AS n_tokens_p,
           CAST(max(nq) AS BIGINT) AS n_tokens_q
    FROM probs CROSS JOIN tot
    """,
    doc="corpus drift monitor: KL divergence (both directions) and the "
        "symmetric bounded Jensen-Shannon divergence between the "
        "add-one-smoothed unigram distributions of two corpus slices "
        "(doc_id parity here; source/snapshot/crawl-date in "
        "production) — the language-level complement to "
        "events_chisq_independence (categorical counts) and "
        "corpus_snapshot_diff (row identity): it answers 'did the "
        "WORDS change', the canary for crawl rot, template takeover, "
        "or a filter regression upstream of training. Plan: one "
        "explode -> term-keyed partial+final agg with both sides as "
        "conditional sums (one pass, one shuffle, vocab-sized result), "
        "a 3-scalar broadcast, then a scalar aggregate over the vocab "
        "frame; 100 TB of text reduces map-side to one (term, cp, cq) "
        "row per distinct term per task. Each engine sums ~vocab "
        "ln() terms in float64 (absolute drift ~1e-12) and rounds to "
        "6: the smoothed ratios are bounded away from 0/inf by "
        "construction.",
)
def _q_text_kl_drift(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(texts.tokenize_words(F.col("text"))).alias("term"))
    cnt = toks.groupBy("term").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cq"))
    tot = cnt.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq"),
                  F.count("*").alias("v"))
    p = (F.col("cp") + 1.0) / (F.col("np") + F.col("v"))
    q = (F.col("cq") + 1.0) / (F.col("nq") + F.col("v"))
    m = 0.5 * p + 0.5 * q
    return (
        cnt.crossJoin(F.broadcast(tot))
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_pq"),
             F.round(F.sum(q * F.log(q / p)), 6).alias("kl_qp"),
             F.round(F.sum(0.5 * p * F.log(p / m)
                           + 0.5 * q * F.log(q / m)), 6).alias("js"),
             F.max("v").cast("long").alias("vocab"),
             F.max("np").cast("long").alias("n_tokens_p"),
             F.max("nq").cast("long").alias("n_tokens_q"))
    )


@_register(
    "corpus_doremi_reweight",
    f"""
    WITH toks AS (
      SELECT source, unnest({SQL_WTOKS}) AS term FROM documents
    ),
    vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT sum(c) AS total FROM vocab),
    dom AS (
      SELECT source, count(*) AS n_tokens,
             -sum(ln(c * 1.0 / total)) / count(*) AS nll
      FROM toks JOIN vocab USING (term) CROSS JOIN tot
      GROUP BY source
    ),
    docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    base AS (
      SELECT d.source, docs.n_docs, d.n_tokens, d.nll,
             d.n_tokens * 1.0 / sum(d.n_tokens) OVER () AS share,
             sum(d.n_tokens * d.nll) OVER ()
               / sum(d.n_tokens) OVER () AS nll_bar
      FROM dom d JOIN docs USING (source)
    ),
    upd AS (
      SELECT source, n_docs, n_tokens, nll, share,
             share * exp(nll - nll_bar) AS raw
      FROM base
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(share, 6) AS old_share,
           round(nll, 6) AS avg_nll,
           round(raw / sum(raw) OVER (), 6) AS new_weight
    FROM upd
    """,
    doc="one DoReMi-style exponentiated-gradient step of domain "
        "reweighting: each source's proxy loss is its average per-token "
        "negative log-likelihood under the CORPUS unigram LM (domains "
        "whose text the aggregate model fits worst get upweighted — "
        "the excess-loss signal DoReMi computes with a reference "
        "model), and the new mixture weight is share * exp(nll - "
        "weighted_mean_nll), renormalized. Feeding corpus_mixture_"
        "sample / corpus_temperature_mixture with LEARNED weights "
        "instead of heuristic temperature closes the curation loop. "
        "Plan: one token explode, a term-keyed agg for the LM, a "
        "term-keyed join back (vocab-sized build side — broadcastable "
        "in production), a source-keyed agg to ~|domains| rows, and "
        "window algebra over that tiny frame; the token stream is "
        "touched once. ln/exp live on ~|domains| aggregates of "
        "float64 sums -> round(6) absorbs engine ulp drift.",
)
def _q_corpus_doremi_reweight(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        "source", F.explode(texts.tokenize_words(F.col("text"))).alias("term"))
    vocab = toks.groupBy("term").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").alias("total"))
    dom = (toks.join(vocab, "term")
           .crossJoin(F.broadcast(tot))
           .groupBy("source")
           .agg(F.count("*").alias("n_tokens"),
                (-F.sum(F.log(F.col("c") * 1.0 / F.col("total")))
                 / F.count("*")).alias("nll")))
    docs = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    wall = Window.partitionBy()
    base = (dom.join(docs, "source")
            .withColumn("share",
                        F.col("n_tokens") * 1.0
                        / F.sum("n_tokens").over(wall))
            .withColumn("nll_bar",
                        F.sum(F.col("n_tokens") * F.col("nll")).over(wall)
                        / F.sum("n_tokens").over(wall)))
    upd = base.withColumn(
        "raw", F.col("share") * F.exp(F.col("nll") - F.col("nll_bar")))
    return upd.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("share", 6).alias("old_share"),
        F.round("nll", 6).alias("avg_nll"),
        F.round(F.col("raw") / F.sum("raw").over(wall), 6)
        .alias("new_weight"))


# --- content-defined chunking (storage-dedup-stable chunk boundaries) -------

def _cdc_gear_sql() -> str:
    """The gear table as a DuckDB list literal indexed by ascii code + 1
    (codes outside the normalized alphabet never occur; their slots are
    0) — the same table functions/texts.py::_cdc_gear builds, so both
    engines fold identical values."""
    table = [0] * 123
    for c, g in texts._cdc_gear().items():
        table[ord(c)] = g
    return "[" + ", ".join(str(g) for g in table) + "]"


@_register(
    "doc_cdc_chunks",
    f"""
    WITH RECURSIVE
    c AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array({SQL_NORM}, ''),
                           x -> x != ''),
               x -> CAST(ascii(x) AS BIGINT)) AS codes
      FROM documents
    ),
    ga AS (SELECT {{gear}} AS garr),
    cuts(doc_id, pos) AS (
      SELECT doc_id, 0 FROM c WHERE len(codes) > 0
      UNION ALL
      SELECT s.doc_id, s.nxt FROM (
        SELECT k.doc_id,
               k.pos + coalesce(list_min(list_filter(
                 list_transform(generate_series(32, 127), d -> d),
                 d -> k.pos + d <= len(c.codes)
                      AND list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                                         c.codes[k.pos+1 : k.pos+d]),
                            (acc, x) ->
                              (acc * 2 + ga.garr[CAST(x + 1 AS INTEGER)])
                              % 2147483648) % 64 = 0)), 128) AS nxt,
               len(c.codes) AS n
        FROM cuts k JOIN c USING (doc_id) CROSS JOIN ga
      ) s
      WHERE s.nxt < s.n
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(max(pos) AS INTEGER) AS last_start,
           md5(array_to_string(list_sort(list(pos)), ',')) AS bounds_md5
    FROM cuts GROUP BY doc_id
    """.replace("{gear}", _cdc_gear_sql()),
    doc="content-defined chunking (FastCDC/gear): rolling gear hash "
        "h = (2h + gear[c]) mod 2^31 over the normalized text, cut when "
        "h % 64 == 0 past 32 chars (128 forces), boundaries re-emitted "
        "as chunk START offsets. Unlike fixed-stride spans "
        "(dedup_exact_spans), INSERTING text re-synchronizes within "
        "~31 chars + min_len, so unchanged tails keep identical chunks "
        "— the storage-dedup / incremental-crawl reuse primitive. Spark "
        "side is ONE scan-side O(n) aggregate fold per document (no "
        "shuffle at all until the final per-doc projection); the "
        "bounds md5 proves the boundary SETS are byte-identical "
        "cross-engine. The oracle replays the same fold as a recursive "
        "chunk-frontier CTE (per-chunk re-fold, O(max_len^2) per chunk "
        "— fixture-scale only, the measure not the plan) "
        "(functions/texts.py::cdc_boundaries).",
)
def _q_doc_cdc_chunks(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = texts.normalize(F.col("text"))
    # Arrow gear fold (r17): dedup.cdc_boundary_table vectorizes the
    # interpreted struct-accumulator fold in NumPy (frame-identical,
    # integer math) — see the operator docstring; A/B in
    # OPTIMIZATION_r17.md.
    b = dedup.cdc_boundary_table(d.filter(F.length(norm) > 0)) \
        .withColumnRenamed("id", "doc_id")
    return b.select(
        "doc_id",
        F.size("bs").cast("int").alias("n_chunks"),
        F.element_at("bs", -1).cast("int").alias("last_start"),
        F.md5(F.encode(F.concat_ws(",", F.transform(
            "bs", lambda x: x.cast("string"))), "UTF-8")).alias("bounds_md5"),
    )


@_register(
    "corpus_vocab_growth",
    f"""
    WITH rng AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
                 FROM documents),
    d AS (
      SELECT doc_id,
             ((doc_id - rng.lo) * 8) // (rng.hi - rng.lo + 1) AS b,
             {SQL_TOKS} AS toks
      FROM documents, rng
    ),
    tok_b AS (
      SELECT b, max(doc_id) AS hi_id, count(*) AS nd,
             sum(len(toks)) AS nt
      FROM d GROUP BY b
    ),
    firsts AS (
      SELECT ((fid - rng.lo) * 8) // (rng.hi - rng.lo + 1) AS b,
             count(*) AS nv
      FROM (SELECT min(doc_id) AS fid
            FROM (SELECT doc_id, unnest(toks) AS t FROM d)
            GROUP BY t), rng
      GROUP BY 1
    )
    SELECT CAST(tok_b.b + 1 AS INTEGER) AS checkpoint,
           CAST(hi_id AS BIGINT) AS hi_id,
           CAST(sum(nd) OVER w AS BIGINT) AS n_docs_cum,
           CAST(sum(nt) OVER w AS BIGINT) AS n_tokens_cum,
           CAST(sum(coalesce(nv, 0)) OVER w AS BIGINT) AS vocab_cum
    FROM tok_b LEFT JOIN firsts ON tok_b.b = firsts.b
    WINDOW w AS (ORDER BY tok_b.b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Heaps-law vocabulary-growth curve: walking the corpus in id "
        "order, cumulative distinct vocabulary vs cumulative tokens at "
        "8 id-range checkpoints — the tokenizer/vocab-sizing and "
        "crawl-saturation primitive (a flattening curve means new data "
        "has stopped contributing new words). Scale shape: checkpoint "
        "= scan-side integer math from ONE broadcast (min,max) scalar "
        "(no ntile range exchange over the corpus), cumulative vocab "
        "via the first-occurrence trick (min doc id per term — one "
        "term-keyed aggregate, the text_ngram_novelty precedent), and "
        "the running sum runs over the <=8-row checkpoint frame, never "
        "the data — every post-scan frame is bounded by the checkpoint "
        "count at any corpus size; all-integer output, no float "
        "surface (operators/dedup.py::vocab_growth_curve).",
)
def _q_corpus_vocab_growth(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    return dedup.vocab_growth_curve(d, checkpoints=8)


@_register(
    "corpus_split_accounting",
    f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN len({SQL_TOKS}) > 0
                  THEN 1.0 / (1.0 + exp(-({_QC_W['bias']}
                    + {_QC_W['stop']} * (len(list_filter({SQL_TOKS},
                        t -> list_contains({_SQL_STOPS}, t))) * 1.0
                        / len({SQL_TOKS}))
                    + {_QC_W['punct']} * ((length(lower(text))
                        - length(regexp_replace(lower(text),
                                 '[^a-z0-9 ]', '', 'g')))
                        * 1.0 / length(text))
                    + {_QC_W['alen']} * (length(replace(text, ' ', ''))
                        * 1.0 / len({SQL_TOKS}))
                    + {_QC_W['lntok']} * ln(len({SQL_TOKS})))))
             END AS score
      FROM documents
    ),
    r AS (SELECT doc_id, coalesce(score >= 0.5, FALSE) AS keep FROM s)
    SELECT keep,
           CAST(count(*) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY CAST(doc_id AS VARCHAR))) AS ids_md5
    FROM r GROUP BY keep
    """,
    doc="dead-letter split accounting — the BATCH twin of the streaming "
        "quality gate + split sink (streaming/pipeline.py::"
        "quality_gate_stream -> run_split_sink): the sink's exact "
        "routing predicate (keep = sigmoid-score >= 0.5, empty/null "
        "docs -> reject) applied to the corpus, then per side n_docs + "
        "an md5 over the sorted doc-id list — proving MEMBERSHIP of "
        "each side, not just counts (a doc swapped between sides with "
        "counts preserved still flips the hash). The builder calls the "
        "streaming module's own gate function (batch and stream share "
        "one code path — the batch-stream parity test's guarantee, now "
        "with a graded row). Scan-side score algebra + ONE 2-group "
        "aggregate; the collect_list rides the groupBy shuffle and is "
        "bounded by the corpus id list per side — at 100 TB swap the "
        "md5-of-list membership proof for a commutative checksum "
        "(sum of per-id hashes) to keep state bounded; counts and "
        "routing are scale-free as-is.",
)
def _q_corpus_split_accounting(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.streaming import (
        pipeline as _streaming,
    )

    d = _spread(_t(spark, sf_dir, "documents"))
    gated = _streaming.quality_gate_stream(d)
    return (gated.groupBy("keep")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.md5(F.encode(F.concat_ws(",", F.sort_array(
                     F.collect_list(F.col("doc_id").cast("string")))),
                     "UTF-8")).alias("ids_md5")))


def _kmeans_unrolled_sql(k: int, iters: int, dim: int) -> str:
    """The kmeans_lloyd oracle: ORDER BY id LIMIT k init, then per
    iteration one assignment CTE (row_number argmin over the vector x
    centroid cross join — smallest-cell ties) and one update CTE
    (per-dim AVG rounded to 6 — the same short-decimal handoff the
    Spark trainer re-broadcasts); empty cells carry the previous
    centroid forward. The supplier_pagerank unrolled-CTE precedent:
    the oracle replays the distributed trainer's iterations verbatim,
    viable only at fixture scale (cross join), while the Spark plan is
    one scan + one cell-keyed aggregate per iteration."""
    dist = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(generate_series(1, {dim}), "
            "i -> (v[i] - c[i]) * (v[i] - c[i]))), (a, x) -> a + x)"
            .format(dim=dim))
    sql = [f"""
WITH base AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
         list_transform(v, x -> round(x, 6)) AS c
  FROM (SELECT id, v FROM base ORDER BY id LIMIT {k})
)"""]
    prev = "c0"
    for r in range(1, iters + 1):
        sql.append(f""",
a{r} AS (
  SELECT id, v, cell, d FROM (
    SELECT b.id, b.v, {prev}.cell,
           {dist.replace('c[i]', f'{prev}.c[i]')} AS d,
           row_number() OVER (PARTITION BY b.id
                              ORDER BY {dist.replace('c[i]', f'{prev}.c[i]')},
                                       {prev}.cell) AS rn
    FROM base b CROSS JOIN {prev}
  ) WHERE rn = 1
),
c{r} AS (
  SELECT cell, list(m ORDER BY i) AS c FROM (
    SELECT cell, i, round(avg(v[i]), 6) AS m
    FROM a{r}, unnest(generate_series(1, {dim})) AS t(i)
    GROUP BY cell, i
  ) GROUP BY cell
  UNION ALL
  SELECT p.cell, p.c FROM {prev} p
  WHERE p.cell NOT IN (SELECT DISTINCT cell FROM a{r})
)""")
        prev = f"c{r}"
    sql.append(f"""
SELECT b.id, fin.cell, round(fin.d, 6) AS dist FROM (
  SELECT b2.id AS id, {prev}.cell,
         {dist.replace('v[i]', 'b2.v[i]').replace('c[i]', f'{prev}.c[i]')} AS d,
         row_number() OVER (PARTITION BY b2.id
                            ORDER BY {dist.replace('v[i]', 'b2.v[i]').replace('c[i]', f'{prev}.c[i]')},
                                     {prev}.cell) AS rn
  FROM base b2 CROSS JOIN {prev}
) fin JOIN base b ON b.id = fin.id
WHERE fin.rn = 1""")
    return "".join(sql)


@_register(
    "embeddings_kmeans_lloyd",
    _kmeans_unrolled_sql(k=4, iters=2, dim=64),
    doc="fully DISTRIBUTED Lloyd's k-means over the embedding corpus "
        "(k=4, 2 iterations, squared L2): the scale path past the "
        "driver-sample IVF trainer — assignment is an argmin over k "
        "scan-side literal squared-L2 folds (smallest-cell ties), the "
        "update is ONE cell-keyed (count, dim-sums) partial+final "
        "aggregate per iteration, and the driver only ever holds the "
        "k x dim centroid floats, each coordinate rounded HALF AWAY "
        "FROM ZERO to 6dp before re-broadcast so every handoff is a "
        "short exact decimal. Output = final per-vector (id, cell, "
        "dist) — agreement on every assignment and distance implies "
        "the centroids. The oracle unrolls the 2 iterations as "
        "assignment+update CTE pairs over a cross join (fixture-scale "
        "only; the Spark plan never pairs vectors with more than the "
        "k literal centroids) "
        "(operators/similarity.py::kmeans_lloyd).",
)
def _q_embeddings_kmeans_lloyd(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    _, assign = similarity.kmeans_lloyd(emb, k=4, iters=2, dim=64)
    return assign


def _pca_power_unrolled_sql(dim: int, iters: int) -> str:
    """The embedding_pca_power oracle: the covariance CTE shape shared
    with embedding_covariance, snapped to the 1e-6 integer grid, then
    ``iters`` EXACT-integer power-iteration CTE pairs (w = C_int . v as
    BIGINT sums; rescale round(w * 1e6 / max|w|) — IEEE-deterministic
    on exact-integer operands), then the per-vector centered projection
    as an ordered list_reduce fold matching Spark's zip_with fold
    order. Unlike the kmeans oracle (rounded-decimal handoffs), the
    iteration here replays EXACTLY by integer construction; only the
    initial cov/mean snapping and the final score carry the standard
    measure-zero rounding surface."""
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           FROM embeddings),
dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS d),
cnt AS (SELECT count(*) AS n FROM e),
sums AS (
  SELECT d.d AS d, sum(v[d.d + 1]) AS s
  FROM e CROSS JOIN dims d GROUP BY d.d
),
mus AS (SELECT list(round(s / cnt.n, 6) ORDER BY d) AS mu
        FROM sums CROSS JOIN cnt),
pairs AS (SELECT a.d AS i, b.d AS j FROM dims a
          JOIN dims b ON b.d >= a.d),
sxy AS (
  SELECT p.i, p.j, sum(v[p.i + 1] * v[p.j + 1]) AS sxy
  FROM e CROSS JOIN pairs p GROUP BY p.i, p.j
),
covi AS (
  SELECT x.i, x.j,
         CAST(round((x.sxy - si.s * sj.s / cnt.n) / (cnt.n - 1)
                    * 1000000.0) AS BIGINT) AS c
  FROM sxy x
  JOIN sums si ON si.d = x.i JOIN sums sj ON sj.d = x.j
  CROSS JOIN cnt
),
covf AS (SELECT i, j, c FROM covi
         UNION ALL
         SELECT j AS i, i AS j, c FROM covi WHERE i < j),
v0 AS (SELECT d, CAST(1000000 AS BIGINT) AS x FROM dims)""" + "".join(f""",
w{r} AS (SELECT f.i AS d, CAST(sum(f.c * v.x) AS BIGINT) AS w
         FROM covf f JOIN v{r - 1} v ON v.d = f.j GROUP BY f.i),
v{r} AS (SELECT d, CAST(round(w * 1000000.0 /
                   (SELECT max(abs(w)) FROM w{r})) AS BIGINT) AS x
         FROM w{r})""" for r in range(1, iters + 1)) + f""",
wl AS (SELECT list(CAST(x AS DOUBLE) ORDER BY d) AS w FROM v{iters})
SELECT id,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, {dim}),
                 i -> (v[i] - mu[i]) * w[i])),
             (acc, x) -> acc + x) / 1000000.0, 6) AS pc1_score
FROM e CROSS JOIN mus CROSS JOIN wl"""


@_register(
    "embedding_pca_power",
    _pca_power_unrolled_sql(dim=64, iters=4),
    doc="distributed top-principal-component scores over the embedding "
        "corpus (4 power-iteration steps on the exact covariance, "
        "squared-L2 geometry): ONE covariance pass (the map-side-"
        "combine D^2 aggregate graded as embedding_covariance), the "
        "64x64 matrix snapped to a 1e-6 INTEGER grid on the driver "
        "(bounded metadata — the kmeans_lloyd precedent), power "
        "iteration in EXACT int64 arithmetic with round(w * 1e6 / "
        "max|w|) grid rescaling (bit-identical in any engine — the "
        "handoff is exact by construction, not by rounding), then one "
        "scan projecting every vector onto the learned direction via "
        "an ordered zip_with fold against the broadcast per-dim means. "
        "pc1 scores feed drift monitors, whitening, coreset strata, "
        "and OPQ-style rotations; at 100 TB both passes are "
        "scan-shaped with only D^2 partials shuffling "
        "(operators/similarity.py::pca_power).",
)
def _q_embedding_pca_power(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    _, scores = similarity.pca_power(e, dim=64, iters=4)
    return scores


_BM25_TERMS = ("spark", "vector", "dup", "scan")


def _bm25_scores_cte(terms=_BM25_TERMS, k1="1.2", b_c="0.75") -> str:
    """CTE chain ending in ``bm25s(doc_id, bm25, n_terms)`` — shared by
    the plain top-k query and the RRF hybrid fusion."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""base AS (SELECT doc_id, len({SQL_TOKS}) AS dl FROM documents),
    s AS (SELECT count(*) AS nd,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM base),
    tf AS (SELECT doc_id, t AS term, count(*) AS tf, min(dl) AS dl
           FROM (SELECT doc_id, dl, unnest({SQL_TOKS}) AS t
                 FROM documents JOIN base USING (doc_id))
           WHERE t IN ({tlist})
           GROUP BY doc_id, t),
    d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm25s AS (SELECT tf.doc_id,
           round(sum(ln(1.0 + (s.nd - d.df + 0.5) / (d.df + 0.5))
                     * tf.tf * ({k1} + 1.0)
                     / (tf.tf + {k1} * (1.0 - {b_c}
                                        + {b_c} * tf.dl / s.avgdl))),
                 6) AS bm25,
           count(*) AS n_terms
    FROM tf JOIN d USING (term) CROSS JOIN s
    GROUP BY tf.doc_id)"""


def _bm25_sql(terms=_BM25_TERMS, k1="1.2", b_c="0.75", k=15) -> str:
    return f"""
    WITH {_bm25_scores_cte(terms, k1, b_c)}
    SELECT doc_id, bm25, n_terms
    FROM bm25s
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """


@_register(
    "text_bm25_topk",
    _bm25_sql(),
    doc="BM25 top-k retrieval over the document corpus for a fixed query "
        "term set (k1=1.2, b=0.75) — the lexical-retrieval primitive "
        "behind decontamination probes, dedup candidate generation, and "
        "RAG-corpus indexing. Scale shape: doc length is computed SCAN-"
        "side and carried through the explode (no join-back to a lengths "
        "frame); the token explode is pre-filtered to the query terms so "
        "the (doc, term) aggregate shuffles only matching postings; df "
        "(<= |q| rows) and the corpus stats (1 row, integer-exact "
        "sum/count avgdl) broadcast back onto the postings; the final "
        "per-doc score is one partial+final aggregate + TakeOrdered k. "
        "Ordering ties break on the 6-dp ROUNDED score then doc_id, so "
        "the k-boundary is cross-engine deterministic.",
)
def _q_text_bm25_topk(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    return (_bm25_scored(d)
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(15))


def _bm25_per_doc(d, quality: bool = False):
    """Single-scan per-doc BM25 inputs (r17, guide §2 shuffle removal +
    §6 one pass): ONE tokenize pass emits a NARROW per-doc row
    (doc_id, __dl, __tf0..__tfN[, __q]) — each query term's tf is
    ``size(toks) - size(array_remove(toks, term))``, native collection
    expressions, so there is no explode, no (doc, term) shuffle, and no
    re-derivation of the tokenize subtree for the df / corpus-stats /
    quality branches (the old shape planned the tokenizer 3x for bm25
    alone, 4x with the RRF quality branch — each a full corpus pass at
    100 TB). The frame is materialized via _ckpt: corpus-LENGTH but
    ~50 bytes/doc (the tfidf posting-list class, r16 verdict note), and
    every consumer reads it instead of replanning the scan. ``quality``
    additionally carries the rounded quality-classifier score (guarded
    on __dl > 0: ANSI division) so the RRF hybrid's second ranking
    rides the same single pass."""
    toks = texts.tokens(F.col("text"))
    base = d.select("doc_id", "text", toks.alias("__toks"))
    cols = [F.col("doc_id"), F.size("__toks").cast("long").alias("__dl")]
    for i, t in enumerate(_BM25_TERMS):
        cols.append((F.size("__toks")
                     - F.size(F.array_remove("__toks", t)))
                    .cast("long").alias(f"__tf{i}"))
    if quality:
        score = texts.quality_score_of(F.col("text"), F.col("__toks"))
        cols.append(F.when(F.size("__toks") > 0,
                           F.round(score, 4)).alias("__q"))
    return _ckpt(base.select(*cols))


def _bm25_from_per_doc(per, k1: float = 1.2, b_c: float = 0.75):
    """(doc_id, bm25, n_terms) from the single-scan per-doc frame: the
    corpus stats (nd, avgdl) and every term's document frequency come
    out of ONE global aggregate broadcast back as a 1-row frame, and
    the score is scan-side algebra over the tf columns (same
    expressions as the old (doc, term)-row form, summed in fixed
    _BM25_TERMS order; a term the doc lacks contributes an exact
    +0.0)."""
    ts = range(len(_BM25_TERMS))
    stats = per.agg(
        F.count(F.lit(1)).alias("__nd"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        *[F.count_if(F.col(f"__tf{i}") > 0).alias(f"__df{i}") for i in ts])
    matched = None
    for i in ts:
        hit = F.col(f"__tf{i}") > 0
        matched = hit if matched is None else (matched | hit)
    scored = per.filter(matched).crossJoin(F.broadcast(stats))
    bm25 = None
    n_terms = None
    for i in ts:
        tf, df_t = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = F.log(1.0 + (F.col("__nd") - df_t + 0.5) / (df_t + 0.5))
        s = (idf * tf * (F.lit(k1) + 1.0)
             / (tf + F.lit(k1) * (F.lit(1.0) - F.lit(b_c)
                                  + F.lit(b_c) * F.col("__dl")
                                  / F.col("__avgdl"))))
        s = F.when(tf > 0, s).otherwise(F.lit(0.0))
        hit = F.when(tf > 0, 1).otherwise(0)
        bm25 = s if bm25 is None else (bm25 + s)
        n_terms = hit if n_terms is None else (n_terms + hit)
    return scored.select(
        "doc_id", F.round(bm25, 6).alias("bm25"),
        n_terms.cast("long").alias("n_terms"))


def _bm25_scored(d, k1: float = 1.2, b_c: float = 0.75):
    """(doc_id, bm25, n_terms) for every doc matching >= 1 query term —
    the Spark twin of the ``bm25s`` CTE, single-scan form (r17)."""
    return _bm25_from_per_doc(_bm25_per_doc(d), k1, b_c)


_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@_register(
    "text_rrf_hybrid",
    f"""
    WITH {_bm25_scores_cte()},
    f AS (
      SELECT doc_id,
             len({SQL_TOKS}) AS n_tokens,
             len(list_filter({SQL_TOKS},
                 t -> list_contains({_SQL_STOPS}, t))) * 1.0
               / len({SQL_TOKS}) AS stop_r,
             (length(lower(text))
              - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
               * 1.0 / length(text) AS punct_r,
             length(replace(text, ' ', '')) * 1.0
               / len({SQL_TOKS}) AS alen
      FROM documents WHERE len({SQL_TOKS}) > 0
    ),
    q AS (SELECT doc_id,
                 round(1.0 / (1.0 + exp(-({_QC_W['bias']}
                       + {_QC_W['stop']} * stop_r
                       + {_QC_W['punct']} * punct_r
                       + {_QC_W['alen']} * alen
                       + {_QC_W['lntok']} * ln(n_tokens)))), 4) AS score
          FROM f),
    br AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                       AS INTEGER) AS rank_bm25
           FROM (SELECT * FROM bm25s ORDER BY bm25 DESC, doc_id LIMIT 50)),
    qr AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                       AS INTEGER) AS rank_quality
           FROM (SELECT * FROM q ORDER BY score DESC, doc_id LIMIT 50))
    SELECT doc_id, rank_bm25, rank_quality,
           round(coalesce(1.0 / ({_RRF_K} + rank_bm25), 0.0)
                 + coalesce(1.0 / ({_RRF_K} + rank_quality), 0.0), 6) AS rrf
    FROM br FULL OUTER JOIN qr USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 15
    """,
    doc="reciprocal-rank fusion of two retrieval rankings (BM25 lexical "
        "top-50 for the fixed query x linear quality-classifier top-50), "
        "k=60 — the standard hybrid-search combiner (lexical + prior "
        "here; lexical + ANN cosine is the same plan with the vector "
        "ranking swapped in). Scale shape: each ranking is TakeOrdered "
        "50 then row_number over its own 50-row frame; the fusion is a "
        "full outer join of two <= 50-row frames + TakeOrdered 15 — "
        "every post-scan frame is candidate-bounded. Rank ties break on "
        "the ROUNDED scores then doc_id, so both lists and the fused "
        "k-boundary are cross-engine deterministic.",
)
def _q_text_rrf_hybrid(spark, sf_dir):
    # ONE tokenize pass feeds BOTH rankings (r17): the per-doc frame
    # carries bm25 tf inputs and the quality score, so the two
    # TakeOrdered-50 branches and the corpus-stats aggregate all read
    # the same materialized ~50 B/doc frame (was: 4 full scan+tokenize
    # subtrees — tf, df, stats, quality).
    d = _spread(_t(spark, sf_dir, "documents"))
    per = _bm25_per_doc(d, quality=True)
    bm50 = (_bm25_from_per_doc(per)
            .orderBy(F.desc("bm25"), "doc_id").limit(50)
            .select("doc_id",
                    F.row_number().over(
                        Window.orderBy(F.desc("bm25"), "doc_id"))
                     .alias("rank_bm25")))
    q50 = (per.filter(F.col("__dl") > 0)
           .select("doc_id", F.col("__q").alias("__score"))
           .orderBy(F.desc("__score"), "doc_id").limit(50)
           .select("doc_id",
                   F.row_number().over(
                       Window.orderBy(F.desc("__score"), "doc_id"))
                    .alias("rank_quality")))
    fused = bm50.join(q50, "doc_id", "full_outer")
    rrf = (F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_bm25")),
                      F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_quality")),
                        F.lit(0.0)))
    return (fused.select("doc_id", "rank_bm25", "rank_quality",
                         F.round(rrf, 6).alias("rrf"))
            .orderBy(F.desc("rrf"), "doc_id")
            .limit(15))


def _silhouette_sql(dim: int = 64) -> str:
    sq = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
          f"list_transform(generate_series(1, {dim}), "
          "i -> (b.v[i] - c.c[i]) * (b.v[i] - c.c[i]))), (a, x) -> a + x)")
    return f"""
    WITH base AS (SELECT vec_id, label,
                         list_transform(embedding, x -> CAST(x AS DOUBLE))
                           AS v
                  FROM embeddings),
    c AS (SELECT label AS clbl, list(m ORDER BY i) AS c FROM (
            SELECT label, i, round(avg(v[i]), 6) AS m
            FROM base, unnest(generate_series(1, {dim})) AS t(i)
            GROUP BY label, i) GROUP BY label),
    d AS (SELECT b.vec_id, b.label, c.clbl, {sq} AS dist
          FROM base b CROSS JOIN c),
    p AS (SELECT vec_id, label,
                 max(CASE WHEN clbl = label THEN dist END) AS a,
                 min(CASE WHEN clbl <> label THEN dist END) AS bd
          FROM d GROUP BY vec_id, label),
    s AS (SELECT label, CASE WHEN greatest(a, bd) > 0
                             THEN (bd - a) / greatest(a, bd)
                             ELSE 0.0 END AS sil
          FROM p),
    g AS (SELECT label, count(*) AS n, sum(sil) AS ssum
          FROM s GROUP BY label)
    SELECT label, n, round(ssum / n, 6) AS avg_sil,
           round(sum(ssum) OVER () / sum(n) OVER (), 6) AS avg_sil_overall
    FROM g
    """


@_register(
    "embedding_silhouette",
    _silhouette_sql(dim=64),
    doc="simplified (centroid) silhouette of the labeled embedding "
        "corpus: per vector a = squared-L2 to its own label centroid, "
        "b = min to any other, s = (b - a)/max(a, b); per-label and "
        "corpus averages — the cluster-quality audit at linear cost "
        "(exact silhouette is all-pairs). kmeans_lloyd choreography: "
        "ONE (label)-keyed dim-sums aggregate -> k x dim driver floats "
        "rounded half-away to 6dp -> literal scan-side folds, scoring "
        "is a pure projection; the oracle recomputes the same rounded "
        "centroids in SQL and replays the fold order exactly "
        "(operators/similarity.py::silhouette_by_label).",
)
def _q_embedding_silhouette(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.silhouette_by_label(emb, dim=64)
