"""Unit tests for the dedup ladder on hand-built corpora with known answers."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import dedup

DOC = ("the quick brown fox jumps over the lazy dog and then runs far away "
       "to the deep green forest where it hides under a tall old tree")
NEAR = DOC.replace("lazy", "sleepy")  # one token differs
OTHER = ("completely different words about spark query engines shuffles "
         "joins aggregations windows and columnar parquet storage layers")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, DOC),
        (1, DOC + "!"),          # same after normalization -> exact dup of 0
        (2, NEAR),               # near-dup of 0
        (3, OTHER),              # unrelated
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs).collect())
    assert kept == [0, 2, 3]  # doc 1 collapses into doc 0


def test_jaccard_pairs_finds_near_dup(docs):
    sh = dedup.shingled(docs)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.jaccard_pairs(sh, 0.5).collect()}
    # shingling is over RAW tokens ("dog!" != "dog"), so the trailing "!"
    # on doc 1 perturbs its last shingles: high jaccard, not 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.9
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_prefix_filter_equals_direct_jaccard(spark):
    """Prefix filtering must be lossless: same pairs, same scores as the
    direct inverted-index join, across thresholds and a corpus with dup
    clusters, overlaps, and singletons."""
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(30):
        start = (d * 3) % 25
        toks = words[start:start + 12]
        if d % 5 == 0:
            toks = toks[:-1] + ["alt"]  # near-dup of its cluster
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingled(docs)
    for t in (0.5, 0.8):
        direct = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
                  for r in dedup.jaccard_pairs(sh, t).collect()}
        prefix = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
                  for r in dedup.jaccard_pairs_prefix(sh, t).collect()}
        assert direct == prefix
        assert direct  # non-vacuous: the corpus does contain qualifying pairs


def test_stop_shingle_cap_never_binds_on_fixture(spark):
    """The stop-shingle doc-frequency cap (the k²-fan-out guard at scale)
    must be a NO-OP on the driver fixture — otherwise the registered
    query would diverge from its all-pairs DuckDB oracle. Asserts both
    the df headroom and result equality with the cap disabled."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.sources import catalog

    d = catalog.load_table(spark, "documents", "/root/testdata/sf0.001")
    sh = dedup.shingled(d)
    t = 0.8
    pfx = sh.select(
        "id",
        F.explode(F.slice(
            F.array_sort("sh"), 1,
            F.col("sz") - F.ceil(F.lit(t) * F.col("sz")).cast("int") + 1,
        )).alias("g"))
    max_df = (pfx.groupBy("g").agg(F.count("*").alias("df"))
              .agg(F.max("df")).first()[0])
    assert max_df <= 50 // 2, f"fixture max prefix df {max_df} eats cap headroom"
    capped = {(r["id_a"], r["id_b"]) for r in
              dedup.jaccard_pairs_prefix(sh, t, stop_df_cap=50).collect()}
    uncapped = {(r["id_a"], r["id_b"]) for r in
                dedup.jaccard_pairs_prefix(sh, t, stop_df_cap=None).collect()}
    assert capped == uncapped

    # The cap DOES bind when set below a hot shingle's df: every doc
    # sharing only boilerplate loses its candidates.
    rows = [(i, "common boiler plate header text " + f"unique{i} u{i} v{i}")
            for i in range(20)]
    boiler = dedup.shingled(spark.createDataFrame(rows, ["doc_id", "text"]))
    some = dedup.jaccard_pairs_prefix(boiler, 0.3, stop_df_cap=None)
    capped_out = dedup.jaccard_pairs_prefix(boiler, 0.3, stop_df_cap=3)
    assert some.count() > 0 and capped_out.count() < some.count()


def test_capped_positional_filter_keeps_boilerplate_heavy_pair(spark):
    """Regression (r5 advice): with stop_df_cap binding, positions refer
    to the full sorted array, so a qualifying pair whose shared prefix is
    mostly capped boilerplate plus ONE rare late-prefix shingle must
    still surface — the positional filter is slackened by the per-doc
    capped-entry count, never narrowing the cap's documented recall.

    Construction (t=0.5): A and B share 4 boilerplate shingles a0..a3
    (prefix df 6 > cap 3, via filler docs), the rare shingle m4 at sorted
    position 4 (the last prefix slot), and x7 beyond the prefix —
    J = 6/10 = 0.6. The unslackened bound min(sz-p) = 4 gives
    4·1.5 = 6 < 8 = t·(sz_a+sz_b) and would drop the pair; the slack
    min(ncap_a, ncap_b) = 4 admits it."""
    rows = [
        (0, ["a0", "a1", "a2", "a3", "m4", "p5", "p6", "x7"]),
        (1, ["a0", "a1", "a2", "a3", "m4", "q5", "q6", "x7"]),
    ] + [
        (10 + i, ["a0", "a1", "a2", "a3",
                  f"f{i}4", f"f{i}5", f"f{i}6", f"f{i}7"])
        for i in range(4)
    ]
    sh = spark.createDataFrame(
        [(i, s, len(s)) for i, s in rows],
        "id long, sh array<string>, sz int")
    capped = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
              for r in dedup.jaccard_pairs_prefix(
                  sh, 0.5, stop_df_cap=3).collect()}
    assert (0, 1) in capped and capped[(0, 1)] == 0.6
    # fillers share only capped boilerplate with everything: no other pairs
    assert set(capped) == {(0, 1)}


def test_capped_prefix_recall_matches_cap_only_semantics(spark):
    """Property: the capped prefix path returns EXACTLY the pairs the
    cap-only semantics admit — J >= t AND some uncapped shingle lies in
    both prefixes — on random corpora. Pins that the positional filter's
    slack restores full cap-only recall (and that verification keeps
    precision exact)."""
    import math
    import random

    rng = random.Random(7)
    vocab = [f"s{i:02d}" for i in range(30)]
    t, cap = 0.5, 3
    for trial in range(3):
        docs = {}
        for d in range(14):
            base = rng.randrange(0, 18)
            n = rng.randrange(6, 12)
            docs[d] = sorted(set(vocab[(base + j) % 30] for j in range(n)))
        sh = spark.createDataFrame(
            [(d, s, len(s)) for d, s in docs.items()],
            "id long, sh array<string>, sz int")
        # python reference for cap-only semantics
        pfx = {d: set(s[: len(s) - math.ceil(t * len(s)) + 1])
               for d, s in docs.items()}
        df_count: dict[str, int] = {}
        for p in pfx.values():
            for g in p:
                df_count[g] = df_count.get(g, 0) + 1
        surviving = {d: {g for g in p if df_count[g] <= cap}
                     for d, p in pfx.items()}
        expected = {}
        for a in docs:
            for b in docs:
                if a >= b or not (surviving[a] & surviving[b]):
                    continue
                inter = len(set(docs[a]) & set(docs[b]))
                j = inter / (len(docs[a]) + len(docs[b]) - inter)
                if j >= t:
                    expected[(a, b)] = round(j, 6)
        got = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
               for r in dedup.jaccard_pairs_prefix(
                   sh, t, stop_df_cap=cap).collect()}
        assert got == expected, f"trial {trial}"


def test_connected_components_min_label(spark):
    """Chain 1-2-3, pair 10-11, singleton 99: labels converge to the min id
    of each component, and propagation crosses the chain (transitivity)."""
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], ["id"])
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], ["id_a", "id_b"])
    for thr in (100_000, 0):  # driver union-find path AND distributed loop
        got = {r["id"]: r["comp"]
               for r in dedup.connected_components(
                   nodes, pairs, driver_edge_threshold=thr).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}, f"thr={thr}"


def test_connected_components_random_graphs_match_union_find(spark):
    """Distributed min-label propagation must agree with a sequential
    union-find on random graphs (path/star/clique mixtures included by
    chance across seeds)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                        for _ in range(40)})
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        # canonical label = min node id in the component
        comp_min = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        want = {v: comp_min[find(v)] for v in range(n)}

        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        for thr in (100_000, 0):  # both execution paths, same closure
            got = {r["id"]: r["comp"]
                   for r in dedup.connected_components(
                       nodes, pairs, max_iter=20,
                       driver_edge_threshold=thr).collect()}
            assert got == want, f"seed {seed} thr={thr}"


def test_minhash_matches_exact_jaccard_on_planted_dups(docs):
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()}
    # LSH at 4 bands x 2 rows catches j=1.0 with certainty; the j~0.8 pair
    # collides unless all 4 bands miss (p ~ (1-j^2)^4 < 0.02).
    assert (0, 1) in got
    assert not any(3 in p for p in got)


def test_simhash_deterministic_and_close_for_near_dups(spark, docs):
    s = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()}
    assert all(0 <= v < 2 ** 60 for v in s.values())
    ham02 = bin(s[0] ^ s[2]).count("1")
    ham03 = bin(s[0] ^ s[3]).count("1")
    assert ham02 < ham03  # near-dup much closer than unrelated doc
    again = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()}
    assert s == again


def test_simhash_pairs_recall_complete_vs_allpairs(spark):
    # 20 docs: 10 clones of DOC with tiny edits + 10 distinct docs.
    rows = [(i, DOC + f" tail{i % 3}") for i in range(10)]
    rows += [(100 + i, f"{OTHER} variant {i} " + " ".join(
        f"w{i}{j}" for j in range(15))) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    banded = {(r["id_a"], r["id_b"]) for r in
              dedup.simhash_pairs(df, max_hamming=3).collect()}
    s = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()}
    allpairs = {(a, b) for a in s for b in s if a < b
                and bin(s[a] ^ s[b]).count("1") <= 3}
    assert banded == allpairs  # pigeonhole: banding loses nothing


def test_embedding_dup_pairs_exact_cosine(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),   # same direction as 0 -> cosine 1
        (2, [0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in dedup.embedding_dup_pairs(df, threshold=0.9).collect()}
    assert set(pairs) == {(0, 1)}
    assert abs(pairs[(0, 1)] - 1.0) < 1e-12


def test_semantic_dedup_within_cell_lower_id_wins(spark):
    # 2 centroids (head-sample: ids 0 and 1). ids 0,2,3 share a direction
    # (cosine 1 within one cell -> 2 and 3 are dups of 0); id 1 is alone
    # in its cell; id 4 is NEAR id 1's cell but below threshold.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [3.0, 0.0, 0.0]),
        (3, [5.0, 0.0, 0.0]),
        (4, [0.3, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["id"]: (r["cell"], r["is_dup"])
           for r in dedup.semantic_dedup(df, threshold=0.99,
                                         num_cells=2).collect()}
    assert len(out) == 5
    assert not out[0][1] and not out[1][1] and not out[4][1]
    assert out[2][1] and out[3][1]
    assert out[2][0] == out[0][0] == out[3][0]
    assert out[4][0] == out[1][0]  # same cell as 1, but cosine < 0.99


def test_semantic_dedup_matches_numpy_reference_on_random_vectors(spark):
    """Seeded random corpus vs an independent numpy implementation of the
    same spec (nearest head-sample centroid with (cos DESC, cid ASC)
    tiebreak; dup = lower-id within-cell neighbor at cosine >= tau)."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim, cells, tau = 40, 8, 4, 0.92
    X = rng.normal(size=(n, dim))
    X[7] = X[3] * 2.0          # planted dups (same direction)
    X[25] = X[12] * 0.5 + rng.normal(size=dim) * 1e-3

    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        ["vec_id", "embedding"])
    got = {r["id"]: (r["cell"], r["is_dup"])
           for r in dedup.semantic_dedup(df, threshold=tau,
                                         num_cells=cells).collect()}

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:cells]             # head-sample centroids (ids 0..cells-1)
    cos_c = Xn @ C.T
    # argmax with (cos DESC, cid ASC) tiebreak == plain argmax (first max)
    cell = cos_c.argmax(1)
    expect = {}
    for i in range(n):
        dup = any(cell[j] == cell[i] and (Xn[j] @ Xn[i]) >= tau
                  for j in range(i))
        expect[i] = (int(cell[i]), dup)
    assert got == expect
    assert expect[7][1] and got[7][0] == got[3][0]  # planted dup caught


def test_connected_components_raises_on_nonconvergence(spark):
    """A 15-node path at max_iter=3 CANNOT converge (min-label propagation
    moves one hop per round, the path's diameter is 14): partial labels
    must raise, not return silently-wrong components. Loop-path property:
    driver_edge_threshold=0 forces the distributed loop (the driver
    union-find always converges)."""
    import pytest

    n = 15
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(nodes, pairs, max_iter=3,
                                   driver_edge_threshold=0)
    # And with enough rounds the same path converges to component 0.
    got = {r["id"]: r["comp"]
           for r in dedup.connected_components(
               nodes, pairs, max_iter=20, driver_edge_threshold=0).collect()}
    assert got == {i: 0 for i in range(n)}


def test_tokenized_spread_gated_on_input_splits(spark, tmp_path):
    """The CPU-spread exchange exists for few-fat-file corpora only: a
    scan that already yields >= defaultParallelism splits must NOT grow a
    repartition (at 100 TB that exchange would move every raw text byte
    for nothing), while a single-file scan still gets spread."""
    n = spark.sparkContext.defaultParallelism
    rows = [(i, f"alpha beta gamma {i}") for i in range(64)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.coalesce(1).write.parquet(str(tmp_path / "fat"))
    # Enough files that the scan's bin-packing (openCostInBytes) still
    # yields >= defaultParallelism splits.
    df.repartition(8 * n).write.parquet(str(tmp_path / "wide"))
    fat = spark.read.parquet(str(tmp_path / "fat"))
    wide = spark.read.parquet(str(tmp_path / "wide"))
    assert fat.rdd.getNumPartitions() < n <= wide.rdd.getNumPartitions()
    assert "Exchange" in dedup.tokenized(fat)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in dedup.tokenized(wide)._jdf.queryExecution() \
        .executedPlan().toString()
    # Same result either way.
    a = sorted(r["id"] for r in dedup.tokenized(fat).collect())
    b = sorted(r["id"] for r in dedup.tokenized(wide).collect())
    assert a == b == list(range(64))


def test_connected_components_no_edges_all_singletons(spark):
    """An edgeless graph must converge to all-singleton components, not
    raise: sum() over the all-NULL `changed` column is NULL, and the
    probe must read that as 0 changes (converged), never as "no probe
    ran" (regression guard for the r5 persist-based loop rewrite)."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    for thr in (100_000, 0):
        out = {r["id"]: r["comp"]
               for r in dedup.connected_components(
                   nodes, pairs, driver_edge_threshold=thr).collect()}
        assert out == {i: i for i in range(5)}, f"thr={thr}"


def test_connected_components_leaves_no_cached_frames(spark):
    """The loop persists per-round label frames; all of them (and the
    edge cache) must be unpersisted before return — cache-manager entries
    are never GC-reclaimed, so a leak here grows without bound in a
    long-lived session (one call per corpus x many corpora)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "id_a long, id_b long")
    for thr in (100_000, 0):  # driver path persists pairs; loop persists all
        spark.catalog.clearCache()  # isolate from other tests' leftovers
        dedup.connected_components(nodes, pairs,
                                   driver_edge_threshold=thr).collect()
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
            f"connected_components (thr={thr}) left cache-manager entries")


def test_span_stats_counts_and_first_occurrence(spark):
    """Planted geometry for span-level exact-substring dedup (k=4):
    doc 0 and doc 1 share one exact 4-token span; doc 2 repeats a span
    WITHIN itself; doc 3 is all-unique; doc 4 is shorter than one span
    (no row). First occurrence = smallest (doc_id, pos) keeps its span;
    every other occurrence of a duplicated span counts as removed."""
    rows = [
        (0, "a b c d e f g h"),          # spans: [a b c d], [e f g h]
        (1, "a b c d x y z w"),          # shares [a b c d] with doc 0
        (2, "p q r s p q r s"),          # internal repeat of [p q r s]
        (3, "m n o t u v w1 x1"),        # unique spans
        (4, "too short"),                # < 4 tokens: no spans, no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.span_stats(df, k=4).collect()}

    assert set(out) == {0, 1, 2, 3}
    # doc 0: 2 spans, [a b c d] duplicated but doc 0 pos 0 is canonical
    assert (out[0]["n_spans"], out[0]["n_dup_spans"],
            out[0]["n_removed_spans"]) == (2, 1, 0)
    assert out[0]["dup_ratio"] == 0.5
    # doc 1: its copy of [a b c d] is a non-first occurrence -> removed
    assert (out[1]["n_spans"], out[1]["n_dup_spans"],
            out[1]["n_removed_spans"]) == (2, 1, 1)
    # doc 2: both spans are the same text; pos 0 canonical, pos 1 removed
    assert (out[2]["n_spans"], out[2]["n_dup_spans"],
            out[2]["n_removed_spans"]) == (2, 2, 1)
    assert out[2]["dup_ratio"] == 1.0
    # doc 3: nothing duplicated
    assert (out[3]["n_spans"], out[3]["n_dup_spans"],
            out[3]["n_removed_spans"]) == (2, 0, 0)


def test_span_stats_matches_python_reference_on_random_corpora(spark):
    """span_stats must agree with a sequential reference implementation
    on random small-vocab corpora (duplicate spans arise by chance at
    vocab 4, k=3 — asserted non-vacuous)."""
    import random
    from collections import Counter

    for seed in (3, 17):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(2, 20))))
                for i in range(40)]
        k = 3

        spans = {}  # (doc, pos) -> text
        for doc, text in rows:
            toks = text.split()
            for p in range(len(toks) // k):
                spans[(doc, p)] = " ".join(toks[p * k:(p + 1) * k])
        freq = Counter(spans.values())
        first = {}
        for (doc, p), s in sorted(spans.items()):
            first.setdefault(s, (doc, p))
        want = {}
        for (doc, p), s in spans.items():
            n, d_, r = want.get(doc, (0, 0, 0))
            dup = freq[s] > 1
            rem = dup and first[s] != (doc, p)
            want[doc] = (n + 1, d_ + dup, r + rem)

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["id"]: (r["n_spans"], r["n_dup_spans"], r["n_removed_spans"])
               for r in dedup.span_stats(df, k=k).collect()}
        assert got == want, f"seed {seed}"
        assert any(v > 1 for v in freq.values()), "vacuous: no dup spans"


def test_span_stats_staggered_catches_boundary_straddling_dup(spark):
    """The offset-k/2 grid covers the offset-0 grid's boundaries: a
    duplicated run straddling an offset-0 span boundary is invisible to
    the single grid but contains a full offset-k/2 span. Planted (k=4):
    docs 0 and 1 share the run 'c d e f' at token positions 2..5 of both
    — split 2+2 across offset-0 spans, wholly spans [2,6) of the offset-2
    grid."""
    rows = [
        (0, "a b c d e f g h"),
        (1, "p q c d e f r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    single = {r["id"]: r for r in dedup.span_stats(df, k=4).collect()}
    assert all(single[i]["n_dup_spans"] == 0 for i in (0, 1))  # blind spot
    stag = {r["id"]: r for r in
            dedup.span_stats(df, k=4, offsets=(0, 2)).collect()}
    # 3 spans/doc now (two offset-0 + one offset-2); the offset-2 span
    # 'c d e f' is duplicated; doc 0 pos 2 < doc 1 pos 2 -> doc 1 removed
    assert (stag[0]["n_spans"], stag[0]["n_dup_spans"],
            stag[0]["n_removed_spans"]) == (3, 1, 0)
    assert (stag[1]["n_spans"], stag[1]["n_dup_spans"],
            stag[1]["n_removed_spans"]) == (3, 1, 1)

    import pytest
    with pytest.raises(ValueError):
        dedup.span_stats(df, k=4, offsets=(0, 4))
    with pytest.raises(ValueError):
        dedup.span_stats(df, k=4, offsets=(0, 0))


def test_span_stats_staggered_matches_python_reference(spark):
    """Staggered span_stats must agree with a sequential reference over
    BOTH offsets on random small-vocab corpora (shared frequency /
    first-occurrence universe keyed by (doc, token-start))."""
    import random
    from collections import Counter

    k = 4
    offsets = (0, 2)
    for seed in (5, 23):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(2, 24))))
                for i in range(40)]

        spans = {}  # (doc, token_start) -> text
        for doc, text in rows:
            toks = text.split()
            for o in offsets:
                for i in range((len(toks) - o) // k):
                    p = o + i * k
                    spans[(doc, p)] = " ".join(toks[p:p + k])
        freq = Counter(spans.values())
        first = {}
        for (doc, p), s in sorted(spans.items()):
            first.setdefault(s, (doc, p))
        want = {}
        for (doc, p), s in spans.items():
            n, d_, r = want.get(doc, (0, 0, 0))
            dup = freq[s] > 1
            rem = dup and first[s] != (doc, p)
            want[doc] = (n + 1, d_ + dup, r + rem)

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["id"]: (r["n_spans"], r["n_dup_spans"], r["n_removed_spans"])
               for r in dedup.span_stats(df, k=k, offsets=offsets).collect()}
        assert got == want, f"seed {seed}"
        assert any(v > 1 for v in freq.values()), "vacuous: no dup spans"


def test_incremental_dedup_flags_planted(spark):
    """Planted incremental-ingestion geometry: incoming doc 101 is an
    exact copy of existing doc 0 (exact AND near); 103 is a near-dup of
    doc 2 (tail edit -> near only); 105 is novel (neither); 107 is too
    short to shingle (never near, exact still possible via fingerprint
    and here false)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (2, "one two three four five six seven eight nine ten"),
        (4, "completely different reference text body here"),
    ]
    incoming = [
        (101, base),                                              # exact
        (103, "one two three four five six seven eight nine zz"),  # near
        (105, "wholly novel content never seen in the corpus"),
        (107, "xy"),                                              # short
    ]
    ex = spark.createDataFrame(rows, ["doc_id", "text"])
    inc = spark.createDataFrame(incoming, ["doc_id", "text"])
    out = {r["id"]: (r["is_known_exact"], r["is_known_near"])
           for r in dedup.incremental_dedup_flags(
               inc, ex, threshold=0.5).collect()}
    assert set(out) == {101, 103, 105, 107}
    assert out[101] == (True, True)
    assert out[103] == (False, True)
    assert out[105] == (False, False)
    assert out[107] == (False, False)


def test_containment_prefix_equals_direct(spark):
    """The asymmetric prefix-filtered containment join must be lossless:
    same pairs and scores as the direct all-pairs inverted-index
    aggregate, on a corpus with planted containments (small doc quoted
    inside a large one), near-dups, and unrelated docs."""
    big = " ".join(f"w{i}" for i in range(40))
    quoted = " ".join(f"w{i}" for i in range(10, 22))  # inside big
    rows = [
        (0, big),
        (1, quoted),                                     # contained in 0
        (2, quoted + " tail1 tail2"),                    # mostly contained
        (3, " ".join(f"z{i}" for i in range(15))),       # unrelated
        (4, big),                                        # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingled(docs)
    for t in (0.5, 0.9):
        ex = sh.select("id", "sz", F.explode("sh").alias("g"))
        a, b = ex.alias("a"), ex.alias("b")
        direct_df = (
            a.join(b, (F.col("a.g") == F.col("b.g"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
            .agg(F.count("*").alias("inter"))
        )
        cont = F.col("inter") / F.least("sz_a", "sz_b")
        direct = {(r["id_a"], r["id_b"]): round(r["c"], 4)
                  for r in direct_df.filter(cont >= t)
                  .select("id_a", "id_b", F.round(cont, 4).alias("c"))
                  .collect()}
        prefix = {(r["id_a"], r["id_b"]): r["containment"]
                  for r in dedup.containment_pairs(sh, t).collect()}
        assert prefix == direct, f"t={t}"
        assert direct, f"vacuous at t={t}"
    # the planted containment pair is found at t=0.9
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.containment_pairs(sh, 0.9).collect()}
    assert (0, 1) in got and (0, 4) in got
