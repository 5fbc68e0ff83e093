"""Unit tests for the training-data text operators added beyond the
fixture-driven oracle checks: sequence packing and repetition signals,
against hand-computed expectations."""

from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.plans import llm_ops  # noqa: F401  (registers)
from data_pipeline_eng_project_1_spark.plans import queries as Q


def _builder(name):
    return next(s for s in Q.specs() if s.name == name).builder


def test_doc_packing_start_offset_rule(spark, tmp_path):
    # budget 2048; doc sizes chosen so the third doc starts exactly at the
    # boundary: pack = floor(tokens_before_doc / 2048)
    rows = [
        (1, "s", 1000), (2, "s", 1048),  # cum-before: 0, 1000   -> pack 0
        (3, "s", 10),                    # cum-before: 2048      -> pack 1
        (4, "s", 3000),                  # cum-before: 2058      -> pack 1
        (5, "s", 5),                     # cum-before: 5058      -> pack 2
        (6, "t", 100),                   # other source: packs restart
    ]
    docs = spark.createDataFrame(
        [(i, src, " ".join(["w"] * n)) for i, src, n in rows],
        ["doc_id", "source", "text"])
    out_dir = str(tmp_path / "docs.parquet")
    docs.write.parquet(out_dir)
    # builder reads {sf_dir}/documents.parquet — point it at tmp
    import os
    os.rename(out_dir, str(tmp_path / "documents.parquet"))
    out = _builder("doc_packing")(spark, str(tmp_path)).collect()
    got = {(r["source"], r["pack_id"]): (r["n_docs"], r["pack_tokens"],
                                         r["first_doc"], r["last_doc"])
           for r in out}
    assert got[("s", 0)] == (2, 2048, 1, 2)
    assert got[("s", 1)] == (2, 3010, 3, 4)
    assert got[("s", 2)] == (1, 5, 5, 5)
    assert got[("t", 0)] == (1, 100, 6, 6)


def test_text_repetition_signals(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "x", "a b c a b c a b c"),     # 7 trigrams, 3 distinct
            (2, "x", "u v w x y z"),           # no repeats
            (3, "x", "q q q q"),               # all same unigram
        ],
        ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           _builder("text_repetition")(spark, str(tmp_path)).collect()}
    # doc 1: 1 - 3/7 = 0.5714...; top unigram 3/9
    assert abs(out[1]["dup_3gram_ratio"] - round(1 - 3 / 7, 4)) < 1e-9
    assert abs(out[1]["top_unigram_frac"] - round(3 / 9, 4)) < 1e-9
    assert not out[1]["keep"]  # dup ratio 0.57 > 0.3
    # doc 2: all distinct
    assert out[2]["dup_3gram_ratio"] == 0.0
    assert out[2]["keep"]
    # doc 3: trigrams all "q q q": 1 - 1/2 = 0.5; top unigram 1.0
    assert abs(out[3]["dup_3gram_ratio"] - 0.5) < 1e-9
    assert out[3]["top_unigram_frac"] == 1.0
    assert not out[3]["keep"]


def test_pii_creditcard_luhn_discriminates(spark, tmp_path):
    """The Luhn gate must redact VALID PANs only: doc 30 gets check digit
    0 (invalid for the 411111111111111 prefix, whose Luhn digit is 1) and
    stays untouched; doc 21 gets digit 1 (valid) and is redacted; doc 7's
    10-digit decoy run never matches the 16-digit pattern."""
    import hashlib

    rows = [(7, "x", "short doc"), (21, "x", "pay now"),
            (30, "x", "invoice")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           _builder("pii_creditcard_luhn")(spark, str(tmp_path)).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 7: decoy only — no 16-digit candidate
    assert (out[7]["n_cards"], out[7]["n_valid"]) == (0, 0)
    assert out[7]["scrub_md5"] == md5("short doc order 1234567890 ref")
    # doc 21: %3==0 and %7==0 -> card 4111111111111111 (valid) + decoy
    assert (out[21]["n_cards"], out[21]["n_valid"]) == (1, 1)
    assert out[21]["scrub_md5"] == md5(
        "pay now card <CARD> on file order 1234567890 ref")
    # doc 30: card 4111111111111110 fails Luhn -> NOT redacted
    assert (out[30]["n_cards"], out[30]["n_valid"]) == (1, 0)
    assert out[30]["scrub_md5"] == md5(
        "invoice card 4111111111111110 on file")


def test_leakage_safe_split_never_straddles_components(spark, tmp_path):
    """The defining property: near-duplicate docs (same component) always
    land in the SAME split — a doc-keyed random split would violate this
    with probability ~1/3 per pair."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(1, "x", base), (2, "x", base + " extra"),  # near-dup pair
            (3, "x", "totally different content here about other things "
                     "with many unrelated words in a row")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: (r["component"], r["split"]) for r in
           _builder("corpus_leakage_safe_split")(
               spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1][0] == out[2][0] == 1      # near-dups share a component
    assert out[1][1] == out[2][1]           # ... and therefore a split
    assert out[3][0] == 3                   # singleton keeps its own
    assert all(s in ("train", "val", "test") for _, s in out.values())


def test_shard_export_partitions_completely_and_balances(spark, tmp_path):
    """Every doc gets exactly one (shard, pos); positions are contiguous
    1..n per shard; and the md5 keying balances shard sizes to within
    sampling noise (no empty shard at 400 docs / 16 shards)."""
    rows = [(i, "s", f"doc number {i} text") for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = _builder("corpus_shard_export")(spark, str(tmp_path)).collect()
    assert len(out) == 400 and len({r["doc_id"] for r in out}) == 400
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(16))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] >= 10 and sizes[-1] <= 45  # ~25 +- noise


def test_keep_best_picks_longest_min_id(spark, tmp_path):
    """Within a near-dup component the kept doc is the one with the most
    tokens; ties break to the smaller id; singletons keep themselves."""
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, "x", base),
        (2, "x", base + " extra tokens here"),   # longest in the cluster
        (3, "x", base + " extra tokens here"),   # tie with 2 -> 2 wins
        (4, "x", "unrelated standalone doc with its own words only"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["component"]: r for r in
           _builder("dedup_keep_best")(spark, str(tmp_path)).collect()}
    assert out[1]["n_members"] == 3 and out[1]["kept_doc_id"] == 2
    assert out[1]["kept_tokens"] == 23
    assert out[4]["n_members"] == 1 and out[4]["kept_doc_id"] == 4


def test_winnowing_guarantee_and_short_docs(spark):
    """Winnowing's defining property: two documents sharing a substring
    of >= k + w - 1 = 11 normalized chars ALWAYS share at least one
    fingerprint; unrelated docs (here: disjoint alphabets) share none;
    docs shorter than one window have empty sets."""
    from data_pipeline_eng_project_1_spark.operators import dedup

    shared = "abcdefghijk"  # exactly k + w - 1 chars
    rows = [
        (1, "xxx " + shared + " yyy zzz padding words"),
        (2, "qqq www " + shared + " eee rrr other tail"),
        (3, "0123456789 0123456789 012345"),   # digits only: disjoint
        (4, "tiny"),                           # shorter than one window
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: set(r["fps"]) for r in
           dedup.winnow_fingerprint_table(df, k=8, w=4).collect()}
    assert out[1] & out[2], "shared >=11-char substring must collide"
    assert not (out[1] & out[3]) and not (out[2] & out[3])
    assert out[4] == set()


def test_winnow_arrow_matches_python_reference(spark):
    """The r17 NumPy winnow (dedup._winnow_batches) against a direct
    per-document Python replay of the algorithm — Horner chain with mod
    after every multiply-add, w-window minima, sorted distinct — over
    randomized texts including nulls, empties, and boundary lengths
    (bit-exact integer math, so equality is exact, not approximate)."""
    import random

    from data_pipeline_eng_project_1_spark.operators import dedup

    def ref(text, k=8, w=4, mod=2147483647):
        import re
        norm = re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", "",
                                        (text or "").lower())).strip()
        codes = [ord(c) for c in norm]
        if len(codes) < k + w - 1:
            return []
        gh = []
        for i in range(len(codes) - k + 1):
            acc = 0
            for j in range(k):
                acc = (acc * 257 + codes[i + j]) % mod
            gh.append(acc)
        mins = [min(gh[j:j + w]) for j in range(len(gh) - w + 1)]
        return sorted(set(mins))

    rng = random.Random(7)
    alpha = "abcdefghij XYZ!,09 "
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(0, 60))))
            for i in range(40)]
    rows += [(100, None), (101, ""), (102, "a" * 10), (103, "a" * 11),
             (104, "b" * 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["fps"] for r in
           dedup.winnow_fingerprint_table(df, k=8, w=4).collect()}
    want = {i: ref(t) for i, t in rows}
    assert got == want


def test_cdc_arrow_matches_expression_form(spark):
    """The r17 NumPy chunk-frontier CDC (dedup.cdc_boundary_table)
    against the expression-form reference (texts.cdc_boundaries) —
    integer gear math, so equality is exact — over edge cases: null,
    empty, sub-min, exactly-max, max+1, and repetitive texts."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import texts
    from data_pipeline_eng_project_1_spark.operators import dedup

    rows = [(1, None), (2, ""), (3, "short text"), (4, "a" * 127),
            (5, "b" * 128), (6, "c" * 129), (7, "Hello, World! " * 40),
            (8, "x" * 31), (9, "y" * 32),
            (10, "the quick brown fox jumps over the lazy dog " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id", texts.cdc_boundaries(F.col("text")).alias("b")).collect()}
    new = {r["id"]: r["bs"] for r in dedup.cdc_boundary_table(df).collect()}
    assert old == new


def test_char_entropy_matches_python_reference(spark, sf_dir):
    """Spark entropy == a direct Python computation of
    -sum p log2 p over the normalized alphabet, for every fixture doc."""
    import math
    import re
    from collections import Counter

    from data_pipeline_eng_project_1_spark.plans import queries as Q

    got = {r.doc_id: r for r in
           Q.queries()["text_char_entropy"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    checked = 0
    for row in docs:
        norm = re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", "",
                                        row.text.lower())).strip()
        if not norm:
            assert row.doc_id not in got
            continue
        cnt = Counter(norm)
        n = len(norm)
        h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        g = got[row.doc_id]
        assert g.n_chars_norm == n
        assert g.n_unique_chars == len(cnt)
        assert abs(g.entropy - h) < 5e-4, row.doc_id
        checked += 1
    assert checked == len(got)


def test_snapshot_diff_statuses_follow_rule(spark, sf_dir):
    """Every diff row's status agrees with the synthesis rule, and
    unchanged docs are absent."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    got = Q.queries()["corpus_snapshot_diff"](spark, sf_dir).collect()
    by_status = {}
    for r in got:
        by_status.setdefault(r.status, set()).add(r.doc_id)
        if r.status == "added":
            assert r.doc_id % 13 == 0 and r.doc_id % 11 != 0
            assert r.old_md5 is None and r.new_md5 is not None
        elif r.status == "removed":
            assert r.doc_id % 11 == 0 and r.doc_id % 13 != 0
            assert r.new_md5 is None and r.old_md5 is not None
        else:
            assert r.status == "changed"
            assert r.doc_id % 7 == 0
            assert r.old_md5 is not None and r.new_md5 is not None
            assert r.old_md5 != r.new_md5
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # every doc matching a rule appears exactly once with the right status
    for i in range(n_docs):
        in_a, in_b, rev = i % 13 != 0, i % 11 != 0, i % 7 == 0
        if in_a and in_b and not rev:
            for s in by_status.values():
                assert i not in s
        elif not in_a and in_b:
            assert i in by_status.get("added", set())
        elif in_a and not in_b:
            assert i in by_status.get("removed", set())
        elif in_a and in_b:
            assert i in by_status.get("changed", set())


def test_funnel_counts_are_ordered_and_order_sensitive(spark, sf_dir):
    """Funnel stages are monotone per cohort, and the operator's ordering
    semantics reject a purchase that precedes the user's first view."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    rows = Q.queries()["events_funnel_conversion"](spark, sf_dir).collect()
    assert rows, "funnel returned no cohorts"
    for r in rows:
        assert r.n_view >= r.n_click >= r.n_purchase >= 0
        if r.n_purchase:
            assert r.avg_convert_s is not None and r.avg_convert_s > 0


def test_heavy_hitters_equals_full_aggregate_any_partitioning(spark, sf_dir):
    """The sketch+recount output equals the exact full-vocab definition
    regardless of how rows are batched (candidate-superset guarantee)."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import texts
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(F.explode(texts.tokens(F.col("text"))).alias("token"))
    n = toks.count()
    want = {(r.token, r.cnt) for r in
            toks.groupBy("token").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") * 30 > n).collect()}
    got = {(r.token, r.cnt) for r in
           Q.queries()["text_heavy_hitters"](spark, sf_dir).collect()}
    assert got == want
    assert got, "degenerate fixture: no heavy hitters at s=30"


def test_markov_transition_probs_normalize(spark, sf_dir):
    from collections import defaultdict

    from data_pipeline_eng_project_1_spark.plans import queries as Q

    rows = Q.queries()["events_markov_transitions"](spark, sf_dir).collect()
    by_from = defaultdict(float)
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_from[r.from_type] += r.p
    for ft, tot in by_from.items():
        assert abs(tot - 1.0) < 1e-3, (ft, tot)


def test_quality_classifier_gate_consistent(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    rows = Q.queries()["quality_classifier_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        # the gate uses the unrounded score; at the round-4 boundary the
        # rounded column may sit exactly on 0.5 either way, so only
        # assert consistency away from it
        if abs(r.score - 0.5) > 1e-3:
            assert r.keep == (r.score >= 0.5)


def test_bpe_vocab_matches_python_reference(spark, sf_dir):
    """The 5 learned merges equal a sequential Python BPE (Sennrich-style)
    run on the same word-frequency table with the same tie-break."""
    from collections import Counter

    from data_pipeline_eng_project_1_spark.plans import queries as Q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("text").collect()
    freq = Counter(w for r in docs for w in r.text.split(" ") if w)
    seqs = {w: " ".join(w) for w in freq}
    want = []
    for rnd in range(1, 6):
        pc: Counter = Counter()
        for w, s in seqs.items():
            sy = s.split(" ")
            for i in range(len(sy) - 1):
                pc[f"{sy[i]} {sy[i+1]}"] += freq[w]
        # max count, lexicographically smallest pair
        pair = min(pc, key=lambda p: (-pc[p], p))
        want.append((rnd, pair, pair.replace(" ", ""), pc[pair]))
        for w, s in seqs.items():
            seqs[w] = (" " + s + " ").replace(
                " " + pair + " ", " " + pair.replace(" ", "") + " ").strip()
    got = sorted((r.round, r.pair, r.merged, r.cnt) for r in
                 Q.queries()["text_bpe_vocab"](spark, sf_dir).collect())
    assert got == want


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    """Scalar int8 quantization: RMSE is bounded by half a code step
    (uniform quantizer worst case), and a constant vector degenerates to
    scale 0 / rmse 0 codes-all-zero without dividing by zero."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    spec = next(s for s in Q.specs() if s.name == "embedding_quantize_int8")
    rows = spec.builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_dims"] == 64
        # worst-case uniform quantization error is scale/2 per dim
        assert r["rmse"] <= r["scale"] / 2 + 1e-9, r

    const = spark.createDataFrame(
        [(1, [2.5] * 4)], "vec_id long, embedding array<float>")
    import tempfile, os
    d = tempfile.mkdtemp()
    # builder reads from a dir: write a one-row embeddings table
    const.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = spec.builder(spark, d).collect()[0]
    assert out["scale"] == 0.0 and out["rmse"] == 0.0


def test_random_projection_jl_distortion(spark, sf_dir):
    """JL Rademacher projection 64->8: distortion concentrates around 1
    (E[proj_norm^2] = orig_norm^2); on the fixture every vector must land
    within a loose [0.3, 2.2] band and the mean within 10% of 1."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    spec = next(s for s in Q.specs() if s.name == "embedding_random_projection")
    rows = spec.builder(spark, sf_dir).collect()
    assert rows
    ds = [r["distortion"] for r in rows]
    assert all(0.3 <= d <= 2.2 for d in ds)
    assert abs(sum(ds) / len(ds) - 1.0) < 0.1


def test_negative_sampling_properties(spark, sf_dir):
    """Every anchor gets exactly k distinct negatives, none equal to the
    anchor, and the assignment is deterministic across runs."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    fn = Q.queries()["corpus_negative_sampling"]
    rows = fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r["neg_id"])
        assert r["neg_id"] != r["doc_id"]
    assert all(len(v) == 3 and len(set(v)) == 3 for v in per.values())
    rows2 = fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_cdc_boundaries_match_sequential_reference(spark):
    """The fold-form gear CDC must reproduce a sequential Python pass:
    same gear table, same cut rule (h % avg == 0 after min_len, force at
    max_len, reset at cuts, no trailing empty chunk)."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import texts

    def py_cdc(text, avg=64, min_len=32, max_len=128):
        import re
        norm = re.sub(" +", " ",
                      re.sub("[^a-z0-9 ]", "", text.lower())).strip()
        gear = texts._cdc_gear()
        h, run, bounds = 0, 0, [0] if norm else []
        for i, c in enumerate(norm):
            h = (2 * h + gear[c]) % 2147483648
            run += 1
            if ((run >= 32 and h % 64 == 0) or run >= 128) \
                    and i + 1 < len(norm):
                bounds.append(i + 1)
                h, run = 0, 0
            elif (run >= 32 and h % 64 == 0) or run >= 128:
                h, run = 0, 0
        return bounds

    import random
    rng = random.Random(11)
    rows = []
    for i in range(30):
        n = rng.randrange(0, 600)
        rows.append((i, "".join(rng.choice("abcdef 01") for _ in range(n))))
    rows.append((100, ""))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id",
        texts.cdc_boundaries(F.col("text")).alias("b")).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == py_cdc(text), doc_id


def test_cdc_boundaries_resynchronize_after_insertion(spark):
    """The dedup-stability property fixed strides lack: inserting text at
    the front shifts every boundary by the insertion length at first,
    but the boundary set RE-SYNCHRONIZES — the tail's boundaries are the
    originals plus the shift, so unchanged content re-chunks
    identically."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import texts

    import random
    rng = random.Random(23)
    base = "".join(rng.choice("abcdef 01") for _ in range(2000))
    ins = "xyzzy inserted run "
    df = spark.createDataFrame(
        [(0, base), (1, ins + base)], ["doc_id", "text"])
    got = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id",
        texts.cdc_boundaries(F.col("text")).alias("b")).collect()}
    shift = len(ins)  # normalized insertion keeps its length here
    orig, edited = set(got[0]), set(got[1])
    shifted_matches = {b for b in orig if b + shift in edited}
    # everything past the first few chunks must re-align
    tail = {b for b in orig if b > 400}
    assert tail and tail <= shifted_matches, (
        f"tail boundaries failed to resync: {sorted(tail - shifted_matches)[:5]}")


def test_hashed_join_collision_split_equals_string_join(spark):
    """The r8 TF-IDF join trick (hashing.collided_hash_keys + carry the
    string only under a collided hash + null-safe residual) must equal
    the plain string-keyed join EVEN WITH collisions. Real xxhash64
    collisions are unconstructable, so force them with a deliberately
    colliding stand-in hash (term length): pair partial-sums must match
    the string join exactly, and the residual must kill every
    cross-term (collided) row."""
    from pyspark.sql import functions as F

    rows = [  # 'ab'/'xy' and 'abc'/'xyz' collide under length-hash
        (1, "ab", 1.0), (1, "abc", 2.0), (1, "q", 3.0),
        (2, "ab", 5.0), (2, "xyz", 7.0), (2, "q", 11.0),
        (3, "xy", 13.0), (3, "abc", 17.0),
    ]
    wn = spark.createDataFrame(rows, ["doc_id", "term", "u"])
    fake_h = F.length("term").cast("long")

    def pair_sums(a, b, on, residual=None):
        j = a.join(b, on).filter(F.col("doc_a") < F.col("doc_b"))
        if residual is not None:
            j = j.filter(residual)
        return {(r["doc_a"], r["doc_b"]): (round(r["s"], 9), r["n"])
                for r in j.groupBy("doc_a", "doc_b")
                .agg(F.sum(F.col("ua") * F.col("ub")).alias("s"),
                     F.count("*").alias("n")).collect()}

    # reference: plain string join
    sa = wn.select(F.col("doc_id").alias("doc_a"), "term",
                   F.col("u").alias("ua"))
    sb = wn.select(F.col("doc_id").alias("doc_b"), "term",
                   F.col("u").alias("ub"))
    want = pair_sums(sa, sb, "term")

    # the split form, with the forced-collision hash standing in
    vocab = wn.select("term").distinct()
    coll = (vocab.select(fake_h.alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1).select("h"))
    marked = (wn.withColumn("h", fake_h)
              .join(F.broadcast(coll.withColumn("c", F.lit(True))),
                    "h", "left")
              .select("doc_id", "h", "u",
                      F.when(F.col("c"), F.col("term")).alias("t2")))
    ha = marked.select(F.col("doc_id").alias("doc_a"), "h",
                       F.col("t2").alias("ta"), F.col("u").alias("ua"))
    hb = marked.select(F.col("doc_id").alias("doc_b"), "h",
                       F.col("t2").alias("tb"), F.col("u").alias("ub"))
    got = pair_sums(ha, hb, "h", F.col("ta").eqNullSafe(F.col("tb")))
    assert got == want
    # sanity: the collisions were real — the unresidualed join is WRONG
    assert pair_sums(ha, hb, "h") != want


def test_vocab_growth_curve_matches_sequential_reference(spark):
    """The checkpoint-bucketed distributed curve == a sequential pass
    over the fixture docs in id order (whitespace tokens, the tokenized()
    tokenizer), including the Heaps shape: vocab_cum is nondecreasing and
    concave-ish (new vocab per token falls as the corpus grows)."""
    import duckdb

    from data_pipeline_eng_project_1_spark.operators import dedup
    from data_pipeline_eng_project_1_spark.sources import catalog

    sf = "/root/testdata/sf0.001"
    docs = catalog.load_table(spark, "documents", sf)
    k = 8
    got = sorted(
        (r["checkpoint"], r["hi_id"], r["n_docs_cum"],
         r["n_tokens_cum"], r["vocab_cum"])
        for r in dedup.vocab_growth_curve(docs, checkpoints=k).collect())

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    lo, hi = rows[0][0], rows[-1][0]
    span = hi - lo + 1
    seen, nd = set(), 0
    per_b = {}
    for doc_id, text in rows:
        b = (doc_id - lo) * k // span
        toks = [t for t in text.split(" ") if t]
        st = per_b.setdefault(b, [0, 0, 0, 0])  # hi_id, nd, nt, nv
        st[0] = max(st[0], doc_id)
        st[1] += 1
        st[2] += len(toks)
        st[3] += sum(1 for t in set(toks) - seen)
        seen.update(toks)
    want, (cd, ct, cv) = [], (0, 0, 0)
    for b in sorted(per_b):
        hi_id, d, t, v = per_b[b]
        cd, ct, cv = cd + d, ct + t, cv + v
        want.append((b + 1, hi_id, cd, ct, cv))
    assert got == want
    # Heaps shape: nondecreasing vocab, falling marginal vocab-per-token
    ratios = []
    prev_t = prev_v = 0
    for _, _, _, t, v in got:
        if t > prev_t:
            ratios.append((v - prev_v) / (t - prev_t))
        prev_t, prev_v = t, v
    assert all(a >= b for a, b in zip(ratios, ratios[1:])) or \
        ratios[0] >= ratios[-1]  # concave-ish overall


def test_vocab_growth_curve_handles_sparse_ids_and_k1(spark):
    from data_pipeline_eng_project_1_spark.operators import dedup

    df = spark.createDataFrame(
        [(10, "a b"), (1000, "b c"), (999999, "c d e")], ["doc_id", "text"])
    one = dedup.vocab_growth_curve(df, checkpoints=1).collect()
    assert len(one) == 1
    assert (one[0]["n_docs_cum"], one[0]["n_tokens_cum"],
            one[0]["vocab_cum"]) == (3, 7, 5)
    many = dedup.vocab_growth_curve(df, checkpoints=4).collect()
    assert sum(r["n_docs_cum"] == 3 for r in many) >= 1
    last = max(many, key=lambda r: r["checkpoint"])
    assert (last["n_docs_cum"], last["n_tokens_cum"], last["vocab_cum"]) \
        == (3, 7, 5)


def test_text_primitive_sql_mirrors_on_adversarial_strings(spark):
    """Cross-engine insurance for the primitives 50+ oracles rest on:
    Spark's normalize / tokens / tokenize_words must equal their DuckDB
    SQL mirrors (SQL_NORM / SQL_TOKS / SQL_WTOKS) on adversarial text —
    unicode letters/accents/emoji, tabs/newlines, digit runs, repeated
    and leading/trailing spaces, empty-ish strings. The fixture corpora
    are clean ASCII, so a driver fixture regeneration with richer text
    would hit these paths first."""
    import duckdb

    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import texts
    from data_pipeline_eng_project_1_spark.plans.llm_ops import (
        SQL_NORM,
        SQL_TOKS,
        SQL_WTOKS,
    )

    cases = [
        "", " ", "   ", "\t", "a", "A  B\tC",
        "Hello, World! 123", "éàü Über naïve café",
        "日本語 text mixed ascii", "emoji 🙂 inside",
        "UPPER lower MiXeD", "a-b_c.d/e\\f",
        "  leading and trailing  ", "double  space   triple",
        "digits 007 42x9", "a" * 300, ("word " * 50).strip(),
        "newline\nin the middle", "quote ' and \" marks",
        "percent % and 100% done", "null\x00byte?",
        "ACCENTS ÉÀÜ UPPER", "ßharp and Straße",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "text"])
    got = {r["i"]: (r["n"], list(r["t"]), list(r["w"])) for r in df.select(
        "i",
        texts.normalize(F.col("text")).alias("n"),
        texts.tokens(F.col("text")).alias("t"),
        texts.tokenize_words(F.col("text")).alias("w")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)",
                    [(i, c) for i, c in enumerate(cases)])
    want = {i: (n, t, w) for i, n, t, w in con.execute(
        f"SELECT i, {SQL_NORM}, {SQL_TOKS}, {SQL_WTOKS} FROM c").fetchall()}
    for i, case in enumerate(cases):
        assert got[i] == want[i], (i, case[:40], got[i], want[i])


def test_hashing_and_charcode_sql_mirrors_on_adversarial_strings(spark):
    """hex_int / seeded_md5 / char_codes vs their DuckDB spellings —
    the deterministic-hash layer every md5-keyed oracle (sampling,
    sharding, LSH, fingerprints) rests on."""
    import duckdb

    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.functions import hashing, texts

    cases = ["", "a", "0", "wres:123", "gear:z", "déjà vu", "🙂",
             "a b  c", "UPPER", "x" * 200, "7:42", "neg:-5"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "text"])
    got = {r["i"]: (r["h"], r["sm"], list(r["cc"])) for r in df.select(
        "i",
        hashing.hex_int(F.col("text")).alias("h"),
        hashing.seeded_md5(7, F.col("text")).alias("sm"),
        texts.char_codes(F.col("text")).alias("cc")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)",
                    [(i, c) for i, c in enumerate(cases)])
    # NOTE the list_filter: DuckDB's regexp_split_to_array('', '') is
    # [''] (ascii 0), not [] — this test caught the unfiltered spelling
    # diverging from Spark's char_codes on empty-normalized text, and
    # the doc_cdc_chunks oracle was fixed to this filtered form.
    norm = ("trim(regexp_replace(regexp_replace(lower(text),"
            " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))")
    want = {i: (h, sm, cc) for i, h, sm, cc in con.execute(f"""
        SELECT i,
               CAST('0x' || substr(md5(text), 1, 15) AS BIGINT),
               md5('7:' || text),
               list_transform(
                 list_filter(regexp_split_to_array({norm}, ''),
                             x -> x != ''),
                 x -> CAST(ascii(x) AS BIGINT))
        FROM c""").fetchall()}
    for i, case in enumerate(cases):
        assert got[i] == want[i], (i, case[:30], got[i], want[i])


def test_cdc_chunks_oracle_agrees_on_empty_normalized_doc(spark, tmp_path):
    """The edge the adversarial mirror test caught: a doc whose text
    normalizes to '' (punctuation-only) must be EXCLUDED by both the
    Spark builder and the DuckDB oracle — before the r8 fix the oracle's
    unfiltered regexp_split_to_array gave it codes [0] and a phantom
    row."""
    import duckdb

    rows = [(1, "x", "real words here for chunking and more words"),
            (2, "x", "!!! ??? ...")]  # normalizes to ''
    spark.createDataFrame(rows, ["doc_id", "source", "text"]) \
        .write.parquet(str(tmp_path / "documents.parquet"))
    spec = next(s for s in Q.specs() if s.name == "doc_cdc_chunks")
    got = sorted(map(tuple, spec.builder(spark, str(tmp_path)).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet/*.parquet')")
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
    assert [r[0] for r in got] == [1]  # the punctuation doc is excluded
    assert got == want


def test_round_convention_agreement_and_known_divergence(spark):
    """Pin the cross-engine rounding contract the whole oracle layer
    rests on: Spark round() and DuckDB round() agree on half-integer
    boundaries (both half-away-from-zero) and on ordinary 2dp cases —
    but DIVERGE on doubles whose SHORTEST DECIMAL form ends in 5 at
    scale+1 while the binary value sits just below (round(1.005, 2):
    Spark rounds the shortest-decimal '1.005' HALF_UP -> 1.01 via
    BigDecimal.valueOf; DuckDB rounds the binary 1.00499... -> 1.00).
    Measure-zero for computed aggregates (their shortest reps ~never
    terminate at a half), which is why 154/154 oracles hash-green —
    this test documents the boundary so a future literal-valued oracle
    never trips it silently."""
    import duckdb

    cases = [(0.5, 0), (1.5, 0), (2.5, 0), (-0.5, 0), (-2.5, 0),
             (0.125, 2), (0.135, 2), (2.675, 2), (-0.125, 2)]
    df = spark.createDataFrame(
        [(i, float(v)) for i, (v, _) in enumerate(cases)], ["i", "v"])
    got = df.selectExpr(
        "i", *[f"round(v, {s}) as r{i}"
               for i, (_, s) in enumerate(cases)]).collect()
    srows = {r["i"]: r[f"r{r['i']}"] for r in got}
    con = duckdb.connect()
    for i, (v, s) in enumerate(cases):
        d = con.execute(
            f"select round(CAST({v!r} AS DOUBLE), {s})").fetchone()[0]
        assert abs(d - srows[i]) < 1e-12, (v, s, srows[i], d)
    # the KNOWN divergence, pinned so a behavior change is noticed
    sp = df.limit(1).selectExpr("round(CAST(1.005 AS DOUBLE), 2) as r") \
        .collect()[0]["r"]
    du = con.execute("select round(CAST(1.005 AS DOUBLE), 2)").fetchone()[0]
    assert sp == 1.01 and du == 1.0


def test_string_collation_contract_for_order_sensitive_oracles(spark):
    """Order-sensitive oracles (stringagg, sorted fingerprint lists,
    md5-of-sorted-ids) rely on BOTH engines sorting strings by binary
    UTF-8 — pinned here against engine upgrades (uppercase before
    lowercase, ASCII before accents before emoji, space before letters,
    lexicographic digits)."""
    import duckdb

    from pyspark.sql import functions as F

    arrs = [["b", "a", "B", "A"], ["é", "e", "z"], ["🙂", "a", "Z"],
            ["ab", "a b", "a"], ["10", "2", "1"]]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrs)],
                               ["i", "a"])
    got = {r["i"]: list(r["s"])
           for r in df.select("i", F.array_sort("a").alias("s")).collect()}
    con = duckdb.connect()
    for i, a in enumerate(arrs):
        lit = "[" + ",".join(f"'{x}'" for x in a) + "]"
        want = con.execute(f"select list_sort({lit})").fetchone()[0]
        assert got[i] == want, (a, got[i], want)
