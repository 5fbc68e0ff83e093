"""Cross-checks for the statistics / sampling / frontier operators added
in round 7: each Spark result is recomputed by an independent sequential
Python reference on the same inputs (the pattern test_dedup.py uses for
span stats) — the oracle harness proves Spark==DuckDB; these prove both
match the math."""

import hashlib
import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    spec = next(s for s in Q.specs() if s.name == name)
    return spec.builder(spark, sf)


def _tokenize_words(text: str) -> list[str]:
    """Python twin of functions/texts.py::tokenize_words."""
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _docs(cols: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


# ---------------------------------------------------------------------------
# skyline_2d
# ---------------------------------------------------------------------------

def test_skyline_matches_bruteforce_with_ties(spark):
    # Duplicates on both axes, same-key ties, and an interior point.
    rows = [(1, 10, 5.0), (2, 10, 5.0), (3, 10, 7.0), (4, 8, 4.0),
            (5, 8, 6.0), (6, 12, 9.0), (7, 12, 9.0), (8, 6, 4.0),
            (9, 6, 3.0), (10, 1, 1.0)]
    df = spark.createDataFrame(rows, ["id", "sz", "price"])
    got = {r.id for r in relational.skyline_2d(df, "sz", "price").collect()}

    def dominated(a):
        return any(
            b[1] >= a[1] and b[2] <= a[2] and (b[1] > a[1] or b[2] < a[2])
            for b in rows if b is not a)

    want = {a[0] for a in rows if not dominated(a)}
    assert got == want
    # the both-axis duplicates (1, 2) survive or die together
    assert (1 in got) == (2 in got)


def test_skyline_bucketed_continuous_matches_exact(spark):
    """The buckets= scale path (continuous max axis) must select exactly
    the same rows as the unbucketed form — the bucket witness only
    prunes provably-dominated rows, never decides."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.uniform(0, 100), round(rng.uniform(0, 100), 3))
            for i in range(400)]
    # clusters of exact ties on each axis to stress boundaries
    rows += [(1000 + i, 50.0, 10.0) for i in range(3)]
    rows += [(2000 + i, 99.5, 0.123) for i in range(2)]
    df = spark.createDataFrame(rows, ["id", "x", "price"])
    exact = {r.id for r in relational.skyline_2d(df, "x", "price").collect()}
    for b in (1, 4, 16):
        got = {r.id for r in
               relational.skyline_2d(df, "x", "price", buckets=b).collect()}
        assert got == exact, f"buckets={b}"

    def dominated(a):
        return any(b[1] >= a[1] and b[2] <= a[2]
                   and (b[1] > a[1] or b[2] < a[2])
                   for b in rows if b is not a)

    assert exact == {a[0] for a in rows if not dominated(a)}


def test_skyline_single_key_keeps_all_min_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, 2.0), (2, 5, 2.0), (3, 5, 9.0)], ["id", "sz", "price"])
    got = {r.id for r in relational.skyline_2d(df, "sz", "price").collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------------------
# corpus_weighted_reservoir
# ---------------------------------------------------------------------------

def test_weighted_reservoir_matches_sequential_es(spark):
    """The graded query's 25 winners must equal a sequential Python
    Efraimidis-Spirakis pass using the identical md5 key rule."""
    keyed = []
    for doc_id, n_chars in _docs("doc_id, n_chars"):
        h = hashlib.md5(f"wres:{doc_id}".encode()).hexdigest()
        u = (int(h[:15], 16) + 1.0) / 1152921504606846977.0
        wt = max(n_chars, 1)
        keyed.append((round(-math.log(u) / wt, 6), doc_id, wt))
    keyed.sort()
    want = [(i + 1, doc_id, wt, key)
            for i, (key, doc_id, wt) in enumerate(keyed[:25])]
    got = [(r["rank"], r["doc_id"], r["wt"], r["es_key"])
           for r in _run(spark, "corpus_weighted_reservoir").collect()]
    assert sorted(got) == want


def test_weighted_reservoir_bias_toward_heavy_docs(spark):
    """Selection probability rises with weight: the mean weight of the
    25 winners must exceed the corpus mean (deterministic given the
    fixture, and a real property — keys are -ln(u)/w)."""
    rows = _run(spark, "corpus_weighted_reservoir").collect()
    assert len(rows) == 25
    sample_mean = sum(r["wt"] for r in rows) / len(rows)
    pop = [max(c, 1) for (c,) in _docs("n_chars")]
    assert sample_mean > sum(pop) / len(pop)


# ---------------------------------------------------------------------------
# text_kl_drift
# ---------------------------------------------------------------------------

def test_kl_drift_matches_python_reference(spark):
    cp, cq = {}, {}
    np_ = nq = 0
    for doc_id, text in _docs("doc_id, text"):
        side = cp if doc_id % 2 == 0 else cq
        for t in _tokenize_words(text):
            side[t] = side.get(t, 0) + 1
    np_ = sum(cp.values())
    nq = sum(cq.values())
    vocab = set(cp) | set(cq)
    v = len(vocab)
    kl_pq = kl_qp = js = 0.0
    for t in vocab:
        p = (cp.get(t, 0) + 1.0) / (np_ + v)
        q = (cq.get(t, 0) + 1.0) / (nq + v)
        m = 0.5 * p + 0.5 * q
        kl_pq += p * math.log(p / q)
        kl_qp += q * math.log(q / p)
        js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    row = _run(spark, "text_kl_drift").collect()[0]
    assert row["vocab"] == v
    assert row["n_tokens_p"] == np_ and row["n_tokens_q"] == nq
    assert row["kl_pq"] == pytest.approx(kl_pq, abs=2e-6)
    assert row["kl_qp"] == pytest.approx(kl_qp, abs=2e-6)
    assert row["js"] == pytest.approx(js, abs=2e-6)
    # JS is symmetric, bounded by ln2, and below both KLs' average
    assert 0.0 <= row["js"] <= math.log(2.0)
    assert row["js"] <= (row["kl_pq"] + row["kl_qp"]) / 2 + 1e-9


# ---------------------------------------------------------------------------
# orders_mad_outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_matches_numpy_reference(spark):
    import numpy as np

    con = duckdb.connect()
    prices = con.execute(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF}/orders.parquet')").fetchall()
    x = np.array([p for _, p in prices])
    med = float(np.percentile(x, 50, method="linear"))
    mad = float(np.percentile(np.abs(x - med), 50, method="linear"))
    scored = sorted(
        ((round(0.6745 * (p - med) / mad, 4), k, p) for k, p in prices),
        key=lambda t: (-abs(t[0]), t[1]))
    want = [(k, round(p, 2), rz) for rz, k, p in scored[:20]]
    got = [(r["o_orderkey"], r["o_totalprice"], r["robust_z"])
           for r in _run(spark, "orders_mad_outliers").collect()]
    assert got == want


# ---------------------------------------------------------------------------
# corpus_doremi_reweight
# ---------------------------------------------------------------------------

def test_doremi_weights_normalize_and_follow_excess_loss(spark):
    rows = _run(spark, "corpus_doremi_reweight").collect()
    assert len(rows) >= 2
    assert sum(r["new_weight"] for r in rows) == pytest.approx(1.0, abs=1e-3)
    assert sum(r["old_share"] for r in rows) == pytest.approx(1.0, abs=1e-3)
    # exponentiated gradient: the up/down ratio new/old is exp(nll -
    # nll_bar)/Z, so it must increase with the domain's nll. The outputs
    # round to 6 decimals, which can flip the ratio for domains whose
    # nll differs by ~1e-6 — require the ordering only across gaps the
    # rounding cannot produce (weights ~0.05, so ratio noise ~2e-5).
    by_nll = sorted(rows, key=lambda r: r["avg_nll"])
    for a, b in zip(by_nll, by_nll[1:]):
        if b["avg_nll"] - a["avg_nll"] > 5e-5:
            assert (b["new_weight"] / b["old_share"]
                    > a["new_weight"] / a["old_share"])
    # and the extremes are unambiguous: worst-fit domain up, best down
    assert by_nll[-1]["new_weight"] > by_nll[-1]["old_share"]
    assert by_nll[0]["new_weight"] < by_nll[0]["old_share"]


# ---------------------------------------------------------------------------
# hll_distinct_audit
# ---------------------------------------------------------------------------

def _hll_registers(rows):
    """Python reference: the (bucket, max leading-zero rank) registers the
    query builds, from the identical md5 rule."""
    regs = {}
    for (k,) in rows:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        b, w = h % 256, h >> 8
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_merge_by_cellwise_max(spark):
    """The docstring's shard-merge claim: registers built on two disjoint
    halves, merged by cell-wise max, equal the whole-corpus registers —
    and the Spark estimate equals the Python reference estimate."""
    con = duckdb.connect()
    keys = con.execute(
        f"SELECT o_custkey FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    whole = _hll_registers(keys)
    h1 = _hll_registers(keys[: len(keys) // 2])
    h2 = _hll_registers(keys[len(keys) // 2:])
    merged = {b: max(h1.get(b, 0), h2.get(b, 0)) for b in set(h1) | set(h2)}
    assert merged == whole

    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -whole.get(j, 0) for j in range(m))
    e = alpha * m * m / s
    zeros = m - len(whole)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    row = _run(spark, "hll_distinct_audit").collect()[0]
    assert row["m"] == m
    assert row["nonzero_registers"] == len(whole)
    assert row["n_est"] == pytest.approx(round(e, 2), abs=0.02)
    assert row["n_exact"] == len({k for (k,) in keys})
    # sketch honesty: error within 5x the theoretical 1.04/sqrt(m)
    assert abs(row["err_pct"]) < 100 * 5 * 1.04 / math.sqrt(m)


# ---------------------------------------------------------------------------
# table_profile (exact vs approx scale switch)
# ---------------------------------------------------------------------------

def test_table_profile_approx_drops_expand_within_hll_tolerance(spark):
    """Plan shapes per the r17 contract: the exact form is a UNION of
    per-column single-DISTINCT aggregates (no Expand row fan-out
    anywhere); approx=True is the one-pass form — a single aggregate of
    HLL sketches (no Expand, no Union). Nulls and min/max stay EXACT,
    and the approximate distinct counts land within HLL++ tolerance
    (default 5% rsd) of the exact ones."""
    cols = [("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_orderstatus", "str"), ("o_totalprice", "num"),
            ("o_orderdate", "ts"), ("o_orderpriority", "str")]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    exact = relational.table_profile(o, cols)
    approx = relational.table_profile(o, cols, approx=True)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in exact_plan
    assert "Union" in exact_plan
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx_plan
    assert "Union" not in approx_plan
    ex = {r["column_name"]: r for r in exact.collect()}
    ap = {r["column_name"]: r for r in approx.collect()}
    assert set(ex) == set(ap) == {c for c, _ in cols}
    for c in ex:
        assert ap[c]["n_nulls"] == ex[c]["n_nulls"]
        assert ap[c]["min_num"] == ex[c]["min_num"]
        assert ap[c]["max_num"] == ex[c]["max_num"]
        nd_ex, nd_ap = ex[c]["n_distinct"], ap[c]["n_distinct"]
        assert abs(nd_ap - nd_ex) <= max(4 * 0.05 * nd_ex, 2), \
            (c, nd_ex, nd_ap)


def test_table_profile_rejects_non_identifier_column_names(spark):
    """Column names are interpolated into the generated stack()
    expression — names that could splice into the SQL string (quotes,
    commas, spaces) are rejected up front instead of silently producing
    a broken or injected expression."""
    import pytest

    df = spark.range(3).select(
        F.col("id"), F.col("id").alias("o'brien"))
    for bad in ["o'brien", "a,b", "a b", "1lead", ""]:
        with pytest.raises(ValueError, match="not a plain identifier"):
            relational.table_profile(df, [(bad, "num")])
    # plain identifiers still profile fine
    out = {r["column_name"]: r
           for r in relational.table_profile(df, [("id", "num")]).collect()}
    assert out["id"]["n_distinct"] == 3


# ---------------------------------------------------------------------------
# equidepth_histogram
# ---------------------------------------------------------------------------

def test_equidepth_histogram_matches_percentile_reference(spark):
    import numpy as np

    con = duckdb.connect()
    vals = [v for (v,) in con.execute(
        f"SELECT o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()]
    k = 8
    x = np.array(vals)
    bounds = [float(np.percentile(x, 100 * i / k, method="linear"))
              for i in range(1, k)]

    def bucket(v):
        return 1 + sum(1 for b in bounds if b < v)

    want = {}
    for v in vals:
        b = bucket(v)
        lo, hi, n = want.get(b, (v, v, 0))
        want[b] = (min(lo, v), max(hi, v), n + 1)

    rows = relational.equidepth_histogram(
        spark.read.parquet(f"{SF}/orders.parquet"), "o_totalprice", k
    ).collect()
    got = {r["bucket"]: (r["lo"], r["hi"], r["n_rows"]) for r in rows}
    assert set(got) == set(want)
    for b in want:
        assert got[b][2] == want[b][2], b
        assert got[b][0] == pytest.approx(want[b][0], abs=1e-9)
        assert got[b][1] == pytest.approx(want[b][1], abs=1e-9)
    # equi-depth up to tie mass: every bucket within 2x of the ideal
    n = len(vals)
    assert all(cnt <= 2 * n / k + 1 for _, _, cnt in got.values())
    assert sum(cnt for _, _, cnt in got.values()) == n


def test_equidepth_histogram_handles_heavy_ties(spark):
    """A value owning >1/k of the mass must land in ONE bucket (boundary
    ties never split), and counts still total n."""
    rows = [(i, 5.0) for i in range(50)] + [(100 + i, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = relational.equidepth_histogram(df, "v", 4).collect()
    assert sum(r["n_rows"] for r in got) == len(rows)
    fives = [r for r in got if r["lo"] <= 5.0 <= r["hi"]]
    assert sum(r["n_rows"] for r in fives if r["lo"] == 5.0 == r["hi"]) >= 50 or \
        any(r["n_rows"] >= 50 for r in fives)
    # duplicate boundaries collapse: bucket ids stay DENSE 1..k' (k' <= k)
    ids = sorted(r["bucket"] for r in got)
    assert ids == list(range(1, len(ids) + 1))
    assert len(ids) <= 4


def test_equidepth_histogram_renumbers_past_empty_buckets(spark):
    """Sparse data where no value falls between two interpolated
    boundaries (the hypothesis-found hole): ids must still come out
    dense — the final dense_rank renumbers past the empty raw bucket."""
    df = spark.createDataFrame([(0, 0.0), (1, 1.0)], ["id", "v"])
    got = sorted((r["bucket"], r["lo"], r["n_rows"])
                 for r in relational.equidepth_histogram(df, "v", 3).collect())
    assert got == [(1, 0.0, 1), (2, 1.0, 1)]


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

def test_psi_drift_matches_numpy_reference(spark):
    """PSI between the two time halves == a sequential numpy replay of
    the same conventions (baseline-decile boundaries with linear
    interpolation, strictly-below bucketing, add-half smoothing over
    observed buckets)."""
    import numpy as np

    rng = np.random.RandomState(11)
    n = 400
    ts = np.arange(n)  # first half baseline, second half current
    vals = np.where(ts < n // 2,
                    rng.normal(50, 10, n),
                    rng.normal(62, 14, n))  # shifted + widened: real drift
    df = spark.createDataFrame(
        [(int(t), float(v)) for t, v in zip(ts, vals)], ["ts", "v"])
    got = {r["bucket"]: r
           for r in relational.psi_drift(df, "v", "ts", bins=10).collect()}

    mid = (0 + (n - 1)) // 2
    base, curr = vals[ts < mid], vals[ts >= mid]
    bs = sorted(set(np.percentile(base, [10 * i for i in range(1, 10)],
                                  method="linear")))
    def bucket(v):
        return 1 + sum(1 for b in bs if b < v)
    import collections
    nb_c = collections.Counter(bucket(v) for v in base)
    nc_c = collections.Counter(bucket(v) for v in curr)
    buckets = sorted(set(nb_c) | set(nc_c))
    k = len(buckets)
    total = 0.0
    dense = {b: i + 1 for i, b in enumerate(buckets)}
    terms = {}
    for b in buckets:
        p = (nb_c[b] + 0.5) / (len(base) + 0.5 * k)
        q = (nc_c[b] + 0.5) / (len(curr) + 0.5 * k)
        t = (q - p) * math.log(q / p)
        total += t
        terms[dense[b]] = (nb_c[b], nc_c[b], p, q, t)
    assert set(got) == set(terms)
    for b, (nbase, ncurr, p, q, t) in terms.items():
        r = got[b]
        assert (r["n_base"], r["n_curr"]) == (nbase, ncurr)
        assert r["base_pct"] == pytest.approx(p, abs=1e-6)
        assert r["curr_pct"] == pytest.approx(q, abs=1e-6)
        assert r["psi_term"] == pytest.approx(t, abs=1e-6)
        assert r["psi_total"] == pytest.approx(total, abs=1e-5)
    # the synthetic shift is a real drift: psi over the action threshold
    assert total > 0.25


def test_psi_drift_stable_distribution_and_validation(spark):
    """Same distribution in both halves -> psi ~ 0; fractional ts and
    bad bins are rejected."""
    import numpy as np

    rng = np.random.RandomState(3)
    vals = rng.normal(0, 1, 1000)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(np.concatenate(
            [vals, vals]))], ["ts", "v"])
    rows = relational.psi_drift(df, "v", "ts", bins=10).collect()
    assert rows and abs(rows[0]["psi_total"]) < 0.01
    with pytest.raises(ValueError, match="bins must be >= 2"):
        relational.psi_drift(df, "v", "ts", bins=1)
    frac = df.withColumn("ts", F.col("ts").cast("double"))
    with pytest.raises(TypeError, match="integer epoch-units"):
        relational.psi_drift(frac, "v", "ts")


# ---------------------------------------------------------------------------
# target_encode_loo
# ---------------------------------------------------------------------------

def test_target_encode_loo_math(spark):
    """LOO mean drops exactly the row's own contribution; the smoothed
    form blends toward the global mean with weight m; a singleton
    category yields null LOO (no other rows to average)."""
    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, ["cat", "v"])
    got = {(r["cat"], r["v"]): r for r in
           relational.target_encode_loo(df, "cat", "v", m=2.0).collect()}
    gm = (10 + 20 + 30 + 100) / 4
    # a/10: others are 20,30 -> 25; smooth = (50 + 2*40)/(2+2) = 32.5
    assert got[("a", 10.0)]["te_loo"] == pytest.approx(25.0)
    assert got[("a", 10.0)]["te_smooth"] == pytest.approx(
        (50 + 2 * gm) / 4)
    assert got[("a", 20.0)]["te_loo"] == pytest.approx(20.0)
    # singleton category: LOO undefined, smoothing pure global pull
    assert got[("b", 100.0)]["te_loo"] is None
    assert got[("b", 100.0)]["te_smooth"] == pytest.approx(
        (0 + 2 * gm) / 2)
    assert got[("b", 100.0)]["cat_n"] == 1


# ---------------------------------------------------------------------------
# key_skew_profile
# ---------------------------------------------------------------------------

def test_key_skew_profile_ranks_and_ratio(spark):
    """Heavy key leads; shares/cumulative shares are exact fractions;
    skew_ratio = max_cnt / mean_cnt."""
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    out = relational.key_skew_profile(df, "k", top=2).collect()
    assert [(r["rank"], r["k"], r["cnt"]) for r in out] == [
        (1, "hot", 6), (2, "warm", 3)]
    assert out[0]["share"] == pytest.approx(0.6)
    assert out[1]["cum_share"] == pytest.approx(0.9)
    assert out[0]["n_keys"] == 3
    # max/mean = 6 / (10/3) = 1.8
    assert out[0]["skew_ratio"] == pytest.approx(1.8)


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------

def test_mutual_information_independent_and_dependent(spark):
    """Product-of-marginals cells give MI == 0; a deterministic mapping
    x->y gives MI == H(x) (here ln 2 for a uniform binary x)."""
    indep = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(5)],
        ["x", "y"])
    got = relational.mutual_information(indep, "x", "y").collect()
    assert all(r["mi_total"] == pytest.approx(0.0, abs=1e-6) for r in got)
    assert all(r["pmi"] == pytest.approx(0.0, abs=1e-6) for r in got)

    dep = spark.createDataFrame(
        [("a", "c")] * 5 + [("b", "d")] * 5, ["x", "y"])
    got2 = relational.mutual_information(dep, "x", "y").collect()
    assert got2[0]["mi_total"] == pytest.approx(math.log(2), abs=1e-6)


# ---------------------------------------------------------------------------
# roc_auc_binned
# ---------------------------------------------------------------------------

def test_roc_auc_binned_separable_and_random(spark):
    """A perfectly separating score reaches AUC 1.0 once a bin boundary
    falls between the classes; label-independent scores sit at ~0.5; a
    perfect anti-predictor at ~0.0."""
    pos = [(float(100 + i), True) for i in range(50)]
    neg = [(float(i), False) for i in range(50)]
    df = spark.createDataFrame(pos + neg, ["s", "y"])
    out = relational.roc_auc_binned(df, "s", F.col("y"), bins=10).collect()
    assert out[0]["auc_total"] == pytest.approx(1.0, abs=1e-6)
    # curve endpoints: last cumulative point is (1, 1)
    last = max(out, key=lambda r: r["point"])
    assert (last["fpr"], last["tpr"]) == (1.0, 1.0)

    anti = relational.roc_auc_binned(
        df, "s", ~F.col("y"), bins=10).collect()
    assert anti[0]["auc_total"] == pytest.approx(0.0, abs=1e-6)

    flat = spark.createDataFrame(
        [(float(i), i % 2 == 0) for i in range(200)], ["s", "y"])
    mid = relational.roc_auc_binned(flat, "s", F.col("y"), bins=10).collect()
    assert mid[0]["auc_total"] == pytest.approx(0.5, abs=0.05)

    with pytest.raises(ValueError, match="bins must be >= 2"):
        relational.roc_auc_binned(df, "s", F.col("y"), bins=1)


# ---------------------------------------------------------------------------
# rolling_anomaly
# ---------------------------------------------------------------------------

def test_rolling_anomaly_flags_spike_not_coldstart(spark):
    """A 10-sigma spike after a stable run is flagged with the right
    trailing stats; rows inside the min_n cold-start window and a
    zero-variance prefix never alert."""
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 10.1, 9.9, 10.0,
            50.0]  # spike at the end
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    # user 2: constant series then one repeat -> sd == 0, never flagged
    rows += [(2, i, 100 + i, 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, ["u", "t", "eid", "v"])
    out = relational.rolling_anomaly(
        df, key="u", ts="t", value="v", id_col="eid",
        w=20, z_thresh=3.0, min_n=8).collect()
    assert [(r["u"], r["t"]) for r in out] == [(1, 10)]
    r = out[0]
    prior = vals[:10]
    mean = sum(prior) / len(prior)
    sd = math.sqrt(sum((x - mean) ** 2 for x in prior) / (len(prior) - 1))
    assert r["roll_mean"] == pytest.approx(mean, abs=1e-6)
    assert r["roll_std"] == pytest.approx(sd, abs=1e-6)
    assert r["zscore"] == pytest.approx((50 - mean) / sd, abs=1e-3)
    assert r["n_prior"] == 10


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------

def test_welch_ttest_matches_manual_computation(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    df = spark.createDataFrame(
        [(0, v) for v in a] + [(1, v) for v in b], ["variant", "v"])
    r = relational.welch_ttest(df, "variant", "v").collect()[0]
    import statistics as st
    ma, mb = st.mean(a), st.mean(b)
    va, vb = st.variance(a), st.variance(b)
    sa, sb = va / len(a), vb / len(b)
    t = (ma - mb) / math.sqrt(sa + sb)
    dfw = (sa + sb) ** 2 / (sa ** 2 / (len(a) - 1) + sb ** 2 / (len(b) - 1))
    assert (r["n_a"], r["n_b"]) == (5, 6)
    assert r["mean_a"] == pytest.approx(ma, abs=1e-4)
    assert r["var_b"] == pytest.approx(vb, abs=1e-4)
    assert r["t_stat"] == pytest.approx(t, abs=1e-4)
    assert r["df_welch"] == pytest.approx(dfw, abs=0.01)
    assert r["significant_05"] == (abs(t) > 1.96)


def test_welch_ttest_rejects_non_binary_variant(spark):
    """The r9-advice fix: a third variant value would silently mix
    moments from DIFFERENT groups through the non-zero max fold, so the
    plan raises on the first non-{0,1} (or null) variant."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    three = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (0, 4.0), (1, 5.0), (2, 6.0)],
        ["variant", "v"])
    with pytest.raises(SparkRuntimeException, match="binary"):
        relational.welch_ttest(three, "variant", "v").collect()

    withnull = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (None, 3.0), (0, 4.0)], ["variant", "v"])
    with pytest.raises(SparkRuntimeException, match="binary"):
        relational.welch_ttest(withnull, "variant", "v").collect()


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_textbook_curve(spark):
    """10 subjects: 2 fail at t=1, 1 censored at t=2, 3 fail at t=3,
    4 censored at t=5. S(1)=0.8, S(3)=0.8*(1-3/7), censoring rows keep
    the prior S."""
    rows = ([(1, 1)] * 2 + [(2, 0)] + [(3, 1)] * 3 + [(5, 0)] * 4)
    df = spark.createDataFrame(rows, ["t", "obs"])
    got = {r["t"]: r for r in
           relational.kaplan_meier(df, "t", "obs").collect()}
    assert got[1]["n_risk"] == 10 and got[1]["n_event"] == 2
    assert got[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    assert got[2]["survival"] == pytest.approx(0.8, abs=1e-6)  # censor only
    assert got[2]["n_risk"] == 8
    assert got[3]["n_risk"] == 7
    assert got[3]["survival"] == pytest.approx(0.8 * (1 - 3 / 7), abs=1e-6)
    assert got[5]["survival"] == pytest.approx(0.8 * (1 - 3 / 7), abs=1e-6)


def test_kaplan_meier_total_failure_pins_zero(spark):
    """When everyone at risk fails at once, S hits exactly 0.0 and stays
    there (the ln(0) row is excluded from the sum, the dead latch rules)."""
    rows = [(1, 1)] * 3 + [(2, 1)] * 2  # all 5 observed, none survive t=2
    df = spark.createDataFrame(rows, ["t", "obs"])
    got = {r["t"]: r["survival"] for r in
           relational.kaplan_meier(df, "t", "obs").collect()}
    assert got[1] == pytest.approx(0.4, abs=1e-6)
    assert got[2] == 0.0


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

def test_benford_audit_digits_and_chi(spark):
    """Digit extraction survives sub-1.00 values (cents math); a corpus
    drawn exactly from the Benford pmf has chi-square ~0; a uniform-
    digit corpus is far from it."""
    # 100 values whose leading digits follow Benford counts 30,18,12,...
    counts = {1: 30, 2: 18, 3: 12, 4: 10, 5: 8, 6: 7, 7: 6, 8: 5, 9: 4}
    rows = [(float(d * 10 + 1) + 0.25,) for d, c in counts.items()
            for _ in range(c)]
    df = spark.createDataFrame(rows, ["x"])
    out = {r["digit"]: r for r in
           relational.benford_audit(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n"] == 30
    assert out[1]["obs_pct"] == pytest.approx(0.30, abs=1e-6)
    assert out[1]["exp_pct"] == pytest.approx(
        math.log10(2), abs=1e-6)
    assert out[1]["chisq_total"] < 1.0  # near-Benford

    sub = spark.createDataFrame([(0.07,), (0.4,), (123.45,)], ["x"])
    out = {r["digit"]: r["n"] for r in
           relational.benford_audit(sub, "x").collect()}
    # all NINE domain rows always present; absent digits carry n = 0
    assert set(out) == set(range(1, 10))
    assert sorted(d for d, n in out.items() if n > 0) == [1, 4, 7]

    uni = spark.createDataFrame(
        [(float(d) ,) for d in range(1, 10) for _ in range(20)], ["x"])
    chi = relational.benford_audit(uni, "x").collect()[0]["chisq_total"]
    assert chi > 20  # uniform digits are nothing like Benford


def test_benford_audit_absent_digit_contributes_chi_term(spark):
    """The r9-advice fix: a digit with ZERO occurrences still contributes
    its (0 - E)^2 / E * N term — the textbook goodness-of-fit. Verified
    against a full manual chi-square over all nine digits."""
    # digits 1..8 present (20 each), digit 9 absent entirely
    df = spark.createDataFrame(
        [(float(d),) for d in range(1, 9) for _ in range(20)], ["x"])
    out = {r["digit"]: r for r in
           relational.benford_audit(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    assert out[9]["n"] == 0 and out[9]["obs_pct"] == 0.0
    n_total = 160
    chi = sum((((20 if d < 9 else 0) / n_total - math.log10(1 + 1 / d)) ** 2
               / math.log10(1 + 1 / d)) * n_total for d in range(1, 10))
    assert out[1]["chisq_total"] == pytest.approx(chi, abs=1e-3)
    # dropping digit 9's term (the pre-fix statistic) must NOT match
    chi_missing = chi - math.log10(1 + 1 / 9) * n_total
    assert abs(out[1]["chisq_total"] - chi_missing) > 1.0


# ---------------------------------------------------------------------------
# fd_violations
# ---------------------------------------------------------------------------

def test_fd_violations_ranks_and_summary(spark):
    rows = [("p1", "s1"), ("p1", "s2"), ("p1", "s3"),   # 3 distinct rhs
            ("p2", "s1"), ("p2", "s1"), ("p2", "s2"),   # 2 distinct rhs
            ("p3", "s9"), ("p3", "s9")]                 # FD holds
    df = spark.createDataFrame(rows, ["p", "s"])
    out = relational.fd_violations(df, "p", "s", top=5).collect()
    assert [(r["p"], r["n_rhs"], r["n_rows"]) for r in out] == [
        ("p1", 3, 3), ("p2", 2, 3)]
    assert out[0]["n_keys"] == 3 and out[0]["n_violating"] == 2
    assert out[0]["fd_holds_pct"] == pytest.approx(1 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------

def test_cusum_changepoint_localizes_step(spark):
    """A clean level shift: |CUSUM| peaks at the last pre-shift bin, the
    per-bin means and running sums match a sequential replay, and the
    integer-ts guard rejects fractional timestamps."""
    # 6 bins at mean 10, then 6 bins at mean 30 (bin_ms = 100)
    rows = [(b * 100 + o, 10.0 if b < 6 else 30.0)
            for b in range(12) for o in (5, 50)]
    df = spark.createDataFrame(rows, ["t", "v"])
    out = {r["bin_idx"]: r for r in relational.cusum_changepoint(
        df, ts="t", value="v", bin_ms=100).collect()}
    assert len(out) == 12
    xbar = 20.0
    run, peak_bin, peak = 0.0, None, -1.0
    for b in range(12):
        run += (10.0 if b < 6 else 30.0) - xbar
        if abs(run) > peak:
            peak, peak_bin = abs(run), b
        assert out[b]["cusum"] == pytest.approx(run, abs=1e-6)
        assert out[b]["n"] == 2
    assert peak_bin == 5  # last pre-shift bin
    assert all(r["changepoint_bin"] == 5 for r in out.values())
    assert out[5]["is_changepoint"] and not out[4]["is_changepoint"]
    assert out[0]["max_abs_cusum"] == pytest.approx(peak, abs=1e-6)

    frac = df.withColumn("t", F.col("t").cast("double"))
    with pytest.raises(TypeError, match="integer epoch-units"):
        relational.cusum_changepoint(frac, ts="t", value="v")


def test_ts_name_interpolating_ops_reject_non_identifier(spark):
    """The r9-advice fix: psi_drift / ecdf_drift / cusum_changepoint
    interpolate the ts column NAME into a generated F.expr string, so a
    name needing backticks is rejected up front (same contract as
    table_profile's stack() guard) instead of breaking or splicing the
    expression."""
    df = (spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)],
                                ["t", "v"])
          .withColumnRenamed("t", "t s"))
    for op, kw in ((relational.psi_drift, {"bins": 2}),
                   (relational.ecdf_drift, {"bins": 2}),
                   (relational.cusum_changepoint, {"bin_ms": 100})):
        with pytest.raises(ValueError, match="plain identifier"):
            op(df, value="v", ts="t s", **kw)


def test_r11_guard_sweep_rejects_non_identifier_names(spark):
    """The r11 sweep closing the remaining name-interpolating F.expr
    sites (docs/BACKLOG.md): binned_range_join (left_ts/right_ts),
    kcenter_select / pca_power / kmeans_lloyd (vec_col), and
    vocab_growth_curve's bucket closure — each rejects a name that
    would need backticks instead of splicing it into generated SQL."""
    from data_pipeline_eng_project_1_spark.operators import dedup, similarity

    ev = spark.createDataFrame([(1, 10, 1.0)], ["k", "t", "v"])
    bad = ev.withColumnRenamed("t", "t s")
    with pytest.raises(ValueError, match="plain identifier"):
        relational.binned_range_join(bad, ev, "k", "t s", "t", 0, 100)
    with pytest.raises(ValueError, match="plain identifier"):
        relational.binned_range_join(ev, bad, "k", "t", "t s", 0, 100)

    vecs = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                 ["vec_id", "embedding"])
    badv = vecs.withColumnRenamed("embedding", "e mb")
    with pytest.raises(ValueError, match="plain identifier"):
        similarity.kcenter_select(badv, vec_col="e mb", id_col="vec_id",
                                  k=2)
    with pytest.raises(ValueError, match="plain identifier"):
        similarity.pca_power(badv, vec_col="e mb", id_col="vec_id", dim=2)
    with pytest.raises(ValueError, match="plain identifier"):
        similarity.kmeans_lloyd(badv, k=1, iters=0, vec_col="e mb",
                                id_col="vec_id", dim=2)

    # vocab_growth_curve guards its INTERNAL interpolation closure; the
    # public surface still works (ids/text aliased internally)
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")],
                                 ["doc_id", "text"])
    assert dedup.vocab_growth_curve(docs, checkpoints=2).count() == 2


def test_rolling_anomaly_null_values_skip_frame_slots(spark):
    """The r9-advice fix: null values are dropped BEFORE the trailing
    window (the streaming twin's value-ring semantics), so with w=4 a
    null between observations does NOT shrink n_prior — the spike is
    scored against the last 4 non-null values, exactly as if the null
    rows were never there."""
    vals = [10.0, None, 10.2, None, 9.8, 10.0, 10.1, None, 9.9, 10.0,
            50.0]
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "u int, t int, eid int, v double")
    out = relational.rolling_anomaly(
        df, key="u", ts="t", value="v", id_col="eid",
        w=4, z_thresh=3.0, min_n=4).collect()
    dense = [(1, i, i, v) for i, v in
             enumerate([x for x in vals if x is not None])]
    want = relational.rolling_anomaly(
        spark.createDataFrame(dense, ["u", "t", "eid", "v"]),
        key="u", ts="t", value="v", id_col="eid",
        w=4, z_thresh=3.0, min_n=4).collect()
    assert [(r["u"], r["v"], r["n_prior"], r["roll_mean"],
             r["roll_std"], r["zscore"]) for r in out] == \
        [(r["u"], r["v"], r["n_prior"], r["roll_mean"],
          r["roll_std"], r["zscore"]) for r in want]
    assert len(out) == 1 and out[0]["v"] == 50.0
    assert out[0]["n_prior"] == 4  # nulls never occupied frame slots


# ---------------------------------------------------------------------------
# round-10 banked operators (registration targets for round 11 —
# oracle specs pre-proven in tests/test_r11_oracle_specs.py)
# ---------------------------------------------------------------------------

def test_seasonal_outliers_flags_against_bucket_profile(spark):
    """A value normal at noon but 10-sigma for 3 AM alerts; rolling
    history is irrelevant (the profile is per hour-of-day, not causal).
    Cold buckets (< min_n) and constant buckets (sd=0) never alert."""
    rows = []
    eid = 0
    # 10 days of hour-0 values ~10, hour-12 values ~100
    for day in range(10):
        for hour, base in ((0, 10.0), (12, 100.0)):
            ts = (day * 24 + hour) * 3_600_000
            rows.append((eid, ts, base + (day % 3) * 0.1))
            eid += 1
    # the outlier: a 100-scale value at hour 0 (normal for hour 12)
    rows.append((999, 10 * 24 * 3_600_000, 100.0))
    # a cold bucket: 2 observations at hour 5, wildly spread
    rows += [(1000, 5 * 3_600_000, 1.0), (1001, 29 * 3_600_000, 500.0)]
    df = spark.createDataFrame(rows, "eid long, t long, v double")
    out = relational.seasonal_outliers(
        df, ts="t", value="v", id_col="eid",
        period_ms=3_600_000, cycle=24, z_thresh=3.0, min_n=8).collect()
    assert [(r["eid"], r["bucket"]) for r in out] == [(999, 0)]
    r = out[0]
    prior = [10.0 + (d % 3) * 0.1 for d in range(10)] + [100.0]
    mean = sum(prior) / len(prior)
    sd = math.sqrt(sum((x - mean) ** 2 for x in prior) / (len(prior) - 1))
    assert r["n_bucket"] == 11  # profile INCLUDES the outlier row
    assert r["base_mean"] == pytest.approx(mean, abs=1e-6)
    assert r["base_std"] == pytest.approx(sd, abs=1e-6)
    assert r["zscore"] == pytest.approx((100.0 - mean) / sd, abs=1e-3)

    with pytest.raises(ValueError, match="plain identifier"):
        relational.seasonal_outliers(
            df.withColumnRenamed("t", "t s"), ts="t s", value="v",
            id_col="eid")
    frac = df.withColumn("t", F.col("t").cast("double"))
    with pytest.raises(TypeError, match="integer epoch-units"):
        relational.seasonal_outliers(frac, ts="t", value="v", id_col="eid")


def test_kfold_audit_counts_and_shares(spark):
    """Fold assignment is the deterministic md5 hash (replayed here in
    Python), shares and gaps match a manual tally, and max_abs_gap is
    corpus-wide."""
    from data_pipeline_eng_project_1_spark.functions.hashing import (
        py_hex_int,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "s"])
    out = relational.kfold_assignment_audit(
        df, id_col="id", stratum="s", k=3, seed="fold").collect()
    # replay the assignment
    from collections import Counter
    cells = Counter((py_hex_int(f"fold:{i}") % 3, s) for i, s in rows)
    folds = Counter(f for f, _ in cells.elements())
    strata = Counter(s for _, s in cells.elements())
    got = {(r["fold"], r["s"]): r for r in out}
    assert set(got) == set(cells)
    gaps = []
    for (f, s), r in got.items():
        assert r["n"] == cells[(f, s)]
        assert r["fold_total"] == folds[f]
        share = cells[(f, s)] / folds[f]
        gshare = strata[s] / 300
        assert r["stratum_share"] == pytest.approx(share, abs=1e-6)
        assert r["global_share"] == pytest.approx(gshare, abs=1e-6)
        assert r["share_gap"] == pytest.approx(share - gshare, abs=1e-6)
        gaps.append(abs(share - gshare))
    assert out[0]["max_abs_gap"] == pytest.approx(max(gaps), abs=1e-6)
    with pytest.raises(ValueError, match="k must be >= 2"):
        relational.kfold_assignment_audit(df, "id", "s", k=1)


def test_calibration_bins_perfect_vs_overconfident(spark):
    """A perfectly calibrated score (label drawn to match the score in
    expectation, constructed deterministically) has small ECE; the same
    scores with inverted labels have large ECE. Brier matches the manual
    mean squared error."""
    rows = []
    # scores 0.05..0.95; label = 1 for exactly round(20*s) of each
    # score's 20 copies -> observed rate == score in every bucket
    for j, s in enumerate([i / 20 + 0.025 for i in range(20)]):
        n_pos = round(20 * s)
        for c in range(20):
            rows.append((float(s), 1 if c < n_pos else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    out = relational.calibration_bins(
        df, "score", F.col("y") == 1, bins=10).collect()
    assert sum(r["n"] for r in out) == len(rows)
    ece = out[0]["ece_total"]
    assert ece < 0.03
    brier = sum((s - y) ** 2 for s, y in rows) / len(rows)
    assert out[0]["brier_total"] == pytest.approx(brier, abs=1e-6)

    inv = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, y int")
    out2 = relational.calibration_bins(
        inv, "score", F.col("y") == 1, bins=10).collect()
    assert out2[0]["ece_total"] > 0.3
    with pytest.raises(ValueError, match="bins must be >= 2"):
        relational.calibration_bins(df, "score", F.col("y") == 1, bins=1)


def test_acf_binned_periodic_series(spark):
    """A period-4 count series has ACF ~ +1 at lag 4 and negative at lag
    2; the values match a NumPy reference computed over the gap-FILLED
    series (empty bins are real zeros)."""
    import numpy as np

    # counts per bin: 5,1,1,1 repeating, 40 bins; bin 1 of each cycle is
    # EMPTY (count would be 0 -> no rows) in cycles 3 and 7 -> gap-fill
    counts = []
    for cyc in range(10):
        counts += [5, 0 if cyc in (3, 7) else 1, 1, 1]
    rows = []
    eid = 0
    for b, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, b * 100 + 3),)
            eid += 1
    df = spark.createDataFrame(rows, "eid long, t long")
    out = {r["lag"]: r for r in relational.acf_binned(
        df, ts="t", bin_ms=100, max_lag=8).collect()}
    x = np.array(counts, dtype=float)
    c = x - x.mean()
    ss = float((c * c).sum())
    for lag in range(1, 9):
        want = float((c[:-lag] * c[lag:]).sum()) / ss
        assert out[lag]["acf"] == pytest.approx(want, abs=1e-6), lag
        assert out[lag]["n_pairs"] == len(counts) - lag
    assert out[4]["acf"] > 0.8 and out[2]["acf"] < 0
    with pytest.raises(ValueError, match="max_lag must be >= 1"):
        relational.acf_binned(df, ts="t", bin_ms=100, max_lag=0)


def test_acf_binned_constant_series_null(spark):
    df = spark.createDataFrame(
        [(i, b * 100) for b in range(10) for i in range(2)],
        "eid long, t long")
    out = relational.acf_binned(df, ts="t", bin_ms=100, max_lag=3).collect()
    assert all(r["acf"] is None for r in out)  # zero variance


def test_gini_by_group_textbook_values(spark):
    """Perfect equality -> 0; total concentration -> (n-1)/n; a known
    4-member split matches the rank-identity hand computation; zero-total
    group -> null; a negative value raises in-plan."""
    rows = ([("eq", f"m{i}", 10.0) for i in range(5)]
            + [("conc", "m0", 0.0), ("conc", "m1", 0.0),
               ("conc", "m2", 0.0), ("conc", "m3", 100.0)]
            + [("mix", "a", 1.0), ("mix", "b", 2.0),
               ("mix", "c", 3.0), ("mix", "d", 14.0)]
            + [("zero", "z1", 0.0), ("zero", "z2", 0.0)])
    df = spark.createDataFrame(rows, ["g", "id", "x"])
    out = {r["g"]: r for r in
           relational.gini_by_group(df, "g", "x", "id").collect()}
    assert out["eq"]["gini"] == pytest.approx(0.0, abs=1e-6)
    assert out["conc"]["gini"] == pytest.approx(3 / 4, abs=1e-6)
    # mix: sorted x = 1,2,3,14; G = 2*(1*1+2*2+3*3+4*14)/(4*20) - 5/4
    assert out["mix"]["gini"] == pytest.approx(
        2 * (1 + 4 + 9 + 56) / (4 * 20) - 5 / 4, abs=1e-6)
    assert out["zero"]["gini"] is None
    assert out["mix"]["n_members"] == 4
    assert out["mix"]["total_value"] == pytest.approx(20.0)

    from pyspark.errors.exceptions.captured import SparkRuntimeException
    neg = spark.createDataFrame(
        [("g", "a", 5.0), ("g", "b", -1.0)], ["g", "id", "x"])
    with pytest.raises(SparkRuntimeException, match="nonnegative"):
        relational.gini_by_group(neg, "g", "x", "id").collect()


def test_wilson_pass_rate_small_n_ranks_below_large_n(spark):
    """3/3 has a HIGHER raw rate but a LOWER Wilson bound than 950/1000
    — the whole point of the operator; bounds match the closed form."""
    rows = ([("tiny", True)] * 3
            + [("big", True)] * 950 + [("big", False)] * 50)
    df = spark.createDataFrame(rows, ["src", "ok"])
    out = {r["src"]: r for r in relational.wilson_pass_rate(
        df, "src", F.col("ok"), z=1.96).collect()}

    def wilson(p, n, z=1.96):
        return ((p + z * z / (2 * n)
                 - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
                / (1 + z * z / n))

    assert out["tiny"]["pass_rate"] == 1.0
    assert out["tiny"]["wilson_lower"] == pytest.approx(
        wilson(1.0, 3), abs=1e-6)
    assert out["big"]["wilson_lower"] == pytest.approx(
        wilson(0.95, 1000), abs=1e-6)
    assert out["tiny"]["pass_rate"] > out["big"]["pass_rate"]
    assert out["tiny"]["wilson_lower"] < out["big"]["wilson_lower"]


def test_session_top_paths_counts_within_sessions_only(spark):
    """Trigram runs count only inside a session: user 1's unbroken run
    yields overlapping trigrams with a known multiset; user 2's two
    2-event sessions yield none (no run crosses the gap)."""
    rows = [(1, t * 100, t, ty) for t, ty in
            enumerate(["A", "B", "C", "A", "B", "C"])]
    rows += [(2, 0, 100, "A"), (2, 100, 101, "B"),
             (2, 10_000_000, 102, "C"), (2, 10_000_100, 103, "D")]
    df = spark.createDataFrame(rows, ["u", "t", "eid", "ty"])
    out = relational.session_top_paths(
        df, key="u", ts="t", type_col="ty", id_col="eid",
        gap=1_000, path_len=3, top=10).collect()
    assert [(r["path"], r["n_occurrences"]) for r in out] == [
        ("A>B>C", 2), ("B>C>A", 1), ("C>A>B", 1)]
    assert out[0]["share"] == pytest.approx(0.5, abs=1e-6)
    # deterministic k-boundary: ties break by path text
    top2 = relational.session_top_paths(
        df, key="u", ts="t", type_col="ty", id_col="eid",
        gap=1_000, path_len=3, top=2).collect()
    assert [r["path"] for r in top2] == ["A>B>C", "B>C>A"]
    with pytest.raises(ValueError, match="path_len must be >= 2"):
        relational.session_top_paths(df, "u", "t", "ty", "eid", path_len=1)


def test_banked_ops_guard_degenerate_params_and_nulls(spark):
    """Edge hardening for the round-11 bank: degenerate cycle/period/
    bin/gap values are rejected up front (cycle=0 would divide by zero
    in the bucket fold); calibration raises in-plan on null scores/
    labels (they silently skew every rate otherwise); the Wilson gate
    counts null flags as failures (n_pass coalesces to 0)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ev = spark.createDataFrame(
        [(i, i * 1000, 1.0) for i in range(10)], "eid long, t long, v double")
    for bad in ({"period_ms": 0}, {"cycle": 0}):
        with pytest.raises(ValueError, match=">= 1"):
            relational.seasonal_outliers(
                ev, ts="t", value="v", id_col="eid", **bad)
    with pytest.raises(ValueError, match="bin_ms must be >= 1"):
        relational.acf_binned(ev.select("t"), ts="t", bin_ms=0)
    with pytest.raises(ValueError, match="gap must be >= 1"):
        relational.session_top_paths(
            ev.withColumn("ty", F.lit("A")), "eid", "t", "ty", "eid", gap=0)
    with pytest.raises(ValueError, match="z must be > 0"):
        relational.wilson_pass_rate(
            ev.withColumn("ok", F.lit(True)), "eid", F.col("ok"), z=0.0)

    nulled = spark.createDataFrame(
        [(0.5, 1), (0.7, None), (0.2, 0)], "score double, y int")
    with pytest.raises(SparkRuntimeException, match="null score/label"):
        relational.calibration_bins(
            nulled, "score", F.col("y") == 1, bins=2).collect()

    flags = spark.createDataFrame(
        [("a", True), ("a", None), ("b", None)], "src string, ok boolean")
    out = {r["src"]: r for r in relational.wilson_pass_rate(
        flags, "src", F.col("ok")).collect()}
    assert (out["a"]["n"], out["a"]["n_pass"]) == (2, 1)
    assert (out["b"]["n"], out["b"]["n_pass"]) == (1, 0)  # all-null -> 0
    assert out["b"]["pass_rate"] == 0.0


def test_banked_ops_review_fixes(spark):
    """Round-10 self-review fixes, pinned: (1) gini drops null values
    before ranking (a null would take rank 1 and inflate n_members while
    escaping the sums — verified corruption pre-fix); (2) acf omits lags
    with no overlapping pair instead of emitting negative n_pairs;
    (3) kfold raises in-plan on null ids (a null id has no fold)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    g = spark.createDataFrame(
        [("g", "a", None), ("g", "b", 100.0),
         ("allnull", "c", None)], "g string, id string, x double")
    out = {r["g"]: r for r in
           relational.gini_by_group(g, "g", "x", "id").collect()}
    assert set(out) == {"g"}  # the all-null group disappears
    assert out["g"]["n_members"] == 1
    assert out["g"]["gini"] == pytest.approx(0.0, abs=1e-9)

    short = spark.createDataFrame(
        [(i, b * 100) for b in range(10) for i in (b,)], "eid long, t long")
    rows = relational.acf_binned(short, ts="t", bin_ms=100,
                                 max_lag=24).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 10))
    assert all(r["n_pairs"] >= 1 for r in rows)

    nid = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "b")], "id int, s string")
    with pytest.raises(SparkRuntimeException, match="null id"):
        relational.kfold_assignment_audit(nid, "id", "s", k=2).collect()


def test_banked_ops_r10_advice_fixes(spark):
    """Round-10 ADVICE fixes on the bank, pinned BEFORE registration:
    (1) kfold rejects a stratum column whose name collides with an
    output column (a stratum literally named 'fold' or 'n' made the
    groupBy/select ambiguous); (2) session_top_paths raises in-plan on
    an event type containing the '>' path delimiter (distinct journeys
    would merge into one path string); (3) acf_binned raises in-plan
    when the gap-fill range exceeds max_bins (the fill sequence
    explodes from ONE row — an unbounded range materializes a near-2^31
    array on one executor) and validates max_bins >= max_lag + 1."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, fold string")
    with pytest.raises(ValueError, match="collides with an output"):
        relational.kfold_assignment_audit(df, "id", "fold", k=2)
    with pytest.raises(ValueError, match="collides with an output"):
        relational.kfold_assignment_audit(
            df.withColumnRenamed("fold", "n"), "id", "n", k=2)

    ev = spark.createDataFrame(
        [(1, 0, "A"), (1, 10, "B>C"), (1, 20, "D")],
        "u int, t long, ty string")
    with pytest.raises(SparkRuntimeException, match="path delimiter"):
        relational.session_top_paths(
            ev, "u", "t", "ty", "u", gap=1000, path_len=2).collect()
    clean = ev.withColumn("ty", F.regexp_replace("ty", ">", "-"))
    rows = relational.session_top_paths(
        clean, "u", "t", "ty", "u", gap=1000, path_len=2).collect()
    assert {r["path"] for r in rows} == {"A>B-C", "B-C>D"}

    wide = spark.createDataFrame(
        [(0,), (10_000_000,)], "t long")  # 100k bins at bin_ms=100
    with pytest.raises(SparkRuntimeException,
                       match="exceeds max_bins"):
        relational.acf_binned(wide, ts="t", bin_ms=100, max_lag=2,
                              max_bins=1000).collect()
    ok = relational.acf_binned(wide, ts="t", bin_ms=10_000_000,
                               max_lag=1, max_bins=2).collect()
    assert len(ok) == 1  # 2 bins, lag 1 has one pair
    with pytest.raises(ValueError, match="max_bins must be >="):
        relational.acf_binned(wide, ts="t", bin_ms=100, max_lag=5,
                              max_bins=3)


def test_srm_check_textbook_chi2_and_flag(spark):
    """60/40 of 100 against a declared 50/50 split: chi2 = (10^2)/50 * 2
    = 4.0 > 3.841 -> SRM flagged; a balanced 50/50 sample gives chi2 0
    and no flag."""
    skewed = spark.createDataFrame(
        [(i, i % 10 < 6) for i in range(100)], "id long, b boolean")
    df = skewed.select(F.col("b").cast("int").alias("variant"))
    out = {r["variant"]: r for r in relational.srm_check(
        df, "variant", {0: 0.5, 1: 0.5}, chi2_threshold=3.841).collect()}
    assert out[1]["n"] == 60 and out[0]["n"] == 40
    assert out[0]["chi2_total"] == pytest.approx(4.0)
    assert out[0]["dof"] == 1
    assert out[0]["srm_flag"] is True
    assert out[0]["observed_share"] == pytest.approx(0.4)

    balanced = spark.createDataFrame(
        [(i, i % 2) for i in range(100)], "id long, variant int")
    ok = relational.srm_check(
        balanced.select("variant"), "variant", {0: 0.5, 1: 0.5},
        chi2_threshold=3.841).collect()
    assert all(r["srm_flag"] is False for r in ok)
    assert all(r["chi2_total"] == pytest.approx(0.0) for r in ok)


def test_srm_check_absent_declared_and_undeclared_observed(spark):
    """A DECLARED variant with zero observations contributes its E*N
    chi term (the benford absent-digit lesson): 100 rows all variant 0
    against 50/50 -> chi2 = (100-50)^2/50 + (0-50)^2/50 = 100. An
    OBSERVED variant missing from expected raises in-plan."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    allzero = spark.createDataFrame(
        [(0,) for _ in range(100)], "variant int")
    rows = {r["variant"]: r for r in relational.srm_check(
        allzero, "variant", {0: 0.5, 1: 0.5},
        chi2_threshold=3.841).collect()}
    assert set(rows) == {0, 1} and rows[1]["n"] == 0
    assert rows[0]["chi2_total"] == pytest.approx(100.0)
    assert rows[1]["chi_term"] == pytest.approx(50.0)

    three = spark.createDataFrame(
        [(0,), (1,), (2,)], "variant int")
    with pytest.raises(SparkRuntimeException, match="not declared"):
        relational.srm_check(three, "variant", {0: 0.5, 1: 0.5},
                             chi2_threshold=3.841).collect()

    with pytest.raises(ValueError, match="sum to 1"):
        relational.srm_check(three, "variant", {0: 0.5, 1: 0.6},
                             chi2_threshold=3.841)
    with pytest.raises(ValueError, match=">= 2 variants"):
        relational.srm_check(three, "variant", {0: 1.0},
                             chi2_threshold=3.841)
    with pytest.raises(ValueError, match="must be > 0"):
        relational.srm_check(three, "variant", {0: 0.5, 1: 0.5},
                             chi2_threshold=0.0)


def test_srm_check_name_guards_and_null_variant_diag(spark):
    """Pre-registration review fixes: the variant name is interpolated
    into the domain frame's DDL schema, so it must be a plain
    identifier and must not collide with the audit's output aliases;
    a NULL variant (broken assignment logging) raises with a READABLE
    'NULL' diagnostic instead of a message-less error."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(0,), (1,)], "variant int")
    with pytest.raises(ValueError, match="plain identifier"):
        relational.srm_check(
            df.withColumnRenamed("variant", "my variant"), "my variant",
            {0: 0.5, 1: 0.5}, chi2_threshold=3.841)
    with pytest.raises(ValueError, match="collides with an output"):
        relational.srm_check(
            df.withColumnRenamed("variant", "chi_term"), "chi_term",
            {0: 0.5, 1: 0.5}, chi2_threshold=3.841)

    with_null = spark.createDataFrame(
        [(0,), (1,), (None,)], "variant int")
    with pytest.raises(SparkRuntimeException,
                       match="not declared in expected: NULL"):
        relational.srm_check(with_null, "variant", {0: 0.5, 1: 0.5},
                             chi2_threshold=3.841).collect()


def test_sprt_ab_accepts_h1_h0_and_continues(spark):
    """Wald boundary math, exact: r=1.5 -> q=0.6, c1=ln(1.2), c0=ln(0.8),
    accept-H1 at LLR >= ln(19) ~ 2.944. 20 variant-1 successes in one
    bin give LLR = 20*ln(1.2) ~ 3.65 -> accept_h1 in that bin; 20
    variant-0 successes give 20*ln(0.8) ~ -4.46 <= -2.944 -> accept_h0;
    a 50/50 mix stays 'continue'."""
    b_only = spark.createDataFrame(
        [(i, i * 10, 1) for i in range(20)], "id long, t long, v int")
    rows = relational.sprt_ab(
        b_only.withColumn("ok", F.lit(True)), ts="t", variant="v",
        success=F.col("ok"), lift_ratio=1.5, bin_ms=1000).collect()
    assert len(rows) == 1
    r0 = rows[0]
    assert r0["llr_running"] == pytest.approx(20 * math.log(1.2), abs=1e-5)
    assert r0["decision"] == "accept_h1"
    assert r0["decision_bin"] == r0["bin_idx"]

    a_only = b_only.withColumn("v", F.lit(0))
    rows = relational.sprt_ab(
        a_only.withColumn("ok", F.lit(True)), ts="t", variant="v",
        success=F.col("ok"), lift_ratio=1.5, bin_ms=1000).collect()
    assert rows[0]["decision"] == "accept_h0"

    mixed = spark.createDataFrame(
        [(i, i * 10, i % 2) for i in range(40)], "id long, t long, v int")
    rows = relational.sprt_ab(
        mixed.withColumn("ok", F.lit(True)), ts="t", variant="v",
        success=F.col("ok"), lift_ratio=1.5, bin_ms=1000).collect()
    assert all(r["decision"] == "continue" for r in rows)
    assert all(r["decision_bin"] is None for r in rows)


def test_sprt_ab_multibin_crossing_and_validation(spark):
    """The decision bin is the FIRST bin whose running LLR crosses: 17
    variant-1 successes reach ln(19) (17*ln(1.2)=3.10), so with 10
    successes/bin the crossing lands in bin 2 of 3; non-binary variants
    raise in-plan; parameter validation is eager."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    three_bins = spark.createDataFrame(
        [(i, i * 400, 1) for i in range(30)], "id long, t long, v int")
    rows = sorted(relational.sprt_ab(
        three_bins.withColumn("ok", F.lit(True)), ts="t", variant="v",
        success=F.col("ok"), lift_ratio=1.5, bin_ms=4000).collect(),
        key=lambda r: r["bin_idx"])
    assert [r["n_succ"] for r in rows] == [10, 10, 10]
    assert rows[0]["decision"] == "accept_h1"
    assert rows[0]["decision_bin"] == rows[1]["bin_idx"]  # 17th success

    bad = spark.createDataFrame(
        [(1, 10, 2)], "id long, t long, v int")
    with pytest.raises(SparkRuntimeException, match="binary"):
        relational.sprt_ab(
            bad.withColumn("ok", F.lit(True)), ts="t", variant="v",
            success=F.col("ok")).collect()
    ok_df = bad.withColumn("ok", F.lit(True))
    with pytest.raises(ValueError, match="lift_ratio"):
        relational.sprt_ab(ok_df, ts="t", variant="v",
                           success=F.col("ok"), lift_ratio=1.0)
    with pytest.raises(ValueError, match="alpha"):
        relational.sprt_ab(ok_df, ts="t", variant="v",
                           success=F.col("ok"), alpha=0.7, beta=0.5)
    with pytest.raises(ValueError, match="plain identifier"):
        relational.sprt_ab(
            ok_df.withColumnRenamed("t", "t s"), ts="t s", variant="v",
            success=F.col("ok"))


# ---------------------------------------------------------------------------
# mann_whitney_u / nelson_aalen (BANKED for r13 — docs/BACKLOG.md)
# ---------------------------------------------------------------------------

def test_mann_whitney_textbook_with_ties(spark):
    """Hand-computed two-sample example WITH ties (the case the banking
    review flagged as the cross-engine risk): variant 0 = {1, 2, 3},
    variant 1 = {2, 3, 4}. Average ranks 1, 2.5, 2.5, 4.5, 4.5, 6 ->
    R1 = 13, U1 = 13 - 3*4/2 = 7, mu = 4.5,
    sigma^2 = (9/12) * (7 - 12/30) = 4.95, z = 2.5 / sqrt(4.95)."""
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 0, 2.0), ("g", 0, 3.0),
         ("g", 1, 2.0), ("g", 1, 3.0), ("g", 1, 4.0)],
        "grp string, v int, x double")
    [r] = relational.mann_whitney_u(df, "grp", "v", "x").collect()
    assert (r["n0"], r["n1"]) == (3, 3)
    assert r["u_stat"] == 7.0
    assert r["mu_u"] == 4.5
    assert r["sigma_u"] == round(math.sqrt(4.95), 4)
    assert r["z_stat"] == round(2.5 / math.sqrt(4.95), 4)
    assert r["significant_05"] is False


def test_mann_whitney_no_ties_matches_closed_form(spark):
    """Tie-free case: variant 1 strictly dominates -> U1 = n0*n1 (every
    pair won), sigma^2 = n0*n1*(N+1)/12 exactly (tie term zero), and a
    clear shift is significant."""
    rows = ([("g", 0, float(i)) for i in range(20)]
            + [("g", 1, 100.0 + i) for i in range(20)])
    df = spark.createDataFrame(rows, "grp string, v int, x double")
    [r] = relational.mann_whitney_u(df, "grp", "v", "x").collect()
    assert r["u_stat"] == 400.0            # 20 * 20, total dominance
    assert r["mu_u"] == 200.0
    assert r["sigma_u"] == round(math.sqrt(20 * 20 * 41 / 12), 4)
    assert r["significant_05"] is True
    assert r["z_stat"] == round(200.0 / math.sqrt(20 * 20 * 41 / 12), 4)


def test_mann_whitney_per_group_null_values_and_degenerates(spark):
    """Groups are independent tests; null values drop before ranking;
    a one-sided group and an all-tied group report counts but NULL
    z/sigma/significance (no defined test)."""
    rows = ([("a", 0, 1.0), ("a", 0, 2.0), ("a", 1, 3.0), ("a", 1, 4.0),
             ("a", 0, None),                      # dropped, not rank 0
             ("b", 0, 1.0), ("b", 0, 2.0),        # variant 1 empty
             ("c", 0, 5.0), ("c", 1, 5.0), ("c", 0, 5.0)])  # all tied
    df = spark.createDataFrame(rows, "grp string, v int, x double")
    out = {r["grp"]: r
           for r in relational.mann_whitney_u(df, "grp", "v", "x").collect()}
    assert out["a"]["n0"] == 2 and out["a"]["n1"] == 2   # null dropped
    assert out["a"]["u_stat"] == 4.0                     # full dominance
    assert out["b"]["n1"] == 0
    assert out["b"]["z_stat"] is None
    assert out["b"]["sigma_u"] is None
    assert out["b"]["significant_05"] is None
    assert out["c"]["z_stat"] is None                    # sigma = 0
    assert out["a"]["z_stat"] is not None


def test_mann_whitney_guards(spark):
    """Non-{0,1} variants raise in-plan (the welch pattern); a group
    column colliding with an output name raises eagerly."""
    df = spark.createDataFrame([("g", 2, 1.0)],
                               "grp string, v int, x double")
    with pytest.raises(Exception, match="binary"):
        relational.mann_whitney_u(df, "grp", "v", "x").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.mann_whitney_u(
            df.withColumnRenamed("grp", "z_stat"), "z_stat", "v", "x")


def test_mann_whitney_bad_variant_on_null_value_still_raises(spark):
    """Variant validation sees EVERY row, welch_ttest-strict: a bad or
    null variant whose value is also null must trip the in-plan raise,
    not silently vanish with the null-value drop (r12 advice — the
    pre-fix operator filtered nulls before the guard)."""
    ok = [("g", 0, 1.0), ("g", 1, 2.0), ("g", 0, 3.0), ("g", 1, 4.0)]
    base = spark.createDataFrame(ok, "grp string, v int, x double")
    for bad_v in (2, None):
        df = base.union(spark.createDataFrame(
            [("g", bad_v, None)], "grp string, v int, x double"))
        with pytest.raises(Exception, match="binary"):
            relational.mann_whitney_u(df, "grp", "v", "x").collect()
    # and an all-null-value group still vanishes (no degenerate 0/0 row)
    df = base.union(spark.createDataFrame(
        [("h", 0, None), ("h", 1, None)], "grp string, v int, x double"))
    rows = relational.mann_whitney_u(df, "grp", "v", "x").collect()
    assert [r["grp"] for r in rows] == ["g"]


def test_nelson_aalen_textbook_curve(spark):
    """Hand-computed: subjects (1,1), (1,0), (2,1), (3,0). Risk sets
    4, 2, 1; H = 1/4, 1/4 + 1/2, unchanged; var = 1/16, 1/16 + 1/4,
    unchanged (censoring moves the risk set, never the hazard)."""
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1), (3, 0)], "t int, obs int")
    rows = {r["t"]: r
            for r in relational.nelson_aalen(df, "t", "obs").collect()}
    assert [rows[t]["n_risk"] for t in (1, 2, 3)] == [4, 2, 1]
    assert rows[1]["cum_hazard"] == 0.25
    assert rows[2]["cum_hazard"] == 0.75
    assert rows[3]["cum_hazard"] == 0.75
    assert rows[1]["hazard_var"] == 0.0625
    assert rows[2]["hazard_var"] == round(1 / 16 + 1 / 4, 8)
    assert rows[3]["hazard_var"] == rows[2]["hazard_var"]


def test_nelson_aalen_exp_neg_h_tracks_km(spark):
    """The estimators' standard relationship on event-sparse data:
    exp(-H(t)) >= S_KM(t), tight while d/n is small."""
    rows = [(t, 1 if t % 3 == 0 else 0) for t in range(1, 30)]
    df = spark.createDataFrame(rows, "t int, obs int")
    km = {r["t"]: r["survival"]
          for r in relational.kaplan_meier(df, "t", "obs").collect()}
    na = {r["t"]: r["cum_hazard"]
          for r in relational.nelson_aalen(df, "t", "obs").collect()}
    for t in km:
        if km[t] > 0:
            assert math.exp(-na[t]) >= km[t] - 1e-9


def test_nelson_aalen_finite_where_km_zero_latches(spark):
    """The no-zero-latch claim, on a fixture where the scenario ACTUALLY
    occurs (the r12 review caught the previous fixture never exercising
    it): both remaining subjects fail at t=2, so n_event == n_risk
    there — KM's survival hits exactly 0.0 via its dead-latch, while
    NA's hazard adds a plain d/n = 1 and stays finite."""
    df = spark.createDataFrame(
        [(1, 0), (2, 1), (2, 1)], "t int, obs int")
    km = {r["t"]: r for r in
          relational.kaplan_meier(df, "t", "obs").collect()}
    na = {r["t"]: r for r in
          relational.nelson_aalen(df, "t", "obs").collect()}
    assert km[2]["n_event"] == km[2]["n_risk"] == 2
    assert km[2]["survival"] == 0.0              # the KM dead-latch
    assert na[2]["cum_hazard"] == 1.0            # 0/3 + 2/2, finite
    assert na[2]["hazard_var"] == 0.5            # 2 / (2*2)
    assert math.isfinite(na[2]["cum_hazard"])


# ---------------------------------------------------------------------------
# kruskal_wallis / logrank_test (BANKED for r14 — docs/BACKLOG.md)
# ---------------------------------------------------------------------------

def test_kruskal_textbook_three_classes(spark):
    """Hand example, no ties: class 0 = {1, 4}, class 1 = {2, 5},
    class 2 = {3, 6}; pooled ranks 1..6, rank sums 5/7/9 -> H =
    12/(6*7) * (25/2 + 49/2 + 81/2) - 3*7 = 155/7 - 21 = 8/7. No ties
    so the correction is 1 and h_stat == h_corrected."""
    rows = [("g", 0, 1.0), ("g", 0, 4.0), ("g", 1, 2.0),
            ("g", 1, 5.0), ("g", 2, 3.0), ("g", 2, 6.0)]
    df = spark.createDataFrame(rows, "grp string, c int, x double")
    [r] = relational.kruskal_wallis(df, "grp", "c", "x").collect()
    assert r["k_classes"] == 3 and r["n_total"] == 6 and r["dof"] == 2
    assert r["h_stat"] == pytest.approx(8.0 / 7.0, abs=1e-4)
    assert r["h_corrected"] == r["h_stat"]
    assert r["significant_05"] is False  # 1.14 << 5.991 (df 2)


def test_kruskal_with_ties_matches_python_reference(spark):
    """A tied multiset across 3 classes, checked against the
    property-tested pure-Python twin (which itself equals textbook
    pooled midranks)."""
    from tests.test_properties import _kw_operator_algebra

    pairs = [(0, 1), (0, 2), (0, 2), (1, 2), (1, 3), (1, 5),
             (2, 1), (2, 5), (2, 5), (2, 7)]
    k, n, h, h_corr, _ = _kw_operator_algebra(pairs)
    rows = [("g", c, float(v)) for c, v in pairs]
    df = spark.createDataFrame(rows, "grp string, c int, x double")
    [r] = relational.kruskal_wallis(df, "grp", "c", "x").collect()
    assert r["k_classes"] == k and r["n_total"] == n
    assert r["h_stat"] == pytest.approx(h, abs=1e-4)
    assert r["h_corrected"] == pytest.approx(h_corr, abs=1e-4)


def test_kruskal_degenerates_and_guards(spark):
    """Single-class group: H = 0, dof = 0, NULL flag. All-tied group:
    correction C = 0, h_corrected/flag NULL. Null values drop from
    ranks; an all-null class vanishes from k. Null class raises even
    when its value is null too (mann/welch strictness from birth);
    output-name collisions raise eagerly."""
    rows = [("solo", 0, 1.0), ("solo", 0, 2.0),
            ("tied", 0, 3.0), ("tied", 1, 3.0), ("tied", 2, 3.0),
            ("mix", 0, 1.0), ("mix", 0, None), ("mix", 1, 2.0),
            ("mix", 2, None)]  # class 2 has no observations
    df = spark.createDataFrame(rows, "grp string, c int, x double")
    out = {r["grp"]: r
           for r in relational.kruskal_wallis(df, "grp", "c", "x").collect()}
    assert out["solo"]["dof"] == 0
    assert out["solo"]["h_stat"] == pytest.approx(0.0, abs=1e-4)
    assert out["solo"]["significant_05"] is None
    assert out["tied"]["h_corrected"] is None
    assert out["tied"]["significant_05"] is None
    assert out["tied"]["h_stat"] == pytest.approx(0.0, abs=1e-4)
    assert out["mix"]["k_classes"] == 2 and out["mix"]["n_total"] == 2
    bad = df.union(spark.createDataFrame(
        [("mix", None, None)], "grp string, c int, x double"))
    with pytest.raises(Exception, match="non-null"):
        relational.kruskal_wallis(bad, "grp", "c", "x").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.kruskal_wallis(
            df.withColumnRenamed("grp", "h_stat"), "h_stat", "c", "x")


def test_kruskal_k2_squares_mann_whitney_on_spark(spark):
    """The classical identity, end-to-end on the two OPERATORS (not
    just the python twins): two classes -> tie-corrected H equals the
    rank-sum z squared."""
    rows = [("g", i % 2, float((i * 7) % 5 + (i % 3)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, c int, x double")
    [kw] = relational.kruskal_wallis(df, "grp", "c", "x").collect()
    [mw] = relational.mann_whitney_u(df, "grp", "c", "x").collect()
    assert kw["h_corrected"] == pytest.approx(mw["z_stat"] ** 2,
                                              abs=2e-3)


def test_logrank_textbook_hand_example(spark):
    """Subjects g0: (1, event), (2, censor); g1: (1, censor),
    (3, event). t=1: n=4, d=1, e1=0.5, v=0.25; t=2: d=0; t=3: n=1,
    d=1, e1=1, v=0 (n-1 guard). Final O-E = -0.5, V = 0.25,
    z = -1.0."""
    df = spark.createDataFrame(
        [(1, 1, 0), (2, 0, 0), (1, 0, 1), (3, 1, 1)],
        "t int, obs int, g int")
    rows = {r["t"]: r
            for r in relational.logrank_test(df, "t", "obs", "g").collect()}
    assert [rows[t]["n_risk0"] for t in (1, 2, 3)] == [2, 1, 0]
    assert [rows[t]["n_risk1"] for t in (1, 2, 3)] == [2, 1, 1]
    assert rows[1]["expected1"] == pytest.approx(0.5)
    assert rows[1]["o_minus_e"] == pytest.approx(-0.5)
    assert rows[2]["o_minus_e"] == pytest.approx(-0.5)  # d=0 adds 0
    assert rows[3]["var_cum"] == pytest.approx(0.25)
    assert rows[3]["z_stat"] == pytest.approx(-1.0)
    assert rows[3]["significant_05"] is False


def test_logrank_identical_groups_and_guards(spark):
    """One cohort duplicated into both arms scores exactly 0 at every
    duration; non-{0,1} group values raise in-plan; a duration column
    colliding with an output name raises eagerly."""
    cohort = [(1, 1), (2, 0), (2, 1), (5, 1), (7, 0)]
    both = ([(t, o, 0) for t, o in cohort] + [(t, o, 1) for t, o in cohort])
    df = spark.createDataFrame(both, "t int, obs int, g int")
    rows = relational.logrank_test(df, "t", "obs", "g").collect()
    assert all(r["o_minus_e"] == pytest.approx(0.0) for r in rows)
    last = max(rows, key=lambda r: r["t"])
    assert last["z_stat"] == pytest.approx(0.0)
    bad = spark.createDataFrame([(1, 1, 2)], "t int, obs int, g int")
    with pytest.raises(Exception, match="binary"):
        relational.logrank_test(bad, "t", "obs", "g").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.logrank_test(
            df.withColumnRenamed("t", "z_stat"), "z_stat", "obs", "g")


def test_logrank_observed_and_duration_strictness(spark):
    """The two r13 ADVICE fixes, pinned. (1) observed outside {0, 1}
    raises in-plan — before the fix an observed = 5 silently counted 5
    events and a null observed vanished from the event sums while the
    subject stayed in the risk set. (2) A null duration raises in-plan
    — Spark windows sort NULLS FIRST, SQL oracles NULLS LAST, so a
    null-duration row would shift every risk set differently per
    engine. Valid frames are unaffected."""
    ok = spark.createDataFrame(
        [(1, 1, 0), (2, 0, 0), (1, 0, 1), (3, 1, 1)],
        "t int, obs int, g int")
    base = relational.logrank_test(ok, "t", "obs", "g").collect()
    assert len(base) == 3
    for bad_obs in (5, -1, None):
        bad = ok.union(spark.createDataFrame(
            [(2, bad_obs, 1)], "t int, obs int, g int"))
        with pytest.raises(Exception, match="observed column"):
            relational.logrank_test(bad, "t", "obs", "g").collect()
    null_t = ok.union(spark.createDataFrame(
        [(None, 1, 1)], "t int, obs int, g int"))
    with pytest.raises(Exception, match="duration column must be"):
        relational.logrank_test(null_t, "t", "obs", "g").collect()


# ---------------------------------------------------------------------------
# cox_score_test / friedman_test (BANKED for r15 — docs/BACKLOG.md)
# ---------------------------------------------------------------------------

def test_cox_binary_covariate_equals_logrank_on_spark(spark):
    """The classical identity, end-to-end on the two OPERATORS: with a
    binary 0/1 covariate the Cox score test IS the log-rank test —
    every per-duration u/v term reduces algebraically (S1 = n1,
    S2 = n1, sx = d1)."""
    rows = [((i * 5) % 11 + 1, (i // 2) % 2, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "t int, obs int, g int")
    cox = {r["t"]: r for r in
           relational.cox_score_test(df, "t", "obs", "g").collect()}
    lr = {r["t"]: r for r in
          relational.logrank_test(df, "t", "obs", "g").collect()}
    assert set(cox) == set(lr)
    for t in cox:
        assert cox[t]["score_cum"] == pytest.approx(
            lr[t]["o_minus_e"], abs=1e-5)
        assert cox[t]["info_cum"] == pytest.approx(
            lr[t]["var_cum"], abs=1e-5)
        if lr[t]["z_stat"] is not None:
            assert cox[t]["z_stat"] == pytest.approx(
                lr[t]["z_stat"], abs=1e-3)


def test_cox_textbook_hand_example(spark):
    """Subjects (t, obs, x): (1,1,2), (2,1,0), (3,0,1). t=1: S0=3,
    S1=3, S2=5, d=1, sx=2 -> u = 2 - 1 = 1, v = (5/3 - 1) = 2/3.
    t=2: risk {0,1}: S0=2, S1=1, S2=1, d=1, sx=0 -> u = -0.5,
    v = 0.25. t=3: S0=1 -> u = 0, v = 0 (n-1 guard). Final score 0.5,
    info 11/12, z = 0.5/sqrt(11/12) = 0.522233."""
    df = spark.createDataFrame([(1, 1, 2), (2, 1, 0), (3, 0, 1)],
                               "t int, obs int, x int")
    rows = {r["t"]: r for r in
            relational.cox_score_test(df, "t", "obs", "x").collect()}
    assert [rows[t]["n_risk"] for t in (1, 2, 3)] == [3, 2, 1]
    assert rows[1]["x_risk_mean"] == pytest.approx(1.0)
    assert rows[1]["score_cum"] == pytest.approx(1.0)
    assert rows[1]["info_cum"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert rows[2]["score_cum"] == pytest.approx(0.5)
    assert rows[2]["info_cum"] == pytest.approx(11.0 / 12.0, abs=1e-6)
    assert rows[3]["score_cum"] == pytest.approx(0.5)
    assert rows[3]["info_cum"] == pytest.approx(11.0 / 12.0, abs=1e-6)
    assert rows[3]["z_stat"] == pytest.approx(0.5222, abs=1e-4)
    assert rows[3]["significant_05"] is False


def test_cox_strictness_guards(spark):
    """The covariate contract is integral + non-null (a null x would
    vanish from S1/S2 while the subject stays in S0 — the r13
    logrank-observed bug class, closed from birth); observed and
    duration follow logrank's strict contract; output-name collisions
    raise eagerly."""
    ok = spark.createDataFrame([(1, 1, 2.0), (2, 1, 0.0), (3, 0, 1.0)],
                               "t int, obs int, x double")
    assert len(relational.cox_score_test(ok, "t", "obs", "x")
               .collect()) == 3  # integral doubles are fine
    for bad_x in (None, 1.5):
        bad = ok.union(spark.createDataFrame(
            [(2, 1, bad_x)], "t int, obs int, x double"))
        with pytest.raises(Exception, match="covariate column"):
            relational.cox_score_test(bad, "t", "obs", "x").collect()
    bad_obs = ok.union(spark.createDataFrame(
        [(2, 7, 1.0)], "t int, obs int, x double"))
    with pytest.raises(Exception, match="observed column"):
        relational.cox_score_test(bad_obs, "t", "obs", "x").collect()
    null_t = ok.union(spark.createDataFrame(
        [(None, 1, 1.0)], "t int, obs int, x double"))
    with pytest.raises(Exception, match="duration column must be"):
        relational.cox_score_test(null_t, "t", "obs", "x").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.cox_score_test(
            ok.withColumnRenamed("t", "z_stat"), "z_stat", "obs", "x")


def test_friedman_textbook_no_ties(spark):
    """b=3 blocks, k=3 treatments, no ties: within-block ranks
    (1,2,3), (1,2,3), (2,1,3) -> R = (4,5,9); classic
    Q = 12/36 * (16+25+81) - 36 = 14/3; Conover T1 equals it exactly
    when tie-free (A2 - C = bk(k^2-1)/12 * 12/... = 6 here,
    num/(k-1) = 14)."""
    rows = [("b1", "A", 1.0), ("b1", "B", 2.0), ("b1", "C", 3.0),
            ("b2", "A", 2.0), ("b2", "B", 4.0), ("b2", "C", 6.0),
            ("b3", "A", 5.0), ("b3", "B", 4.0), ("b3", "C", 6.0)]
    df = spark.createDataFrame(rows, "blk string, trt string, v double")
    out = {r["trt"]: r for r in
           relational.friedman_test(df, "blk", "trt", "v").collect()}
    assert [out[j]["rank_sum"] for j in "ABC"] == [4.0, 5.0, 9.0]
    assert all(r["b_blocks"] == 3 and r["k_treatments"] == 3
               and r["dof"] == 2 for r in out.values())
    assert out["A"]["t1_stat"] == pytest.approx(14.0 / 3.0, abs=1e-4)
    assert out["A"]["significant_05"] is False  # 4.67 < 5.991
    assert out["B"]["mean_rank"] == pytest.approx(5.0 / 3.0, abs=1e-6)


def test_friedman_ties_match_python_twin(spark):
    """A tied grid checked against the property-tested pure-Python
    twin (which itself equals direct Conover midranks)."""
    from tests.test_properties import _fr_operator_algebra

    grid = [[1, 1, 2], [2, 1, 3], [5, 5, 5], [4, 2, 2]]
    t1, _, _ = _fr_operator_algebra(grid)
    rows = [(f"b{i}", f"t{j}", float(v))
            for i, row in enumerate(grid) for j, v in enumerate(row)]
    df = spark.createDataFrame(rows, "blk string, trt string, v double")
    out = relational.friedman_test(df, "blk", "trt", "v").collect()
    assert len(out) == 3
    assert out[0]["t1_stat"] == pytest.approx(t1, abs=1e-4)


def test_friedman_degenerate_and_guards(spark):
    """All-tied grid: zero rank variance -> NULL t1/flag but rank sums
    still report. Duplicate cells, null values, and incomplete blocks
    raise in-plan; output-name collisions raise eagerly."""
    tied = spark.createDataFrame(
        [("b1", "A", 1.0), ("b1", "B", 1.0),
         ("b2", "A", 3.0), ("b2", "B", 3.0)],
        "blk string, trt string, v double")
    out = relational.friedman_test(tied, "blk", "trt", "v").collect()
    assert all(r["t1_stat"] is None and r["significant_05"] is None
               for r in out)
    assert all(r["rank_sum"] == pytest.approx(3.0) for r in out)
    ok = spark.createDataFrame(
        [("b1", "A", 1.0), ("b1", "B", 2.0),
         ("b2", "A", 3.0), ("b2", "B", 1.0)],
        "blk string, trt string, v double")
    dup = ok.union(spark.createDataFrame(
        [("b1", "A", 9.0)], "blk string, trt string, v double"))
    with pytest.raises(Exception, match="duplicate"):
        relational.friedman_test(dup, "blk", "trt", "v").collect()
    nullv = ok.union(spark.createDataFrame(
        [("b2", "C", None)], "blk string, trt string, v double"))
    with pytest.raises(Exception, match="non-null"):
        relational.friedman_test(nullv, "blk", "trt", "v").collect()
    incomplete = ok.union(spark.createDataFrame(
        [("b3", "A", 2.0)], "blk string, trt string, v double"))
    with pytest.raises(Exception, match="incomplete design"):
        relational.friedman_test(incomplete, "blk", "trt", "v").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.friedman_test(
            ok.withColumnRenamed("blk", "dof"), "dof", "trt", "v")


def test_chi2_flag_is_null_beyond_df10(spark):
    """Both chi-square-flagged tests share _chi2_crit_05: beyond df 10
    the critical value (and so the flag) is NULL while the statistic
    still reports — kruskal with 12 classes and friedman with 12
    treatments both hit the path."""
    kw = spark.createDataFrame(
        [("g", c, float(c * 17 % 7 + r)) for c in range(12)
         for r in range(3)],
        "grp string, c int, x double")
    [r] = relational.kruskal_wallis(kw, "grp", "c", "x").collect()
    assert r["dof"] == 11 and r["h_corrected"] is not None
    assert r["significant_05"] is None
    fr = spark.createDataFrame(
        [(f"b{i}", f"t{j:02d}", float((i * 7 + j * 3) % 5))
         for i in range(4) for j in range(12)],
        "blk string, trt string, v double")
    rows = relational.friedman_test(fr, "blk", "trt", "v").collect()
    assert all(r["dof"] == 11 and r["t1_stat"] is not None
               and r["significant_05"] is None for r in rows)


def test_cox_all_censored_cohort(spark):
    """No events anywhere: every u/v term is 0, the trace emits (risk
    sets still move) and z / significant_05 stay NULL."""
    df = spark.createDataFrame(
        [(1, 0, 3), (2, 0, 1), (2, 0, 4), (5, 0, 2)],
        "t int, obs int, x int")
    rows = relational.cox_score_test(df, "t", "obs", "x").collect()
    assert len(rows) == 3
    assert all(r["n_events"] == 0 for r in rows)
    assert all(r["score_cum"] == 0.0 and r["info_cum"] == 0.0
               for r in rows)
    assert all(r["z_stat"] is None and r["significant_05"] is None
               for r in rows)


def test_survival_estimators_strict_contract(spark):
    """The r14 stack-wide hardening, pinned on BOTH registered
    estimators: observed outside {0, 1} (incl. null) and null
    durations raise in-plan (before the fix an observed = 5 counted 5
    events and drove n_censor negative; a null observed silently
    dropped the subject; a null duration shifted risk sets differently
    per engine). Valid frames are unaffected."""
    ok = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1), (3, 0)], "t int, obs int")
    assert len(relational.kaplan_meier(ok, "t", "obs").collect()) == 3
    assert len(relational.nelson_aalen(ok, "t", "obs").collect()) == 3
    for op in (relational.kaplan_meier, relational.nelson_aalen):
        for bad_obs in (5, -1, None):
            bad = ok.union(spark.createDataFrame(
                [(2, bad_obs)], "t int, obs int"))
            with pytest.raises(Exception, match="observed column"):
                op(bad, "t", "obs").collect()
        null_t = ok.union(spark.createDataFrame(
            [(None, 1)], "t int, obs int"))
        with pytest.raises(Exception, match="duration column must be"):
            op(null_t, "t", "obs").collect()


def test_roc_auc_raises_on_null_labels(spark):
    """The r14 eval-tool alignment: roc_auc_binned raises in-plan on
    null score/label like calibration_bins has since r11 — a null
    label previously scored silently as a NEGATIVE, biasing every
    TPR/FPR point. Valid frames unaffected."""
    ok = spark.createDataFrame(
        [(float(i), i % 2) for i in range(40)], "s double, y int")
    out = relational.roc_auc_binned(ok, "s", F.col("y") == 1, bins=4)
    assert out.count() == 4
    bad = ok.union(spark.createDataFrame(
        [(7.5, None)], "s double, y int"))
    with pytest.raises(Exception, match="null score/label"):
        relational.roc_auc_binned(
            bad, "s", F.when(F.col("y").isNotNull(), F.col("y") == 1),
            bins=4).collect()


# ---------------------------------------------------------------------------
# stratified_logrank / page_trend_test (registered r16 as
# events_logrank_strat / events_page_hourband)
# ---------------------------------------------------------------------------

def test_stratified_logrank_one_stratum_equals_logrank_on_spark(spark):
    """With ONE stratum every output column except the stratum equals
    logrank_test verbatim — the classical reduction, end-to-end on the
    two OPERATORS (the cox-binary≡logrank pin's shape)."""
    rows = [((i * 5) % 11 + 1, (i // 2) % 2, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "t int, obs int, g int")
    strat = {r["t"]: r for r in relational.stratified_logrank(
        df.withColumn("s", F.lit("only")), "t", "obs", "g", "s")
        .collect()}
    lr = {r["t"]: r for r in
          relational.logrank_test(df, "t", "obs", "g").collect()}
    assert set(strat) == set(lr)
    for t in lr:
        for c in ("n_risk0", "n_risk1", "n_event0", "n_event1",
                  "expected1", "o_minus_e", "var_cum", "z_stat",
                  "significant_05"):
            assert strat[t][c] == lr[t][c], (t, c)


def test_stratified_logrank_two_strata_fold_is_the_sum(spark):
    """The verdict row's O-E / V equal the SUM of the two per-stratum
    logrank_test verdicts (the whole point of stratification: each
    stratum contributes its own risk-set comparison; the confounder's
    main effect cancels). Per-stratum trace rows equal the restricted
    logrank runs row for row."""
    rows = [("a", (i * 3) % 7 + 1, i % 2, (i // 3) % 2)
            for i in range(30)] + \
           [("b", (i * 5) % 9 + 2, (i // 2) % 2, i % 2)
            for i in range(24)]
    df = spark.createDataFrame(rows, "s string, t int, obs int, g int")
    out = relational.stratified_logrank(df, "t", "obs", "g", "s") \
        .collect()
    final = max(out, key=lambda r: (r["s"], r["t"]))
    per = {}
    for s in ("a", "b"):
        sub = df.filter(F.col("s") == s)
        lr = sorted(relational.logrank_test(sub, "t", "obs", "g")
                    .collect(), key=lambda r: r["t"])
        per[s] = lr
        # the stratum's own trace matches the restricted run's rows
        mine = sorted((r for r in out if r["s"] == s),
                      key=lambda r: r["t"])
        assert [(m["n_risk0"], m["n_risk1"], m["n_event0"],
                 m["n_event1"], m["expected1"]) for m in mine] == \
               [(l["n_risk0"], l["n_risk1"], l["n_event0"],
                 l["n_event1"], l["expected1"]) for l in lr]
    want_ome = per["a"][-1]["o_minus_e"] + per["b"][-1]["o_minus_e"]
    want_var = per["a"][-1]["var_cum"] + per["b"][-1]["var_cum"]
    assert final["o_minus_e"] == pytest.approx(want_ome, abs=1e-5)
    assert final["var_cum"] == pytest.approx(want_var, abs=1e-5)


def test_stratified_logrank_strictness_guards(spark):
    """logrank-strict in-plan contract plus the stratum: non-{0,1}
    group/observed, null durations AND null strata raise; output-name
    collisions raise eagerly."""
    ok = spark.createDataFrame(
        [("a", 1, 1, 0), ("a", 2, 0, 1), ("b", 1, 1, 1), ("b", 3, 0, 0)],
        "s string, t int, obs int, g int")
    assert len(relational.stratified_logrank(
        ok, "t", "obs", "g", "s").collect()) == 4
    bad_g = ok.union(spark.createDataFrame(
        [("a", 2, 1, 7)], "s string, t int, obs int, g int"))
    with pytest.raises(Exception, match="group column"):
        relational.stratified_logrank(
            bad_g, "t", "obs", "g", "s").collect()
    bad_obs = ok.union(spark.createDataFrame(
        [("a", 2, 9, 1)], "s string, t int, obs int, g int"))
    with pytest.raises(Exception, match="observed column"):
        relational.stratified_logrank(
            bad_obs, "t", "obs", "g", "s").collect()
    null_t = ok.union(spark.createDataFrame(
        [("a", None, 1, 1)], "s string, t int, obs int, g int"))
    with pytest.raises(Exception, match="duration column must be"):
        relational.stratified_logrank(
            null_t, "t", "obs", "g", "s").collect()
    null_s = ok.union(spark.createDataFrame(
        [(None, 2, 1, 1)], "s string, t int, obs int, g int"))
    with pytest.raises(Exception, match="stratum column must be"):
        relational.stratified_logrank(
            null_s, "t", "obs", "g", "s").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.stratified_logrank(
            ok.withColumnRenamed("s", "var_cum"), "t", "obs", "g",
            "var_cum")


def test_page_textbook_monotone(spark):
    """b=3 blocks, k=4 treatments, every block perfectly increasing:
    R_j = 3j -> L = 3(1+4+9+16) = 90, 4(L-E) = b k (k+1)(k-1)/3 = 60,
    16 Var = 3*16*25*3/9 = 400 -> z = 60/20 = 3.0, significant."""
    rows = [(f"b{i}", j, float(10 * j + i))
            for i in range(3) for j in range(4)]
    df = spark.createDataFrame(rows, "blk string, trt int, v double")
    out = {r["trt"]: r for r in
           relational.page_trend_test(df, "blk", "trt", "v").collect()}
    assert [out[j]["j_index"] for j in range(4)] == [1, 2, 3, 4]
    assert [out[j]["rank_sum"] for j in range(4)] == [3.0, 6.0, 9.0, 12.0]
    assert all(r["b_blocks"] == 3 and r["k_treatments"] == 4
               for r in out.values())
    assert out[0]["l_stat"] == pytest.approx(90.0)
    assert out[0]["z_stat"] == pytest.approx(3.0, abs=1e-6)
    assert out[0]["significant_05"] is True
    # reversing the treatment order negates z (the ordered
    # alternative's sign convention — property-pinned in pure Python,
    # pinned here on the operator)
    rev = df.withColumn("trt", 3 - F.col("trt"))
    out_r = relational.page_trend_test(rev, "blk", "trt", "v").collect()
    assert out_r[0]["z_stat"] == pytest.approx(-3.0, abs=1e-6)
    assert out_r[0]["significant_05"] is True  # two-sided flag


def test_page_ties_match_python_twin(spark):
    """A tied grid checked against the property-tested pure-Python
    twin (which itself equals direct float-midrank Page)."""
    from tests.test_properties import _page_operator_algebra

    grid = [[1, 1, 2], [2, 1, 3], [5, 5, 5], [4, 2, 2]]
    z, _ = _page_operator_algebra(grid)
    rows = [(f"b{i}", j, float(v))
            for i, row in enumerate(grid) for j, v in enumerate(row)]
    df = spark.createDataFrame(rows, "blk string, trt int, v double")
    out = relational.page_trend_test(df, "blk", "trt", "v").collect()
    assert len(out) == 3
    assert out[0]["z_stat"] == pytest.approx(z, abs=1e-4)


def test_page_guards_and_degenerate(spark):
    """Treatment must be integral + non-null (its value IS the trend
    order); friedman-strict grid validation; k = 1 has zero variance
    -> NULL z/flag; output-name collisions raise eagerly."""
    ok = spark.createDataFrame(
        [("b1", 0, 1.0), ("b1", 1, 2.0),
         ("b2", 0, 3.0), ("b2", 1, 1.0)],
        "blk string, trt int, v double")
    assert len(relational.page_trend_test(
        ok, "blk", "trt", "v").collect()) == 2
    frac = spark.createDataFrame(
        [("b1", 0.5, 1.0), ("b1", 1.0, 2.0)],
        "blk string, trt double, v double")
    with pytest.raises(Exception, match="treatment column must be"):
        relational.page_trend_test(frac, "blk", "trt", "v").collect()
    null_trt = ok.union(spark.createDataFrame(
        [("b1", None, 5.0)], "blk string, trt int, v double"))
    with pytest.raises(Exception, match="treatment column must be"):
        relational.page_trend_test(null_trt, "blk", "trt", "v").collect()
    dup = ok.union(spark.createDataFrame(
        [("b1", 0, 9.0)], "blk string, trt int, v double"))
    with pytest.raises(Exception, match="duplicate"):
        relational.page_trend_test(dup, "blk", "trt", "v").collect()
    nullv = ok.union(spark.createDataFrame(
        [("b2", 2, None)], "blk string, trt int, v double"))
    with pytest.raises(Exception, match="non-null"):
        relational.page_trend_test(nullv, "blk", "trt", "v").collect()
    incomplete = ok.union(spark.createDataFrame(
        [("b3", 0, 2.0)], "blk string, trt int, v double"))
    with pytest.raises(Exception, match="incomplete design"):
        relational.page_trend_test(incomplete, "blk", "trt", "v") \
            .collect()
    single = spark.createDataFrame(
        [("b1", 4, 1.0), ("b2", 4, 2.0)],
        "blk string, trt int, v double")
    out = relational.page_trend_test(single, "blk", "trt", "v") \
        .collect()
    assert len(out) == 1
    assert out[0]["z_stat"] is None
    assert out[0]["significant_05"] is None
    with pytest.raises(ValueError, match="collides"):
        relational.page_trend_test(
            ok.withColumnRenamed("blk", "l_stat"), "l_stat", "trt", "v")
    # diagnostic priority (r16 advice fix): a duplicated cell whose
    # treatment is ALSO fractional reports the actionable
    # treatment-contract message, not 'duplicate cell'
    dup_frac = spark.createDataFrame(
        [("b1", 0.5, 1.0), ("b1", 0.5, 9.0), ("b1", 1.0, 2.0)],
        "blk string, trt double, v double")
    with pytest.raises(Exception, match="treatment column must be"):
        relational.page_trend_test(dup_frac, "blk", "trt", "v").collect()


# ---------------------------------------------------------------------------
# cmh_test / cochran_q_test (BANKED for r17 — docs/BACKLOG.md)
# ---------------------------------------------------------------------------

def test_cmh_one_stratum_equals_classic_chi2(spark):
    """With ONE stratum CMH reduces to the continuity-uncorrected
    HYPERGEOMETRIC-variance 2x2 chi-square — (n-1)/n x Pearson, the
    classical exact relation: chi2 = (a - r1 c1 / n)^2 / V with
    V = r1 r0 c1 c0 / (n^2 (n-1)). Hand-checked table:
    exposed 30 (12 success), unexposed 20 (4 success) -> n=50, r1=30,
    c1=16, a=12; E = 9.6, O-E = 2.4; V = 30*20*16*34/(2500*49) =
    2.66448...; chi2 = 5.76/V = 2.1618."""
    rows = ([("s", 1, 1)] * 12 + [("s", 1, 0)] * 18
            + [("s", 0, 1)] * 4 + [("s", 0, 0)] * 16)
    df = spark.createDataFrame(rows, "st string, e int, y int")
    out = relational.cmh_test(df, "st", "e", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_total"], r["n_exposed"], r["n_success"],
            r["a_obs"]) == (50, 30, 16, 12)
    assert r["expected1"] == pytest.approx(9.6, abs=1e-6)
    assert r["o_minus_e"] == pytest.approx(2.4, abs=1e-6)
    v = 30 * 20 * 16 * 34 / (50 * 50 * 49)
    assert r["var_cum"] == pytest.approx(v, abs=1e-6)
    assert r["chi2_stat"] == pytest.approx(2.4 * 2.4 / v, abs=1e-4)
    assert r["significant_05"] is False


def test_cmh_two_strata_fold_is_the_sum(spark):
    """The verdict row pools per-stratum evidence: final O-E / V equal
    the SUM of the two restricted single-stratum runs, and each
    stratum's trace row matches its own restricted run (the
    stratified_logrank fold shape)."""
    rows_a = ([("a", 1, 1)] * 8 + [("a", 1, 0)] * 12
              + [("a", 0, 1)] * 3 + [("a", 0, 0)] * 17)
    rows_b = ([("b", 1, 1)] * 10 + [("b", 1, 0)] * 5
              + [("b", 0, 1)] * 6 + [("b", 0, 0)] * 9)
    df = spark.createDataFrame(rows_a + rows_b, "st string, e int, y int")
    out = sorted(relational.cmh_test(df, "st", "e", "y").collect(),
                 key=lambda r: r["st"])
    per = {}
    for s, rows in (("a", rows_a), ("b", rows_b)):
        sub = spark.createDataFrame(rows, "st string, e int, y int")
        per[s] = relational.cmh_test(sub, "st", "e", "y").collect()[0]
        mine = next(r for r in out if r["st"] == s)
        assert (mine["n_total"], mine["n_exposed"], mine["n_success"],
                mine["a_obs"], mine["expected1"]) == \
               (per[s]["n_total"], per[s]["n_exposed"],
                per[s]["n_success"], per[s]["a_obs"],
                per[s]["expected1"])
    final = out[-1]
    assert final["o_minus_e"] == pytest.approx(
        per["a"]["o_minus_e"] + per["b"]["o_minus_e"], abs=1e-5)
    assert final["var_cum"] == pytest.approx(
        per["a"]["var_cum"] + per["b"]["var_cum"], abs=1e-5)


def test_cmh_duplicated_strata_scale_chi2_linearly(spark):
    """j identical strata: O-E and V each scale by j, so chi2 scales
    by j — evidence accumulates (the Q-duplication property's CMH
    twin)."""
    rows = ([("s", 1, 1)] * 12 + [("s", 1, 0)] * 18
            + [("s", 0, 1)] * 4 + [("s", 0, 0)] * 16)
    one = relational.cmh_test(
        spark.createDataFrame(rows, "st string, e int, y int"),
        "st", "e", "y").collect()[0]
    tripled = [(f"s{k}", e, y) for k in range(3) for (_, e, y) in rows]
    out = relational.cmh_test(
        spark.createDataFrame(tripled, "st string, e int, y int"),
        "st", "e", "y").collect()
    final = max(out, key=lambda r: r["st"])
    assert len(out) == 3
    assert final["chi2_stat"] == pytest.approx(
        3 * one["chi2_stat"], abs=2e-3)


def test_cmh_strictness_guards(spark):
    """welch-strict in-plan contract: non-{0,1} exposure/outcome
    (incl. null) and null strata raise; degenerate margins yield
    V = 0 and NULL chi2; output-name collisions raise eagerly."""
    ok = spark.createDataFrame(
        [("a", 1, 1), ("a", 0, 0), ("a", 1, 0), ("a", 0, 1)],
        "st string, e int, y int")
    assert len(relational.cmh_test(ok, "st", "e", "y").collect()) == 1
    bad_e = ok.union(spark.createDataFrame(
        [("a", 7, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="exposure column"):
        relational.cmh_test(bad_e, "st", "e", "y").collect()
    null_y = ok.union(spark.createDataFrame(
        [("a", 1, None)], "st string, e int, y int"))
    with pytest.raises(Exception, match="outcome column"):
        relational.cmh_test(null_y, "st", "e", "y").collect()
    null_s = ok.union(spark.createDataFrame(
        [(None, 1, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="stratum column must be"):
        relational.cmh_test(null_s, "st", "e", "y").collect()
    # one-subject stratum: V = 0, chi2 NULL while sum V = 0
    tiny = spark.createDataFrame([("a", 1, 1)], "st string, e int, y int")
    r = relational.cmh_test(tiny, "st", "e", "y").collect()[0]
    assert r["var_cum"] == 0.0 and r["chi2_stat"] is None
    assert r["significant_05"] is None
    with pytest.raises(ValueError, match="collides"):
        relational.cmh_test(
            ok.withColumnRenamed("st", "var_cum"), "var_cum", "e", "y")


def test_cochran_q_textbook_and_mcnemar_reduction(spark):
    """k=2 reduces to McNemar's chi-square WITHOUT continuity
    correction: Q = (b01 - b10)^2 / (b01 + b10) over discordant
    blocks. 10 blocks: 4 discordant (1,0), 1 discordant (0,1),
    3 concordant (1,1), 2 concordant (0,0) -> Q = (4-1)^2/5 = 1.8,
    df 1, not significant."""
    rows = []
    bid = 0
    for pat, cnt in ((((1, 0)), 4), (((0, 1)), 1), (((1, 1)), 3),
                     (((0, 0)), 2)):
        for _ in range(cnt):
            rows += [(f"b{bid:02d}", 0, pat[0]), (f"b{bid:02d}", 1, pat[1])]
            bid += 1
    df = spark.createDataFrame(rows, "blk string, trt int, v int")
    out = sorted(relational.cochran_q_test(df, "blk", "trt", "v")
                 .collect(), key=lambda r: r["trt"])
    assert len(out) == 2
    assert [r["successes"] for r in out] == [7, 4]
    assert all(r["b_blocks"] == 10 and r["k_treatments"] == 2
               and r["dof"] == 1 for r in out)
    assert out[0]["q_stat"] == pytest.approx(1.8, abs=1e-4)
    assert out[0]["significant_05"] is False


def test_cochran_q_label_permutation_invariant_and_duplication(spark):
    """Permuting treatment labels leaves Q unchanged; duplicating
    every block j times multiplies Q by j (evidence accumulates)."""
    base = [(f"b{i}", j, 1 if (i * (j + 2)) % 3 == 0 else 0)
            for i in range(8) for j in range(3)]
    df = spark.createDataFrame(base, "blk string, trt int, v int")
    q1 = relational.cochran_q_test(df, "blk", "trt", "v") \
        .collect()[0]["q_stat"]
    perm = [(b, (t + 1) % 3, v) for (b, t, v) in base]
    q2 = relational.cochran_q_test(
        spark.createDataFrame(perm, "blk string, trt int, v int"),
        "blk", "trt", "v").collect()[0]["q_stat"]
    assert q1 == pytest.approx(q2, abs=1e-4)
    doubled = base + [(b + "_dup", t, v) for (b, t, v) in base]
    q3 = relational.cochran_q_test(
        spark.createDataFrame(doubled, "blk string, trt int, v int"),
        "blk", "trt", "v").collect()[0]["q_stat"]
    assert q3 == pytest.approx(2 * q1, abs=2e-3)


def test_cochran_q_strictness_guards(spark):
    """friedman-strict grid validation with the binary-value contract:
    non-{0,1}/null values, null keys, duplicate cells and incomplete
    blocks raise (value-contract diagnostic outranks duplicate — the
    r16 advice class); all-concordant grid -> NULL q/flag;
    output-name collisions raise eagerly."""
    ok = spark.createDataFrame(
        [("b1", 0, 1), ("b1", 1, 0), ("b2", 0, 0), ("b2", 1, 1)],
        "blk string, trt int, v int")
    assert len(relational.cochran_q_test(
        ok, "blk", "trt", "v").collect()) == 2
    bad_v = ok.union(spark.createDataFrame(
        [("b1", 2, 5)], "blk string, trt int, v int"))
    with pytest.raises(Exception, match="value column must be"):
        relational.cochran_q_test(bad_v, "blk", "trt", "v").collect()
    null_b = ok.union(spark.createDataFrame(
        [(None, 0, 1)], "blk string, trt int, v int"))
    with pytest.raises(Exception, match="non-null"):
        relational.cochran_q_test(null_b, "blk", "trt", "v").collect()
    dup = ok.union(spark.createDataFrame(
        [("b1", 0, 0)], "blk string, trt int, v int"))
    with pytest.raises(Exception, match="duplicate"):
        relational.cochran_q_test(dup, "blk", "trt", "v").collect()
    # duplicate cell whose value is ALSO non-binary: the actionable
    # value-contract message wins
    dup_bad = ok.union(spark.createDataFrame(
        [("b1", 0, 7)], "blk string, trt int, v int"))
    with pytest.raises(Exception, match="value column must be"):
        relational.cochran_q_test(dup_bad, "blk", "trt", "v").collect()
    incomplete = ok.union(spark.createDataFrame(
        [("b3", 0, 1)], "blk string, trt int, v int"))
    with pytest.raises(Exception, match="incomplete design"):
        relational.cochran_q_test(
            incomplete, "blk", "trt", "v").collect()
    concordant = spark.createDataFrame(
        [("b1", 0, 1), ("b1", 1, 1), ("b2", 0, 0), ("b2", 1, 0)],
        "blk string, trt int, v int")
    out = relational.cochran_q_test(
        concordant, "blk", "trt", "v").collect()
    assert all(r["q_stat"] is None and r["significant_05"] is None
               for r in out)
    with pytest.raises(ValueError, match="collides"):
        relational.cochran_q_test(
            ok.withColumnRenamed("blk", "q_stat"), "q_stat", "trt", "v")


def test_cochran_q_dof_beyond_crit_table_yields_null_flag(spark):
    """k = 12 -> dof = 11 is beyond the inlined chi-square 5% table
    (df 1..10): q_stat still computes but significant_05 is NULL —
    the _chi2_crit_05 handoff's documented beyond-table contract,
    pinned here so a future table extension keeps the rule explicit."""
    rows = [(f"b{i}", j, 1 if (i + j) % 3 == 0 else 0)
            for i in range(5) for j in range(12)]
    df = spark.createDataFrame(rows, "blk string, trt int, v int")
    out = relational.cochran_q_test(df, "blk", "trt", "v").collect()
    assert len(out) == 12
    assert all(r["dof"] == 11 for r in out)
    assert all(r["q_stat"] is not None for r in out)
    assert all(r["significant_05"] is None for r in out)


def test_cmh_integer_strata_supported(spark):
    """The stratum key can be any orderable type — integer strata ride
    the same ordered fold (Window.orderBy int vs SQL ORDER BY int
    agree trivially, unlike strings where collation is the hazard the
    lowercase-ASCII convention dodges)."""
    rows = ([(2, 1, 1)] * 6 + [(2, 1, 0)] * 4 + [(2, 0, 1)] * 3
            + [(2, 0, 0)] * 7 + [(1, 1, 1)] * 2 + [(1, 0, 0)] * 5
            + [(1, 1, 0)] * 3 + [(1, 0, 1)] * 4)
    df = spark.createDataFrame(rows, "st int, e int, y int")
    out = sorted(relational.cmh_test(df, "st", "e", "y").collect(),
                 key=lambda r: r["st"])
    assert [r["st"] for r in out] == [1, 2]
    # the fold accumulates in ascending stratum order
    assert out[1]["var_cum"] > out[0]["var_cum"] > 0
    assert out[1]["chi2_stat"] is not None


# ---------------------------------------------------------------------------
# mh_odds_ratio / woolf_test (BANKED for r18 — docs/BACKLOG.md)
# ---------------------------------------------------------------------------

def test_mh_one_stratum_equals_cross_product_ratio(spark):
    """With ONE stratum OR_MH = ad/bc exactly, and the RBG variance
    reduces to Woolf's uncorrected 1/a + 1/b + 1/c + 1/d (the
    classical single-table identity — the RBG estimator is built to
    interpolate between this large-stratum regime and the sparse-
    strata MH regime). Hand-checked table: the cmh fixture table
    (n=50, r1=30, c1=16, a=12) -> a,b,c,d = 12,18,4,16;
    OR = 12*16/(18*4) = 8/3; var = 1/12+1/18+1/4+1/16."""
    import math

    rows = ([("s", 1, 1)] * 12 + [("s", 1, 0)] * 18
            + [("s", 0, 1)] * 4 + [("s", 0, 0)] * 16)
    df = spark.createDataFrame(rows, "st string, e int, y int")
    out = relational.mh_odds_ratio(df, "st", "e", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_total"], r["n_exposed"], r["n_success"],
            r["a_obs"]) == (50, 30, 16, 12)
    assert r["r_term"] == pytest.approx(12 * 16 / 50, abs=1e-6)
    assert r["s_term"] == pytest.approx(18 * 4 / 50, abs=1e-6)
    assert r["or_mh"] == pytest.approx(8 / 3, abs=1e-4)
    var = 1 / 12 + 1 / 18 + 1 / 4 + 1 / 16
    assert r["se_log"] == pytest.approx(math.sqrt(var), abs=1e-6)
    lo = math.exp(math.log(8 / 3) - 1.96 * math.sqrt(var))
    hi = math.exp(math.log(8 / 3) + 1.96 * math.sqrt(var))
    assert r["ci_low"] == pytest.approx(lo, abs=1e-4)
    assert r["ci_high"] == pytest.approx(hi, abs=1e-4)
    # the CI brackets the estimate
    assert r["ci_low"] < r["or_mh"] < r["ci_high"]


def test_mh_label_swap_inverts_or_preserves_se(spark):
    """Swapping the exposure labels maps a<->c, b<->d, so R<->S and
    P<->Q: OR inverts (OR -> 1/OR), the RBG variance is INVARIANT
    (term1 <-> term3, term2 fixed), and the CI bounds swap as
    reciprocals. Same for outcome labels (a<->b, c<->d -> R<->S
    again)."""
    rows = ([("u", 1, 1)] * 8 + [("u", 1, 0)] * 12 + [("u", 0, 1)] * 3
            + [("u", 0, 0)] * 17 + [("v", 1, 1)] * 10
            + [("v", 1, 0)] * 5 + [("v", 0, 1)] * 6 + [("v", 0, 0)] * 9)
    df = spark.createDataFrame(rows, "st string, e int, y int")
    base = max(relational.mh_odds_ratio(df, "st", "e", "y").collect(),
               key=lambda r: r["st"])
    flip_e = df.selectExpr("st", "1 - e AS e", "y")
    sw = max(relational.mh_odds_ratio(flip_e, "st", "e", "y").collect(),
             key=lambda r: r["st"])
    assert sw["or_mh"] == pytest.approx(1 / base["or_mh"], abs=1e-3)
    assert sw["se_log"] == pytest.approx(base["se_log"], abs=1e-5)
    assert sw["ci_low"] == pytest.approx(1 / base["ci_high"], abs=1e-3)
    assert sw["ci_high"] == pytest.approx(1 / base["ci_low"], abs=1e-3)
    flip_y = df.selectExpr("st", "e", "1 - y AS y")
    sy = max(relational.mh_odds_ratio(flip_y, "st", "e", "y").collect(),
             key=lambda r: r["st"])
    assert sy["or_mh"] == pytest.approx(1 / base["or_mh"], abs=1e-3)
    assert sy["se_log"] == pytest.approx(base["se_log"], abs=1e-5)


def test_mh_duplicated_strata_or_invariant_ci_narrows(spark):
    """j identical strata: R and S scale by j so OR_MH is INVARIANT,
    while every variance numerator scales by j against j^2 in the
    denominators — Var scales by 1/j, se by 1/sqrt(j), and the CI
    narrows (more strata = more evidence about the SAME ratio; the
    estimate twin of cmh's chi2-scales-by-j)."""
    import math

    rows = ([("s", 1, 1)] * 12 + [("s", 1, 0)] * 18
            + [("s", 0, 1)] * 4 + [("s", 0, 0)] * 16)
    one = relational.mh_odds_ratio(
        spark.createDataFrame(rows, "st string, e int, y int"),
        "st", "e", "y").collect()[0]
    tripled = [(f"s{k}", e, y) for k in range(3) for (_, e, y) in rows]
    out = relational.mh_odds_ratio(
        spark.createDataFrame(tripled, "st string, e int, y int"),
        "st", "e", "y").collect()
    final = max(out, key=lambda r: r["st"])
    assert len(out) == 3
    assert final["or_mh"] == pytest.approx(one["or_mh"], abs=1e-4)
    assert final["se_log"] == pytest.approx(
        one["se_log"] / math.sqrt(3), abs=1e-5)
    assert final["ci_low"] > one["ci_low"]
    assert final["ci_high"] < one["ci_high"]


def test_mh_degenerate_and_zero_sum_rules(spark):
    """Degenerate strata need NO correction: a stratum with an empty
    diagonal contributes 0 to the corresponding sum and simply drops
    out. or_mh is NULL while running S = 0; exactly 0.0 when R = 0
    with S > 0; se/ci are NULL unless BOTH running sums are positive
    (ln(0) has no CI) — and none of those paths may raise under ANSI
    division."""
    # all-success outcome: b = d = 0 -> R = S = 0 -> everything NULL
    dg = spark.createDataFrame(
        [("s", 1, 1)] * 3 + [("s", 0, 1)] * 2,
        "st string, e int, y int")
    r = relational.mh_odds_ratio(dg, "st", "e", "y").collect()[0]
    assert r["r_term"] == 0.0 and r["s_term"] == 0.0
    assert r["or_mh"] is None and r["se_log"] is None
    assert r["ci_low"] is None and r["ci_high"] is None
    # a = 0 with b, c, d > 0: R = 0, S > 0 -> or_mh exactly 0.0, no CI
    z = spark.createDataFrame(
        [("s", 1, 0)] * 4 + [("s", 0, 1)] * 3 + [("s", 0, 0)] * 2,
        "st string, e int, y int")
    r0 = relational.mh_odds_ratio(z, "st", "e", "y").collect()[0]
    assert r0["or_mh"] == 0.0
    assert r0["se_log"] is None and r0["ci_low"] is None
    # a degenerate stratum next to a real one leaves the estimate the
    # real stratum's own
    rows = ([("a", 1, 1)] * 12 + [("a", 1, 0)] * 18
            + [("a", 0, 1)] * 4 + [("a", 0, 0)] * 16)
    alone = relational.mh_odds_ratio(
        spark.createDataFrame(rows, "st string, e int, y int"),
        "st", "e", "y").collect()[0]
    both = max(relational.mh_odds_ratio(
        spark.createDataFrame(
            rows + [("z", 1, 1)] * 3 + [("z", 0, 1)] * 2,
            "st string, e int, y int"),
        "st", "e", "y").collect(), key=lambda r: r["st"])
    assert both["or_mh"] == alone["or_mh"]
    assert both["se_log"] == alone["se_log"]


def test_mh_strictness_guards(spark):
    """cmh-verbatim in-plan contract: non-{0,1} exposure/outcome
    (incl. null) and null strata raise; output-name collisions raise
    eagerly."""
    ok = spark.createDataFrame(
        [("a", 1, 1), ("a", 0, 0), ("a", 1, 0), ("a", 0, 1)],
        "st string, e int, y int")
    assert len(relational.mh_odds_ratio(ok, "st", "e", "y")
               .collect()) == 1
    bad_e = ok.union(spark.createDataFrame(
        [("a", 7, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="exposure column"):
        relational.mh_odds_ratio(bad_e, "st", "e", "y").collect()
    null_y = ok.union(spark.createDataFrame(
        [("a", 1, None)], "st string, e int, y int"))
    with pytest.raises(Exception, match="outcome column"):
        relational.mh_odds_ratio(null_y, "st", "e", "y").collect()
    null_s = ok.union(spark.createDataFrame(
        [(None, 1, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="stratum column must be"):
        relational.mh_odds_ratio(null_s, "st", "e", "y").collect()
    with pytest.raises(ValueError, match="collides"):
        relational.mh_odds_ratio(
            ok.withColumnRenamed("st", "or_mh"), "or_mh", "e", "y")


def test_woolf_two_strata_closed_form(spark):
    """k = 2: chi2 = w1 w2 (L1 - L2)^2 / (w1 + w2) — computed here
    from the Haldane-corrected cells in Python and compared against
    the operator's fold."""
    import math

    rows_a = ([("a", 1, 1)] * 8 + [("a", 1, 0)] * 12
              + [("a", 0, 1)] * 3 + [("a", 0, 0)] * 17)
    rows_b = ([("b", 1, 1)] * 10 + [("b", 1, 0)] * 5
              + [("b", 0, 1)] * 6 + [("b", 0, 0)] * 9)
    df = spark.createDataFrame(rows_a + rows_b,
                               "st string, e int, y int")
    out = sorted(relational.woolf_test(df, "st", "e", "y").collect(),
                 key=lambda r: r["st"])

    def hald(a, b, c, d):
        ah, bh, ch, dh = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        return (math.log(ah * dh / bh / ch),
                1 / (1 / ah + 1 / bh + 1 / ch + 1 / dh))

    l1, w1 = hald(8, 12, 3, 17)
    l2, w2 = hald(10, 5, 6, 9)
    assert out[0]["log_or"] == pytest.approx(l1, abs=1e-6)
    assert out[0]["weight"] == pytest.approx(w1, abs=1e-6)
    assert out[1]["log_or"] == pytest.approx(l2, abs=1e-6)
    assert out[1]["weight"] == pytest.approx(w2, abs=1e-6)
    chi2 = w1 * w2 * (l1 - l2) ** 2 / (w1 + w2)
    assert out[1]["chi2_stat"] == pytest.approx(chi2, abs=1e-4)
    assert out[1]["dof"] == 1
    pooled = (w1 * l1 + w2 * l2) / (w1 + w2)
    assert out[1]["log_or_pooled"] == pytest.approx(pooled, abs=1e-6)
    # first trace row: one stratum cannot be heterogeneous
    assert out[0]["chi2_stat"] is None and out[0]["dof"] == 0
    assert out[0]["significant_05"] is None


def test_woolf_identical_strata_zero_and_duplication_scales(spark):
    """K identical strata are perfectly homogeneous: chi2 = 0.0 (the
    greatest() clamp keeps float cancellation from emitting -0.0).
    Duplicating a HETEROGENEOUS pair j times multiplies chi2 by j —
    heterogeneity evidence accumulates."""
    rows = ([("s", 1, 1)] * 12 + [("s", 1, 0)] * 18
            + [("s", 0, 1)] * 4 + [("s", 0, 0)] * 16)
    tripled = [(f"s{k}", e, y) for k in range(3) for (_, e, y) in rows]
    out = relational.woolf_test(
        spark.createDataFrame(tripled, "st string, e int, y int"),
        "st", "e", "y").collect()
    final = max(out, key=lambda r: r["st"])
    assert final["chi2_stat"] == 0.0 and final["dof"] == 2
    assert final["significant_05"] is False
    hetero = ([("a", 1, 1)] * 20 + [("a", 1, 0)] * 5
              + [("a", 0, 1)] * 5 + [("a", 0, 0)] * 20
              + [("b", 1, 1)] * 5 + [("b", 1, 0)] * 20
              + [("b", 0, 1)] * 20 + [("b", 0, 0)] * 5)
    one = max(relational.woolf_test(
        spark.createDataFrame(hetero, "st string, e int, y int"),
        "st", "e", "y").collect(), key=lambda r: r["st"])
    dup = [(s + str(k), e, y) for k in range(2) for (s, e, y) in hetero]
    two = max(relational.woolf_test(
        spark.createDataFrame(dup, "st string, e int, y int"),
        "st", "e", "y").collect(), key=lambda r: r["st"])
    assert two["chi2_stat"] == pytest.approx(
        2 * one["chi2_stat"], abs=2e-3)
    assert two["dof"] == 3


def test_woolf_label_swap_invariant_and_zero_cells_finite(spark):
    """Swapping exposure labels negates every L_k and preserves every
    w_k, so chi2 is invariant. A stratum with empty cells still
    contributes FINITE corrected log-OR and weight (the
    Haldane-Anscombe point) — no NULLs, no infinities."""
    rows = ([("u", 1, 1)] * 8 + [("u", 1, 0)] * 12 + [("u", 0, 1)] * 3
            + [("u", 0, 0)] * 17 + [("v", 1, 1)] * 10
            + [("v", 1, 0)] * 5 + [("v", 0, 1)] * 6 + [("v", 0, 0)] * 9)
    df = spark.createDataFrame(rows, "st string, e int, y int")
    base = max(relational.woolf_test(df, "st", "e", "y").collect(),
               key=lambda r: r["st"])
    sw = max(relational.woolf_test(
        df.selectExpr("st", "1 - e AS e", "y"), "st", "e", "y")
        .collect(), key=lambda r: r["st"])
    assert sw["chi2_stat"] == pytest.approx(base["chi2_stat"],
                                            abs=1e-4)
    assert sw["log_or"] == pytest.approx(-base["log_or"], abs=1e-6)
    assert sw["weight"] == pytest.approx(base["weight"], abs=1e-6)
    # all-success stratum (b = d = 0): finite L and w via +0.5
    dg = spark.createDataFrame(
        [("s", 1, 1)] * 3 + [("s", 0, 1)] * 2,
        "st string, e int, y int")
    r = relational.woolf_test(dg, "st", "e", "y").collect()[0]
    assert r["log_or"] is not None and r["weight"] is not None
    assert abs(r["log_or"]) < 10 and r["weight"] > 0


def test_woolf_strictness_guards(spark):
    """cmh-verbatim in-plan contract plus the dof rules: non-{0,1}
    exposure/outcome and null strata raise; dof > 10 yields NULL flag
    (beyond the inlined critical table); collisions raise eagerly."""
    ok = spark.createDataFrame(
        [("a", 1, 1), ("a", 0, 0), ("a", 1, 0), ("a", 0, 1)],
        "st string, e int, y int")
    assert len(relational.woolf_test(ok, "st", "e", "y")
               .collect()) == 1
    bad_e = ok.union(spark.createDataFrame(
        [("a", None, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="exposure column"):
        relational.woolf_test(bad_e, "st", "e", "y").collect()
    bad_y = ok.union(spark.createDataFrame(
        [("a", 1, 9)], "st string, e int, y int"))
    with pytest.raises(Exception, match="outcome column"):
        relational.woolf_test(bad_y, "st", "e", "y").collect()
    null_s = ok.union(spark.createDataFrame(
        [(None, 1, 1)], "st string, e int, y int"))
    with pytest.raises(Exception, match="stratum column must be"):
        relational.woolf_test(null_s, "st", "e", "y").collect()
    # 12 strata -> final dof = 11, beyond the df 1..10 table
    many = [(f"s{i:02d}", e, y)
            for i in range(12)
            for (e, y) in [(1, 1), (1, 0), (0, 1), (0, 0)]]
    out = relational.woolf_test(
        spark.createDataFrame(many, "st string, e int, y int"),
        "st", "e", "y").collect()
    final = max(out, key=lambda r: r["st"])
    assert final["dof"] == 11 and final["chi2_stat"] is not None
    assert final["significant_05"] is None
    with pytest.raises(ValueError, match="collides"):
        relational.woolf_test(
            ok.withColumnRenamed("st", "weight"), "weight", "e", "y")
