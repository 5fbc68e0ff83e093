"""Property-based tests (hypothesis) for the pure arithmetic the engine
re-implements distributively — the pieces where an off-by-one silently
mis-buckets rows at scale. Pure-Python properties run hundreds of cases;
Spark-backed checks stay in the example-based suites (per-example Spark
jobs are too slow for hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL ntile semantics, straight from the definition: first n%k
    buckets get ceil(n/k) rows, the rest floor(n/k)."""
    base, rem = divmod(n, k)
    out = []
    for bucket in range(1, k + 1):
        out.extend([bucket] * (base + 1 if bucket <= rem else base))
    return out


def _ntile_arithmetic(idx: int, n: int, k: int) -> int:
    """The closed form used by plans/queries.py::_q_ntile_spend (0-based
    global rank -> 1-based bucket), mirrored here in pure Python."""
    base, rem = divmod(n, k)
    cut = rem * (base + 1)
    if idx < cut:
        return idx // (base + 1) + 1
    return rem + (idx - cut) // max(base, 1) + 1


@given(st.integers(min_value=1, max_value=10_000),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=300)
def test_ntile_closed_form_matches_definition(n, k):
    ref = _ntile_reference(n, k)
    got = [_ntile_arithmetic(i, n, k) for i in range(n)]
    assert got == ref


@given(st.integers(min_value=0, max_value=255),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200)
def test_morton_interleave_orders_quadrants(x, y):
    """The z-value bit interleaving used by files.write_zorder: both
    coordinates' high bits dominate, so quadrant order is preserved —
    any point in the low/low quadrant sorts before any in high/high."""
    def z(a, b, bits=8):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    half = 128
    if x < half and y < half:
        assert z(x, y) < z(half, half)
    if x >= half and y >= half:
        assert z(x, y) >= z(half, half)


@given(st.lists(st.integers(min_value=1, max_value=500),
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=4096))
@settings(max_examples=200)
def test_packing_start_offset_rule_invariants(sizes, budget):
    """doc_packing's pack id = floor(tokens_before_doc / budget):
    pack ids are non-decreasing, start at 0, never skip more than the
    oversized-doc fan-over allows, and every pack except possibly the
    last holds >= 1 doc and crosses the budget boundary."""
    cum = 0
    packs = []
    for s in sizes:
        packs.append(cum // budget)
        cum += s
    assert packs[0] == 0
    assert all(b >= a for a, b in zip(packs, packs[1:]))
    # a pack id advances at most ceil(size/budget): only the preceding
    # doc's tokens can push the boundary forward
    for (p_prev, p_next), s in zip(zip(packs, packs[1:]), sizes):
        assert p_next - p_prev <= (s + budget - 1) // budget
    # total conservation: last pack id bounded by total/budget
    assert packs[-1] <= (cum - sizes[-1]) // budget


def _simhash_bands(h: int, bands: int = 4, bits: int = 60):
    width = bits // bands
    mask = (1 << width) - 1
    return [(b, (h >> (b * width)) & mask) for b in range(bands)]


@given(st.integers(min_value=0, max_value=(1 << 60) - 1),
       st.sets(st.integers(min_value=0, max_value=59),
               min_size=0, max_size=3))
@settings(max_examples=300)
def test_simhash_banding_recall_complete_for_hamming_le_bands_minus_1(h, flips):
    """Pigeonhole: flipping <= bands-1 bits leaves at least one of the 4
    15-bit bands untouched, so banded candidate generation has FULL
    recall for hamming <= 3 (the guarantee dedup.simhash_pairs relies on)."""
    h2 = h
    for bit in flips:
        h2 ^= 1 << bit
    a, b = _simhash_bands(h), _simhash_bands(h2)
    assert any(x == y for x, y in zip(a, b))


def _luhn_reference(s: str) -> bool:
    """Textbook Luhn: from the right, double every second digit with a
    9-subtraction above 9; valid iff the total is = 0 (mod 10)."""
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@given(st.text(alphabet="0123456789", min_size=16, max_size=16))
@settings(max_examples=200, deadline=None)
def test_luhn_sql_matches_reference(s):
    """The generated Luhn SQL (shared verbatim by the Spark query and its
    DuckDB oracle — functions/texts.py::luhn_valid_sql) must agree with
    the textbook algorithm on arbitrary 16-digit strings. Executed via
    DuckDB (milliseconds per example; the Spark side runs the identical
    string, covered by the example-based suites and the driver oracle)."""
    import duckdb

    from data_pipeline_eng_project_1_spark.functions import texts

    sql = texts.luhn_valid_sql(f"'{s}'", 16)
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == _luhn_reference(s), s


@given(st.lists(st.tuples(st.integers(0, 9),          # doc
                          st.integers(0, 11),          # term id
                          st.integers(-5, 5)),         # weight (exact ints)
                min_size=0, max_size=60),
       st.lists(st.integers(0, 3), min_size=12, max_size=12))  # term->hash
@settings(max_examples=300)
def test_collision_split_join_identity(postings, hash_of):
    """The r8 hashed-join trick as pure algebra: for ANY term->hash map
    (arbitrarily colliding) and ANY posting multiset, joining on the
    hash with 'carry the term only under a collided hash + null-safe
    residual' yields exactly the string-keyed join's per-pair partial
    sums (plans/llm_ops.py::text_tfidf_cosine_pairs,
    functions/hashing.py::collided_hash_keys)."""
    from collections import defaultdict

    def pair_sums(rows, key_of, residual):
        out = defaultdict(lambda: [0, 0])
        for da, ta, ua in rows:
            for db, tb, ub in rows:
                if da < db and key_of(ta) == key_of(tb) \
                        and residual(ta, tb):
                    s = out[(da, db)]
                    s[0] += ua * ub
                    s[1] += 1
        return {k: tuple(v) for k, v in out.items()}

    vocab = {t for _, t, _ in postings}
    collided = {h for h in set(hash_of)
                if sum(1 for t in vocab if hash_of[t] == h) > 1}
    want = pair_sums(postings, lambda t: t, lambda a, b: True)
    t2 = {t: (t if hash_of[t] in collided else None) for t in vocab}
    got = pair_sums(postings, lambda t: hash_of[t],
                    lambda a, b: t2[a] == t2[b])
    assert got == want


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=400),
       st.integers(min_value=2, max_value=32))
@settings(max_examples=200)
def test_equidepth_bucket_rule_invariants(vals, k):
    """The full bucket rule of
    operators/relational.py::equidepth_histogram — strictly-below count
    over DEDUPED percentile boundaries, then a dense re-rank of the
    non-empty buckets: final ids are dense 1..k' with k' <= k, every
    row lands in exactly one bucket (total preserved), and bucket
    value-ranges never interleave. (The dense re-rank exists because
    this test falsified the dedup-only claim: with sparse data or
    n < k, no value falls between two distinct interpolated boundaries
    and a raw id goes unused — e.g. vals=[0.0, 1.0], k=3.)"""
    import numpy as np

    bounds = sorted(set(
        float(np.percentile(np.array(vals), 100 * i / k, method="linear"))
        for i in range(1, k)))
    raw = {v: 1 + sum(1 for b in bounds if b < v) for v in set(vals)}
    rank = {r: i + 1 for i, r in enumerate(sorted(set(raw.values())))}
    bucket = {v: rank[raw[v]] for v in raw}         # the dense re-rank
    ids = sorted(set(bucket.values()))
    assert ids == list(range(1, len(ids) + 1))      # dense from 1
    assert len(ids) <= k
    assert sum(1 for v in vals if bucket[v]) == len(vals)
    # ranges ordered: max of bucket i < min of bucket i+1
    by_id = {i: [v for v in vals if bucket[v] == i] for i in ids}
    for lo_id, hi_id in zip(ids, ids[1:]):
        assert max(by_id[lo_id]) < min(by_id[hi_id])


@given(st.text(alphabet="abcdef 01", min_size=0, max_size=700))
@settings(max_examples=200)
def test_cdc_gear_fold_chunk_invariants(text):
    """Structural invariants of the CDC cut rule
    (functions/texts.py::cdc_boundaries, mirrored sequentially the way
    tests/test_text_ops.py does): boundaries start at 0, are strictly
    increasing, every interior chunk length lands in [min_len, max_len],
    and the trailing chunk never exceeds max_len (a forced cut would
    have fired inside it)."""
    import re

    from data_pipeline_eng_project_1_spark.functions import texts

    norm = re.sub(" +", " ",
                  re.sub("[^a-z0-9 ]", "", text.lower())).strip()
    gear = texts._cdc_gear()
    h, run, bounds = 0, 0, [0] if norm else []
    for i, c in enumerate(norm):
        h = (2 * h + gear[c]) % 2147483648
        run += 1
        if (run >= 32 and h % 64 == 0) or run >= 128:
            if i + 1 < len(norm):
                bounds.append(i + 1)
            h, run = 0, 0
    if not norm:
        assert bounds == []
        return
    assert bounds[0] == 0
    assert bounds == sorted(set(bounds))
    gaps = [b2 - b1 for b1, b2 in zip(bounds, bounds[1:])]
    assert all(32 <= g <= 128 for g in gaps), gaps
    assert 1 <= len(norm) - bounds[-1] <= 128


@given(st.lists(st.integers(min_value=0, max_value=3000),
                min_size=1, max_size=25),
       st.lists(st.integers(min_value=0, max_value=3000),
                min_size=1, max_size=25),
       st.integers(min_value=-900, max_value=900),
       st.integers(min_value=1, max_value=900))
@settings(max_examples=300)
def test_binned_range_join_bucket_rule_is_complete(lts, rts, lower, width):
    """operators/relational.py::binned_range_join's bucket algebra,
    mirrored in pure Python with Spark's truncating integer DIV: for any
    non-negative timestamps and any window [lower, lower+width) —
    including the NEGATIVE lower the multi-touch attribution uses — the
    (bucket-match then exact filter) pipeline finds exactly the
    brute-force pair set. Truncation toward zero on a negative left
    endpoint can only add already-empty buckets, never drop one."""
    upper = lower + width

    def spark_div(a, b):  # Spark's integer DIV truncates toward zero
        q = abs(a) // b
        return q if a >= 0 else -q

    want = {(l, r) for l in lts for r in rts
            if l + lower <= r < l + upper}
    got = set()
    for l in lts:
        b_lo = spark_div(l + lower, width)
        b_hi = spark_div(l + upper - 1, width)
        buckets = set(range(min(b_lo, b_hi), max(b_lo, b_hi) + 1))
        for r in rts:
            if spark_div(r, width) in buckets and l + lower <= r < l + upper:
                got.add((l, r))
    assert got == want


# ---------------------------------------------------------------------------
# kaplan_meier: the exp(running ln-sum) + dead-latch formulation must equal
# the textbook iterative product-limit on any (duration, observed) multiset
# ---------------------------------------------------------------------------

def _km_operator_algebra(rows):
    """Python twin of relational.kaplan_meier's window algebra: per-t
    aggregate, risk set via prior-row sums, survival as exp of the
    running ln-sum with the all-at-risk-fail latch."""
    import math as m
    from collections import Counter
    ev, cn = Counter(), Counter()
    for t, obs in rows:
        (ev if obs else cn)[t] += 1
    ts = sorted(set(ev) | set(cn))
    total = len(rows)
    out, seen, lsum, dead = {}, 0, 0.0, False
    for t in ts:
        n_risk = total - seen
        ne = ev[t]
        if ne >= n_risk:
            dead = True
        elif ne > 0:
            lsum += m.log(1.0 - ne / n_risk)
        out[t] = 0.0 if dead else m.exp(lsum)
        seen += ne + cn[t]
    return out


def _km_textbook(rows):
    """Independent reference: classic iterative product limit."""
    from collections import Counter
    ev, cn = Counter(), Counter()
    for t, obs in rows:
        (ev if obs else cn)[t] += 1
    ts = sorted(set(ev) | set(cn))
    total, s, out = len(rows), 1.0, {}
    at_risk = total
    for t in ts:
        if ev[t]:
            s *= 1.0 - ev[t] / at_risk
        out[t] = s
        at_risk -= ev[t] + cn[t]
    return out


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                          st.booleans()),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_kaplan_meier_algebra_matches_textbook_product(rows):
    got, ref = _km_operator_algebra(rows), _km_textbook(rows)
    assert set(got) == set(ref)
    prev = 1.0
    for t in sorted(got):
        assert abs(got[t] - ref[t]) < 1e-12
        assert -1e-12 <= got[t] <= prev + 1e-12  # monotone in [0, 1]
        prev = got[t]


# ---------------------------------------------------------------------------
# roc_auc_binned: trapezoid algebra invariants — AUC in [0, 1], and
# reversing the bucket order (an anti-scoring) reflects it to 1 - AUC
# ---------------------------------------------------------------------------

def _trapezoid_auc(buckets):
    """Python twin of the operator's cumulative TPR/FPR + trapezoid
    windows over (n_pos, n_neg) rows ordered score-descending."""
    tp = sum(p for p, _ in buckets)
    fp = sum(n for _, n in buckets)
    auc, ct, cf, lt, lf = 0.0, 0, 0, 0.0, 0.0
    for p, n in buckets:
        ct += p
        cf += n
        tpr, fpr = ct / tp, cf / fp
        auc += (fpr - lf) * (tpr + lt) / 2
        lt, lf = tpr, fpr
    return auc


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=1, max_size=25).filter(
                    lambda b: sum(p for p, _ in b) > 0
                    and sum(n for _, n in b) > 0))
@settings(max_examples=300)
def test_roc_trapezoid_bounds_and_reflection(buckets):
    auc = _trapezoid_auc(buckets)
    assert -1e-12 <= auc <= 1 + 1e-12
    assert abs(_trapezoid_auc(buckets[::-1]) - (1.0 - auc)) < 1e-9


# ---------------------------------------------------------------------------
# mutual_information: empirical MI of ANY contingency table is >= 0
# (Jensen); zero exactly when the table is a product of its marginals
# ---------------------------------------------------------------------------

def _mi_total(cells):
    import math as m
    tot = sum(cells.values())
    px, py = {}, {}
    for (x, y), n in cells.items():
        px[x] = px.get(x, 0) + n
        py[y] = py.get(y, 0) + n
    return sum((n / tot) * m.log((n / tot) / ((px[x] / tot) * (py[y] / tot)))
               for (x, y), n in cells.items())


@given(st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 3)),
    st.integers(min_value=1, max_value=40),
    min_size=1, max_size=16))
@settings(max_examples=300)
def test_mutual_information_nonnegative_and_product_zero(cells):
    assert _mi_total(cells) >= -1e-12
    # product table from the same marginals -> exactly independent
    xs = sorted({x for x, _ in cells})
    ys = sorted({y for _, y in cells})
    prod = {(x, y): 1 + 2 * xi + 3 * yi  # any rank-1 n_x * n_y pattern
            for xi, x in enumerate(xs) for yi, y in enumerate(ys)}
    rank1 = {(x, y): (1 + xi) * (1 + yi)
             for xi, x in enumerate(xs) for yi, y in enumerate(ys)}
    del prod
    assert abs(_mi_total(rank1)) < 1e-12


# ---------------------------------------------------------------------------
# benford_audit: the integer-string digit rule == the first significant
# digit for any cents-representable positive amount
# ---------------------------------------------------------------------------

@given(st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300)
def test_benford_cents_digit_is_first_significant(cents):
    via_string = int(str(cents)[0])
    c = cents
    while c >= 10:
        c //= 10
    assert via_string == c


# ---------------------------------------------------------------------------
# round-10 banked operators: the pure arithmetic mirrored in Python
# ---------------------------------------------------------------------------

def _gini_rank_identity(xs: list[float]) -> float | None:
    """gini_by_group's closed form: x sorted ascending, 1-based ranks."""
    n, tot = len(xs), sum(xs)
    if tot <= 0:
        return None
    s = sorted(xs)
    iw = sum(i * x for i, x in enumerate(s, start=1))
    return 2.0 * iw / (n * tot) - (n + 1.0) / n


@given(st.lists(st.floats(min_value=0, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_gini_rank_identity_matches_mean_abs_difference(xs):
    """The rank identity used by gini_by_group equals the textbook
    mean-absolute-difference definition G = sum|xi-xj| / (2 n sum x),
    is bounded by [0, (n-1)/n], and is scale-invariant."""
    g = _gini_rank_identity(xs)
    n, tot = len(xs), sum(xs)
    if g is None:
        assert tot <= 0
        return
    mad = sum(abs(a - b) for a in xs for b in xs)
    want = mad / (2.0 * n * tot)
    assert abs(g - want) < 1e-9 * max(1.0, abs(want))
    assert -1e-12 <= g <= (n - 1) / n + 1e-12
    g2 = _gini_rank_identity([x * 7.5 for x in xs])
    assert abs(g - g2) < 1e-9


def _wilson_lower(p: float, n: int, z: float = 1.96) -> float:
    import math as m
    return ((p + z * z / (2 * n)
             - z * m.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)))
            / (1 + z * z / n))


@given(st.integers(min_value=0, max_value=500),
       st.integers(min_value=1, max_value=500))
@settings(max_examples=300)
def test_wilson_lower_bounds_and_monotonicity(k, n):
    """wilson_pass_rate's algebra: 0 <= lower <= p-hat always, exact 0
    at zero successes, and more evidence at the SAME rate tightens the
    bound upward (the small-n humility the operator exists for)."""
    if k > n:
        k = k % (n + 1)
    p = k / n
    lo = _wilson_lower(p, n)
    assert -1e-12 <= lo <= p + 1e-12
    if k == 0:
        assert abs(lo) < 1e-12
    lo10 = _wilson_lower(p, n * 10)
    assert lo10 >= lo - 1e-12


@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=3, max_size=80),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=300)
def test_acf_bounds_and_shift_scale_invariance(counts, lag):
    """acf_binned's sample-ACF arithmetic: |acf| <= 1 (Cauchy-Schwarz
    on the centered series), and the value is invariant under shifting
    or positively scaling the series."""
    if lag >= len(counts):
        lag = len(counts) - 1
    if lag < 1:
        return

    def acf(xs, lg):
        m = sum(xs) / len(xs)
        c = [x - m for x in xs]
        ss = sum(v * v for v in c)
        if ss == 0:
            return None
        return sum(c[i] * c[i + lg] for i in range(len(c) - lg)) / ss

    a = acf([float(x) for x in counts], lag)
    if a is None:
        return
    assert -1.0 - 1e-9 <= a <= 1.0 + 1e-9
    a_shift = acf([x + 123.0 for x in counts], lag)
    a_scale = acf([x * 4.0 for x in counts], lag)
    assert abs(a - a_shift) < 1e-7
    assert abs(a - a_scale) < 1e-7


@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=2, max_size=8),
       st.lists(st.integers(min_value=1, max_value=100),
                min_size=2, max_size=8),
       st.integers(min_value=2, max_value=9))
@settings(max_examples=300)
def test_srm_chi2_identity_scaling_and_zero(counts, weights, mult):
    """srm_check's per-term formula sum((O - E*N)^2 / (E*N)) equals the
    algebraic identity (sum O^2/share)/N - N, is nonnegative, is ZERO
    exactly when observed counts are proportional to the declared
    shares, and scales linearly in N at fixed proportions (the reason
    a fixed chi2_threshold gets MORE sensitive to the same relative
    imbalance as traffic grows — the property an SRM gate relies on)."""
    k = min(len(counts), len(weights))
    counts, weights = counts[:k], weights[:k]
    n_tot = sum(counts)
    if n_tot == 0:
        return
    w_tot = sum(weights)
    shares = [w / w_tot for w in weights]
    chi2 = sum((o - s * n_tot) ** 2 / (s * n_tot)
               for o, s in zip(counts, shares))
    ident = sum(o * o / s for o, s in zip(counts, shares)) / n_tot - n_tot
    assert abs(chi2 - ident) < 1e-6 * max(1.0, abs(chi2))
    assert chi2 >= -1e-9
    # exact proportionality -> zero (build counts FROM the shares)
    prop = [round(s * w_tot * 40) for s in shares]  # w*40 keeps ints exact
    chi2_prop = sum((o - s * sum(prop)) ** 2 / (s * sum(prop))
                    for o, s in zip(prop, shares))
    assert chi2_prop < 1e-9
    # m x counts -> m x chi2 (linearity in N at fixed proportions)
    chi2_m = sum((mult * o - s * mult * n_tot) ** 2 / (s * mult * n_tot)
                 for o, s in zip(counts, shares))
    assert abs(chi2_m - mult * chi2) < 1e-6 * max(1.0, abs(chi2_m))


@given(st.lists(st.integers(min_value=0, max_value=1), min_size=1,
                max_size=300),
       st.lists(st.integers(min_value=1, max_value=20), min_size=1,
                max_size=30),
       st.floats(min_value=0.01, max_value=0.45),
       st.floats(min_value=0.01, max_value=0.45),
       st.floats(min_value=1.05, max_value=10.0))
@settings(max_examples=300)
def test_sprt_llr_binning_invariance_and_boundaries(bits, cuts, alpha,
                                                    beta, r):
    """sprt_ab/sprt_stream's load-bearing algebra: the cumulative LLR is
    a SUM of per-success constants, so ANY binning of the success
    sequence (batch bins, stream micro-batches) cumsums to the same
    final value as counts x constants; and for every valid
    (alpha, beta) the Wald boundaries straddle zero (ln_b < 0 < ln_a),
    so 'continue' is always a reachable state and both accepts are
    mutually exclusive."""
    import math as m

    q = r / (1.0 + r)
    c1, c0 = m.log(2.0 * q), m.log(2.0 * (1.0 - q))
    ln_a = m.log((1.0 - beta) / alpha)
    ln_b = m.log(beta / (1.0 - alpha))
    assert ln_b < 0 < ln_a

    direct = sum(bits) * c1 + (len(bits) - sum(bits)) * c0
    # partition the sequence by the random cut widths, per-bin increments
    llr, i, ci = 0.0, 0, 0
    while i < len(bits):
        width = cuts[ci % len(cuts)]
        chunk = bits[i:i + width]
        llr += sum(chunk) * c1 + (len(chunk) - sum(chunk)) * c0
        i += width
        ci += 1
    assert abs(llr - direct) < 1e-9 * max(1.0, abs(direct))


# ---------------------------------------------------------------------------
# mann_whitney_u (banked r13): the rank-free identity — the integer
# 2*avg_rank = 2*prefix_count + t + 1 accumulation must equal the
# textbook midrank computation on ANY multiset with ties, and the
# resulting U must satisfy U1 + U0 = n0*n1
# ---------------------------------------------------------------------------

def _mwu_operator_algebra(pairs):
    """Python twin of relational.mann_whitney_u's accumulation: count
    per distinct value, prefix counts in value order, integer r1x2."""
    from collections import Counter
    c0 = Counter(v for g, v in pairs if g == 0)
    c1 = Counter(v for g, v in pairs if g == 1)
    values = sorted(set(c0) | set(c1))
    cb, r1x2, ties = 0, 0, 0
    for v in values:
        t = c0[v] + c1[v]
        r1x2 += c1[v] * (2 * cb + t + 1)
        ties += t * t * t - t
        cb += t
    n0, n1 = sum(c0.values()), sum(c1.values())
    u1 = r1x2 / 2.0 - n1 * (n1 + 1.0) / 2.0
    return n0, n1, u1, ties


def _mwu_textbook_midranks(pairs):
    """Direct midrank computation: sort all observations, assign each
    tie-group the mean of the ranks it spans, sum variant-1 ranks."""
    ordered = sorted(pairs, key=lambda p: p[1])
    n = len(ordered)
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and ordered[j][1] == ordered[i][1]:
            j += 1
        mid = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        for k in range(i, j):
            ranks[k] = mid
        i = j
    r1 = sum(r for (g, _), r in zip(ordered, ranks) if g == 1)
    n1 = sum(1 for g, _ in pairs if g == 1)
    return r1 - n1 * (n1 + 1.0) / 2.0


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(-20, 20)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_mann_whitney_rank_free_identity_matches_midranks(pairs):
    n0, n1, u1, ties = _mwu_operator_algebra(pairs)
    assert abs(u1 - _mwu_textbook_midranks(pairs)) < 1e-9
    # U1 + U0 = n0 * n1 (computed by symmetry: swap the arms)
    swapped = [(1 - g, v) for g, v in pairs]
    _, _, u0, _ = _mwu_operator_algebra(swapped)
    assert abs((u1 + u0) - n0 * n1) < 1e-9
    # tie term bounds: 0 (all distinct) .. N^3 - N (all equal)
    N = n0 + n1
    assert 0 <= ties <= N ** 3 - N


# ---------------------------------------------------------------------------
# nelson_aalen (banked r13): the risk-set/hazard windows must equal the
# sequential textbook recurrence, H is nondecreasing, and
# exp(-H) >= S_KM everywhere both are defined (the classical bound)
# ---------------------------------------------------------------------------

def _na_operator_algebra(rows):
    """Python twin of relational.nelson_aalen's aggregate + windows."""
    from collections import Counter
    per = Counter()
    for t, obs in rows:
        per[t] += 1
    events = Counter(t for t, obs in rows if obs)
    total = len(rows)
    h, var, out, seen = 0.0, 0.0, {}, 0
    for t in sorted(per):
        n_risk = total - seen
        d = events[t]
        h += d / n_risk
        var += d / n_risk / n_risk
        out[t] = (n_risk, h, var)
        seen += per[t]
    return out


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                          st.booleans()),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_nelson_aalen_algebra_monotone_and_bounds_km(rows):
    na = _na_operator_algebra(rows)
    km = _km_textbook(rows)
    assert set(na) == set(km)
    import math as m
    prev_h = 0.0
    for t in sorted(na):
        n_risk, h, var = na[t]
        assert h >= prev_h - 1e-12          # hazard never decreases
        assert var >= 0
        prev_h = h
        if km[t] > 0:
            assert m.exp(-h) >= km[t] - 1e-9  # exp(-H) >= S_KM


# ---------------------------------------------------------------------------
# kruskal_wallis (banked r14): the rank-free accumulation (RANGE-frame
# cum_le/peers identity) must equal the textbook pooled-midrank H on ANY
# k-class multiset with ties, and for k = 2 the tie-corrected H must
# equal the square of mann_whitney_u's tie-corrected z
# ---------------------------------------------------------------------------

def _kw_operator_algebra(pairs):
    """Python twin of relational.kruskal_wallis's accumulation: count
    per (class, value) cell, RANGE-window identities in value order,
    ordered cross-class fold of (r2x2/2)^2/n."""
    from collections import Counter
    cnt = Counter(pairs)  # (clazz, value) -> count
    classes = sorted({c for c, _ in pairs})
    values = sorted({v for _, v in pairs})
    t_of = {v: sum(cnt[(c, v)] for c in classes) for v in values}
    cum_le, rank2, ties = 0, {}, 0
    for v in values:
        t = t_of[v]
        cum_le += t
        rank2[v] = 2 * cum_le - t + 1  # == 2*prefix + t + 1
        ties += t * t * t - t
    sumr = 0.0
    n_total = 0
    for c in classes:  # ordered fold, ascending class (window order)
        n_c = sum(cnt[(c, v)] for v in values)
        r2x2 = sum(cnt[(c, v)] * rank2[v] for v in values)
        sumr += (r2x2 / 2.0) * (r2x2 / 2.0) / n_c
        n_total += n_c
    nd = float(n_total)
    h = 12.0 / (nd * (nd + 1.0)) * sumr - 3.0 * (nd + 1.0)
    corr = 1.0 - ties / (nd * nd * nd - nd) if n_total > 1 else None
    h_corr = h / corr if corr and corr > 0 else None
    return len(classes), n_total, h, h_corr, ties


def _kw_textbook_midranks(pairs):
    """Direct pooled-midrank H: sort everything, midrank tie groups,
    per-class rank sums into the textbook formula."""
    ordered = sorted(pairs, key=lambda p: p[1])
    n = len(ordered)
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and ordered[j][1] == ordered[i][1]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = mid
        i = j
    from collections import defaultdict
    rsum, ncnt = defaultdict(float), defaultdict(int)
    for (c, _), r in zip(ordered, ranks):
        rsum[c] += r
        ncnt[c] += 1
    h = (12.0 / (n * (n + 1.0))
         * sum(rsum[c] ** 2 / ncnt[c] for c in rsum)
         - 3.0 * (n + 1.0))
    return h


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(-15, 15)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_kruskal_rank_free_identity_matches_midranks(pairs):
    k, n, h, h_corr, ties = _kw_operator_algebra(pairs)
    assert abs(h - _kw_textbook_midranks(pairs)) < 1e-9 * max(1.0, abs(h))
    assert 0 <= ties <= n ** 3 - n
    # H is scale-location free in the value: shifting values changes
    # nothing (ranks only)
    shifted = [(c, v + 7) for c, v in pairs]
    _, _, h2, _, _ = _kw_operator_algebra(shifted)
    assert abs(h - h2) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(-10, 10)),
                min_size=2, max_size=80))
@settings(max_examples=300)
def test_kruskal_k2_equals_mannwhitney_z_squared(pairs):
    """The classical identity: with two classes, tie-corrected H equals
    the square of the tie-corrected rank-sum z (no continuity
    correction on either side — matching both operators' forms)."""
    if not ({c for c, _ in pairs} == {0, 1}):
        return
    n0, n1, u1, ties = _mwu_operator_algebra(pairs)
    N = n0 + n1
    sigma2 = (n0 * n1 / 12.0
              * ((N + 1.0) - ties / (N * (N - 1.0)))) if N > 1 else 0.0
    if sigma2 <= 0:
        return
    mu = n0 * n1 / 2.0
    z = (u1 - mu) / sigma2 ** 0.5
    _, _, _, h_corr, _ = _kw_operator_algebra(pairs)
    assert h_corr is not None
    assert abs(h_corr - z * z) < 1e-6 * max(1.0, z * z)


# ---------------------------------------------------------------------------
# logrank_test (banked r14): the duration-aggregate/window accumulation
# must equal an independently-structured subject-level reference;
# label-swap negates the statistic; identical groups score exactly 0
# ---------------------------------------------------------------------------

def _lr_operator_algebra(rows):
    """Python twin of relational.logrank_test's accumulation: one
    (duration) aggregate, sequential risk sets, ordered running sums.
    Returns (ome, var) at the final duration."""
    from collections import Counter
    d0 = Counter(t for t, obs, g in rows if g == 0 and obs)
    d1 = Counter(t for t, obs, g in rows if g == 1 and obs)
    a0 = Counter(t for t, obs, g in rows if g == 0)
    a1 = Counter(t for t, obs, g in rows if g == 1)
    tot0, tot1 = sum(a0.values()), sum(a1.values())
    seen0 = seen1 = 0
    ome = var = 0.0
    for t in sorted(set(a0) | set(a1)):
        n0, n1 = tot0 - seen0, tot1 - seen1
        n, d = n0 + n1, d0[t] + d1[t]
        e1 = float(d) * n1 / n
        if n > 1:
            var += float(d) * n1 / n * n0 / n * (n - d) / (n - 1)
        ome += d1[t] - e1
        seen0 += a0[t]
        seen1 += a1[t]
    return ome, var


def _lr_subject_level_reference(rows):
    """Independent structure: for each distinct event time, count risk
    sets by scanning subjects (duration >= t), never via running
    sums."""
    times = sorted({t for t, obs, _ in rows if obs})
    ome = var = 0.0
    for t in times:
        n0 = sum(1 for tt, _, g in rows if g == 0 and tt >= t)
        n1 = sum(1 for tt, _, g in rows if g == 1 and tt >= t)
        d0 = sum(1 for tt, obs, g in rows if g == 0 and obs and tt == t)
        d1 = sum(1 for tt, obs, g in rows if g == 1 and obs and tt == t)
        n, d = n0 + n1, d0 + d1
        ome += d1 - float(d) * n1 / n
        if n > 1:
            var += float(d) * n1 / n * n0 / n * (n - d) / (n - 1)
    return ome, var


@given(st.lists(st.tuples(st.integers(0, 10), st.booleans(),
                          st.integers(0, 1)),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_logrank_algebra_matches_subject_level_reference(rows):
    ome, var = _lr_operator_algebra(rows)
    ome_ref, var_ref = _lr_subject_level_reference(rows)
    assert abs(ome - ome_ref) < 1e-9
    assert abs(var - var_ref) < 1e-9
    assert var >= -1e-12
    # label swap negates O - E and preserves V
    swapped = [(t, obs, 1 - g) for t, obs, g in rows]
    ome_s, var_s = _lr_operator_algebra(swapped)
    assert abs(ome + ome_s) < 1e-9
    assert abs(var - var_s) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 8), st.booleans()),
                min_size=1, max_size=30))
@settings(max_examples=200)
def test_logrank_identical_groups_score_zero(rows):
    """Duplicating one cohort into both arms makes every d1 = d/2 and
    n1 = n/2, so O - E vanishes term by term."""
    both = ([(t, obs, 0) for t, obs in rows]
            + [(t, obs, 1) for t, obs in rows])
    ome, var = _lr_operator_algebra(both)
    assert abs(ome) < 1e-9
    assert var >= 0.0


# ---------------------------------------------------------------------------
# cox_score_test (banked r15): the duration-aggregate/window accumulation
# must equal an independently-structured subject-level reference; a binary
# covariate must reduce to the logrank algebra term by term; the score is
# shift-invariant and scale-equivariant in the covariate
# ---------------------------------------------------------------------------

def _cox_operator_algebra(rows):
    """Python twin of relational.cox_score_test's accumulation: one
    (duration) aggregate, sequential integer risk sums S0/S1/S2,
    ordered running u/v sums. rows = (t, obs, x). Returns (score,
    info) at the final duration."""
    from collections import Counter
    d_of = Counter(t for t, obs, _ in rows if obs)
    sx_of = Counter()
    a_of, ax_of, ax2_of = Counter(), Counter(), Counter()
    for t, obs, x in rows:
        if obs:
            sx_of[t] += x
        a_of[t] += 1
        ax_of[t] += x
        ax2_of[t] += x * x
    tot_a, tot_ax, tot_ax2 = (sum(a_of.values()), sum(ax_of.values()),
                              sum(ax2_of.values()))
    seen_a = seen_ax = seen_ax2 = 0
    score = info = 0.0
    for t in sorted(a_of):
        s0 = tot_a - seen_a
        s1 = tot_ax - seen_ax
        s2 = tot_ax2 - seen_ax2
        d = d_of[t]
        score += sx_of[t] - float(d) * s1 / s0
        if s0 > 1:
            xb = float(s1) / s0
            info += (float(d) * (s0 - d) / (s0 - 1)
                     * (float(s2) / s0 - xb * xb))
        seen_a += a_of[t]
        seen_ax += ax_of[t]
        seen_ax2 += ax2_of[t]
    return score, info


def _cox_subject_level_reference(rows):
    """Independent structure: for each distinct event time, risk-set
    covariate moments by scanning subjects (duration >= t), never via
    running sums."""
    times = sorted({t for t, obs, _ in rows if obs})
    score = info = 0.0
    for t in times:
        risk = [x for tt, _, x in rows if tt >= t]
        s0 = len(risk)
        xb = sum(risk) / s0
        events = [x for tt, obs, x in rows if obs and tt == t]
        d = len(events)
        score += sum(events) - d * xb
        if s0 > 1:
            var_x = sum(x * x for x in risk) / s0 - xb * xb
            info += d * (s0 - d) / (s0 - 1) * var_x
    return score, info


@given(st.lists(st.tuples(st.integers(0, 10), st.booleans(),
                          st.integers(-9, 9)),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_cox_algebra_matches_subject_level_reference(rows):
    score, info = _cox_operator_algebra(rows)
    score_ref, info_ref = _cox_subject_level_reference(rows)
    assert abs(score - score_ref) < 1e-9
    assert abs(info - info_ref) < 1e-9
    assert info >= -1e-12
    # shift invariance: x -> x + 7 changes neither U nor V (only the
    # centered covariate enters); scale equivariance: x -> 3x gives
    # U -> 3U, V -> 9V (so z is scale-free)
    shifted = [(t, obs, x + 7) for t, obs, x in rows]
    s2, i2 = _cox_operator_algebra(shifted)
    assert abs(score - s2) < 1e-6
    assert abs(info - i2) < 1e-6
    scaled = [(t, obs, 3 * x) for t, obs, x in rows]
    s3, i3 = _cox_operator_algebra(scaled)
    assert abs(3.0 * score - s3) < 1e-6
    assert abs(9.0 * info - i3) < 1e-6


@given(st.lists(st.tuples(st.integers(0, 10), st.booleans(),
                          st.integers(0, 1)),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_cox_binary_covariate_is_the_logrank_test(rows):
    """With x in {0, 1}: S1 = n1, S2 = n1, sx = d1, so u = d1 - e1 and
    v = d (S0-d)/(S0-1) (n1/n - (n1/n)^2) = logrank's hypergeometric
    variance — the score test IS the log-rank test."""
    score, info = _cox_operator_algebra(rows)
    ome, var = _lr_operator_algebra([(t, obs, x) for t, obs, x in rows])
    assert abs(score - ome) < 1e-9
    assert abs(info - var) < 1e-9


def test_cox_constant_covariate_scores_zero():
    rows = [(t, obs, 5) for t, obs in
            [(1, True), (2, False), (3, True), (3, True), (7, False)]]
    score, info = _cox_operator_algebra(rows)
    assert abs(score) < 1e-12 and abs(info) < 1e-12


# ---------------------------------------------------------------------------
# friedman_test (banked r15): the integer 2R_j accumulation must equal the
# direct within-block-midrank Conover T1 on ANY complete grid with ties;
# with no ties T1 equals the classic Friedman Q; ranks are invariant under
# any strictly increasing value map
# ---------------------------------------------------------------------------

def _fr_operator_algebra(grid):
    """Python twin of relational.friedman_test's accumulation:
    within-block RANGE identities in value order, integer numerator
    sum((2R_j - b(k+1))^2) and denominator sum((2r)^2) - b k (k+1)^2.
    grid = list of rows (one per block) of k cell values. Returns
    (t1 or None, num, den) — all-integer num/den."""
    b = len(grid)
    k = len(grid[0])
    r2 = [0] * k  # 2 * R_j, exact integers
    r2sq_sum = 0
    for row in grid:
        values = sorted(set(row))
        cum_le = 0
        rank2_of = {}
        for v in values:
            t = sum(1 for x in row if x == v)
            cum_le += t
            rank2_of[v] = 2 * cum_le - t + 1
        for j, x in enumerate(row):
            r2[j] += rank2_of[x]
            r2sq_sum += rank2_of[x] * rank2_of[x]
    num = sum((rj - b * (k + 1)) ** 2 for rj in r2)
    den = r2sq_sum - b * k * (k + 1) * (k + 1)
    t1 = (k - 1) * float(num) / den if den > 0 else None
    return t1, num, den


def _fr_midrank_reference(grid):
    """Direct Conover T1: float midranks within each block,
    T1 = (k-1) sum_j (R_j - b(k+1)/2)^2 / (A2 - b k (k+1)^2 / 4)."""
    b, k = len(grid), len(grid[0])
    rsum = [0.0] * k
    a2 = 0.0
    for row in grid:
        order = sorted(range(k), key=lambda j: row[j])
        ranks = [0.0] * k
        i = 0
        while i < k:
            j = i
            while j < k and row[order[j]] == row[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for m in range(i, j):
                ranks[order[m]] = mid
            i = j
        for j in range(k):
            rsum[j] += ranks[j]
            a2 += ranks[j] * ranks[j]
    c = b * k * (k + 1) ** 2 / 4.0
    num = sum((rj - b * (k + 1) / 2.0) ** 2 for rj in rsum)
    return ((k - 1) * num / (a2 - c)) if a2 - c > 1e-12 else None


@st.composite
def _fr_grids(draw):
    k = draw(st.integers(2, 5))
    b = draw(st.integers(1, 6))
    return [draw(st.lists(st.integers(-5, 5), min_size=k, max_size=k))
            for _ in range(b)]


@given(_fr_grids())
@settings(max_examples=300)
def test_friedman_integer_identity_matches_midranks(grid):
    t1, num, den = _fr_operator_algebra(grid)
    ref = _fr_midrank_reference(grid)
    assert den >= 0  # A2 >= C always (Cauchy-Schwarz on ranks)
    if t1 is None:
        assert ref is None
        return
    assert ref is not None
    assert abs(t1 - ref) < 1e-9 * max(1.0, abs(t1))
    # ranks only: any strictly increasing transform leaves T1 fixed
    mapped = [[x * x * x + 3 * x for x in row] for row in grid]
    t1_m, _, _ = _fr_operator_algebra(mapped)
    assert abs(t1 - t1_m) < 1e-12


@given(_fr_grids())
@settings(max_examples=200)
def test_friedman_no_ties_equals_classic_q(grid):
    if any(len(set(row)) != len(row) for row in grid):
        return  # ties: classic Q is the wrong reference
    b, k = len(grid), len(grid[0])
    t1, _, _ = _fr_operator_algebra(grid)
    # classic Q = 12/(b k (k+1)) sum R_j^2 - 3 b (k+1) over midrank
    # sums (integer ranks here)
    rsum = [0.0] * k
    for row in grid:
        order = sorted(range(k), key=lambda j: row[j])
        for pos, j in enumerate(order):
            rsum[j] += pos + 1
    q = (12.0 / (b * k * (k + 1)) * sum(r * r for r in rsum)
         - 3.0 * b * (k + 1))
    assert t1 is not None
    assert abs(t1 - q) < 1e-9 * max(1.0, abs(q))


@given(_fr_grids())
@settings(max_examples=200)
def test_friedman_block_permutation_invariance(grid):
    t1, num, den = _fr_operator_algebra(grid)
    t1_p, num_p, den_p = _fr_operator_algebra(list(reversed(grid)))
    assert (num, den) == (num_p, den_p)
    if t1 is not None:
        assert abs(t1 - t1_p) < 1e-12

# ---------------------------------------------------------------------------
# stratified_logrank (banked r16): the per-stratum accumulation folded
# across strata must equal the sum of independent per-stratum logrank
# tests; one stratum reduces to logrank_test exactly; label swap negates
# ---------------------------------------------------------------------------

def _slr_operator_algebra(rows):
    """Python twin of relational.stratified_logrank's accumulation: one
    (stratum, duration) aggregate, per-stratum sequential risk sets,
    ONE ordered running fold ascending by (stratum, duration).
    rows = (s, t, obs, g). Returns (ome, var) at the final row."""
    from collections import Counter
    d1 = Counter((s, t) for s, t, obs, g in rows if g == 1 and obs)
    d0 = Counter((s, t) for s, t, obs, g in rows if g == 0 and obs)
    a0 = Counter((s, t) for s, t, obs, g in rows if g == 0)
    a1 = Counter((s, t) for s, t, obs, g in rows if g == 1)
    tot0 = Counter(s for s, t, obs, g in rows if g == 0)
    tot1 = Counter(s for s, t, obs, g in rows if g == 1)
    seen0, seen1 = Counter(), Counter()
    ome = var = 0.0
    for s, t in sorted({(s, t) for s, t, _, _ in rows}):
        n0 = tot0[s] - seen0[s]
        n1 = tot1[s] - seen1[s]
        n = n0 + n1
        d = d0[(s, t)] + d1[(s, t)]
        e1 = float(d) * n1 / n
        if n > 1:
            var += float(d) * n1 / n * n0 / n * (n - d) / (n - 1)
        ome += d1[(s, t)] - e1
        seen0[s] += a0[(s, t)]
        seen1[s] += a1[(s, t)]
    return ome, var


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 8),
                          st.booleans(), st.integers(0, 1)),
                min_size=1, max_size=60))
@settings(max_examples=300)
def test_stratified_logrank_is_sum_of_per_stratum_logranks(rows):
    ome, var = _slr_operator_algebra(rows)
    strata = sorted({s for s, _, _, _ in rows})
    ome_ref = var_ref = 0.0
    for s in strata:
        o, v = _lr_operator_algebra(
            [(t, obs, g) for ss, t, obs, g in rows if ss == s])
        ome_ref += o
        var_ref += v
    assert abs(ome - ome_ref) < 1e-9
    assert abs(var - var_ref) < 1e-9
    assert var >= -1e-12
    # label swap negates O - E and preserves V (per stratum, so also
    # in the cross-strata fold)
    swapped = [(s, t, obs, 1 - g) for s, t, obs, g in rows]
    ome_s, var_s = _slr_operator_algebra(swapped)
    assert abs(ome + ome_s) < 1e-9
    assert abs(var - var_s) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 10), st.booleans(),
                          st.integers(0, 1)),
                min_size=1, max_size=60))
@settings(max_examples=200)
def test_stratified_logrank_one_stratum_is_logrank(rows):
    ome, var = _slr_operator_algebra(
        [(7, t, obs, g) for t, obs, g in rows])
    ome_ref, var_ref = _lr_operator_algebra(rows)
    assert abs(ome - ome_ref) < 1e-12
    assert abs(var - var_ref) < 1e-12


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 8),
                          st.booleans(), st.integers(0, 1)),
                min_size=1, max_size=40))
@settings(max_examples=200)
def test_stratified_logrank_stratum_relabel_invariance(rows):
    """The verdict is a SUM over strata: any stratum relabeling (here
    s -> 3 - s, reversing the fold order) leaves the final O-E and V
    unchanged up to float addition order."""
    ome, var = _slr_operator_algebra(rows)
    ome_r, var_r = _slr_operator_algebra(
        [(3 - s, t, obs, g) for s, t, obs, g in rows])
    assert abs(ome - ome_r) < 1e-9
    assert abs(var - var_r) < 1e-9


# ---------------------------------------------------------------------------
# page_trend_test (banked r16): the integer 2L fold must equal the direct
# float-midrank Page statistic; reversing the treatment order negates the
# centered L; a perfectly monotone grid attains the no-ties maximum
# ---------------------------------------------------------------------------

def _page_operator_algebra(grid):
    """Python twin of relational.page_trend_test's accumulation: the
    friedman within-block 2*midrank identity, integer fold
    2L = sum_j j * (2 R_j), centered4 = 2*(2L) - b k (k+1)^2, 16 Var =
    b k^2 (k+1)^2 (k-1) / 9. grid = list of rows (one per block) of k
    cell values, treatment order = column index. Returns
    (z or None, centered4) — centered4 an exact integer."""
    b, k = len(grid), len(grid[0])
    r2 = [0] * k
    for row in grid:
        values = sorted(set(row))
        cum_le = 0
        rank2_of = {}
        for v in values:
            t = sum(1 for x in row if x == v)
            cum_le += t
            rank2_of[v] = 2 * cum_le - t + 1
        for j, x in enumerate(row):
            r2[j] += rank2_of[x]
    import math as m
    twol = sum((j + 1) * r2[j] for j in range(k))
    centered4 = 2 * twol - b * k * (k + 1) * (k + 1)
    var16 = b * k * k * (k + 1) * (k + 1) * (k - 1) / 9.0
    z = centered4 / m.sqrt(var16) if var16 > 0 else None
    return z, centered4


def _page_midrank_reference(grid):
    """Direct Page L over float midranks: z = (L - b k (k+1)^2 / 4)
    / sqrt(b k^2 (k+1)^2 (k-1) / 144)."""
    b, k = len(grid), len(grid[0])
    rsum = [0.0] * k
    for row in grid:
        order = sorted(range(k), key=lambda j: row[j])
        i = 0
        while i < k:
            j = i
            while j < k and row[order[j]] == row[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for m in range(i, j):
                rsum[order[m]] += mid
            i = j
    import math as m
    length = sum((j + 1) * rsum[j] for j in range(k))
    mean = b * k * (k + 1) ** 2 / 4.0
    var = b * k * k * (k + 1) ** 2 * (k - 1) / 144.0
    return (length - mean) / m.sqrt(var) if var > 0 else None


@given(_fr_grids())
@settings(max_examples=300)
def test_page_integer_identity_matches_midranks(grid):
    z, centered4 = _page_operator_algebra(grid)
    ref = _page_midrank_reference(grid)
    if z is None:
        assert ref is None
        return
    assert ref is not None
    assert abs(z - ref) < 1e-9 * max(1.0, abs(ref))
    # ranks only: any strictly increasing transform leaves z fixed
    mapped = [[x * x * x + 3 * x for x in row] for row in grid]
    z_m, c_m = _page_operator_algebra(mapped)
    assert c_m == centered4 and abs(z - z_m) < 1e-12


@given(_fr_grids())
@settings(max_examples=200)
def test_page_treatment_reversal_negates_centered_l(grid):
    _, c = _page_operator_algebra(grid)
    _, c_r = _page_operator_algebra([list(reversed(row))
                                     for row in grid])
    assert c_r == -c


@given(st.integers(2, 6), st.integers(1, 6))
@settings(max_examples=100)
def test_page_monotone_grid_attains_no_ties_maximum(k, b):
    """Every block perfectly increasing: R_j = b j, so
    4(L - E[L]) = b k (k+1)(k-1) / 3 exactly — the no-ties maximum —
    and z > 0."""
    grid = [list(range(1, k + 1))] * b
    z, c = _page_operator_algebra(grid)
    # (k-1) k (k+1) is divisible by 3, so c is an exact integer third
    assert 3 * c == b * k * (k + 1) * (k - 1)
    assert z is not None and z > 0
    # and no permuted grid can exceed it
    import itertools
    for perm in itertools.islice(itertools.permutations(range(1, k + 1)),
                                 0, 24):
        _, c_p = _page_operator_algebra([list(perm)] * b)
        assert c_p <= c


@given(_fr_grids())
@settings(max_examples=200)
def test_page_block_permutation_invariance(grid):
    z, c = _page_operator_algebra(grid)
    z_p, c_p = _page_operator_algebra(list(reversed(grid)))
    assert c == c_p
    if z is not None:
        assert abs(z - z_p) < 1e-12


# ---------------------------------------------------------------------------
# cmh_test (banked r17): per-stratum 2x2 algebra pooled by one ordered
# fold; one stratum = classic uncorrected chi-square; exposure/outcome
# label swaps negate O-E and preserve V; duplication scales evidence
# ---------------------------------------------------------------------------

def _cmh_operator_algebra(rows):
    """Python twin of relational.cmh_test's accumulation: per stratum
    the integer margins (n, r1, c1, a), e1 = r1*c1/n and
    V = r1 r0 c1 c0 / (n^2 (n-1)) with the operator's interleaved
    operand order; (O-E, V) fold across strata in sorted stratum
    order. rows = list of (stratum, e, y) with e, y in {0, 1}."""
    strata = sorted({s for s, _, _ in rows})
    ome = var = 0.0
    for s in strata:
        sub = [(e, y) for ss, e, y in rows if ss == s]
        n = len(sub)
        r1 = sum(e for e, _ in sub)
        c1 = sum(y for _, y in sub)
        a = sum(e * y for e, y in sub)
        r0, c0 = n - r1, n - c1
        e1 = float(r1) * c1 / n
        ome += a - e1
        if n > 1:
            var += float(r1) * r0 / n * c1 / n * c0 / (n - 1)
    return ome, var


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1),
                          st.integers(0, 1)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_cmh_fold_is_sum_of_single_stratum_chi2_components(rows):
    ome, var = _cmh_operator_algebra(rows)
    ome_ref = var_ref = 0.0
    for s in sorted({s for s, _, _ in rows}):
        o, v = _cmh_operator_algebra(
            [(0, e, y) for ss, e, y in rows if ss == s])
        ome_ref += o
        var_ref += v
    assert abs(ome - ome_ref) < 1e-9
    assert abs(var - var_ref) < 1e-9
    assert var >= -1e-12


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1),
                          st.integers(0, 1)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_cmh_label_swaps_negate_ome_preserve_var(rows):
    """Swapping the exposure labels (or the outcome labels) negates
    O-E and preserves V — per stratum, hence also in the fold."""
    ome, var = _cmh_operator_algebra(rows)
    ome_e, var_e = _cmh_operator_algebra(
        [(s, 1 - e, y) for s, e, y in rows])
    ome_y, var_y = _cmh_operator_algebra(
        [(s, e, 1 - y) for s, e, y in rows])
    assert abs(ome + ome_e) < 1e-9 and abs(var - var_e) < 1e-9
    assert abs(ome + ome_y) < 1e-9 and abs(var - var_y) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=2, max_size=40),
       st.integers(2, 4))
@settings(max_examples=200)
def test_cmh_duplicated_strata_scale_evidence_linearly(sub, j):
    ome1, var1 = _cmh_operator_algebra([(0, e, y) for e, y in sub])
    omej, varj = _cmh_operator_algebra(
        [(s, e, y) for s in range(j) for e, y in sub])
    assert abs(omej - j * ome1) < 1e-9
    assert abs(varj - j * var1) < 1e-9
    # chi2 = ome^2 / var scales by j when var > 0
    if var1 > 1e-12:
        assert abs(omej * omej / varj - j * ome1 * ome1 / var1) < 1e-6


# ---------------------------------------------------------------------------
# cochran_q_test (banked r17): the integer fold must equal the direct
# textbook Q; k=2 reduces to uncorrected McNemar; label permutation
# invariance; concordant blocks contribute EXACTLY nothing
# ---------------------------------------------------------------------------

def _q_operator_algebra(grid):
    """Python twin of relational.cochran_q_test's integer fold:
    num = (k-1)(k sum C_j^2 - N^2), den = k N - sum R_i^2, Q = num/den
    (None when den == 0). grid = one row per block of k 0/1 cells."""
    b, k = len(grid), len(grid[0])
    cj = [sum(row[j] for row in grid) for j in range(k)]
    ri = [sum(row) for row in grid]
    n = sum(cj)
    num = (k - 1) * (k * sum(c * c for c in cj) - n * n)
    den = k * n - sum(r * r for r in ri)
    return (num / den if den > 0 else None), num, den


@st.composite
def _bin_grids(draw):
    k = draw(st.integers(2, 5))
    b = draw(st.integers(1, 8))
    return [draw(st.lists(st.integers(0, 1), min_size=k, max_size=k))
            for _ in range(b)]


@given(_bin_grids())
@settings(max_examples=300)
def test_cochran_q_integer_fold_matches_textbook(grid):
    q, num, den = _q_operator_algebra(grid)
    b, k = len(grid), len(grid[0])
    cj = [sum(row[j] for row in grid) for j in range(k)]
    ri = [sum(row) for row in grid]
    n = sum(cj)
    den_ref = k * n - sum(r * r for r in ri)
    assert den == den_ref and den >= 0
    if den > 0:
        q_ref = (k * (k - 1) * sum((c - n / k) ** 2 for c in cj)
                 / den_ref)
        assert abs(q - q_ref) < 1e-9
        assert q >= -1e-12


@given(_bin_grids())
@settings(max_examples=300)
def test_cochran_q_label_permutation_invariant(grid):
    q, num, den = _q_operator_algebra(grid)
    k = len(grid[0])
    perm = [row[1:] + row[:1] for row in grid]
    q_p, num_p, den_p = _q_operator_algebra(perm)
    assert num == num_p and den == den_p


@given(_bin_grids())
@settings(max_examples=300)
def test_cochran_q_concordant_blocks_contribute_exactly_nothing(grid):
    """Appending an all-0 and an all-1 block changes NEITHER the
    integer numerator NOR the denominator — the classical 'Q ignores
    concordant blocks' fact, exact in the integer fold."""
    k = len(grid[0])
    q, num, den = _q_operator_algebra(grid)
    padded = grid + [[0] * k, [1] * k]
    q_p, num_p, den_p = _q_operator_algebra(padded)
    assert num == num_p and den == den_p


@given(_bin_grids(), st.integers(2, 4))
@settings(max_examples=200)
def test_cochran_q_block_duplication_scales_q(grid, j):
    q, num, den = _q_operator_algebra(grid)
    dup = [row for _ in range(j) for row in grid]
    q_d, num_d, den_d = _q_operator_algebra(dup)
    assert num_d == j * j * num and den_d == j * den
    if den > 0:
        assert abs(q_d - j * q) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=1, max_size=40))
@settings(max_examples=300)
def test_cochran_q_k2_is_uncorrected_mcnemar(pairs):
    """k = 2: Q = (b01 - b10)^2 / (b01 + b10) over the discordant
    block counts (NO continuity correction)."""
    q, num, den = _q_operator_algebra([list(p) for p in pairs])
    b01 = sum(1 for a, b in pairs if a == 1 and b == 0)
    b10 = sum(1 for a, b in pairs if a == 0 and b == 1)
    if b01 + b10 == 0:
        assert q is None
    else:
        assert abs(q - (b01 - b10) ** 2 / (b01 + b10)) < 1e-9


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=2, max_size=60))
@settings(max_examples=300)
def test_cmh_one_stratum_is_scaled_pearson(sub):
    """The exact classical relation: single-stratum uncorrected CMH
    (hypergeometric variance, (n-1) denominator) equals
    (n-1)/n x the Pearson 2x2 chi-square — NOT Pearson itself. With
    (O - E) = (ad - bc)/n and V = r1 r0 c1 c0 / (n^2 (n-1)):
    (O-E)^2/V = (ad-bc)^2 (n-1) / (r1 r0 c1 c0) = Pearson (n-1)/n."""
    ome, var = _cmh_operator_algebra([(0, e, y) for e, y in sub])
    n = len(sub)
    r1 = sum(e for e, _ in sub)
    c1 = sum(y for _, y in sub)
    a = sum(e * y for e, y in sub)
    r0, c0 = n - r1, n - c1
    if min(r1, r0, c1, c0) == 0 or var <= 1e-12:
        assert var <= 1e-12  # degenerate margin -> V = 0 exactly
        return
    b, c, d = r1 - a, c1 - a, n - r1 - c1 + a
    pearson = n * (a * d - b * c) ** 2 / (r1 * r0 * c1 * c0)
    assert abs(ome * ome / var - pearson * (n - 1) / n) < 1e-7


# ---------------------------------------------------------------------------
# mh_odds_ratio / woolf_test (banked r18): per-stratum 2x2 cell algebra
# with ordered folds; label swaps invert OR / preserve the RBG variance
# (and negate L / preserve w for Woolf); duplication leaves OR invariant
# while shrinking Var by 1/j (and scales Woolf chi2 by j)
# ---------------------------------------------------------------------------

def _mh_operator_algebra(rows):
    """Python twin of relational.mh_odds_ratio's accumulation: per
    stratum the cells (a, b, c, d), R_k = a d / n, S_k = b c / n,
    P_k = (a + d)/n, Q_k = (b + c)/n with the operator's interleaved
    operand order; the five sums fold in sorted stratum order.
    Returns (R, S, var_log-or-None). rows = (stratum, e, y)."""
    strata = sorted({s for s, _, _ in rows})
    rr = ss = pr = psqr = qs = 0.0
    for s in strata:
        sub = [(e, y) for st_, e, y in rows if st_ == s]
        n = len(sub)
        r1 = sum(e for e, _ in sub)
        c1 = sum(y for _, y in sub)
        a = sum(e * y for e, y in sub)
        b, c = r1 - a, c1 - a
        d = n - r1 - c1 + a
        rk = float(a) * d / n
        sk = float(b) * c / n
        pk = float(a + d) / n
        qk = float(b + c) / n
        rr += rk
        ss += sk
        pr += pk * rk
        psqr += pk * sk + qk * rk
        qs += qk * sk
    var = (pr / 2 / rr / rr + psqr / 2 / rr / ss + qs / 2 / ss / ss
           if rr > 0 and ss > 0 else None)
    return rr, ss, var


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1),
                          st.integers(0, 1)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_mh_label_swaps_swap_r_s_and_preserve_var(rows):
    """Swapping exposure labels maps R<->S (OR inverts) and preserves
    the RBG variance (term1 <-> term3, the cross term fixed); same
    for outcome labels."""
    rr, ss, var = _mh_operator_algebra(rows)
    re_, se_, ve = _mh_operator_algebra(
        [(s, 1 - e, y) for s, e, y in rows])
    ry, sy, vy = _mh_operator_algebra(
        [(s, e, 1 - y) for s, e, y in rows])
    assert abs(rr - se_) < 1e-9 and abs(ss - re_) < 1e-9
    assert abs(rr - sy) < 1e-9 and abs(ss - ry) < 1e-9
    if var is not None:
        assert ve is not None and abs(var - ve) < 1e-9
        assert vy is not None and abs(var - vy) < 1e-9
    assert rr >= 0 and ss >= 0


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=2, max_size=40),
       st.integers(2, 4))
@settings(max_examples=200)
def test_mh_duplicated_strata_or_invariant_var_shrinks(sub, j):
    """j identical strata: R, S scale by j (OR invariant), every
    variance numerator scales by j against j^2 denominators — Var
    scales by exactly 1/j."""
    r1, s1, v1 = _mh_operator_algebra([(0, e, y) for e, y in sub])
    rj, sj, vj = _mh_operator_algebra(
        [(s, e, y) for s in range(j) for e, y in sub])
    assert abs(rj - j * r1) < 1e-9 and abs(sj - j * s1) < 1e-9
    if v1 is not None:
        assert vj is not None and abs(vj - v1 / j) < 1e-9


@given(st.tuples(st.integers(1, 50), st.integers(1, 50),
                 st.integers(1, 50), st.integers(1, 50)))
@settings(max_examples=300)
def test_mh_one_stratum_var_is_woolf_uncorrected(cells):
    """One stratum with all cells positive: OR = ad/bc and the RBG
    variance reduces EXACTLY to Woolf's 1/a + 1/b + 1/c + 1/d —
    verified against the operator algebra (the classical identity the
    spec test pins on the fixture)."""
    a, b, c, d = cells
    rows = ([(0, 1, 1)] * a + [(0, 1, 0)] * b + [(0, 0, 1)] * c
            + [(0, 0, 0)] * d)
    rr, ss, var = _mh_operator_algebra(rows)
    n = a + b + c + d
    assert abs(rr - a * d / n) < 1e-9
    assert abs(ss - b * c / n) < 1e-9
    woolf = 1 / a + 1 / b + 1 / c + 1 / d
    assert var is not None and abs(var - woolf) < 1e-9 * woolf


def _woolf_operator_algebra(rows):
    """Python twin of relational.woolf_test's fold: Haldane-corrected
    cells, L = ln(a' d' / b' / c'), w = 1/(1/a'+1/b'+1/c'+1/d'),
    chi2 = max(sum wL^2 - (sum wL)^2 / sum w, 0) in sorted stratum
    order (None with one stratum)."""
    import math

    strata = sorted({s for s, _, _ in rows})
    ws = wls = wl2s = 0.0
    for s in strata:
        sub = [(e, y) for st_, e, y in rows if st_ == s]
        n = len(sub)
        r1 = sum(e for e, _ in sub)
        c1 = sum(y for _, y in sub)
        a = sum(e * y for e, y in sub)
        ah, bh = a + 0.5, (r1 - a) + 0.5
        ch, dh = (c1 - a) + 0.5, (n - r1 - c1 + a) + 0.5
        ll = math.log(ah * dh / bh / ch)
        w = 1 / (1 / ah + 1 / bh + 1 / ch + 1 / dh)
        ws += w
        wls += w * ll
        wl2s += w * ll * ll
    if len(strata) < 2:
        return None, len(strata)
    return max(wl2s - wls * wls / ws, 0.0), len(strata)


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1),
                          st.integers(0, 1)),
                min_size=1, max_size=80))
@settings(max_examples=300)
def test_woolf_exposure_swap_invariant_and_nonneg(rows):
    """Exposure swap negates every L and preserves every w — chi2
    invariant; chi2 is always >= 0 (the clamp is only against float
    cancellation)."""
    chi2, k = _woolf_operator_algebra(rows)
    chi2_sw, k_sw = _woolf_operator_algebra(
        [(s, 1 - e, y) for s, e, y in rows])
    assert k == k_sw
    if chi2 is not None:
        assert chi2 >= 0
        assert abs(chi2 - chi2_sw) < 1e-9 * max(1.0, chi2)


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=2, max_size=40),
       st.integers(2, 4))
@settings(max_examples=200)
def test_woolf_identical_strata_chi2_zero(sub, j):
    """j copies of ONE table are perfectly homogeneous: every L_k and
    w_k identical, so the fold cancels to (float) zero."""
    chi2, k = _woolf_operator_algebra(
        [(s, e, y) for s in range(j) for e, y in sub])
    assert k == j
    assert chi2 is not None and 0 <= chi2 < 1e-9


@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1),
                          st.integers(0, 1)),
                min_size=4, max_size=60),
       st.integers(2, 3))
@settings(max_examples=200)
def test_woolf_duplicating_strata_scales_chi2(rows, j):
    """Duplicating every stratum j times (fresh labels) repeats each
    (L_k, w_k) j times: all three sums scale by j, so chi2 scales by
    exactly j."""
    chi2, k = _woolf_operator_algebra(rows)
    dup = [((s, rep), e, y) for rep in range(j) for s, e, y in rows]
    chi2_j, k_j = _woolf_operator_algebra(dup)
    assert k_j == j * k
    if chi2 is not None:
        assert abs(chi2_j - j * chi2) < 1e-9 * max(1.0, j * chi2)
