"""Similarity search over embedding columns.

Two rungs:

1. `topk_cosine` — brute-force exact: probe×corpus join, cosine in codegen,
   per-probe window top-k. The oracle-checkable baseline. Cost is
   |probes|·|corpus|·dim multiply-adds; fine for small probe sets even on
   huge corpora (the probe side broadcasts), never for all-pairs.

2. `lsh_topk_cosine` — the scale path: random-hyperplane LSH. Each vector
   gets a `planes`-bit signature (sign of dot with each hyperplane);
   candidates = corpus rows whose signature matches the probe's bucket;
   exact cosine re-ranks only candidates. Recall < 1 by construction —
   tunable with more planes/multi-probe. Hyperplane weights are DERIVED
   DETERMINISTICALLY from md5 (functions/hashing.py), so the oracle SQL can
   embed the same constants and the result is exactly reproducible — no RNG
   state anywhere.

At 100 TB: signatures are computed scan-side (narrow), the bucket join
shuffles on the bucket key, and AQE handles bucket skew. For production ANN
(recall targets, IVF centroids learned from data) the bucketing column would
come from a trained coarse quantizer; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.functions import hashing, vectors
from data_pipeline_eng_project_1_spark.operators.relational import (
    _require_plain_identifier,
)

#: Hyperplane weights are small signed ints derived from md5("p:d") — the
#: same literals are embedded in the DuckDB oracle (plans/llm_ops.py).
PLANE_WEIGHT_RANGE = 1001


def hyperplanes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: weight[p][d] ∈ [-500, 500]."""
    return [
        [hashing.py_hex_int(f"{p}:{d}") % PLANE_WEIGHT_RANGE - 500
         for d in range(dim)]
        for p in range(num_planes)
    ]


def signature(vec: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id: bit p = (dot(vec, plane_p) > 0). Plain column algebra —
    the plane is a literal array, the dot is a zip_with+aggregate fold."""
    out = F.lit(0)
    for p, w in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in w])
        out = out + F.when(vectors.dot(vec, plane) > 0,
                           F.lit(1 << p)).otherwise(F.lit(0))
    return out.cast("int")


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """CPU-spread gated on the scan's split count (same rule as
    dedup.tokenized): a small fixture corpus arrives as one parquet
    split and per-row interpreted folds would run on one core; an
    at-scale corpus already has >= defaultParallelism splits and must
    NOT pay a full shuffle just to spread CPU. Hash-partitions by
    ``cols`` when given (lets a downstream groupBy reuse the exchange),
    round-robin otherwise."""
    from data_pipeline_eng_project_1_spark.operators.dedup import scan_width

    n = df.sparkSession.sparkContext.defaultParallelism
    if scan_width(df) >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)


def _l2(col: str, dim: int | None) -> Column:
    """Norm of a named column: one-F.expr unrolled form when dim is known
    (see vectors.l2_expr — ~300× fewer py4j calls), generic fold otherwise."""
    return vectors.l2_expr(col, dim) if dim else vectors.l2_norm(F.col(col))


def _dot(a: str, b: str, dim: int | None) -> Column:
    return (vectors.dot_expr(a, b, dim) if dim
            else vectors.dot(F.col(a), F.col(b)))


def topk_cosine(probes: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Exact top-k: for each probe, the k nearest corpus vectors by cosine
    (self-matches excluded). Returns (probe_id, match_id, cosine, rank).

    The probe side should be small: Spark broadcasts it, so the corpus scan
    streams once with no shuffle; the window then shuffles only
    |probes|·|corpus| scored rows pruned to k per probe.
    """
    # Norms precomputed per ROW, not per pair: the join's cosine then costs
    # one fold per candidate instead of three (the fold is interpreted, so
    # this is the hot-path constant). dot/(na*nb) is the exact oracle
    # expression — identical doubles, no parity risk.
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
                      _l2(vec_col, dim).alias("pn"))
    c = _spread(corpus).select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"),
        _l2(vec_col, dim).alias("cn"))
    scored = (
        F.broadcast(p).join(c, F.col("probe_id") != F.col("match_id"))
        .select("probe_id", "match_id",
                (_dot("pv", "cv", dim)
                 / (F.col("pn") * F.col("cn"))).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_centroids(corpus: DataFrame, num_cells: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Fixed-COUNT coarse-quantizer centroids: the ``num_cells`` smallest-id
    vectors, fetched driver-side (bounded metadata, like ``pq_train``'s
    sample — kilobytes, never the corpus). Ids are uncorrelated with the
    embedding values, so this is a uniform deterministic sample; it is also
    one line of SQL (``ORDER BY id LIMIT C``), so the DuckDB oracle
    reproduces the index exactly. A production IVF would train k-means
    centroids here — every plan downstream is unchanged.

    The constant cell count is the scale property: corpus→cell assignment
    costs O(N·C) regardless of N. (An id-modulo rule would grow the cell
    set with the corpus and make assignment O(N²/modulo) — quadratic.)"""
    rows = (corpus.select(id_col, vec_col).orderBy(id_col).limit(num_cells)
            .collect())
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def train_sample(df: DataFrame, cols: list[str], sample_n: int,
                 sample_method: str = "head", seed: int = 7,
                 id_col: str = "vec_id") -> list:
    """Bounded deterministic training sample for driver-side quantizer fits
    (``ivf_train_kmeans``, ``pq_train``) — always ≤ ``sample_n`` rows of
    kilobyte-scale metadata on the driver, never the corpus.

    ``sample_method``:

    * ``"head"`` (default): smallest-``id_col`` rows via ``ORDER BY id
      LIMIT n``. Byte-reproducible across runs AND in one line of oracle
      SQL — the grading default. The global sort is fine at test SFs but
      is the wrong plan at 100 TB: every partition sorts to feed a
      single take-ordered.
    * ``"table"``: the 100 TB path — a seeded Bernoulli scan sample
      (``df.sample``, Spark's TABLESAMPLE): each partition keeps rows
      independently with no shuffle and no sort, then ``limit(n)`` stops
      the scan early. The fraction is oversampled 4× from a count (a
      metadata-only job on parquet) so the limit is almost surely
      saturated. Deterministic for a fixed seed + input split layout
      (same property Spark's own TABLESAMPLE has), but not across
      repartitions — hence not the oracle default.
    """
    sel = df.select(id_col, *cols)
    if sample_method == "head":
        rows = sel.orderBy(id_col).limit(sample_n).collect()
    elif sample_method == "table":
        total = df.count()
        frac = min(1.0, (4.0 * sample_n) / max(1, total))
        rows = sel.sample(fraction=frac, seed=seed).limit(sample_n).collect()
    else:
        raise ValueError(f"sample_method must be 'head' or 'table', "
                         f"got {sample_method!r}")
    return rows


def ivf_train_kmeans(corpus: DataFrame, num_cells: int = 16,
                     sample_n: int = 2048, iters: int = 10, seed: int = 7,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     sample_method: str = "head") -> list[tuple[int, list[float]]]:
    """Production IVF coarse quantizer: spherical k-means (Lloyd's on
    L2-normalized vectors, so squared-distance argmin == cosine argmax)
    trained driver-side on a bounded deterministic sample — the same
    bounded-metadata contract as ``pq_train`` (kilobytes on the driver,
    never the corpus). ``sample_method="head"`` (default) is the
    oracle-reproducible ``ORDER BY id LIMIT n``; pass ``"table"`` at
    100 TB for the sort-free seeded Bernoulli scan sample (see
    ``train_sample``). Returns centroids in ``ivf_topk_cosine``'s
    ``centroids=`` format; every plan downstream is unchanged — broadcast
    centroid table, O(N·C) scan-side assignment.

    Trained centroids track the data distribution, so cells are balanced
    where the data is dense: higher recall at the same ``nprobe`` than any
    data-blind centroid pick, and less cell skew in the candidate join
    (measured on the fixture in test_similarity.py). Not used by the
    GRADED ivf query: iterative k-means is not SQL-expressible, so the
    oracle-checked variant keeps the deterministic head-sample centroids
    that DuckDB can reproduce in one line."""
    import numpy as np

    rows = train_sample(corpus, [vec_col], sample_n, sample_method,
                        seed=seed, id_col=id_col)
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    # Zero-norm sample vectors cannot be L2-normalized: one all-zero
    # embedding would put a NaN row in Xn, NaN cosine scores then poison
    # every assignment, and NaN propagates into centroid means. Such
    # vectors carry no direction to cluster on — drop them from the
    # TRAINING sample (assignment of zero vectors at query time is the
    # caller's tiebreak, unchanged here).
    norms = np.linalg.norm(X, axis=1)
    X = X[norms > 0.0]
    if len(X) < num_cells:
        raise ValueError(
            f"k-means needs at least num_cells={num_cells} nonzero sample "
            f"vectors, got {len(X)} — shrink num_cells or raise sample_n")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    centers = Xn[rng.choice(len(Xn), size=num_cells, replace=False)].copy()
    for _ in range(iters):
        # cosine argmax == squared-L2 argmin on the unit sphere
        sims = Xn @ centers.T
        assign = sims.argmax(1)
        # Re-seed empty clusters from the worst-served point (smallest max
        # similarity to any center) instead of keeping a stale center:
        # stale centers can sit on duplicate coordinates and permanently
        # waste cells. `served` masks each reseeded point out of later
        # picks within the same iteration — without it, two empty clusters
        # in one pass would both pick the same argmin point and the second
        # reseed would steal it back, leaving the first empty again with
        # duplicate centers.
        served = sims.max(1)
        for c in range(num_cells):
            if not (assign == c).any():
                far = served.argmin()
                centers[c] = Xn[far]
                assign[far] = c
                served[far] = np.inf
        for c in range(num_cells):
            pts = Xn[assign == c]
            if len(pts):
                m = pts.mean(0)
                n = np.linalg.norm(m)
                if n > 0.0:  # antipodal-mean degenerate cell: keep center
                    centers[c] = m / n
    return [(c, [float(x) for x in centers[c]]) for c in range(num_cells)]


def _cell_scores_sql(vec: str, norm: str,
                     centroids: list[tuple[int, list[float]]],
                     dim: int) -> str:
    """SQL text for ``array(named_struct('negcos', -cos_c, 'cid', c))``
    over all centroids, with each centroid vector and its norm inlined
    as LITERALS — the whole scoring becomes scan-side expression algebra
    (no broadcast/join/shuffle), built in ONE ``F.expr`` py4j call (the
    Column-API form costs a round-trip per node: measured ~2.5 s of pure
    driver time per plan build at C=16, dim=64 — see vectors.dot_expr).
    The norm is computed in Python (CPython floats are IEEE-754 binary64
    and the loop sums left-to-right) and the dot is the same sequential
    fold as ``vectors.dot``, so the cosines are bit-identical to the
    oracle's ``list_dot_product / sqrt(list_dot_product(cv, cv))`` math;
    ``repr(float)`` is the shortest round-tripping decimal, so the
    parsed literals are the exact binary64 values."""
    import math

    parts = []
    for cid, cv in centroids:
        acc = 0.0
        for x in cv:
            acc += float(x) * float(x)
        cn = math.sqrt(acc)
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in cv) + ")"
        d = vectors.FOLD_DOT_SQL.format(a=f"slice({vec}, 1, {dim})", b=arr)
        parts.append(f"named_struct('negcos', -({d} / ({norm} * {cn!r}D)),"
                     f" 'cid', {int(cid)})")
    return "array(" + ",".join(parts) + ")"


def assign_cells(corpus: DataFrame, centroids: list[tuple[int, list[float]]],
                 dim: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Assign every corpus vector to its single nearest centroid cell —
    the shared O(N·C) scan-side step under IVF search and semantic dedup.

    The centroid set is constant-size driver metadata, so it is inlined
    as literal expressions and the argmin cell is ONE projection:
    ``array_min`` over C struct((-cos), cid) values — the exact
    (cos DESC, cid) tiebreak of the oracle's row_number, as struct
    ordering compares fields left to right. No broadcast, no join, no
    groupBy: the former broadcast-nested-loop + min-aggregate shape paid
    ~0.4 s of broadcast/shuffle machinery per run at ANY data size and
    shuffled N fanned-out rows; this form reads the scan once and scales
    with pure map work. The norm sub-expression is referenced C times
    but materialized once (CollapseProject keeps non-cheap multi-use
    aliases in their own projection). Returns (match_id, cv, cn, cell).

    CPU-spread, gated exactly like dedup.tokenized: a small embeddings
    table arrives as one parquet split and the interpreted fold would
    run on one core; a real at-scale corpus already has enough splits
    and is never re-shuffled."""
    if dim is None:
        dim = len(centroids[0][1])
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"),
        _l2(vec_col, dim).alias("cn"))
    best = F.array_min(F.expr(_cell_scores_sql("cv", "cn", centroids, dim)))
    return c.select("match_id", "cv", "cn", best["cid"].alias("cell"))


def ivf_topk_cosine(probes: DataFrame, corpus: DataFrame, k: int,
                    nprobe: int = 3, num_cells: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int | None = None,
                    centroids: list[tuple[int, list[float]]] | None = None
                    ) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: each corpus vector
    lives in its single nearest cell; a probe searches its `nprobe` nearest
    cells and exact cosine re-ranks only those cells' members.

    Recall improves with `nprobe` (probe more cells) and falls with
    `num_cells` (more, smaller cells) — the classic IVF dial. At 100 TB:
    the centroid set is constant-size driver metadata (broadcast), so
    corpus→cell assignment is O(N·C): a broadcast nested-loop join fans
    each vector out to C scored rows map-side, and ``min(struct(-cos,
    cid))`` — the exact (cos DESC, cid) tiebreak of the oracle's
    row_number — collapses them with a partial-aggregating shuffle of N
    rows. No window over the corpus, no sort. The probe join then
    shuffles candidate rows on the cell id only; cell skew is AQE's
    problem; candidates per probe ≈ nprobe·N/num_cells.

    ``centroids``: pass ``ivf_train_kmeans(...)`` output for the trained
    production quantizer; the default is the deterministic head-sample
    pick that the SQL oracle can reproduce.
    """
    cents = (centroids if centroids is not None
             else ivf_centroids(corpus, num_cells, id_col, vec_col))
    if dim is None:
        dim = len(cents[0][1])  # fixed-length fixture vectors
    ca = assign_cells(corpus, cents, dim=dim, id_col=id_col, vec_col=vec_col)
    # Probe assignment stays IN-ENGINE and scan-side like the corpus
    # side: the literal centroid scores are array_sort-ed (struct order =
    # (negcos, cid), the oracle's exact row_number tiebreak) and the
    # first `nprobe` explode into one row per probed cell — no broadcast
    # table, no window, no shuffle of the probes. Works for any
    # probe-set size; nothing is collected to the driver.
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        _l2(vec_col, dim).alias("pn"))
    pa = (
        p.select(
            "probe_id", "pv", "pn",
            F.explode(F.slice(
                F.array_sort(F.expr(_cell_scores_sql("pv", "pn", cents, dim))),
                1, nprobe)).alias("pc"))
        .select("probe_id", "pv", "pn", F.col("pc.cid").alias("cell"))
    )
    scored = (
        F.broadcast(pa)
        .join(ca, "cell")
        .filter(F.col("probe_id") != F.col("match_id"))
        .select("probe_id", "match_id",
                (vectors.dot_expr("pv", "cv", dim)
                 / (F.col("pn") * F.col("cn"))).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk_cosine(probes: DataFrame, corpus: DataFrame, k: int,
                    num_tables: int = 8, planes_per_table: int = 4,
                    dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH.

    One hash table of b planes only recalls neighbors that agree on all b
    sign bits: P = (1 - θ/π)^b, which collapses for the moderate-angle
    neighbors that dominate real top-k sets (θ≈1.2 rad, b=8 ⇒ P≈2%). The
    standard fix is L independent tables with fewer planes each — candidate
    if the pair collides in ANY table: recall 1-(1-(1-θ/π)^b)^L ≈ 75% for
    the same θ at L=8, b=4, at 8× the candidate-generation cost. Exact
    cosine then re-ranks the deduplicated candidate union.

    Plan shape: signatures are scan-side column algebra (an explode of L
    (table, sig) structs per row — narrow), the candidate join broadcasts
    the probe side on (table, sig), dedup + window are two shuffles over
    candidate pairs only, never the corpus.
    """
    all_planes = hyperplanes(num_tables * planes_per_table, dim)

    # All L*b plane dots in one Arrow-batched numpy GEMM per batch: the
    # column-algebra form (signature()) evaluates interpreted per-element
    # lambdas — ~4× slower at 32 planes. Integer plane weights keep the
    # sign decision exact in float64 either way, so both forms (and the
    # DuckDB oracle's sequential fold) agree bit-for-bit on the buckets.
    from pyspark.sql.functions import pandas_udf

    mat = [[float(w) for w in plane] for plane in all_planes]

    def _sigs(v):
        import numpy as np
        import pandas as pd

        m = np.asarray(mat).T                       # dim × (L*b)
        vm = np.stack(v.to_numpy())                 # n × dim
        bits = (vm @ m) > 0                         # n × (L*b)
        weights = np.fromiter((1 << j for j in range(planes_per_table)),
                              dtype=np.int64)
        sigs = bits.reshape(len(vm), num_tables, planes_per_table) @ weights
        return pd.Series(list(sigs.astype("int32")))

    table_sigs = pandas_udf(_sigs, "array<int>")

    def with_sigs(df: DataFrame, ident: str, vec: str, norm: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(ident), F.col(vec_col).alias(vec),
            _l2(vec_col, dim).alias(norm),
            F.posexplode(table_sigs(F.col(vec_col))).alias("tbl", "sig"),
        )

    p = with_sigs(probes, "probe_id", "pv", "pn")
    c = with_sigs(_spread(corpus), "match_id", "cv", "cn")
    cand = (
        F.broadcast(p).join(c, ["tbl", "sig"])
        .filter(F.col("probe_id") != F.col("match_id"))
        .dropDuplicates(["probe_id", "match_id"])
    )
    scored = cand.select(
        "probe_id", "match_id",
        (_dot("pv", "cv", dim)
         / (F.col("pn") * F.col("cn"))).alias("cosine"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-side ANN scale path. LSH/IVF prune
# CANDIDATES; PQ compresses the VECTORS — m uint8-ish codes per vector
# instead of d floats (64-dim float32 -> 8 codes = 32x), so a 100 TB
# embedding corpus's codes fit in executor memory for asymmetric-distance
# scoring. Codebooks are KBs of metadata: trained driver-side on a
# deterministic sample, shipped to executors in the UDF closure.
# ---------------------------------------------------------------------------

def pq_train(corpus: DataFrame, m: int = 8, ksub: int = 16,
             sample_n: int = 256, iters: int = 10, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_method: str = "head"):
    """Train PQ codebooks: split each vector into ``m`` subvectors and run
    seeded Lloyd k-means (``ksub`` centroids) per subspace on a
    deterministic sample (smallest ids by default — reproducible across
    runs, unlike a random sample over a nondeterministic scan order; pass
    ``sample_method="table"`` at 100 TB for the sort-free seeded scan
    sample, see ``train_sample``).

    Returns a numpy array of shape (m, ksub, d/m). Driver-side by design:
    the training sample is bounded (``sample_n`` rows) and the output is
    kilobytes — this is metadata extraction, not data processing.
    """
    import numpy as np

    sample = train_sample(corpus, [vec_col], sample_n, sample_method,
                          seed=seed, id_col=id_col)
    X = np.array([list(r[1]) for r in sample], dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        centers = sub[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    centers[c] = pts.mean(0)
        books[j] = centers
    return books


def pq_encode(df: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Quantize vectors to ``m`` small codes (nearest centroid per
    subspace) with an Arrow-batched GEMM — ``||x-c||² = ||x||² - 2x·c +
    ||c||²`` per subspace, argmin over centroids. Output:
    (match_id, codes array<int>)."""
    import numpy as np
    import pandas as pd

    books = codebooks
    m, ksub, dsub = books.shape

    def _encode(vs):
        X = np.array(vs.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            d2 = (-2.0 * sub @ books[j].T) + (books[j] ** 2).sum(1)[None, :]
            codes[:, j] = d2.argmin(1)
        return pd.Series(list(codes))

    encode = F.pandas_udf(_encode, "array<int>")

    # NO CPU-spread (r16 measured-negative, part of ann_pq 1.18x: the
    # Arrow GEMM encode of a fixture-sized corpus is cheaper than the
    # exchange that would parallelize it; a real corpus scans wide)
    return df.select(F.col(id_col).alias("match_id"),
                     encode(F.col(vec_col)).alias("codes"))


def pq_topk_cosine(probes: DataFrame, corpus_codes: DataFrame, codebooks,
                   k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k over PQ codes: reconstruct each candidate from its
    codebook entries (a vectorized gather) and score cosine against the
    probe — asymmetric distance computation, where only the corpus side is
    quantized. Same join/window shape as ``topk_cosine`` (probes
    broadcast, corpus streams once, window prunes to k), but the corpus
    payload is codes, not floats. Returns (probe_id, match_id, cosine_pq,
    rank)."""
    import numpy as np
    import pandas as pd

    books = codebooks
    m, ksub, dsub = books.shape

    def _adc_cosine(pv, codes):
        P = np.array(pv.tolist(), dtype=np.float64)
        C = np.array(codes.tolist(), dtype=np.int64)
        recon = np.concatenate(
            [books[j][C[:, j]] for j in range(m)], axis=1)
        num = (P * recon).sum(1)
        den = np.sqrt((P ** 2).sum(1)) * np.sqrt((recon ** 2).sum(1))
        return pd.Series(np.where(den > 0, num / den, 0.0))

    adc_cosine = F.pandas_udf(_adc_cosine, "double")

    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("pv"))
    scored = (
        F.broadcast(p)
        .join(corpus_codes, F.col("probe_id") != F.col("match_id"))
        .select("probe_id", "match_id",
                adc_cosine(F.col("pv"), F.col("codes")).alias("cosine_pq"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_pq").desc(), "match_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def pq_topk_rerank(probes: DataFrame, corpus: DataFrame, codebooks, k: int,
                   shortlist_mult: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """PQ shortlist + exact re-rank — the production ANN recipe: score the
    whole corpus cheaply over codes (ADC), keep a ``shortlist_mult * k``
    shortlist per probe, then fetch ONLY the shortlist's float vectors and
    re-rank with exact cosine. At 100 TB the exact side touches
    |probes|·(mult·k) vectors instead of the corpus — the code scan does
    the heavy lifting in compressed space. Returns (probe_id, match_id,
    cosine, rank) with exact cosines, same shape as ``topk_cosine``."""
    m, ksub, dsub = codebooks.shape
    dim = m * dsub  # full vector length, known from the codebooks
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    shortlist = pq_topk_cosine(
        probes, codes, codebooks, k * shortlist_mult,
        id_col=id_col, vec_col=vec_col,
    ).select("probe_id", "match_id")
    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("pv"),
                      _l2(vec_col, dim).alias("pn"))
    c = corpus.select(F.col(id_col).alias("match_id"),
                      F.col(vec_col).alias("cv"),
                      _l2(vec_col, dim).alias("cn"))
    exact = (
        shortlist.join(F.broadcast(p), "probe_id")
        .join(c, "match_id")
        .select("probe_id", "match_id",
                (_dot("pv", "cv", dim)
                 / (F.col("pn") * F.col("cn"))).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(),
                                               "match_id")
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cluster_balanced_sample(corpus: DataFrame, quota: int,
                            num_cells: int = 8,
                            centroids: list[tuple[int, list[float]]] | None = None,
                            dim: int | None = None,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            method: str = "window",
                            salt_buckets: int = 64) -> DataFrame:
    """Diversity-balanced selection over an embedding corpus: assign every
    vector to its nearest centroid cell, then keep up to ``quota`` vectors
    per cell — the embedding-space counterpart of source-balanced mixture
    sampling (a raw uniform sample mirrors the corpus's topic skew; equal
    per-cell quotas flatten it, the cluster-balancing step of
    SemDeDup/DSIR-style data curation).

    The within-cell pick is a seeded-uniform DETERMINISTIC rule, not an
    RNG: rank by (md5 of the id, id) — cross-engine identical, so the SQL
    oracle reproduces the exact pick — and keep the ``quota`` smallest.
    Returns (id, cell, pick_rank). Both methods return identical rows:

    - ``method="window"``: one ``row_number`` window keyed on the cell.
      Simplest plan and the oracle-mirrored graded form, but with few
      cells every corpus row funnels through ``num_cells`` reducers,
      each sorting its whole cell — fine at fixture scale, a
      scale-killer at 100 TB.
    - ``method="threshold"`` (the production/scale form): an exact
      distributed selection with NO per-cell sort. Each row gets the
      sortable key (md5(id) || zero-padded id); a salted two-level
      aggregate finds each cell's quota-th-smallest key — level 1 keeps
      the ``quota`` smallest keys per (cell, salt) group (bounded
      array_sort over ~cell/salt_buckets rows), level 2 merges the
      ``salt_buckets`` quota-arrays per cell (≤ salt_buckets·quota
      values, trivial) — then a broadcast join filters ``key <=
      threshold``. Survivors (≤ num_cells·quota rows, i.e. output-sized)
      get pick_rank from a window that is no longer a funnel. Per-task
      memory is O(cell/salt_buckets + salt_buckets·quota); raise
      ``salt_buckets`` with corpus size. Exact at every scale, not just
      test scale: selection by k-th order statistic equals the sort's
      prefix (ties impossible — the key embeds the unique id).

    Tie-break note: the id is zero-padded decimal inside the key, so the
    threshold form assumes NON-NEGATIVE ids (fixture ids are); the
    window form orders by (md5, id) directly and has no such constraint.
    """
    if method not in ("window", "threshold"):
        raise ValueError(f"unknown method {method!r}")
    cents = (centroids if centroids is not None
             else ivf_centroids(corpus, num_cells, id_col, vec_col))
    ca = assign_cells(corpus, cents, dim=dim, id_col=id_col, vec_col=vec_col)
    ids = ca.select(F.col("match_id").alias("id"), "cell")
    if method == "window":
        w = Window.partitionBy("cell").orderBy(
            F.md5(F.col("id").cast("string")), "id")
        return (ids.withColumn("pick_rank", F.row_number().over(w))
                .filter(F.col("pick_rank") <= quota))
    keyed = ids.withColumn(
        "__k", F.concat(F.md5(F.col("id").cast("string")), F.lit("|"),
                        F.lpad(F.col("id").cast("string"), 20, "0")))
    thr = (
        keyed
        .withColumn("__s", F.pmod(F.xxhash64("id"), F.lit(salt_buckets)))
        .groupBy("cell", "__s")
        .agg(F.slice(F.array_sort(F.collect_list("__k")), 1, quota)
             .alias("__ks"))
        .groupBy("cell")
        .agg(F.array_sort(F.flatten(F.collect_list("__ks"))).alias("__all"))
        .select(
            "cell",
            F.element_at("__all",
                         F.least(F.lit(quota), F.size("__all"))).alias("__thr"))
    )
    survivors = (keyed.join(F.broadcast(thr), "cell")
                 .filter(F.col("__k") <= F.col("__thr")))
    w = Window.partitionBy("cell").orderBy("__k")
    return (survivors.withColumn("pick_rank", F.row_number().over(w))
            .select("id", "cell", "pick_rank"))


def knn_graph(corpus: DataFrame, k: int = 5, num_blocks: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact k-nearest-neighbor graph over an embedding corpus by cosine:
    every vector gets its ``k`` nearest OTHER vectors. Returns
    (id, nbr, cosine, rank) with rank 1..k per id (ties broken by nbr id).
    The kNN graph is the backbone structure for graph-based semantic
    dedup, kNN-classification of unlabeled corpora, and HNSW-style index
    builds.

    Distributed blocked form (the embedding_dup_pairs_blocked shape, plus
    a per-row partial top-k): rows hash into ``num_blocks`` blocks, each
    row replicates to its ``num_blocks`` unordered block pairs, and each
    (bi, bj) task computes its sub-GEMM with vectorized numpy, keeping
    only the per-row TOP-K within the block pair (argpartition, O(cols)
    per row) — never materializing the full n² similarity matrix. A
    global per-id window then merges the <= num_blocks*k candidates per
    row down to the true top-k: correct because a row's true k nearest
    all live in SOME block pair containing the row, where they rank in
    that pair's local top-k.

    Scale accounting: shuffle volume is num_blocks x corpus (same as the
    blocked pair join); candidate volume entering the window is
    n*num_blocks*k rows of three scalars — output-scale, not n². The n²
    FLOP cost is inherent to exactness; at 100 TB run it per-IVF-cell
    (assign_cells) or on the LSH-bucketed candidates instead, trading
    recall, or raise num_blocks so each sub-GEMM fits executor memory.
    """
    import pandas as pd

    e = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).cast("int")
         .alias("b"),
    )
    rep = e.select(
        "id", "v", "b",
        F.explode(F.array(*[
            F.struct(F.least(F.col("b"), F.lit(j)).alias("bi"),
                     F.greatest(F.col("b"), F.lit(j)).alias("bj"))
            for j in range(num_blocks)
        ])).alias("bp"),
    ).select("id", "v", "b",
             F.col("bp.bi").alias("bi"), F.col("bp.bj").alias("bj"))

    out_schema = "id long, nbr long, cosine double"

    def block_topk(key, pdf):
        import numpy as np

        bi, bj = key
        ids = pdf["id"].to_numpy()
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(mat, norms, out=mat, where=norms > 0)

        def rows_topk(sims, row_ids, col_ids):
            # per-row top-k (argpartition: O(cols) per row, no full sort)
            kk = min(k, sims.shape[1])
            if kk < 1 or sims.shape[0] == 0:
                return [], [], []
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rid = np.repeat(row_ids, kk)
            cid = col_ids[part.ravel()]
            val = np.take_along_axis(sims, part, axis=1).ravel()
            keep = np.isfinite(val)  # drops the -inf self slot
            return rid[keep], cid[keep], val[keep]

        if bi == bj:
            sims = mat @ mat.T
            np.fill_diagonal(sims, -np.inf)
            a_id, a_nbr, a_val = rows_topk(sims, ids, ids)
            return pd.DataFrame({"id": a_id, "nbr": a_nbr, "cosine": a_val})
        left = pdf["b"].to_numpy() == bi
        right = ~left
        sims = mat[left] @ mat[right].T
        l_id, l_nbr, l_val = rows_topk(sims, ids[left], ids[right])
        r_id, r_nbr, r_val = rows_topk(sims.T, ids[right], ids[left])
        return pd.DataFrame({
            "id": np.concatenate([l_id, r_id]),
            "nbr": np.concatenate([l_nbr, r_nbr]),
            "cosine": np.concatenate([l_val, r_val]),
        })

    cand = rep.groupBy("bi", "bj").applyInPandas(block_topk, out_schema)
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(), "nbr")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def covariance_matrix(corpus: DataFrame, vec_col: str = "embedding",
                      dim: int = 64) -> DataFrame:
    """Exact feature covariance of an embedding corpus in ONE pass:
    returns (i, j, n, cov) for the upper triangle 0 <= i <= j < dim —
    the D x D statistic behind PCA/whitening, drift monitoring, and
    OPQ-style rotation training for product quantizers.

    Scale shape: each Arrow batch is reduced IN the scan task to a
    D x D partial Gram (X^T X via one BLAS call), a partial per-dim sum
    and a count — so the only thing that ever shuffles is
    O(partitions * D^2) scalars, never vectors (100 TB of embeddings
    reduce to megabytes of partials; the final groupBy on (i, j) is a
    D^2-key partial+final agg). The driver never collects; the finish
    cov = (S_xy - S_x*S_y/n) / (n - 1) runs as column algebra on the
    D^2-row frame. This is the textbook map-side-combine pattern that a
    naive unnest-join (D^2 rows per VECTOR shuffled) would miss by four
    orders of magnitude at scale.

    Numerics: float32 inputs are widened to float64 before the products
    (exact), partial sums accumulate in float64; cross-engine
    sum-order differences are absorbed by the caller rounding cov (the
    registry rounds to 6dp). The non-centered Gram plus mean correction
    is the mergeable form (unlike centered single-pass streams, partials
    combine associatively) — the catastrophic-cancellation caveat only
    bites when |mean| >> stddev, which embedding corpora (centered by
    construction) don't hit; callers with raw un-centered features
    should pre-shift by any constant approximation of the mean.
    """
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)
    schema = "i int, j int, n long, si double, sj double, sxy double"

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            yield pd.DataFrame({
                "i": iu[0], "j": iu[1],
                "n": np.full(len(iu[0]), len(x), dtype=np.int64),
                "si": s[iu[0]], "sj": s[iu[1]],
                "sxy": g[iu],
            })

    # NO CPU-spread here (r16 measured-negative): the per-batch BLAS
    # partial is a single tiny GEMM at fixture scale — an RR exchange of
    # the vectors costs 2.0x more than the one-core GEMM it parallelizes
    # (same-session A/B, sf0.1: 0.54 -> 1.08 s). At 100 TB the scan is
    # wide on its own and the partials parallelize for free.
    agg = (
        corpus.select(vec_col).mapInPandas(partials, schema)
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"), F.sum("si").alias("si"),
             F.sum("sj").alias("sj"), F.sum("sxy").alias("sxy"))
    )
    cov = ((F.col("sxy") - F.col("si") * F.col("sj") / F.col("n"))
           / (F.col("n") - 1))
    return agg.select("i", "j", F.col("n").cast("long").alias("n"),
                      cov.alias("cov"))


def _sq_l2_to_literal(vec_col: str, center: list[float]) -> Column:
    """Squared L2 distance from a double-array column to a LITERAL center,
    as a sequential dim-order fold — the same addition order DuckDB's
    list_sum(list_transform(...)) performs, so both engines produce
    bit-identical doubles (the list_dot_product/vectors.dot precedent)."""
    arr = "array(" + ", ".join(f"{x!r}D" for x in center) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> (x - y) * (x - y)),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)")


def kcenter_select(corpus: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 8,
                   method: str = "running") -> DataFrame:
    """Greedy k-center (Gonzalez farthest-point) coreset selection: start
    from the smallest-id vector, then k-1 times pick the point FARTHEST
    (squared L2) from the already-selected set — a 2-approximation of the
    optimal k-center cover, and the standard diversity-coreset /
    active-learning seed picker (pick the k docs that together span the
    embedding space, not k near-duplicates).

    Returns (rank, vec_id, sel_dist): selection order, chosen id, and the
    point's distance to the set at selection time (0 for the seed) — a
    DECREASING sequence that doubles as the coverage-radius curve.

    Two bit-identical forms (min is associative and each per-center fold
    keeps the same left-to-right dim order, so only the evaluation
    schedule differs — a pytest asserts row equality):

    - method="running" (default): maintain (id, v, dmin) as a persisted
      frame; each round updates dmin = least(dmin, dist-to-NEWEST-center)
      and takes TakeOrdered(1). Per-point work is O(k) distance folds
      total (vs O(k^2) for rescan), and every round's plan carries ONE
      literal center — constant expression size, so driver/codegen cost
      stays flat as k grows (the similarity_ann_ivf r6 lesson: per-round
      expression growth is driver time). The persist is
      MEMORY_AND_DISK of (id, v, dmin) — source-table-sized, the same
      budget any cached scan costs; rounds unpersist the parent as soon
      as the child is materialized, so at most two generations live.
    - method="rescan": stateless k scans of the raw table, round r
      folding over all r literal centers (least of r folds). No cache
      budget at all — the choice when executor storage memory is the
      binding constraint at 100 TB — at the price of O(k^2) folds and
      growing per-round expressions; preferred only for small k.

    Deterministic: ties in distance break on the smaller id. If k
    exceeds the number of DISTINCT vectors, selection stops early
    (fewer than k rows returned): once the farthest remaining distance
    is 0 every point coincides with a center, and further rounds could
    only re-pick duplicates.
    """
    if method not in ("running", "rescan"):
        raise ValueError(f"kcenter_select: unknown method {method!r}")
    _require_plain_identifier("kcenter_select", vec_col)
    spark = corpus.sparkSession
    # NO CPU-spread (r16 measured-negative, 1.16x: k TakeOrdered rounds
    # over 32 spread partitions cost more task overhead than the
    # single-split fold they parallelize at fixture scale)
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"))
    first = base.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("kcenter_select: empty corpus")
    picked = [(0, first[0]["id"], 0.0)]
    vecs = [list(first[0]["v"])]
    if method == "rescan":
        for rank in range(1, k):
            dists = [_sq_l2_to_literal("v", c) for c in vecs]
            dmin = dists[0] if len(dists) == 1 else F.least(*dists)
            far = (base.select("id", "v", dmin.alias("d"))
                   .orderBy(F.col("d").desc(), "id").limit(1).collect()[0])
            if float(far["d"]) == 0.0:
                break  # coverage exhausted: all points coincide with centers
            picked.append((rank, far["id"], float(far["d"])))
            vecs.append(list(far["v"]))
    else:
        from pyspark import StorageLevel
        cur = (base.select("id", "v",
                           _sq_l2_to_literal("v", vecs[0]).alias("d"))
               .persist(StorageLevel.MEMORY_AND_DISK))
        prev = None
        for rank in range(1, k):
            far = (cur.orderBy(F.col("d").desc(), "id")
                   .limit(1).collect()[0])  # materializes cur in cache
            if prev is not None:
                prev.unpersist()
                prev = None
            if float(far["d"]) == 0.0:
                break  # coverage exhausted: all points coincide with centers
            picked.append((rank, far["id"], float(far["d"])))
            if rank < k - 1:
                prev, cur = cur, (
                    cur.select(
                        "id", "v",
                        F.least(F.col("d"),
                                _sq_l2_to_literal("v", list(far["v"])))
                        .alias("d"))
                    .persist(StorageLevel.MEMORY_AND_DISK))
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(picked, "rank int, vec_id long, "
                                         "sel_dist double")


def pca_power(corpus: DataFrame, vec_col: str = "embedding",
              id_col: str = "vec_id", dim: int = 64,
              iters: int = 6) -> tuple[list[int], DataFrame]:
    """Distributed top-principal-component extraction: ONE covariance
    pass over the corpus (covariance_matrix — the map-side-combine
    D^2 aggregate, megabytes of partials at any scale), then ``iters``
    power-iteration steps on the collected D x D matrix (bounded driver
    metadata — the kmeans_lloyd / kcenter precedent), then ONE more
    scan projecting every vector onto the dominant component. The
    whitening/compression/outlier-scoring primitive: pc1 scores feed
    drift monitors, coreset strata, and the OPQ-style rotations the
    covariance operator exists for.

    Deterministic and oracle-ready by INTEGER construction: the
    covariance is snapped to a 1e-6 grid (cov_int = round(cov * 1e6) as
    int64), the iteration vector starts at [1e6] * dim, and each step
    computes w = C_int . v (EXACT int64 arithmetic — |w| <= dim *
    max|cov_int| * 1e6 ~ 1e14, well inside 2^53 so even the float
    handoff sees exact operands), rescales to the grid with
    round(w * 1e6 / max|w|) (bit-identical IEEE ops on bit-identical
    exact-integer operands in any engine), and never normalizes in
    float — so a SQL twin unrolling the same CTE steps reproduces the
    weight vector EXACTLY, not just to rounding. Per-dim means are
    computed as a 1-row broadcast (round(sum/n, 6)) and the projection
    is a scan-side sequential zip_with fold (the _sq_l2_to_literal
    addition-order convention). Convergence to the true PC1 depends on
    the spectral gap as usual for power iteration; the operator
    contract is 'iters steps from the all-ones grid vector'.

    Returns (weights, scores): weights = the final integer grid vector
    (true direction = weights / 1e6, unnormalized), scores = (id,
    pc1_score) with pc1_score = ((x - mean) . weights) / 1e6 rounded
    to 6dp.
    """
    if iters < 0 or dim < 1:
        raise ValueError("pca_power: iters >= 0 and dim >= 1 required")
    _require_plain_identifier("pca_power", vec_col)
    grid = 1_000_000
    cov_rows = covariance_matrix(corpus, vec_col, dim).collect()
    if not cov_rows:
        raise ValueError("pca_power: empty corpus")
    C = [[0] * dim for _ in range(dim)]
    for r in cov_rows:
        ci = int(_round_half_away(r["cov"] * grid, 0))
        C[r["i"]][r["j"]] = ci
        C[r["j"]][r["i"]] = ci
    v = [grid] * dim
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            break  # zero covariance: direction is arbitrary, keep v
        v = [int(_round_half_away(x * float(grid) / m, 0)) for x in w]

    # NO CPU-spread (r16 measured-neutral: 9-sample interleaved A/B at
    # sf0.1 read medians 2.08 s unspread vs 2.12 s spread — the single
    # 64-dim fold per row is too cheap for the exchange to pay off; at
    # scale the scan is wide on its own)
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"))
    mu_aggs = [F.count(F.lit(1)).alias("__n")]
    mu_aggs += [F.sum(F.element_at(
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))"), j + 1))
        .alias(f"__s{j}") for j in range(dim)]
    mus = corpus.agg(*mu_aggs).select(F.array(
        *[F.round(F.col(f"__s{j}") / F.col("__n"), 6)
          for j in range(dim)]).alias("__mu"))
    w_arr = "array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")"
    fold = (f"aggregate(zip_with(zip_with(v, __mu, (x, m) -> x - m), "
            f"{w_arr}, (x, wt) -> x * wt), "
            f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    scores = (base.crossJoin(F.broadcast(mus))
              .select("id", F.round(F.expr(fold) / F.lit(1000000.0), 6)
                      .alias("pc1_score")))
    return v, scores


def _seq_sq_l2_dists(X, cents):
    """(n, k) squared-L2 distances of batch matrix ``X`` (n x dim,
    float64) to every centroid in ``cents``, with the accumulation in
    the SAME sequential dim order as the ``aggregate(zip_with(...))``
    fold and the oracle's list_sum(list_transform(...)) — acc_j =
    acc_{j-1} + (x_j - c_j)^2, vectorized ACROSS rows (per-row IEEE ops
    are independent, so elementwise += reproduces the scalar fold
    bit-for-bit; a BLAS GEMM would not — pairwise summation reorders
    the adds)."""
    import numpy as np

    n = X.shape[0]
    D = np.empty((n, len(cents)), dtype=np.float64)
    for ci, c in enumerate(cents):
        acc = np.zeros(n, dtype=np.float64)
        for j, cj in enumerate(c):
            diff = X[:, j] - cj
            acc += diff * diff
        D[:, ci] = acc
    return D


def _round_half_away(x: float, dp: int) -> float:
    """Driver-side decimal rounding matching the pinned cross-engine
    round() contract (tests/test_text_ops.py): ties at dp+1 go HALF AWAY
    FROM ZERO, like Spark's F.round and DuckDB's round — not Python
    round()'s banker's half-to-even. (No binary double is an exact tie
    at 6 decimals — the denominator would need a 5^6 factor, which no
    dyadic rational has — so this differs from round() only in
    principle; the helper exists so the convention is uniform, not
    input-dependent.) Rounds the EXACT binary value, Decimal(float),
    the same value DuckDB's round sees."""
    import decimal

    q = decimal.Decimal(1).scaleb(-dp)
    return float(decimal.Decimal(x).quantize(
        q, rounding=decimal.ROUND_HALF_UP))


def kmeans_lloyd(corpus: DataFrame, k: int = 8, iters: int = 3,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int | None = None,
                 round_dp: int = 6) -> tuple[list[tuple[int, list[float]]],
                                             DataFrame]:
    """Fully DISTRIBUTED Lloyd's k-means (squared L2 on raw vectors):
    the scale path past ivf_train_kmeans's driver-sample trainer — when
    the corpus distribution can't be captured by a bounded sample (very
    large k, heavy tails, multi-tenant corpora), BOTH the assignment and
    the mean update run on the cluster; the driver only ever holds the
    k x dim centroid floats between iterations (bounded metadata — the
    kcenter_select / BPE-loop precedent).

    Deterministic and oracle-ready by construction: init = the k
    smallest-id vectors; assignment = argmin over k scan-side literal
    squared-L2 folds (array_min over (dist, idx) structs — ties take the
    smallest centroid index); every new centroid coordinate is the
    per-cell mean ROUNDED to ``round_dp`` (half away from zero via
    ``_round_half_away`` — the pinned cross-engine round() convention,
    not Python round()'s half-to-even) before it is re-broadcast, so
    each iteration's handoff is a short exact decimal that a SQL twin
    can replay verbatim (the supplier_pagerank unrolled-CTE precedent —
    an r9 oracle unrolls ``iters`` assignment+mean CTE pairs). Empty
    cells keep their previous centroid. Plan per iteration: one scan +
    ONE cell-keyed partial+final aggregate carrying (count, dim sums) —
    never the vectors; the k-literal fold expressions are built as one
    SQL string (the r6 ANN-IVF py4j lesson).

    Returns (centroids, assignments): centroids as [(cell, coords)],
    assignments (id, cell, dist) under the FINAL centroids with dist
    rounded to ``round_dp``.
    """
    if k < 1 or iters < 0:
        raise ValueError("kmeans_lloyd: k >= 1 and iters >= 0 required")
    _require_plain_identifier("kmeans_lloyd", vec_col)
    # gated CPU-spread: every iteration's assignment folds and dim-sum
    # partials run wide instead of on the fixture's single split (r16)
    base = _spread(corpus).select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"))
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("kmeans_lloyd: empty corpus")
        dim = len(first[0])
    init = base.orderBy("id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"kmeans_lloyd: k={k} but only {len(init)} vectors")
    cents = [[_round_half_away(float(x), round_dp) for x in r["v"]]
             for r in init]

    # Measured-NEGATIVE (r17): replacing these folds with the silhouette
    # Arrow pass (pandas_udf over _seq_sq_l2_dists — byte-identical
    # assignments, verified) is SLOWER here: alternating isolated probes
    # at sf0.1, Arrow 2.68-3.23 s vs fold 1.92-2.93 s across three
    # pairings. At k=4 the per-row fold is ~5x cheaper than silhouette's
    # k=10 a+b CASE (19 folds/row), while the Arrow form pays the
    # JVM->Python vector transfer per ITERATION job (iters+1 boundary
    # crossings of the whole corpus) — the boundary, not the math, is
    # the cost at this k. A large-k caller should revisit (the
    # silhouette numbers say the crossover is somewhere under k=10).
    def best(cent_list):
        scores = F.array(*[
            F.struct(_sq_l2_to_literal("v", c).alias("d"),
                     F.lit(i).alias("i"))
            for i, c in enumerate(cent_list)])
        return F.array_min(scores).alias("m")

    for _ in range(iters):
        assigned = base.select("v", best(cents))
        sums = assigned.groupBy(F.col("m.i").alias("cell")).agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("v", j + 1)).alias(f"s{j}")
              for j in range(dim)])
        got = {r["cell"]: r for r in sums.collect()}  # <= k rows
        cents = [
            [_round_half_away(got[c][f"s{j}"] / got[c]["n"], round_dp)
             for j in range(dim)] if c in got else cents[c]
            for c in range(k)]
    assignments = base.select(
        "id", best(cents)).select(
        "id", F.col("m.i").alias("cell"),
        F.round(F.col("m.d"), round_dp).alias("dist"))
    return [(c, cents[c]) for c in range(k)], assignments


def silhouette_by_label(corpus: DataFrame, vec_col: str = "embedding",
                        label_col: str = "label",
                        dim: int = 64) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster label: for each
    vector a = squared-L2 to its OWN label centroid, b = min squared-L2
    to any OTHER label centroid, s = (b - a) / max(a, b) — the standard
    clustering-quality audit at the price the exact silhouette can never
    pay (exact needs all-pairs distances; the centroid form is the
    accepted large-scale surrogate, e.g. scikit-learn's discussion of
    silhouette cost). Returns per-label (n, avg_sil) plus the corpus
    average.

    Scale shape (the kmeans_lloyd choreography): ONE (label)-keyed
    (count, dim-sums) aggregate; the driver holds only k x dim floats,
    each mean rounded HALF AWAY FROM ZERO to 6dp (the pinned cross-
    engine handoff) and handed to a vectorized Arrow scorer (r17; was
    literal scan-side squared-L2 folds) — scoring is a pure projection
    on the corpus scan, no join, no second shuffle; the final per-label
    aggregate is the only other exchange, and the corpus-average windows
    run over its <= k-row frame.

    ``label_col`` must be an integral type: labels index the centroid
    matrix via a sorted-order lookup inside the Arrow scorer (r9-r16
    interpolated them into generated ``CASE __lbl WHEN {l}`` SQL — the
    original reason for the guard), and an ordered integral key keeps
    that lookup exact; dense-rank string labels to ints first.
    """
    lbl_t = corpus.schema[label_col].dataType.simpleString()
    if lbl_t not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"silhouette_by_label: label column {label_col!r} must be an "
            f"integral type (labels index the centroid matrix in the "
            f"Arrow scorer), got {lbl_t}")
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # gated CPU-spread (round-robin, NOT by label — 10 labels would use
    # 10 of 32 cores): the Arrow scorer and the dim-sums aggregate (64
    # partials per row) run single-split on the fixture scan otherwise.
    # Measured r16 same-session A/B at sf0.1 (fold-form era):
    # 3.57 -> 2.73 s (0.76x). The unrolled codegen form of the folds was
    # ALSO tried and measured-NEGATIVE: 10 CASE arms x least(9 x
    # 64-term) expressions explode planning/compile time past any
    # per-row win at this scale.
    base = _spread(corpus).select(F.col(label_col).alias("__lbl"),
                                  dbl.alias("__v"))
    sums = base.groupBy("__lbl").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.element_at("__v", i + 1)).alias(f"__s{i}")
          for i in range(dim)])
    rows = sums.collect()  # <= k label rows: bounded metadata
    if len(rows) < 2:
        raise ValueError("silhouette_by_label: need >= 2 distinct labels")
    cents = {r["__lbl"]: [_round_half_away(r[f"__s{i}"] / r["__n"], 6)
                          for i in range(dim)]
             for r in rows}
    labels = sorted(cents)

    # r17 (guide §4.2, VERDICT item 5): the k interpreted 64-dim
    # aggregate(zip_with(...)) CASE folds per row (CodegenFallback —
    # the r16 spread only moved them to more cores) are replaced by ONE
    # vectorized Arrow pass: per batch, a (n x k) distance matrix via
    # _seq_sq_l2_dists (same sequential dim-order accumulation, so every
    # per-row a/b/s double is bit-identical to the fold — verified by a
    # full-frame diff at sf0.1, 10/10 output rows byte-equal), a = own
    # label's column, b = min over the others (exact min), s = (b-a)/
    # max(a,b) with the same >0 guard. Still a pure projection: no join,
    # no window, no exchange added (ArrowEvalPython rides the scan
    # stage). The r16 unrolled-codegen CASE attempt stays pinned
    # measured-negative above; this form removes the interpreter without
    # the plan-size explosion. Same-session A/B at sf0.1: see
    # OPTIMIZATION_r17.md (silhouette query).
    cent_rows = [cents[l] for l in labels]
    lab_arr = labels

    @F.pandas_udf("double")
    def _sil_score(lbl, v):
        import numpy as np
        import pandas as pd

        if not len(v):
            return pd.Series([], dtype="float64")
        X = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        D = _seq_sq_l2_dists(X, cent_rows)
        li = np.searchsorted(np.asarray(lab_arr), lbl.to_numpy())
        rows = np.arange(X.shape[0])
        a = D[rows, li]
        D[rows, li] = np.inf
        b = D.min(axis=1)
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        return pd.Series(s)

    per = (base.select("__lbl", _sil_score("__lbl", "__v").alias("__s"))
           .groupBy("__lbl")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("__s").alias("__sum")))
    whole = Window.orderBy("__lbl").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return per.select(
        F.col("__lbl").alias(label_col), "n",
        F.round(F.col("__sum") / F.col("n"), 6).alias("avg_sil"),
        F.round(F.sum("__sum").over(whole) / F.sum("n").over(whole), 6)
         .alias("avg_sil_overall"))
