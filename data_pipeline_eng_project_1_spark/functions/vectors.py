"""Vector math over ArrayType columns — pure column algebra.

All arithmetic is forced to DOUBLE before multiply/accumulate so results are
bit-identical to an oracle computing in double (float32 intermediates would
diverge in the 7th digit). Sums are sequential left-to-right in array order
on both Spark and DuckDB (list_sum), which keeps even the last ulp aligned.

Two physical forms, same math, chosen by ``UNROLL_MAX_DIM``:

- fold — ``aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)``.
  The lambda is interpreted per element (higher-order functions are
  CodegenFallback), but the GENERATED code is a constant-size loop, so the
  one-time whole-stage-codegen compile cost is O(1) in ``dim``.
- unrolled — the fold expanded into a literal expression tree of ``dim``
  multiply-adds that stays fully inside codegen. Left-associated addition
  in element order is EXACTLY the fold's summation order (acc starts at
  0.0 and accumulates left-to-right), so the two forms are bit-identical
  — measured: all vector queries hash-match the DuckDB oracle under
  either form.

Which wins is a compile-vs-throughput trade. Unrolling dim=64 into every
cosine site made the generated class so large that FIRST execution of each
similarity query cost 4-8 s of Janino+JIT compile (23.6 s cold across the
six vector queries, vs 12.6 s with the fold — fresh-JVM measurement,
sf0.01), while steady-state differences at bench scale were noise-level.
So: unrolled only for narrow vectors (≤ ``UNROLL_MAX_DIM``), fold above
that. Throughput-critical high-dim paths (all-pairs dedup, ANN signature
GEMMs) don't use per-row expressions at all — they go through the
Arrow-batched numpy GEMM operators in operators/similarity and
operators/dedup, which is the real scale path for wide embeddings.

A-vs-b LENGTH mismatches NULL-poison in both forms: 0-based ``F.get``
yields NULL past the shorter array's end, and ``zip_with`` pads the
shorter side with NULL. A too-large ``dim`` does NOT fail uniformly,
though: the unrolled form goes NULL (``F.get`` past the end) while the
fold form silently TRUNCATES (``F.slice`` caps at the array end and
returns the full-array sum) — so the two forms diverge exactly on that
misuse. ``assert_dim`` is the only guard; validate fixtures with it
instead of relying on either failure mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: Unroll dot products only up to this many dimensions; wider vectors use
#: the constant-compile-cost fold (see module docstring for measurements).
UNROLL_MAX_DIM = 16


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential dot product in double over the first ``dim`` elements
    (the whole array when ``dim`` is None); unrolled into codegen if
    ``dim`` is small enough.

    Both physical forms honor ``dim`` identically: the unrolled form sums
    exactly ``dim`` terms, and the fold form slices both operands to
    ``dim`` first — so a truncating caller (dim < len) gets the same
    first-``dim`` sum either side of ``UNROLL_MAX_DIM``, not a silent
    switch to the full-array sum.

    Failure mode when ``dim`` is too LARGE — form-dependent, both silent:
    the unrolled form's 0-based ``F.get`` returns NULL past the array end,
    so the whole dot (and any cosine built on it) goes NULL and rows
    vanish from top-k/threshold results; the fold form's ``F.slice`` caps
    at the array end, so it returns the full-array sum — a plausible but
    wrong number. If a fixture's vector length changes, validate once
    with ``assert_dim(df, vec_col, dim)`` below rather than trusting
    either failure mode at the call sites."""
    if dim is not None and dim <= UNROLL_MAX_DIM:
        acc = None
        for i in range(dim):
            term = F.get(a, i).cast("double") * F.get(b, i).cast("double")
            acc = term if acc is None else acc + term
        return acc
    if dim is not None:
        a, b = F.slice(a, 1, dim), F.slice(b, 1, dim)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


FOLD_DOT_SQL = ("aggregate(zip_with({a}, {b}, (x, y) ->"
             " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
             " CAST(0 AS DOUBLE), (acc, x) -> acc + x)")


def dot_expr(a: str, b: str, dim: int) -> Column:
    """``dot(col(a), col(b), dim)`` built as ONE SQL string → one
    ``F.expr`` call. The Column-API form costs a py4j round-trip per node
    (~1.2 s of pure driver time at dim=64, per call site); the parser
    builds the identical tree server-side in milliseconds. Use whenever
    both operands are plain column names. Form per ``UNROLL_MAX_DIM``;
    like ``dot``, the fold form slices to ``dim`` so truncating callers
    agree across both forms (slice(arr, 1, len) of a full-length array is
    the identity, so the usual dim == len call sites are unchanged)."""
    if dim <= UNROLL_MAX_DIM:
        return F.expr(" + ".join(
            f"CAST(get({a}, {i}) AS DOUBLE) * CAST(get({b}, {i}) AS DOUBLE)"
            for i in range(dim)))
    return F.expr(FOLD_DOT_SQL.format(a=f"slice({a}, 1, {dim})",
                                   b=f"slice({b}, 1, {dim})"))


def l2_expr(col: str, dim: int) -> Column:
    """``l2_norm(col, dim)`` via one SQL string (see dot_expr): identical
    tree, ~3 py4j calls instead of ~900."""
    return F.sqrt(dot_expr(col, col, dim))


def assert_dim(df, vec_col: str, dim: int) -> None:
    """Cheap loud guard for a dim/fixture mismatch (see dot() docstring):
    checks ONE row's array length — a driver-side metadata probe, not a
    scan of the data."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if row is not None and row["n"] != dim:
        raise ValueError(
            f"vector column {vec_col!r} has length {row['n']}, expected {dim}")


def sq_norm(a: Column, dim: int | None = None) -> Column:
    return dot(a, a, dim)


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(sq_norm(a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))
