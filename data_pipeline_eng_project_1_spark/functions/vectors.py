"""Vector math over ArrayType columns — pure column algebra.

All arithmetic is forced to DOUBLE before multiply/accumulate so results are
bit-identical to an oracle computing in double (float32 intermediates would
diverge in the 7th digit). Sums are sequential left-to-right in array order
on both Spark and DuckDB (list_sum), which keeps even the last ulp aligned.

Two physical forms, same math:

- ``dot(a, b)`` — ``F.aggregate`` fold over any-length arrays. Higher-order
  functions are CodegenFallback in Spark (the lambda is interpreted per
  element), so this is the flexible-but-slow form.
- ``dot(a, b, dim=64)`` — the fold unrolled into a literal expression tree
  of ``dim`` multiply-adds. Left-associated addition in element order is
  EXACTLY the fold's summation order, so the result is bit-identical — but
  the whole expression stays inside whole-stage codegen (~10-30× faster on
  the all-pairs hot paths). Uses 0-based ``F.get``, which yields NULL (not
  an ANSI error) past the array end.

The Pandas-UDF escape hatch (matrix-blocked numpy GEMM) remains the scale
path for >1k dims — see operators/similarity and operators/dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential dot product in double; unrolled into codegen if ``dim``
    (the fixed array length) is known.

    Failure mode when ``dim`` is wrong: the unrolled form uses 0-based
    ``F.get``, which returns NULL past the array end — so dim > len(vec)
    makes the whole dot (and any cosine built on it) silently NULL, and
    rows vanish from top-k/threshold results instead of erroring. If a
    fixture's vector length changes, validate once with
    ``assert_dim(df, vec_col, dim)`` below rather than trusting the call
    sites."""
    if dim is not None:
        acc = None
        for i in range(dim):
            term = F.get(a, i).cast("double") * F.get(b, i).cast("double")
            acc = term if acc is None else acc + term
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_expr(a: str, b: str, dim: int) -> Column:
    """``dot(col(a), col(b), dim)`` built as ONE SQL string → one
    ``F.expr`` call. The Column-API form costs a py4j round-trip per node
    (~1.2 s of pure driver time at dim=64, per call site); the parser
    builds the identical left-associated tree server-side in
    milliseconds. Use whenever both operands are plain column names."""
    return F.expr(" + ".join(
        f"CAST(get({a}, {i}) AS DOUBLE) * CAST(get({b}, {i}) AS DOUBLE)"
        for i in range(dim)))


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
