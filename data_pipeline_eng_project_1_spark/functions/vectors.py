"""Vector math over ArrayType columns — pure column algebra.

All arithmetic is forced to DOUBLE before multiply/accumulate so results are
bit-identical to an oracle computing in double (float32 intermediates would
diverge in the 7th digit). Sums are sequential left-to-right in array order
on both Spark (F.aggregate) and DuckDB (list_sum), which keeps even the last
ulp aligned.

These run inside whole-stage codegen — for 64-dim vectors the brute-force
cosine stays JVM-side and vectorizes fine; the Pandas-UDF escape hatch is
only worth it for >1k dims (matrix-blocked numpy), which operators/similarity
documents as the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
