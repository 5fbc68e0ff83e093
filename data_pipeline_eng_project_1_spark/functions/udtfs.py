"""Python UDTFs (Spark user-defined table functions).

These are the SLOW path — row-at-a-time Python behind Arrow — and exist to
cover the table-function extension surface, not to be the hot path: every
UDTF here has a native column-algebra twin (functions/texts.py) that the
registered queries use. The reference repo has no UDF/UDTF surface at all
(SURVEY.md §2.7); per-row lambdas there map to native Spark expressions.

Use a UDTF only when the per-row fan-out genuinely needs imperative Python
(stateful tokenizers, external parsers). Tests pin UDTF output equal to the
native twin so the two surfaces cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_start: int, chunk: string")
class ChunkDocument:
    """Lateral chunker: yields overlapping [start, start+size) windows.

    Python twin of ``functions.texts.chunk_spans`` — same spans, same
    edge behavior (empty/null text yields no rows).
    """

    def eval(self, text: str | None, size: int, step: int):  # noqa: D102
        if not text or size <= 0 or step <= 0:
            return
        for start in range(0, len(text), step):
            yield start, text[start : start + size]


def register_all(spark: SparkSession) -> None:
    """Register every UDTF for use in SQL (``LATERAL chunk_document(...)``)."""
    spark.udtf.register("chunk_document", ChunkDocument)
