"""XML source (Spark 4 built-in `xml` format) — the format-agnostic twin
of sources/json_source.py.

The reference's intake is hard-wired to JSON dumps parsed with
json.loads (reference: dags/utils.py:54-71); feeds that publish the same
match records as XML would force a pre-conversion step there. Here XML is
just another DataSource: the SAME explicit schema (no inference pass over
100 TB, no per-file drift), the same PERMISSIVE dirty-row handling, and
the resulting frame flows into the unchanged downstream plan
(plans/flashscore.py::transform_all) — format is an intake option, not a
pipeline fork.

Scale notes: like JSON, XML has no predicate pushdown or column pruning
at the scan (each row materializes from markup), so keep XML at the
INTAKE edge and land parquet immediately (run_pipeline does); rowTag
splitting is record-parallel across files and within splittable
compression codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from data_pipeline_eng_project_1_spark.sources.json_source import MATCH_SCHEMA


def read_xml(spark: SparkSession, paths: str | list[str], row_tag: str,
             schema: T.StructType | None = None) -> DataFrame:
    """Read XML files, one record per ``row_tag`` element.

    ``schema=None`` falls back to sampling inference — acceptable for
    exploration only; production intakes pass the contract schema (the
    json_source rationale). PERMISSIVE mode nulls dirty records instead
    of failing the batch; repeated same-name child elements map to
    ArrayType fields, nested elements to StructType — the same shapes
    the JSON contract declares.
    """
    reader = (spark.read.format("xml")
              .option("rowTag", row_tag)
              .option("mode", "PERMISSIVE"))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(paths)


def read_matches_xml(spark: SparkSession,
                     paths: str | list[str]) -> DataFrame:
    """Flashscore match dumps as XML (<matches><match>...</match>...):
    returns the exact MATCH_SCHEMA frame read_matches produces from JSON,
    so plans/flashscore.py::transform_all / run_pipeline consume either
    format unchanged."""
    return read_xml(spark, paths, row_tag="match", schema=MATCH_SCHEMA)
