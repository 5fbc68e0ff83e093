"""data_pipeline_eng_project_1_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference repo
``jdufou1/data_pipeline_eng_project_1`` (a pandas/Airflow/Snowflake batch ETL
pipeline, surveyed in /root/repo/SURVEY.md) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning/joins),
- nested-JSON operators for the reference's flashscore match schema
  (reference: dags/utils.py:77-182) expressed as native column algebra,
- bulk sinks instead of the reference's per-row INSERT + sleep
  (reference: dags/utils.py:212-217),
- Structured Streaming for the incremental file-intake pattern
  (reference: dags/utils.py:367-383 + move_file at :31-52),
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB scale.

Everything here targets the DataFrame API; there are no RDDs and no
row-at-a-time Python UDFs on hot paths.
"""

from data_pipeline_eng_project_1_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
