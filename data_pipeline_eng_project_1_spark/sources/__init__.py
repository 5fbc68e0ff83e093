"""Sources: fixture-table catalog, JSON match source, incremental file intake."""

from data_pipeline_eng_project_1_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
