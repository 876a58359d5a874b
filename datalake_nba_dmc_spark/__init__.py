"""datalake_nba_dmc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference medallion pipeline ``0pcf-73/datalake-nba-dmc`` (five AWS Glue jobs,
Landing→Bronze→Silver→Gold; see SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/Tungsten physical execution.
- No Glue: plain ``SparkSession`` + a path-based table registry.
- Operator modules (``operators/``) are small composable functions over
  DataFrames — conform (rename/drop/cast), joins, aggregates, windows,
  dedup, similarity search, text analysis, multimodal plumbing.
- Designed for 100 TB scale: no ``coalesce(1)``, no per-column driver
  actions, broadcast hints on small dimensions, AQE on.
"""

from datalake_nba_dmc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
