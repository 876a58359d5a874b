"""Path-based table registry — the open equivalent of the Glue Data Catalog.

The reference reads every input via
``glueContext.create_dynamic_frame.from_catalog(database=..., table_name=...)
.toDF()`` (reference ``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:22-43``).
The DynamicFrame adds nothing the jobs use (no ResolveChoice/ApplyMapping
anywhere — SURVEY.md §1.1), so the new engine reads Parquet straight into
DataFrames and optionally registers temp views so the same tables are
reachable from ``spark.sql``.

Scale note: ``spark.read.parquet`` gives Spark's native vectorized Parquet
reader with predicate pushdown, column pruning, and partition discovery —
at 100 TB the catalog would be Hive-metastore/Delta/Iceberg-backed, but the
DataFrame surface below is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table from a scale-factor directory (S1–S6 equivalent).

    The ``events`` table is written by pandas/pyarrow with
    ``isAdjustedToUTC=false`` (no timezone), which Spark 4 reads as
    ``timestamp_ntz``. The engine (windows, watermarks, ``unix_millis``)
    and the DuckDB oracle both want plain ``timestamp``; the session
    timezone is pinned to UTC (session.py), so the cast below is
    value-preserving. A ``bigint`` epoch-micros column (older writers /
    legacy confs) is normalized the same way.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros("ts"))
    return df


class TableRegistry:
    """Lazy loader + temp-view registrar over a scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        """Expose tables to spark.sql() as temp views."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
