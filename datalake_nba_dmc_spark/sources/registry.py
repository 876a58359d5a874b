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

    The ``events`` table is written with pandas-default TIMESTAMP(NANOS),
    which Spark's Parquet reader rejects outright; we read nanos as long
    (dynamic SQL conf) and convert to a microsecond timestamp — `div 1000`
    floors, matching DuckDB's ns→µs cast of the same file.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
