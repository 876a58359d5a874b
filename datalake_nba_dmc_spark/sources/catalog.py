"""Persistent catalog layer: CREATE DATABASE + saveAsTable registry mode.

The reference organizes every layer as a Glue Data Catalog *database* —
``db_landing`` / ``db_bronze`` / ``db_silver`` — and jobs address tables as
``(database, table_name)``, never as paths (reference
``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:22-37``). This
module completes that mapping (SURVEY.md §1.5) on Spark's session catalog:
a database per medallion layer, external tables whose data lives at the
same layer paths the path-based registry uses, so both addressing modes
see identical bytes.

Scale note: the session catalog here is in-memory (no Hive metastore jar
in the sandbox); on a cluster the identical calls target a Hive/Glue
metastore or a Delta/Iceberg catalog — the API below is what survives that
swap. External-location tables are used throughout so dropping/recreating
metadata never moves 100 TB of data.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid catalog identifier: {name!r}")
    return name


def ensure_database(spark: SparkSession, db: str, location: str | None = None) -> None:
    """CREATE DATABASE IF NOT EXISTS, optionally rooted at an explicit
    location (so nothing writes under the session's default warehouse dir,
    which may not be writable where the driver runs)."""
    _check_ident(db)
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}{loc}")


def save_catalog_table(
    df: DataFrame,
    db: str,
    name: str,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
) -> None:
    """K1/K2 through the catalog: overwrite a named table. With ``path``
    the table is EXTERNAL (metadata points at the layer directory); without
    it the data lands under the database location."""
    _check_ident(db), _check_ident(name)
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(f"{db}.{name}")


def read_catalog_table(spark: SparkSession, db: str, name: str) -> DataFrame:
    """S1–S6 through the catalog: ``spark.table`` resolves the scan through
    catalog metadata (statistics, bucketing, partitions) instead of a raw
    path listing."""
    return spark.table(f"{_check_ident(db)}.{_check_ident(name)}")


def list_layer_tables(spark: SparkSession, db: str) -> list[str]:
    return [t.name for t in spark.catalog.listTables(_check_ident(db))]
