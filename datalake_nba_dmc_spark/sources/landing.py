"""Landing-layer readers: CSV / JSON-lines ingest with schema control.

The reference's landing tables are crawler-cataloged text files (string
dates, ``fg%``-style headers — SURVEY.md §2.1) read through the Glue
catalog. Open equivalent: explicit-schema CSV/JSON readers. Schema-on-read
rules for 100 TB ingest:

- Explicit ``StructType`` beats ``inferSchema`` (inference is an extra full
  pass over the data and can flip types between runs).
- ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` quarantines bad rows
  into a column instead of failing the job (reference has no bad-row story).
- Non-identifier headers (``fg%``, ``+/-``, ``3p``) are legal in Spark
  column names; conform.rename_columns normalizes them downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    quarantine_corrupt: bool = False,
) -> DataFrame:
    r = (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)  # small/interactive only
    if quarantine_corrupt:
        r = r.option("columnNameOfCorruptRecord", "_corrupt_record")
    return r.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    quarantine_corrupt: bool = False,
) -> DataFrame:
    r = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        r = r.schema(schema)
    if quarantine_corrupt:
        r = r.option("columnNameOfCorruptRecord", "_corrupt_record")
    return r.json(path)


def read_evolving(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Read a table directory whose files were written under DIFFERENT
    schema versions (columns added over time — the normal life of a landing
    zone). ``mergeSchema`` unions the per-file schemas: rows from files
    predating a column surface it as NULL, so downstream conforms
    (rename/cast/derive) see one stable wide schema instead of failing on
    the first old file.

    Scale note: schema merging reads FOOTERS of all files (distributed in
    Spark), not data; the cost is per-file metadata, so keep file counts
    sane with compact(). Type CHANGES on an existing column (even int→long)
    are a merge CONFLICT and fail fast — Parquet schema merging only unions
    columns; widening a type is a rewrite (conform.safe_downcast_longs'
    inverse), not a read option, and silently coercing would paper over a
    pipeline bug."""
    return spark.read.option("mergeSchema", "true").format(fmt).load(path)
