"""Unit tests: landing readers (CSV/JSONL) and the events ns-timestamp fix."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datalake_nba_dmc_spark.sources import TableRegistry, load_table
from datalake_nba_dmc_spark.sources.landing import read_csv, read_jsonl

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


def test_read_csv_weird_headers_and_schema(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text('player,fg%,+/-,3p\nCurry,0.5,12,5\nJames,0.6,-3,1\n')
    schema = StructType(
        [
            StructField("player", StringType()),
            StructField("fg%", StringType()),
            StructField("+/-", IntegerType()),
            StructField("3p", IntegerType()),
        ]
    )
    df = read_csv(spark, str(p), schema=schema)
    assert df.columns == ["player", "fg%", "+/-", "3p"]
    rows = {r["player"]: r for r in df.collect()}
    assert rows["James"]["+/-"] == -3


def test_read_csv_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nNOT JSON\n{"a": 3}\n')
    schema = StructType(
        [StructField("a", LongType()), StructField("_corrupt_record", StringType())]
    )
    df = read_jsonl(spark, str(p), schema=schema, quarantine_corrupt=True)
    out = df.collect()
    assert len(out) == 3
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["a"] is None


@needs_testdata
def test_events_ts_reads_as_timestamp(spark):
    ev = load_table(spark, SF0001, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    first = ev.orderBy("event_id").first()
    # driver writes deterministic seed=42 data starting 2024-01-01
    assert first["ts"].year == 2024


@needs_testdata
def test_registry_attribute_access_and_views(spark):
    t = TableRegistry(spark, SF0001)
    assert t.customer.count() > 0
    t.register_views(("customer",))
    assert spark.sql("SELECT COUNT(*) c FROM customer").first()["c"] == t.customer.count()
    with pytest.raises(AttributeError):
        t.nonexistent_table


def test_read_evolving_merges_added_columns(spark, tmp_path):
    """Files written under old (k,v) and new (k,v,extra) schemas read as
    one table: old rows surface extra as NULL. A type CHANGE on an
    existing column must fail fast (schema merging unions columns, never
    coerces types)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from datalake_nba_dmc_spark.sources.landing import read_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, 10)], "k int, v int").write.parquet(path)
    spark.createDataFrame(
        [(2, 20, "new")], "k int, v int, extra string"
    ).write.mode("append").parquet(path)

    df = read_evolving(spark, path)
    assert set(df.columns) == {"k", "v", "extra"}
    rows = {r.k: (r.v, r.extra) for r in df.collect()}
    assert rows == {1: (10, None), 2: (20, "new")}
    # conform sees one stable schema: old rows filter cleanly on the new col
    assert df.filter(F.col("extra").isNull()).count() == 1

    # incompatible type drift is surfaced, not silently coerced
    conflict = str(tmp_path / "conflict")
    spark.createDataFrame([(1, 10)], "k int, v int").write.parquet(conflict)
    spark.createDataFrame([(2, "oops")], "k int, v string").write.mode(
        "append"
    ).parquet(conflict)
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS|merg"):
        read_evolving(spark, conflict).collect()
