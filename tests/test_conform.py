"""Unit tests: conform operators (P1/P2/P4/P5, X1–X8, safe downcast)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from datalake_nba_dmc_spark.operators.conform import (
    INT32_MAX,
    INT32_MIN,
    drop_columns,
    parse_date,
    parse_date_null_guarded,
    rename_columns,
    safe_downcast_longs,
    split_mmss,
    with_derived,
)


def test_drop_columns(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    assert drop_columns(df, ["b", "c"]).columns == ["a"]


def test_rename_columns_weird_source_names(spark):
    # the reference renames `3p`, `+/-`, `fg%`-style crawler headers
    df = spark.createDataFrame([(1, 2, 3)], ["3p", "+/-", "ok"])
    out = rename_columns(df, {"3p": "three_pt", "+/-": "plus_minus"})
    assert out.columns == ["three_pt", "plus_minus", "ok"]
    assert out.first()[:3] == (1, 2, 3)


def test_with_derived(spark):
    df = spark.createDataFrame([(2, "a", "b")], ["m", "x", "y"])
    out = with_derived(
        df,
        seconds=F.col("m") * 60,
        full=F.concat_ws(" ", "x", "y"),
    )
    row = out.first()
    assert row["seconds"] == 120 and row["full"] == "a b"


def test_safe_downcast_boundaries(spark):
    df = spark.createDataFrame(
        [(INT32_MAX, INT32_MAX + 1, INT32_MIN, None)],
        "fits long, too_big long, fits_min long, all_null long",
    )
    out = safe_downcast_longs(df)
    types = dict(out.dtypes)
    assert types["fits"] == "int"          # == 2^31-1 is safe
    assert types["too_big"] == "bigint"    # 2^31 must stay long
    assert types["fits_min"] == "int"      # symmetric min bound
    assert types["all_null"] == "bigint"   # unknowable → stay long


def test_safe_downcast_no_long_cols_is_noop(spark):
    df = spark.createDataFrame([("a",)], ["s"])
    assert safe_downcast_longs(df) is df


def test_parse_date_reference_formats(spark):
    df = spark.createDataFrame([("Mar 04, 2021", "2021-03-04T10:30:00")], ["g", "b"])
    out = df.select(
        parse_date("g", "MMM dd, yyyy").alias("g"),
        parse_date("b", "yyyy-MM-dd'T'HH:mm:ss").alias("b"),
    ).first()
    assert out["g"] == datetime.date(2021, 3, 4)
    assert out["b"] == datetime.date(2021, 3, 4)


def test_parse_date_null_guarded(spark):
    df = spark.createDataFrame([("Mar 04, 2021",), (None,)], ["d"])
    out = df.select(parse_date_null_guarded("d", "MMM dd, yyyy").alias("d")).collect()
    assert out[0]["d"] == datetime.date(2021, 3, 4)
    assert out[1]["d"] is None


def test_split_mmss(spark):
    mins, secs = split_mmss("mp")
    df = spark.createDataFrame([("34:56",)], ["mp"])
    row = df.select(mins.alias("m"), secs.alias("s")).first()
    assert (row["m"], row["s"]) == (34, 56)
    schema = df.select(mins.alias("m"), secs.alias("s")).schema
    assert isinstance(schema["m"].dataType, IntegerType)


def test_union_evolved_aligns_by_name_and_nullfills(spark):
    from datalake_nba_dmc_spark.operators.conform import union_evolved

    old = spark.createDataFrame([(1, 10.0)], ["id", "amount"])
    # evolved snapshot: new column added AND column order changed
    new = spark.createDataFrame(
        [("x", 2, 20.0)], ["tag", "id", "amount"]
    )
    out = union_evolved(old, new)
    got = {r["id"]: (r["amount"], r["tag"]) for r in out.collect()}
    assert got == {1: (10.0, None), 2: (20.0, "x")}
