"""Unit tests for the scalar-function builders (functions/scalars.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.functions import (
    array_scalar_features,
    date_parts,
    null_semantics,
    string_features,
)


def _one(df):
    return df.collect()[0].asDict()


def test_date_parts_known_date(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2001, 1, 7, 15, 30),)], "ts timestamp"
    )
    row = _one(df.select(*[c.alias(n) for n, c in date_parts(F.col("ts")).items()]))
    assert row == {
        "year": 2001, "quarter": 1, "month": 1, "day": 7,
        "dow": 0,  # 2001-01-07 was a Sunday; normalized 0-based
        "doy": 7,
        "month_start": "2001-01-01", "month_end": "2001-01-31",
        "plus_week": "2001-01-14",
    }


def test_string_features_known_value(spark):
    df = spark.createDataFrame([("Customer#000000042",)], "s string")
    row = _one(df.select(*[c.alias(n) for n, c in string_features(F.col("s")).items()]))
    assert row["upper"] == "CUSTOMER#000000042"
    assert row["sub"] == "000000"
    assert row["lpadded"] == "......Customer#000000042"
    assert row["replaced"] == "Customer#042"
    assert row["digits"] == "000000042"
    assert row["pos_zero"] == 10
    assert row["lev"] == 10  # '#000000042' appended → 10 edits
    assert row["n_chars"] == 18


def test_null_semantics_three_valued_logic(spark):
    df = spark.createDataFrame([("O",), ("F",), (None,)], "s string")
    rows = df.select(
        *[c.alias(n) for n, c in null_semantics(F.col("s"), "O").items()]
    ).collect()
    got = [(r.maybe_null, r.filled, r.is_sentinel) for r in rows]
    # NULL input: NULLIF(NULL,'O') is NULL → is_sentinel TRUE, never NULL
    assert got == [(None, "(none)", True), ("F", "F", False), (None, "(none)", True)]
    assert all(r.is_sentinel is not None for r in rows)


def test_array_scalar_features(spark):
    df = spark.createDataFrame([(["b", "a", "the", "a"],)], "arr array<string>")
    row = _one(
        df.select(*[c.alias(n) for n, c in array_scalar_features(F.col("arr")).items()])
    )
    assert row == {
        "n_items": 4, "first_sorted": "a", "last_sorted": "the",
        "has_the": True, "n_distinct_items": 3,
    }
