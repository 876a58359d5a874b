"""Tests: salted agg/join semantics + bucketed-write shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.skew import salted_agg, salted_join
from datalake_nba_dmc_spark.sinks import write_bucketed


def test_salted_agg_matches_plain(spark):
    # one hot key: 5000 rows of "hot", few of others
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(5000)] + [("cold", 1), ("cool", 2)],
        ["k", "v"],
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], [("v", "sum", "total"), ("v", "count", "n"), ("v", "max", "mx")]
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(3000)] + [("x", 1), ("orphan", 2)], ["k", "lv"]
    )
    right = spark.createDataFrame([("hot", 10), ("x", 20), ("unused", 30)], ["k", "rv"])
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in salted_join(left, right, "k", how=how).collect()
        )
        want = sorted(
            (r["k"], r["lv"], r["rv"]) for r in left.join(right, on="k", how=how).collect()
        )
        assert got == want


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("w", F.col("id") + 1)
    write_bucketed(a, "bk_a", ["id"], num_buckets=8, sort_cols=["id"])
    write_bucketed(b, "bk_b", ["id"], num_buckets=8, sort_cols=["id"])
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), on="id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # bucketing satisfied dist
        assert joined.count() == 10000
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
