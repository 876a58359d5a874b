"""Skew-mitigation queries — oracle-checked proof that the salted physical
forms preserve exact semantics (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.skew import salted_agg, salted_join
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
             AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregate over a genuinely hot grouping (3 return
    flags across the whole fact table → each key is 1/3 of all rows). The
    salt spreads each key over 8 reducers in phase 1; phase 2 merges
    partials. Value-hash must equal the plain GROUP BY oracle."""
    li = (
        TableRegistry(spark, sf_dir)
        .lineitem.withColumn(
            "qty_scaled", F.round(F.col("l_quantity") * 10000).cast("long")
        )
        # counted column must be non-null: count(qty_scaled) would skip
        # NULL-quantity rows where the oracle's COUNT(*) counts them
        .withColumn("_one", F.lit(1))
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        [("qty_scaled", "sum", "qty_scaled_sum"), ("_one", "count", "n_rows")],
        salt_factor=8,
    )
    return out.select(
        "l_returnflag",
        (F.col("qty_scaled_sum") / 10000.0).alias("sum_qty"),
        F.col("n_rows"),
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT l.l_orderkey AS okey, l.l_linenumber, l.l_quantity, o.o_orderpriority
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted left equi-join (left side salted, right side replicated ×8) —
    the hot-key join form for when the right side can't broadcast. Must be
    row-identical to the plain LEFT JOIN oracle."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.select(
        F.col("l_orderkey").alias("okey"), "l_linenumber", "l_quantity"
    )
    orders = t.orders.select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    return salted_join(li, orders, on="okey", how="left", salt_factor=8)
