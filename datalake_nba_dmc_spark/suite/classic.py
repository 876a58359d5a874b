"""Classic warehouse queries (TPC-H-shaped q1/q3/q5 equivalents).

The reference's marts are all single-fact aggregates; these three add the
canonical multi-join analytics shapes a switching user would expect from an
engine — scan-heavy agg (q1), selective join + top-k (q3), and a five-table
star join (q5) — each oracle-checked and each a plan-quality probe:
predicate pushdown to the Parquet scan, broadcast of every dimension,
AQE-coalesced shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query
from datalake_nba_dmc_spark.suite.parity import _exact_sum, _osum


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           ({_osum('l_quantity')}) / COUNT(*) AS avg_qty,
           ({_osum('l_discount')}) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 shape: one filtered scan → 2-key hash agg with 7 measures. The
    shipdate predicate must reach the Parquet scan (PushedFilters); the agg
    is partial+final with map-side combine — the canonical 100 TB
    scan-bound query."""
    li = TableRegistry(spark, sf_dir).lineitem.filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _exact_sum(F.col("l_quantity"), "sum_qty"),
        _exact_sum(F.col("l_extendedprice"), "sum_base_price"),
        _exact_sum(disc_price, "sum_disc_price"),
        _exact_sum(charge, "sum_charge"),
        (
            (F.sum(F.round(F.col("l_quantity") * 10000).cast("long")) / 10000.0)
            / F.count("*")
        ).alias("avg_qty"),
        (
            (F.sum(F.round(F.col("l_discount") * 10000).cast("long")) / 10000.0)
            / F.count("*")
        ).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 shape: selective dimension filter → two fact joins → agg → global
    top-10. Customer (filtered) broadcasts into orders; both date predicates
    push to the scans; the final top-k is a TakeOrdered, not a full sort."""
    t = TableRegistry(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 shape: five-table star join with a region filter. Every dimension
    (region→nation→customer path, supplier) broadcasts; only the two fact
    tables shuffle. The c_nationkey = s_nationkey condition rides the
    supplier join as an extra equi-key."""
    t = TableRegistry(spark, sf_dir)
    nation = t.nation.join(
        F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
        t.nation.n_regionkey == t.region.r_regionkey,
    ).select("n_nationkey", "n_name")
    cust = t.customer.join(
        F.broadcast(nation), t.customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    oc = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    joined = li.join(oc, li.l_orderkey == oc.o_orderkey).join(
        F.broadcast(t.supplier),
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
