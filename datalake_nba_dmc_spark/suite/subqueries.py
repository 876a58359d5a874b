"""Subquery & selective-join warehouse queries (TPC-H q4/q6/q10/q14/q15/
q17/q18/q19/q22 shapes).

The reference's only join family is left-outer equi (SURVEY.md §2.5); a
switching user of a real analytics engine also runs EXISTS / NOT EXISTS /
scalar correlated subqueries and disjunctive join predicates. Catalyst
plans all of these from the DataFrame API (semi/anti joins, decorrelated
scalar aggregates) with no custom rules — each query documents the plan it
must produce at 100 TB.

Determinism: all money sums use the scaled-long exact-sum idiom
(suite/parity.py `_exact_sum`); scalar thresholds derived from data (avgs)
are computed from exact integer sums so both engines compare against the
bit-identical double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query
from datalake_nba_dmc_spark.suite.parity import _exact_sum, _osum


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {_osum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 shape: pure scan-bound filter + global agg, no shuffle of data —
    only a single-row partial-agg exchange. All three predicates must reach
    the Parquet scan (PushedFilters on l_shipdate/l_discount/l_quantity);
    at 100 TB this is the min-max-skipping showcase query."""
    li = TableRegistry(spark, sf_dir).lineitem
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        _exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: EXISTS → left-semi join (reference has no semi joins;
    SURVEY.md §2.5 'absent'). The semi join shuffles both sides on
    l_orderkey but emits each order at most once — no row multiplication,
    and lineitem is pruned to (l_orderkey, l_shipdate) at the scan."""
    t = TableRegistry(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: fact-fact join + two broadcast dims + top-20 by revenue.
    The returnflag and date predicates push to the scans; the final top-k
    is TakeOrdered (no global sort materialization). Ties broken by
    c_custkey so the LIMIT frontier is deterministic."""
    t = TableRegistry(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t.customer.join(
        F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * ({_osum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
           / ({_osum('l_extendedprice * (1 - l_discount)')}) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: conditional aggregation over a broadcast dim join —
    sum(CASE WHEN)/sum ratio in one pass. part broadcasts (it's a dim);
    lineitem is pruned to 4 columns and date-filtered at the scan. The
    ratio of two exact integer-scaled sums is bit-deterministic."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(t.part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return joined.agg(
        (
            100.0
            * (F.sum(F.round(promo * 10000).cast("long")) / 10000.0)
            / (F.sum(F.round(rev * 10000).cast("long")) / 10000.0)
        ).alias("promo_revenue")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_osum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: scalar subquery over a derived aggregate (argmax by equality
    with MAX). The revenue agg shuffles once on l_suppkey (100 keys);
    the MAX is a window over the unpartitioned agg output — tiny (#suppliers
    rows), so the single-partition window is safe at any scale because it
    runs AFTER the reduction, never on raw fact rows."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    top = revenue.join(
        F.broadcast(max_rev), revenue.total_revenue == max_rev.mr
    ).select("supplier_no", "total_revenue")
    return (
        t.supplier.join(F.broadcast(top), F.col("s_suppkey") == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT ({_osum('l_extendedprice')}) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: correlated scalar aggregate subquery (per-part avg
    quantity). The avg is ONLY needed for the brand's parts, so lineitem is
    first reduced by a broadcast join with the filtered part keys (a tiny
    dim selection), and the per-part threshold is computed as an
    unbounded window over l_partkey on the surviving rows — ONE shuffle of
    the brand-filtered fact rows, one lineitem scan, and no aggregate over
    all partkeys is ever built or broadcast (an all-parts aggregate is
    hundreds of millions of rows at scale — a guaranteed broadcast OOM).
    Quantities are integral doubles, so SUM(long)/COUNT is exact in both
    engines."""
    t = TableRegistry(spark, sf_dir)
    brand_parts = t.part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    li_brand = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    threshold = 0.2 * (
        F.sum(F.col("l_quantity").cast("long")).over(w) / F.count(F.lit(1)).over(w)
    )
    joined = li_brand.withColumn("qty_threshold", threshold).filter(
        F.col("l_quantity") < F.col("qty_threshold")
    )
    return joined.agg(
        (
            (F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long")) / 10000.0)
            / 7.0
        ).alias("avg_yearly")
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: IN over a HAVING-filtered aggregate → semi join of orders
    against a reduced key set. The inner agg reduces lineitem to order keys
    (map-side combine), the surviving keys semi-join orders, then the outer
    re-agg groups the joined rows. Two shuffles on l_orderkey — AQE reuses
    the exchange where possible."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    orders = t.orders.join(
        big_orders, t.orders.o_orderkey == big_orders.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(t.customer.select("c_custkey", "c_name")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("double").alias("total_qty")
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: disjunctive mixed-table predicates over a broadcast join.
    Catalyst extracts the common l_partkey=p_partkey equi-key and keeps the
    OR-of-ANDs as a post-join filter; the single-table parts of the
    disjunction (quantity ranges, brand/size) are pushed below the join as
    an OR-union filter on each side — verify with .explain."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = t.part.select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    return joined.filter(cond).agg(
        _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT (CAST(SUM(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / 100.0) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: uncorrelated scalar-avg subquery + NOT EXISTS → left-anti
    join. The global avg reduces customer to one row (broadcast as a
    literal-like 1-row join); the anti join shuffles on custkey — at scale,
    orders projected to its join key only. Avg built from exact cent sums
    so the threshold double is bit-identical across engines."""
    t = TableRegistry(spark, sf_dir)
    cust = t.customer
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0)
            / F.count("*")
        ).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    recent = t.orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0).alias(
            "totacctbal"
        ),
    )
