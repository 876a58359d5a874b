"""Wide multi-join warehouse queries (TPC-H q2/q7/q8/q9/q11/q12/q13/q16/
q20/q21 shapes) — completing the classic 22-query surface next to
suite/subqueries.py (q4/q6/q10/q14/q15/q17/q18/q19/q22) and
suite/classic.py (q1/q3/q5).

The driver's star schema has no ``partsupp`` table and lineitem carries no
commit/receipt dates or ship mode, so the five partsupp-dependent queries
and the date-arithmetic filters are ADAPTED: identical plan shape
(correlated min subquery, global-share threshold, NOT IN exclusion, nested
IN over a correlated aggregate, double EXISTS/NOT EXISTS self-reference),
with the per-(part,supplier) supply relation derived from lineitem and
"late" defined as shipping >N days after the order date. Each docstring
names the original it mirrors.

Determinism: money sums use the scaled-long exact-sum idiom
(suite/parity.py `_exact_sum`); quantity sums cast to long first
(quantities are integral doubles); share/threshold doubles derive from
exact integer sums so both engines compare bit-identical values; year()
is cast to long to match EXTRACT's BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query
from datalake_nba_dmc_spark.suite.parity import _exact_sum, _osum


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), cand AS (
      SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
      FROM offers
      JOIN part ON p_partkey = l_partkey
      JOIN eu ON s_suppkey = l_suppkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
    FROM cand c
    WHERE unit_cost = (
      SELECT MIN(unit_cost) FROM cand c2 WHERE c2.p_partkey = c.p_partkey
    )
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: correlated MIN subquery choosing, per part, the
    region-local supplier with the lowest supply cost. No partsupp table
    exists, so the supply relation is derived: per (l_partkey, l_suppkey)
    the minimum observed unit price. Plan: ONE shuffle of 3-column lineitem
    to build the offers agg (map-side combine), broadcast joins against
    the filtered part selection and the tiny supplier⋈nation⋈region dim,
    then the correlated MIN as a window over p_partkey on the already-small
    candidate set — the window never sees raw fact rows, so it holds at
    100 TB. MIN of identical IEEE doubles is bit-deterministic."""
    t = TableRegistry(spark, sf_dir)
    offers = (
        t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu = (
        t.supplier.join(
            F.broadcast(t.nation), t.supplier.s_nationkey == t.nation.n_nationkey
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t.part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    cand = offers.join(F.broadcast(parts), offers.l_partkey == parts.p_partkey).join(
        F.broadcast(eu), offers.l_suppkey == eu.s_suppkey
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: two-nation trade volume by year — the same dimension table
    joined twice under different roles with a disjunctive cross-role
    predicate. Plan: the nation pair filter lands on the two broadcast dim
    joins (supplier and customer each pre-joined to their nation and
    REDUCED before touching facts); lineitem⋈orders is the only fact-fact
    shuffle; the final agg groups ~2×#years rows."""
    t = TableRegistry(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    supp = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name").isin(*pair))),
            t.supplier.s_nationkey == t.nation.n_nationkey,
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t.customer.join(
            F.broadcast(t.nation.filter(F.col("n_name").isin(*pair))),
            t.customer.c_nationkey == t.nation.n_nationkey,
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(t.orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(_exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           ({_osum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
           / ({_osum('l_extendedprice * (1 - l_discount)')}) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: national market share — a conditional-sum ratio over an
    8-table join with the dimension table in two roles. Plan: part/customer
    -nation-region/supplier-nation are all broadcast dims (part filtered to
    one type BEFORE the join, customers reduced to one region); the only
    fact-fact shuffle is lineitem⋈orders; the share divides two exact
    scaled-long sums so it is bit-identical across engines."""
    t = TableRegistry(spark, sf_dir)
    parts = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_cust = (
        t.customer.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                    t.nation.n_regionkey == t.region.r_regionkey,
                ).select("n_nationkey")
            ),
            t.customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp = t.supplier.join(
        F.broadcast(t.nation), t.supplier.s_nationkey == t.nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        (
            (F.sum(F.round(target * 10000).cast("long")) / 10000.0)
            / (F.sum(F.round(rev * 10000).cast("long")) / 10000.0)
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
           {_osum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01')} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape: profit by supplier nation and year over a LIKE-filtered
    part family. No partsupp.ps_supplycost exists, so cost is modeled as
    1% of retail price per unit (p_retailprice * l_quantity * 0.01) —
    same expression structure (mixed columns from two tables inside one
    aggregated measure). Plan: part filtered by the LIKE before its
    broadcast join; supplier⋈nation broadcast; ONE aggregation shuffle of
    (nation, year) — the LIKE prunes at the dim, never a full-fact regex."""
    t = TableRegistry(spark, sf_dir)
    parts = t.part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = t.supplier.join(
        F.broadcast(t.nation), t.supplier.s_nationkey == t.nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    li = t.lineitem.select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    joined = li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey")).join(
        F.broadcast(supp), li.l_suppkey == supp.s_suppkey
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.01
    )
    return joined.groupBy(
        "nation", F.year("l_shipdate").cast("long").alias("o_year")
    ).agg(_exact_sum(profit, "sum_profit"))


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      -- ASIA-supplier MEMBERSHIP (IN), not inner joins: the Spark plan
      -- semi-joins, so duplicated dimension rows must not multiply the
      -- lineitem contributions (dup robustness audit)
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * l_quantity * 10000) AS BIGINT))
               AS value_l
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey IN (
            SELECT r_regionkey FROM region WHERE r_name = 'ASIA')))
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_l AS DOUBLE) / 10000.0 AS part_value
    FROM val
    WHERE value_l > 0.001 * (SELECT SUM(value_l) FROM val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: per-key value filtered against a FRACTION OF THE GLOBAL
    TOTAL (uncorrelated scalar subquery over the same aggregate). Stock
    value is derived from lineitem (price×qty shipped by ASIA suppliers)
    in place of partsupp. Plan: one agg shuffle on l_partkey builds the
    value table ONCE; the global total re-aggregates the (already tiny)
    agg output and broadcasts one row back — the value table is NOT
    recomputed, and the threshold compares exact scaled-long sums (the
    partial-agg order can never flip a ULP)."""
    t = TableRegistry(spark, sf_dir)
    asia_supp = (
        t.supplier.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                    t.nation.n_regionkey == t.region.r_regionkey,
                ).select("n_nationkey")
            ),
            t.supplier.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    li = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_quantity") * 10000).cast(
                    "long"
                )
            ).alias("value_l")
        )
    )
    total = val.agg(F.sum("value_l").alias("total_l"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_l") > 0.001 * F.col("total_l"))
        .select(
            "l_partkey",
            (F.col("value_l").cast("double") / 10000.0).alias("part_value"),
        )
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape: priority-class pivot over late shipments. The schema has
    no ship mode or commit/receipt dates, so the group key is l_linestatus
    and "late" is shipping >90 days after the order date (a cross-table
    date-arithmetic predicate, like the original's receipt>commit). Plan:
    the year filter pushes to the lineitem scan; the lateness predicate
    evaluates post-join (it references both sides); one shuffle for the
    join (AQE may broadcast the filtered year slice), one tiny pivot agg.
    The conditional counts sum 0/1 longs — exact."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: distribution of per-customer order counts — a left outer
    join with a filter INSIDE the join condition (customers with zero
    matching orders must still appear with count 0), then two cascaded
    aggregations. The original filters o_comment by NOT LIKE; no comment
    column exists, so the in-join predicate is on o_orderpriority. Plan:
    filter applied to orders BEFORE the join (equivalent for left joins),
    one join shuffle on custkey, first agg reuses that partitioning
    (no second exchange), final agg over ≤#distinct-counts rows."""
    t = TableRegistry(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.select("c_custkey")
        .join(o, t.customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: supplier diversity per part attribute triple with a
    NOT IN supplier exclusion. The supply relation is derived from lineitem
    (no partsupp); the original's complaint-comment exclusion becomes a
    deterministic key predicate. Plan: NOT IN on a non-nullable key →
    broadcast left-anti join (never a shuffled NAAJ); part attribute
    filters land on the broadcast dim; exact COUNT(DISTINCT) expands
    (triple, suppkey) pairs in one shuffle — bounded by #parts×#suppliers,
    and the two-phase preagg variant (aggregates.py:80) is the drop-in if
    that product ever dominates."""
    t = TableRegistry(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t.supplier.filter(F.col("s_suppkey") % 7 == 0).select("s_suppkey")
    li = t.lineitem.select("l_partkey", "l_suppkey")
    joined = li.join(
        F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti"
    ).join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      GROUP BY l_partkey, l_suppkey
    ), big AS (
      SELECT DISTINCT l_suppkey FROM shipped s
      WHERE qty > 1.5 * (
        SELECT CAST(SUM(qty) AS DOUBLE) / COUNT(*)
        FROM shipped s2 WHERE s2.l_partkey = s.l_partkey
      )
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (SELECT l_suppkey FROM big)
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: nested IN chain — suppliers IN (those whose shipped
    volume of some name-filtered part exceeds a correlated per-part
    threshold), with the part set itself an IN subquery. The original's
    ps_availqty vs shipped-volume test becomes a supplier-share test (both:
    a per-(part,supplier) quantity against a correlated per-part
    aggregate; here the threshold is 1.5x the per-part mean supplier
    share, which stays non-degenerate at every scale factor). Plan: the
    part LIKE reduces at the dim and semi-joins the fact BEFORE any
    aggregation; one agg shuffle on (partkey, suppkey); the correlated
    mean is a window over l_partkey on the agg output (already reduced —
    never raw rows); the final IN is a broadcast semi join into the tiny
    region-filtered supplier dim. Quantity sums are long-exact, so the
    mean is one division of exact integers — bit-identical across
    engines."""
    t = TableRegistry(spark, sf_dir)
    blue_parts = t.part.filter(F.col("p_name").like("blue%")).select("p_partkey")
    li = t.lineitem.select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(blue_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    mean_share = F.sum("qty").over(w) / F.count(F.lit(1)).over(w)
    big = (
        shipped.withColumn("mean_qty", mean_share)
        .filter(F.col("qty") > 1.5 * F.col("mean_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t.supplier.join(
            F.broadcast(t.nation), t.supplier.s_nationkey == t.nation.n_nationkey
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "AFRICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(big), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ), late AS (
      SELECT * FROM base WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM base l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: the hardest classic — EXISTS and NOT EXISTS against the
    SAME fact under different predicates (suppliers who were the sole late
    shipper in a multi-supplier finished order). "Late" is shipping >60
    days after the order date (no receipt/commit dates in this schema).
    Plan: base = lineitem⋈orders('F') built once; the EXISTS is a
    left-semi and the NOT EXISTS a left-anti join, both on the l_orderkey
    equi-key with the suppkey inequality as a residual — shuffled hash
    joins, no row multiplication, no correlated re-execution per row.
    Top-100 with (numwait, s_name) tiebreak is TakeOrdered."""
    t = TableRegistry(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    o = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = base.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    l2 = base.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    l1 = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        l1.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            l1.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )
