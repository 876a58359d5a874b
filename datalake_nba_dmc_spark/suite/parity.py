"""Parity queries — one per reference operator inventory row (SURVEY.md §2).

Reference semantics are transposed from the NBA star schema onto the
driver's TPC-H-ish tables per FIXTURES.md's mapping (gamelogs→lineitem/
orders, season→customer/nation, teams→supplier/region). Citations in each
query point at the reference call-site whose semantics it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import aggregates as agg
from datalake_nba_dmc_spark.operators import conform, joins, windows
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.operators.sampling import duck_key_hash
from datalake_nba_dmc_spark.suite import query


def _exact_sum(col: Column, alias: str) -> Column:
    """Sum a money-style double column exactly and fast: per-row scale to
    10^-4 units and round to long (the row value is engine-independent IEEE
    arithmetic, so both engines round identical doubles), sum as integers
    (associative → partial-agg order irrelevant), divide back once. Pure
    codegen'd long ops — measured 1.8× faster than the decimal(18,4)-cast
    equivalent at 600 K rows while staying bit-identical to the oracle."""
    return (F.sum(F.round(col * 10000).cast("long")) / 10000.0).alias(alias)


def _osum(expr: str) -> str:
    """DuckDB oracle counterpart of ``_exact_sum``."""
    return f"CAST(SUM(CAST(round(({expr}) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0"


# ---------------------------------------------------------------------------
# Flagship — the reference's signature shape W1+A3+J4 (+J1 dimension join):
# "career totals per player + latest team" → "order totals per customer +
# latest order" (reference aws-job-silver-to-gold-player/
# aws-job-silver-to-gold-player.py:37-75).
# ---------------------------------------------------------------------------


@query(
    "flagship_customer_resume",
    oracle=f"""
    WITH totals AS (
      SELECT o_custkey AS custkey,
             {_osum('o_totalprice')} AS total_spend,
             COUNT(o_orderkey) AS num_orders,
             COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
      FROM orders GROUP BY o_custkey
    ), latest AS (
      SELECT custkey, latest_orderkey, latest_priority FROM (
        SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
               o_orderpriority AS latest_priority,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
    )
    SELECT t.custkey, c.c_name, c.c_mktsegment, t.total_spend, t.num_orders,
           t.active_days, l.latest_orderkey, l.latest_priority
    FROM totals t
    LEFT JOIN latest l USING (custkey)
    LEFT JOIN customer c ON t.custkey = c.c_custkey
    """,
)
def flagship_customer_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → agg (A3) → window top-1 (W1) → USING-join (J4) → dim join (J1).

    One vertical slice through every operator category the reference uses
    (SURVEY.md §7.1). ``customer`` is broadcast — it is the small dimension;
    the two fact-side shuffles share the ``o_custkey`` key so AQE can reuse
    the exchange.
    """
    t = TableRegistry(spark, sf_dir)
    orders, customer = t.orders, t.customer
    totals = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        _exact_sum(F.col("o_totalprice"), "total_spend"),
        F.count("o_orderkey").alias("num_orders"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("active_days"),
    )
    latest = windows.top1_per_group(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderpriority").alias("latest_priority"),
    )
    resume = joins.left_join(totals, latest, on="custkey")
    resume = joins.left_join(
        resume, customer, on=resume.custkey == customer.c_custkey, broadcast_right=True
    )
    return resume.select(
        "custkey", "c_name", "c_mktsegment", "total_spend", "num_orders",
        "active_days", "latest_orderkey", "latest_priority",
    )


# ---------------------------------------------------------------------------
# P* — projections / column ops
# ---------------------------------------------------------------------------


@query(
    "p1_project_prune",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
)
def p1_project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — column drop/prune (reference ...landing-to-bronze.py:47).

    Expressed as drop-of-complement so Catalyst prunes the Parquet scan to
    exactly four columns (check ReadSchema in .explain)."""
    li = TableRegistry(spark, sf_dir).lineitem
    keep = {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"}
    return conform.drop_columns(li, [c for c in li.columns if c not in keep])


@query(
    "p2_bulk_rename",
    oracle="""
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           l_quantity AS qty, l_returnflag AS return_flag
    FROM lineitem
    """,
)
def p2_bulk_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — bulk rename incl. non-identifier names (reference
    ...bronze-to-silver.py:46-106 renames `3p`, `+/-`, Spanish headers).

    A messy header (`qty%`) is synthesized then renamed through the
    backtick-safe single-projection path."""
    li = TableRegistry(spark, sf_dir).lineitem
    messy = li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity").alias("qty%"),
        F.col("l_returnflag").alias("+/-"),
    )
    return conform.rename_columns(
        messy,
        {"l_orderkey": "order_id", "l_linenumber": "line_no", "qty%": "qty", "+/-": "return_flag"},
    )


@query(
    "p4p5_derived_columns",
    oracle="""
    SELECT c_custkey,
           CONCAT_WS(' ', c_name, c_mktsegment) AS customer_tag,
           c_acctbal * 100 AS acctbal_cents
    FROM customer
    """,
)
def p4p5_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 arithmetic (reference ...bronze-to-silver.py:90 `minutes*60`) +
    P5 concat_ws key (:199 `team_full_name`). Single double multiply is
    IEEE-deterministic, so no decimal dance needed."""
    c = TableRegistry(spark, sf_dir).customer
    return conform.with_derived(
        c.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
        customer_tag=F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment")),
        acctbal_cents=F.col("c_acctbal") * 100,
    ).select("c_custkey", "customer_tag", "acctbal_cents")


# ---------------------------------------------------------------------------
# F* — filters
# ---------------------------------------------------------------------------


@query(
    "f1_filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def f1_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — equality filter (reference ...silver-to-gold-player.py:41);
    pushed to the Parquet scan (PushedFilters in .explain)."""
    li = TableRegistry(spark, sf_dir).lineitem
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "f2_null_guarded_parse",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NOT NULL
                THEN UPPER(NULLIF(o_orderpriority, '1-URGENT')) END AS priority_u
    FROM orders
    """,
)
def f2_null_guarded_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/X6/X7 — when(isNotNull, f(x)) with implicit NULL else (reference
    ...landing-to-bronze.py:60). The testdata has no NULLs, so NULLIF
    synthesizes them; the guard must propagate them untouched."""
    o = TableRegistry(spark, sf_dir).orders
    nullable = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.select(
        "o_orderkey",
        F.when(nullable.isNotNull(), F.upper(nullable)).alias("priority_u"),
    )


# ---------------------------------------------------------------------------
# J* — joins
# ---------------------------------------------------------------------------


@query(
    "j1_left_join_single_key",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j1_left_join_single_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left equi-join fact→dim (reference ...bronze-to-silver.py:110-114);
    dimension broadcast so the fact side never shuffles."""
    t = TableRegistry(spark, sf_dir)
    o, c = t.orders, t.customer
    return joins.left_join(
        o, c, on=o.o_custkey == c.c_custkey, broadcast_right=True
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "j2_left_join_expr_key",
    oracle="""
    WITH ydim AS (
      SELECT EXTRACT(year FROM o_orderdate) AS order_year, COUNT(*) AS year_orders
      FROM orders GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, y.year_orders
    FROM lineitem l LEFT JOIN ydim y ON EXTRACT(year FROM l.l_shipdate) = y.order_year
    """,
)
def j2_left_join_expr_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — equi-join where one key is a computed expression (reference
    ...bronze-to-silver.py:158-165: `year(to_date(game_date)) = season_year`).
    Catalyst evaluates the expression pre-exchange → still a hash join."""
    t = TableRegistry(spark, sf_dir)
    li, o = t.lineitem, t.orders
    ydim = o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count("*").alias("year_orders")
    )
    joined = joins.left_join(
        li, ydim, on=F.year(li.l_shipdate) == ydim.order_year, broadcast_right=True
    )
    return joined.select("l_orderkey", "l_linenumber", "year_orders")


@query(
    "j3_left_join_derived_key",
    oracle="""
    WITH dim AS (
      SELECT CONCAT_WS('|', l_returnflag, l_linestatus) AS flag_status,
             COUNT(*) AS status_count
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber,
           CONCAT_WS('|', l.l_returnflag, l.l_linestatus) AS flag_status,
           d.status_count
    FROM lineitem l
    LEFT JOIN dim d ON CONCAT_WS('|', l.l_returnflag, l.l_linestatus) = d.flag_status
    """,
)
def j3_left_join_derived_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — join key derived via concat_ws on both sides (reference
    ...bronze-to-silver.py:199-208: `team_full_name` built then joined on)."""
    li = TableRegistry(spark, sf_dir).lineitem
    key = F.concat_ws("|", F.col("l_returnflag"), F.col("l_linestatus"))
    dim = li.groupBy(key.alias("flag_status")).agg(F.count("*").alias("status_count"))
    left = li.withColumn("flag_status", key)
    return joins.left_join(left, dim, on="flag_status", broadcast_right=True).select(
        "l_orderkey", "l_linenumber", "flag_status", "status_count"
    )


@query(
    "j4_join_using",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS c_custkey, COUNT(*) AS num_orders FROM orders GROUP BY 1
    )
    SELECT c.c_custkey, c.c_name, p.num_orders
    FROM customer c LEFT JOIN per_cust p USING (c_custkey)
    """,
)
def j4_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — USING-style join on a column name, deduping the key column
    (reference ...silver-to-gold-player.py:75)."""
    t = TableRegistry(spark, sf_dir)
    per_cust = t.orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("num_orders")
    )
    return joins.left_join(t.customer, per_cust, on="c_custkey").select(
        "c_custkey", "c_name", "num_orders"
    )


@query(
    "join_inner",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join (beyond-reference completeness, SURVEY.md §2.5)."""
    t = TableRegistry(spark, sf_dir)
    li, p = t.lineitem, t.part
    return joins.inner_join(
        li, p, on=li.l_partkey == p.p_partkey, broadcast_right=True
    ).select("l_orderkey", "l_linenumber", "p_name", "p_brand")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS; never duplicates the left side."""
    t = TableRegistry(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 100000)
    c = t.customer
    return joins.semi_join(c, big, on=c.c_custkey == big.o_custkey).select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS (customers who never ordered)."""
    t = TableRegistry(spark, sf_dir)
    c, o = t.customer, t.orders
    return joins.anti_join(c, o, on=c.c_custkey == o.o_custkey).select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# A* — aggregates
# ---------------------------------------------------------------------------


@query(
    "a1_dedup_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def a1_dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — whole-row dedup after projection (reference
    ...landing-to-bronze.py:59 dropDuplicates on the season dim)."""
    c = TableRegistry(spark, sf_dir).customer
    return agg.dedup_rows(c.select("c_nationkey", "c_mktsegment"))


@query(
    "a2_dynamic_sum_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_orderkey) AS BIGINT) AS l_orderkey,
           CAST(SUM(l_partkey) AS BIGINT) AS l_partkey,
           CAST(SUM(l_suppkey) AS BIGINT) AS l_suppkey,
           CAST(SUM(l_linenumber) AS BIGINT) AS l_linenumber
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a2_dynamic_sum_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — dtype-driven dynamic aggregate: measures picked at runtime from
    the schema (reference ...silver-to-silver.py:42-49 sums every 'int'
    column not in the group key). Integer sums are exact, so the oracle
    just spells out what the schema scan selects."""
    li = TableRegistry(spark, sf_dir).lineitem
    return agg.dynamic_sum_agg(li, ["l_returnflag", "l_linestatus"], ("int", "bigint"))


@query(
    "a3_multi_measure_agg",
    oracle=f"""
    SELECT l_suppkey, l_returnflag,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(DISTINCT l_orderkey) AS order_count,
           COUNT(*) AS line_count,
           ({_osum('l_quantity')}) / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY l_suppkey, l_returnflag
    """,
)
def a3_multi_measure_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — player-mart-style multi-measure aggregate: N sums + exact
    countDistinct + expression-over-aggregates (reference
    ...silver-to-gold-player.py:52-72, incl. the computed
    `total_minutes_played`-style measure)."""
    li = TableRegistry(spark, sf_dir).lineitem
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = lambda c: F.round(c * 10000).cast("long")  # noqa: E731
    return agg.multi_measure_agg_preagg(
        li,
        ["l_suppkey", "l_returnflag"],
        distinct_count_col="l_orderkey",
        distinct_count_alias="order_count",
        sums={
            "__q": scaled(F.col("l_quantity")),
            "__bp": scaled(F.col("l_extendedprice")),
            "__rv": scaled(revenue),
        },
        derived={
            "sum_qty": F.col("__q") / 10000.0,
            "sum_base_price": F.col("__bp") / 10000.0,
            "revenue": F.col("__rv") / 10000.0,
            "avg_qty": (F.col("__q") / 10000.0) / F.col("line_count"),
        },
    ).select(
        "l_suppkey", "l_returnflag", "sum_qty", "sum_base_price", "revenue",
        "order_count", "line_count", "avg_qty",
    )


@query(
    "a4_team_style_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_osum('o_totalprice')} AS total_price,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS order_count
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def a4_team_style_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — team-mart aggregate: sums + exact countDistinct (reference
    ...silver-to-gold-team.py:32-48)."""
    o = TableRegistry(spark, sf_dir).orders
    return agg.multi_measure_agg_preagg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        distinct_count_col="o_custkey",
        distinct_count_alias="distinct_customers",
        sums={"__tp": F.round(F.col("o_totalprice") * 10000).cast("long")},
        derived={"total_price": F.col("__tp") / 10000.0},
    ).select(
        "o_orderstatus", "o_orderpriority", "total_price", "distinct_customers",
        F.col("line_count").alias("order_count"),
    )


@query(
    "a5_column_bounds",
    oracle="""
    SELECT MAX(l_orderkey) AS max_l_orderkey, MAX(l_partkey) AS max_l_partkey,
           MAX(l_suppkey) AS max_l_suppkey,
           MIN(l_orderkey) AS min_l_orderkey, MIN(l_partkey) AS min_l_partkey,
           MIN(l_suppkey) AS min_l_suppkey
    FROM lineitem
    """,
)
def a5_column_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — all column bounds in ONE scan (replaces the reference's
    per-column RDD max loop, ...landing-to-bronze.py:74; SURVEY.md §4.3-1)."""
    li = TableRegistry(spark, sf_dir).lineitem
    return agg.column_bounds(li, ["l_orderkey", "l_partkey", "l_suppkey"])


@query(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS order_count, {_osum('o_totalprice')} AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup subtotals (beyond-reference; SURVEY.md §2.6 lists as absent)."""
    o = TableRegistry(spark, sf_dir).orders
    return agg.rollup_agg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        F.count("*").alias("order_count"),
        _exact_sum(F.col("o_totalprice"), "total_price"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS line_count
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over two keys (beyond-reference)."""
    li = TableRegistry(spark, sf_dir).lineitem
    return agg.cube_agg(
        li, ["l_returnflag", "l_linestatus"], F.count("*").alias("line_count")
    )


# ---------------------------------------------------------------------------
# W* — windows
# ---------------------------------------------------------------------------


@query(
    "w1_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderpriority FROM (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def w1_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — ranking window + top-1 filter, deterministic tiebreak (reference
    ...silver-to-gold-player.py:37-46 'latest team per player')."""
    o = TableRegistry(spark, sf_dir).orders
    return windows.top1_per_group(
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select("o_custkey", "o_orderkey", "o_orderpriority")


@query(
    "w1_latest_order_maxby",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   * 1099511627776 + o_orderkey) AS o_orderkey,
           arg_max([o_orderpriority],
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   * 1099511627776 + o_orderkey)[1] AS o_orderpriority
    FROM orders GROUP BY o_custkey
    """,
)
def w1_latest_order_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 scale variant — same result as ``w1_latest_order_per_customer``
    via ``max_by`` hash aggregate (SURVEY.md §2.7's noted alternative):
    one shuffle with map-side combine, no per-group sort. The score packs
    (orderdate days, orderkey) into one tie-free long: days << 40 leaves
    room for 10^12 order keys."""
    o = TableRegistry(spark, sf_dir).orders
    score = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
        * F.lit(1099511627776).cast("long")
        + F.col("o_orderkey")
    )
    return windows.top1_per_group_maxby(
        o, ["o_custkey"], score, ["o_orderkey", "o_orderpriority"]
    )


@query(
    "w2_rank_in_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
    FROM orders
    """,
)
def w2_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() variant (beyond-reference; SURVEY.md §2.7 lists as absent)."""
    o = TableRegistry(spark, sf_dir).orders
    return windows.with_rank(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        alias="price_rank",
    )


@query(
    "w3_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate ASC NULLS FIRST,
                                               o_orderkey ASC NULLS FIRST)
             AS prev_totalprice
    FROM orders
    """,
)
def w3_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — prior order's price per customer (beyond-reference)."""
    o = TableRegistry(spark, sf_dir).orders
    return windows.with_lag(
        o.select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
        ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        "o_totalprice",
        alias="prev_totalprice",
    ).select("o_custkey", "o_orderkey", "prev_totalprice")


@query(
    "w4_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber ASC NULLS FIRST,
                               l_quantity ASC NULLS FIRST,
                               l_partkey ASC NULLS FIRST,
                               l_suppkey ASC NULLS FIRST
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 10000.0 AS qty_running
    FROM lineitem
    """,
)
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with explicit rows-frame (beyond-reference).
    Scaled-long accumulation keeps both engines bit-identical (see
    ``_exact_sum``). (l_orderkey, l_linenumber) is NOT unique in the
    testdata, so the order tiebreaks on the summed column + remaining keys —
    residual ties are then value-identical and can't change the prefix
    sums."""
    li = TableRegistry(spark, sf_dir).lineitem
    return windows.with_running_sum(
        li.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity",
            F.round(F.col("l_quantity") * 10000).cast("long").alias("qty_scaled"),
        ),
        ["l_orderkey"],
        [
            F.col("l_linenumber").asc(),
            F.col("l_quantity").asc(),
            F.col("l_partkey").asc(),
            F.col("l_suppkey").asc(),
        ],
        "qty_scaled",
        alias="qty_running_scaled",
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("qty_running_scaled") / 10000.0).alias("qty_running"),
    )


# ---------------------------------------------------------------------------
# Set ops / sort / limit (SURVEY.md §2.10 — absent in reference, required
# for a credible engine surface)
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = TableRegistry(spark, sf_dir).orders
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH")
    return urgent.select("o_orderkey", "o_orderpriority").unionAll(
        high.select("o_orderkey", "o_orderpriority")
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TableRegistry(spark, sf_dir)
    return t.customer.select("c_custkey").intersect(
        t.orders.select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TableRegistry(spark, sf_dir)
    return t.customer.select("c_custkey").exceptAll(
        t.orders.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge of k rows), no global sort at scale."""
    o = TableRegistry(spark, sf_dir).orders
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# X* — scalar functions
# ---------------------------------------------------------------------------


@query(
    "x1x2x3_date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%b %d, %Y') AS date_str,
           STRFTIME(STRPTIME(STRFTIME(o_orderdate, '%b %d, %Y'), '%b %d, %Y'), '%Y-%m-%d')
             AS date_parsed,
           EXTRACT(year FROM o_orderdate) AS order_year
    FROM orders
    """,
)
def x1x2x3_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2/X3 — format to the reference's `"MMM dd, yyyy"` gamelog style,
    parse back, extract year (reference ...landing-to-bronze.py:46,
    ...bronze-to-silver.py:162)."""
    o = TableRegistry(spark, sf_dir).orders
    date_str = F.date_format("o_orderdate", "MMM dd, yyyy")
    parsed = conform.parse_date(date_str, "MMM dd, yyyy")
    return o.select(
        "o_orderkey",
        date_str.alias("date_str"),
        # canonical string form, as the reference does (X2) — also keeps the
        # cross-engine hash free of date-representation drift
        F.date_format(parsed, "yyyy-MM-dd").alias("date_parsed"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    )


@query(
    "x4_split_mmss",
    oracle="""
    SELECT l_orderkey, l_linenumber, mmss,
           CAST(STRING_SPLIT(mmss, ':')[1] AS INTEGER) AS min,
           CAST(STRING_SPLIT(mmss, ':')[2] AS INTEGER) AS seg
    FROM (
      SELECT l_orderkey, l_linenumber,
             CONCAT_WS(':', CAST(l_linenumber AS VARCHAR),
                       LPAD(CAST(l_suppkey % 60 AS VARCHAR), 2, '0')) AS mmss
      FROM lineitem)
    """,
)
def x4_split_mmss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — `"MM:SS"` split → int minutes/seconds (reference
    ...landing-to-bronze.py:50-51 on the `minutos` column)."""
    li = TableRegistry(spark, sf_dir).lineitem
    mmss = F.concat_ws(
        ":",
        F.col("l_linenumber").cast("string"),
        F.lpad((F.col("l_suppkey") % 60).cast("string"), 2, "0"),
    )
    df = li.select("l_orderkey", "l_linenumber", mmss.alias("mmss"))
    mins, secs = conform.split_mmss("mmss")
    return df.select(
        "l_orderkey", "l_linenumber", "mmss", mins.alias("min"), secs.alias("seg")
    )


@query(
    "conform_safe_downcast",
    oracle="""
    SELECT CAST(l_orderkey AS INTEGER) AS l_orderkey,
           CAST(l_partkey AS INTEGER) AS l_partkey,
           CAST(l_suppkey AS INTEGER) AS l_suppkey,
           l_linenumber
    FROM lineitem
    """,
)
def conform_safe_downcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe bigint→int narrowing, ONE bounds pass for all columns (reference
    ...landing-to-bronze.py:68-82 did one RDD scan per column). All testdata
    bigint keys fit in int32, so every column narrows — the oracle asserts
    exactly that."""
    li = TableRegistry(spark, sf_dir).lineitem
    return conform.safe_downcast_longs(
        li.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.90) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (beyond-reference; SURVEY.md §2.6
    'absent'). Spark's `percentile` and DuckDB's `quantile_cont` share the
    p*(n-1) continuous definition, so results hash-match exactly. The
    100 TB variant is `approx_percentile` (t-digest-style sketch, single
    pass, mergeable) — see events_approx_distinct_users for the approx
    pattern."""
    li = TableRegistry(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.90).alias("p90"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS f_lines,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS o_lines,
           CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) / 10000.0 AS f_qty,
           CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) / 10000.0 AS o_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (beyond-reference): rows→columns on an explicit value list.
    Listing pivot values up front matters at scale — it keeps the plan to
    one aggregate pass; value-discovery pivot needs an extra distinct
    job."""
    li = TableRegistry(spark, sf_dir).lineitem.withColumn(
        "qty_scaled", F.round(F.col("l_quantity") * 10000).cast("long")
    )
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)).alias("lines"), F.sum("qty_scaled").alias("qs"))
    )
    return out.select(
        "l_returnflag",
        F.col("F_lines").alias("f_lines"),
        F.col("O_lines").alias("o_lines"),
        (F.col("F_qs") / 10000.0).alias("f_qty"),
        (F.col("O_qs") / 10000.0).alias("o_qty"),
    )


@query(
    "project_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS value
    FROM lineitem
    """,
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (beyond-reference): wide measures → long (metric, value)
    rows — a Generate (no shuffle), the schema-normalization step for
    metric stores."""
    li = TableRegistry(spark, sf_dir).lineitem
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice"],
        "metric",
        "value",
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (each key kept min(multiplicity-in-A,
    multiplicity-in-R) times) — the bag semantics INTERSECT hides. Spark
    plans both ALL variants as aggregates + joins, one shuffle each."""
    li = TableRegistry(spark, sf_dir).lineitem
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(r)


@query(
    "set_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: multiplicities subtract instead of vanish."""
    li = TableRegistry(spark, sf_dir).lineitem
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(r)


@query(
    "sample_hash_mod",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {duck_key_hash("o_orderkey", 10)} = 0
    """,
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by multiplicative key hashing (Knuth +
    xxhash primes over the key's 31-bit halves, mod 2^32 — overflow-free
    int64 up to 2^62 keys; see operators/sampling.py). Unlike
    ``df.sample`` this is reproducible across engines, runs, AND
    scale-factors (a row keeps or loses membership based only on its key)
    — the property training-data holdouts need. Pure filter: pushes to
    the scan, no shuffle, no RNG state."""
    from datalake_nba_dmc_spark.operators.sampling import _key_hash

    o = TableRegistry(spark, sf_dir).orders
    return o.filter(_key_hash(F.col("o_orderkey"), 10) == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "sample_stratified_segments",
    oracle=f"""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE {duck_key_hash("c_custkey", 1000)} <
          CASE WHEN c_mktsegment = 'BUILDING' THEN 500
               WHEN c_mktsegment = 'MACHINERY' THEN 50
               ELSE 200 END
    """,
)
def sample_stratified_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample (operators/sampling.py): keep 50%
    of BUILDING, 5% of MACHINERY, 20% of everything else — the standard
    training-mix rebalance, decided by key hash only, so membership is
    stable across runs, partitionings, and scale factors. One CASE
    expression in a scan-level filter; no sampleBy RNG, no shuffle."""
    from datalake_nba_dmc_spark.operators.sampling import sample_stratified

    c = TableRegistry(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    return sample_stratified(
        c,
        key_col="c_custkey",
        stratum_col="c_mktsegment",
        rates={"BUILDING": 0.5, "MACHINERY": 0.05},
        default_rate=0.2,
    )


@query(
    "agg_approx_percentiles",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           1 AS p25_ok, 1 AS p50_ok, 1 AS p90_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass mergeable quantile sketch (`approx_percentile`,
    KLL/GK-style) — the 100 TB path where exact percentiles would sort per
    group — with an IN-PLAN accuracy certificate so the sketch gets a real
    driver oracle instead of a rows-only row: each approx value is checked
    against the exact quantiles at q ± 0.005 (accuracy=10000 bounds the
    sketch's rank error at 1e-4 ≪ 0.005), and the query emits 1/0 flags.
    The oracle emits constant 1s — any sketch regression breaking the rank
    bound flips a flag and fails the value-hash. Exact-value parity is
    separately covered by the `agg_percentiles` twin."""
    li = TableRegistry(spark, sf_dir).lineitem
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.expr(
            "approx_percentile(l_quantity, array(0.25D, 0.50D, 0.90D), 10000)"
        ).alias("ap"),
        F.expr(
            "percentile(l_quantity, array(0.245D, 0.255D, 0.495D, 0.505D, 0.895D, 0.905D))"
        ).alias("ex"),
    )

    def ok(i: int):
        # the ±0.005 RANK window only surely contains a data value when
        # the group has ≥ 1/0.005 rows; on tiny groups the interpolated
        # bounds can bracket a gap between two distinct values and the
        # (value-returning) sketch would fail vacuously — certificate
        # active at gate scale (20k+ rows/group), trivially true below
        lo, hi = F.col("ex")[2 * i], F.col("ex")[2 * i + 1]
        v = F.col("ap")[i]
        return ((F.col("n_rows") < 200) | ((v >= lo) & (v <= hi))).cast("int")

    return agg.select(
        "l_returnflag",
        "n_rows",
        ok(0).alias("p25_ok"),
        ok(1).alias("p50_ok"),
        ok(2).alias("p90_ok"),
    )


@query(
    "sample_weighted_topk",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ln(({duck_key_hash("o_orderkey", 4294967296)} + 0.5) / 4294967296.0)
               / o_totalprice AS es
      FROM orders)
    ORDER BY es DESC LIMIT 200
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (operators/
    sampling.sample_weighted_topk, Efraimidis-Spirakis keys off the Knuth
    key hash): 200 orders drawn with probability ∝ o_totalprice,
    reproducible across engines/partitionings — selection compiles to
    per-partition top-k (TakeOrderedAndProject), no full sort. Key
    collisions are measure-zero, so the engines pick identical sets and
    the driver's value-hash matches."""
    from datalake_nba_dmc_spark.operators.sampling import sample_weighted_topk as swt

    o = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return swt(o, "o_orderkey", "o_totalprice", k=200)


@query(
    "join_price_band_lookup",
    oracle="""
    WITH bands(band_id, band, lo, hi) AS (
      VALUES (1, 'nano',   0.0,      1000.0),
             (2, 'small',  1000.0,   50000.0),
             (3, 'mid',    50000.0,  150000.0),
             (4, 'large',  150000.0, 300000.0),
             (5, 'jumbo',  300000.0, 600000.0)
    )
    SELECT b.band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_price_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range-containment lookup: every order joined to its price
    band via the bin-accelerated band join (operators/temporal.
    band_lookup_join) — bands explode into fixed-width value bins, the
    fact side computes its bin arithmetically, and the lookup is an
    equi-join + residual filter instead of the nested-loop BETWEEN join
    the oracle runs. The IP-geolocation/CIDR-table shape: with 3M bands a
    nested loop evaluates 3M predicates per row; the bin join stays O(1)
    per fact row."""
    from datalake_nba_dmc_spark.operators.temporal import band_lookup_join

    o = TableRegistry(spark, sf_dir).orders
    bands = o.sparkSession.createDataFrame(
        [
            (1, "nano", 0.0, 1000.0),
            (2, "small", 1000.0, 50000.0),
            (3, "mid", 50000.0, 150000.0),
            (4, "large", 150000.0, 300000.0),
            (5, "jumbo", 300000.0, 600000.0),
        ],
        ["band_id", "band", "lo", "hi"],
    )
    tagged = band_lookup_join(o, bands, "o_totalprice")
    return tagged.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        _exact_sum(F.col("o_totalprice"), "revenue"),
    )


@query(
    "conform_union_evolved",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT COALESCE(o_orderpriority, '(pre-upgrade)') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
    FROM unioned GROUP BY 1
    """,
)
def conform_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (operators/conform.union_evolved): an old
    snapshot written BEFORE the o_orderpriority column existed unions
    with the evolved snapshot by NAME, the missing column null-filled —
    the read-side schema-evolution semantics plain-format lakes need
    (positional union would silently misalign; table formats do this in
    metadata). Zero-shuffle plan: each side only projects to the merged
    schema; the aggregate then treats pre-upgrade rows as their own
    bucket."""
    from datalake_nba_dmc_spark.operators.conform import union_evolved

    o = TableRegistry(spark, sf_dir).orders
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    unioned = union_evolved(v1, v2)
    return unioned.groupBy(
        F.coalesce("o_orderpriority", F.lit("(pre-upgrade)")).alias("priority")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        _exact_sum(F.col("o_totalprice"), "revenue"),
    )
