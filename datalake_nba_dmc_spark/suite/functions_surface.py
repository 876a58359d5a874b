"""Scalar-function-surface queries (dates, strings, null semantics, array
scalars) — the extended X-row coverage beyond the reference's ten functions
(SURVEY.md §2.8). Column builders live in ``datalake_nba_dmc_spark/
functions/scalars.py``; each query projects them over a driver table and is
hash-checked against the DuckDB twin, which pins cross-engine semantics
(day-of-week bases, 1-based string positions, NULLIF/null-safe-equality
behavior) rather than trusting documentation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.functions import (
    array_scalar_features,
    date_parts,
    null_semantics,
    string_features,
)
from datalake_nba_dmc_spark.operators.text import tokens
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query


@query(
    "func_date_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
           month(o_orderdate) AS month, dayofmonth(o_orderdate) AS day,
           dayofweek(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week
    FROM orders
    """,
)
def func_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar decomposition — one codegen'd projection, no shuffle. The
    dow column pins the Sunday-base alignment (Spark 1-based vs DuckDB
    0-based)."""
    o = TableRegistry(spark, sf_dir).orders
    parts = date_parts(F.col("o_orderdate"))
    return o.select("o_orderkey", *[c.alias(n) for n, c in parts.items()])


@query(
    "func_string_surface",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS upper, lower(c_name) AS lower,
           substring(c_name, 10, 6) AS sub,
           lpad(c_name, 24, '.') AS lpadded,
           regexp_replace(c_name, '0+', '0', 'g') AS replaced,
           CASE WHEN c_name IS NOT NULL
                THEN COALESCE(regexp_extract(c_name, '(\\d+)', 1), '')
           END AS digits,
           reverse(c_name) AS rev,
           strpos(c_name, '0') AS pos_zero,
           levenshtein(c_name, 'Customer') AS lev,
           length(c_name) AS n_chars
    FROM customer
    """,
)
def func_string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over customer names. Note regexp_replace is
    global-by-default in Spark but needs the 'g' flag in DuckDB, and a
    no-match regexp_extract is '' in Spark vs NULL in DuckDB — the oracle
    encodes both pins."""
    c = TableRegistry(spark, sf_dir).customer
    feats = string_features(F.col("c_name"))
    return c.select("c_custkey", *[col.alias(n) for n, col in feats.items()])


@query(
    "func_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS maybe_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), '(none)') AS filled,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_sentinel
    FROM orders
    """,
)
def func_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE / null-safe equality (<=> ≡ IS NOT DISTINCT FROM):
    is_sentinel is three-valued-logic-proof — TRUE/FALSE, never NULL."""
    o = TableRegistry(spark, sf_dir).orders
    sems = null_semantics(F.col("o_orderstatus"), "O")
    return o.select("o_orderkey", *[col.alias(n) for n, col in sems.items()])


@query(
    "func_array_scalars",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')
               AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_items,
           list_sort(toks)[1] AS first_sorted,
           list_sort(toks)[-1] AS last_sorted,
           list_contains(toks, 'the') AS has_the,
           len(list_distinct(toks)) AS n_distinct_items
    FROM t
    """,
)
def func_array_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface reduced to scalar outputs (size, sorted
    first/last, membership, distinct count) — scalars hash identically
    across engines where raw array string-forms don't."""
    d = TableRegistry(spark, sf_dir).documents
    feats = array_scalar_features(tokens(F.col("text")))
    return d.select("doc_id", *[col.alias(n) for n, col in feats.items()])


@query(
    "func_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - 25.0, 0.0) AS unit_margin,
           TRY_CAST(l_comment_free AS BIGINT) AS parsed_qty,
           CASE WHEN l_quantity >= 1 AND l_quantity <= 127
                THEN CAST(l_quantity AS TINYINT) END AS qty_i8
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
                 CAST(CAST(l_quantity AS INT) AS VARCHAR) AS l_comment_free
          FROM lineitem)
    """,
)
def func_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: ``try_divide`` (NULL, not an
    exception, on the rows where quantity hits the divisor's zero),
    ``try_cast`` string→bigint, and a guarded narrowing cast — the
    error-as-NULL idioms that let a pipeline run under Spark 4's default
    ANSI mode without wrapping every expression in its own job-killing
    failure path (the same hardening theme as this round's overflow
    fixes). DuckDB twins: NULLIF-guarded division and TRY_CAST."""
    li = TableRegistry(spark, sf_dir).lineitem
    qty_str = F.col("l_quantity").cast("int").cast("string")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 25.0
        ).alias("unit_margin"),
        qty_str.try_cast("bigint").alias("parsed_qty"),
        F.when(
            (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 127),
            F.col("l_quantity").cast("tinyint"),
        ).alias("qty_i8"),
    )


@query(
    "func_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR)
             AS ship_by,
           CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
             AS days_since_epoch0,
           CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
             AS quarter_start
    FROM orders
    """,
)
def func_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic surface beyond the reference's parse/format pair:
    interval addition, month-end snapping, exact day differences against
    a fixed epoch, and quarter truncation — each pinned against the
    DuckDB twin so cross-engine calendar semantics (inclusive diffs,
    month-end behavior) are hash-checked rather than assumed."""
    o = TableRegistry(spark, sf_dir).orders
    # dates emitted as ISO strings: DuckDB surfaces interval-arithmetic
    # results as timestamps to pandas while Spark returns dates, and the
    # cell-level str() forms differ even when the days agree — strings
    # pin the comparison (same convention as functions/scalars.date_parts)
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).cast("string").alias("ship_by"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch0"),
        F.date_trunc("quarter", "o_orderdate")
        .cast("date")
        .cast("string")
        .alias("quarter_start"),
    )
