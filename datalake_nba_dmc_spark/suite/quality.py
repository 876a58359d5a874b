"""Data-quality and profiling queries: declarative expectations with a
violations report, one-pass column profiles, and exact histograms.

The reference has no validation or profiling step (bad rows flow
silently through the medallion jobs — e.g. the silent null-on-parse at
reference ``aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:61-66``);
these queries add the audit surface a production lake runs before/after
every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.quality import (
    accepted_values,
    expectation_report,
    in_range,
    not_null,
    referential,
    unique,
)
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query


@query(
    "dq_orders_expectations",
    oracle="""
    SELECT 'not_null_o_custkey' AS rule,
           CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS violations,
           COUNT(*) AS total,
           COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0
             AS passed
    FROM orders
    UNION ALL
    SELECT 'accepted_values_o_orderstatus',
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('F','O','P')
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
           COUNT(*),
           COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F','O','P')
                    THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'in_range_o_totalprice',
           CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 250000
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
           COUNT(*),
           COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 250000
                    THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'unique_o_orderkey',
           CAST(COUNT(*) - (COUNT(DISTINCT o_orderkey)
                 + CASE WHEN COUNT(*) > COUNT(o_orderkey)
                        THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
                 + CASE WHEN COUNT(*) > COUNT(o_orderkey) THEN 1 ELSE 0 END
    FROM orders
    UNION ALL
    SELECT 'referential_o_custkey',
           CAST(COALESCE(SUM(CASE WHEN c._r IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT),
           COUNT(*),
           COALESCE(SUM(CASE WHEN c._r IS NULL THEN 1 ELSE 0 END), 0) = 0
    FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
    LEFT JOIN (SELECT DISTINCT c_custkey AS _r FROM customer) c
      ON o.o_custkey = c._r
    """,
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five expectations over ``orders`` in three Spark jobs total: the
    three scalar rules share ONE conditional-aggregate scan, uniqueness
    is one map-side-combined hash agg on the key, and the FK check is one
    left join against the distinct customer keys (broadcast-sized here;
    shuffle at scale — AQE decides). The in-range rule is deliberately
    violated by the data so the failure path is exercised
    (operators/quality.py)."""
    t = TableRegistry(spark, sf_dir)
    orders = t.orders
    return expectation_report(
        orders,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            in_range("o_totalprice", 0, 250000),
            unique("o_orderkey"),
            referential("o_custkey", t.customer, "c_custkey"),
        ],
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_val,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan, three-column profile (nulls / exact distinct / bounds) of
    ``orders`` in long format — the generalized fix of the reference's
    N-scans-per-column bounds idiom (operators/profile.py)."""
    from datalake_nba_dmc_spark.operators.profile import profile_columns

    orders = TableRegistry(spark, sf_dir).orders
    return profile_columns(orders, ["o_orderkey", "o_custkey", "o_totalprice"])


@query(
    "profile_price_histogram",
    oracle="""
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0)
                                 AS INT), 0), 19) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    ), c AS (SELECT bucket, COUNT(*) AS cnt FROM b GROUP BY bucket)
    SELECT s.bucket,
           0.0 + s.bucket * 25000.0 AS bin_lo,
           0.0 + (s.bucket + 1) * 25000.0 AS bin_hi,
           COALESCE(c.cnt, 0) AS cnt
    FROM (SELECT CAST(range AS INT) AS bucket FROM range(0, 20)) s
    LEFT JOIN c USING (bucket)
    """,
)
def profile_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20-bin equi-width histogram of order totals over
    [0, 500000]: map-side bucket projection + one tiny hash aggregate +
    a broadcast bin spine so empty bins report cnt=0
    (operators/profile.py histogram)."""
    from datalake_nba_dmc_spark.operators.profile import histogram

    orders = TableRegistry(spark, sf_dir).orders
    return histogram(spark, orders, "o_totalprice", 0.0, 500000.0, 20)


@query(
    "profile_price_outliers",
    oracle="""
    WITH med AS (
      SELECT l_returnflag AS grp, quantile_cont(l_extendedprice, 0.5) AS med,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1
    ), dev AS (
      SELECT l.l_returnflag AS grp,
             abs(l.l_extendedprice - m.med) AS adev
      FROM lineitem l JOIN med m ON l.l_returnflag = m.grp
    ), mad AS (
      SELECT grp, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    ), fl AS (
      SELECT d.grp,
             CAST(SUM(CASE WHEN mad.mad > 0 AND 0.6745 * d.adev / mad.mad > 3.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev d JOIN mad USING (grp) GROUP BY 1
    )
    SELECT med.grp AS l_returnflag, med.n_rows, med.med, mad.mad, fl.n_outliers
    FROM med JOIN mad ON med.grp = mad.grp JOIN fl ON med.grp = fl.grp
    """,
)
def profile_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier screen (operators/profile.
    robust_outlier_profile): exact median + MAD + modified-z count per
    return flag — mean/σ-free DQ stats that outliers can't poison. Spark's
    exact ``percentile`` and DuckDB's ``quantile_cont`` interpolate
    identically on identical doubles (verified bit-equal), so even the
    medians hash-match."""
    from datalake_nba_dmc_spark.operators.profile import robust_outlier_profile

    li = TableRegistry(spark, sf_dir).lineitem
    return robust_outlier_profile(li, "l_returnflag", "l_extendedprice")


@query(
    "profile_winsorize",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < b.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN l.l_extendedprice > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_hi,
           CAST(SUM(CASE WHEN l.l_extendedprice IS NOT NULL THEN CAST(round(
             least(greatest(l.l_extendedprice, b.lo), b.hi) * 100
           ) AS BIGINT) END) AS DOUBLE) / 100.0 AS sum_winsorized
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def profile_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (operators/profile.winsorize): extended
    price clipped to each returnflag's [p05, p95] interpolated
    percentiles — the heavy-tail taming step before feature extraction.
    One grouped percentile pass + broadcast-back map-only clamp; Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` interpolate
    bit-identically (established by profile_price_outliers), and the
    clipped sum is cent-scaled exact, so clip counts AND the winsorized
    mass hash-match."""
    from datalake_nba_dmc_spark.operators.profile import winsorize

    li = TableRegistry(spark, sf_dir).lineitem
    w = winsorize(li, "l_returnflag", "l_extendedprice")
    return w.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum((F.col("l_extendedprice") < F.col("_lo")).cast("long")).alias(
            "n_clip_lo"
        ),
        F.sum((F.col("l_extendedprice") > F.col("_hi")).cast("long")).alias(
            "n_clip_hi"
        ),
        (
            F.sum(F.round(F.col("winsorized") * 100).cast("long")).cast("double")
            / 100.0
        ).alias("sum_winsorized"),
    )
