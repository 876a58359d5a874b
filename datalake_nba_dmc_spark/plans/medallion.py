"""Medallion pipeline runner: Landing → Bronze → Silver → Gold.

Reproduces the reference's five-job architecture (README.md:21-26; one Glue
job per hop) as one composable PySpark pipeline over the driver's star
schema, with each hop reading the previous layer's *written* tables — real
table-to-table lineage, like the reference's catalog layers, not one fused
plan.

Job-for-job mapping (reference file → stage here):

- ``aws-job-landing-to-bronze``  → :func:`landing_to_bronze` — typed/cleaned
  tables: safe bigint→int narrowing (one pass, not per-column RDD scans —
  fixes reference ``aws-job-landing-to-bronze.py:68-82``), date
  canonicalization, junk-column drops, whole-row dedup of the dim table
  (``:59``).
- ``aws-job-bronze-to-silver``   → :func:`bronze_to_silver` — bulk renames
  (``:46-106``) + the J1/J2/J3 left joins (``:110-252``) → two silver tables.
- ``aws-job-silver-to-silver``   → :func:`silver_to_silver` — column
  segmentation + dtype-driven dynamic sum aggregate (``:42-49``).
- ``aws-job-silver-to-gold-player`` → :func:`silver_to_gold_customer` — W1
  latest-row window + A3 multi-measure agg + J4 join (``:37-75``).
- ``aws-job-silver-to-gold-team``   → :func:`silver_to_gold_nation` — A4
  group-sums mart (``aws-job-silver-to-gold-team.py:32-48``).

Each stage writes with :func:`datalake_nba_dmc_spark.sinks.write_table`
(plain overwrite, natural partitioning) instead of the reference's
coalesce(1)+boto3-rename (``:85-106``) — see sinks.py for why.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import aggregates as agg
from datalake_nba_dmc_spark.operators import conform, joins, windows
from datalake_nba_dmc_spark.sinks import read_table, write_table
from datalake_nba_dmc_spark.sources import load_table


def _out(base: str, layer: str, name: str) -> str:
    return os.path.join(base, layer, name)


def landing_to_bronze(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Landing → Bronze: type hardening + cleaning per table."""
    paths: dict[str, str] = {}

    orders = load_table(spark, sf_dir, "orders")
    orders = conform.safe_downcast_longs(orders)
    orders = conform.with_derived(
        orders, o_orderdate=F.col("o_orderdate").cast("date")
    )
    paths["orders"] = _out(out_dir, "bronze", "orders")
    write_table(orders, paths["orders"])

    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem = conform.safe_downcast_longs(lineitem)
    paths["lineitem"] = _out(out_dir, "bronze", "lineitem")
    write_table(lineitem, paths["lineitem"])

    # dim table: whole-row dedup, like the reference's season bio table
    # (aws-job-landing-to-bronze.py:59)
    customer = agg.dedup_rows(load_table(spark, sf_dir, "customer"))
    paths["customer"] = _out(out_dir, "bronze", "customer")
    write_table(customer, paths["customer"])

    nation = load_table(spark, sf_dir, "nation")
    paths["nation"] = _out(out_dir, "bronze", "nation")
    write_table(nation, paths["nation"])

    return paths


def bronze_to_silver(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Bronze → Silver: conform names + enrich facts with dimension joins."""
    orders = read_table(spark, _out(out_dir, "bronze", "orders"))
    lineitem = read_table(spark, _out(out_dir, "bronze", "lineitem"))
    customer = read_table(spark, _out(out_dir, "bronze", "customer"))
    nation = read_table(spark, _out(out_dir, "bronze", "nation"))

    # bulk rename (P2) then J1-style single-key left join; small dim broadcast
    customer = conform.rename_columns(
        customer, {"c_custkey": "custkey", "c_name": "customer_name"}
    )
    orders_customer = joins.left_join(
        conform.rename_columns(orders, {"o_custkey": "custkey"}),
        customer.select("custkey", "customer_name", "c_nationkey", "c_mktsegment"),
        on="custkey",
        broadcast_right=True,
    )
    p1 = _out(out_dir, "silver", "orders_customer")
    write_table(orders_customer, p1)

    # J3-style: fact enriched through two joins with a derived key
    li = conform.with_derived(
        lineitem, l_revenue=F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    li_orders = joins.left_join(
        li,
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        on=li.l_orderkey == F.col("o_orderkey"),
    ).drop("o_orderkey")
    li_full = joins.left_join(
        li_orders,
        customer.select(F.col("custkey").alias("o_custkey"), "c_nationkey"),
        on="o_custkey",
        broadcast_right=True,
    )
    p2 = _out(out_dir, "silver", "lineitem_enriched")
    write_table(li_full, p2)

    # dim conformed for gold (J2-style derived join key parallel: nation name)
    p3 = _out(out_dir, "silver", "nation")
    write_table(nation, p3)
    return {"orders_customer": p1, "lineitem_enriched": p2, "nation": p3}


def silver_to_silver(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Silver → Silver: column segmentation + dynamic dtype-driven aggregate
    (reference aws-job-silver-to-silver.py:31-49)."""
    li = read_table(spark, _out(out_dir, "silver", "lineitem_enriched"))
    seg = li.drop("l_comment", "l_shipinstruct")  # column segmentation (P1)
    daily = agg.dynamic_sum_agg(
        seg,
        group_cols=["o_custkey", "o_orderdate"],
        dtypes=("int", "bigint"),
    )
    p = _out(out_dir, "silver", "customer_daily")
    write_table(daily, p)
    return {"customer_daily": p}


def silver_to_gold_customer(spark: SparkSession, out_dir: str) -> str:
    """Silver → Gold: the flagship W1+A3+J4 mart (customer resume)."""
    oc = read_table(spark, _out(out_dir, "silver", "orders_customer"))
    totals = agg.multi_measure_agg(
        oc,
        group_cols=["custkey", "customer_name", "c_mktsegment"],
        sum_cols=["o_totalprice"],
        distinct_count_col="o_orderdate",
        distinct_count_alias="active_days",
    )
    latest = windows.top1_per_group(
        oc.select("custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
        ["custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select(
        "custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderpriority").alias("latest_priority"),
    )
    mart = joins.left_join(totals, latest, on="custkey")
    p = _out(out_dir, "gold", "customer_resume")
    write_table(mart, p)
    return p


def silver_to_gold_nation(spark: SparkSession, out_dir: str) -> str:
    """Silver → Gold: the A4 franchise-totals mart (nation resume)."""
    li = read_table(spark, _out(out_dir, "silver", "lineitem_enriched"))
    nation = read_table(spark, _out(out_dir, "silver", "nation"))
    mart = agg.multi_measure_agg(
        li.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")),
            on="c_nationkey",
            how="left",
        ),
        group_cols=["c_nationkey", "n_name"],
        sum_cols=["l_quantity", "l_extendedprice"],
        distinct_count_col="o_orderdate",
        distinct_count_alias="active_days",
    )
    p = _out(out_dir, "gold", "nation_resume")
    write_table(mart, p)
    return p


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Run all five stages in dependency order; returns every written path.

    The reference enforces this ordering operationally (five separate Glue
    jobs, maxConcurrentRuns=1 — SURVEY.md §3); here it is explicit code.
    """
    out: dict[str, str] = {}
    out.update({f"bronze/{k}": v for k, v in landing_to_bronze(spark, sf_dir, out_dir).items()})
    out.update({f"silver/{k}": v for k, v in bronze_to_silver(spark, out_dir).items()})
    out.update({f"silver/{k}": v for k, v in silver_to_silver(spark, out_dir).items()})
    out["gold/customer_resume"] = silver_to_gold_customer(spark, out_dir)
    out["gold/nation_resume"] = silver_to_gold_nation(spark, out_dir)
    return out
