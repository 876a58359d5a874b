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
from datalake_nba_dmc_spark.sources.catalog import (
    ensure_database,
    read_catalog_table,
    save_catalog_table,
)


def _out(base: str, layer: str, name: str) -> str:
    return os.path.join(base, layer, name)


class LayerIO:
    """Layer-addressed table IO for the pipeline, in two modes.

    ``use_catalog=False`` (default): plain path reads/writes, exactly as
    before. ``use_catalog=True``: each medallion layer becomes a session-
    catalog database (``db_bronze``/``db_silver``/``db_gold`` — the open
    equivalent of the reference's Glue databases, reference
    ``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:22-37``) and
    stages address tables as (database, table); data still lands at the
    SAME layer paths as external-table locations, so path-mode readers see
    identical bytes."""

    def __init__(self, spark: SparkSession, out_dir: str, use_catalog: bool = False):
        self.spark = spark
        self.out_dir = out_dir
        self.use_catalog = use_catalog

    def _db(self, layer: str) -> str:
        db = f"db_{layer}"
        ensure_database(self.spark, db, location=_out(self.out_dir, "_catalog", db))
        return db

    def write(self, df: DataFrame, layer: str, name: str) -> str:
        path = _out(self.out_dir, layer, name)
        if self.use_catalog:
            save_catalog_table(df, self._db(layer), name, path=path)
        else:
            write_table(df, path)
        return path

    def read(self, layer: str, name: str) -> DataFrame:
        if self.use_catalog:
            return read_catalog_table(self.spark, self._db(layer), name)
        return read_table(self.spark, _out(self.out_dir, layer, name))


def landing_to_bronze(spark: SparkSession, sf_dir: str, io: LayerIO) -> dict[str, str]:
    """Landing → Bronze: type hardening + cleaning per table."""
    paths: dict[str, str] = {}

    orders = load_table(spark, sf_dir, "orders")
    orders = conform.safe_downcast_longs(orders)
    orders = conform.with_derived(
        orders, o_orderdate=F.col("o_orderdate").cast("date")
    )
    paths["orders"] = io.write(orders, "bronze", "orders")

    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem = conform.safe_downcast_longs(lineitem)
    paths["lineitem"] = io.write(lineitem, "bronze", "lineitem")

    # dim table: whole-row dedup, like the reference's season bio table
    # (aws-job-landing-to-bronze.py:59)
    customer = agg.dedup_rows(load_table(spark, sf_dir, "customer"))
    paths["customer"] = io.write(customer, "bronze", "customer")

    nation = load_table(spark, sf_dir, "nation")
    paths["nation"] = io.write(nation, "bronze", "nation")

    return paths


def bronze_to_silver(spark: SparkSession, io: LayerIO) -> dict[str, str]:
    """Bronze → Silver: conform names + enrich facts with dimension joins."""
    orders = io.read("bronze", "orders")
    lineitem = io.read("bronze", "lineitem")
    customer = io.read("bronze", "customer")
    nation = io.read("bronze", "nation")

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
    p1 = io.write(orders_customer, "silver", "orders_customer")

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
    p2 = io.write(li_full, "silver", "lineitem_enriched")

    # dim conformed for gold (J2-style derived join key parallel: nation name)
    p3 = io.write(nation, "silver", "nation")
    return {"orders_customer": p1, "lineitem_enriched": p2, "nation": p3}


def silver_to_silver(spark: SparkSession, io: LayerIO) -> dict[str, str]:
    """Silver → Silver: column segmentation + dynamic dtype-driven aggregate
    (reference aws-job-silver-to-silver.py:31-49)."""
    li = io.read("silver", "lineitem_enriched")
    seg = li.drop("l_comment", "l_shipinstruct")  # column segmentation (P1)
    daily = agg.dynamic_sum_agg(
        seg,
        group_cols=["o_custkey", "o_orderdate"],
        dtypes=("int", "bigint"),
    )
    p = io.write(daily, "silver", "customer_daily")
    return {"customer_daily": p}


def silver_to_gold_customer(spark: SparkSession, io: LayerIO) -> str:
    """Silver → Gold: the flagship W1+A3+J4 mart (customer resume)."""
    oc = io.read("silver", "orders_customer")
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
    return io.write(mart, "gold", "customer_resume")


def silver_to_gold_nation(spark: SparkSession, io: LayerIO) -> str:
    """Silver → Gold: the A4 franchise-totals mart (nation resume)."""
    li = io.read("silver", "lineitem_enriched")
    nation = io.read("silver", "nation")
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
    return io.write(mart, "gold", "nation_resume")


def run_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str, use_catalog: bool = False
) -> dict[str, str]:
    """Run all five stages in dependency order; returns every written path.

    The reference enforces this ordering operationally (five separate Glue
    jobs, maxConcurrentRuns=1 — SURVEY.md §3); here it is explicit code.
    ``use_catalog=True`` runs the identical stages addressed through
    session-catalog databases (db_bronze/db_silver/db_gold) instead of raw
    paths — the reference's Glue-catalog layering (SURVEY.md §1.5).
    """
    io = LayerIO(spark, out_dir, use_catalog=use_catalog)
    out: dict[str, str] = {}
    out.update({f"bronze/{k}": v for k, v in landing_to_bronze(spark, sf_dir, io).items()})
    out.update({f"silver/{k}": v for k, v in bronze_to_silver(spark, io).items()})
    out.update({f"silver/{k}": v for k, v in silver_to_silver(spark, io).items()})
    out["gold/customer_resume"] = silver_to_gold_customer(spark, io)
    out["gold/nation_resume"] = silver_to_gold_nation(spark, io)
    return out
