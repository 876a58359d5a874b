"""End-to-end medallion pipeline test: five stages over sf0.001, real writes."""

from __future__ import annotations

import os

import pytest

from datalake_nba_dmc_spark.plans.medallion import run_pipeline
from datalake_nba_dmc_spark.sinks import compact, read_table, write_table

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


@needs_testdata
def test_medallion_pipeline_end_to_end(spark, tmp_path):
    out = run_pipeline(spark, SF0001, str(tmp_path))
    assert set(out) == {
        "bronze/orders", "bronze/lineitem", "bronze/customer", "bronze/nation",
        "silver/orders_customer", "silver/lineitem_enriched", "silver/nation",
        "silver/customer_daily", "gold/customer_resume", "gold/nation_resume",
    }

    resume = read_table(spark, out["gold/customer_resume"])
    n_customers = read_table(spark, out["bronze/customer"]).count()
    assert resume.count() == n_customers  # one row per customer with orders...
    assert {"custkey", "latest_orderkey", "active_days"} <= set(resume.columns)
    # every customer's latest_orderkey must exist in bronze orders
    orders = read_table(spark, out["bronze/orders"])
    dangling = (
        resume.filter("latest_orderkey IS NOT NULL")
        .join(orders, resume.latest_orderkey == orders.o_orderkey, "left_anti")
    )
    assert dangling.count() == 0

    nation_mart = read_table(spark, out["gold/nation_resume"])
    assert nation_mart.count() <= 25  # at most one row per nation (+null key)


@needs_testdata
def test_write_modes_and_compact(spark, tmp_path):
    df = spark.range(1000).repartition(8)
    path = str(tmp_path / "t")
    write_table(df, path)
    assert read_table(spark, path).count() == 1000
    # overwrite replaces, not appends
    write_table(df.limit(10), path)
    assert read_table(spark, path).count() == 10
    # append mode
    write_table(df.limit(5), path, mode="append")
    assert read_table(spark, path).count() == 15

    big = str(tmp_path / "many_files")
    write_table(spark.range(10000).repartition(16), big)
    n_before = len([f for f in os.listdir(big) if f.endswith(".parquet")])
    assert n_before >= 16
    compact(spark, big, target_files=2)
    n_after = len([f for f in os.listdir(big) if f.endswith(".parquet")])
    assert n_after <= 4
    assert read_table(spark, big).count() == 10000
    # staging-dir protocol: the staged copy was swapped in, not left behind,
    # and the table was never overwritten in place from its own lineage
    assert not os.path.exists(big + "__staging")


@needs_testdata
def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], ["id", "part"]
    )
    path = str(tmp_path / "pt")
    write_table(df, path, partition_by=["part"])
    assert os.path.isdir(os.path.join(path, "part=a"))
    back = read_table(spark, path).filter("part = 'a'")
    assert back.count() == 50
    # partition pruning visible in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan


def test_curation_pipeline_toy_corpus(spark):
    """Quality gate drops short docs, exact dedup collapses identical text,
    near-dedup keeps one representative per Jaccard cluster."""
    from datalake_nba_dmc_spark.plans.curation import curate, curation_stats

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s1", len(base)),
            (2, base, "en", "s1", len(base)),                  # exact dup of 1
            (3, base + " tonight", "en", "s1", len(base) + 8),  # near dup of 1
            (4, "too short", "en", "s1", 9),                    # fails quality
            (5, "a completely different document about spark engines", "en", "s2", 52),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = sorted(r.doc_id for r in curate(docs).collect())
    assert kept == [1, 5]
    stats = {
        (r.source, r.lang): (r.n_raw, r.n_kept, r.tokens_kept)
        for r in curation_stats(docs, curate(docs)).collect()
    }
    assert stats[("s1", "en")] == (4, 1, 12)
    assert stats[("s2", "en")] == (1, 1, 7)


@needs_testdata
def test_medallion_pipeline_via_catalog(spark, tmp_path):
    """The same five stages addressed through session-catalog databases
    (db_bronze/db_silver/db_gold — the reference's Glue-catalog layering,
    SURVEY.md §1.5). Catalog-mode output must byte-match path mode, layer
    databases must exist with their tables listed, and a second run must
    overwrite (K1 semantics through saveAsTable), not append."""
    from datalake_nba_dmc_spark.sources.catalog import list_layer_tables

    out = run_pipeline(spark, SF0001, str(tmp_path), use_catalog=True)

    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"db_bronze", "db_silver", "db_gold"} <= dbs
    assert set(list_layer_tables(spark, "db_gold")) >= {
        "customer_resume", "nation_resume",
    }

    # catalog table and the external path hold the same rows
    mart = spark.table("db_gold.customer_resume")
    by_path = read_table(spark, out["gold/customer_resume"])
    assert mart.count() == by_path.count()
    assert mart.exceptAll(by_path).count() == 0

    # re-run: overwrite, not append
    n = mart.count()
    run_pipeline(spark, SF0001, str(tmp_path), use_catalog=True)
    assert spark.table("db_gold.customer_resume").count() == n


def test_dynamic_partition_overwrite_touches_only_present_partitions(spark, tmp_path):
    from datalake_nba_dmc_spark.sinks import overwrite_partitions

    path = str(tmp_path / "dyn")
    days = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}") for i in range(30)], ["id", "day"]
    )
    overwrite_partitions(days, path, ["day"])
    assert read_table(spark, path).count() == 30

    # re-land ONLY day 2 with corrected (fewer) rows
    fix = spark.createDataFrame([(999, "2024-01-02")], ["id", "day"])
    overwrite_partitions(fix, path, ["day"])
    back = read_table(spark, path)
    # days 1 and 3 untouched (10 rows each), day 2 replaced by 1 row
    assert back.count() == 21
    # partition dirs read back type-inferred (day=2024-01-01 → date)
    got = {str(r["day"]): r["n"] for r in back.groupBy("day").count().withColumnRenamed("count", "n").collect()}
    assert got == {"2024-01-01": 10, "2024-01-02": 1, "2024-01-03": 10}
    # idempotent re-run
    overwrite_partitions(fix, path, ["day"])
    assert read_table(spark, path).count() == 21
