"""SQL entry-point tests: the engine's tables are reachable via spark.sql
over registered views (SURVEY.md §3 new-engine lifecycle), and the pipeline's
gold marts agree with the suite's flagship query on the same inputs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.plans.medallion import run_pipeline
from datalake_nba_dmc_spark.sinks import read_table
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import load_all

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


@needs_testdata
def test_spark_sql_over_registered_views(spark):
    TableRegistry(spark, SF0001).register_views()
    out = spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_orders,
               COUNT(DISTINCT o.o_custkey) AS n_customers
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    ).collect()
    assert len(out) == 5  # five market segments
    assert sum(r["n_orders"] for r in out) == spark.table("orders").count()


@needs_testdata
def test_sql_and_dataframe_paths_agree(spark):
    """The same logical query through spark.sql and the DataFrame API must
    produce identical results (both land on Catalyst)."""
    TableRegistry(spark, SF0001).register_views()
    via_sql = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    via_df = (
        spark.table("lineitem").groupBy("l_returnflag").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(map(tuple, via_df.collect()))


@needs_testdata
def test_pipeline_gold_agrees_with_flagship_query(spark, tmp_path):
    """Cross-validation: the medallion pipeline's customer_resume mart must
    carry the same totals/latest-order facts as the suite's flagship query
    computed directly from the raw tables."""
    out = run_pipeline(spark, SF0001, str(tmp_path))
    mart = read_table(spark, out["gold/customer_resume"])
    flagship = load_all()["flagship_customer_resume"].builder(spark, SF0001)
    m = {
        r["custkey"]: (r["latest_orderkey"], r["active_days"])
        for r in mart.collect()
    }
    f = {
        r["custkey"]: (r["latest_orderkey"], r["active_days"])
        for r in flagship.collect()
    }
    assert m == f
