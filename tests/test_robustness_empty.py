"""Empty-input robustness — pins the fixes found by
``tools/robustness_audit.py empty`` (round 6).

A 100 TB pipeline routinely sees zero-row inputs: an empty daily
partition, an empty corrected re-land batch, a filter that matched
nothing. Each test here pins one behavior that was previously an opaque
crash or an all-NULL report.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001


@pytest.fixture()
def empty_orders(spark):
    return spark.read.parquet(f"{SF0001}/orders.parquet").limit(0)


def test_empty_partitioned_write_roundtrips_schema(spark, empty_orders, tmp_path):
    """A hive-partitioned overwrite of zero rows emits no data files; the
    schema sidecar keeps the table readable with its exact schema instead
    of UNABLE_TO_INFER_SCHEMA."""
    from datalake_nba_dmc_spark.sinks import read_table, write_table

    target = str(tmp_path / "t")
    src = empty_orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    write_table(src, target, partition_by=["o_orderpriority"])
    back = read_table(spark, target)
    assert back.count() == 0
    assert dict(back.dtypes) == dict(src.dtypes)


def test_empty_dynamic_overwrite_is_a_noop_on_existing_table(spark, tmp_path):
    """Dynamic partition overwrite with an empty batch must replace no
    partitions — the table keeps every original row and stays readable."""
    from datalake_nba_dmc_spark.sinks import (
        overwrite_partitions,
        read_table,
        write_table,
    )

    orders = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    target = str(tmp_path / "t")
    write_table(orders, target, partition_by=["o_orderpriority"])
    n = orders.count()
    overwrite_partitions(orders.limit(0), target, ["o_orderpriority"])
    assert read_table(spark, target).count() == n


def test_nonempty_write_after_empty_overwrite_ignores_sidecar(spark, tmp_path):
    """The sidecar is underscore-prefixed so Spark's file index skips it:
    once real files land, reads take the normal inference path."""
    from datalake_nba_dmc_spark.sinks import read_table, write_table

    orders = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    target = str(tmp_path / "t")
    write_table(orders.limit(0), target, partition_by=["o_orderpriority"])
    write_table(orders, target, partition_by=["o_orderpriority"])
    assert read_table(spark, target).count() == orders.count()


def test_expectation_report_on_empty_table_passes_vacuously(spark, empty_orders):
    """SUM over zero rows is NULL in SQL; the report must still say
    violations=0 / passed=true for every rule kind (scalar, unique,
    referential) — an expectation over nothing holds vacuously."""
    from datalake_nba_dmc_spark.operators.quality import (
        accepted_values,
        expectation_report,
        in_range,
        not_null,
        referential,
        unique,
    )

    customer = spark.read.parquet(f"{SF0001}/customer.parquet").limit(0)
    rows = expectation_report(
        empty_orders,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            in_range("o_totalprice", 0, 250000),
            unique("o_orderkey"),
            referential("o_custkey", customer, "c_custkey"),
        ],
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["violations"] == 0, r
        assert r["total"] == 0, r
        assert r["passed"] is True, r


def test_index_builds_fail_fast_with_clear_error_on_empty_corpus(spark):
    """KMeans-backed index builds raise a diagnosable ValueError instead
    of MLlib's opaque Py4JJavaError (same policy as pca_project)."""
    from datalake_nba_dmc_spark.operators.similarity import ivf_index, pq_train

    empty = spark.read.parquet(f"{SF0001}/embeddings.parquet").limit(0)
    with pytest.raises(ValueError, match="empty input"):
        ivf_index(empty, n_centroids=4)
    with pytest.raises(ValueError, match="empty input"):
        pq_train(empty, dim=64, m=8, k=4)


def test_empty_filter_result_partitioned_write_roundtrips(spark, tmp_path):
    """The end-to-end shape that bites in production: a predicate that
    matches nothing, written partitioned, read back by a downstream job."""
    from datalake_nba_dmc_spark.sinks import read_table, write_table

    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    none = orders.filter(F.col("o_totalprice") < -1)
    target = str(tmp_path / "t")
    write_table(
        none.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        target,
        partition_by=["o_orderpriority"],
    )
    back = read_table(spark, target)
    assert back.count() == 0
    assert set(back.columns) == {"o_orderkey", "o_totalprice", "o_orderpriority"}
