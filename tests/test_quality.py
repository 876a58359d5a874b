"""Unit tests: data-quality expectation rules on data with known faults."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.quality import (
    accepted_values,
    expectation_report,
    in_range,
    not_null,
    referential,
    unique,
)


def _report(df, rules):
    return {
        r["rule"]: (r["violations"], r["total"], r["passed"])
        for r in expectation_report(df, rules).collect()
    }


def test_all_rule_kinds_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0, 100),
            (2, "B", -5.0, 100),  # range violation
            (2, "Z", 20.0, 999),  # dup key + bad status + missing FK
            (None, "A", None, None),  # null key; null val/fk not violations
        ],
        ["k", "status", "val", "fk"],
    )
    ref = spark.createDataFrame([(100,), (200,)], ["ref_k"])
    got = _report(
        df,
        [
            not_null("k"),
            accepted_values("status", ["A", "B"]),
            in_range("val", 0, 15),
            unique("k"),
            referential("fk", ref, "ref_k"),
        ],
    )
    assert got["not_null_k"] == (1, 4, False)
    assert got["accepted_values_status"] == (1, 4, False)
    # -5 below range and 20 above range violate; NULL val does not
    assert got["in_range_val"] == (2, 4, False)
    # 4 rows, 3 distinct keys (NULL forms its own group) -> 1 excess row
    assert got["unique_k"] == (1, 4, False)
    # NULL fk excluded from population; 999 missing from ref
    assert got["referential_fk"] == (1, 3, False)


def test_clean_data_passes_everything(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], ["k", "status"])
    ref = spark.createDataFrame([(1,), (2,)], ["k"])
    got = _report(
        df,
        [not_null("k"), accepted_values("status", ["A", "B"]), unique("k"),
         referential("k", ref, "k")],
    )
    assert all(v == (0, 2, True) for v in got.values())


def test_multi_column_unique(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "y")], ["a", "b"]
    )
    got = _report(df, [unique("a", "b")])
    assert got["unique_a_b"] == (1, 3, False)


def test_profile_columns_one_pass(spark):
    from datalake_nba_dmc_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 30.0), (None, 40.0)], ["a", "b"]
    )
    got = {
        r["col_name"]: (
            r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_val"], r["max_val"]
        )
        for r in profile_columns(df, ["a", "b"]).collect()
    }
    assert got["a"] == (4, 1, 2, 1.0, 2.0)
    assert got["b"] == (4, 1, 3, 10.0, 40.0)


def test_histogram_clamps_edges_and_fills_empty_bins(spark):
    from datalake_nba_dmc_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (25.0,), (40.0,), (100.0,), (None,)],
        ["x"],
    )
    rows = histogram(spark, df, "x", 0.0, 40.0, 4).orderBy("bucket").collect()
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
    assert [r["cnt"] for r in rows] == [3, 1, 1, 2]  # -5 clamps low; 40,100 high
    assert rows[0]["bin_lo"] == 0.0 and rows[3]["bin_hi"] == 40.0
    assert sum(r["cnt"] for r in rows) == 7  # NULL excluded


def test_profile_approx_mode_runs(spark):
    from datalake_nba_dmc_spark.operators.profile import profile_columns

    df = spark.range(1000).select((F.col("id") % 10).alias("a"))
    row = profile_columns(df, ["a"], approx=True).collect()[0]
    assert row["n_rows"] == 1000 and abs(row["n_distinct"] - 10) <= 1


def test_observed_write_collects_metrics_in_flight(spark, tmp_path):
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.quality import observed_write
    from datalake_nba_dmc_spark.sinks import read_table

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)], ["id", "v"]
    )
    path = str(tmp_path / "obs")
    got = observed_write(
        df,
        path,
        {
            "n_rows": F.count(F.lit(1)),
            "null_v": F.count_if(F.col("v").isNull()),
            "sum_v": F.sum("v"),
        },
    )
    assert got == {"n_rows": 4, "null_v": 2, "sum_v": 40.0}
    assert read_table(spark, path).count() == 4


def test_robust_outlier_profile(spark):
    from datalake_nba_dmc_spark.operators.profile import robust_outlier_profile

    # group a: tight cluster around 10 with one wild point; group b: clean
    rows = [("a", float(v)) for v in (9, 9, 10, 10, 10, 11, 11, 1000)] + [
        ("b", float(v)) for v in (5, 6, 7, 8, 9)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r.g: r for r in robust_outlier_profile(df, "g", "x").collect()}
    assert got["a"].n_rows == 8 and got["a"].med == 10.0
    # adevs for a: [1,1,0,0,0,1,1,990] -> MAD = 1 -> only 1000 flagged
    assert got["a"].mad == 1.0
    assert got["a"].n_outliers == 1
    assert got["b"].med == 7.0 and got["b"].n_outliers == 0


def test_winsorize_clips_to_group_bounds(spark):
    from datalake_nba_dmc_spark.operators.profile import winsorize

    rows = [("g", float(v)) for v in range(1, 101)] + [("g", 1e9), ("g", -1e9)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = winsorize(df, "grp", "v", lo_q=0.1, hi_q=0.9).collect()
    lo = min(r["_lo"] for r in out)
    hi = max(r["_hi"] for r in out)
    assert all(lo <= r["winsorized"] <= hi for r in out)
    # the extreme rows survive, clamped to the bounds
    clamped = {r["winsorized"] for r in out if abs(r["v"]) == 1e9}
    assert clamped == {lo, hi}
    assert len(out) == 102  # winsorization drops nothing


def test_winsorize_keeps_nulls_null(spark):
    from datalake_nba_dmc_spark.operators.profile import winsorize

    rows = [("g", float(v)) for v in range(10)] + [("g", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, "grp", "v").collect()
    null_rows = [r for r in out if r["v"] is None]
    assert len(null_rows) == 1 and null_rows[0]["winsorized"] is None
