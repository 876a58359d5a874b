"""Unit tests for window extensions and exact-statistics operators."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import stats, windows


def test_exact_moments_matches_numpy(spark):
    vals = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 13.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, x double")
    row = stats.exact_moments(df, ["k"], "x", scale=1).collect()[0]
    assert row.x_n == len(vals)
    assert math.isclose(row.x_mean, np.mean(vals), rel_tol=1e-12)
    assert math.isclose(row.x_var, np.var(vals, ddof=1), rel_tol=1e-12)
    assert math.isclose(row.x_std, np.std(vals, ddof=1), rel_tol=1e-12)


def test_exact_moments_scale_recovers_fractions(spark):
    vals = [1.25, 2.50, 3.75]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, x double")
    row = stats.exact_moments(df, ["k"], "x", scale=100).collect()[0]
    assert math.isclose(row.x_mean, 2.5, rel_tol=1e-12)
    assert math.isclose(row.x_var, np.var(vals, ddof=1), rel_tol=1e-12)


def test_exact_corr_matches_numpy(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "k string, x double, y double"
    )
    row = stats.exact_corr(df, ["k"], "x", "y").collect()[0]
    assert math.isclose(row.corr, np.corrcoef(xs, ys)[0][1], rel_tol=1e-12)


def test_exact_corr_perfect_correlation(spark):
    df = spark.createDataFrame(
        [("g", float(i), 2.0 * i + 1) for i in range(1, 6)],
        "k string, x double, y double",
    )
    assert math.isclose(
        stats.exact_corr(df, ["k"], "x", "y").collect()[0].corr, 1.0, rel_tol=1e-12
    )


def test_ntile_bucket_sizes(spark):
    df = spark.createDataFrame([("g", i) for i in range(10)], "k string, v int")
    out = windows.with_ntile(df, ["k"], [F.col("v").asc()], 4, alias="b")
    sizes = {r.b: r.n for r in out.groupBy("b").agg(F.count("*").alias("n")).collect()}
    # 10 rows over 4 buckets -> 3,3,2,2; earlier buckets get the remainder
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}
    # bucket assignment follows the ordering
    assert {r.b for r in out.filter(F.col("v") < 3).collect()} == {1}


def test_moving_exact_avg_frame(spark):
    df = spark.createDataFrame(
        [("g", i, float(10 * i)) for i in range(1, 5)], "k string, i int, x double"
    )
    out = windows.with_moving_exact_avg(
        df, ["k"], [F.col("i").asc()], "x", preceding=1, alias="m"
    )
    got = {r.i: r.m for r in out.collect()}
    assert got == {1: 10.0, 2: 15.0, 3: 25.0, 4: 35.0}


def test_first_last_full_frame(spark):
    df = spark.createDataFrame(
        [("g", 1, 5.0), ("g", 2, 7.0), ("g", 3, 9.0)], "k string, i int, x double"
    )
    out = windows.with_first_last(
        df, ["k"], [F.col("i").asc()], "x", "fv", "lv"
    ).collect()
    # last_value must be the partition-global last on EVERY row (pinned frame)
    assert all(r.fv == 5.0 and r.lv == 9.0 for r in out)


def test_grouped_minmax_norm(spark):
    from datalake_nba_dmc_spark.operators.grouped import grouped_minmax_norm

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 5.0)], "k string, x double"
    )
    out = {(r.k, r.x): r.minmax for r in grouped_minmax_norm(df, ["k"], "x").collect()}
    assert out == {("a", 1.0): 0.0, ("a", 3.0): 1.0, ("a", 2.0): 0.5, ("b", 5.0): 0.0}
    # the input DataFrame's schema must NOT have been mutated
    assert "minmax" not in df.columns


def test_time_range_sum_trailing_hour(spark):
    import datetime as dt

    from datalake_nba_dmc_spark.operators.windows import with_time_range_sum

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes, micros=0):
        return t0 + dt.timedelta(minutes=minutes, microseconds=micros)

    df = spark.createDataFrame(
        [
            (1, ts(0), 1.0),
            (1, ts(30), 2.0),
            (1, ts(60), 4.0),        # exactly 1h after first → still in frame
            (1, ts(60, 1), 8.0),     # 1h + 1µs: first row falls out
            (2, ts(0), 100.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = with_time_range_sum(df, ["user_id"], "ts", "value", 3600)
    got = {
        (r.user_id, r.ts): (r.n_in_range, r.sum_in_range) for r in out.collect()
    }
    assert got[(1, ts(0))] == (1, 1.0)
    assert got[(1, ts(30))] == (2, 3.0)
    assert got[(1, ts(60))] == (3, 7.0)      # inclusive 1h bound keeps row 1
    assert got[(1, ts(60, 1))] == (3, 14.0)  # row 1 aged out at µs precision
    assert got[(2, ts(0))] == (1, 100.0)


def test_psi_binned_detects_shift_and_is_symmetric_zero(spark):
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.stats import psi_binned

    same = spark.createDataFrame(
        [(i % 2 == 0, float(i % 100)) for i in range(2000)], ["is_a", "v"]
    )
    psi_same = sum(
        r["psi_contrib"]
        for r in psi_binned(same, F.col("is_a"), "v", 0.0, 100.0, 10).collect()
    )
    assert abs(psi_same) < 0.01  # identical distributions → PSI ≈ 0

    shifted = spark.createDataFrame(
        [(True, float(i % 50)) for i in range(1000)]
        + [(False, 50.0 + float(i % 50)) for i in range(1000)],
        ["is_a", "v"],
    )
    psi_shift = sum(
        r["psi_contrib"]
        for r in psi_binned(shifted, F.col("is_a"), "v", 0.0, 100.0, 10).collect()
    )
    assert psi_shift > 0.25  # disjoint supports → strong drift signal


def test_psi_binned_survives_extreme_outliers(spark):
    """A corrupt value at 1e15 must clamp into the edge bin, not overflow
    the int bucket under ANSI mode."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.stats import psi_binned

    rows = [(i % 2 == 0, float(i % 100)) for i in range(200)] + [(True, 1.0e15)]
    df = spark.createDataFrame(rows, ["is_a", "v"])
    out = psi_binned(df, F.col("is_a"), "v", 0.0, 100.0, 10).collect()
    assert sum(r["n_a"] + r["n_b"] for r in out) == 201
    top = [r for r in out if r["bucket"] == 9][0]
    assert top["n_a"] >= 11  # the outlier clamped into the last bin


def test_bootstrap_ci_laws(spark):
    """Poisson-bootstrap CI: interval brackets the point estimate on
    well-behaved data, narrows with sample size (statistical sanity,
    deterministic given the seeded hash weights), is seed-sensitive,
    and validates its parameters."""
    import random

    import pytest

    from datalake_nba_dmc_spark.operators.stats import bootstrap_ci_mean

    rng = random.Random(5)
    big = spark.createDataFrame(
        [(i, 100 + rng.gauss(0, 10)) for i in range(4000)],
        "id long, v double",
    )
    small = spark.createDataFrame(
        [(i, 100 + rng.gauss(0, 10)) for i in range(100)],
        "id long, v double",
    )
    [rb] = bootstrap_ci_mean(big, "v", "id").collect()
    [rs] = bootstrap_ci_mean(small, "v", "id").collect()
    assert rb.lo_micro <= rb.point_micro <= rb.hi_micro
    assert rs.lo_micro <= rs.point_micro <= rs.hi_micro
    assert (rb.hi_micro - rb.lo_micro) < (rs.hi_micro - rs.lo_micro)
    # deterministic: identical re-run, different under another seed
    [rb2] = bootstrap_ci_mean(big, "v", "id").collect()
    assert tuple(rb2) == tuple(rb)
    [rb3] = bootstrap_ci_mean(big, "v", "id", seed=7).collect()
    assert (rb3.lo_micro, rb3.hi_micro) != (rb.lo_micro, rb.hi_micro)
    assert rb3.point_micro == rb.point_micro  # point is resample-free
    with pytest.raises(ValueError, match="n_resamples"):
        bootstrap_ci_mean(big, "v", "id", n_resamples=1)
    with pytest.raises(ValueError, match="alpha_pct"):
        bootstrap_ci_mean(big, "v", "id", alpha_pct=0)
    # NULL values drop in-band; empty input yields an empty frame
    with_null = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 12.0)], "id long, v double"
    )
    [rn] = bootstrap_ci_mean(with_null, "v", "id", n_resamples=8).collect()
    assert rn.n_resamples == 8
    empty = spark.createDataFrame([], "id long, v double")
    assert bootstrap_ci_mean(empty, "v", "id").collect() == []


def test_bootstrap_ci_negative_ids_total(spark):
    """Negative resampling-unit ids must not leak a negative base into
    the mixer (both engines' % is sign-of-dividend): the weight hash is
    double-mod wrapped, so the CI is well-defined and deterministic."""
    from datalake_nba_dmc_spark.operators.stats import bootstrap_ci_mean

    df = spark.createDataFrame(
        [(-i, 10.0 + (i % 5)) for i in range(1, 200)], "id long, v double"
    )
    [r1] = bootstrap_ci_mean(df, "v", "id", n_resamples=16).collect()
    [r2] = bootstrap_ci_mean(df, "v", "id", n_resamples=16).collect()
    assert tuple(r1) == tuple(r2)
    assert r1.lo_micro <= r1.point_micro <= r1.hi_micro
