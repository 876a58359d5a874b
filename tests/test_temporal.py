"""Unit tests: as-of join and range join semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),
            (1, _ts("2024-01-01 12:00:00"), "e2"),
            (1, _ts("2024-01-01 09:00:00"), "e0"),  # before any right row
            (2, _ts("2024-01-01 10:00:00"), "e3"),  # key with no right rows
        ],
        ["k", "t", "ev"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100),
            (1, _ts("2024-01-01 12:00:00"), 200),  # exact tie → included (<=)
            (1, _ts("2024-01-01 13:00:00"), 300),  # future → never picked
        ],
        ["k", "rt", "val"],
    )
    out = {
        r["ev"]: r["asof_val"]
        for r in asof_join(left, right, "k", "t", "rt", ["val"]).collect()
    }
    assert out == {"e0": None, "e1": 100, "e2": 200, "e3": None}


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"), "x")], ["k", "t", "p"])
    right = spark.createDataFrame([(1, _ts("2023-12-31 00:00:00"), 9)], ["k", "rt", "v"])
    out = asof_join(left, right, "k", "t", "rt", ["v"])
    assert out.columns == ["k", "t", "p", "asof_v"]
    assert out.count() == 1


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, 5), (1, 15), (2, 5)], ["key", "p"]
    )
    intervals = spark.createDataFrame(
        [(1, 0, 10, "a"), (1, 10, 20, "b"), (2, 100, 200, "c")],
        ["key", "lo", "hi", "tag"],
    )
    out = range_join(
        points, intervals, "key", "p", F.col("lo"), F.col("hi")
    ).select(points["key"], "p", "tag")
    got = {(r["key"], r["p"], r["tag"]) for r in out.collect()}
    assert got == {(1, 5, "a"), (1, 15, "b")}


def test_interval_overlap_join_matches_naive_theta_join(spark):
    """Bucketized interval join must produce exactly the pairs the raw
    band-condition theta join produces — including intervals spanning many
    buckets, exact-boundary touches (half-open: NOT overlapping), and keys
    with no partner."""
    from datalake_nba_dmc_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "l1"),
            (1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00"), "l2"),
            # spans 5 buckets at bucket_seconds=3600
            (1, _ts("2024-01-01 08:30:00"), _ts("2024-01-01 13:30:00"), "l3"),
            (2, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "l4"),
            (3, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "l5"),
        ],
        ["k", "s", "e", "lid"],
    )
    right = spark.createDataFrame(
        [
            # touches l1 end exactly → half-open, NOT an overlap with l1
            (1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 11:30:00"), "r1"),
            (1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:45:00"), "r2"),
            (2, _ts("2024-01-01 12:00:00"), _ts("2024-01-01 13:00:00"), "r3"),
        ],
        ["k", "rs", "re", "rid"],
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "k", "s", "e", "rs", "re", bucket_seconds=3600
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (left["k"] == right["k"])
            & (left["s"] < right["re"])
            & (right["rs"] < left["e"]),
        ).collect()
    }
    assert got == naive
    assert got == {("l2", "r1"), ("l1", "r2"), ("l3", "r1"), ("l3", "r2")}


def test_interval_overlap_join_no_dup_pairs_across_buckets(spark):
    """A pair sharing MANY buckets must still appear exactly once."""
    from datalake_nba_dmc_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"), "L")],
        ["k", "s", "e", "lid"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 06:00:00"), _ts("2024-01-01 18:00:00"), "R")],
        ["k", "rs", "re", "rid"],
    )
    out = interval_overlap_join(
        left, right, "k", "s", "e", "rs", "re", bucket_seconds=3600
    )
    assert out.count() == 1


def test_band_lookup_join_boundaries_and_uncovered_values(spark):
    from datalake_nba_dmc_spark.operators.temporal import band_lookup_join

    bands = spark.createDataFrame(
        [(1, "low", 0.0, 100.0), (2, "high", 100.0, 250.0)],
        ["band_id", "band", "lo", "hi"],
    )
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 99.999), (3, 100.0), (4, 249.9), (5, 250.0), (6, -1.0)],
        ["id", "v"],
    )
    got = {
        r["id"]: r["band"]
        for r in band_lookup_join(fact, bands, "v", bin_width=30.0).collect()
    }
    # half-open [lo, hi): 100.0 belongs to 'high', 250.0 and -1.0 match nothing
    assert got == {1: "low", 2: "low", 3: "high", 4: "high"}


def test_band_lookup_join_matches_theta_join(spark):
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.temporal import band_lookup_join

    bands = spark.createDataFrame(
        [(i, f"b{i}", float(i * 37), float(i * 37 + 53)) for i in range(10)],
        ["band_id", "band", "lo", "hi"],
    )  # overlapping bands: a value may match several
    fact = spark.createDataFrame(
        [(i, float((i * 7.31) % 400)) for i in range(500)], ["id", "v"]
    )
    got = {
        (r["id"], r["band_id"])
        for r in band_lookup_join(fact, bands, "v", bin_width=25.0).collect()
    }
    want = {
        (r["id"], r["band_id"])
        for r in fact.join(
            bands, (fact.v >= bands.lo) & (fact.v < bands.hi)
        ).collect()
    }
    assert got == want and len(want) > 0


def test_band_lookup_join_rejects_column_collisions(spark):
    import pytest

    from datalake_nba_dmc_spark.operators.temporal import band_lookup_join

    bands = spark.createDataFrame([(1, 0.0, 10.0)], ["id", "lo", "hi"])
    fact = spark.createDataFrame([(1, 5.0)], ["id", "v"])
    with pytest.raises(ValueError, match="share column names"):
        band_lookup_join(fact, bands, "v")


def test_nearest_value_join_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.temporal import nearest_value_join

    left = spark.createDataFrame(
        [(i, "k%d" % (i % 3), float((i * 7.7) % 100)) for i in range(300)],
        ["id", "key", "v"],
    )
    right = spark.createDataFrame(
        [("k%d" % (j % 3), float(j * 9.5), "r%d" % j) for j in range(30)],
        ["key", "rv", "tag"],
    )
    got = {
        r["id"]: (r["nearest_rv"], r["nearest_tag"])
        for r in nearest_value_join(
            left, right, "key", "v", "rv", ["tag"]
        ).collect()
    }
    want = {}
    rrows = [(r["key"], r["rv"], r["tag"]) for r in right.collect()]
    for r in left.collect():
        cands = [(abs(r["v"] - rv), rv, tag) for k, rv, tag in rrows if k == r["key"]]
        d, rv, tag = min(cands)  # tie -> smaller rv, matching the operator
        want[r["id"]] = (rv, tag)
    assert got == want


def test_nearest_value_join_ties_and_missing_keys(spark):
    from datalake_nba_dmc_spark.operators.temporal import nearest_value_join

    left = spark.createDataFrame(
        [(1, "a", 15.0), (2, "zz", 1.0)], ["id", "key", "v"]
    )
    right = spark.createDataFrame(
        [("a", 10.0, "lo"), ("a", 20.0, "hi")], ["key", "rv", "tag"]
    )
    got = {
        r["id"]: (r["nearest_rv"], r["nearest_tag"])
        for r in nearest_value_join(left, right, "key", "v", "rv", ["tag"]).collect()
    }
    assert got[1] == (10.0, "lo")  # exact midpoint -> smaller right value
    assert got[2] == (None, None)  # no right rows for key 'zz'
