"""Unit tests: MERGE upsert modes, SCD2 interval semantics, gap fill."""

from __future__ import annotations

import datetime as dt

import pytest

from datalake_nba_dmc_spark.operators.merge import merge_upsert
from datalake_nba_dmc_spark.operators.scd import (
    scd2_as_of,
    scd2_current,
    scd2_from_changes,
)
from datalake_nba_dmc_spark.operators.temporal import gap_fill


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestMergeUpsert:
    def test_update_insert(self, spark, target):
        source = spark.createDataFrame(
            [(2, "B", 22.0), (4, "d", 40.0)], "k int, s string, v double"
        )
        got = _rows(merge_upsert(target, source, keys=["k"]))
        assert got == [(1, "a", 10.0), (2, "B", 22.0), (3, "c", 30.0), (4, "d", 40.0)]

    def test_null_in_source_update_survives(self, spark, target):
        """A legitimate NULL in a matched source row must land in the
        output — COALESCE-style merges would resurrect the target value."""
        source = spark.createDataFrame([(2, None, 22.0)], "k int, s string, v double")
        got = _rows(merge_upsert(target, source, keys=["k"]))
        assert (2, None, 22.0) in got

    def test_matched_delete(self, spark, target):
        source = spark.createDataFrame(
            [(2, "B", 22.0), (4, "d", 40.0)], "k int, s string, v double"
        )
        got = _rows(
            merge_upsert(target, source, keys=["k"], when_matched="delete")
        )
        assert got == [(1, "a", 10.0), (3, "c", 30.0), (4, "d", 40.0)]

    def test_not_matched_ignore(self, spark, target):
        source = spark.createDataFrame(
            [(2, "B", 22.0), (4, "d", 40.0)], "k int, s string, v double"
        )
        got = _rows(
            merge_upsert(target, source, keys=["k"], when_not_matched="ignore")
        )
        assert got == [(1, "a", 10.0), (2, "B", 22.0), (3, "c", 30.0)]

    def test_schema_mismatch_raises(self, spark, target):
        bad = spark.createDataFrame([(1, "x")], "k int, s string")
        with pytest.raises(ValueError, match="schema mismatch"):
            merge_upsert(target, bad, keys=["k"])

    def test_all_key_columns(self, spark):
        t = spark.createDataFrame([(1,), (2,)], "k int")
        s = spark.createDataFrame([(2,), (3,)], "k int")
        got = _rows(merge_upsert(t, s, keys=["k"]))
        assert got == [(1,), (2,), (3,)]


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


class TestScd2:
    @pytest.fixture(scope="class")
    def dim(self, spark):
        changes = spark.createDataFrame(
            [
                (1, _ts(1), "bronze"),
                (1, _ts(5), "silver"),
                (1, _ts(9), "gold"),
                (2, _ts(3), "bronze"),
            ],
            "uid int, ts timestamp, tier string",
        )
        return scd2_from_changes(
            changes, key_cols=["uid"], ts_col="ts", attr_cols=["tier"]
        )

    def test_intervals_chain(self, dim):
        rows = {
            (r.uid, r.tier): (r.valid_from, r.valid_to, r.is_current)
            for r in dim.collect()
        }
        assert rows[(1, "bronze")] == (_ts(1), _ts(5), 0)
        assert rows[(1, "silver")] == (_ts(5), _ts(9), 0)
        assert rows[(1, "gold")] == (_ts(9), None, 1)
        assert rows[(2, "bronze")] == (_ts(3), None, 1)

    def test_current_view(self, dim):
        got = sorted((r.uid, r.tier) for r in scd2_current(dim).collect())
        assert got == [(1, "gold"), (2, "bronze")]

    def test_as_of_view(self, dim):
        got = sorted((r.uid, r.tier) for r in scd2_as_of(dim, _ts(6)).collect())
        assert got == [(1, "silver"), (2, "bronze")]
        # boundary: a version is live FROM its change instant (closed start)
        at5 = sorted((r.uid, r.tier) for r in scd2_as_of(dim, _ts(5)).collect())
        assert (1, "silver") in at5

    def test_same_instant_tiebreak(self, spark):
        changes = spark.createDataFrame(
            [(1, _ts(1), 2, "late"), (1, _ts(1), 1, "early")],
            "uid int, ts timestamp, seq int, state string",
        )
        dim = scd2_from_changes(
            changes,
            key_cols=["uid"],
            ts_col="ts",
            attr_cols=["state"],
            tiebreak_cols=["seq"],
        )
        current = {r.state: r.is_current for r in dim.collect()}
        assert current == {"early": 0, "late": 1}


class TestGapFill:
    @pytest.fixture(scope="class")
    def daily(self, spark):
        return spark.createDataFrame(
            [
                (1, _ts(1), 10.0),
                (1, _ts(4), 40.0),
                (2, _ts(2), 5.0),
            ],
            "uid int, day timestamp, v double",
        )

    def test_grid_and_ffill(self, daily):
        out = gap_fill(daily, ["uid"], "day", ["v"])
        got = sorted((r.uid, r.day, r.v, r.is_observed) for r in out.collect())
        assert got == [
            (1, _ts(1), 10.0, 1),
            (1, _ts(2), 10.0, 0),
            (1, _ts(3), 10.0, 0),
            (1, _ts(4), 40.0, 1),
            (2, _ts(2), 5.0, 1),
        ]

    def test_no_ffill_leaves_nulls(self, daily):
        out = gap_fill(daily, ["uid"], "day", ["v"], forward_fill=False)
        gaps = [r for r in out.collect() if r.is_observed == 0]
        assert gaps and all(r.v is None for r in gaps)


class TestSnapshotDiff:
    def test_insert_delete_update_detected(self, spark):
        from datalake_nba_dmc_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, s string"
        )
        new = spark.createDataFrame(
            [(2, "B"), (3, "c"), (4, "d")], "k int, s string"
        )
        got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {1: "delete", 2: "update", 4: "insert"}  # 3 unchanged → absent

    def test_null_transitions(self, spark):
        from datalake_nba_dmc_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "k int, s string")
        new = spark.createDataFrame([(1, "v"), (2, None), (3, None)], "k int, s string")
        got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
        # NULL→value and value→NULL are updates; NULL→NULL is unchanged
        assert got == {1: "update", 2: "update"}


class TestUpsertTable:
    def test_create_merge_idempotent(self, spark, tmp_path):
        from datalake_nba_dmc_spark.sinks import upsert_table

        path = str(tmp_path / "state")
        b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
        upsert_table(spark, b1, path, keys=["k"])  # creates
        b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string")
        upsert_table(spark, b2, path, keys=["k"])  # merges
        want = [(1, "a"), (2, "B"), (3, "c")]
        got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert got == want
        upsert_table(spark, b2, path, keys=["k"])  # replay converges
        got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert got == want
