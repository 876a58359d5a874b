"""Unit tests: data-quality expectation rules on data with known faults."""

from __future__ import annotations

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
